"""Aggregate witness for HUGE-output queries — the scale companion to
tools/check_oracles.py.

check_oracles compares full row multisets, which requires collecting both
result sets into Python. That is the right gate at sf<=0.1, but some
pair-listing queries have output QUADRATIC in corpus size (at sf1 the
synthetic corpus's 31-token vocabulary makes doc_simhash_near_pairs emit
~97M rows): materializing 10^8 rows in the driver is a harness limit, not
an engine one. This tool compares ENGINE-SIDE aggregates instead — row
count plus exact-integer per-column checksums, computed distributed on
Spark and columnar in DuckDB, so nothing ever leaves either engine:

* integer columns  -> sum(col)
* float columns    -> sum(cast(round(col * 1e6) as bigint))  (query outputs
  are already rounded to 6dp, so the scaled value is integral up to fp
  representation noise — exact integer arithmetic on both sides)
* string columns   -> sum(length(col))

A count + per-column-checksum match is a weaker witness than the multiset
compare (it cannot see row-internal permutations that preserve all column
sums), but at sf1 it runs where the strong check cannot, and the same
queries' exact multisets are verified at sf0.01/sf0.1 by check_oracles.

Usage: python tools/agg_witness.py <sf_dir> <query_name> [...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: agg_witness.py <sf_dir> <query> [...]")

    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import __spark_entry__ as entrymod
    from open_finance_lakehouse_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = build_session("agg_witness", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in names:
        fn = qs[name]
        df = fn(spark, sf_dir)

        s_aggs = [F.count(F.lit(1)).alias("n")]
        d_aggs = ["count(*)"]
        for f in df.schema.fields:
            c = f.name
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                s_aggs.append(F.sum(F.round(F.col(c) * 1e6)
                                    .cast("long")).alias(c))
                d_aggs.append(f"sum(cast(round({c} * 1e6) as bigint))")
            elif isinstance(f.dataType, T.StringType):
                s_aggs.append(F.sum(F.length(c)).alias(c))
                d_aggs.append(f"sum(length({c}))")
            else:
                s_aggs.append(F.sum(F.col(c).cast("long")).alias(c))
                d_aggs.append(f"sum(cast({c} as bigint))")

        t0 = time.monotonic()
        s_row = df.agg(*s_aggs).collect()[0]
        spark_s = time.monotonic() - t0
        spark.catalog.clearCache()

        t0 = time.monotonic()
        d_row = con.execute(
            f"SELECT {', '.join(d_aggs)} FROM ({oracles[name]})").fetchone()
        duck_s = time.monotonic() - t0

        svals = [int(v) if v is not None else None for v in s_row]
        dvals = [int(v) if v is not None else None for v in d_row]
        if svals == dvals:
            print(f"ok   {name}: rows={svals[0]} checksums match "
                  f"(spark {spark_s:.1f}s, duckdb {duck_s:.1f}s)")
        else:
            print(f"FAIL {name}: spark={svals} duck={dvals}")
            failures.append(name)

    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
