"""Band-shape-parameterized MinHash-LSH (the sf10 tuning lever).

The oracled ``doc_minhash_lsh_pairs`` pins the default shape (k=8,
4 bands x 2 rows) and is driver-verified; these tests cover the r=4
rows/band shape (k=16, 4x4) that suppresses the O(n^2 * j^r)
chance-collision floor on low-diversity corpora (BENCH/sf10.md):

1. two-code-path parity of the 4x4 shape against its own DuckDB twin
   (the discipline every oracled query gets from the driver);
2. the suppression property itself: fewer candidates than 2 rows/band
   on the same corpus, with every certain pair (identical signatures)
   retained.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from open_finance_lakehouse_spark.queries.textops import (
    minhash_lsh_near_pairs,
    minhash_lsh_near_pairs_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def _spark_pairs(spark, bands, rows):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    df = minhash_lsh_near_pairs(docs, bands=bands, rows_per_band=rows)
    return {
        (r["doc_a"], r["doc_b"]): r["est_similarity"] for r in df.collect()
    }


def _duck_pairs(bands, rows):
    con = duckdb.connect()
    path = os.path.join(SF_DIR, "documents.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    rel = con.execute(minhash_lsh_near_pairs_sql(bands, rows))
    return {(a, b): s for a, b, s in rel.fetchall()}


def test_r4_shape_matches_duckdb_twin(spark):
    got = _spark_pairs(spark, 4, 4)
    want = _duck_pairs(4, 4)
    assert got == want
    assert len(got) > 0  # the corpus has true near-dups; 4x4 must keep them


def test_r4_shape_suppresses_chance_collisions(spark):
    loose = _spark_pairs(spark, 4, 2)   # k=8,  P(band) ~ j^2
    tight = _spark_pairs(spark, 4, 4)   # k=16, P(band) ~ j^4
    # strictly fewer candidates: the chance floor shrinks ~j^2-fold
    assert len(tight) < len(loose)
    # certain pairs (every signature slot equal => every band collides
    # regardless of shape) survive any band shape
    certain = {p for p, s in loose.items() if s == 1.0}
    assert certain  # the synthetic corpus plants exact near-dups
    assert certain <= set(tight)


def test_rejects_shapes_beyond_parameter_pool(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    with pytest.raises(ValueError, match="parameter pairs"):
        minhash_lsh_near_pairs(docs, bands=5, rows_per_band=4)
