"""Deterministic sf1 (or any 0.1-multiple) dataset generator for scale
validation (round-3 VERDICT item 4: "surface a plan cliff before the final
round").

/root/testdata ships sf ≤ 0.1 and is read-only, so larger scale factors are
synthesized here, derived ONLY from the driver's own sf0.1 tables plus
seeded numpy — no external data (BASELINE.json input_hint discipline).

Two synthesis modes, chosen per table to preserve the property each query
family actually exercises:

* Relational tables (customer/orders/lineitem/part/supplier/events) are
  REPLICATED R times with per-replica key offsets. All keys in the driver's
  data are dense 0..N-1, so replica r adds r*N to every primary key and the
  SAME offset to every foreign key that references it — join fan-in per key,
  group counts per group-key value, and value distributions are preserved
  exactly, which is what aggregate/join/window plans care about.
  nation/region stay as-is (they are fixed dimensions at every TPC-H SF).

* documents/embeddings are GENERATED FRESH at R x the row count, mirroring
  the measured sf0.1 process (31-token vocab, uniform 10..100 token lengths,
  lang weights {en:.40, rest:.15}, source = src{doc_id %% 20}, unit-norm
  Gaussian d=64 embeddings, uniform labels 0..9) plus a linear dup process
  (~0.3%% exact copies, ~1.4%% near-copies at ~15%% token mutation). Plain
  replication would be wrong here: every replica of a doc would pair with
  every other replica, growing near-dup PAIRS quadratically in R instead of
  linearly — a property of the copy trick, not of a 10x corpus.

Usage: python tools/sfgen.py [--out /tmp/ofl_sf1] [--mult 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# one row group per ~64k rows: BOTH engines parallelize parquet scans at
# row-group granularity — the pyarrow default (1M rows) packs a 50k-row
# table into ONE group, pinning every DuckDB oracle scan (and the
# upstream half of each Spark stage) to a single thread
ROW_GROUP = 65536
# documents/embeddings are small-row-count but heavy per row (shingle
# explosion / d=64 lists downstream): finer groups so a 50k-row table
# still fans out to ~12 scan tasks
DOC_ROW_GROUP = 4096

# replicated tables: {table: [(column, stride_table)]}; stride = base row
# count of the table whose key space the column lives in
KEYED = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "_users")],
}
COPIED = ("nation", "region")

def _vocab() -> np.ndarray:
    """The driver's document vocabulary, derived from its own sf0.1 table
    (sorted for determinism) so sf1 shingles live in the same space."""
    texts = pq.read_table(f"{SRC}/documents.parquet", columns=["text"])
    words = set()
    for chunk in texts.column("text").chunks:
        for s in chunk.to_pylist():
            words.update(s.split())
    return np.array(sorted(words))


LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def replicate(table: str, mult: int, strides: dict[str, int], out: str):
    t = pq.read_table(f"{SRC}/{table}.parquet")
    reps = []
    for r in range(mult):
        if r == 0:
            reps.append(t)
            continue
        cols = {}
        for name in t.column_names:
            cols[name] = t.column(name)
        for col, space in KEYED[table]:
            arr = t.column(col).to_numpy() + r * strides[space]
            cols[col] = pa.array(arr, type=t.schema.field(col).type)
        reps.append(pa.table(cols, schema=t.schema))
    pq.write_table(pa.concat_tables(reps), f"{out}/{table}.parquet",
                   row_group_size=ROW_GROUP)


def gen_documents(n: int, rng: np.random.Generator, out: str):
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    kind = rng.random(n)  # <0.003 exact dup, <0.017 near dup, else fresh
    texts: list[str] = []
    vocab = _vocab()
    for i in range(n):
        if i > 64 and kind[i] < 0.003:
            j = int(rng.integers(0, i))
            texts.append(texts[j])
            langs[i] = langs[j]
        elif i > 64 and kind[i] < 0.017:
            j = int(rng.integers(0, i))
            toks = np.array(texts[j].split())
            flip = rng.random(len(toks)) < 0.15
            toks[flip] = vocab[rng.integers(0, len(vocab), size=int(flip.sum()))]
            texts.append(" ".join(toks))
            langs[i] = langs[j]
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab),
                                                     size=int(lens[i]))]))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([LANGS[x] for x in langs], type=pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)],
                               type=pa.string()),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet",
               row_group_size=DOC_ROW_GROUP)


def gen_embeddings(n: int, rng: np.random.Generator, out: str, d: int = 64):
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n), type=pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet",
               row_group_size=DOC_ROW_GROUP)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ofl_sf1")
    ap.add_argument("--mult", type=int, default=10,
                    help="row multiplier vs sf0.1 (10 => sf1, 100 => sf10)")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to generate (default all) "
                         "— the sf10 maintenance/LSH run needs only "
                         "documents[,embeddings], not 60M lineitem rows")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    want = set(args.tables.split(",")) if args.tables else None

    def wanted(t):
        return want is None or t in want

    strides = {
        t: pq.ParquetFile(f"{SRC}/{t}.parquet").metadata.num_rows
        for t in KEYED
    }
    strides["_users"] = 1500  # events.user_id space at sf0.1

    for t in COPIED:
        if wanted(t):
            pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                           f"{args.out}/{t}.parquet")
    for t in KEYED:
        if wanted(t):
            replicate(t, args.mult, strides, args.out)

    rng = np.random.default_rng(20260817)
    # documents draws FIRST from the shared stream: a documents-only subset
    # run is byte-identical to a full run; an embeddings-only run is not
    # (it would skip documents' draws) — generate both in that case
    if wanted("documents"):
        gen_documents(5000 * args.mult, rng, args.out)
    if wanted("embeddings"):
        if want is not None and "documents" not in want:
            raise SystemExit("embeddings requires documents in --tables "
                             "(shared rng stream; see comment)")
        gen_embeddings(2000 * args.mult, rng, args.out)
    print(f"wrote sf{args.mult / 10:g} dataset to {args.out}")


if __name__ == "__main__":
    main()
