"""Training-data text pipeline operators over the ``documents`` table:
exact dedup, MinHash+LSH, SimHash, n-gram Jaccard near-dup, language ID,
quality scoring, token stats, fingerprinting.

All pure DataFrame algebra — higher-order array functions, no Python UDFs
(north_rule). Every hash that must agree with the DuckDB oracle uses the
shared md5-derived 32-bit hash (``queries.base.h32``); every pair-finding
step blocks first (LSH bands / blocking keys), because at 100 TB the O(n²)
all-pairs comparison is never an option — candidate generation must be an
equi-join on a derived key (shuffle-partitionable), with the quadratic work
confined to within-bucket comparisons.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from open_finance_lakehouse_spark.queries import register
from open_finance_lakehouse_spark.queries.base import (
    H32_SQL,
    h32,
    load,
    load_fanout,
    r6,
)

# deterministic MinHash parameters: up to 16 affine hash functions mod a
# prime (the default shape uses the first 8; the r=4 rows/band shape that
# suppresses chance band collisions at web scale uses all 16 — BENCH/sf10.md)
MH_PRIME = 2_147_483_647
MH_PARAMS = [(2 * i + 3, 7 * i + 11) for i in range(16)]  # (a, b)

# ---------------------------------------------------------------------------
# candidate-budget guard for the EXACT pair-listing family
# ---------------------------------------------------------------------------

JACCARD_BUDGET_CONF = "spark.ofl.jaccard.candidateBudget"
DEFAULT_JACCARD_BUDGET = 500_000_000  # sf1 measured 108M (pm1); sf10 ~10B


class CandidateBudgetExceeded(RuntimeError):
    """The exact Jaccard blocking key (lang, len_bucket) has FIXED
    cardinality, so its candidate-pair mass grows quadratically with
    corpus size (measured ~97× at 10× docs, BENCH/sf1.md) — past the
    budget the verify join is an n² shuffle on a skewed key and must
    fail loudly, never be silently absorbed."""


def _enforce_candidate_budget(spark, blocks_df, block_cols, query: str):
    """One tiny aggregation (groupBy over the block keys — O(|blocks|)
    rows, computed WITHOUT materializing shingles) upper-bounds the
    blocked self-join's candidate count as Σ_b c_b·(c_b−1)/2. Exceeding
    ``spark.ofl.jaccard.candidateBudget`` (default 5e8; ≤0 disables)
    raises with the documented scale path: the banded MinHash-LSH variant
    (``doc_minhash_lsh_pairs``), whose candidate mass tracks the
    true-similar pair mass instead of corpus size."""
    budget = int(spark.conf.get(JACCARD_BUDGET_CONF,
                                str(DEFAULT_JACCARD_BUDGET)))
    if budget <= 0:
        return
    est = (
        blocks_df.groupBy(*block_cols).count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .first()["p"]
    ) or 0
    if est > budget:
        raise CandidateBudgetExceeded(
            f"{query}: blocked self-join would generate ~{int(est):,} "
            f"candidate pairs (> budget {budget:,}; conf "
            f"{JACCARD_BUDGET_CONF}). The exact length-blocked variant is "
            "quadratic in corpus size on a fixed-cardinality key — use "
            "doc_minhash_lsh_pairs (banded LSH prefilter) at this scale, "
            "or raise/disable the budget explicitly.")

_TOKENS_SQL = "string_split(text, ' ')"

# trigram shingles, 0-indexed (Spark) vs 1-indexed (DuckDB). The <3-token
# case must be an EMPTY array, guarded explicitly: sequence(0, -1) yields
# [0, -1] (a descending sequence, not []), which under ANSI mode turns
# split(text)[2] into an INVALID_ARRAY_INDEX crash — and the DuckDB
# oracle's generate_series(1, 0) correctly yields [].
_SHINGLES = (
    "CASE WHEN size(split(text,' ')) < 3 THEN cast(array() as array<string>)"
    " ELSE array_distinct(transform(sequence(0, size(split(text,' '))-3),"
    " i -> concat_ws(' ', split(text,' ')[i], split(text,' ')[i+1],"
    " split(text,' ')[i+2]))) END"
)
_SHINGLES_SQL = (
    "list_distinct(list_transform(generate_series(1,"
    " greatest(len(string_split(text,' '))-2, 0)),"
    " i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]"
    " || ' ' || string_split(text,' ')[i+2]))"
)


@register(
    "doc_exact_dedup",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keeper_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def doc_exact_dedup(spark, sf_dir):
    """Exact dedup by content hash: one shuffle on the digest, keeper =
    min(doc_id) (deterministic, reference A2 discipline). At scale the
    digest groupBy is the cheapest possible dedup — no pairwise work."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "doc_token_stats",
    f"""
    SELECT doc_id,
           len({_TOKENS_SQL}) AS n_tokens,
           len(list_distinct({_TOKENS_SQL})) AS n_distinct_tokens,
           round(len(list_distinct({_TOKENS_SQL}))::DOUBLE
                 / len({_TOKENS_SQL}), 6) AS ttr,
           n_chars,
           round(n_chars::DOUBLE / len({_TOKENS_SQL}), 6) AS chars_per_token
    FROM documents
    """,
)
def doc_token_stats(spark, sf_dir):
    """Token counting + type/token-ratio quality signal — whitespace
    tokenizer as a pure array expression (the BPE-ish regex variant is the
    same plan with a regexp split)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        r6(F.size(F.array_distinct(toks)).cast("double") / F.size(toks))
        .alias("ttr"),
        "n_chars",
        r6(F.col("n_chars").cast("double") / F.size(toks))
        .alias("chars_per_token"),
    )


@register(
    "doc_quality_score",
    f"""
    SELECT doc_id,
           CASE WHEN len({_TOKENS_SQL}) BETWEEN 20 AND 400
                 AND len(list_distinct({_TOKENS_SQL}))::DOUBLE
                     / len({_TOKENS_SQL}) >= 0.3
                THEN 'keep' ELSE 'drop' END AS verdict,
           round(least(len({_TOKENS_SQL}) / 400.0, 1.0) * 0.5
                 + (len(list_distinct({_TOKENS_SQL}))::DOUBLE
                    / len({_TOKENS_SQL})) * 0.5, 6) AS quality
    FROM documents
    """,
)
def doc_quality_score(spark, sf_dir):
    """Heuristic quality gate (length band + lexical diversity) with an
    explicit keep/drop verdict — the filter stage of a training-data
    pipeline, expressed so the verdict is pushdown-able."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)).cast("double") / n
    return d.select(
        "doc_id",
        F.when(n.between(20, 400) & (ttr >= 0.3), "keep").otherwise("drop")
        .alias("verdict"),
        r6(F.least(n / F.lit(400.0), F.lit(1.0)) * 0.5 + ttr * 0.5)
        .alias("quality"),
    )


_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in"],
    "es": ["el", "la", "de", "que", "y", "en"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "zh": ["de", "shi", "le", "zai", "wo", "you"],
}


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _LANG_STOPWORDS[lang])
    return (f"len(list_intersect(list_distinct({_TOKENS_SQL}), [{words}])) ")


@register(
    "doc_lang_id",
    f"""
    SELECT doc_id, lang AS lang_label,
           CASE
             WHEN {_lang_score_sql('en')} >= greatest({_lang_score_sql('es')},
                  {_lang_score_sql('fr')}, {_lang_score_sql('de')},
                  {_lang_score_sql('zh')}, 1) THEN 'en'
             WHEN {_lang_score_sql('es')} >= greatest({_lang_score_sql('fr')},
                  {_lang_score_sql('de')}, {_lang_score_sql('zh')}, 1) THEN 'es'
             WHEN {_lang_score_sql('fr')} >= greatest({_lang_score_sql('de')},
                  {_lang_score_sql('zh')}, 1) THEN 'fr'
             WHEN {_lang_score_sql('de')} >= greatest({_lang_score_sql('zh')}, 1)
                  THEN 'de'
             WHEN {_lang_score_sql('zh')} >= 1 THEN 'zh'
             ELSE 'und' END AS lang_pred
    FROM documents
    """,
)
def doc_lang_id(spark, sf_dir):
    """Stopword-overlap language ID: per-language evidence = |distinct
    tokens ∩ stopword list|, argmax with a fixed priority tie-break
    (deterministic CASE ladder)."""
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scores = {
        lang: F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in _LANG_STOPWORDS.items()
    }
    order = ["en", "es", "fr", "de", "zh"]
    pred = F.lit("und")
    for lang in reversed(order):
        later = [scores[o] for o in order[order.index(lang) + 1:]]
        floor = F.greatest(*later, F.lit(1)) if later else F.lit(1)
        pred = F.when(scores[lang] >= floor, lang).otherwise(pred)
    return d.select("doc_id", F.col("lang").alias("lang_label"),
                    pred.alias("lang_pred"))


def _doc_fingerprint_sql():
    # deferred: _simhash_cols is defined below with the SimHash family
    return f"""
    WITH fp AS (
      SELECT doc_id, bit_xor(h * i) AS fingerprint FROM (
        SELECT doc_id,
               {H32_SQL.format(x='tok')} AS h,
               i + 1 AS i
        FROM (SELECT doc_id,
                     unnest({_TOKENS_SQL}) AS tok,
                     unnest(range(len({_TOKENS_SQL}))) AS i
              FROM documents))
      GROUP BY doc_id),
    sh AS (
      SELECT doc_id,
             CAST({_simhash_cols(H32_SQL.format(x='tok'), 'count(*)')}
               AS BIGINT) AS simhash
      FROM (SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS tok
            FROM documents)
      GROUP BY doc_id)
    SELECT fp.doc_id, fp.fingerprint, sh.simhash
    FROM fp JOIN sh ON fp.doc_id = sh.doc_id
    """


def doc_fingerprint(spark, sf_dir):
    """Per-document signature pair over one `documents` scan family:
    (a) order-sensitive fingerprint — XOR-fold of position-weighted token
    hashes, pure array algebra (no shuffle); (b) the 32-bit SimHash from
    :func:`doc_simhash` (majority vote per bit over distinct-token hashes).
    Both recomputed independently by the oracle via unnest + aggregation
    (two code paths, reference discipline
    /root/reference/ofl/streaming/schema.py:57-73).  One oracled entry
    covers both signature families; ``doc_simhash`` stays the reusable
    building block for the near-pair join."""
    d = load_fanout(spark, sf_dir, "documents")
    fp = F.expr(
        "aggregate(zip_with(split(text,' '), sequence(1, size(split(text,' '))), "
        "(t, i) -> cast(conv(substring(md5(t),1,8),16,10) as bigint) * i), "
        "0L, (acc, x) -> acc ^ x)"
    )
    # FUSED plan: the fingerprint (per-row array algebra) rides the
    # SimHash explode and comes back through the same groupBy as a
    # first() — ONE documents scan and ONE shuffle, where the old
    # fp-join-simhash shape paid two scans plus a join exchange
    tok = d.select(
        "doc_id", fp.alias("fingerprint"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    ).withColumn("h", h32(F.col("tok")))
    return (tok.groupBy("doc_id")
            .agg(F.first("fingerprint").alias("fingerprint"),
                 _simhash_agg_col()))


@register(
    "doc_ngram_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars // 64 AS len_bucket,
             {_SHINGLES_SQL} AS shingles
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6)
             AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.05
    """,
)
def doc_ngram_jaccard_pairs(spark, sf_dir):
    """Trigram-shingle Jaccard near-dup with blocking: candidates must share
    (lang, length bucket) — an equi-join — before any set comparison. The
    blocked join is the scale story: pairwise work is confined to buckets,
    never n² over the corpus — and a candidate-budget guard fails loudly
    when the fixed-cardinality blocking key makes even that quadratic
    (the scale path is doc_minhash_lsh_pairs)."""
    d = load_fanout(spark, sf_dir, "documents")
    _enforce_candidate_budget(
        spark,
        d.select("lang",
                 (F.col("n_chars") / 64).cast("long").alias("len_bucket")),
        ["lang", "len_bucket"], "doc_ngram_jaccard_pairs")
    sh = d.select(
        "doc_id", "lang",
        (F.col("n_chars") / 64).cast("long").alias("len_bucket"),
        F.expr(_SHINGLES).alias("shingles"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    # |A∪B| = |A|+|B|-|A∩B| (shingles are array_distinct'ed at creation,
    # so the set identity is exact): ONE set operation per candidate pair
    # instead of intersect+union — the pair verify is the dominant cost
    # (measured 2x on the sf1 candidate load)
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = (F.size(F.col("a.shingles")) + F.size(F.col("b.shingles"))
             - inter)
    # try_divide: both shingle sets can be EMPTY (<3-token docs guard to
    # []), and 0/0 is a DIVIDE_BY_ZERO crash under the ANSI default —
    # NULL (the oracle's 0/0) fails the threshold filter identically
    jac = F.try_divide(inter.cast("double"), union)
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.len_bucket") == F.col("b.len_bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .filter(jac >= 0.05)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                r6(jac).alias("jaccard"))
    )


@register(
    "doc_ngram_jaccard_pairs_pm1",
    f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars // 64 AS len_bucket,
             {_SHINGLES_SQL} AS shingles
      FROM documents),
    keyed AS (
      SELECT doc_id, lang, len_bucket, shingles,
             unnest([len_bucket, len_bucket + 1]) AS block
      FROM sh)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / (len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles))), 6)
             AS jaccard
    FROM keyed a JOIN keyed b
      ON a.lang = b.lang AND a.block = b.block AND a.doc_id < b.doc_id
     AND a.block = greatest(a.len_bucket, b.len_bucket)
    WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
          / (len(a.shingles) + len(b.shingles)
             - len(list_intersect(a.shingles, b.shingles))) >= 0.05
    """,
)
def doc_ngram_jaccard_pairs_pm1(spark, sf_dir):
    """Jaccard near-dup with ±1-bucket blocking: the plain length-bucket
    block misses near-dup pairs straddling a bucket boundary (r1 VERDICT's
    documented recall trade); registering every doc under {bucket,
    bucket+1} and joining on the block key recovers all |Δbucket| ≤ 1
    pairs while staying a pure EQUI-join (shuffle-partitionable at corpus
    scale). Each qualifying pair matches exactly once — at block =
    max(bucket_a, bucket_b) — so no post-join distinct is needed.

    Deliberately NOT persisted (unlike the minhash/simhash signature
    subplans): the explode is a Generate barrier, so Catalyst cannot
    collapse the shingle projection into the join, and caching the large
    shingle arrays measured 3.5× SLOWER than recomputing them once per
    keyed row (17 s vs 4.8 s at sf0.1 local[32], min-of-3)."""
    d = load_fanout(spark, sf_dir, "documents")
    _enforce_candidate_budget(
        spark,
        d.select(
            "lang",
            F.explode(F.array(
                (F.col("n_chars") / 64).cast("long"),
                (F.col("n_chars") / 64).cast("long") + 1)).alias("block")),
        ["lang", "block"], "doc_ngram_jaccard_pairs_pm1")
    sh = d.select(
        "doc_id", "lang",
        (F.col("n_chars") / 64).cast("long").alias("len_bucket"),
        F.expr(_SHINGLES).alias("shingles"),
    )
    keyed = sh.select(
        "*", F.explode(F.array(F.col("len_bucket"),
                               F.col("len_bucket") + 1)).alias("block"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    # arithmetic union (see doc_ngram_jaccard_pairs): one set op per pair
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = (F.size(F.col("a.shingles")) + F.size(F.col("b.shingles"))
             - inter)
    # try_divide: both shingle sets can be EMPTY (<3-token docs guard to
    # []), and 0/0 is a DIVIDE_BY_ZERO crash under the ANSI default —
    # NULL (the oracle's 0/0) fails the threshold filter identically
    jac = F.try_divide(inter.cast("double"), union)
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.block") == F.col("b.block"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               & (F.col("a.block") == F.greatest(F.col("a.len_bucket"),
                                                 F.col("b.len_bucket"))))
        .filter(jac >= 0.05)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                r6(jac).alias("jaccard"))
    )


def _minhash_expr_spark(k: int = 8) -> str:
    """array<long> signature: for each (a,b) param, min over shingles of
    (a * h32(s) + b) % prime. Hashes each shingle ONCE (column ``sh32``,
    projected upstream), then applies the k affine maps to the hash array —
    k× cheaper than re-hashing per function."""
    parts = ", ".join(
        f"array_min(transform(sh32, h -> pmod({a}L * h + {b}L, {MH_PRIME}L)))"
        for a, b in MH_PARAMS[:k]
    )
    return f"array({parts})"


def _minhash_expr_sql(k: int = 8) -> str:
    parts = ", ".join(
        f"list_min(list_transform({_SHINGLES_SQL}, s -> "
        f"({a} * {H32_SQL.format(x='s')} + {b}) % {MH_PRIME}))"
        for a, b in MH_PARAMS[:k]
    )
    return f"[{parts}]"


# band-key fold: an overflow-safe modular polynomial over the band's r
# signature slots. Every intermediate stays < (MOD-1)*PRIME + MH_PRIME
# ≈ 8.6e18 < 2^63-1, so the SAME arithmetic is exact in Spark (BIGINT
# wraparound never reached) and DuckDB (which RAISES on BIGINT overflow —
# the naive s0*P + s1 chain from r=2 cannot extend to r=4).
BAND_KEY_PRIME = 4_000_000_037
BAND_KEY_MOD = 2_147_483_647


def _band_key_exprs(bands: int, rows_per_band: int,
                    one_indexed: bool) -> list[str]:
    """One expression per band over ``sig`` (0-indexed for Spark,
    1-indexed for DuckDB): fold k = (k * PRIME + slot) % MOD."""
    keys = []
    for b in range(bands):
        expr = "0"
        for j in range(rows_per_band):
            idx = b * rows_per_band + j + (1 if one_indexed else 0)
            expr = (f"(({expr}) * {BAND_KEY_PRIME} + sig[{idx}])"
                    f" % {BAND_KEY_MOD}")
        keys.append(expr)
    return keys


def minhash_lsh_near_pairs(docs, *, bands: int = 4, rows_per_band: int = 2):
    """Parameterized MinHash-LSH near-dup over a ``documents``-shaped
    DataFrame: shingle → k = bands·rows_per_band affine min-hashes →
    candidates = docs sharing a band key (EQUI-join on the band key: the
    LSH trick that makes near-dup shuffle-partitionable at 100 TB) →
    estimated similarity = fraction of matching signature slots.

    The band SHAPE is the scale lever (BENCH/sf10.md): a pair with true
    Jaccard j collides by chance in one band with probability ~j^r, so on
    a low-diversity corpus where unrelated pairs share shingles
    (j ≈ 0.02–0.05), r=4 rows/band suppresses the O(n²·j^r) chance-candidate
    floor ~j²-fold vs r=2 for the same banded-equi-join plan shape, while
    true near-dups (j → 1) still collide with probability → 1.
    """
    k = bands * rows_per_band
    if k > len(MH_PARAMS):
        raise ValueError(
            f"bands*rows_per_band = {k} exceeds the {len(MH_PARAMS)} "
            "deterministic MinHash parameter pairs")
    sig = (
        docs.select(
            "doc_id",
            F.expr(
                f"transform({_SHINGLES}, s -> "
                "cast(conv(substring(md5(s),1,8),16,10) as bigint))"
            ).alias("sh32"),
        )
        .filter(F.size("sh32") > 0)
        .select("doc_id", F.expr(_minhash_expr_spark(k)).alias("sig"))
    )
    # persist: the signature subplan feeds THREE consumers (bands, sa, sb);
    # without the InMemoryRelation barrier Catalyst re-runs the shingle +
    # k-fold min-hash per consumer (measured 3x the bench cost — VERDICT r1)
    sig = sig.persist()

    key_list = ", ".join(_band_key_exprs(bands, rows_per_band,
                                         one_indexed=False))
    bands_df = sig.select(
        "doc_id", "sig",
        F.posexplode(F.expr(f"array({key_list})")).alias("band", "band_key"),
    )
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    F.col("sig").alias("sig_b"))
    matches = F.size(F.expr(
        f"filter(sequence(0, {k - 1}), i -> sig_a[i] = sig_b[i])"))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b",
                r6(matches.cast("double") / k).alias("est_similarity"))
    )


def minhash_lsh_near_pairs_sql(bands: int = 4,
                               rows_per_band: int = 2) -> str:
    """DuckDB twin of :func:`minhash_lsh_near_pairs` for the same band
    shape — the two-code-path reconciliation discipline."""
    k = bands * rows_per_band
    key_list = ", ".join(_band_key_exprs(bands, rows_per_band,
                                         one_indexed=True))
    return f"""
    WITH sig AS (
      SELECT doc_id, {_minhash_expr_sql(k)} AS sig FROM documents
      WHERE len({_SHINGLES_SQL}) > 0),
    bands AS (
      SELECT doc_id, sig,
             unnest(range({bands})) AS band,
             unnest([{key_list}]) AS band_key
      FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           round(len(list_filter(range({k}),
                 i -> sa.sig[i + 1] = sb.sig[i + 1]))::DOUBLE / {k}, 6)
             AS est_similarity
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    """


@register("doc_minhash_lsh_pairs", minhash_lsh_near_pairs_sql(4, 2))
def doc_minhash_lsh_pairs(spark, sf_dir):
    """MinHash + LSH near-dup at the default shape (k=8, 4 bands × 2 rows):
    the oracled entry of :func:`minhash_lsh_near_pairs` — the r=4 shape
    (k=16, 4×4) that suppresses the chance-collision floor at web scale is
    the same code path, parity-tested against its own DuckDB twin in
    ``tests/test_lsh_shapes.py``."""
    d = load_fanout(spark, sf_dir, "documents")
    return minhash_lsh_near_pairs(d, bands=4, rows_per_band=2)


def _simhash_cols(h_expr: str, n_expr: str, bits: int = 32):
    """SQL fragment: simhash = Σ_j (cnt_j > n/2) << j, identical text in
    both dialects given engine-appropriate hash/count exprs."""
    terms = " + ".join(
        f"(CASE WHEN sum(({h_expr} >> {j}) & 1) * 2 > {n_expr}"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return terms


def _simhash_agg_col():
    """The 32-bit majority-vote reassembly as ONE aggregate Column over
    exploded (doc_id, h) rows — shared by doc_simhash and the fused
    doc_fingerprint plan so the two can never drift."""
    n = F.count(F.lit(1))
    sim = None
    for j in range(32):
        bit = F.when(
            F.sum(F.shiftright("h", j).bitwiseAND(1)) * 2 > n, 1 << j
        ).otherwise(0)
        sim = bit if sim is None else sim + bit
    return sim.cast("bigint").alias("simhash")


def doc_simhash(spark, sf_dir):
    """SimHash: per bit j, majority vote of distinct-token hash bits.
    Formulated as explode → 32 conditional sums → bit reassembly, so the
    whole computation is one shuffle on doc_id (combinable map-side)."""
    d = load_fanout(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    ).withColumn("h", h32(F.col("tok")))
    return tok.groupBy("doc_id").agg(_simhash_agg_col())


# registered here (not at the def site): the oracle SQL reuses
# _simhash_cols, which is defined with the SimHash family above
register("doc_fingerprint", _doc_fingerprint_sql())(doc_fingerprint)


@register(
    "doc_simhash_near_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id,
             CAST({_simhash_cols(H32_SQL.format(x='tok'), 'count(*)')} AS BIGINT)
               AS simhash
      FROM (SELECT doc_id, unnest(list_distinct({_TOKENS_SQL})) AS tok
            FROM documents)
      GROUP BY doc_id),
    keyed AS (
      SELECT doc_id, simhash, unnest([0, 1]) AS half,
             unnest([simhash >> 16, simhash & 65535]) AS half_key
      FROM sh)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
    FROM keyed a JOIN keyed b
      ON a.half = b.half AND a.half_key = b.half_key AND a.doc_id < b.doc_id
    JOIN sh sa ON sa.doc_id = a.doc_id
    JOIN sh sb ON sb.doc_id = b.doc_id
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 6
    """,
)
def doc_simhash_near_pairs(spark, sf_dir):
    """SimHash near-dup pairs: block on 16-bit signature halves (any pair
    within Hamming ≤ 6 of 32 bits shares at least one exact half only
    heuristically — the standard multi-block recall/precision trade), then
    verify with bit_count(xor). Candidates come from an equi-join on the
    half key — no n² comparison."""
    # persist: sh feeds keyed + both verify sides (same 3x-recompute barrier
    # as doc_minhash_lsh_pairs)
    sh = doc_simhash(spark, sf_dir).persist()
    keyed = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(
            F.shiftright("simhash", 16),
            F.col("simhash").bitwiseAND(65535),
        )).alias("half", "half_key"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.half") == F.col("b.half"))
               & (F.col("a.half_key") == F.col("b.half_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("sim_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("sim_b"))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(ham <= 6)
        # no .distinct(): cand is already distinct and sa/sb carry ONE
        # row per doc_id, so the join cannot duplicate — the old final
        # distinct shuffled the whole result set to remove nothing
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
    )
