"""Relational operator coverage (SURVEY.md §2.2–§2.9) over the driver's
TPC-H-ish tables. Every query is a pure DataFrame plan (no Python UDFs)
with an independent DuckDB SQL oracle.

Plan-shape rules applied throughout (SURVEY.md §4, 100 TB discipline):
- dimension joins broadcast explicitly (region/nation/part are small);
- aggregations are single groupBy passes (map-side partial aggregation is
  free in Spark for algebraic aggregates);
- all doubles rounded identically on both sides so value-hash comparison is
  representation-stable;
- window rank-1 replaces any "first row" logic (deterministic under
  shuffle — /root/reference/ofl/transform/spark/silver.py:39-44).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.queries import register
from open_finance_lakehouse_spark.queries.base import load, r2, r6

# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """Grouped algebraic aggregate ladder (reference A1/A3 shape,
    /root/reference/ofl/streaming/silver.py:108-134). One shuffle on the
    group keys; partial aggregation map-side."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
               ).alias("sum_disc_price"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                     * (1 + F.col("l_tax")))).alias("sum_charge"),
            r6(F.avg("l_quantity")).alias("avg_qty"),
            r6(F.avg("l_extendedprice")).alias("avg_price"),
            r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "nation_customer_audit",
    """
    SELECT n.n_name,
           count(*)                        AS n_cust,
           count(DISTINCT c.c_mktsegment)  AS n_segments,
           round(sum(c.c_acctbal), 2)      AS sum_bal,
           round(avg(c.c_acctbal), 6)      AS avg_bal,
           min(c.c_name)                   AS first_name,
           max(c.c_name)                   AS last_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def nation_customer_audit(spark, sf_dir):
    """Table-audit aggregate family (reference A7/A11,
    /root/reference/ofl/streaming/metrics.py:106-126) with an explicit
    broadcast of the 25-row nation dim (J1 discipline)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            r2(F.sum("c_acctbal")).alias("sum_bal"),
            r6(F.avg("c_acctbal")).alias("avg_bal"),
            F.min("c_name").alias("first_name"),
            F.max("c_name").alias("last_name"),
        )
    )


@register(
    "priority_pivot",
    """
    SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS order_year,
           round(max(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS urgent_max,
           round(max(CASE WHEN o_orderpriority = '2-HIGH'   THEN o_totalprice END), 2) AS high_max,
           round(max(CASE WHEN o_orderpriority = '5-LOW'    THEN o_totalprice END), 2) AS low_max,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def priority_pivot(spark, sf_dir):
    """Pivot via conditional aggregate (reference A4 `max(x) FILTER (WHERE ...)`,
    /root/reference/ofl/transform/gold/models/mart_di_curve_slope.sql:17-27)."""
    o = load(spark, sf_dir, "orders")
    year = F.to_date(F.date_trunc("year", "o_orderdate")).alias("order_year")

    def pick(p):
        return F.max(F.when(F.col("o_orderpriority") == p,
                            F.col("o_totalprice")))

    return o.groupBy(year).agg(
        r2(pick("1-URGENT")).alias("urgent_max"),
        r2(pick("2-HIGH")).alias("high_max"),
        r2(pick("5-LOW")).alias("low_max"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "compounded_discount",
    """
    SELECT l_orderkey,
           round(product(1 + l_discount), 6) AS compounded
    FROM lineitem GROUP BY l_orderkey
    """,
)
def compounded_discount(spark, sf_dir):
    """Multiplicative compounding via exp(sum(ln)) — Spark has no product()
    aggregate; the oracle uses DuckDB's native product(), reproducing the
    reference's two-code-path reconciliation of exactly this identity
    (A5/A6, /root/reference/ofl/transform/gold/models/mart_real_interest.sql:12-13
    vs checks/assert_real_interest_ipca_recomputes.sql:33)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        r6(F.exp(F.sum(F.log(1 + F.col("l_discount"))))).alias("compounded")
    )


@register(
    "having_month_gate",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           count(*) AS n
    FROM orders GROUP BY 1 HAVING count(*) >= 150
    """,
)
def having_month_gate(spark, sf_dir):
    """HAVING count gate (reference A9,
    /root/reference/ofl/transform/gold/checks/assert_real_interest_ipca_recomputes.sql:40)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate"))
                  .alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 150)
    )


@register(
    "distinct_status_priority",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_status_priority(spark, sf_dir):
    """DISTINCT projection (reference A10)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority").distinct()


@register(
    "deterministic_extremes",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice ASC,  o_orderkey ASC)  AS rn_min,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max
      FROM orders)
    SELECT o_custkey,
           max(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_order,
           max(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_order
    FROM ranked GROUP BY o_custkey
    """,
)
def deterministic_extremes(spark, sf_dir):
    """Deterministic first/last via min_by/max_by over a composite key
    (reference A2, /root/reference/ofl/streaming/silver.py:110-114 — "a sum
    is not idempotent; first() is not deterministic"). The oracle recomputes
    with window rank — two independent code paths."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))")
        .alias("cheapest_order"),
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))")
        .alias("priciest_order"),
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@register(
    "latest_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def latest_order_per_customer(spark, sf_dir):
    """Latest-per-key dedup, the reference's W1 keystone window
    (/root/reference/ofl/transform/spark/silver.py:67-72) — also the MERGE
    source-prep pattern."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "order_pct_change",
    """
    SELECT o_custkey, o_orderkey,
           round((o_totalprice - lag(o_totalprice) OVER w)
                 / lag(o_totalprice) OVER w * 100, 6) AS pct_change
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_pct_change(spark, sf_dir):
    """lag()-based pct change (reference W2,
    /root/reference/ofl/transform/spark/silver.py:356) with a named reused
    window (W8)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey", "o_orderkey",
        r6((F.col("o_totalprice") - prev) / prev * 100).alias("pct_change"),
    )


@register(
    "rolling_order_stats",
    """
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER w, 6) AS roll_avg,
           count(*) OVER w                    AS roll_n
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_order_stats(spark, sf_dir):
    """Rolling row-frame stats with the completeness count the reference
    pairs with every rolling window (W3 + W9,
    /root/reference/ofl/transform/spark/silver.py:350-359,
    models/mart_real_interest.sql:14)."""
    o = load(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey").rowsBetween(-4, 0))
    return o.select(
        "o_custkey", "o_orderkey",
        r6(F.avg("o_totalprice").over(w)).alias("roll_avg"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


@register(
    "mtd_first_price",
    """
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER (
             PARTITION BY o_custkey, date_trunc('month', o_orderdate)
             ORDER BY o_orderdate, o_orderkey), 2) AS mtd_first
    FROM orders
    """,
)
def mtd_first_price(spark, sf_dir):
    """first_value within month partition (reference W4,
    /root/reference/ofl/transform/gold/models/mart_fx.sql:22-23)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy(
        "o_custkey", F.date_trunc("month", "o_orderdate")
    ).orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        r2(F.first("o_totalprice").over(w)).alias("mtd_first"),
    )


@register(
    "top3_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def top3_orders_per_priority(spark, sf_dir):
    """Top-k as window rank (reference never uses LIMIT for top-k — W5/W6,
    /root/reference/ofl/transform/gold/models/mart_di_curve_points.sql:66-84)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "lineitem_order_share",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_quantity / sum(l_quantity)
                 OVER (PARTITION BY l_orderkey), 6) AS qty_share,
           count(*) OVER (PARTITION BY l_orderkey)  AS order_lines
    FROM lineitem
    """,
)
def lineitem_order_share(spark, sf_dir):
    """Unbounded per-partition window aggregates (reference W7,
    /root/reference/ofl/streaming/models/mart_trade_latest_nrt.sql:19-21)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey", "l_linenumber",
        r6(F.col("l_quantity") / F.sum("l_quantity").over(w))
        .alias("qty_share"),
        F.count(F.lit(1)).over(w).alias("order_lines"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "brand_lineitem_rollup",
    """
    SELECT p.p_brand, p.p_type,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
    GROUP BY p.p_brand, p.p_type
    """,
)
def brand_lineitem_rollup(spark, sf_dir):
    """Inner equi-join with constant predicate on the dim side (reference J1,
    /root/reference/ofl/transform/gold/models/mart_di_curve_points.sql:38-42)
    — dim broadcast so the 600k-row fact never shuffles."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             r2(F.sum("l_extendedprice")).alias("revenue"))
    )


@register(
    "customer_order_coverage",
    """
    SELECT c.c_custkey,
           count(o.o_orderkey)                        AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def customer_order_coverage(spark, sf_dir):
    """LEFT equi-join preserving unmatched dimension rows (reference J2,
    /root/reference/ofl/transform/gold/models/mart_futures_curve.sql:41-43)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"),
             r2(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("spend"))
    )


@register(
    "region_band_grid",
    """
    SELECT r.r_name, b.band_lo, b.band_hi,
           count(CASE WHEN c.c_acctbal >= b.band_lo
                       AND c.c_acctbal <  b.band_hi THEN 1 END) AS n_cust
    FROM region r
    CROSS JOIN (VALUES (0.0::DOUBLE, 2500.0::DOUBLE),
                       (2500.0::DOUBLE, 5000.0::DOUBLE),
                       (5000.0::DOUBLE, 7500.0::DOUBLE),
                       (7500.0::DOUBLE, 10000.1::DOUBLE)) b(band_lo, band_hi)
    LEFT JOIN nation n   ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, b.band_lo, b.band_hi
    """,
)
def region_band_grid(spark, sf_dir):
    """Cross join against a constructed grid (reference J3 strip×tenor grid,
    /root/reference/ofl/transform/gold/models/mart_di_curve_points.sql:50-54)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    bands = r.sparkSession.createDataFrame(
        [(0.0, 2500.0), (2500.0, 5000.0), (5000.0, 7500.0), (7500.0, 10000.1)],
        "band_lo double, band_hi double",
    )
    return (
        r.crossJoin(F.broadcast(bands))
        .join(F.broadcast(n), n.n_regionkey == r.r_regionkey, "left")
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("r_name", "band_lo", "band_hi")
        .agg(F.count(F.when(
            (F.col("c_acctbal") >= F.col("band_lo"))
            & (F.col("c_acctbal") < F.col("band_hi")), 1)).alias("n_cust"))
    )


@register(
    "trailing_quarter_orders",
    """
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             count(*) AS n
      FROM orders GROUP BY 1)
    SELECT cur.month, cur.n,
           CAST(sum(w.n) AS BIGINT) AS trailing_3m
    FROM m cur JOIN m w
      ON w.month >= cur.month - INTERVAL 2 MONTH AND w.month <= cur.month
    GROUP BY cur.month, cur.n
    """,
)
def trailing_quarter_orders(spark, sf_dir):
    """Range/interval self-join over a calendar window (reference J4,
    /root/reference/ofl/transform/gold/checks/assert_real_interest_ipca_recomputes.sql:34-40).
    Pre-aggregated to months first so the non-equi join is a broadcast
    nested loop over ~80 rows, not 150k."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate"))
                  .alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cur = m.alias("cur")
    w = m.alias("w")
    return (
        cur.join(
            F.broadcast(w),
            (F.col("w.month") >= F.add_months(F.col("cur.month"), -2))
            & (F.col("w.month") <= F.col("cur.month")),
        )
        .groupBy(F.col("cur.month").alias("month"), F.col("cur.n").alias("n"))
        .agg(F.sum("w.n").cast("bigint").alias("trailing_3m"))
    )


@register(
    "month_coverage_reconcile",
    """
    WITH om AS (SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS month
                FROM orders),
         lm AS (SELECT DISTINCT CAST(date_trunc('month', l_shipdate) AS DATE) AS month
                FROM lineitem)
    SELECT coalesce(om.month, lm.month) AS month,
           CASE WHEN om.month IS NULL THEN 'missing_in_orders'
                WHEN lm.month IS NULL THEN 'missing_in_lineitem'
                ELSE 'both' END AS status
    FROM om FULL OUTER JOIN lm ON om.month = lm.month
    """,
)
def month_coverage_reconcile(spark, sf_dir):
    """FULL OUTER coverage reconciliation where one-sided presence is its own
    violation reason (reference J6,
    /root/reference/ofl/transform/gold/checks/assert_real_interest_ipca_recomputes.sql:51-64)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    om = o.select(F.to_date(F.date_trunc("month", "o_orderdate"))
                  .alias("om_month")).distinct()
    lm = li.select(F.to_date(F.date_trunc("month", "l_shipdate"))
                   .alias("lm_month")).distinct()
    j = om.join(lm, om.om_month == lm.lm_month, "full_outer")
    return j.select(
        F.coalesce("om_month", "lm_month").alias("month"),
        F.when(F.col("om_month").isNull(), "missing_in_orders")
        .when(F.col("lm_month").isNull(), "missing_in_lineitem")
        .otherwise("both").alias("status"),
    )


@register(
    "nation_region_names",
    """
    SELECT n.n_name, r.r_name FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def nation_region_names(spark, sf_dir):
    """USING-key inner join (reference J7,
    /root/reference/ofl/transform/gold/models/mart_real_interest.sql:28-29)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_name", "r_name")
    )


@register(
    "qty_bracketing",
    """
    WITH lower_leg AS (
      SELECT l_orderkey, l_quantity FROM (
        SELECT l_orderkey, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
        FROM lineitem WHERE l_quantity <= 25) WHERE rn = 1),
    upper_leg AS (
      SELECT l_orderkey, l_quantity FROM (
        SELECT l_orderkey, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY l_quantity ASC, l_linenumber ASC) AS rn
        FROM lineitem WHERE l_quantity > 25) WHERE rn = 1)
    SELECT coalesce(lo.l_orderkey, up.l_orderkey) AS l_orderkey,
           lo.l_quantity AS lower_qty, up.l_quantity AS upper_qty
    FROM lower_leg lo FULL OUTER JOIN upper_leg up
      ON lo.l_orderkey = up.l_orderkey
    """,
)
def qty_bracketing(spark, sf_dir):
    """Bracketing join: nearest value ≤ / > a target per key, as two
    windowed rank-1 frames joined (reference J8 + W5,
    /root/reference/ofl/transform/gold/models/mart_di_curve_points.sql:66-114)."""
    li = load(spark, sf_dir, "lineitem")
    lo_w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_quantity"), F.asc("l_linenumber"))
    up_w = Window.partitionBy("l_orderkey").orderBy(
        F.asc("l_quantity"), F.asc("l_linenumber"))
    lower = (
        li.filter(F.col("l_quantity") <= 25)
        .withColumn("rn", F.row_number().over(lo_w)).filter("rn = 1")
        .select(F.col("l_orderkey").alias("lo_key"),
                F.col("l_quantity").alias("lower_qty"))
    )
    upper = (
        li.filter(F.col("l_quantity") > 25)
        .withColumn("rn", F.row_number().over(up_w)).filter("rn = 1")
        .select(F.col("l_orderkey").alias("up_key"),
                F.col("l_quantity").alias("upper_qty"))
    )
    j = lower.join(upper, lower.lo_key == upper.up_key, "full_outer")
    return j.select(
        F.coalesce("lo_key", "up_key").alias("l_orderkey"),
        "lower_qty", "upper_qty",
    )


@register(
    "merge_semantics",
    """
    WITH source AS (
      SELECT o_orderkey,
             round(o_totalprice + 1000.0, 2) AS new_price,
             CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 0)
    SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           round(CASE WHEN s.op = 'U' THEN s.new_price
                      ELSE t.o_totalprice END, 2) AS final_price
    FROM orders t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    WHERE s.op IS NULL OR s.op = 'U'
    """,
)
def merge_semantics(spark, sf_dir):
    """MERGE INTO upsert/delete semantics (reference J5 keystone,
    /root/reference/ofl/transform/spark/silver.py:94-101, plus our delete
    arm) expressed as the full-outer-join rewrite our copy-on-write
    ``operators.merge_into`` executes — here parity-checked against a pure
    SQL oracle of the same algebra."""
    o = load(spark, sf_dir, "orders")
    src = (
        o.filter((F.col("o_orderkey") % 7 == 0) | (F.col("o_orderkey") % 13 == 0))
        .select(
            F.col("o_orderkey").alias("s_orderkey"),
            r2(F.col("o_totalprice") + 1000.0).alias("new_price"),
            F.when(F.col("o_orderkey") % 13 == 0, "D").otherwise("U")
            .alias("op"),
        )
    )
    j = o.join(src, o.o_orderkey == src.s_orderkey, "full_outer")
    return (
        j.filter(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            F.coalesce("o_orderkey", "s_orderkey").alias("o_orderkey"),
            r2(F.when(F.col("op") == "U", F.col("new_price"))
               .otherwise(F.col("o_totalprice"))).alias("final_price"),
        )
    )


@register(
    "merge_semantics_composite",
    """
    WITH t AS (
      SELECT o_custkey, o_orderdate,
             round(sum(o_totalprice), 2) AS day_total
      FROM orders GROUP BY o_custkey, o_orderdate),
    source AS (
      SELECT o_custkey, o_orderdate,
             round(day_total + 1000.0, 2) AS new_total,
             CASE WHEN (o_custkey + extract(day FROM o_orderdate)) % 11 = 0
                  THEN 'D' ELSE 'U' END AS op
      FROM t WHERE o_custkey % 5 = 0)
    SELECT coalesce(t.o_custkey, s.o_custkey) AS o_custkey,
           coalesce(t.o_orderdate, s.o_orderdate) AS o_orderdate,
           round(CASE WHEN s.op = 'U' THEN s.new_total
                      ELSE t.day_total END, 2) AS final_total
    FROM t FULL OUTER JOIN source s
      ON t.o_custkey = s.o_custkey AND t.o_orderdate = s.o_orderdate
    WHERE s.op IS NULL OR s.op = 'U'
    """,
)
def merge_semantics_composite(spark, sf_dir):
    """COMPOSITE-key MERGE semantics on (o_custkey, o_orderdate) — the
    reference's keystone merges composite natural keys like (series_id,
    date) (/root/reference/ofl/transform/spark/silver.py:94-101); this is
    the same full-outer-join upsert/delete algebra ``operators.merge_into``
    executes for ``key=[...]``, parity-checked against a pure SQL oracle.
    The target is pre-aggregated to make the composite key unique — the
    operator's own dedup guarantees the same before its join."""
    t = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(r2(F.sum("o_totalprice")).alias("day_total"))
    )
    src = (
        t.filter(F.col("o_custkey") % 5 == 0)
        .select(
            F.col("o_custkey").alias("s_custkey"),
            F.col("o_orderdate").alias("s_orderdate"),
            r2(F.col("day_total") + 1000.0).alias("new_total"),
            F.when((F.col("o_custkey") + F.dayofmonth("o_orderdate")) % 11
                   == 0, "D").otherwise("U").alias("op"),
        )
    )
    j = t.join(
        src,
        (t.o_custkey == src.s_custkey) & (t.o_orderdate == src.s_orderdate),
        "full_outer",
    )
    return (
        j.filter(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            F.coalesce("o_custkey", "s_custkey").alias("o_custkey"),
            F.coalesce("o_orderdate", "s_orderdate").alias("o_orderdate"),
            r2(F.when(F.col("op") == "U", F.col("new_total"))
               .otherwise(F.col("day_total"))).alias("final_total"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "party_union_by_name",
    """
    SELECT kind, n_nationkey, count(*) AS n,
           round(sum(acctbal), 2) AS bal,
           count(mktsegment) AS with_segment
    FROM (
      SELECT 'customer' AS kind, c_nationkey AS n_nationkey,
             c_acctbal AS acctbal, c_mktsegment AS mktsegment FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS kind, s_nationkey AS n_nationkey,
             s_acctbal AS acctbal, NULL AS mktsegment FROM supplier)
    GROUP BY kind, n_nationkey
    """,
)
def party_union_by_name(spark, sf_dir):
    """unionByName with missing-column fill (reference U1/U2/P2,
    /root/reference/ofl/transform/spark/silver.py:60-62,203-209)."""
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("n_nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("n_nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    u = c.unionByName(s, allowMissingColumns=True)
    return u.groupBy("kind", "n_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.sum("acctbal")).alias("bal"),
        F.count("mktsegment").alias("with_segment"),
    )


# ---------------------------------------------------------------------------
# §2.2 predicates / §2.8 scalar functions
# ---------------------------------------------------------------------------


@register(
    "priority_membership",
    """
    SELECT o_orderpriority, count(*) AS n FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def priority_membership(spark, sf_dir):
    """IN-list membership filter (reference P6,
    /root/reference/ofl/transform/gold/models/mart_fx.sql:5)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "order_band_classify",
    """
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS band,
           count(*) AS n, round(avg(o_totalprice), 6) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def order_band_classify(spark, sf_dir):
    """CASE WHEN classification ladder (reference §2.8 conditional family,
    /root/reference/ofl/transform/gold/models/mart_di_curve_slope.sql:41-46)."""
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return o.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n"),
        r6(F.avg("o_totalprice")).alias("avg_price"),
    )


@register(
    "part_key_builder",
    """
    SELECT p_brand,
           count(DISTINCT p_brand || ':' || upper(replace(p_type, ' ', '_')))
             AS n_keys,
           count(DISTINCT substr(p_name, 1, 8)) AS n_prefixes,
           count(DISTINCT regexp_replace(p_name, '[aeiou]', '', 'g'))
             AS n_consonant_forms
    FROM part GROUP BY p_brand
    """,
)
def part_key_builder(spark, sf_dir):
    """String-function family: concat key build, upper/replace, substring
    slice, regexp_replace (reference §2.8 strings,
    /root/reference/ofl/streaming/schema.py:57-73 dedup-key build,
    /root/reference/ofl/ingestion/b3_cotahist.py:75-88 fixed-width slicing)."""
    p = load(spark, sf_dir, "part")
    key = F.concat_ws(":", F.col("p_brand"),
                      F.upper(F.regexp_replace("p_type", " ", "_")))
    return p.groupBy("p_brand").agg(
        F.countDistinct(key).alias("n_keys"),
        F.countDistinct(F.substring("p_name", 1, 8)).alias("n_prefixes"),
        F.countDistinct(F.regexp_replace("p_name", "[aeiou]", ""))
        .alias("n_consonant_forms"),
    )


@register(
    "order_date_parts",
    """
    SELECT CAST(year(o_orderdate) AS INT)     AS order_year,
           CAST(quarter(o_orderdate) AS INT)  AS order_quarter,
           count(*) AS n,
           CAST(min(last_day(CAST(o_orderdate AS DATE))) AS DATE) AS first_month_end,
           CAST(max(isodow(o_orderdate)) AS INT) AS max_isodow
    FROM orders GROUP BY 1, 2
    """,
)
def order_date_parts(spark, sf_dir):
    """Date-function family: year/quarter extraction, last_day, ISO weekday
    (reference §2.8 date/time,
    /root/reference/ofl/transform/spark/dimensions.py:98-106)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.last_day(F.to_date("o_orderdate"))).alias("first_month_end"),
        F.max(F.weekday("o_orderdate") + 1).alias("max_isodow"),
    )


@register(
    "calendar_dim",
    """
    SELECT CAST(d AS DATE) AS date_day,
           CAST(year(d) AS INT) AS y, CAST(month(d) AS INT) AS m,
           CAST(dayofmonth(d) AS INT) AS dom, CAST(isodow(d) AS INT) AS dow
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                        INTERVAL 1 DAY)) AS d)
    """,
)
def calendar_dim(spark, sf_dir):
    """Generated calendar dimension via sequence+explode (reference
    dim_date, /root/reference/ofl/transform/spark/dimensions.py:98-106)."""
    spark_df = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date_day")
    )
    return spark_df.select(
        "date_day",
        F.year("date_day").alias("y"),
        F.month("date_day").alias("m"),
        F.dayofmonth("date_day").alias("dom"),
        (F.weekday("date_day") + 1).alias("dow"),
    )


@register(
    "safe_ratio_guard",
    """
    SELECT l_returnflag,
           round(avg(l_extendedprice / nullif(l_quantity, 0)), 6) AS avg_unit_price,
           count(*) AS n
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_quantity > 0
    GROUP BY l_returnflag
    """,
)
def safe_ratio_guard(spark, sf_dir):
    """NULLIF-guarded ratio + null/positive filter (reference P5 + math
    family, /root/reference/ofl/transform/gold/models/mart_di_curve_points.sql:97-109)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity").isNotNull() & (F.col("l_quantity") > 0))
        .groupBy("l_returnflag")
        .agg(
            r6(F.avg(F.col("l_extendedprice")
                     / F.nullif(F.col("l_quantity"), F.lit(0))))
            .alias("avg_unit_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "event_props_extract",
    """
    SELECT event_type,
           round(avg(TRY_CAST(regexp_extract(props, 'k"?: *(\\d+)', 1)
                              AS INT)), 6)
             AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def event_props_extract(spark, sf_dir):
    """Typed extraction from a JSON wire column with an explicit pattern —
    never schema inference (reference §1.2 rule + from_json family,
    /root/reference/ofl/streaming/bronze.py:136-141)."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'k"?: *(\d+)', 1).cast("int")
    return ev.groupBy("event_type").agg(
        r6(F.avg(k)).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.9 streaming semantics, batch-checkable
# ---------------------------------------------------------------------------


@register(
    "hourly_event_ohlc",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value,
           round(min(value), 6) AS low,
           round(max(value), 6) AS high,
           count(DISTINCT user_id) AS users
    FROM events GROUP BY 1, 2
    """,
)
def hourly_event_ohlc(spark, sf_dir):
    """Tumbling-window grouped aggregate — identical algebra batch or
    streaming, the reference's reuse contract (T2 + A1,
    /root/reference/ofl/streaming/silver.py:92-99: build_ohlc runs unchanged
    on static frames; window semantics
    /root/reference/ofl/streaming/windows.py:15-28)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r6(F.sum("value")).alias("total_value"),
            r6(F.min("value")).alias("low"),
            r6(F.max("value")).alias("high"),
            F.countDistinct("user_id").alias("users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value", "low", "high", "users")
    )


@register(
    "event_key_dedup",
    """
    SELECT event_type, count(*) AS n FROM (
      SELECT DISTINCT user_id || ':' || CAST(epoch_us(ts) AS VARCHAR)
               AS event_key,
             event_type
      FROM events)
    GROUP BY event_type
    """,
)
def event_key_dedup(spark, sf_dir):
    """Keyed dedup before aggregation — "a sum is not idempotent"
    (reference T3, /root/reference/ofl/streaming/silver.py:25-31,103-105;
    key build mirrors dedup_key,
    /root/reference/ofl/streaming/schema.py:57-73)."""
    ev = load(spark, sf_dir, "events")
    key = F.concat_ws(
        ":", F.col("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).cast("string"))
    return (
        ev.select(key.alias("event_key"), "event_type").distinct()
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "user_event_sessionize",
    """
    WITH lagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) > 1800000
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    sess AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM lagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess GROUP BY user_id, session_id
    """,
)
def user_event_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity closes a session), the
    batch code path of the custom stateful streaming operator
    (``streaming/stateful.py`` maintains the identical algebra
    incrementally via applyInPandasWithState): lag → break flag →
    running-sum session id → per-session aggregate. One shuffle on
    user_id; both window frames reuse it (named-window discipline, W8)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_millis(F.col("ts").cast("timestamp"))
           - F.unix_millis(F.lag(F.col("ts").cast("timestamp")).over(w)))
    brk = F.when(gap > 1_800_000, 1).otherwise(0)
    sess = (
        ev.withColumn("brk", brk)
        .withColumn("session_id",
                    F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding,
                                                    Window.currentRow)))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        r2(F.sum("value")).alias("total_value"),
    )


@register(
    "watermark_cutoff_accounting",
    """
    SELECT event_type, status, count(*) AS n FROM (
      SELECT event_type,
             CASE WHEN ts < max(ts) OVER () - INTERVAL 2 MINUTE
                  THEN 'late' ELSE 'on_time' END AS status
      FROM events)
    GROUP BY event_type, status
    """,
)
def watermark_cutoff_accounting(spark, sf_dir):
    """Late-data accounting against a watermark = max event time − delay
    (reference T1/T5 semantics, JVM-free mirror
    /root/reference/ofl/streaming/windows.py:15-28,109-149) — batch-checkable
    formulation of the same algebra.

    The global max is a 1-row AGGREGATE broadcast-crossJoined back onto the
    events — NOT ``max() OVER ()``: an empty window partition spec would
    funnel the whole table through one reducer (the classic
    single-partition scale-killer; VERDICT r2 'what's wrong' #2). The
    aggregate gets a map-side partial combine instead, and the join adds
    one broadcast of a single row."""
    ev = load(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 2 MINUTE")).alias("__wm"))
    return (
        ev.crossJoin(F.broadcast(wm))
        .select(
            "event_type",
            F.when(F.col("ts") < F.col("__wm"), "late").otherwise("on_time")
            .alias("status"),
        )
        .groupBy("event_type", "status").agg(F.count(F.lit(1)).alias("n"))
    )
