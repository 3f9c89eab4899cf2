"""Relational core: scans, filters, joins, aggregations, windows, sort/limit, set ops.

This is the query surface the reference delegates to Elasticsearch after sync
(SURVEY.md §2-B; the reference itself has no query operators — its ES 6.3 dependency at
/root/reference/pom.xml:35-46 is the tether): term/range filters, boolean predicates,
top-k, metric+bucket aggregations. Here each capability is a declarative DataFrame plan
so Catalyst gets predicate pushdown / column pruning / join planning for free.

Scale notes (100 TB posture) are per-query in docstrings. Shared rules:
* dimension tables (region/nation/customer at TPC-H ratios) are broadcast explicitly;
* fact-fact joins carry an equality key so they hash/sort-merge partition cleanly;
* float aggregates are order-independent by construction: long-cents sums
  (functions.lsum) for range-bounded 2dp money columns, 128-bit decimal sums
  (functions.dsum) where scaled-int would overflow at 100 TB row counts — both
  map-side-partial-aggregated inside whole-stage codegen;
* every LIMIT is tie-broken by a unique key so results are stable under any
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import davg, dsum, lavg, lsum, sql_davg, sql_dsum, sql_lavg, sql_lsum
from ..io import fan_out, table

# ---------------------------------------------------------------------------
# scan / filter
# ---------------------------------------------------------------------------


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + computed column; Catalyst prunes the parquet scan to 5 columns."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
        (F.col("l_extendedprice") * (F.lit(1.0) + F.col("l_tax"))).alias("gross"),
    )


SQL_SCAN_PROJECT = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1.0 - l_discount) AS revenue,
       l_extendedprice * (1.0 + l_tax) AS gross
FROM lineitem
"""


def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (AND/OR/IN/BETWEEN/LIKE/null check); pushed to the scan."""
    o = table(spark, sf_dir, "orders")
    cond = (
        (
            F.col("o_orderstatus").isin("F", "P")
            & F.col("o_totalprice").between(50000.0, 200000.0)
        )
        | (
            F.col("o_orderpriority").like("1-%")
            & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        )
    ) & F.col("o_custkey").isNotNull()
    return o.filter(cond).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


SQL_FILTER_PRED = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE ((o_orderstatus IN ('F','P') AND o_totalprice BETWEEN 50000.0 AND 200000.0)
       OR (o_orderpriority LIKE '1-%' AND o_orderdate >= TIMESTAMP '2000-01-01'))
  AND o_custkey IS NOT NULL
"""

# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi hash join orders ⋈ customer; both sides shuffle on custkey (AQE may
    broadcast the smaller at fixture scale — either plan is correct at 100 TB)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"
    )


SQL_JOIN_INNER = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ tiny dims: nation (25 rows) and region (5 rows) are broadcast —
    no shuffle of the customer side at any scale."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


SQL_JOIN_BROADCAST = """
SELECT c_custkey, c_name, n_name, r_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
"""


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer kept, orderless customers get nulls."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_zero"),
    )


SQL_JOIN_LEFT = """
SELECT c_custkey, c_name, o_orderkey,
       COALESCE(o_totalprice, 0.0) AS price_or_zero
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having ≥1 high-value order. Semi join ships only the
    key column of the probe side — cheaper than inner+distinct at scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


SQL_JOIN_SEMI = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no high-value order (threshold keeps the result
    non-degenerate at every fixture scale — every customer has *some* order)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_JOIN_ANTI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
"""


def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship 5-table star: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    filter + hash agg + sort — one plan exercising shuffle joins, broadcast joins,
    partial aggregation, and total-order sort.

    Scale: lineitem⋈orders and ⋈customer shuffle on their keys (AQE picks
    sort-merge vs broadcast); nation/region are broadcast; the agg output is tiny
    (25 nations × 7 years) so the final sort is trivial.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                 "revenue", scale=4),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name", "o_year")
    )


SQL_JOIN_STAR = f"""
SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum("l_extendedprice * (1.0 - l_discount)", "revenue", scale=4)},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '2001-01-01'
GROUP BY n_name, o_year
ORDER BY revenue DESC, n_name, o_year
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join: pairs of events by the same user within 10 minutes.

    The user_id equality keeps this a partitioned hash join with the time band as a
    post-join filter — at 100 TB, bucket/partition by user_id and the band filter
    never crosses partitions. Never a cartesian.
    """
    e = table(spark, sf_dir, "events")
    a = e.select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (b.b_ts > a.a_ts)
            & (b.b_ts <= F.col("a_ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .select(
            "user_id",
            "a_id",
            "b_id",
            (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
        )
    )


SQL_JOIN_RANGE = """
SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order (by o_orderdate) of the same
    customer at or before the event time; events with no preceding order keep nulls.

    Implementation: equality join on the entity key + inequality band, then
    ``max_by`` over a (date, key) ordering struct reduces each event to its one
    winning match. The aggregate's PARTIAL phase runs map-side on the join
    output, so the shuffle after the join carries ≈ one row per event — not the
    events × orders-per-customer join blow-up a window-over-all-matches would
    materialize (per-key order history is unbounded at 100 TB; the pre-reduce
    bounds the intermediate regardless). An unmatched event's single null-padded
    left-join row yields a null-fielded struct, preserving the nulls.
    (Reference analogue: ES-side "latest doc for key" lookups after CDC sync.)
    """
    # fan_out on the probe side (r17 gate A/B: 1.21 -> 0.89 s median): the
    # band join's per-row work otherwise serializes in the sub-split scan task
    e = fan_out(table(spark, sf_dir, "events"))
    o = table(spark, sf_dir, "orders")
    j = e.join(
        o,
        (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ts),
        "left",
    )
    # lexicographic struct max == ORDER BY o_orderdate DESC, o_orderkey DESC
    best = F.max_by(
        F.struct("o_orderkey", "o_orderdate", "o_totalprice"),
        F.struct("o_orderdate", "o_orderkey"),
    )
    return (
        j.groupBy("event_id", "user_id", "ts")
        .agg(best.alias("m"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m.o_orderkey").alias("asof_orderkey"),
            F.col("m.o_orderdate").alias("asof_orderdate"),
            F.col("m.o_totalprice").alias("asof_totalprice"),
        )
    )


SQL_JOIN_ASOF = """
SELECT event_id, user_id, ts,
       o_orderkey AS asof_orderkey,
       o_orderdate AS asof_orderdate,
       o_totalprice AS asof_totalprice
FROM (
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           row_number() OVER (PARTITION BY e.event_id
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
    FROM events e
    LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# aggregations
# ---------------------------------------------------------------------------


def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate — partial agg per partition, single-row final combine."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        lsum("l_quantity", "sum_qty"),
        lavg("l_extendedprice", "avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


SQL_AGG_GLOBAL = f"""
SELECT COUNT(*) AS n_rows,
       {sql_lsum("l_quantity", "sum_qty")},
       {sql_lavg("l_extendedprice", "avg_price")},
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       MIN(l_shipdate) AS min_shipdate,
       MAX(l_shipdate) AS max_shipdate
FROM lineitem
"""


def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical hash aggregate."""
    # fan_out (r17 gate A/B: 1.65 -> 1.14 s median): the decimal partial
    # aggregation otherwise runs inside the single sub-split scan task; the
    # shipdate filter stays below the spread, so scan pushdown is unchanged
    li = fan_out(
        table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
        )
    )
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # linear 2dp/4dp columns take the long-cents path (lsum/lavg):
            # range-bounded so the integer sum holds even at 100 TB row counts,
            # and ~5× faster than the widened-decimal accumulator (functions.py)
            lsum("l_quantity", "sum_qty"),
            lsum("l_extendedprice", "sum_base_price"),
            # products keep the 128-bit decimal accumulator — their scaled-int
            # sums (4dp/6dp × price magnitude) would overflow int64 at scale.
            # scale covers the exact decimal width of each product (2dp inputs:
            # disc = 2dp*2dp = 4dp, charge = 6dp) — neither engine ever rounds,
            # so Spark's HALF_UP and DuckDB's half-even can't diverge.
            dsum(disc, "sum_disc_price", scale=4),
            dsum(charge, "sum_charge", scale=6),
            lavg("l_quantity", "avg_qty"),
            lavg("l_extendedprice", "avg_price"),
            lavg("l_discount", "avg_disc", scale=4),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_AGG_GROUP = f"""
SELECT l_returnflag, l_linestatus,
       {sql_lsum("l_quantity", "sum_qty")},
       {sql_lsum("l_extendedprice", "sum_base_price")},
       {sql_dsum("l_extendedprice * (1.0 - l_discount)", "sum_disc_price", scale=4)},
       {sql_dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", "sum_charge", scale=6)},
       {sql_lavg("l_quantity", "avg_qty")},
       {sql_lavg("l_extendedprice", "avg_price")},
       {sql_lavg("l_discount", "avg_disc", scale=4)},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count per group (expands to a two-phase agg under the hood)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("s_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


SQL_AGG_DISTINCT = """
SELECT n_name, COUNT(DISTINCT s_suppkey) AS n_suppliers, COUNT(*) AS n_rows
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (ES `cardinality` agg analogue).

    At 100 TB this is THE distinct-count you run: fixed memory per partition,
    mergeable sketches. Sketch values are engine-specific, so the oracle-facing
    output checks the sketch against its own accuracy contract instead of its
    raw value: `approx_ok` asserts |approx − exact| ≤ 5·rsd·exact (HLL++ error
    is ~rsd·exact at 1σ; 5σ never trips in practice). The DuckDB twin emits the
    exact count and a literal TRUE, so rows/schema/hash all verify — the sketch
    is exercised by Spark and validated to tolerance, not hash-compared.

    NOTE: the exact countDistinct here exists ONLY for harness validation — it
    dominates the plan and negates the sketch's fixed-memory property. The
    production form is the sketch alone:
    ``df.groupBy(g).agg(F.approx_count_distinct(c, rsd))``."""
    e = table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return e.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 5 * 0.02 * exact.cast("double")
        ).alias("approx_ok"),
    )


SQL_AGG_APPROX = """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
FROM events
GROUP BY event_type
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over a join, with grouping indicator columns."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            lsum("o_totalprice", "revenue"),
            F.grouping("c_mktsegment").cast("bigint").alias("g_mkt"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        )
    )


SQL_AGG_ROLLUP = f"""
SELECT c_mktsegment, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_lsum("o_totalprice", "revenue")},
       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_mkt,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over events (event_type × year)."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("ev_year", F.year("ts").cast("bigint"))
        .cube("event_type", "ev_year")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
            F.grouping("event_type").cast("bigint").alias("g_type"),
            F.grouping("ev_year").cast("bigint").alias("g_year"),
        )
    )


SQL_AGG_CUBE = f"""
SELECT event_type, ev_year,
       COUNT(*) AS n_events,
       {sql_dsum("value", "sum_value")},
       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
       CAST(GROUPING(ev_year) AS BIGINT) AS g_year
FROM (SELECT event_type, CAST(year(ts) AS BIGINT) AS ev_year, value FROM events)
GROUP BY CUBE (event_type, ev_year)
"""

# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows per customer. rank/dense_rank keep true tie semantics
    (ordered by price alone); row_number gets a unique tie-break key."""
    o = table(spark, sf_dir, "orders")
    w_ties = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w_total).cast("bigint").alias("rn"),
        F.rank().over(w_ties).cast("bigint").alias("rnk"),
        F.dense_rank().over(w_ties).cast("bigint").alias("drnk"),
    )


SQL_WIN_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn,
       CAST(rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
FROM orders
"""


def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer with an explicit ROWS frame. Decimal-cast sum
    keeps the running total exact and cross-engine deterministic."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        running.alias("running_revenue"),
    )


SQL_WIN_RUNNING = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_revenue
FROM orders
"""


def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user ordered by event time; inter-event gap in exact micros."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )


SQL_WIN_LAG = """
SELECT user_id, event_id, ts, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand — window + filter, the distributed top-k idiom
    (no global sort; each group ranks inside its partition)."""
    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
    )


SQL_TOPK_PERGROUP = """
SELECT p_brand, p_partkey, p_name, p_retailprice, rn
FROM (
    SELECT p_brand, p_partkey, p_name, p_retailprice,
           CAST(row_number() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC, p_partkey ASC) AS BIGINT) AS rn
    FROM part
)
WHERE rn <= 3
"""


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by totalprice, tie-broken by key. Spark plans TakeOrderedAndProject
    — per-partition top-10 then a tiny driver merge, no full sort at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


SQL_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


def _slice_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def _slice_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_SQL_SLICE_A = "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_acctbal > 5000.0"
_SQL_SLICE_B = "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'"


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two overlapping slices (duplicates retained, by-name union)."""
    return _slice_a(spark, sf_dir).unionByName(_slice_b(spark, sf_dir))


SQL_UNION = f"{_SQL_SLICE_A} UNION ALL {_SQL_SLICE_B}"


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) of the two slices' keys."""
    a = _slice_a(spark, sf_dir).select("c_custkey")
    b = _slice_b(spark, sf_dir).select("c_custkey")
    return a.intersect(b)


SQL_INTERSECT = (
    f"SELECT c_custkey FROM ({_SQL_SLICE_A}) INTERSECT "
    f"SELECT c_custkey FROM ({_SQL_SLICE_B})"
)


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): keys in slice A but not slice B."""
    a = _slice_a(spark, sf_dir).select("c_custkey")
    b = _slice_b(spark, sf_dir).select("c_custkey")
    return a.exceptAll(b).distinct()


SQL_EXCEPT = (
    f"SELECT c_custkey FROM ({_SQL_SLICE_A}) EXCEPT "
    f"SELECT c_custkey FROM ({_SQL_SLICE_B})"
)


QUERIES = {
    "q_scan_project": q_scan_project,
    "q_filter_pred": q_filter_pred,
    "q_join_inner": q_join_inner,
    "q_join_broadcast": q_join_broadcast,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_star": q_join_star,
    "q_join_range": q_join_range,
    "q_join_asof": q_join_asof,
    "q_agg_global": q_agg_global,
    "q_agg_group": q_agg_group,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_approx": q_agg_approx,
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_win_rank": q_win_rank,
    "q_win_running": q_win_running,
    "q_win_lag": q_win_lag,
    "q_topk_pergroup": q_topk_pergroup,
    "q_sort_limit": q_sort_limit,
    "q_union": q_union,
    "q_intersect": q_intersect,
    "q_except": q_except,
}

ORACLES = {
    "q_scan_project": SQL_SCAN_PROJECT,
    "q_filter_pred": SQL_FILTER_PRED,
    "q_join_inner": SQL_JOIN_INNER,
    "q_join_broadcast": SQL_JOIN_BROADCAST,
    "q_join_left": SQL_JOIN_LEFT,
    "q_join_semi": SQL_JOIN_SEMI,
    "q_join_anti": SQL_JOIN_ANTI,
    "q_join_star": SQL_JOIN_STAR,
    "q_join_range": SQL_JOIN_RANGE,
    "q_join_asof": SQL_JOIN_ASOF,
    "q_agg_global": SQL_AGG_GLOBAL,
    "q_agg_group": SQL_AGG_GROUP,
    "q_agg_distinct": SQL_AGG_DISTINCT,
    "q_agg_approx": SQL_AGG_APPROX,
    "q_agg_rollup": SQL_AGG_ROLLUP,
    "q_agg_cube": SQL_AGG_CUBE,
    "q_win_rank": SQL_WIN_RANK,
    "q_win_running": SQL_WIN_RUNNING,
    "q_win_lag": SQL_WIN_LAG,
    "q_topk_pergroup": SQL_TOPK_PERGROUP,
    "q_sort_limit": SQL_SORT_LIMIT,
    "q_union": SQL_UNION,
    "q_intersect": SQL_INTERSECT,
    "q_except": SQL_EXCEPT,
}
