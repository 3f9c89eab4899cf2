"""Relational surface extensions: grouping sets, exact order statistics,
decorrelated scalar subquery, time-range window frames.

Rounds out SURVEY.md §2-B's delegated-query closure beyond the §2-C core:
ES-style stats aggregations (percentiles), multi-dimensional bucket combos
(grouping sets = the general form of the terms-agg matrix), and range-framed
event analytics. All pure built-ins, all whole-stage codegen.

Determinism: percentile/median are selection+single-interpolation (one IEEE op
on two order statistics) — verified bit-identical between Spark and DuckDB's
quantile_cont. Averages go through the decimal-sum discipline (functions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import lsum, sql_lsum
from ..io import table


def q_agg_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize.

    Sets: (status), (priority), () — the "give me each dimension's totals plus
    the grand total" shape ES needs several requests for. grouping_id
    disambiguates the NULL-as-aggregated rows. One shuffle; Spark expands sets
    map-side (Expand node), partial aggregation still applies.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            lsum("o_totalprice", "total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


SQL_AGG_GROUPINGSETS = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       {sql_lsum("o_totalprice", "total_price")}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / p90 order prices per priority — the ES `percentiles` agg,
    exact instead of t-digest. Selection + one interpolation op: deterministic
    cross-engine (verified vs quantile_cont). At 100 TB swap the exact sort-based
    percentile for approx_percentile and drop the oracle to rows-only — the
    query shape is unchanged."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.median("o_totalprice").alias("med_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


SQL_AGG_PERCENTILE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       median(o_totalprice) AS med_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


PCT_ACC = 10000  # approx_percentile accuracy: rank error <= n / PCT_ACC


def q_agg_pct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles — the ES `percentiles` agg as ES actually runs it:
    APPROXIMATE (t-digest there, Greenwald-Khanna here), constant memory per
    group, mergeable across partitions. q_agg_percentile is the exact twin.

    Sketch outputs are engine-specific, so (same recipe as q_agg_approx) the
    oracle-facing columns validate the sketch against its own rank-error
    contract instead of hash-comparing raw values: with accuracy=10000 the rank
    error is ≤ n/10000, so the approx median must land between the exact 49.5th
    and 50.5th percentiles (a 50× safety margin). The DuckDB twin emits literal
    TRUEs on the same grouping rows.

    NOTE: the exact percentile bands exist ONLY for harness validation — they
    rebuild the full sort the sketch exists to avoid. The production form is
    ``approx_percentile(col, pct, acc)`` alone."""
    o = table(spark, sf_dir, "orders")
    med_a = F.expr(f"approx_percentile(o_totalprice, 0.5, {PCT_ACC})")
    p90_a = F.expr(f"approx_percentile(o_totalprice, 0.9, {PCT_ACC})")
    band = lambda p: F.expr(f"percentile(o_totalprice, {p})")  # noqa: E731
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        ((med_a >= band(0.495)) & (med_a <= band(0.505))).alias("med_ok"),
        ((p90_a >= band(0.895)) & (p90_a <= band(0.905))).alias("p90_ok"),
    )


SQL_AGG_PCT_SKETCH = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       TRUE AS med_ok, TRUE AS p90_ok
FROM orders
GROUP BY o_orderpriority
"""


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated the Spark way: orders costing
    more than 1.5× their customer's average order.

    A per-row correlated subquery would rescan orders per order; the windowed
    form computes every customer's average in ONE pass over the orders shuffle
    partitioned by custkey — the plan Catalyst's decorrelation rewrites toward,
    written directly. Average uses the decimal-sum discipline for cross-engine
    determinism."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.lit(1.5) * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


SQL_SUBQUERY_SCALAR = """
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM (
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
    FROM orders
)
WHERE o_totalprice > 1.5 * cust_avg
"""


def q_win_rangeframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, events and value-sum in the trailing
    hour — the sliding-lookback analytic tumbling windows can't express.

    The frame is RANGE over event-time micros, so ts-ties are peers (identical
    in both engines); the partition shuffle is by user_id only."""
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


SQL_WIN_RANGEFRAME = """
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


PAGE_SIZE = 20
# the cursor: (o_totalprice, o_orderkey) of the last row of the previous page —
# a fixed literal here; a service would thread the previous response's last row
CURSOR_PRICE = 450000.0
CURSOR_KEY = 0


def q_page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination — ES `search_after`, Spark-native.

    OFFSET pagination re-sorts and skips N rows per page (O(pages²) total work
    and unstable under concurrent writes); keyset pagination pushes the cursor
    as a PREDICATE, so every page is a filter + TakeOrdered over a shrinking
    tail — constant work per page at any depth, stable under a unique total
    order. The tuple comparison (price, key) strictly-after the cursor is the
    lexicographic one, spelled out so both engines agree on ties.
    """
    o = table(spark, sf_dir, "orders")
    after_cursor = (F.col("o_totalprice") < F.lit(CURSOR_PRICE)) | (
        (F.col("o_totalprice") == F.lit(CURSOR_PRICE))
        & (F.col("o_orderkey") > F.lit(CURSOR_KEY))
    )
    return (
        o.filter(after_cursor)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(PAGE_SIZE)
    )


SQL_PAGE_KEYSET = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice < {CURSOR_PRICE}
   OR (o_totalprice = {CURSOR_PRICE} AND o_orderkey > {CURSOR_KEY})
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {PAGE_SIZE}
"""


HIST_INTERVAL = 50_000  # ES histogram agg `interval` over o_totalprice


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval numeric histogram — the ES `histogram` bucket aggregation
    (the numeric sibling of date_histogram, which s_win_tumbling covers).

    Bucket key is ES's convention: floor(value / interval) * interval. One
    map-side-combined groupBy; bucket count is bounded by value range /
    interval, so the result is always small regardless of row count — the
    classic 100 TB dashboard aggregation. Sums go through the scaled-long
    discipline (functions.lsum) so the double aggregate is order-independent
    and hash-matches DuckDB.
    """
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.floor(F.col("o_totalprice") / F.lit(HIST_INTERVAL)) * F.lit(HIST_INTERVAL)
    ).cast("double")
    return (
        o.groupBy(bucket.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            lsum("o_totalprice", "sum_price"),
        )
        .orderBy("bucket_lo")
    )


SQL_AGG_HISTOGRAM = f"""
SELECT CAST(floor(o_totalprice / {HIST_INTERVAL}) * {HIST_INTERVAL} AS DOUBLE) AS bucket_lo,
       COUNT(*) AS n_orders,
       {sql_lsum("o_totalprice", "sum_price")}
FROM orders
GROUP BY bucket_lo
ORDER BY bucket_lo
"""


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended stats bundle — ES `extended_stats` aggregation: count, avg,
    variance, stddev, min, max per bucket, with DETERMINISTIC float results.

    Spark's stddev/var_pop use streaming one-pass algorithms whose float
    rounding depends on partition merge order; here variance comes from the
    textbook sufficient statistics instead — exact decimal sums of x and x²
    (inputs are 2dp ⇒ squares are 4dp, both summed exactly), combined in ONE
    fixed-order double expression mirrored verbatim in the oracle:
    var = (S2 − S1²/n)/n, clamped at 0 for cancellation, std = √var (sqrt is
    correctly rounded, so it can't drift). Same one-shuffle map-side-combined
    plan as any groupBy agg — sufficient statistics ARE the partial aggregate.
    """
    from ..functions import dsum

    e = table(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "s1"),
        dsum(F.col("value") * F.col("value"), "s2", scale=4),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    n = F.col("n_events").cast("double")
    var = F.greatest(
        (F.col("s2") - (F.col("s1") * F.col("s1")) / n) / n, F.lit(0.0)
    )
    return g.select(
        "event_type",
        "n_events",
        (F.col("s1") / n).alias("avg_value"),
        var.alias("var_pop"),
        F.sqrt(var).alias("std_pop"),
        "vmin",
        "vmax",
    )


SQL_AGG_STATS = """
WITH g AS (
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(value * value AS DECIMAL(18,4))) AS DOUBLE) AS s2,
           MIN(value) AS vmin,
           MAX(value) AS vmax
    FROM events
    GROUP BY event_type
)
SELECT event_type, n_events,
       s1 / n AS avg_value,
       greatest((s2 - (s1 * s1) / n) / n, 0.0) AS var_pop,
       sqrt(greatest((s2 - (s1 * s1) / n) / n, 0.0)) AS std_pop,
       vmin, vmax
FROM g
"""


QUERIES = {
    "q_agg_groupingsets": q_agg_groupingsets,
    "q_agg_percentile": q_agg_percentile,
    "q_agg_pct_sketch": q_agg_pct_sketch,
    "q_subquery_scalar": q_subquery_scalar,
    "q_win_rangeframe": q_win_rangeframe,
    "q_page_keyset": q_page_keyset,
    "q_agg_histogram": q_agg_histogram,
    "q_agg_stats": q_agg_stats,
}

ORACLES = {
    "q_agg_groupingsets": SQL_AGG_GROUPINGSETS,
    "q_agg_percentile": SQL_AGG_PERCENTILE,
    "q_agg_pct_sketch": SQL_AGG_PCT_SKETCH,
    "q_subquery_scalar": SQL_SUBQUERY_SCALAR,
    "q_win_rangeframe": SQL_WIN_RANGEFRAME,
    "q_page_keyset": SQL_PAGE_KEYSET,
    "q_agg_histogram": SQL_AGG_HISTOGRAM,
    "q_agg_stats": SQL_AGG_STATS,
}
