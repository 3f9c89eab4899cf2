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

from ..functions import dsum, lsum, sql_dsum, sql_lsum
from ..io import persist_tracked, table


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


# date_histogram source filter: sparse enough that empty day buckets exist,
# so min_doc_count=0 fill is actually exercised, not just plumbed
DATEHIST_TYPE = "purchase"
DATEHIST_MIN_VALUE = 200.0


def q_agg_datehist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar date_histogram — the ES `date_histogram` bucket agg with
    `min_doc_count: 0`: one bucket per calendar day across the data's span,
    INCLUDING empty days (count 0, sum 0.0 — ES's empty-bucket convention).

    Two-phase plan that holds at 100 TB: (1) one map-side-combined groupBy on
    the day key — the only pass over the fact table; (2) the day spine is
    generated from the agg's own min/max (a scalar agg over the already-tiny
    bucket frame's source) via `sequence()` + explode, then left-joined with
    the bucket counts. Both spine and buckets are calendar-bounded (rows/day
    never matters), so the fill join is broadcast and costs nothing at any
    data scale.
    """
    e = table(spark, sf_dir, "events").filter(
        (F.col("event_type") == DATEHIST_TYPE)
        & (F.col("value") > F.lit(DATEHIST_MIN_VALUE))
    )
    day = F.date_trunc("day", F.col("ts")).cast("date")
    # the bucket frame feeds both the spine bounds and the fill join; persisted
    # (calendar-bounded: one row per active day, tiny at any data scale) so the
    # 100 TB fact scan happens exactly once — without it Catalyst collapses the
    # bounds branch to min/max over a SECOND full scan
    agg = persist_tracked(
        e.groupBy(day.alias("day")).agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        ),
        "relational_ext.datehist.buckets",
    )
    bounds = agg.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    return spine.join(F.broadcast(agg), "day", "left").select(
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


SQL_AGG_DATEHIST = f"""
WITH f AS (
    SELECT * FROM events
    WHERE event_type = '{DATEHIST_TYPE}' AND value > {DATEHIST_MIN_VALUE}
),
agg AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           {sql_dsum("value", "sum_value")}
    FROM f GROUP BY day
),
spine AS (
    SELECT CAST(unnest(generate_series(
        (SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) FROM f),
        (SELECT CAST(MAX(date_trunc('day', ts)) AS DATE) FROM f),
        INTERVAL 1 DAY)) AS DATE) AS day
)
SELECT spine.day,
       COALESCE(agg.n_events, 0) AS n_events,
       COALESCE(agg.sum_value, 0.0) AS sum_value
FROM spine LEFT JOIN agg USING (day)
"""


COMP_PAGE = 15
# composite after-key: (event_type, day) of the previous page's last bucket
COMP_AFTER_TYPE = "error"
COMP_AFTER_DAY = "2024-01-20"


def q_agg_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite aggregation page — ES `composite` agg with `after`: paginate
    through ALL (event_type, day) buckets in key order, `size` per page.

    The ES semantics allow the after-key to be applied BELOW the aggregation:
    a bucket's key is a function of the row, so rows whose key sorts ≤ the
    cursor can't contribute to this page and are filtered out before the
    shuffle. Deep pages therefore aggregate a shrinking tail instead of
    recomputing and skipping every earlier bucket — the same keyset-vs-offset
    argument as q_page_keyset, applied to GROUP BY keys. At 100 TB this is the
    only way to enumerate a billion-bucket cardinality in bounded responses.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    after_cursor = (F.col("event_type") > F.lit(COMP_AFTER_TYPE)) | (
        (F.col("event_type") == F.lit(COMP_AFTER_TYPE))
        & (day > F.to_date(F.lit(COMP_AFTER_DAY)))
    )
    # the full lexicographic cursor mixes a derived expression (day) into an
    # OR, which no source can push; the redundant first-key lower bound is a
    # plain column conjunct, so it DOES reach the parquet scan as a
    # PushedFilter — row groups entirely before the cursor never leave disk
    first_key_bound = F.col("event_type") >= F.lit(COMP_AFTER_TYPE)
    return (
        e.filter(first_key_bound & after_cursor)
        .groupBy("event_type", day.alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .orderBy("event_type", "day")
        .limit(COMP_PAGE)
    )


SQL_AGG_COMPOSITE = f"""
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       {sql_dsum("value", "sum_value")}
FROM events
WHERE event_type >= '{COMP_AFTER_TYPE}'
  AND (event_type > '{COMP_AFTER_TYPE}'
       OR (event_type = '{COMP_AFTER_TYPE}'
           AND CAST(date_trunc('day', ts) AS DATE) > DATE '{COMP_AFTER_DAY}'))
GROUP BY event_type, day
ORDER BY event_type, day
LIMIT {COMP_PAGE}
"""


FILTERS_HIGH_VALUE = 250.0


def q_agg_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named filter buckets — the ES `filters` aggregation: several named,
    potentially OVERLAPPING predicates, each with its own doc count and metric,
    answered in ONE pass.

    N separate filtered aggregations would scan the fact table N times; here
    every predicate becomes a conditional aggregate (`count(when(p,1))`,
    `sum(when(p, value))`) in a single global agg — one scan, map-side partial
    aggregation, a 1-row result — then `stack()` unpivots that row into the
    per-bucket shape. Adding a bucket adds two columns to the partial
    aggregate, not a scan: the 100 TB cost is constant in bucket count.
    Weekend uses dayofweek (Spark: 1=Sun..7=Sat; DuckDB dow: 0=Sun..6=Sat).
    """
    e = table(spark, sf_dir, "events")
    preds = {
        "clicks": F.col("event_type") == "click",
        "high_value": F.col("value") > F.lit(FILTERS_HIGH_VALUE),
        "weekend": F.dayofweek("ts").isin(1, 7),
    }
    aggs = []
    for k, p in preds.items():
        aggs.append(F.count(F.when(p, 1)).alias(f"n_{k}"))
        aggs.append(dsum(F.when(p, F.col("value")), f"s_{k}"))
    stack = ", ".join(f"'{k}', n_{k}, s_{k}" for k in preds)
    return e.agg(*aggs).selectExpr(
        f"stack({len(preds)}, {stack}) AS (bucket, n_events, sum_value)"
    )


SQL_AGG_FILTERS = f"""
SELECT 'clicks' AS bucket, COUNT(*) AS n_events, {sql_dsum("value", "sum_value")}
FROM events WHERE event_type = 'click'
UNION ALL
SELECT 'high_value', COUNT(*), {sql_dsum("value", "sum_value")}
FROM events WHERE value > {FILTERS_HIGH_VALUE}
UNION ALL
SELECT 'weekend', COUNT(*), {sql_dsum("value", "sum_value")}
FROM events WHERE dayofweek(ts) IN (0, 6)
"""


# moving window: ES moving_fn's `window` — positions over the bucket array
PIPE_WINDOW = 7


def q_agg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline aggregations — ES `derivative`, `cumulative_sum` and
    `moving_fn`/`moving_avg` chained onto a daily date_histogram: per day,
    the bucket metric, its day-over-day delta, its running total, and a
    7-bucket trailing average.

    ES pipeline aggs run over the ALREADY-REDUCED bucket array, never the
    documents — mirrored here: one map-side-combined groupBy is the only pass
    over the fact table; every pipeline stage is a window over the bucket
    frame, which is calendar-bounded (one row per day), so the unpartitioned
    ordered window is over thousands of rows at ANY data scale — the
    single-task window that is forbidden over row-scale frames is the correct
    tool over bucket-scale ones. Derivative subtracts two already-deterministic
    doubles; cumulative and moving sums re-enter decimal inside the frame so
    the running totals stay order-independent, then divide/cast once.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )
    w = Window.orderBy("day")
    dec = F.col("sum_value").cast("decimal(18,2)")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-(PIPE_WINDOW - 1), Window.currentRow)
    return buckets.select(
        "day",
        "n_events",
        "sum_value",
        (F.col("sum_value") - F.lag("sum_value").over(w)).alias("deriv"),
        F.sum(dec).over(cum).cast("double").alias("cum_sum"),
        (F.sum(dec).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias(
            "mov_avg"
        ),
    )


SQL_AGG_PIPELINE = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
)
SELECT day, n_events, sum_value,
       sum_value - lag(sum_value) OVER (ORDER BY day) AS deriv,
       CAST(SUM(CAST(sum_value AS DECIMAL(18,2))) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS cum_sum,
       CAST(SUM(CAST(sum_value AS DECIMAL(18,2))) OVER (
           ORDER BY day ROWS BETWEEN {PIPE_WINDOW - 1} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / COUNT(*) OVER (
           ORDER BY day ROWS BETWEEN {PIPE_WINDOW - 1} PRECEDING AND CURRENT ROW
       ) AS mov_avg
FROM buckets
"""


TERMS_TOP_N = 3
TERMS_OTHER = "__other__"


def q_agg_terms_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms aggregation with the other-bucket — ES `terms` agg `size: N` plus
    `sum_other_doc_count`: the top-N terms by document count, each with its
    metric, and ONE residual row rolling every remaining term together (ES
    reports that residual so truncation is visible, not silent).

    One pass over the fact table reduces to the per-term bucket frame
    (map-side combine — cardinality-bounded, not row-bounded); ranking and the
    residual rollup are then term-cardinality work: a window ranks terms by
    (count desc, term asc — ES's own tie-break), terms past N are re-keyed to
    the sentinel and re-aggregated. Metric sums stay in exact decimal until
    AFTER the residual rollup so the other-bucket total is order-independent,
    then cast to double once.
    """
    e = table(spark, sf_dir, "events")
    buckets = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    rnk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("event_type")))
    return (
        buckets.withColumn("rnk", rnk)
        .select(
            F.when(F.col("rnk") <= TERMS_TOP_N, F.col("event_type"))
            .otherwise(F.lit(TERMS_OTHER))
            .alias("term"),
            "n",
            "sv",
        )
        .groupBy("term")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
    )


SQL_AGG_TERMS_OTHER = f"""
WITH buckets AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS sv
    FROM events GROUP BY event_type
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY n DESC, event_type ASC) AS rnk
    FROM buckets
)
SELECT CASE WHEN rnk <= {TERMS_TOP_N} THEN event_type
            ELSE '{TERMS_OTHER}' END AS term,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(sv) AS DOUBLE) AS sum_value
FROM ranked
GROUP BY term
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
    "q_agg_datehist": q_agg_datehist,
    "q_agg_composite": q_agg_composite,
    "q_agg_filters": q_agg_filters,
    "q_agg_pipeline": q_agg_pipeline,
    "q_agg_terms_other": q_agg_terms_other,
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
    "q_agg_datehist": SQL_AGG_DATEHIST,
    "q_agg_composite": SQL_AGG_COMPOSITE,
    "q_agg_filters": SQL_AGG_FILTERS,
    "q_agg_pipeline": SQL_AGG_PIPELINE,
    "q_agg_terms_other": SQL_AGG_TERMS_OTHER,
    "q_subquery_scalar": SQL_SUBQUERY_SCALAR,
    "q_win_rangeframe": SQL_WIN_RANGEFRAME,
    "q_page_keyset": SQL_PAGE_KEYSET,
    "q_agg_histogram": SQL_AGG_HISTOGRAM,
    "q_agg_stats": SQL_AGG_STATS,
}
