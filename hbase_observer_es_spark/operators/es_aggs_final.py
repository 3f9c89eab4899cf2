"""ES aggregation surface, part 5: distribution metrics and the remaining
pipeline aggs.

The reference delegates every aggregation to Elasticsearch (README.md:3 in
/root/reference — the coprocessor ships documents; clients query ES), so ES's
agg DSL is the behavioral contract. On top of parts 1-4 this adds:

* `boxplot`                    — q_agg_boxplot   (min/q1/q2/q3/max per bucket)
* `median_absolute_deviation` — q_agg_mad       (robust dispersion)
* `t_test`                     — q_agg_ttest     (Welch t-statistic between
                                 two term-filtered populations)
* `rate`                       — q_agg_rate      (per-day rate inside a
                                 monthly date_histogram)
* `date_range`                 — q_agg_daterange (open-ended calendar buckets)
* `moving_fn`                  — q_agg_movfn     (trailing-window average over
                                 a date_histogram, shift=0 semantics)
* `bucket_sort`                — q_agg_bucketsort (sort/from/size truncation
                                 of a histogram's bucket frame)
* `derivative` (chained)       — q_agg_derivative (1st + 2nd difference)
* `variable_width_histogram`  — q_agg_varwidth  (equal-frequency
                                 re-expression of ES's clustering buckets)

Determinism: every percentile is the exact a+(b−a)·f interpolation verified
against DuckDB quantile_cont (q_agg_percentile precedent); variances reuse the
matrix_stats discipline — ≤2dp doubles cast to DECIMAL(18,2) before squaring so
sums are exact and order-free, then a fixed IEEE sequence with sqrt as the only
root; the t_test p-value is deliberately omitted (incomplete beta = libm,
engine-divergent — the D10/D12 rule), the statistic and Welch–Satterthwaite df
are rational+sqrt. moving_fn averages EXACT decimal window sums, divided once
in double. ES's variable_width_histogram is explicitly order-sensitive
("results depend on document order"); the deterministic re-expression here is
equal-frequency bucketing over the unique total order (value, event_id).

Scale: every fact pass is a single map-side-combined groupBy; windows/sorts/
percentile selections run over calendar- or cardinality-bounded bucket frames
(the q_agg_pipeline posture). The two exceptions are disclosed in their
docstrings: q_agg_mad's second fact pass (inherent to nested medians — ES pays
the same second t-digest) and q_agg_varwidth's global ntile sort (swap for
approx cutpoints at 100 TB; shape unchanged).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum
from ..io import table

_DEC = "decimal(18,2)"
# VARCHAR-routed decimal→double cast: correctly rounded at any magnitude
# (q_agg_matrixstats precedent — DuckDB's direct cast double-rounds past 2^53).
_SQL_DEC_SUM = "CAST(CAST(SUM(CAST({x} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
_SQL_DEC_SUMSQ = (
    "CAST(CAST(SUM(CAST({x} AS DECIMAL(18,2)) * CAST({x} AS DECIMAL(18,2)))"
    " AS VARCHAR) AS DOUBLE)"
)


def q_agg_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `boxplot` agg per event_type: min, q1, q2, q3, max of value.

    ES computes the quartiles on a t-digest (approximate); the engine's exact
    selection is strictly stronger at fixture scale and the documented 100 TB
    swap is approx_percentile with a rows-only oracle — the plan shape (one
    groupBy over the scan, exact sort only within cardinality-bounded groups
    via percentile's internal buffer) is unchanged. Interpolation is the fixed
    a+(b−a)·f sequence, cross-engine-verified by q_agg_percentile.
    """
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.median("value").alias("q2"),
        F.expr("percentile(value, 0.75)").alias("q3"),
        F.max("value").alias("max_v"),
    )


SQL_AGG_BOXPLOT = """
SELECT event_type, COUNT(*) AS n,
       MIN(value) AS min_v,
       quantile_cont(value, 0.25) AS q1,
       median(value) AS q2,
       quantile_cont(value, 0.75) AS q3,
       MAX(value) AS max_v
FROM events
GROUP BY event_type
"""


def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `median_absolute_deviation` per event_type: median(|x − median(x)|).

    Inherently two-phase — ES pays the same shape (a t-digest for the median,
    a second t-digest of deviations). Phase 1 reduces to one row per
    event_type (cardinality-bounded, broadcast back onto the scan); phase 2 is
    a second map-side-combined groupBy over |value − med|, a per-row exact
    IEEE subtraction. Exact medians at fixture scale; the 100 TB swap is
    approx_percentile in both phases, shape unchanged.
    """
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),  # constant per group; min() for determinism
            F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
        )
    )


SQL_AGG_MAD = """
WITH med AS (
    SELECT event_type, median(value) AS med FROM events GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n, MIN(m.med) AS med,
       median(abs(e.value - m.med)) AS mad
FROM events e JOIN med m USING (event_type)
GROUP BY e.event_type
"""


TTEST_A = "click"
TTEST_B = "view"


def q_agg_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `t_test` agg (type=heteroscedastic): Welch's t between the `value`
    populations of two term filters (event_type = click vs view).

    Emits the t statistic and the Welch–Satterthwaite df, NOT the p-value —
    the p-value needs the incomplete beta function (libm, engine-divergent;
    the D10/D12 rule), while t and df are rational in the exact decimal sums
    with sqrt (IEEE-exact) as the only root. Sample variance uses the
    matrix_stats discipline: ≤2dp doubles cast to DECIMAL(18,2) before
    squaring, so both engines sum identical exact decimals in any order.

    ONE conditional-aggregation pass over the scan (map-side combined, six
    running decimals), never two filtered subqueries — at 100 TB the second
    scan is the cost that matters.
    """
    e = table(spark, sf_dir, "events")
    v = F.col("value").cast(_DEC)

    def side(tag: str, label: str) -> list[Column]:
        m = F.col("event_type") == tag
        z = F.lit(0).cast(_DEC)
        return [
            F.sum(m.cast("bigint")).alias(f"n_{label}"),
            F.sum(F.when(m, v).otherwise(z)).cast("double").alias(f"s_{label}"),
            F.sum(F.when(m, v * v).otherwise(F.lit(0).cast("decimal(18,4)")))
            .cast("double")
            .alias(f"ss_{label}"),
        ]

    agg = e.agg(*side(TTEST_A, "a"), *side(TTEST_B, "b"))

    def stats(label: str) -> tuple[Column, Column, Column]:
        n = F.col(f"n_{label}").cast("double")
        s = F.col(f"s_{label}")
        ss = F.col(f"ss_{label}")
        mean = s / n
        var = (ss - s * s / n) / (n - F.lit(1.0))  # sample variance
        return n, mean, var / n  # (n, mean, var/n)

    na, ma, sea = stats("a")
    nb, mb, seb = stats("b")
    se2 = sea + seb
    t = (ma - mb) / F.sqrt(se2)
    df = (se2 * se2) / (
        sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))
    )
    # degenerate-population guard: at n ≤ 1 the (n−1) divisor hits zero and
    # at n = 0 the mean's s/n is 0/0, where Spark double division yields
    # NaN/Inf but DuckDB yields NULL — both engines emit NULL explicitly
    # instead (the q_agg_normalize precedent); means only need their own
    # side's n > 0
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return agg.select(
        F.col("n_a"),
        F.col("n_b"),
        F.when(F.col("n_a") > 0, ma).alias("mean_a"),
        F.when(F.col("n_b") > 0, mb).alias("mean_b"),
        F.when(ok, t).alias("t_stat"),
        F.when(ok, df).alias("welch_df"),
    )


def _sql_ttest_side(tag: str, label: str) -> str:
    return (
        f"CAST(SUM(CASE WHEN event_type = '{tag}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{label},\n"
        f"           CAST(CAST(SUM(CASE WHEN event_type = '{tag}'"
        f" THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)"
        f" AS VARCHAR) AS DOUBLE) AS s_{label},\n"
        f"           CAST(CAST(SUM(CASE WHEN event_type = '{tag}'"
        f" THEN CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))"
        f" ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS ss_{label}"
    )


# Mirror the Spark association order exactly: mean = s/n; var = (ss - s*s/n)/(n-1);
# se = var/n; se2 = sea + seb; t = (ma-mb)/sqrt(se2); df = se2^2 / (sea^2/(na-1) + seb^2/(nb-1)).
SQL_AGG_TTEST = f"""
WITH s AS (
    SELECT {_sql_ttest_side(TTEST_A, "a")},
           {_sql_ttest_side(TTEST_B, "b")}
    FROM events
),
d AS (
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 THEN s_a / CAST(n_a AS DOUBLE) END AS mean_a,
           CASE WHEN n_b > 0 THEN s_b / CAST(n_b AS DOUBLE) END AS mean_b,
           ((ss_a - s_a * s_a / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
               / CAST(n_a AS DOUBLE) AS se_a,
           ((ss_b - s_b * s_b / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
               / CAST(n_b AS DOUBLE) AS se_b,
           CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb
    FROM s
)
SELECT n_a, n_b, mean_a, mean_b,
       CASE WHEN n_a > 1 AND n_b > 1
            THEN (mean_a - mean_b) / sqrt(se_a + se_b) END AS t_stat,
       CASE WHEN n_a > 1 AND n_b > 1
            THEN ((se_a + se_b) * (se_a + se_b))
                 / (se_a * se_a / (na - 1.0) + se_b * se_b / (nb - 1.0))
            END AS welch_df
FROM d
"""


def q_agg_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rate` agg (unit=day) inside a monthly date_histogram: each month's
    value sum and event count scaled to a per-day rate — the normalized form
    that makes a 28-day February comparable to a 31-day March.

    One map-side-combined groupBy over the scan; the day-count divisor comes
    from the calendar (day(last_day(month))), an integer — each rate is one
    deterministic double division off the exact decimal month sum.
    """
    e = table(spark, sf_dir, "events")
    month = F.date_trunc("month", F.col("ts")).cast("date")
    days = F.dayofmonth(F.last_day(F.col("month"))).cast("double")
    return (
        e.groupBy(month.alias("month"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "month",
            "n_events",
            "sum_value",
            (F.col("sum_value") / days).alias("value_per_day"),
            (F.col("n_events").cast("double") / days).alias("events_per_day"),
        )
    )


SQL_AGG_RATE = f"""
WITH m AS (
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           COUNT(*) AS n_events,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY month
)
SELECT month, n_events, sum_value,
       sum_value / CAST(date_part('day', last_day(month)) AS DOUBLE)
           AS value_per_day,
       CAST(n_events AS DOUBLE) / CAST(date_part('day', last_day(month)) AS DOUBLE)
           AS events_per_day
FROM m
"""


# date_range bucket edges (from inclusive, to exclusive — ES date_range semantics).
DR_EDGES = ("2024-04-01", "2024-08-01")


def q_agg_daterange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `date_range` agg: three open-ended calendar buckets over ts —
    (−∞, e0), [e0, e1), [e1, ∞) — with count and exact value sum per bucket.

    ES's from/to are inclusive-from, exclusive-to; bucket keys mirror ES's
    "*-e0" / "e0-e1" / "e1-*" naming. One map-side-combined pass; the
    when-chain is whole-stage-codegen column math pushed onto the scan.
    """
    e = table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    e0, e1 = [F.lit(x).cast("date") for x in DR_EDGES]
    bucket = (
        F.when(d < e0, F.lit(f"*-{DR_EDGES[0]}"))
        .when(d < e1, F.lit(f"{DR_EDGES[0]}-{DR_EDGES[1]}"))
        .otherwise(F.lit(f"{DR_EDGES[1]}-*"))
    )
    return e.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("doc_count"), dsum("value", "sum_value")
    )


SQL_AGG_DATERANGE = f"""
SELECT CASE
         WHEN CAST(ts AS DATE) < DATE '{DR_EDGES[0]}' THEN '*-{DR_EDGES[0]}'
         WHEN CAST(ts AS DATE) < DATE '{DR_EDGES[1]}'
             THEN '{DR_EDGES[0]}-{DR_EDGES[1]}'
         ELSE '{DR_EDGES[1]}-*'
       END AS bucket,
       COUNT(*) AS doc_count,
       {sql_dsum("value", "sum_value")}
FROM events
GROUP BY 1
"""


MOVFN_WINDOW = 7  # ES moving_fn window (shift=0: the 7 buckets BEFORE current)


def q_agg_movfn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `moving_fn` (MovingFunctions.unweightedAvg, window=7, shift=0) over
    a daily date_histogram: each day paired with the average of the previous
    7 days' sums — the trailing-baseline series dashboards diff against.

    shift=0 in ES places the window strictly BEFORE the current bucket:
    frame [i−7, i−1]. The window average divides an EXACT decimal frame sum
    (associative — order-free on both engines) by the frame count, once, in
    double; the frame's decimal→double cast is exact below 2^53 (bucket sums
    are ~1e6·100). The q_agg_pipeline posture: one fact pass, the window runs
    over the calendar-bounded bucket frame. First buckets have a partial
    window (ES emits the partial average too until `window` values exist).
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(
        F.sum(F.col("value").cast(_DEC)).alias("sum_dec")
    )
    w = Window.orderBy("day").rowsBetween(-MOVFN_WINDOW, -1)
    mov = F.sum("sum_dec").over(w).cast("double") / F.count(F.lit(1)).over(w)
    return buckets.select(
        "day",
        F.col("sum_dec").cast("double").alias("sum_value"),
        mov.alias("trailing_avg"),
    )


SQL_AGG_MOVFN = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
    FROM events GROUP BY day
)
SELECT day, CAST(sum_dec AS DOUBLE) AS sum_value,
       CAST(SUM(sum_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS trailing_avg
FROM buckets
WINDOW w AS (ORDER BY day ROWS BETWEEN {MOVFN_WINDOW} PRECEDING AND 1 PRECEDING)
"""


BSORT_FROM = 2  # ES bucket_sort: from (skip) ...
BSORT_SIZE = 5  # ... and size (take)


def q_agg_bucketsort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bucket_sort` pipeline agg: order a daily date_histogram's buckets
    by their value sum (desc), skip `from`=2, keep `size`=5 — "the 3rd through
    7th busiest days".

    Sort/truncate applies to the REDUCED bucket frame only (ES computes it on
    the coordinating node after bucket reduction) — the fact pass is the
    histogram groupBy; the row_number window and filter touch one row per
    day. Day is the unique tiebreak, so the cut is deterministic.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(dsum("value", "sum_value"))
    w = Window.orderBy(F.desc("sum_value"), F.asc("day"))
    return (
        buckets.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") > BSORT_FROM) & (F.col("rn") <= BSORT_FROM + BSORT_SIZE)
        )
        .select("day", "sum_value", F.col("rn").cast("int").alias("rank"))
    )


SQL_AGG_BUCKETSORT = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
),
ranked AS (
    SELECT day, sum_value,
           CAST(row_number() OVER (ORDER BY sum_value DESC, day ASC) AS INTEGER)
               AS rank
    FROM buckets
)
SELECT day, sum_value, rank FROM ranked
WHERE rank > {BSORT_FROM} AND rank <= {BSORT_FROM + BSORT_SIZE}
"""


def q_agg_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `derivative` pipeline agg, chained: a monthly date_histogram's value
    sum, its first derivative (month-over-month change) and the second
    derivative (derivative of the derivative — ES supports chaining pipeline
    aggs, and this is the canonical acceleration example from its docs).

    Sibling of q_agg_serialdiff (which is lag-k): derivative is lag-1, and
    the chained second difference exercises pipeline-over-pipeline reduction.
    One fact pass; both lags are integer-frame windows over the
    calendar-bounded month frame; each difference subtracts two decimal-exact
    sums once in double. First buckets are NULL by lag semantics on both
    engines.
    """
    e = table(spark, sf_dir, "events")
    month = F.date_trunc("month", F.col("ts")).cast("date")
    buckets = e.groupBy(month.alias("month")).agg(dsum("value", "sum_value"))
    w = Window.orderBy("month")
    d1 = F.col("sum_value") - F.lag("sum_value", 1).over(w)
    out = buckets.select("month", "sum_value", d1.alias("deriv1"))
    d2 = F.col("deriv1") - F.lag("deriv1", 1).over(w)
    return out.select("month", "sum_value", "deriv1", d2.alias("deriv2"))


SQL_AGG_DERIVATIVE = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY month
),
d1 AS (
    SELECT month, sum_value,
           sum_value - lag(sum_value, 1) OVER (ORDER BY month) AS deriv1
    FROM buckets
)
SELECT month, sum_value, deriv1,
       deriv1 - lag(deriv1, 1) OVER (ORDER BY month) AS deriv2
FROM d1
"""


VWH_BUCKETS = 8  # ES variable_width_histogram `buckets`


def q_agg_varwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `variable_width_histogram` (buckets=8) over value, re-expressed
    deterministically: ES's one-pass clustering is document-order-sensitive
    (its docs disclaim "bucket bounds vary with document order"), which can
    never hash-verify; the engine substitutes the equal-frequency histogram —
    same product (narrow buckets where data is dense, wide where sparse),
    deterministic under the unique total order (value, event_id).

    Per bucket: min/max bounds, count, and the exact-decimal mean. The ntile
    is a global sort at fixture scale — disclosed; the 100 TB form computes
    approx_percentile cutpoints (one aggregate, map-side combined) and
    bucketizes by range in a second map-only pass, no global sort; the
    OUTPUT shape (8 rows) is identical.
    """
    e = table(spark, sf_dir, "events")
    w = Window.orderBy(F.asc("value"), F.asc("event_id"))
    tiled = e.select(
        "value", F.ntile(VWH_BUCKETS).over(w).cast("int").alias("bucket")
    )
    return tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "mean_v"
        ),
    )


SQL_AGG_VARWIDTH = f"""
WITH tiled AS (
    SELECT value,
           CAST(ntile({VWH_BUCKETS}) OVER (ORDER BY value ASC, event_id ASC)
                AS INTEGER) AS bucket
    FROM events
)
SELECT bucket, COUNT(*) AS doc_count,
       MIN(value) AS min_v, MAX(value) AS max_v,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS mean_v
FROM tiled
GROUP BY bucket
"""


ITEMSET_MIN_SUPPORT = 2  # ES frequent_item_sets minimum_support (absolute form)


def q_agg_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `frequent_item_sets` (size=2) over per-user event_type baskets:
    which event types co-occur for the same user, with absolute support and
    the support ratio — the market-basket agg ES runs for co-occurrence
    analysis.

    Spark-first shape: ONE shuffle builds the baskets (collect_set per user,
    bounded by the event-type domain), pair expansion is map-side array math
    over the sorted basket (≤ C(|domain|,2) pairs per user), and the pair
    reduction shuffles a domain²-bounded frame — never a self-join of the
    fact table on user_id, which would shuffle the facts twice and explode
    skewed users. The basket count joins back as a 1-row broadcast. Support
    ratio is one double division off integer counts. Itemsets of size m > 2
    generalize the same expansion (nested slice/transform); size=2 is the ES
    default report.
    """
    e = table(spark, sf_dir, "events")
    baskets = e.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("items")
    )
    a = F.col("items")
    pairs = F.flatten(
        F.transform(
            a,
            lambda x, i: F.transform(
                F.slice(a, i + F.lit(2), F.size(a)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    return (
        baskets.select(F.explode(pairs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= ITEMSET_MIN_SUPPORT)
        .join(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "support",
            (F.col("support").cast("double") / F.col("n_baskets").cast("double")).alias(
                "support_ratio"
            ),
        )
    )


# The oracle uses the equivalent relational form (distinct self-join with
# item_a < item_b) — same result set, easier to express in plain SQL; the
# Spark side deliberately does NOT use this shape (see docstring).
SQL_AGG_ITEMSETS = f"""
WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT COUNT(DISTINCT user_id) AS n_baskets FROM events),
pairs AS (
    SELECT b1.event_type AS item_a, b2.event_type AS item_b, COUNT(*) AS support
    FROM b b1 JOIN b b2
      ON b1.user_id = b2.user_id AND b1.event_type < b2.event_type
    GROUP BY 1, 2
)
SELECT item_a, item_b, support,
       CAST(support AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support_ratio
FROM pairs, n
WHERE support >= {ITEMSET_MIN_SUPPORT}
"""


QUERIES = {
    "q_agg_boxplot": q_agg_boxplot,
    "q_agg_mad": q_agg_mad,
    "q_agg_ttest": q_agg_ttest,
    "q_agg_rate": q_agg_rate,
    "q_agg_daterange": q_agg_daterange,
    "q_agg_movfn": q_agg_movfn,
    "q_agg_bucketsort": q_agg_bucketsort,
    "q_agg_derivative": q_agg_derivative,
    "q_agg_varwidth": q_agg_varwidth,
    "q_agg_itemsets": q_agg_itemsets,
}

ORACLES = {
    "q_agg_boxplot": SQL_AGG_BOXPLOT,
    "q_agg_mad": SQL_AGG_MAD,
    "q_agg_ttest": SQL_AGG_TTEST,
    "q_agg_rate": SQL_AGG_RATE,
    "q_agg_daterange": SQL_AGG_DATERANGE,
    "q_agg_movfn": SQL_AGG_MOVFN,
    "q_agg_bucketsort": SQL_AGG_BUCKETSORT,
    "q_agg_derivative": SQL_AGG_DERIVATIVE,
    "q_agg_varwidth": SQL_AGG_VARWIDTH,
    "q_agg_itemsets": SQL_AGG_ITEMSETS,
}
