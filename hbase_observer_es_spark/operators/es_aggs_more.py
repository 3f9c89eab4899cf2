"""ES aggregation surface, part 4: the remaining geo/metric/pipeline pieces.

The reference delegates every aggregation to Elasticsearch (README.md:3 in
/root/reference — the coprocessor ships documents; clients query ES), so ES's
agg DSL is the behavioral contract. On top of parts 1-3 (es_aggs.py,
es_aggs_stats.py) this adds:

* `geo_bounds`             — q_agg_geobounds  (per-bucket bounding box)
* `top_metrics`            — q_agg_topmetrics (metric values at the latest sort key)
* `serial_diff`            — q_agg_serialdiff (lag-k differencing over a date_histogram)
* `cumulative_cardinality` — q_agg_cumcard    (distinct-so-far via the exact
                             first-seen reduction, not cross-bucket sketches)
* `percentiles_bucket`     — q_agg_pctbucket  (exact percentiles over the
                             reduced bucket frame)

Determinism: geo bounds min/max the SAME correctly-rounded doubles both
engines derive from integer coordinates (one division each — no accumulation);
top_metrics selects by a UNIQUE composite sort key so argmax has exactly one
winner; serial_diff subtracts two decimal-exact bucket sums once in double.

Scale: geo_bounds and top_metrics are single map-side-combined groupBys over
the fact scan (top_metrics is max_by over a struct — a per-partition running
argmax, NOT a per-group window sort); serial_diff's window runs over the
already-reduced calendar-bounded bucket frame, the q_agg_pipeline posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum
from ..io import table
from .nested_geo import _SQL_LAT, _SQL_LON, _lat, _lon


def q_agg_geobounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geo_bounds` per event_type: the tightest box containing every
    event's derived point (nested_geo's lat/lon — same single-source
    derivation as q_agg_geocentroid, same documented id-range invariant).

    Planar box on a planar fixture: ES itself returns plain top/bottom/left/
    right degrees — no trig, nothing crosses the antimeridian here, so
    min/max over per-row doubles IS the ES answer. Each row's coordinate is
    one integer-derived division, identical on both engines; min/max never
    accumulates error.
    """
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(_lat()).alias("top"),
        F.min(_lat()).alias("bottom"),
        F.min(_lon()).alias("left"),
        F.max(_lon()).alias("right"),
    )


SQL_AGG_GEOBOUNDS = f"""
SELECT event_type, COUNT(*) AS n,
       MAX({_SQL_LAT}) AS top,
       MIN({_SQL_LAT}) AS bottom,
       MIN({_SQL_LON}) AS "left",
       MAX({_SQL_LON}) AS "right"
FROM events
GROUP BY event_type
"""


def q_agg_topmetrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `top_metrics` (size=1) per event_type: the metric columns of the row
    holding the greatest sort key — "the value at the latest timestamp", the
    dashboard current-reading query.

    The sort key is (ts, event_id): event_id is unique, so the argmax has
    exactly one winner on any engine and any partitioning — max_by over an
    unqualified tie would be nondeterministic (the q_pivot/q_topk lesson).

    Plan shape is the point: max_by(struct(metrics), struct(key)) is ONE
    map-side-combinable aggregate — each partition carries a single running
    (key, metrics) pair per group and the shuffle merges those, exactly how
    ES computes top_metrics per shard then reduces. The window-rank
    formulation (the oracle's) would shuffle every fact row to sort whole
    groups; at 100 TB that is the difference between a combiner and a
    per-group sort. (Struct agg buffers force SortAggregate — a linearithmic
    per-partition sort by the closed-cardinality group key — but the combiner
    property is what matters: the exchange moves groups, not facts.)
    """
    e = table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    metrics = F.struct(
        F.col("event_id"), F.col("ts"), F.col("value"), F.col("user_id")
    )
    top = F.max_by(metrics, key)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        top["event_id"].alias("top_event_id"),
        top["ts"].alias("top_ts"),
        top["value"].alias("top_value"),
        top["user_id"].alias("top_user_id"),
    )


SQL_AGG_TOPMETRICS = """
WITH ranked AS (
    SELECT event_type, event_id, ts, value, user_id,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts DESC, event_id DESC) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n_events
    FROM events
)
SELECT event_type, n_events,
       event_id AS top_event_id, ts AS top_ts,
       value AS top_value, user_id AS top_user_id
FROM ranked WHERE rn = 1
"""


SERIAL_LAG = 7  # ES serial_diff `lag`: week-over-week on a daily histogram


def q_agg_serialdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `serial_diff` (lag=7) chained onto a daily date_histogram: each
    day's value sum minus the sum 7 buckets earlier — the seasonality-removed
    series ES pairs with derivative for week-over-week monitoring.

    The q_agg_pipeline posture: the ONLY pass over facts is the map-side-
    combined groupBy; the differencing is a lag window over the reduced
    bucket frame (calendar-bounded — one row per day at ANY data scale, so
    the unpartitioned ordered window is over thousands of rows, never facts).
    Bucket sums are decimal-exact; the subtraction happens once in double;
    the first SERIAL_LAG buckets are NULL on both engines by lag semantics.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(dsum("value", "sum_value"))
    w = Window.orderBy("day")
    return buckets.select(
        "day",
        "sum_value",
        (F.col("sum_value") - F.lag("sum_value", SERIAL_LAG).over(w)).alias(
            "serial_diff"
        ),
    )


SQL_AGG_SERIALDIFF = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
)
SELECT day, sum_value,
       sum_value - lag(sum_value, {SERIAL_LAG}) OVER (ORDER BY day) AS serial_diff
FROM buckets
"""


def q_agg_cumcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `cumulative_cardinality` pipeline agg on a daily date_histogram of
    user_id: per day, that day's distinct users and the distinct-users-so-far
    running total — the "total users to date" dashboard series.

    ES chains a pipeline sum over per-bucket HLL sketches (approximate). The
    EXACT distributed form used here is the first-seen trick: cumulative
    cardinality at day d == |{users whose MIN(day) <= d}|, so one extra
    map-side-combined reduction (min day per user, user-cardinality sized)
    replaces cross-bucket sketch state entirely. Two fact passes total —
    daily distinct + first-seen — then bucket-frame joins/windows only;
    new-user counts join the (calendar-bounded) histogram as a broadcast and
    the running sum is an integer window over buckets. Exact at any scale,
    and engine-identical (integer arithmetic throughout).
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    daily = e.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("daily_card")
    )
    first_seen = e.groupBy("user_id").agg(F.min(day).alias("day"))
    new_users = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.join(F.broadcast(new_users), "day", "left")
        .select(
            "day",
            "daily_card",
            F.sum(F.coalesce(F.col("new_users"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_card"),
        )
    )


SQL_AGG_CUMCARD = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(DISTINCT user_id) AS daily_card
    FROM events GROUP BY day
),
first_seen AS (
    SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
    FROM events GROUP BY user_id
),
new_users AS (SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day)
SELECT d.day, d.daily_card,
       CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY d.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_card
FROM daily d LEFT JOIN new_users n USING (day)
"""


def q_agg_pctbucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `percentiles_bucket` pipeline agg: exact percentiles of the daily
    value-sum buckets (p50/p90 across the histogram) — "what does a typical
    day's volume look like".

    Sibling of q_agg_bucketstats: the ONLY fact pass is the date_histogram
    groupBy; the percentile selection runs over the calendar-bounded bucket
    frame, where an exact sort is trivially cheap at any data scale — which
    is exactly why ES computes percentiles_bucket exactly while the fact-level
    `percentiles` agg is a t-digest (q_agg_pct_sketch's dichotomy). Bucket
    sums are decimal-exact; median/percentile interpolation is one fixed
    a+(b-a)·f sequence, verified against DuckDB quantile_cont by
    q_agg_percentile's precedent.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(dsum("value", "sum_value"))
    return buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.median("sum_value").alias("p50_bucket"),
        F.expr("percentile(sum_value, 0.9)").alias("p90_bucket"),
    )


SQL_AGG_PCTBUCKET = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
)
SELECT COUNT(*) AS n_buckets,
       median(sum_value) AS p50_bucket,
       quantile_cont(sum_value, 0.9) AS p90_bucket
FROM buckets
"""


QUERIES = {
    "q_agg_geobounds": q_agg_geobounds,
    "q_agg_topmetrics": q_agg_topmetrics,
    "q_agg_serialdiff": q_agg_serialdiff,
    "q_agg_cumcard": q_agg_cumcard,
    "q_agg_pctbucket": q_agg_pctbucket,
}

ORACLES = {
    "q_agg_geobounds": SQL_AGG_GEOBOUNDS,
    "q_agg_topmetrics": SQL_AGG_TOPMETRICS,
    "q_agg_serialdiff": SQL_AGG_SERIALDIFF,
    "q_agg_cumcard": SQL_AGG_CUMCARD,
    "q_agg_pctbucket": SQL_AGG_PCTBUCKET,
}
