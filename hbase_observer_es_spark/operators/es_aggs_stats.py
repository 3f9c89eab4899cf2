"""ES aggregation surface, part 3: statistics-flavored bucket/metric aggs.

The reference delegates every aggregation to Elasticsearch (README.md:3 in
/root/reference — the coprocessor only ships documents; clients query ES), so
ES's agg DSL is the behavioral contract. This module covers the statistics
family on top of es_aggs.py part 1/2:

* `multi_terms`            — q_agg_multiterms  (composite-key terms, top-N)
* `string_stats`           — q_agg_stringstats (length stats per bucket)
* `matrix_stats`           — q_agg_matrixstats (variance/covariance/correlation)
* `geo_centroid`           — q_agg_geocentroid (per-bucket mean point)
* `min/max/avg/sum_bucket` — q_agg_bucketstats (pipeline reductions over buckets)
* `scripted_metric`        — q_agg_scripted    (custom ordered fold per bucket)
* `sampler`                — q_agg_sampler     (bounded best-first sample + sub-agg)
* `normalize`              — q_agg_normalize   (min-max rescale over the bucket frame)
* `bucket_script`          — q_agg_bucket_script (sibling-metric arithmetic per bucket)

Determinism notes (cross-engine hash contract, DIVERGENCES.md):
* every mean/variance/covariance routes double sums through exact DECIMAL
  accumulation (functions.dsum discipline), converting to double once, then a
  fixed parenthesized sequence of IEEE ops both engines execute identically;
* `string_stats` omits ES's `entropy` field: it needs log2 (libm, not
  bit-stable across engines — the D10/D12 rule); the length stats are the
  hash-verified surface;
* `scripted_metric` folds in an explicit (ts, event_id) order — scripted
  reductions are only reproducible at all if the bucket defines a total order,
  which is also what makes the DuckDB mirror possible;
* correlation uses sqrt only (IEEE-exact, the τ=0.5 rule) — no other libm;
* id-range precondition (documented invariant): `geo_centroid` inherits
  nested_geo's `user_id * 2654435761` derivation, which needs |user_id| below
  ~3.47e9 to stay inside int64 (fixture ids are ≤1e6). Past that bound Spark
  wraps silently while DuckDB raises — asymmetric, so the bound is asserted
  as a precondition, not handled. `sampler` instead reduces the id modulo a
  small prime before the multiply and is safe for any bigint id.

Scale: every query is one map-side-combined groupBy over the fact scan;
pipeline/bucket stages run over the already-reduced bucket frame
(calendar- or cardinality-bounded, never row-scale). scripted_metric's
collect_list is per-bucket state — bounded by the bucket's row share; at
100 TB you shard the fold key (the same pack-within-shard move as
q_text_pack_sharded) if a single bucket's history outgrows task memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum
from ..io import table
from .nested_geo import _KNUTH

MULTITERMS_N = 3


def q_agg_multiterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `multi_terms`: terms buckets keyed by a FIELD TUPLE
    (l_returnflag, l_linestatus), ordered by doc count, top-N — the composite
    key ES's plain `terms` cannot express without script concatenation.

    One map-side-combined groupBy on the tuple; the top-N cut is a
    TakeOrdered over the (cardinality-bounded) bucket frame.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy(F.desc("n_docs"), F.asc("l_returnflag"), F.asc("l_linestatus"))
        .limit(MULTITERMS_N)
    )


SQL_AGG_MULTITERMS = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_docs,
       {sql_dsum("l_extendedprice", "sum_price")}
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY n_docs DESC, l_returnflag ASC, l_linestatus ASC
LIMIT {MULTITERMS_N}
"""


def q_agg_stringstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `string_stats` over documents.text, bucketed by lang: count and
    min/max/avg character length. `avg_len` is an exact integer sum divided
    once in double (bigint sums are exact — no decimal needed).

    ES also reports Shannon `entropy`; omitted here — log2 is a libm
    transcendental and not bit-stable across engines (module docstring).
    """
    d = table(spark, sf_dir, "documents")
    ln = F.length(F.col("text")).cast("bigint")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
        (F.sum(ln).cast("double") / F.count(F.lit(1))).alias("avg_len"),
    )


SQL_AGG_STRINGSTATS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(MIN(length(text)) AS BIGINT) AS min_len,
       CAST(MAX(length(text)) AS BIGINT) AS max_len,
       CAST(CAST(SUM(length(text)) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_len
FROM documents
GROUP BY lang
"""


def q_agg_matrixstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `matrix_stats` over (l_quantity, l_extendedprice) per l_returnflag:
    count, means, population variances, covariance, and Pearson correlation.

    Exactness plan: each factor is cast to DECIMAL(18,2) BEFORE multiplying
    (the doubles carry ≤2dp values, so the cast recovers the exact value and
    the decimal product/sum is exact and order-independent); the five exact
    sums convert to double once, then variance/covariance/correlation are a
    fixed sequence of IEEE ops — sqrt is the only root (exactly rounded).
    One pass, map-side partial aggregation; bucket frame is
    cardinality-bounded.

    Oracle gotcha: DuckDB's direct DECIMAL→DOUBLE cast double-rounds (int128
    → double, then ÷10^scale) and drifts one ulp from Spark's
    correctly-rounded conversion once the scaled integer exceeds 2^53 — the
    squared sums here are the first aggregates in the repo wide enough to
    hit it. The SQL twin therefore routes those casts through the exact
    decimal STRING (CAST(dec AS VARCHAR) AS DOUBLE), which parses
    correctly-rounded.
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / n
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / n
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n).alias("mean_q"),
        (F.col("sy") / n).alias("mean_price"),
        var_x.alias("var_q"),
        var_y.alias("var_price"),
        cov.alias("covariance"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).alias("correlation"),
    )


SQL_AGG_MATRIXSTATS = """
WITH s AS (
    -- VARCHAR-routed decimal->double casts: correctly rounded at any
    -- magnitude, unlike DuckDB's direct cast (see q_agg_matrixstats docstring)
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS sx,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS sy,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS sxx,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS syy,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       sx / CAST(n AS DOUBLE) AS mean_q,
       sy / CAST(n AS DOUBLE) AS mean_price,
       (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_q,
       (syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_price,
       (sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS covariance,
       ((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
           / (sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
              * sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
           AS correlation
FROM s
"""


def q_agg_geocentroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geo_centroid` per event_type over the derived point column
    (nested_geo's synthetic lat/lon — same derivation, single source of
    truth for the multipliers).

    The centroid averages the INTEGER pre-projection coordinates (exact
    bigint sums), then applies the /100 − offset projection once in double —
    the same move that keeps every geo query here off libm. Planar centroid,
    not spherical: real geo_centroid's great-circle mean needs trig (the
    D10/D12 libm rule); at fixture coordinates the planar mean is the
    hash-stable equivalent.
    """
    e = table(spark, sf_dir, "events")
    ilat = (F.col("user_id") * _KNUTH % 18000).cast("bigint")
    ilon = ((F.col("user_id") * _KNUTH + F.col("event_id") * 40503) % 36000).cast(
        "bigint"
    )
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ilat).alias("slat"),
        F.sum(ilon).alias("slon"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "event_type",
        "n",
        (F.col("slat").cast("double") / n / F.lit(100.0) - F.lit(90.0)).alias(
            "centroid_lat"
        ),
        (F.col("slon").cast("double") / n / F.lit(100.0) - F.lit(180.0)).alias(
            "centroid_lon"
        ),
    )


SQL_AGG_GEOCENTROID = f"""
WITH s AS (
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(user_id * {_KNUTH} % 18000) AS BIGINT) AS slat,
           CAST(SUM((user_id * {_KNUTH} + event_id * 40503) % 36000) AS BIGINT) AS slon
    FROM events GROUP BY event_type
)
SELECT event_type, n,
       CAST(slat AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 - 90.0 AS centroid_lat,
       CAST(slon AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 - 180.0 AS centroid_lon
FROM s
"""


def q_agg_bucketstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sibling pipeline aggregations — `min_bucket` / `max_bucket` /
    `avg_bucket` / `sum_bucket` over a daily date_histogram of event value
    sums: one row summarizing the bucket array.

    Like q_agg_pipeline (relational_ext.py:293), the pipeline stage reduces
    the ALREADY-AGGREGATED bucket frame — the only pass over the fact table
    is the date_histogram groupBy. The bucket sums are exact decimals cast to
    double; the sibling avg/sum re-enter decimal (exact re-cast of ≤2dp
    values) so the second-level reduction is order-independent too.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(dsum("value", "sum_value"))
    dec = F.col("sum_value").cast("decimal(18,2)")
    return buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.min("sum_value").alias("min_bucket"),
        F.max("sum_value").alias("max_bucket"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_bucket"),
        F.sum(dec).cast("double").alias("sum_bucket"),
    )


SQL_AGG_BUCKETSTATS = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
)
SELECT COUNT(*) AS n_buckets,
       MIN(sum_value) AS min_bucket,
       MAX(sum_value) AS max_bucket,
       CAST(SUM(CAST(sum_value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bucket,
       CAST(SUM(CAST(sum_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_bucket
FROM buckets
"""


DECAY = 0.5  # power of two: the multiply is IEEE-exact, never rounds


def q_agg_scripted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `scripted_metric`: an arbitrary per-bucket fold the built-in metrics
    can't express — here an exponentially-decayed value sum per event_type,
    acc ← acc·0.5 + value, folded in (ts, event_id) arrival order.

    Scripted reductions are only reproducible if the bucket defines a total
    order, so the fold runs over the ts-sorted value array: collect_list →
    array_sort → F.aggregate (the sorted-fold discipline q_mixture_weights
    uses). The decay factor is a power of two — the multiply never rounds —
    and the adds execute in one fixed order on both engines.

    Scale: per-bucket state is the bucket's value history; event_type has
    closed cardinality here. For row-scale keys, shard the fold key and
    combine per-shard results (the map-reduce form ES's scripted_metric
    `combine_script`/`reduce_script` itself requires).
    """
    e = table(spark, sf_dir, "events")
    vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    decayed = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: acc * F.lit(DECAY) + x
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), decayed.alias("decayed_sum")
    )


SQL_AGG_SCRIPTED = f"""
SELECT event_type, COUNT(*) AS n_events,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(value ORDER BY ts, event_id)),
           (acc, x) -> acc * {DECAY} + x) AS decayed_sum
FROM events
GROUP BY event_type
"""


SAMPLER_N = 200  # ES sampler `shard_size` analogue: sample bound, not corpus bound


def q_agg_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `sampler` aggregation: run the sub-aggregation over a bounded,
    best-first SAMPLE of documents instead of the whole index — here the
    SAMPLER_N documents ranked by the deterministic Knuth hash (the
    module-standard stand-in for a relevance score; no RNG, retry-stable,
    same discipline as q_sample_stratified/diversified), with a per-lang
    count + mean-length sub-agg over the sample.

    Plan: the sample cut is a TakeOrdered (per-partition heaps, never a
    global sort) bounded by the parameter; the sub-agg reduces the
    SAMPLER_N-row frame. The diversified variant (q_sample_diversified)
    adds the per-value cap; this is the plain form.

    The id is reduced modulo a small prime BEFORE the Knuth multiply: the
    product then stays < 1e6·2.7e9 ≈ 2.7e15, inside int64 for ANY bigint
    doc_id. Without the reduction, ids above ~3.5e9 would silently wrap in
    Spark but raise out-of-range in DuckDB — an asymmetric failure, not a
    comparable divergence.
    """
    d = table(spark, sf_dir, "documents")
    h = ((F.col("doc_id") % 1_000_003) * 2654435761) % 1_000_000_007
    sample = (
        d.select("doc_id", "lang", F.length("text").cast("bigint").alias("len"),
                 h.alias("h"))
        .orderBy("h", "doc_id")
        .limit(SAMPLER_N)
    )
    return sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("len").cast("double") / F.count(F.lit(1))).alias("avg_len"),
    )


SQL_AGG_SAMPLER = f"""
WITH sample AS (
    SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS len,
           ((doc_id % 1000003) * 2654435761) % 1000000007 AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT {SAMPLER_N}
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(CAST(SUM(len) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_len
FROM sample
GROUP BY lang
"""


def q_agg_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `normalize` pipeline aggregation (method: min-max rescale): daily
    value sums rescaled to [0,1] over the bucket frame.

    Like every pipeline agg here, the rescale consumes the ALREADY-REDUCED
    bucket frame: min/max are unpartitioned windows over calendar-bounded
    rows (never fact rows), and (v−min)/(max−min) is a fixed IEEE sequence
    over identical doubles on both engines. Degenerate frame (max == min,
    i.e. every bucket equal): emit NULL on both engines — Spark's 0.0/0.0
    is NaN while DuckDB's is NULL, so the division must never execute there.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(dsum("value", "sum_value"))
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lo, hi = F.min("sum_value").over(w), F.max("sum_value").over(w)
    return buckets.select(
        "day",
        "sum_value",
        F.when(hi != lo, (F.col("sum_value") - lo) / (hi - lo))
        .otherwise(F.lit(None).cast("double"))
        .alias("norm_value"),
    )


SQL_AGG_NORMALIZE = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
)
SELECT day, sum_value,
       CASE WHEN MAX(sum_value) OVER () <> MIN(sum_value) OVER ()
            THEN (sum_value - MIN(sum_value) OVER ()) /
                 (MAX(sum_value) OVER () - MIN(sum_value) OVER ())
            ELSE NULL END AS norm_value
FROM buckets
"""


def q_agg_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bucket_script` pipeline aggregation: an arbitrary arithmetic
    expression over SIBLING metrics within each bucket — here per-day error
    rate (errors/total) and mean value per event.

    Both sibling metrics come from ONE map-side-combined pass (conditional
    aggregation, the q_agg_filters move); the script stage is pure column
    arithmetic on the bucket frame. Ratios of exact integers / decimal-exact
    sums divide once in double — engine-exact.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    buckets = e.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        dsum("value", "sum_value"),
    )
    return buckets.select(
        "day",
        "n_events",
        "n_errors",
        (F.col("n_errors").cast("double") / F.col("n_events")).alias("error_rate"),
        (F.col("sum_value") / F.col("n_events")).alias("value_per_event"),
    )


SQL_AGG_BUCKET_SCRIPT = f"""
WITH buckets AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors,
           {sql_dsum("value", "sum_value")}
    FROM events GROUP BY day
)
SELECT day, n_events, n_errors,
       CAST(n_errors AS DOUBLE) / n_events AS error_rate,
       sum_value / n_events AS value_per_event
FROM buckets
"""


QUERIES = {
    "q_agg_multiterms": q_agg_multiterms,
    "q_agg_stringstats": q_agg_stringstats,
    "q_agg_matrixstats": q_agg_matrixstats,
    "q_agg_geocentroid": q_agg_geocentroid,
    "q_agg_bucketstats": q_agg_bucketstats,
    "q_agg_scripted": q_agg_scripted,
    "q_agg_sampler": q_agg_sampler,
    "q_agg_normalize": q_agg_normalize,
    "q_agg_bucket_script": q_agg_bucket_script,
}

ORACLES = {
    "q_agg_multiterms": SQL_AGG_MULTITERMS,
    "q_agg_stringstats": SQL_AGG_STRINGSTATS,
    "q_agg_matrixstats": SQL_AGG_MATRIXSTATS,
    "q_agg_geocentroid": SQL_AGG_GEOCENTROID,
    "q_agg_bucketstats": SQL_AGG_BUCKETSTATS,
    "q_agg_scripted": SQL_AGG_SCRIPTED,
    "q_agg_sampler": SQL_AGG_SAMPLER,
    "q_agg_normalize": SQL_AGG_NORMALIZE,
    "q_agg_bucket_script": SQL_AGG_BUCKET_SCRIPT,
}
