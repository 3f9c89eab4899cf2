"""Elasticsearch bucket-aggregation surface, part 2: range, top_hits,
percentile_ranks, adjacency_matrix, rare_terms.

The reference syncs rows into ES 6.3 so ES can aggregate over them
(/root/reference/README.md:3; ES dependency /root/reference/pom.xml:35-46); this
module continues the §2-B closure started in relational_ext.py (terms/other,
date_histogram, composite, filters, pipeline aggs) with the remaining commonly-used
bucket/metric aggs. Everything is one-pass conditional aggregation or a bounded
groupBy — no UDFs, no driver-side loops, all whole-stage codegen.

Scale posture (100 TB): `range`/`percentile_ranks`/`adjacency_matrix` reduce the
fact scan to a HANDFUL of rows map-side (conditional sums combine per partition)
— the shuffle carries bucket tuples, never fact rows. `top_hits` shuffles by the
bucket key once and takes a bounded window prefix. `rare_terms` is a token
groupBy whose output is vocabulary-, not row-, bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, sql_dsum
from ..io import table

# ES `range` agg over lineitem prices: [from, to) buckets, ES key syntax "a-b".
PRICE_RANGES = ((None, 25_000.0), (25_000.0, 50_000.0), (50_000.0, 75_000.0), (75_000.0, None))

# ES `percentile_ranks` thresholds over events.value.
RANK_THRESHOLDS = (10.0, 50.0, 200.0)

# ES `adjacency_matrix` named filters over events.
ADJ_FILTERS = ("click", "hival", "highk")

TOPHITS_N = 2

# ES `rare_terms`: terms appearing in at most this fraction of documents.
RARE_MAX_DOC_FRAC = 0.06


def _range_key(lo: float | None, hi: float | None) -> str:
    lo_s = "*" if lo is None else f"{lo:g}"
    hi_s = "*" if hi is None else f"{hi:g}"
    return f"{lo_s}-{hi_s}"


def q_agg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `range` aggregation: explicit [from, to) buckets over l_extendedprice,
    each with doc count and an order-independent decimal price sum.

    One conditional-label projection + groupBy over at most len(PRICE_RANGES)
    keys — map-side combine reduces each partition to ≤4 rows before the
    shuffle. ES sorts range buckets by `from`; mirrored via the bucket's lower
    bound carried as a sort column.
    """
    li = table(spark, sf_dir, "lineitem")
    label: Column = F.lit(None).cast("string")
    lower: Column = F.lit(None).cast("double")
    for lo, hi in reversed(PRICE_RANGES):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("l_extendedprice") >= lo)
        if hi is not None:
            cond = cond & (F.col("l_extendedprice") < hi)
        label = F.when(cond, F.lit(_range_key(lo, hi))).otherwise(label)
        lower = F.when(cond, F.lit(-1.0 if lo is None else lo)).otherwise(lower)
    return (
        li.select(label.alias("range_key"), lower.alias("range_from"), "l_extendedprice")
        .groupBy("range_key", "range_from")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price"))
        .orderBy("range_from")
    )


def _sql_range_case(col: str, field: str) -> str:
    arms = []
    for lo, hi in PRICE_RANGES:
        conds = []
        if lo is not None:
            conds.append(f"{col} >= {lo}")
        if hi is not None:
            conds.append(f"{col} < {hi}")
        cond = " AND ".join(conds) or "TRUE"
        val = f"'{_range_key(lo, hi)}'" if field == "key" else f"{-1.0 if lo is None else lo}"
        arms.append(f"WHEN {cond} THEN {val}")
    return "CASE " + " ".join(arms) + " END"


SQL_AGG_RANGE = f"""
SELECT {_sql_range_case('l_extendedprice', 'key')} AS range_key,
       CAST({_sql_range_case('l_extendedprice', 'from')} AS DOUBLE) AS range_from,
       COUNT(*) AS n,
       {sql_dsum('l_extendedprice', 'sum_price')}
FROM lineitem
GROUP BY range_key, range_from
ORDER BY range_from
"""


def q_agg_tophits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `top_hits` inside a `terms` agg: per event_type, the top-2 events by
    value (ties by event_id — ES requires an explicit tiebreak sort too).

    One shuffle by the bucket key; the ranking window emits a bounded prefix per
    bucket (rank ≤ N filters before any further work). At 100 TB this is the
    per-group TakeOrdered shape — state per key is N rows, never the group.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("hit_rank", F.row_number().over(w))
        .filter(F.col("hit_rank") <= TOPHITS_N)
        .select("event_type", "hit_rank", "event_id", "user_id", "value")
    )


SQL_AGG_TOPHITS = f"""
SELECT event_type, hit_rank, event_id, user_id, value
FROM (
    SELECT event_type, event_id, user_id, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id ASC) AS hit_rank
    FROM events
)
WHERE hit_rank <= {TOPHITS_N}
"""


def q_agg_pctranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `percentile_ranks`: for each threshold, the percentage of values ≤ it.

    ONE pass computes every threshold's conditional count plus the total
    (map-side combined to a single row), then the row explodes into
    (threshold, pct) rows — no per-threshold rescan, no crossJoin row
    multiplication. pct = count*100/total is one IEEE division, deterministic
    cross-engine.
    """
    e = table(spark, sf_dir, "events")
    cnt_cols = [
        F.sum(F.when(F.col("value") <= t, 1).otherwise(0)).alias(f"c{i}")
        for i, t in enumerate(RANK_THRESHOLDS)
    ]
    one = e.agg(F.count(F.lit(1)).alias("total"), *cnt_cols)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                (F.col(f"c{i}").cast("double") * 100.0 / F.col("total")).alias("pct_rank"),
            )
            for i, t in enumerate(RANK_THRESHOLDS)
        ]
    )
    return one.select(F.explode(pairs).alias("p")).select("p.threshold", "p.pct_rank")


_sql_rank_rows = " UNION ALL ".join(
    f"SELECT CAST({t} AS DOUBLE) AS threshold, "
    f"CAST(c{i} AS DOUBLE) * 100.0 / total AS pct_rank FROM s"
    for i, t in enumerate(RANK_THRESHOLDS)
)
_sql_rank_cnts = ", ".join(
    f"SUM(CASE WHEN value <= {t} THEN 1 ELSE 0 END) AS c{i}"
    for i, t in enumerate(RANK_THRESHOLDS)
)
SQL_AGG_PCTRANKS = f"""
WITH s AS (SELECT COUNT(*) AS total, {_sql_rank_cnts} FROM events)
{_sql_rank_rows}
"""


def q_agg_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `adjacency_matrix`: named per-row filters (a=click, b=value>100,
    c=json k>50) and doc counts for every single filter and pairwise
    intersection, zero-doc buckets omitted (ES behavior).

    Row flags are computed once in the scan projection; all 6 bucket counts are
    conditional sums in ONE aggregate → a single map-side-combined row, exploded
    to (key, n) rows. The fact table is read exactly once regardless of the
    filter count.
    """
    e = table(spark, sf_dir, "events")
    fa = (F.col("event_type") == "click").cast("int")
    fb = (F.col("value") > 100.0).cast("int")
    fc = (F.get_json_object("props", "$.k").cast("bigint") > 50).cast("int")
    flagged = e.select(fa.alias("fa"), fb.alias("fb"), fc.alias("fc"))
    one = flagged.agg(
        F.sum("fa").alias("n_a"),
        F.sum("fb").alias("n_b"),
        F.sum("fc").alias("n_c"),
        F.sum(F.col("fa") * F.col("fb")).alias("n_ab"),
        F.sum(F.col("fa") * F.col("fc")).alias("n_ac"),
        F.sum(F.col("fb") * F.col("fc")).alias("n_bc"),
    )
    a, b, c = ADJ_FILTERS
    pairs = F.array(
        F.struct(F.lit(a).alias("key"), F.col("n_a").alias("n")),
        F.struct(F.lit(b).alias("key"), F.col("n_b").alias("n")),
        F.struct(F.lit(c).alias("key"), F.col("n_c").alias("n")),
        F.struct(F.lit(f"{a}&{b}").alias("key"), F.col("n_ab").alias("n")),
        F.struct(F.lit(f"{a}&{c}").alias("key"), F.col("n_ac").alias("n")),
        F.struct(F.lit(f"{b}&{c}").alias("key"), F.col("n_bc").alias("n")),
    )
    return (
        one.select(F.explode(pairs).alias("p"))
        .select("p.key", "p.n")
        .filter(F.col("n") > 0)
    )


SQL_AGG_ADJACENCY = f"""
WITH f AS (
    SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS fa,
           CASE WHEN value > 100.0 THEN 1 ELSE 0 END AS fb,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                THEN 1 ELSE 0 END AS fc
    FROM events
), s AS (
    SELECT CAST(SUM(fa) AS BIGINT) AS n_a, CAST(SUM(fb) AS BIGINT) AS n_b,
           CAST(SUM(fc) AS BIGINT) AS n_c, CAST(SUM(fa*fb) AS BIGINT) AS n_ab,
           CAST(SUM(fa*fc) AS BIGINT) AS n_ac, CAST(SUM(fb*fc) AS BIGINT) AS n_bc
    FROM f
), rows_ AS (
    SELECT '{ADJ_FILTERS[0]}' AS key, n_a AS n FROM s
    UNION ALL SELECT '{ADJ_FILTERS[1]}', n_b FROM s
    UNION ALL SELECT '{ADJ_FILTERS[2]}', n_c FROM s
    UNION ALL SELECT '{ADJ_FILTERS[0]}&{ADJ_FILTERS[1]}', n_ab FROM s
    UNION ALL SELECT '{ADJ_FILTERS[0]}&{ADJ_FILTERS[2]}', n_ac FROM s
    UNION ALL SELECT '{ADJ_FILTERS[1]}&{ADJ_FILTERS[2]}', n_bc FROM s
)
SELECT key, n FROM rows_ WHERE n > 0
"""


def q_agg_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rare_terms`: tokens present in at most RARE_MAX_DOC_FRAC of documents
    — the long-tail complement of the `terms` agg (which surfaces heads).

    Distinct (doc, token) pairs → per-token document frequency (both map-side
    combinable; output is vocabulary-bounded), then the threshold filter. The
    doc-count cutoff is computed as a scalar subframe and broadcast — no
    collect. ES uses an absolute max_doc_count; a fraction keeps the query
    meaningful across scale factors.
    """
    d = table(spark, sf_dir, "documents")
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    df_tok = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return (
        df_tok.join(F.broadcast(total))
        .filter(F.col("doc_count") <= F.col("n_total") * F.lit(RARE_MAX_DOC_FRAC))
        .select("token", "doc_count")
        .orderBy("doc_count", "token")
    )


SQL_AGG_RARE_TERMS = f"""
WITH tot AS (SELECT COUNT(*) AS n_total FROM documents),
dfreq AS (
    SELECT token, COUNT(*) AS doc_count FROM (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ) WHERE token <> ''
    GROUP BY token
)
SELECT token, doc_count
FROM dfreq, tot
WHERE doc_count <= n_total * {RARE_MAX_DOC_FRAC}
ORDER BY doc_count, token
"""


BUCKET_MIN_SUM = 1000.0  # bucket_selector: keep buckets whose metric clears this
BUCKET_SORT_N = 10  # bucket_sort: top buckets by metric


def q_agg_bucket_sel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bucket_selector` + `bucket_sort` pipeline aggs: daily buckets,
    drop buckets whose metric misses a threshold (HAVING over the bucket
    frame), then order by metric and keep the top N (order+limit over what
    survives).

    Like every pipeline agg, both stages consume the ALREADY-REDUCED bucket
    frame: one map-side-combined groupBy is the only pass over the fact rows;
    the selector is a scalar filter on bucket rows and the sort is a
    TakeOrdered over a calendar-bounded frame. Metric sums use the decimal
    discipline so the threshold compare is engine-exact at the boundary.
    """
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    return (
        e.groupBy(day.alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .filter(F.col("sum_value") >= BUCKET_MIN_SUM)
        .orderBy(F.desc("sum_value"), F.asc("day"))
        .limit(BUCKET_SORT_N)
    )


SQL_AGG_BUCKET_SEL = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')}
FROM events
GROUP BY day
HAVING sum_value >= {BUCKET_MIN_SUM}
ORDER BY sum_value DESC, day ASC
LIMIT {BUCKET_SORT_N}
"""


def q_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `weighted_avg` aggregation: per event_type, avg(value) weighted by the
    JSON `k` field — Σ(v·w)/Σ(w) with the decimal-sum discipline on the
    numerator (2dp inputs × integer weights stay exactly representable) and an
    exact integer sum on the denominator, divided once in double.

    One map-side-combined pass; the weight extraction is scan-projection work.
    """
    e = table(spark, sf_dir, "events")
    w = F.get_json_object("props", "$.k").cast("bigint")
    num = F.sum((F.col("value") * w).cast("decimal(28,2)"))
    den = F.sum(w)
    return e.groupBy("event_type").agg(
        den.alias("weight_total"),
        (num.cast("double") / den.cast("double")).alias("weighted_avg"),
    )


SQL_AGG_WEIGHTED_AVG = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS weight_total,
       CAST(SUM(CAST(value * CAST(json_extract_string(props, '$.k') AS BIGINT)
                     AS DECIMAL(28,2))) AS DOUBLE)
           / CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
           AS weighted_avg
FROM events
GROUP BY event_type
"""


AUTO_HIST_TARGET = 20  # auto_date_histogram: at most this many buckets
# fixed-interval ladder, in seconds (ES `fixed_interval` flavor — calendar
# units would need a literal truncation unit, which the two-phase plan below
# deliberately avoids; integer epoch math is engine-exact)
AUTO_HIST_LADDER = (60, 300, 900, 3600, 10800, 43200, 86400, 604800)


def q_agg_autodatehist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `auto_date_histogram`: the engine — not the caller — picks the bucket
    interval so the bucket count stays ≤ a target. Two phases in ONE plan:
    a 1-row bounds aggregate (min/max event time) is broadcast back, the
    interval is chosen from a fixed ladder by pure integer arithmetic (smallest
    rung with span/rung ≤ target), and rows bucket by epoch-floor division.

    No driver-side collect: the bounds row rides a broadcast join, so the same
    plan runs unchanged on a cluster. All epoch math is int64 — bit-identical
    in DuckDB's mirror.
    """
    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = e.agg(
        F.min(us).alias("lo_us"), F.max(us).alias("hi_us")
    )
    span = F.col("hi_us") - F.col("lo_us")
    ival: Column = F.lit(AUTO_HIST_LADDER[-1] * 1_000_000).cast("bigint")
    for sec in reversed(AUTO_HIST_LADDER[:-1]):
        rung = F.lit(sec * 1_000_000).cast("bigint")
        # smallest rung whose bucket count fits the target
        ival = F.when(span <= rung * AUTO_HIST_TARGET, rung).otherwise(ival)
    bucket = F.timestamp_micros(
        (us - (us % F.col("ival"))).cast("bigint")
    )
    return (
        e.join(F.broadcast(bounds.select(ival.alias("ival"))))
        .groupBy(bucket.alias("bucket"), F.col("ival").alias("interval_us"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
    )


_sql_auto_ival = f"(CAST({AUTO_HIST_LADDER[-1]} AS BIGINT) * 1000000)"
for _sec in reversed(AUTO_HIST_LADDER[:-1]):
    _sql_auto_ival = (
        f"CASE WHEN hi_us - lo_us <= CAST({_sec} AS BIGINT) * 1000000 * {AUTO_HIST_TARGET} "
        f"THEN CAST({_sec} AS BIGINT) * 1000000 ELSE {_sql_auto_ival} END"
    )

SQL_AGG_AUTODATEHIST = f"""
WITH bounds AS (
    SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS hi_us
    FROM events
), sel AS (
    SELECT {_sql_auto_ival} AS ival FROM bounds
)
SELECT make_timestamp(CAST(epoch_us(ts) AS BIGINT)
                      - (CAST(epoch_us(ts) AS BIGINT) % ival)) AS bucket,
       ival AS interval_us,
       COUNT(*) AS n_events,
       {sql_dsum('value', 'sum_value')}
FROM events, sel
GROUP BY bucket, interval_us
"""


QUERIES = {
    "q_agg_range": q_agg_range,
    "q_agg_tophits": q_agg_tophits,
    "q_agg_pctranks": q_agg_pctranks,
    "q_agg_adjacency": q_agg_adjacency,
    "q_agg_rare_terms": q_agg_rare_terms,
    "q_agg_bucket_sel": q_agg_bucket_sel,
    "q_agg_weighted_avg": q_agg_weighted_avg,
    "q_agg_autodatehist": q_agg_autodatehist,
}

ORACLES = {
    "q_agg_range": SQL_AGG_RANGE,
    "q_agg_tophits": SQL_AGG_TOPHITS,
    "q_agg_pctranks": SQL_AGG_PCTRANKS,
    "q_agg_adjacency": SQL_AGG_ADJACENCY,
    "q_agg_rare_terms": SQL_AGG_RARE_TERMS,
    "q_agg_bucket_sel": SQL_AGG_BUCKET_SEL,
    "q_agg_weighted_avg": SQL_AGG_WEIGHTED_AVG,
    "q_agg_autodatehist": SQL_AGG_AUTODATEHIST,
}
