"""Table profiling: per-column statistics and exact heavy hitters.

Every serious run against a new 100 TB drop starts with the same questions
— how many rows, which columns are mostly NULL, what are the real
cardinalities, which values dominate each dimension? A pipeline that
skips this pre-flight discovers skew and junk mid-job instead. This module
answers them in two Spark-shaped passes:

* :func:`profile_stats` — one row per column: ``(col_name, n_rows,
  n_null, ndv)``. ONE aggregation job: the per-column counts compute in a
  single ``agg`` (Spark plans multi-column ``countDistinct`` with one
  Expand — a single pass whose map output is multiplied by the number of
  distinct-counted columns; the standard plan, and the price of EXACT
  ndv). ``exact=False`` swaps in ``approx_count_distinct`` (HLL++,
  relativeSD default 5%) which needs no Expand — the 100 TB default when
  ±5% answers the question, with the exact form as the oracle-checkable
  baseline. The single agg row then explodes to the long format inside
  the same plan — no driver loop, no per-column jobs.

* :func:`top_values` — exact top-k values per column with counts:
  ``(col_name, rnk, value, n)``. Melt the eligible columns to
  ``(col_name, value)`` pairs (one ``explode`` over an inline array —
  map-only, fan-out = number of profiled columns), one
  ``groupBy(col_name, value)`` count (collapses map-side: the shuffle
  carries one row per distinct value, not per input row), then a per-
  column ``row_number`` cut. Ties break on the value string ascending, so
  the result is a pure function of the data. Only columns whose string
  rendering is engine-stable are eligible — string, integral, boolean,
  date types; float/double/timestamp renderings differ across engines
  and a "top continuous value" is not a meaningful profile anyway —
  others are skipped loudly via the returned plan's column set (ask for
  one explicitly and it raises).

100 TB posture: both passes are single-shuffle with map-side partial
aggregation; nothing collects to the driver beyond the profile rows
themselves (columns × k). The hot-key hazard IS the point here — the
profiler is how you find the skew before a join does.

Registration-ready twins (held for a window with headroom, like
``q_zorder_cells``): ``q_profile_stats`` / ``q_profile_topvals`` over the
``orders`` fixture with ``SQL_PROFILE_STATS`` / ``SQL_PROFILE_TOPVALS``
DuckDB oracles, hash-compared in ``tests/test_profile.py`` under the same
harness discipline as the registry.

Reference parity: no analogue in the reference tree — beyond-reference
pipeline surface (SURVEY §2-D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# types whose CAST(... AS STRING) renders identically in Spark and DuckDB
# (and for which "most frequent value" is a meaningful profile)
_TOPVAL_TYPES = (
    T.StringType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.BooleanType,
    T.DateType,
)


def _qcol(name: str):
    """Reference a TOP-LEVEL column whatever its name: backtick-quoted (with
    embedded backticks doubled per Spark's rule), so a dotted ingest name
    like ``user.id`` is never re-parsed as struct-field access."""
    return F.col("`" + name.replace("`", "``") + "`")


def _resolve(df: DataFrame, columns: list[str] | None) -> list[str]:
    if columns is None:
        return list(df.columns)
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"profile: columns {missing} not in {df.columns}")
    if len(set(columns)) != len(columns):
        raise ValueError(
            f"profile: duplicate columns in {columns} — a repeated column "
            "would double its counts silently"
        )
    return list(columns)


def profile_stats(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """``(col_name, n_rows, n_null, ndv)`` per column, one aggregation job.
    ``exact=False`` uses HLL++ approximate distinct counts (no Expand in
    the plan — the at-scale default; see module docstring)."""
    cols = _resolve(df, columns)
    if not cols:
        raise ValueError("profile: no columns to profile")
    ndv = F.countDistinct if exact else F.approx_count_distinct
    # aliases are keyed by column INDEX, never by name — a dotted or
    # otherwise exotic source column name (referenced via _qcol) must not
    # leak into an alias that F.col would re-parse
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.when(_qcol(c).isNull(), 1)).alias(f"__null_{i}"))
        aggs.append(ndv(_qcol(c)).alias(f"__ndv_{i}"))
    one = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{i}").alias("n_null"),
            F.col(f"__ndv_{i}").cast("long").alias("ndv"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def top_values(
    df: DataFrame, k: int = 5, columns: list[str] | None = None
) -> DataFrame:
    """Exact top-``k`` most frequent values per eligible column:
    ``(col_name, rnk, value, n)`` with ``value`` as its string rendering.
    NULLs are not values (they are counted by :func:`profile_stats`).
    Ties break on ``value`` ascending — deterministic under any input
    order. Explicitly requesting an ineligible column (float/double/
    timestamp — engine-unstable renderings) raises; with ``columns=None``
    ineligible columns are simply not profiled."""
    if k < 1:
        raise ValueError("top_values: k must be >= 1")
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        cols = [c for c in df.columns if isinstance(fields[c], _TOPVAL_TYPES)]
    else:
        cols = _resolve(df, columns)
        bad = [c for c in cols if not isinstance(fields[c], _TOPVAL_TYPES)]
        if bad:
            raise ValueError(
                f"top_values: columns {bad} have engine-unstable string "
                "renderings (float/double/timestamp) — profile them via "
                "profile_stats, or bucket them first"
            )
    if not cols:
        raise ValueError("top_values: no eligible columns")
    entries = [
        F.struct(
            F.lit(c).alias("col_name"), _qcol(c).cast("string").alias("value")
        )
        for c in cols
    ]
    long = (
        df.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .where(F.col("value").isNotNull())
    )
    counted = long.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("col_name").orderBy(F.desc("n"), F.asc("value"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("col_name", "rnk", "value", "n")
    )


def profile_diff(curr: DataFrame, prev: DataFrame) -> DataFrame:
    """Compare two :func:`profile_stats` outputs (current vs previous
    snapshot): one row per column name present in EITHER profile —
    ``(col_name, status, n_rows, n_rows_prev, d_rows, n_null, n_null_prev,
    ndv, ndv_prev)`` with ``status`` ∈ ``added`` / ``removed`` / ``kept``.
    All exact integers (missing side → NULL counts, never 0 — absence is
    not emptiness). This is the schema/stats half of snapshot monitoring;
    ``operators/drift.py`` is the content half."""
    for df, side in ((curr, "curr"), (prev, "prev")):
        missing = {"col_name", "n_rows", "n_null", "ndv"} - set(df.columns)
        if missing:
            raise ValueError(
                f"profile_diff: {side} frame lacks profile_stats columns "
                f"{sorted(missing)}"
            )
    p = prev.select(
        F.col("col_name"),
        F.col("n_rows").alias("n_rows_prev"),
        F.col("n_null").alias("n_null_prev"),
        F.col("ndv").alias("ndv_prev"),
    )
    joined = curr.join(p, "col_name", "full_outer")
    status = (
        F.when(F.col("n_rows").isNull(), F.lit("removed"))
        .when(F.col("n_rows_prev").isNull(), F.lit("added"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "col_name",
        status.alias("status"),
        "n_rows",
        "n_rows_prev",
        (F.col("n_rows") - F.col("n_rows_prev")).alias("d_rows"),
        "n_null",
        "n_null_prev",
        "ndv",
        "ndv_prev",
    )


# ------------------------------------------------- registration-ready twins

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight profile of the orders table — exact ndv (the oracle
    baseline; approx is the at-scale default, tolerance-tested
    separately)."""
    from ..io import table

    return profile_stats(table(spark, sf_dir, "orders"), _PROFILE_COLS)


SQL_PROFILE_STATS = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv
        FROM orders"""
    for c in _PROFILE_COLS
)

TOPVAL_K = 5
_TOPVAL_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


def q_profile_topvals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the orders dimensions (plus a high-
    cardinality key column, where count-1 ties exercise the deterministic
    value-ascending tie-break)."""
    from ..io import table

    return top_values(table(spark, sf_dir, "orders"), TOPVAL_K, _TOPVAL_COLS)


SQL_PROFILE_TOPVALS = f"""
WITH melted AS (
    {" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS value "
        f"FROM orders WHERE {c} IS NOT NULL"
        for c in _TOPVAL_COLS
    )}
),
counted AS (
    SELECT col_name, value, COUNT(*) AS n FROM melted GROUP BY 1, 2
)
SELECT col_name, rnk, value, n
FROM (
    SELECT col_name, value, n,
           ROW_NUMBER() OVER (
               PARTITION BY col_name ORDER BY n DESC, value ASC
           ) AS rnk
    FROM counted
)
WHERE rnk <= {TOPVAL_K}
"""


QUERIES = {
    "q_profile_stats": q_profile_stats,
    "q_profile_topvals": q_profile_topvals,
}
ORACLES = {
    "q_profile_stats": SQL_PROFILE_STATS,
    "q_profile_topvals": SQL_PROFILE_TOPVALS,
}
