"""Relational analytics extensions, round 5: distribution windows and pivot.

Engine-contract breadth (SURVEY.md §2-C): the ranked-window family
(relational.py q_win_rank) lacked the DISTRIBUTION window functions — ntile /
percent_rank / cume_dist — and the wide-format pivot every BI layer over the
engine eventually asks for. Both are pure built-in Catalyst surface: no UDFs,
one shuffle each.

Determinism: ntile is integer bucketing over a total order (made total with a
unique tie-break key); percent_rank and cume_dist are single double divisions
of exact integers — both engines compute (rank−1)/(n−1) and n_leq/n
identically. The pivot emits integer counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table

NTILE_BUCKETS = 4

# Closed fixture event-type domain, pinned so the pivot needs NO discovery pass
# (see q_pivot docstring).
PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")
PIVOT_COHORTS = 10


def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions per market segment: account-balance
    quartile (`ntile`), `percent_rank`, and `cume_dist` over customers —
    the "where does this entity sit in its cohort" query.

    One hash exchange on the partition key + in-partition sort; all three
    functions ride the SAME window (one Window operator in the plan). The
    order key appends c_custkey so ties are totally ordered — without it,
    ntile's bucket assignment within tied balances would be
    nondeterministic on BOTH engines.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(NTILE_BUCKETS).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


SQL_WIN_NTILE = f"""
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile({NTILE_BUCKETS}) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-format pivot: user-cohort × event-type count matrix — the
    long-to-wide reshape (Spark `groupBy().pivot()`) BI tools run over the
    events feed.

    The pivot values are PINNED (closed fixture domain): passing them skips
    the extra distinct-scan Spark otherwise runs to discover columns, and is
    the only scale-sane form — an unpinned pivot over a high-cardinality
    column is a schema explosion. The plan is a single map-side-combined
    groupBy; missing (cohort, type) cells surface as null counts and are
    coalesced to 0 to match SQL's COUNT FILTER.
    """
    e = table(spark, sf_dir, "events")
    wide = (
        e.groupBy((F.col("user_id") % PIVOT_COHORTS).alias("cohort"))
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "cohort",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in PIVOT_TYPES
        ],
    )


_sql_pivot_cols = ",\n       ".join(
    f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in PIVOT_TYPES
)
SQL_PIVOT = f"""
SELECT user_id % {PIVOT_COHORTS} AS cohort,
       {_sql_pivot_cols}
FROM events
GROUP BY cohort
"""


def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-position window functions (round 15): ``first_value`` /
    ``last_value`` / ``nth_value`` over a FULLY-framed cohort window —
    "who anchors this row's cohort" (richest / poorest / runner-up per
    market segment), the last missing members of the window family.

    The frame is pinned to ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING:
    last_value under the default growing frame is the current row (the
    classic window gotcha) and would differ between engines only by
    accident of default — pinning the full frame makes the semantics the
    ones the query names. Total order via the c_custkey tie-break, same
    discipline as q_win_ntile; one hash exchange + in-partition sort,
    all three functions on ONE Window operator. ``runner_up`` is NULL
    for 1-row cohorts on both engines (nullable by design)."""
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_mktsegment",
        "c_acctbal",
        F.first("c_custkey").over(w).cast("bigint").alias("richest"),
        F.last("c_custkey").over(w).cast("bigint").alias("poorest"),
        F.nth_value("c_custkey", 2).over(w).cast("bigint").alias("runner_up"),
    )


SQL_WIN_FIRSTLAST = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment, c_acctbal,
       CAST(first_value(c_custkey) OVER w AS BIGINT) AS richest,
       CAST(last_value(c_custkey) OVER w AS BIGINT) AS poorest,
       CAST(nth_value(c_custkey, 2) OVER w AS BIGINT) AS runner_up
FROM customer
WINDOW w AS (
    PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


QUERIES = {
    "q_win_ntile": q_win_ntile,
    "q_pivot": q_pivot,
    "q_win_firstlast": q_win_firstlast,
}

ORACLES = {
    "q_win_ntile": SQL_WIN_NTILE,
    "q_pivot": SQL_PIVOT,
    "q_win_firstlast": SQL_WIN_FIRSTLAST,
}
