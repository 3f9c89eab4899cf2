"""The per-session table() frame memo (r16 optimization round).

table() memoizes the LAZY base frame per (session, sf_dir, name) to cut the
repeated driver-side file listing + footer schema inference + py4j traffic
(~20-40 ms/call) that every query in a bench/sweep session was re-paying over
the same immutable fixture directory. The memo holds plan metadata only —
these tests pin that it stays semantically invisible: per-query pushdown
still reaches the scan, results are unchanged, and the events UTC guard
still fires on every call (the NTZ cast resolves the session TZ at
execution time, so a hit must be guarded exactly like a miss).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table

SF = "/root/testdata/sf0.001"
SF_OTHER = "/root/testdata/sf0.01"


def test_same_session_same_dir_is_memoized(spark):
    a = table(spark, SF, "nation")
    b = table(spark, SF, "nation")
    assert a is b, "second call must reuse the memoized lazy frame"
    c = table(spark, SF_OTHER, "nation")
    assert c is not a, "a different sf_dir must build a fresh frame"


def test_memoized_frame_keeps_per_query_pushdown(spark):
    base = table(spark, SF, "lineitem")
    again = table(spark, SF, "lineitem")
    assert base is again
    # Two different queries over the SAME memoized frame: each gets its own
    # optimized plan with its own pushed filter — the memo shares the
    # unresolved base, not an optimized or materialized plan.
    q1 = again.filter(F.col("l_quantity") > 49).select("l_orderkey")
    q2 = again.filter(F.col("l_linenumber") == 1).select("l_partkey")
    p1 = q1._jdf.queryExecution().executedPlan().toString()
    p2 = q2._jdf.queryExecution().executedPlan().toString()
    assert "l_quantity" in p1 and "PushedFilters: [" in p1
    assert "l_linenumber" in p2 and "PushedFilters: [" in p2
    # and the filters did not leak into each other's scan
    assert "l_linenumber" not in p1.split("PushedFilters")[1].split("]")[0]
    # results still come from the parquet files
    assert q1.count() >= 0 and q2.count() >= 0


def test_events_utc_guard_fires_on_cache_hit(spark):
    # first call memoizes under UTC
    table(spark, SF, "events")
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(RuntimeError, match="UTC session timezone"):
            table(spark, SF, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    # restored session serves the memoized frame again
    assert table(spark, SF, "events") is table(spark, SF, "events")
