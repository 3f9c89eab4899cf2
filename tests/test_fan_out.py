"""io.fan_out — the gated small-scan spread (r17).

A sub-split parquet input reaches one scan task, so compute collapsed into
the scan stage serializes on one core; fan_out round-robin-repartitions such
frames to the session's core count. The gate must leave cluster-scale (or
unsizable) inputs alone, and the spread must never change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_es_spark import io as hio
from hbase_observer_es_spark.io import fan_out, table

from .conftest import SF_ORACLE


def test_fan_out_spreads_small_scan(spark):
    d = table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    before = d.rdd.getNumPartitions()
    after = fan_out(d).rdd.getNumPartitions()
    assert before < spark.sparkContext.defaultParallelism
    assert after == spark.sparkContext.defaultParallelism


def test_fan_out_gate_skips_large_input(spark, monkeypatch):
    """Above the byte gate the frame must come back UNCHANGED — at cluster
    scale the scan parallelizes itself and the spread would be a pure
    pessimization."""
    monkeypatch.setattr(hio, "_FAN_OUT_MAX_BYTES", 0)
    d = table(spark, SF_ORACLE, "documents")
    assert fan_out(d) is d


def test_fan_out_preserves_rows(spark):
    d = table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    a = sorted(map(tuple, d.collect()))
    b = sorted(map(tuple, fan_out(d).collect()))
    assert a == b
