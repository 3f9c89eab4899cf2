"""Z-order clustering: interleave correctness vs a pure-python reference,
quantizer edge semantics, layout-pass content preservation, the actual
pruning benefit measured from parquet footer statistics, and the
registration-ready fixture twin vs its DuckDB oracle."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from hbase_observer_es_spark.operators.zorder import (
    SQL_ZORDER_CELLS,
    column_ranges,
    interleave,
    q_zorder_cells,
    quantize,
    z_key,
    zorder_write,
)

SF = "/root/testdata/sf0.001"


def _ref_z(cells: list[int], bits: int) -> int:
    z = 0
    for j, c in enumerate(cells):
        for i in range(bits):
            z |= ((c >> i) & 1) << (i * len(cells) + j)
    return z


def test_interleave_matches_python_reference(spark):
    # every 4-bit pair, plus a 3-dim spot check
    pairs = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(pairs, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", interleave([F.col("a").cast("bigint"), F.col("b").cast("bigint")], 4)
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _ref_z([a, b], 4), (a, b)

    tri = [(5, 3, 7), (0, 0, 0), (7, 7, 7), (1, 2, 4)]
    df3 = spark.createDataFrame(tri, "a int, b int, c int")
    got3 = {
        (r["a"], r["b"], r["c"]): r["z"]
        for r in df3.withColumn(
            "z",
            interleave(
                [F.col(c).cast("bigint") for c in ("a", "b", "c")], 3
            ),
        ).collect()
    }
    for t in tri:
        assert got3[t] == _ref_z(list(t), 3), t


def test_quantize_edges(spark):
    df = spark.createDataFrame(
        [(None,), (-5.0,), (0.0,), (5.0,), (9.999,), (10.0,), (50.0,)],
        "v double",
    )
    rows = df.select(
        F.col("v"), quantize(F.col("v"), 0.0, 10.0, 3).alias("q")
    ).collect()
    by_v = {r["v"]: r["q"] for r in rows}
    assert by_v[None] == 0  # NULL clusters with the low edge
    assert by_v[-5.0] == 0  # below lo clamps
    assert by_v[0.0] == 0
    assert by_v[5.0] == 4  # midpoint of 8 cells
    assert by_v[9.999] == 7
    assert by_v[10.0] == 7  # at hi clamps into the top cell
    assert by_v[50.0] == 7
    # constant column contributes nothing
    const = df.select(quantize(F.col("v"), 3.0, 3.0, 3).alias("q")).collect()
    assert all(r["q"] == 0 for r in const)


def test_validation():
    c = [F.col("a"), F.col("b")]
    with pytest.raises(ValueError, match=">= 2 columns"):
        interleave([F.col("a")], 4)
    with pytest.raises(ValueError, match="exceeds 63"):
        interleave(c, 32)
    with pytest.raises(ValueError, match="bits must be"):
        interleave(c, 0)
    with pytest.raises(ValueError, match="one \\(lo, hi\\) pair"):
        z_key(c, [(0.0, 1.0)], 4)
    with pytest.raises(ValueError, match="range inverted"):
        quantize(F.col("a"), 5.0, 1.0, 4)


def test_z_key_partitioning_invariant(spark):
    """The key is a pure function of the row — identical under any input
    partitioning (the property that makes the layout pass deterministic)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    ranges = column_ranges(li, ["l_partkey", "l_suppkey"])
    cols = [F.col("l_partkey"), F.col("l_suppkey")]
    # multiset compare — the synthetic lineitem has duplicate
    # (l_orderkey, l_linenumber) pairs, so no column set is a row key
    a = sorted(
        (r["l_partkey"], r["l_suppkey"], r["z"])
        for r in li.withColumn("z", z_key(cols, ranges, 6))
        .select("l_partkey", "l_suppkey", "z")
        .collect()
    )
    b = sorted(
        (r["l_partkey"], r["l_suppkey"], r["z"])
        for r in li.repartition(7)
        .withColumn("z", z_key(cols, ranges, 6))
        .select("l_partkey", "l_suppkey", "z")
        .collect()
    )
    assert a == b


def _grid_df(spark, side: int):
    # deterministic shuffled (x, y) grid — no RNG: a multiplicative-hash
    # permutation scatters the natural order so no layout is accidental
    rows = []
    n = side * side
    for i in range(n):
        p = (i * 2654435761) % n
        rows.append((p // side, p % side, i))
    return spark.createDataFrame(rows, "x int, y int, payload int")


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose footer [min,max] of ``col`` overlaps [lo,hi], total
    files) — read from parquet metadata only, the same statistics a scan's
    row-group pruning uses."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert files, path
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        f_lo, f_hi = None, None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            assert st is not None and st.has_min_max
            f_lo = st.min if f_lo is None else min(f_lo, st.min)
            f_hi = st.max if f_hi is None else max(f_hi, st.max)
        if f_lo is not None and not (f_hi < lo or f_lo > hi):
            hit += 1
    return hit, len(files)


def test_zorder_write_roundtrip_and_pruning(spark, tmp_path):
    side, n_files = 64, 16
    df = _grid_df(spark, side)
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")

    report = zorder_write(
        df, zpath, ["x", "y"], n_files, bits=6,
        ranges=[(0.0, float(side)), (0.0, float(side))],
    )
    assert report["n_files"] == n_files
    # single-column-sorted baseline with the same file count
    (
        df.repartitionByRange(n_files, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    # content preserved exactly, layout key not in the schema
    back = spark.read.parquet(zpath)
    assert back.columns == ["x", "y", "payload"]
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )

    # a y-selective predicate: the x-sorted layout cannot prune it (every
    # file spans all y); the z-order layout overlaps only the files whose
    # curve segment intersects the y band
    z_hit, z_total = _files_overlapping(zpath, "y", 30, 33)
    x_hit, x_total = _files_overlapping(xpath, "y", 30, 33)
    assert x_hit == x_total  # the baseline reads everything
    assert z_hit < x_hit, (z_hit, x_hit)
    assert z_hit <= z_total // 2
    # and the z layout still prunes on x too — multi-dimensional, not a swap
    zx_hit, _ = _files_overlapping(zpath, "x", 10, 13)
    assert zx_hit < z_total


def test_nan_clusters_with_null_on_both_engines(spark):
    """Review finding: Spark's floor(NaN)→0 vs DuckDB's NaN-sorts-high
    through least/greatest would silently diverge (cell 0 vs top cell).
    Both sides now route NaN → NULL → cell 0 explicitly."""
    import duckdb

    from hbase_observer_es_spark.operators.zorder import _sql_quantize

    df = spark.createDataFrame(
        [(float("nan"),), (None,), (2.5,)], "v double"
    )
    got = sorted(
        r["q"] for r in df.select(quantize(F.col("v"), 0.0, 10.0, 4).alias("q")).collect()
    )
    assert got == [0, 0, 4]
    sql = _sql_quantize("v", "0.0", "10.0", 4)
    oracle = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT {sql} AS q FROM (VALUES ('nan'::DOUBLE), (NULL), (2.5)) t(v)"
        ).fetchall()
    )
    assert oracle == got


def test_zorder_write_reports_actual_files(spark, tmp_path):
    """Review finding: empty range partitions write no part file — the
    report must count files on disk, not the request."""
    df = spark.createDataFrame([(0, 0, 1), (1, 1, 2)], "x int, y int, payload int")
    report = zorder_write(
        df, str(tmp_path / "tiny"), ["x", "y"], 8, bits=2,
        ranges=[(0.0, 2.0), (0.0, 2.0)],
    )
    actual = len(glob.glob(str(tmp_path / "tiny" / "*.parquet")))
    assert report["n_files"] == actual <= 2
    assert report["n_files_requested"] == 8


def test_zorder_write_validation(spark, tmp_path):
    df = _grid_df(spark, 4)
    with pytest.raises(ValueError, match="not in"):
        zorder_write(df, str(tmp_path / "v"), ["x", "nope"], 2)
    with pytest.raises(ValueError, match="n_files"):
        zorder_write(df, str(tmp_path / "v"), ["x", "y"], 0)
    with pytest.raises(ValueError, match="all-NULL"):
        column_ranges(
            df.withColumn("z", F.lit(None).cast("double")), ["z"]
        )
    # review findings: refuse the internal key name and non-numeric columns
    with pytest.raises(ValueError, match="__zkey"):
        zorder_write(
            df.withColumn("__zkey", F.lit(1)), str(tmp_path / "v"), ["x", "y"], 2
        )
    with pytest.raises(ValueError, match="must be numeric"):
        zorder_write(
            df.withColumn("s", F.lit("a")), str(tmp_path / "v"), ["x", "s"], 2
        )
    with pytest.raises(ValueError, match="must be numeric"):
        column_ranges(df.withColumn("s", F.lit("a")), ["s"])


def test_q_zorder_cells_matches_duckdb_oracle(spark):
    """Registration-ready twin: hash-compared the way the driver would.
    Green here means r11 registration is one registry row (q_embed_pq
    discipline)."""
    from .oracle_harness import compare, duckdb_con

    con = duckdb_con(SF)
    r = compare("q_zorder_cells", q_zorder_cells(spark, SF), con, SQL_ZORDER_CELLS)
    assert r.ok, r.detail
