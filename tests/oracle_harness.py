"""Local re-implementation of the driver's Spark-vs-DuckDB comparison.

Mimics `/root/repo/__spark_entry__.py`'s documented contract: run the Spark query and
the DuckDB oracle on the same parquet tables, compare row count, schema (column names,
sorted), and order-insensitive values. We compare values EXACTLY (stringified) — if
exact comparison passes here, any reasonable value-hash passes in the driver.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Normalize a cell to a hashable, engine-independent representation."""
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        # repr() is shortest-roundtrip for python floats — identical doubles on both
        # sides produce identical strings.
        return repr(v)
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_norm_cell(x)) for x in v) + "]"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    return f"{type(v).__name__}:{v}"


@dataclass
class CompareResult:
    name: str
    ok: bool
    row_count_spark: int
    row_count_oracle: int
    schema_spark: list[str] = field(default_factory=list)
    schema_oracle: list[str] = field(default_factory=list)
    detail: str = ""


def _rows_to_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict = {}
    for r in rows:
        key = tuple(_norm_cell(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def complex_columns(df) -> list[str]:
    """Top-level columns with complex (non-scalar) types — THE single detector
    for the driver's output-shape constraint, shared with
    tests/test_output_contract.py so the harness and the contract test can
    never drift apart."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    # The DRIVER canonicalizes results by sorting rows in pandas, where a
    # complex-typed cell is an unhashable numpy.ndarray — a hard failure there
    # even when values match (the round-6 q_agg_geoline/q_search_terms_set
    # reds). _norm_cell below stringifies lists, so without this guard the
    # LOCAL sweep passes queries the driver cannot check. Mirror the driver's
    # constraint: complex-typed Spark output columns fail here too
    # (registry.py output-shape contract).
    complex_cols = complex_columns(spark_df)
    if complex_cols:
        return CompareResult(
            name=name,
            ok=False,
            row_count_spark=-1,
            row_count_oracle=-1,
            detail=(
                f"complex-typed output columns {complex_cols} — the driver "
                "canonicalizer cannot sort these; array_join or explode them"
            ),
        )
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    # The driver fetches the oracle through pandas, where DuckDB HUGEINT (e.g.
    # SUM over BIGINT) coerces to float64 and hashes as "3963.0" vs Spark's long
    # "3963". DB-API cursor.description only reports generic type codes
    # ('NUMBER'), so detect via the relational API, whose .types carries the
    # real logical types ('HUGEINT' for a bare SUM over BIGINT).
    rel = con.sql(sql)
    o_cols = list(rel.columns)
    hugeint_cols = [
        c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t).upper()
    ]
    o_rows = rel.fetchall()

    res = CompareResult(
        name=name,
        ok=True,
        row_count_spark=len(s_rows),
        row_count_oracle=len(o_rows),
        schema_spark=sorted(s_cols),
        schema_oracle=sorted(o_cols),
    )
    if hugeint_cols:
        res.ok = False
        res.detail = f"oracle columns {hugeint_cols} are HUGEINT — cast to BIGINT in the SQL"
        return res
    if len(s_rows) != len(o_rows):
        res.ok = False
        res.detail = f"row count {len(s_rows)} != {len(o_rows)}"
        return res
    if sorted(s_cols) != sorted(o_cols):
        res.ok = False
        res.detail = f"schema {sorted(s_cols)} != {sorted(o_cols)}"
        return res
    ms, mo = _rows_to_multiset(s_cols, s_rows), _rows_to_multiset(o_cols, o_rows)
    if ms != mo:
        res.ok = False
        only_s = [k for k in ms if ms[k] != mo.get(k, 0)][:3]
        only_o = [k for k in mo if mo[k] != ms.get(k, 0)][:3]
        res.detail = f"value mismatch; spark-side sample={only_s} oracle-side sample={only_o}"
    return res
