"""Local re-implementation of the driver's Spark-vs-DuckDB comparison.

Mimics `/root/repo/__spark_entry__.py`'s documented contract: run the Spark query and
the DuckDB oracle on the same parquet tables, compare row count, schema (column names,
sorted), and order-insensitive values. We compare values EXACTLY (stringified).

Exact equality here is NOT sufficient for driver green — round 14 proved it:
the driver canonicalizes both result sets through pandas, where DuckDB
DECIMAL/HUGEINT cells coerce to float64 while Spark DECIMAL cells stay
``decimal.Decimal`` objects, so value-identical results hash differently
(the r14 ``q_corpus_drift``/``q_corpus_drift_tv`` reds). Two defenses:

1. a TYPED OUTPUT GATE in :func:`compare` — any top-level DECIMAL column on
   the Spark side, or DECIMAL/HUGEINT on the oracle side, fails the query
   outright (cast to BIGINT/DOUBLE in the final projection instead);
2. :func:`compare_pandas` — a second comparison mode that walks the driver's
   actual path (``toPandas()`` vs ``rel.df()``, columns sorted by name, rows
   sorted, cells stringified) so anything the pandas canonicalizer would
   change is visible locally. The full-registry sweep runs both modes.
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


def decimal_columns(df) -> list[str]:
    """Top-level DECIMAL-typed Spark columns. The driver's pandas
    canonicalizer keeps Spark DECIMAL as ``decimal.Decimal`` but coerces
    DuckDB DECIMAL to float64, so value-identical results hash differently
    (the r14 drift-pair reds). Registered queries must cast these away."""
    from pyspark.sql import types as T

    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)]


def oracle_unstable_columns(rel) -> list[str]:
    """Oracle-side columns whose type the driver's pandas fetch coerces to
    float64 (DECIMAL and HUGEINT — e.g. a bare SUM over BIGINT), losing the
    integer rendering Spark keeps. Cast to BIGINT/DOUBLE in the SQL."""
    return [
        c
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
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
    # Spark-side typed gate: DECIMAL outputs survive toPandas() as Decimal
    # objects while the oracle side coerces to float64 — driver hash-red even
    # on value-exact results (r14 drift pair). Fail them here.
    dec_cols = decimal_columns(spark_df)
    if dec_cols:
        return CompareResult(
            name=name,
            ok=False,
            row_count_spark=-1,
            row_count_oracle=-1,
            detail=(
                f"DECIMAL-typed output columns {dec_cols} — the driver's pandas "
                "canonicalizer coerces the two engines asymmetrically; cast the "
                "final projection to BIGINT or DOUBLE"
            ),
        )
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    # The driver fetches the oracle through pandas, where DuckDB HUGEINT (e.g.
    # SUM over BIGINT) and DECIMAL coerce to float64 and hash as "3963.0" vs
    # Spark's long "3963". DB-API cursor.description only reports generic type
    # codes ('NUMBER'), so detect via the relational API, whose .types carries
    # the real logical types.
    rel = con.sql(sql)
    o_cols = list(rel.columns)
    hugeint_cols = oracle_unstable_columns(rel)
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
        res.detail = (
            f"oracle columns {hugeint_cols} are HUGEINT/DECIMAL — the driver's "
            "pandas fetch coerces them to float64; cast to BIGINT/DOUBLE in the SQL"
        )
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


# ---------------------------------------------------------------- pandas mode

def _pandas_cell(v):
    """Normalize a post-pandas cell the way the driver's canonicalizer sees
    it. NULL-vs-NaN folds to one token: both engines' pandas paths coerce a
    NULL in a float column to NaN, so the distinction does not survive the
    fetch on EITHER side and keeping it would fabricate mismatches the driver
    cannot see. Everything else goes through :func:`_norm_cell` with numpy
    scalars unwrapped — crucially, a ``decimal.Decimal`` cell stays Decimal
    (as it does in Spark's ``toPandas``) and renders type-tagged, while a
    float64-coerced oracle cell renders as a float repr: the exact asymmetry
    that made the r14 drift pair driver-red shows up as a mismatch here."""
    import numpy as np
    import pandas as pd

    try:
        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            return "<NA>"
        if isinstance(v, np.floating):
            f = float(v)
            return "<NA>" if math.isnan(f) else _norm_cell(f)
    except (TypeError, ValueError):
        pass
    if isinstance(v, np.integer):
        return _norm_cell(int(v))
    if isinstance(v, np.bool_):
        return _norm_cell(bool(v))
    # DATE columns coerce asymmetrically but HARMLESSLY: Spark toPandas keeps
    # datetime.date, DuckDB .df() promotes to a midnight datetime64 Timestamp
    # — and date-emitting queries (q_date_funcs etc.) are driver hash-GREEN,
    # so the driver's canonicalizer tolerates exactly this pair. Fold naive
    # midnight timestamps to date form so parity mode doesn't fabricate
    # mismatches the driver never sees.
    if (
        isinstance(v, _dt.datetime)
        and v.tzinfo is None
        and v.hour == v.minute == v.second == v.microsecond == 0
        and getattr(v, "nanosecond", 0) == 0
    ):
        return v.date().isoformat()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(str(_pandas_cell(x)) for x in v.tolist()) + "]"
    return _norm_cell(v)


def compare_pandas(
    name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> CompareResult:
    """Driver-parity comparison: both result sets fetched THROUGH PANDAS
    (``toPandas()`` vs ``rel.df()``), columns sorted by name, rows sorted,
    cells normalized by :func:`_pandas_cell` — the path the external driver's
    canonicalizer walks. Round 14 proved the exact-tuple mode in
    :func:`compare` can pass a query the driver fails (DECIMAL coercion
    asymmetry); this mode exists so the full-registry sweep fails everything
    the driver would fail."""
    s_pd = spark_df.toPandas()
    o_pd = con.sql(sql).df()

    res = CompareResult(
        name=name,
        ok=True,
        row_count_spark=len(s_pd),
        row_count_oracle=len(o_pd),
        schema_spark=sorted(map(str, s_pd.columns)),
        schema_oracle=sorted(map(str, o_pd.columns)),
    )
    if len(s_pd) != len(o_pd):
        res.ok = False
        res.detail = f"row count {len(s_pd)} != {len(o_pd)}"
        return res
    if res.schema_spark != res.schema_oracle:
        res.ok = False
        res.detail = f"schema {res.schema_spark} != {res.schema_oracle}"
        return res

    def canon(pdf) -> list[tuple]:
        cols = sorted(map(str, pdf.columns))
        rows = [
            tuple(_pandas_cell(v) for v in r)
            for r in pdf[cols].itertuples(index=False, name=None)
        ]
        rows.sort()
        return rows

    s_rows, o_rows = canon(s_pd), canon(o_pd)
    if s_rows != o_rows:
        res.ok = False
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:3]
        res.detail = f"pandas-path value mismatch; first diffs (spark, oracle)={diffs}"
    return res
