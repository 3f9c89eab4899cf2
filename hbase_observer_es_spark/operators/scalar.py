"""Scalar expression surface: string / date / math / JSON / array functions.

The reference types every HBase cell value as a UTF-8 string
(/root/reference/src/main/java/langya/hbase/observer/util/HbaseDataSyncEsObserver.java:76-77)
and delegates typed evaluation to Elasticsearch's dynamic mapping. Here the scalar layer
is explicit: every function below is a JVM-side built-in inside whole-stage codegen —
no Python in the hot path.

q_json_extract is the reference's "dynamic column" analogue: `events.props` plays the
role of the schemaless qualifier map (SURVEY.md §1.1), extracted with get_json_object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table


def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substring/concat/length/regexp_extract/translate on part."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_sub"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.translate("p_name", " ", "_").alias("name_us"),
        F.lower(F.trim(F.col("p_type"))).alias("type_lower"),
    )


SQL_STR_FUNCS = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 5) AS name_sub,
       p_brand || '/' || p_type AS brand_type,
       CAST(length(p_name) AS BIGINT) AS name_len,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
       translate(p_name, ' ', '_') AS name_us,
       lower(trim(p_type)) AS type_lower
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/quarter/date_trunc/datediff/weekday buckets on orders.

    All functions evaluate in the UTC session timezone (session.py) so they agree
    with DuckDB's naive-timestamp semantics.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.quarter("o_orderdate").cast("bigint").alias("o_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch95"),
        (F.expr("weekday(o_orderdate)") + F.lit(1)).cast("bigint").alias("iso_dow"),
    )


SQL_DATE_FUNCS = """
SELECT o_orderkey, o_orderdate,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
           AS days_since_epoch95,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow
FROM orders
"""


def q_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt + CASE WHEN tiering on lineitem.

    Only IEEE-exact math (sqrt, *, abs) — no libm transcendentals, whose last-ulp
    behavior differs across engines and would break value-hash comparison.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 25, "mid")
        .otherwise("high")
        .alias("qty_tier"),
    )


SQL_MATH_CASE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       sqrt(l_extendedprice) AS price_sqrt,
       l_quantity * l_quantity AS qty_sq,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 25 THEN 'mid'
            ELSE 'high' END AS qty_tier
FROM lineitem
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from events.props — the dynamic-qualifier analogue of the
    reference's schemaless cell map (SURVEY.md §1.1)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        "event_type",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
        k.isNotNull().alias("has_k"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS has_k
FROM events
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embeddings: size, element access, L2 norm via a higher-order
    fold — JVM-side, no UDF. The fold order (left, zero-init) matches DuckDB's
    list_reduce so doubles come out bit-identical.
    """
    emb = table(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    sumsq = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.sqrt(sumsq).alias("l2_norm"),
    )


SQL_ARRAY_FUNCS = """
SELECT vec_id, label,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       sqrt(list_reduce(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           (acc, x) -> acc + x)) AS l2_norm
FROM embeddings
"""


QUERIES = {
    "q_str_funcs": q_str_funcs,
    "q_date_funcs": q_date_funcs,
    "q_math_case": q_math_case,
    "q_json_extract": q_json_extract,
    "q_array_funcs": q_array_funcs,
}

ORACLES = {
    "q_str_funcs": SQL_STR_FUNCS,
    "q_date_funcs": SQL_DATE_FUNCS,
    "q_math_case": SQL_MATH_CASE,
    "q_json_extract": SQL_JSON_EXTRACT,
    "q_array_funcs": SQL_ARRAY_FUNCS,
}
