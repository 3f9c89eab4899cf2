"""UDF surface (SURVEY.md §2-C q_udf_*): one row Python UDF, one vectorized
pandas_udf, one applyInPandas group transform — each reproducing a built-in twin so
the oracle proves the UDF path bit-equal to the JVM path.

UDF doctrine at scale: built-ins first (whole-stage codegen); when Python is
unavoidable, Arrow-batched pandas UDFs (10-100x row-at-a-time); row UDFs only as a
last resort (q_udf_scalar includes one deliberately, to demonstrate and test the
slow path — the docstring is the warning label).

The reference has no expression language at all (SURVEY.md §2-A end-note); its
"transform" is a hard-coded byte→string loop on the RPC handler thread
(HbaseDataSyncEsObserver.java:72-80 in /root/reference). Here extensibility is a
first-class, tested surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..functions import sql_davg, sql_dsum
from ..io import table


@F.udf(returnType=StringType())
def _tier_udf(qty: float) -> str:
    # row-at-a-time Python UDF: the documented slow path
    if qty is None:
        return None
    if qty < 10:
        return "low"
    if qty < 25:
        return "mid"
    return "high"


@F.pandas_udf(DoubleType())
def _revenue_pudf(price: pd.Series, discount: pd.Series) -> pd.Series:
    # Arrow-vectorized: numpy float64 IEEE ops — bit-identical to the JVM/DuckDB
    return price * (1.0 - discount)


def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF + pandas UDF side by side, checked against built-in twins."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _tier_udf(F.col("l_quantity")).alias("qty_tier"),
        _revenue_pudf(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
    )


SQL_UDF_SCALAR = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 25 THEN 'mid'
            ELSE 'high' END AS qty_tier,
       l_extendedprice * (1.0 - l_discount) AS revenue
FROM lineitem
"""


def q_udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas group transform reproducing the q_agg_group aggregates.

    Exactness trick: the decimal cast happens in Spark BEFORE the UDF, so pandas
    receives Python Decimals (Arrow decimal128) and sums them exactly — the UDF
    stays order-independent and matches the dsum/davg oracle bit-for-bit.
    """
    li = table(spark, sf_dir, "lineitem")
    prepped = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty_dec"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price_dec"),
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        sum_qty = pdf["qty_dec"].sum()        # exact Decimal arithmetic
        sum_price = pdf["price_dec"].sum()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "sum_qty": [float(sum_qty)],
                "avg_qty": [float(sum_qty) / n],
                "sum_price": [float(sum_price)],
                "avg_price": [float(sum_price) / n],
                "count_order": [n],
            }
        )

    out_schema = (
        "l_returnflag string, l_linestatus string, sum_qty double, avg_qty double,"
        " sum_price double, avg_price double, count_order long"
    )
    return prepped.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        summarize, out_schema
    )


SQL_UDF_GROUPED = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", "sum_qty")},
       {sql_davg("l_quantity", "avg_qty")},
       {sql_dsum("l_extendedprice", "sum_price")},
       {sql_davg("l_extendedprice", "avg_price")},
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "q_udf_scalar": q_udf_scalar,
    "q_udf_grouped": q_udf_grouped,
}

ORACLES = {
    "q_udf_scalar": SQL_UDF_SCALAR,
    "q_udf_grouped": SQL_UDF_GROUPED,
}
