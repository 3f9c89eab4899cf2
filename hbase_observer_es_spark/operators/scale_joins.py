"""Scale-out join strategies: salting for skew, bucketing for co-location.

These are the two physical join disciplines that decide whether a 100 TB join
finishes or dies, made first-class and oracle-checked. The salt/bucket layout is
purely physical — both queries' RESULTS equal a plain join, which is what the
DuckDB oracle asserts; what changes is the shuffle graph, inspected via
``.explain``. (AQE's skew-join splitting — enabled in session.py — handles
moderate skew automatically; explicit salting is the deterministic fallback when
one key exceeds what a single split can hold.)

Reference tether: the reference serializes ALL writes through one global lock +
one buffer (ElasticsearchBulkOperator.java:47,:139-161 in /root/reference) — its
scalability ceiling. These operators are the opposite discipline: spread hot keys
across partitions (salting), or pre-shuffle once so steady-state joins shuffle
never (bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import lsum, sql_lsum
from ..io import table
from ..sources.filestream import SCRATCH, source_fingerprint

N_SALTS = 8
N_BUCKETS = 8


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof equi-join: lineitem ⋈ supplier with an explicit salt.

    The probe (fact) side gets a deterministic salt in [0, N_SALTS) derived from a
    non-join column, so every occurrence of a hot suppkey spreads over N_SALTS
    shuffle partitions; the build (dim) side is exploded ×N_SALTS so each salted
    fact partition finds its dim row. Join key becomes (suppkey, salt) — same
    result set as the unsalted join, 1/N_SALTS the worst-partition size.
    Cost: dim side ×N_SALTS (here tiny). At 100 TB you'd salt only the keys a
    frequency sketch flags as hot and union the unsalted remainder.
    """
    li = table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey") + F.col("l_linenumber"), F.lit(N_SALTS))
    )
    sup = (
        table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])))
    )
    return (
        li.join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            lsum("l_extendedprice", "revenue"),
        )
    )


SQL_JOIN_SALTED = f"""
SELECT s_nationkey,
       COUNT(*) AS n_items,
       {sql_lsum("l_extendedprice", "revenue")}
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


def _ensure_bucketed(
    spark: SparkSession, sf_dir: str, src: str, cols: list[str], bucket_key: str
) -> str:
    """Create-or-reuse a bucketed copy of ``src``, keyed by the source parquet's
    content fingerprint — the one-time ingest shuffle is paid once per source
    version, not once per query. Reuse has two tiers: the session catalog (warm
    call in the same process), then the on-disk files (fresh session over the
    same scratch warehouse — re-registered as an external bucketed table, since
    bucket ids live in file names and survive the catalog)."""
    key = source_fingerprint(sf_dir, src)
    name = f"bucketdemo.{src}_b_{key.replace('-', '_')}"
    if spark.catalog.tableExists(name):
        return name
    wh = SCRATCH / "warehouse"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{wh.as_posix()}'")
    df = table(spark, sf_dir, src).select(*cols)
    loc = wh / name.split(".", 1)[1]
    if (loc / "_SUCCESS").exists():
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        spark.sql(
            f"CREATE TABLE {name} ({ddl}) USING parquet "
            f"CLUSTERED BY ({bucket_key}) SORTED BY ({bucket_key}) "
            f"INTO {N_BUCKETS} BUCKETS LOCATION '{loc.as_posix()}'"
        )
    else:
        # External (explicit path), not managed: dropping the catalog entry must
        # keep the files, or the "paid once per source version" contract breaks
        # the first time a fresh warehouse is written and then re-registered.
        (
            df.write.bucketBy(N_BUCKETS, bucket_key)
            .sortBy(bucket_key)
            .mode("overwrite")
            .option("path", loc.as_posix())
            .saveAsTable(name)
        )
    return name


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables.

    Joins orders and customer copies bucketed by the join key: Spark's bucketing
    makes the sort-merge join read matching buckets directly — `.explain` shows
    NO Exchange on either side. This is the steady-state discipline for a fact
    table joined on the same key by every query: pay the shuffle once at ingest,
    never again. The bucketed copies are cached by source fingerprint (see
    _ensure_bucketed), so repeated invocations measure the JOIN, not the ingest.
    """
    ob = spark.table(
        _ensure_bucketed(
            spark, sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"],
            "o_custkey",
        )
    )
    cb = spark.table(
        _ensure_bucketed(
            spark, sf_dir, "customer", ["c_custkey", "c_mktsegment"], "c_custkey"
        )
    )
    # hint off broadcast so the plan demonstrates the exchange-free sort-merge join
    joined = ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        lsum("o_totalprice", "total_price"),
    )


SQL_JOIN_BUCKETED = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       {sql_lsum("o_totalprice", "total_price")}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


QUERIES = {
    "q_join_salted": q_join_salted,
    "q_join_bucketed": q_join_bucketed,
}

ORACLES = {
    "q_join_salted": SQL_JOIN_SALTED,
    "q_join_bucketed": SQL_JOIN_BUCKETED,
}
