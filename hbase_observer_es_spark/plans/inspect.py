"""Physical-plan inspection: structured facts about how a DataFrame will execute.

The engine's scale posture is asserted, not assumed — tests/test_plans.py pins
broadcast/pushdown/pruning/codegen properties per query. These helpers are the
shared vocabulary: they parse `executedPlan` strings into facts so both tests and
interactive tuning sessions ask questions like "did the filter reach the scan?"
instead of eyeballing explain output.

(The reference has no plans to inspect — every pipeline is hard-coded imperative
Java, SURVEY.md §3. Plan introspection is part of what the Spark rebuild buys.)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, executed: bool = False) -> str:
    """The physical plan as text. With ``executed=True`` the query is run first —
    under AQE the final plan (codegen stages, runtime join strategy) only
    materializes after execution."""
    if executed:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanFacts:
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    exchanges: int = 0
    take_ordered: bool = False
    wholestage_codegen: bool = False
    python_eval: bool = False
    rdd_scan: bool = False
    scans: list[dict] = field(default_factory=list)  # columns / pushed / partition


def plan_facts(df: DataFrame, executed: bool = False) -> PlanFacts:
    plan = plan_string(df, executed=executed)
    facts = PlanFacts(
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        exchanges=len(re.findall(r"Exchange \w+", plan)),
        take_ordered="TakeOrderedAndProject" in plan,
        wholestage_codegen="WholeStageCodegen" in plan or "*(" in plan,
        python_eval="BatchEvalPython" in plan or "ArrowEvalPython" in plan,
        rdd_scan="Scan ExistingRDD" in plan,
    )
    # FileScan column list is never truncated (unlike ReadSchema) — parse it for
    # projection-pruning checks
    for m in re.finditer(r"FileScan parquet [^\[]*\[([^\]]*)\][^\n]*", plan):
        node = m.group(0)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", node)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", node)
        facts.scans.append(
            {
                "columns": [c.split("#")[0] for c in m.group(1).split(",") if c],
                "pushed_filters": pushed.group(1) if pushed else "",
                "partition_filters": part.group(1) if part else "",
            }
        )
    return facts
