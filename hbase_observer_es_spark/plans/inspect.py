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


@dataclass
class StreamingPlanFacts:
    """Facts parsed from a streaming query's last EXECUTED micro-batch plan
    (``query.lastExecution`` via ``explainInternal``): the state-store
    operators, watermark nodes, and exchange/codegen posture that the batch
    PlanFacts vocabulary cannot see."""

    exchanges: int = 0
    state_store_saves: int = 0
    state_store_restores: int = 0
    streaming_dedup: bool = False
    stream_stream_joins: int = 0
    flatmap_pandas_state: bool = False
    session_window_state: bool = False
    event_time_watermarks: int = 0
    python_eval: bool = False
    wholestage_codegen: bool = False
    foreach_batch_sink: bool = False
    file_scans: int = 0


def streaming_plan_facts(plan: str) -> StreamingPlanFacts:
    """Parse the explainInternal output of a terminated streaming query. A
    string without a physical-plan section (e.g. a capture-failure sentinel)
    raises — silently parsing it would yield a plausible all-zero posture."""
    if "== Physical Plan ==" not in plan:
        raise ValueError(
            f"not an explainInternal plan (no physical section): {plan[:80]!r}"
        )
    # explainInternal(extended=True) prints parsed/analyzed/optimized/physical
    # sections — count nodes only in the physical plan so logical operators
    # (e.g. EventTimeWatermark appearing in every section) are not multiplied
    phys = plan.split("== Physical Plan ==")[-1]
    return StreamingPlanFacts(
        exchanges=len(re.findall(r"Exchange \w+", phys)),
        state_store_saves=phys.count("StateStoreSave"),
        state_store_restores=phys.count("StateStoreRestore"),
        streaming_dedup="StreamingDeduplicate" in phys,
        stream_stream_joins=phys.count("StreamingSymmetricHashJoin"),
        flatmap_pandas_state="FlatMapGroupsInPandasWithState" in phys,
        session_window_state="SessionWindowStateStore" in phys,
        event_time_watermarks=phys.count("EventTimeWatermark"),
        python_eval="BatchEvalPython" in phys or "ArrowEvalPython" in phys,
        wholestage_codegen="WholeStageCodegen" in phys or "*(" in phys,
        foreach_batch_sink="ForeachBatch" in plan,
        file_scans=phys.count("FileScan parquet"),
    )


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
