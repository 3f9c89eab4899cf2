"""Central query registry: aggregates QUERIES/ORACLES from every operator module.

``__spark_entry__.py`` (the driver contract) is a thin shim over this. Modules are
imported lazily-but-eagerly here; a module that fails to import should fail loudly —
silent partial registries would under-report coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "hbase_observer_es_spark.operators.similarity",
    "hbase_observer_es_spark.operators.search",
    "hbase_observer_es_spark.operators.scale_joins",
    "hbase_observer_es_spark.operators.scale_scan",
    "hbase_observer_es_spark.operators.udf_surface",
    "hbase_observer_es_spark.operators.multimodal",
    "hbase_observer_es_spark.operators.pipeline",
    "hbase_observer_es_spark.streaming.windows",
    "hbase_observer_es_spark.streaming.stateful",
    "hbase_observer_es_spark.operators.dedup",
    "hbase_observer_es_spark.operators.relational_ext",
    "hbase_observer_es_spark.operators.relational",
    "hbase_observer_es_spark.operators.scalar",
    "hbase_observer_es_spark.operators.cdc",
    "hbase_observer_es_spark.operators.text",
)

# Registry ORDER is the driver-verification SCHEDULE: external harnesses check a
# bounded prefix (~50 entries) of the registry per round, so with 87 registered
# queries the order below decides which rows in CORRECTNESS_r{N} refresh.
# Policy (round-3 verdict task #1): never-green first, then queries whose code
# changed since their last green row, then the stale rows verified longest ago
# (round 1: relational tail / scalar / cdc / text), and freshly-green queries
# last. Revisit each round as rows go green and code changes.
_PRIORITY = (
    # never driver-green (r1: no oracle; r2: outside the window / harness err)
    "q_agg_approx",
    "q_search_fuzzy",
    # new or changed this round — their green rows are stale by definition
    "q_sim_ivf_trained",
    "q_search_highlight",
    "q_sample_stratified",
    "q_agg_pct_sketch",
    "q_agg_datehist",
    "q_agg_composite",
    "q_agg_filters",
    "q_agg_pipeline",
    "q_agg_terms_other",
    "q_decontaminate",
    "q_embed_quant",
    "q_dedup_jaccard",
    "q_join_asof",
    "s_upsert_sink",
    # verified green in round 1 only; modules unchanged since, rows stale
    "q_join_broadcast",
    "q_join_left",
    "q_join_semi",
    "q_join_anti",
    "q_join_star",
    "q_join_range",
    "q_agg_global",
    "q_agg_group",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_win_rank",
    "q_win_running",
    "q_win_lag",
    "q_topk_pergroup",
    "q_sort_limit",
    "q_union",
    "q_intersect",
    "q_except",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_case",
    "q_json_extract",
    "q_array_funcs",
    "q_cdc_snapshot",
    "q_cdc_tombstone",
    "q_cell_pivot",
    "q_cdc_doc_merge",
    "q_text_tokens",
    "q_text_lang",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokcount",
    "q_text_fingerprint",
)


def _reorder(queries: dict, oracles: dict) -> tuple[dict, dict]:
    unknown = [n for n in _PRIORITY if n not in queries]
    if unknown:
        raise ValueError(f"_PRIORITY names not in registry: {unknown}")
    ordered = list(_PRIORITY) + [n for n in queries if n not in set(_PRIORITY)]
    q = {n: queries[n] for n in ordered}
    o = {n: oracles[n] for n in ordered if n in oracles}
    return q, o


def _load() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracle without query: {sorted(unknown)}")
    return _reorder(queries, oracles)


def all_queries() -> dict[str, QueryFn]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
