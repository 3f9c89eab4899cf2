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
    "hbase_observer_es_spark.operators.es_aggs",
    "hbase_observer_es_spark.operators.nested_geo",
    "hbase_observer_es_spark.operators.relational",
    "hbase_observer_es_spark.operators.scalar",
    "hbase_observer_es_spark.operators.cdc",
    "hbase_observer_es_spark.operators.text",
)

# Registry ORDER is the driver-verification SCHEDULE: external harnesses check a
# bounded prefix (~50 entries) of the registry per round, so with 100+ registered
# queries the order below decides which rows in CORRECTNESS_r{N} refresh.
# Policy (round-2 verdict task #1, confirmed working in r3 — all 50 prefix rows
# checked): red/never-green first, then queries new or changed this round, then
# the rows whose last green is oldest (now: the round-2 window — similarity /
# search / dedup / streaming / multimodal / scale), freshest-green last.
# Revisit each round as rows go green and code changes.
_PRIORITY = (
    # red in CORRECTNESS_r03 (HUGEINT oracle dtype, fixed this round)
    "q_agg_terms_other",
    # new this round — never driver-checked
    "q_agg_range",
    "q_agg_tophits",
    "q_agg_pctranks",
    "q_agg_adjacency",
    "q_agg_rare_terms",
    "q_agg_bucket_sel",
    "q_agg_weighted_avg",
    "q_agg_autodatehist",
    "q_search_bool",
    "q_search_prefix",
    "q_text_chunk",
    "q_text_topword",
    "q_sim_range",
    "q_mixture_weights",
    "q_text_pack",
    "q_nested_exists",
    "q_geo_bbox",
    "q_geo_grid",
    "q_geo_distance",
    "s_terms_stream",
    "q_sample_diversified",
    # last green in round 2; oldest rows first
    "q_sim_knn",
    "q_sim_pairs",
    "q_sim_ivf",
    "q_sim_ivf_batch",
    "q_sim_lsh",
    "q_sim_lsh_batch",
    "q_dedup_embed",
    "q_sim_knn_pudf",
    "q_search_bm25",
    "q_search_phrase",
    "q_search_mlt",
    "q_search_sigterms",
    "q_search_suggest",
    "q_join_salted",
    "q_join_bucketed",
    "q_scan_pruned",
    "q_pipeline_corpus",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_simhash_near",
    "q_dedup_clusters",
    "s_win_tumbling",
    "s_win_sliding",
    "s_win_session",
    "s_watermark_dedup",
    "s_stateful_profile",
    "s_win_stream",
    "s_session_stream",
    "s_join_stream",
    "q_agg_groupingsets",
    "q_agg_percentile",
    "q_subquery_scalar",
    "q_win_rangeframe",
    "q_page_keyset",
    "q_agg_histogram",
    "q_agg_stats",
    "q_mm_framesample",
    "q_mm_resize",
    # likely beyond the ~50-row window this round: r2-green, unchanged, lowest
    # re-verification value (trivial plans or disclosed stubs)
    "q_mm_decode",
    "q_mm_meta",
    "q_udf_scalar",
    "q_udf_grouped",
    "q_scan_project",
    "q_filter_pred",
    "q_join_inner",
    "q_get_by_key",
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
