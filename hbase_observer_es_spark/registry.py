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
    "hbase_observer_es_spark.operators.es_aggs_stats",
    "hbase_observer_es_spark.operators.es_aggs_more",
    "hbase_observer_es_spark.operators.query_string",
    "hbase_observer_es_spark.operators.corpus_stats",
    "hbase_observer_es_spark.operators.relational_more",
    "hbase_observer_es_spark.operators.ann_eval",
)

# Registry ORDER is the driver-verification SCHEDULE: external harnesses check a
# bounded prefix (~50 entries) of the registry per round, so with 100+ registered
# queries the order below decides which rows in CORRECTNESS_r{N} refresh.
# Policy (confirmed working r3/r4 — all 50 prefix rows checked each round):
# red/never-green first, then rows whose code changed since their last green,
# then queries new this round, then same-file neighbors of this round's edits
# (oldest green first), freshest-untouched last. Revisit every round.
_PRIORITY = (
    # the 19 rows whose last green is round 2 AND whose files were edited after
    # that check (round-4 verdict task #1 — the only open correctness risk)
    "s_join_stream",
    "s_session_stream",
    "q_agg_groupingsets",
    "q_agg_percentile",
    "q_subquery_scalar",
    "q_win_rangeframe",
    "q_page_keyset",
    "q_agg_histogram",
    "q_agg_stats",
    "q_mm_decode",
    "q_mm_meta",
    "q_mm_framesample",
    "q_mm_resize",
    "q_udf_scalar",
    "q_udf_grouped",
    "q_scan_project",
    "q_filter_pred",
    "q_join_inner",
    "q_get_by_key",
    # functions edited this round (dtype cast; train_centroids literalization)
    "q_search_prefix",
    "q_sim_ivf_trained",
    # new this round — never driver-checked
    "q_text_pack_sharded",
    "q_agg_multiterms",
    "q_agg_stringstats",
    "q_agg_matrixstats",
    "q_agg_geocentroid",
    "q_agg_bucketstats",
    "q_agg_scripted",
    "q_text_ngram_rep",
    "q_text_unigram",
    "q_win_ntile",
    "q_pivot",
    "q_text_boilerplate",
    "q_ann_recall",
    "q_agg_sampler",
    "q_agg_normalize",
    "q_agg_bucket_script",
    # same-file neighbors of this round's edits (functions untouched), oldest
    # green first: search.py r3 rows, then its r4 rows, then similarity.py /
    # streaming.stateful r3-r4 rows
    "q_search_fuzzy",
    "q_search_highlight",
    "q_search_bm25",
    "q_search_phrase",
    "q_search_mlt",
    "q_search_sigterms",
    "q_search_suggest",
    "q_search_bool",
    "q_embed_quant",
    "s_upsert_sink",
    "q_sim_knn",
    "q_sim_pairs",
    "q_sim_ivf",
    "q_sim_ivf_batch",
    "q_sim_lsh",
    "q_sim_lsh_batch",
    "q_dedup_embed",
    "q_sim_knn_pudf",
    # beyond the ~50-row window: every remaining registered query follows in
    # registration order — all r3/r4-green with untouched files
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
