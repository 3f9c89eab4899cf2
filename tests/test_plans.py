"""Physical-plan assertions: the scale posture, checked in CI.

Correctness says the right rows come out; these tests pin HOW — the plan
properties that decide whether the same query survives a 1000-executor,
100 TB run: broadcast where a side is small, predicate pushdown into the
parquet scan, no exchange on co-located (bucketed) joins, map-side partial
aggregation, and whole-stage codegen on hot paths.
"""

from __future__ import annotations

import re

import pytest

from hbase_observer_es_spark.registry import all_queries

from .conftest import SF_ORACLE

QUERIES = all_queries()


from hbase_observer_es_spark.plans.inspect import plan_facts, plan_string


def plan_of(spark, name: str) -> str:
    return plan_string(QUERIES[name](spark, SF_ORACLE))


def final_plan_of(spark, name: str) -> str:
    """Plan AFTER execution — AQE only materializes codegen stages and final
    join strategies once the query has run."""
    return plan_string(QUERIES[name](spark, SF_ORACLE), executed=True)


def facts_of(spark, name: str):
    return plan_facts(QUERIES[name](spark, SF_ORACLE))


def scan_columns(plan: str) -> list[list[str]]:
    """Column lists of each FileScan ([c1,c2,...] right after the scan node) —
    ReadSchema is truncated in plan strings, the bracket list is not."""
    return [
        m.group(1).split(",")
        for m in re.finditer(r"FileScan parquet [^\[]*\[([^\]]*)\]", plan)
    ]


def test_broadcast_join_broadcasts(spark):
    assert facts_of(spark, "q_join_broadcast").broadcast_joins >= 1


def test_star_join_broadcasts_dims(spark):
    # nation/region are tiny dims — the star join must not shuffle them
    assert facts_of(spark, "q_join_star").broadcast_joins >= 2


def test_point_lookup_pushes_filter(spark):
    plan = plan_of(spark, "q_get_by_key")
    assert re.search(r"PushedFilters: \[.*In\(c_custkey", plan), plan


def test_point_lookup_prunes_columns(spark):
    # 4-column projection must reach the scan, not read all 8 customer columns
    plan = plan_of(spark, "q_get_by_key")
    cols = scan_columns(plan)
    assert cols and len(cols[0]) == 4, plan


def test_filter_pred_pushdown(spark):
    plan = plan_of(spark, "q_filter_pred")
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split(
        "FileScan"
    )[1].split("ReadSchema")[0], plan


def test_bucketed_join_no_exchange_below_join(spark):
    plan = plan_of(spark, "q_join_bucketed")
    assert "Bucketed: true" in plan, plan
    join_sub = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_sub, plan


def test_scan_pruned_partition_filter(spark):
    # the date predicate must prune partition DIRECTORIES, not filter rows
    plan = plan_of(spark, "q_scan_pruned")
    assert re.search(r"PartitionFilters: \[[^\]]*event_date", plan), plan


def test_agg_group_partial_aggregation(spark):
    # map-side combine: a partial_* aggregate must appear below the exchange
    plan = plan_of(spark, "q_agg_group")
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_agg_group_codegen(spark):
    plan = final_plan_of(spark, "q_agg_group")
    assert "WholeStageCodegen" in plan or "*(" in plan, plan


def test_scan_project_prunes(spark):
    plan = plan_of(spark, "q_scan_project")
    cols = scan_columns(plan)
    # lineitem has 16 columns; the projection must read far fewer
    assert cols and len(cols[0]) <= 6, plan


def test_topk_is_take_ordered(spark):
    # global top-10 must be TakeOrderedAndProject (per-partition heap + driver
    # merge of k rows), never a full global sort
    plan = plan_of(spark, "q_sort_limit")
    assert "TakeOrderedAndProject" in plan, plan


def test_knn_is_take_ordered(spark):
    plan = plan_of(spark, "q_sim_knn")
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "name",
    ["q_agg_group", "q_join_star", "q_filter_pred", "q_win_rank", "q_dedup_minhash"],
)
def test_no_rdd_fallback(spark, name):
    # DataFrame-native plans only: no RDD scans / Python row-at-a-time maps in
    # the relational and dedup hot paths
    f = facts_of(spark, name)
    assert not f.rdd_scan and not f.python_eval, name


def test_clusters_plan_depth_bounded(spark):
    # the iterative label-propagation loop localCheckpoints each round, so the
    # RETURNED frame's plan must be one documents-join over a materialized RDD
    # scan — not a join nest proportional to the iteration count
    df = QUERIES["q_dedup_clusters"](spark, SF_ORACLE)
    f = plan_facts(df)
    assert f.rdd_scan, "labels should come from a localCheckpoint (RDD scan)"
    plan = plan_string(df)
    assert plan.count("Join") <= 2, plan


def test_clusters_never_mutates_session_conf(spark, monkeypatch):
    # the label-propagation loop sizes its shuffles per-frame (explicit
    # repartition-by-key at loop width) — it must NOT reach for
    # spark.conf.set, which would degrade every concurrent query planned on
    # the same session while the loop runs (round-7 verdict, What's wrong #3)
    from pyspark.sql.conf import RuntimeConfig

    calls: list[str] = []
    orig = RuntimeConfig.set

    def spy(self, key, value=None):
        calls.append(str(key))
        return orig(self, key, value)

    monkeypatch.setattr(RuntimeConfig, "set", spy)
    QUERIES["q_dedup_clusters"](spark, SF_ORACLE).count()
    assert "spark.sql.shuffle.partitions" not in calls, calls


def test_simhash_near_is_banded_not_allpairs(spark):
    # candidate generation must be an equi-join on (band_id, band_val), never a
    # cartesian/broadcast-nested-loop over the corpus
    plan = plan_of(spark, "q_dedup_simhash_near")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_ivf_batch_broadcasts_centroids_and_probes(spark):
    # routing cross-scores probes against the broadcast (|cells|-bounded)
    # centroid table; cell scoring is a broadcast HASH join on the cell id —
    # the corpus side never shuffles and nothing sort-merges
    plan = plan_of(spark, "q_sim_ivf_batch")
    f = facts_of(spark, "q_sim_ivf_batch")
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0, plan
    assert "CartesianProduct" not in plan, plan


def test_histogram_partial_agg_and_pruned_scan(spark):
    # bucket agg must combine map-side and read ONLY the bucketed column
    plan = plan_of(spark, "q_agg_histogram")
    assert "partial_count" in plan or "partial_sum" in plan, plan
    cols = scan_columns(plan)
    assert cols and len(cols[0]) == 1, plan


def test_stats_is_one_shuffle_partial_agg(spark):
    # sufficient statistics ARE the partial aggregate: map-side combine, and
    # no second pass over the data for the variance arithmetic
    plan = plan_of(spark, "q_agg_stats")
    assert "partial_sum" in plan, plan
    f = facts_of(spark, "q_agg_stats")
    assert f.exchanges <= 2, plan  # one agg shuffle (+AQE read), nothing else


def test_mlt_broadcasts_term_dim(spark):
    # the selected-terms dim and the 1-row stats must broadcast; the corpus
    # doc-term side must never sort-merge against them
    f = facts_of(spark, "q_search_mlt")
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0
    assert f.take_ordered  # top-k is a heap, not a global sort


def test_sigterms_single_pass_no_sortmerge(spark):
    # fg and bg document frequencies come from ONE conditional-count groupBy;
    # corpus totals join as a broadcast 1-row frame
    f = facts_of(spark, "q_search_sigterms")
    assert f.sortmerge_joins == 0
    assert f.take_ordered


def test_lsh_probe_is_broadcast_filter(spark):
    # the 1-row probe broadcast-nested-loop joins (an OR of band equalities is
    # not hashable) — but the corpus side must stay un-shuffled: no sort-merge,
    # no exchange besides the top-k machinery
    f = facts_of(spark, "q_sim_lsh")
    assert f.sortmerge_joins == 0
    assert f.take_ordered


def test_asof_prereduces_before_shuffle(spark):
    """The as-of join must NOT window over the full events x orders-per-customer
    join output (per-key order history is unbounded at scale). The winning match
    is picked by max_by whose PARTIAL phase runs map-side on the join output, so
    the shuffle carries ~ one row per event."""
    plan = plan_of(spark, "q_join_asof")
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan


def test_jaccard_vocab_ids_no_global_window(spark):
    """Dense vocab-id assignment must not serialize the dictionary through one
    task: no single-partition exchange anywhere in the jaccard plan (the old
    Window.orderBy with no partition spec produced exactly that)."""
    plan = plan_of(spark, "q_dedup_jaccard")
    assert "SinglePartition" not in plan, plan


def test_kmeans_assignment_prereduces_before_shuffle(spark):
    """Cell assignment in the trained-IVF path is a max(struct) whose partial
    phase reduces the k x N scored rows map-side — one row per vector crosses
    the shuffle, same discipline as the as-of join."""
    plan = plan_of(spark, "q_sim_ivf_trained")
    assert "partial_max" in plan, plan


def test_datehist_one_fact_scan_broadcast_fill(spark):
    """The empty-bucket fill must not rescan the fact table: the persisted
    bucket frame serves both the spine bounds and the fill join, and the fill
    join broadcasts (both sides are calendar-bounded)."""
    df = QUERIES["q_agg_datehist"](spark, SF_ORACLE)
    df.collect()  # populate the tracked cache so the cache stages materialize
    plan = plan_string(df, executed=True)
    # BOTH consumers (spine bounds, fill join) read the cached bucket frame:
    # each shows up as a TableCacheQueryStage in the final AQE plan (nested
    # InMemoryRelation printouts embed their own Initial Plan sections, so
    # counting raw InMemoryTableScan occurrences over-/under-counts)
    assert plan.count("TableCacheQueryStage") >= 2, plan
    f = plan_facts(QUERIES["q_agg_datehist"](spark, SF_ORACLE))
    assert f.broadcast_joins >= 1, plan


def test_composite_cursor_pushed_below_agg(spark):
    """The composite after-key must reach the parquet scan as a pushed filter
    (deep pages scan a shrinking tail, not aggregate-then-skip)."""
    plan = plan_of(spark, "q_agg_composite")
    assert re.search(r"PushedFilters: \[.*GreaterThanOrEqual\(event_type", plan), plan
    assert "partial_count" in plan, plan


def test_filters_agg_is_one_pass(spark):
    """N named buckets must cost ONE scan + one global agg, not N scans."""
    plan = plan_of(spark, "q_agg_filters")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan


def test_pipeline_aggs_reduce_before_window(spark):
    """Pipeline stages must run over the bucket frame, not the fact rows: one
    fact scan with map-side combine below the (bucket-scale) ordered window."""
    plan = plan_of(spark, "q_agg_pipeline")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    # the window sits ABOVE the final HashAggregate in the operator chain
    assert plan.index("Window") < plan.index("FileScan"), plan


def test_geobounds_one_pass_partial(spark):
    """geo_bounds: one fact scan reduced map-side — min/max are combiners."""
    plan = plan_of(spark, "q_agg_geobounds")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_topmetrics_is_combiner_argmax_not_window(spark):
    """top_metrics must be a map-side-combinable max_by aggregate — a partial
    argmax per partition, merged in the shuffle — never a per-group window
    rank over the fact rows (the 100 TB difference). Struct-valued agg
    buffers make Spark pick SortAggregate (a per-partition sort by the
    closed-cardinality group key feeding the combiner) — accepted: the
    shuffle still carries one row per (partition, group), not the facts."""
    plan = plan_of(spark, "q_agg_topmetrics")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_max_by" in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("Exchange") == 1, plan  # the 5-groups-per-partition merge


def test_pctbucket_reduces_before_percentile(spark):
    """percentiles_bucket sorts only the bucket frame: one fact scan with
    map-side combine below the final (bucket-scale) percentile reduction."""
    plan = plan_of(spark, "q_agg_pctbucket")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_" in plan, plan


def test_serialdiff_reduces_before_window(spark):
    """serial_diff differs the BUCKET frame: map-side combine below the
    calendar-bounded lag window, one pass over facts."""
    plan = plan_of(spark, "q_agg_serialdiff")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_" in plan, plan
    assert plan.index("Window") < plan.index("FileScan"), plan


def test_querystring_is_map_only_filter(spark):
    """The compiled query_string predicate is one filter over one scan — no
    dictionary materialization, no join, no shuffle for boolean text search."""
    plan = plan_of(spark, "q_search_querystring")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan and "Exchange" not in plan, plan


def test_phrase_prefix_single_scan(spark):
    """match_phrase_prefix is positional array math over one scan — the prefix
    expansion never materializes a dictionary or a join."""
    plan = plan_of(spark, "q_search_phrase_prefix")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_cumcard_windows_buckets_not_facts(spark):
    """cumulative_cardinality: the running sum and the new-users join operate
    on bucket/user-frame reductions — partial aggs below, window above, and
    the calendar-bounded new-users side broadcasts."""
    f = facts_of(spark, "q_agg_cumcard")
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0
    plan = plan_of(spark, "q_agg_cumcard")
    assert "partial_" in plan, plan
    assert plan.index("Window") < plan.index("FileScan"), plan


def test_embed_quant_is_map_only(spark):
    """Quantization is per-row column math: the plan must contain no shuffle
    (Exchange) and no Python worker (Batch*Eval) — pure codegen export."""
    plan = plan_of(spark, "q_embed_quant")
    assert "Exchange" not in plan, plan
    assert "Eval" not in plan, plan


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval shingle set (benchmark-suite-sized) must broadcast: the 100 TB
    train side streams map-side through the hash join, never shuffling."""
    plan = plan_of(spark, "q_decontaminate")
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_terms_other_ranks_buckets_not_rows(spark):
    """The top-N ranking window must consume the per-term aggregate (term
    cardinality), never the raw events — partial agg below the window."""
    plan = plan_of(spark, "q_agg_terms_other")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert plan.index("Window") < plan.index("FileScan"), plan


def test_range_agg_one_pass_partial(spark):
    """ES range agg: one fact scan reduced map-side to the handful of buckets."""
    plan = plan_of(spark, "q_agg_range")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan


def test_adjacency_one_pass_no_join(spark):
    """All 6 adjacency buckets from ONE scan + one agg — no self-joins, no
    re-scans per filter."""
    plan = plan_of(spark, "q_agg_adjacency")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_pctranks_single_row_reduction(spark):
    """percentile_ranks: every threshold answered by one map-side-combined
    global aggregate (no crossJoin row multiplication, no per-threshold scan)."""
    plan = plan_of(spark, "q_agg_pctranks")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert "Join" not in plan, plan


def test_text_chunk_no_shuffle(spark):
    """Chunking fans out 1->N executor-side: the plan must contain no Exchange
    and no Python eval — pure codegen explode over the scan."""
    plan = plan_of(spark, "q_text_chunk")
    assert "Exchange" not in plan, plan
    assert "Eval" not in plan, plan
    assert "Generate" in plan, plan  # the explode node


def test_sim_range_broadcasts_probe_no_topk(spark):
    """Threshold similarity: probe broadcast (map-only scan of the big side),
    and no TakeOrdered — result size is data-determined, not a k-heap."""
    plan = plan_of(spark, "q_sim_range")
    # 1-row probe rides a BroadcastExchange (nested-loop build side — it's a
    # keyless join); the big side is scanned in place, never shuffled pre-filter
    assert "BroadcastExchange" in plan, plan
    assert "TakeOrderedAndProject" not in plan, plan


@pytest.mark.parametrize("name", ["q_search_wildcard", "q_search_regexp"])
def test_wildcard_pattern_runs_on_dictionary_not_corpus(spark, name):
    """The wildcard/regexp predicate must sit on the post-distinct dictionary
    branch, never the corpus branch: the matched terms broadcast back (no
    sort-merge), and the RLike filter appears downstream of the distinct's
    HashAggregate — at 100 TB the pattern runs |vocab| times, not |tokens|."""
    f = facts_of(spark, name)
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0
    plan = plan_of(spark, name)
    # every RLike occurrence is inside the dictionary (aggregate) subtree: the
    # plan region between the broadcast exchange and its child aggregate
    assert "RLIKE" in plan.upper(), plan
    # corpus scans must not carry the regex: no FileScan line mentions RLike
    for line in plan.splitlines():
        if "FileScan parquet" in line:
            assert "rlike" not in line.lower(), line


def test_search_bool_map_only(spark):
    """Bool query = one projection + filter over one scan: no shuffle at all."""
    plan = plan_of(spark, "q_search_bool")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Exchange" not in plan, plan


def test_mixture_weights_broadcasts_normalizer(spark):
    """The 1-row totals frame must broadcast back onto the per-language frame —
    language-cardinality work, never a second corpus pass."""
    plan = plan_of(spark, "q_mixture_weights")
    assert "BroadcastExchange" in plan, plan
    assert plan.count("FileScan parquet") <= 2, plan


def test_text_pack_single_ordered_window(spark):
    """Packing is ONE running-sum window over (doc_id, n_tokens) rows — no
    joins, no Python eval; the fact scan feeds the window directly."""
    plan = plan_of(spark, "q_text_pack")
    assert "Join" not in plan, plan
    assert "Eval" not in plan, plan
    assert plan.count("Window") == 1, plan


def test_bucket_sel_takes_ordered_over_buckets(spark):
    """bucket_sort's top-N must be a TakeOrdered over the reduced bucket frame
    (one fact scan, map-side combine below it)."""
    plan = plan_of(spark, "q_agg_bucket_sel")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_geo_filters_are_map_only(spark):
    """geo_bounding_box / geo_distance are scan-side predicates: one scan, no
    Exchange, no Python eval."""
    for name in ("q_geo_bbox", "q_geo_distance"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "Exchange" not in plan, (name, plan)
        assert "Eval" not in plan, (name, plan)


def test_geo_shape_relation_map_only(spark):
    """geo_shape envelope relations are int-centidegree scan-side predicates:
    one scan, no Exchange, no Python eval — the q_geo_bbox posture with the
    2-D relation algebra folded into the projection."""
    plan = plan_of(spark, "q_geo_shape_relation")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Eval" not in plan, plan
    # column pruning must hold: the scan reads only the two id columns
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint>" in plan, plan


def test_geo_polygon_map_only(spark):
    """geo_polygon's crossing-number parity is a scan-side int64 predicate:
    one scan reading only the two id columns, no Exchange, no Python eval —
    the q_geo_bbox posture with the unrolled per-edge terms folded into the
    filter condition."""
    plan = plan_of(spark, "q_geo_polygon")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Eval" not in plan, plan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint>" in plan, plan


def test_geo_grid_partial_agg(spark):
    """The grid agg must combine map-side over cell ids."""
    plan = plan_of(spark, "q_geo_grid")
    assert "partial_count" in plan, plan


def test_nested_exists_single_shuffle(spark):
    """The nested view costs ONE groupBy shuffle; the nested-object predicate
    is codegen array math above it — no joins, no Python eval."""
    plan = plan_of(spark, "q_nested_exists")
    assert "Join" not in plan, plan
    assert "Eval" not in plan, plan
    f = facts_of(spark, "q_nested_exists")
    assert f.exchanges <= 2, plan


def test_weighted_avg_one_pass(spark):
    """weighted_avg: numerator and denominator from ONE map-side-combined agg."""
    plan = plan_of(spark, "q_agg_weighted_avg")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan


def test_autodatehist_broadcasts_bounds(spark):
    """auto_date_histogram: the 1-row bounds frame broadcasts; the fact side
    buckets map-side — no driver collect, no fact shuffle before the agg."""
    plan = plan_of(spark, "q_agg_autodatehist")
    assert "BroadcastExchange" in plan, plan
    assert "partial_count" in plan, plan


def test_diversified_sample_cap_then_cut(spark):
    """Diversity cap applies before the global cut: no lang exceeds the
    per-value cap, and the final cut is the hash-order prefix of the capped
    set (the ES sampler contract)."""
    from hbase_observer_es_spark.operators.pipeline import (
        DIV_MAX_PER_VALUE,
        DIV_SAMPLE_N,
    )

    rows = QUERIES["q_sample_diversified"](spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= DIV_SAMPLE_N
    per_lang: dict = {}
    for r in rows:
        assert r.lang_rank <= DIV_MAX_PER_VALUE
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert all(n <= DIV_MAX_PER_VALUE for n in per_lang.values())
    assert len(per_lang) > 1  # the cap actually diversified the sample


def test_pack_sharded_no_global_sort(spark):
    """The production pack partitions its window by shard: the exchange below
    the Window must be a hash partitioning on the shard key, never the
    single-partition exchange the global q_text_pack form needs (D14)."""
    plan = plan_of(spark, "q_text_pack_sharded")
    assert plan.count("Window") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert re.search(r"Exchange hashpartitioning\(shard", plan), plan
    assert "Join" not in plan and "Eval" not in plan, plan


def test_ngram_rep_map_only(spark):
    """Gopher-style repetition scoring is a pure per-row filter feature: one
    scan, higher-order array math, no shuffle, no explode, no Python."""
    plan = plan_of(spark, "q_text_ngram_rep")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "Eval" not in plan, plan


def test_unigram_broadcasts_vocab(spark):
    """The corpus frequency table joins back by BROADCAST; token traffic
    reaches exactly one groupBy shuffle per pass (vocab build, doc re-agg) —
    never a sort-merge join over exploded tokens."""
    f = facts_of(spark, "q_text_unigram")
    assert f.broadcast_joins >= 1, f
    assert f.sortmerge_joins == 0, f


def test_matrixstats_one_pass_partial(spark):
    """All five moment sums reduce in ONE map-side-combined pass over one
    scan; the variance/covariance/correlation algebra happens on the
    cardinality-bounded bucket frame above it."""
    plan = plan_of(spark, "q_agg_matrixstats")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan
    f = facts_of(spark, "q_agg_matrixstats")
    assert f.exchanges <= 1, plan


def test_stringstats_geocentroid_partial_agg(spark):
    """string_stats / geo_centroid: one scan, map-side combine, one shuffle."""
    for name in ("q_agg_stringstats", "q_agg_geocentroid"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "partial_count" in plan, (name, plan)
        f = facts_of(spark, name)
        assert f.exchanges <= 1, (name, plan)


def test_bucketstats_reduces_buckets_not_rows(spark):
    """The sibling-bucket stage aggregates the already-reduced daily bucket
    frame: exactly one fact scan and a partial agg below the date shuffle."""
    plan = plan_of(spark, "q_agg_bucketstats")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_sum" in plan, plan


def test_pivot_is_one_pass_pinned_columns(spark):
    """Pinned pivot values: NO discovery pass (one scan total) and one
    map-side-combined shuffle on the cohort key."""
    plan = plan_of(spark, "q_pivot")
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan or "partial_pivotfirst" in plan or "partial_first" in plan, plan


def test_ntile_single_window_exchange(spark):
    """ntile/percent_rank/cume_dist share one window spec: one hash exchange
    on the partition key, one Window node, no joins."""
    plan = plan_of(spark, "q_win_ntile")
    assert plan.count("Window") == 1, plan
    assert re.search(r"Exchange hashpartitioning\(c_mktsegment", plan), plan
    assert "Join" not in plan, plan


def test_scripted_metric_single_shuffle(spark):
    """The scripted fold costs one groupBy shuffle; the sort + fold are
    codegen'd array expressions above the agg, not a Python stage."""
    plan = plan_of(spark, "q_agg_scripted")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Eval" not in plan, plan
    f = facts_of(spark, "q_agg_scripted")
    assert f.exchanges <= 1, plan


def test_boilerplate_shingles_once(spark):
    """The shingle frame is cached and BOTH plan branches (frequency agg and
    join-back) read the cache, not a recomputed scan. (A FileScan count would
    mislead here: each InMemoryTableScan node prints its build plan — and its
    embedded scan — in the plan string.)"""
    plan = plan_of(spark, "q_text_boilerplate")
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_ann_recall_truth_side_broadcasts_probes(spark):
    """Recall evaluation: the bounded probe frame broadcasts onto the corpus
    for the exact side; no cartesian product of corpus x corpus anywhere."""
    plan = plan_of(spark, "q_ann_recall")
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sampler_is_take_ordered_then_small_agg(spark):
    """The sample cut must be a TakeOrdered (per-partition heaps) bounded by
    the parameter; the sub-agg reduces the sample frame, not the corpus."""
    plan = plan_of(spark, "q_agg_sampler")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_normalize_bucket_script_reduce_first(spark):
    """normalize / bucket_script consume the already-reduced bucket frame:
    one fact scan with map-side partial aggregation below everything."""
    for name in ("q_agg_normalize", "q_agg_bucket_script"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "partial_sum" in plan, (name, plan)


def test_distribution_aggs_one_pass(spark):
    """boxplot / t_test / rate / date_range: ONE fact scan, map-side partial
    aggregation, at most the one groupBy shuffle."""
    for name in ("q_agg_boxplot", "q_agg_ttest", "q_agg_rate", "q_agg_daterange"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "partial_" in plan, (name, plan)
        f = facts_of(spark, name)
        assert f.exchanges <= 1, (name, plan)


def test_mad_two_phase_broadcasts_medians(spark):
    """MAD is inherently two-phase: the group-median frame (cardinality-
    bounded) must come back as a BROADCAST, never a shuffled join."""
    plan = plan_of(spark, "q_agg_mad")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pipeline_aggs_window_over_buckets(spark):
    """moving_fn / bucket_sort / derivative: one fact pass; every Window node
    sits above the reduced bucket frame (partial agg below it)."""
    for name in ("q_agg_movfn", "q_agg_bucketsort", "q_agg_derivative"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "partial_" in plan, (name, plan)
        assert "Window" in plan, (name, plan)


def test_varwidth_tile_then_reduce(spark):
    """variable_width_histogram: the ntile window (global sort — disclosed
    fixture-scale form) feeds a map-side-combined bucket reduction."""
    plan = plan_of(spark, "q_agg_varwidth")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Window" in plan, plan
    assert "partial_" in plan, plan


def test_collapse_is_combiner_argmax(spark):
    """collapse: one aggregate with map-side combine — NO per-group window
    rank over the hit list, no join."""
    plan = plan_of(spark, "q_search_collapse")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    f = facts_of(spark, "q_search_collapse")
    assert f.exchanges <= 1, plan


def test_score_queries_take_ordered(spark):
    """function_score / rank_feature: pure column math over the scan with a
    TakeOrdered top-k — no global sort, no join."""
    for name in ("q_search_function_score", "q_search_rank_feature"):
        plan = plan_of(spark, name)
        assert facts_of(spark, name).take_ordered, (name, plan)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "Join" not in plan, (name, plan)


def test_terms_set_map_only(spark):
    """terms_set: literal-array filter — scan, filter, project; no shuffle,
    no join at any scale."""
    plan = plan_of(spark, "q_search_terms_set")
    assert plan.count("FileScan parquet") == 1, plan
    f = facts_of(spark, "q_search_terms_set")
    assert f.exchanges == 0, plan
    assert "Join" not in plan, plan


def test_pii_map_only_then_one_shuffle(spark):
    """PII scrub: detection/redaction are codegen'd string expressions (no
    Python stage); only integer counters cross the single groupBy exchange."""
    plan = plan_of(spark, "q_text_pii")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Eval" not in plan, plan
    assert "partial_" in plan, plan
    f = facts_of(spark, "q_text_pii")
    assert f.exchanges <= 1, plan


def test_compound_queries_one_scan_take_ordered(spark):
    """dis_max / boosting / pinned / multi_match: sub-query scores share ONE
    scan and one tokenization; ranking is a TakeOrdered heap — no join, no
    window, no shuffle before the final k rows."""
    for name in (
        "q_search_dismax",
        "q_search_boosting",
        "q_search_pinned",
        "q_search_multimatch",
    ):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert facts_of(spark, name).take_ordered, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert "Window" not in plan, (name, plan)


def test_hybrid_rrf_fuses_windows_not_corpus(spark):
    """RRF: each side truncates with TakeOrdered BEFORE its rank window, the
    probe broadcasts, and no cartesian/corpus-sized join exists anywhere."""
    plan = plan_of(spark, "q_search_hybrid_rrf")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", ""), plan


def test_itemsets_basket_expansion_not_self_join(spark):
    """frequent_item_sets: baskets form in ONE fact shuffle (collect_set per
    user); pair expansion is array math — the plan must not self-join the
    fact scan on user_id."""
    plan = plan_of(spark, "q_agg_itemsets")
    assert plan.count("FileScan parquet") <= 2, plan  # facts + 1-row count branch
    assert "SortMergeJoin" not in plan, plan
    assert "partial_" in plan, plan


def test_span_near_single_pass_one_shuffle(spark):
    """span_near / intervals: per-row position arithmetic behind Generate
    barriers (one scan, one tokenization), then the explode+count per-doc
    aggregate — at most that one map-side-combined shuffle, no join."""
    for name in ("q_search_span_near", "q_search_intervals"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        f = facts_of(spark, name)
        assert f.exchanges <= 1, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert "partial_count" in plan, (name, plan)


def test_triplet_mine_broadcast_anchors_combiner_argmax(spark):
    """Triplet mining: anchors broadcast onto ONE corpus scan; the per-cell
    argmax reduces map-side (no window rank over scored pairs)."""
    plan = plan_of(spark, "q_sim_triplet_mine")
    assert "BroadcastExchange" in plan, plan
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cdc_field_missing_broadcast_total(spark):
    """exists/missing audit: the 1-row total joins the bounded per-qualifier
    frame as a broadcast; no extra fact pass beyond the live-state derivation."""
    plan = plan_of(spark, "q_cdc_field_missing")
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", ""), plan


def test_geoline_rank_then_scalar_rows(spark):
    """geo_line after the round-7 scalar rewrite: scan → ONE hash exchange on
    the bucket key → per-group rank → filter → project, emitting one scalar
    row per kept point. No collect_list/groupBy stage remains and nothing
    shuffles after the rank (the old collect stage is gone)."""
    plan = plan_of(spark, "q_agg_geoline")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Window" in plan, plan
    assert "Join" not in plan, plan
    assert "collect_list" not in plan, plan
    f = facts_of(spark, "q_agg_geoline")
    assert f.exchanges == 1, plan


def test_split_and_gopher_map_only_one_shuffle(spark):
    """split assignment / gopher gate: pure column math over the scan plus the
    one report groupBy — no join, no window, <=1 exchange."""
    for name in ("q_split_assign", "q_text_gopher"):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == 1, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert "Window" not in plan, (name, plan)
        f = facts_of(spark, name)
        assert f.exchanges <= 1, (name, plan)
        assert "partial_" in plan, (name, plan)


def test_percolate_registry_broadcasts(spark):
    """Percolator: the stored-query registry is the broadcast side; the
    corpus scans once and the audit reduces map-side to registry size."""
    plan = plan_of(spark, "q_search_percolate")
    assert plan.count("FileScan parquet") == 1, plan
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "partial_" in plan, plan


def test_knn_filtered_prefilter_take_ordered(spark):
    """Filtered kNN: the metadata filter rides the scan BEFORE the TakeOrdered
    cut (pre-filter semantics); probe broadcasts, nothing sort-merges."""
    plan = plan_of(spark, "q_sim_knn_filtered")
    assert facts_of(spark, "q_sim_knn_filtered").take_ordered, plan
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_salted_join_salts_both_sides(spark):
    """Skew-proof join: the fact side carries a computed salt, the dim side is
    exploded xN_SALTS (Generate), and the join condition includes the salt so a
    hot suppkey spreads over N_SALTS partitions. Never a cartesian."""
    plan = plan_of(spark, "q_join_salted")
    assert "Generate explode" in plan, plan
    assert "salt" in plan, plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    # fact scan prunes to the join/agg columns — no full-width lineitem read
    li = next(c for c in scan_columns(plan) if any("l_suppkey" in x for x in c))
    assert len(li) <= 4, li


def test_dedup_exact_rank_filter_becomes_group_limit(spark):
    """rn=1 over a per-text window must plan as WindowGroupLimit: each shuffle
    partition keeps only its per-key head instead of materializing every rank —
    at 100 TB this is the difference between a top-1 scan and a full sort of
    the corpus inside each partition."""
    plan = plan_of(spark, "q_dedup_exact")
    assert "WindowGroupLimit" in plan, plan
    assert facts_of(spark, "q_dedup_exact").exchanges == 1, plan


def test_topk_pergroup_rank_filter_becomes_group_limit(spark):
    """rn<=3 per brand: WindowGroupLimit partial (map-side) + final, one
    exchange on the group key — the distributed top-k idiom, no global sort."""
    plan = plan_of(spark, "q_topk_pergroup")
    assert "WindowGroupLimit" in plan, plan
    assert facts_of(spark, "q_topk_pergroup").exchanges == 1, plan


def test_stratified_sample_is_map_only(spark):
    """Per-language hash sampling: scan -> filter -> project, zero exchanges,
    and the scan never reads `text` (the wide column the filter doesn't use)."""
    plan = plan_of(spark, "q_sample_stratified")
    f = facts_of(spark, "q_sample_stratified")
    assert f.exchanges == 0, plan
    (cols,) = scan_columns(plan)
    assert not any("text" in c for c in cols), cols


def test_pct_sketch_aggregates_map_side(spark):
    """Sketch percentiles: partial (mergeable sketch) before the exchange,
    final after — constant memory per group, one shuffle."""
    plan = plan_of(spark, "q_agg_pct_sketch")
    assert "partial_" in plan, plan
    assert facts_of(spark, "q_agg_pct_sketch").exchanges == 1, plan


def test_knn_pudf_is_arrow_take_ordered(spark):
    """BLAS kNN: the cosine runs as ArrowEvalPython (vectorized pandas_udf,
    never BatchEvalPython row-at-a-time), and top-k is TakeOrdered — no global
    sort of the scored corpus."""
    plan = plan_of(spark, "q_sim_knn_pudf")
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert facts_of(spark, "q_sim_knn_pudf").take_ordered, plan


def test_range_join_stays_hash_join(spark):
    """Band join on (user_id equality + time band): the equality key keeps it a
    partitioned hash/sort-merge join with the band as a post-join filter —
    never BroadcastNestedLoop/Cartesian, which is what a naive non-equi join
    plans as and what dies at 100 TB."""
    plan = plan_of(spark, "q_join_range")
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_framesample_fanout_is_executor_side(spark):
    """mapInPandas frame fan-out: python stage in the plan, zero exchanges —
    1->N row expansion happens inside the Arrow batch on the executor, not via
    an explode-shuffle."""
    plan = plan_of(spark, "q_mm_framesample")
    assert "MapInPandas" in plan or "mapInPandas" in plan, plan
    assert facts_of(spark, "q_mm_framesample").exchanges == 0, plan


def test_bm25_stats_broadcast_one_corpus_scan(spark):
    """BM25: corpus term counts computed once, the 1-row (N, avgdl, df_t)
    stats frame broadcast back over them — the corpus is never sort-merged
    against itself, and the final cut is TakeOrdered."""
    plan = plan_of(spark, "q_search_bm25")
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert facts_of(spark, "q_search_bm25").take_ordered, plan


def test_simhash_is_one_explode_one_agg(spark):
    """SimHash fingerprints: explode (Generate) then ONE map-side-combined
    groupBy — a single exchange on doc_id, no join, linear in token count."""
    plan = plan_of(spark, "q_dedup_simhash")
    f = facts_of(spark, "q_dedup_simhash")
    assert "Generate explode" in plan, plan
    assert "Join" not in plan, plan
    assert "partial_" in plan, plan
    assert f.exchanges == 1, plan


def test_semi_anti_joins_stay_semi_anti(spark):
    """Semi/anti joins must plan as LeftSemi/LeftAnti (ship keys, not rows —
    never inner+distinct), with the totalprice filter pushed into the orders
    scan so non-qualifying orders die at the parquet reader."""
    for name, kind in (("q_join_semi", "LeftSemi"), ("q_join_anti", "LeftAnti")):
        plan = plan_of(spark, name)
        assert kind in plan, (name, plan)
        scans = plan_facts(QUERIES[name](spark, SF_ORACLE)).scans
        o_scan = next(s for s in scans if any("o_totalprice" in c for c in s["columns"]))
        assert "o_totalprice" in o_scan["pushed_filters"], o_scan


def test_cdc_merge_lww_is_group_limit(spark):
    """CDC last-write-wins: the per-(row_key, qualifier) rank-1 cut plans as
    WindowGroupLimit — each partition keeps only the winning cell version, the
    change log is never fully ranked."""
    plan = plan_of(spark, "q_cdc_doc_merge")
    assert "WindowGroupLimit" in plan, plan


def test_cube_rollup_groupingsets_expand_once(spark):
    """CUBE/ROLLUP/GROUPING SETS: one Expand node feeding one partial+final
    aggregate — never a union of per-grouping re-scans. cube/groupingsets run
    over a single scan; rollup runs over an orders⋈customer join (two scans,
    one join, still one Expand)."""
    for name, n_scans in (
        ("q_agg_cube", 1),
        ("q_agg_rollup", 2),
        ("q_agg_groupingsets", 1),
    ):
        plan = plan_of(spark, name)
        assert plan.count("FileScan parquet") == n_scans, (name, plan)
        assert plan.count("Expand") == 1, (name, plan)
        assert "partial_" in plan, (name, plan)


def test_win_running_single_window_exchange(spark):
    """Running windows: one exchange on the partition key, Window over sorted
    partitions, no join — the frame never leaves its partition."""
    plan = plan_of(spark, "q_win_running")
    f = facts_of(spark, "q_win_running")
    assert "Window" in plan, plan
    assert "Join" not in plan, plan
    assert f.exchanges == 1, plan


def test_udf_scalar_teaching_twin_is_row_at_a_time(spark):
    """The survey-mandated UDF surface: the row-UDF twin really does plan as
    BatchEvalPython (the slow path it exists to demonstrate) — if Spark ever
    silently vectorized it the teaching comparison would be vacuous."""
    plan = plan_of(spark, "q_udf_scalar")
    assert "BatchEvalPython" in plan, plan


def test_mm_decode_resize_python_stage_no_shuffle(spark):
    """Multimodal decode/resize plumbing: a python (Arrow) stage over the scan
    with zero exchanges — payloads never shuffle."""
    for name in ("q_mm_decode", "q_mm_resize"):
        f = facts_of(spark, name)
        plan = plan_of(spark, name)
        assert ("MapInPandas" in plan) or f.python_eval, (name, plan)
        assert f.exchanges == 0, (name, plan)


# Queries where BroadcastNestedLoopJoin is BY DESIGN: a bounded tiny frame
# (1-row corpus stats, a single probe vector, k centroids, a stored-query
# registry) broadcast keylessly against the corpus. The build side is O(1)/O(k)
# — never data-sized — so the "nested loop" is one pass over the stream side.
_BNLJ_BY_DESIGN = {
    "q_agg_autodatehist", "q_agg_itemsets", "q_agg_rare_terms", "q_ann_recall",
    "q_cdc_field_missing", "q_dedup_jaccard", "q_mixture_weights",
    "q_search_bm25", "q_search_bm25_ln", "q_search_hybrid_rrf", "q_search_mlt",
    "q_search_mlt_ln", "q_search_rescore", "q_search_percolate",
    "q_search_suggest_term", "q_search_suggest_phrase",
    "q_search_sigterms", "q_sim_ivf", "q_sim_ivf_batch", "q_sim_ivf_trained",
    "q_sim_knn", "q_sim_knn_filtered", "q_sim_lsh", "q_sim_range",
    "q_sim_triplet_mine",
}

# Queries planning a Scan ExistingRDD: localCheckpoint lineage cuts (iterative
# connected components, trained centroids) or a driver-built bounded registry.
_RDD_BY_DESIGN = {
    "q_dedup_clusters", "q_dedup_jaccard", "q_search_percolate", "q_sim_ivf_trained",
    "q_graph_pagerank",  # edge/node frames checkpointed once before the K-loop
    "q_graph_components",  # min-label fixpoint localCheckpoints each round
    "q_embed_pq",  # trained codebook: bounded M·K createDataFrame, the q_sim_ivf_trained shape
}


def test_registry_wide_plan_hygiene(spark):
    """Every batch query's plan: NO CartesianProduct ever, and
    BroadcastNestedLoopJoin / RDD scans only in the audited by-design sets
    above — a new query that silently plans a cartesian or falls off the
    DataFrame path fails here before it ships."""
    offenders = {}
    for name, fn in QUERIES.items():
        if name.startswith("s_"):
            continue  # streaming queries execute on call; batch-plan API N/A
        plan = plan_string(fn(spark, SF_ORACLE))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_BY_DESIGN:
            flags.append("nested-loop")
        if "Scan ExistingRDD" in plan and name not in _RDD_BY_DESIGN:
            flags.append("rdd-scan")
        if flags:
            offenders[name] = flags
    assert not offenders, offenders


def test_quadratic_jaccard_ground_truth_is_fenced():
    """q_dedup_jaccard is the DOCUMENTED quadratic ground-truth baseline for
    the LSH path (all-pairs non-equi self-join — BroadcastNestedLoopJoin at
    any corpus size). This fence makes the 'never a production path' claim
    mechanical: no other registered query's reachable definition closure may
    include the jaccard query or its all-pairs building blocks, so the
    cartesian baseline can never leak into a scale path unnoticed."""
    import os

    from hbase_observer_es_spark.astdeps import DepGraph, query_roots
    from hbase_observer_es_spark.registry import _MODULES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_dir = os.path.join(repo, "hbase_observer_es_spark")
    sources: dict[str, str] = {}
    for root, _, fnames in os.walk(pkg_dir):
        for f in fnames:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                with open(p) as fh:
                    sources[os.path.relpath(p, repo)] = fh.read()

    def resolve(parts):
        if not parts or parts[0] != "hbase_observer_es_spark":
            return None
        base = "/".join(parts)
        for rel in (base + ".py", base + "/__init__.py"):
            if rel in sources:
                return rel
        return None

    graph = DepGraph(sources, resolve)
    dedup_rel = "hbase_observer_es_spark/operators/dedup.py"
    eval_rel = "hbase_observer_es_spark/operators/dedup_eval.py"
    forbidden = {
        (dedup_rel, n)
        for n in ("q_dedup_jaccard", "_pair_frames", "_bitset_pair_jaccard")
    }
    # q_dedup_lsh_recall's all-pairs truth side is a fenced baseline too:
    # it may appear ONLY in its own closure (skipped below, like jaccard)
    forbidden |= {(eval_rel, "_truth_pairs"), (eval_rel, "q_dedup_lsh_recall")}

    checked = 0
    for modname in _MODULES:
        rel = modname.replace(".", "/") + ".py"
        assert rel in sources, rel
        import ast as _ast

        tree = _ast.parse(sources[rel])
        qnames = []
        for node in tree.body:
            if (
                isinstance(node, _ast.Assign)
                and any(
                    isinstance(t, _ast.Name) and t.id == "QUERIES"
                    for t in node.targets
                )
                and isinstance(node.value, _ast.Dict)
            ):
                qnames = [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, _ast.Constant)
                ]
        for qname in qnames:
            if qname in ("q_dedup_jaccard", "q_dedup_lsh_recall"):
                continue
            roots = query_roots(sources[rel], qname)
            assert roots is not None, f"{qname}: registry roots unresolvable"
            c = graph.closure(rel, {n for _role, n in roots})
            hit = forbidden & c.reached
            assert not hit, f"{qname} reaches quadratic baseline defs: {hit}"
            checked += 1
    assert checked > 150, f"fence walked only {checked} queries"


def test_has_parent_child_side_never_shuffles(spark):
    # ES has_parent analogue: the SELECTIVE parent filter broadcasts and the
    # child (lineitem) side is matched by a broadcast left-semi hash join —
    # no sort-merge anywhere, the only exchange is the broadcast itself
    f = facts_of(spark, "q_join_has_parent")
    plan = plan_of(spark, "q_join_has_parent")
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_has_child_filter_pushed_and_partial_agg(spark):
    # ES has_child analogue: the child predicate reaches the lineitem scan
    # and the count-per-parent combines map-side before its one shuffle
    plan = plan_of(spark, "q_join_has_child")
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_quantity", plan), plan
    assert "partial_count" in plan, plan


def test_rescore_is_window_bounded(spark):
    # ES rescore: phase 1 (BM25 + window cut) owns both corpus scans; phase 2
    # re-ranks WITHIN the 100-row window with pure column math — a third scan
    # would mean the rescore query went back to the corpus (O(corpus), the
    # exact failure the two-phase API exists to avoid)
    plan = plan_of(spark, "q_search_rescore")
    assert plan.count("FileScan parquet") <= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_suggest_term_distance_runs_on_vocab_not_corpus(spark):
    # ES term suggester: levenshtein runs |probes| x |vocabulary| against the
    # aggregated dictionary (partial-combined groupBy), never per corpus token
    # instance — the dictionary aggregate must sit below the probe cross join
    plan = plan_of(spark, "q_search_suggest_term")
    assert "partial_count" in plan, plan
    assert "levenshtein" in plan.lower(), plan


def test_terms_lookup_broadcasts_lookup_set(spark):
    # the lookup document's term set is a document-sized broadcast; the corpus
    # side hash-joins it and combines the shared-term count map-side
    f = facts_of(spark, "q_search_terms_lookup")
    plan = plan_of(spark, "q_search_terms_lookup")
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0, plan
    assert "partial_count" in plan, plan


def test_suggest_phrase_broadcasts_candidates_onto_bigrams(spark):
    # the per-position candidate cross product (edit-distance-1 neighborhoods)
    # is tiny and broadcast onto the map-side-combined bigram table — the
    # corpus is scanned for bigrams once, never per candidate
    plan = plan_of(spark, "q_search_suggest_phrase")
    f = facts_of(spark, "q_search_suggest_phrase")
    assert "partial_count" in plan, plan
    assert f.broadcast_joins >= 1 and f.sortmerge_joins == 0, plan


def test_range_relation_is_map_only_pushed_scan(spark):
    # interval-relation predicates are pure date comparisons on the scan — no
    # join, no aggregate, no shuffle in the whole plan
    plan = plan_of(spark, "q_search_range_relation")
    f = facts_of(spark, "q_search_range_relation")
    assert f.exchanges == 0 and "Join" not in plan, plan
    assert re.search(r"PushedFilters: \[[^\]]*o_orderdate", plan), plan
