"""Semantics pins for the round-6 surface: invariants the oracle hash alone
doesn't articulate (it would pass equally for a different-but-consistent
implementation pair)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table
from hbase_observer_es_spark.operators.mining import q_sim_triplet_mine
from hbase_observer_es_spark.operators.search_compound import (
    NEG_BOOST,
    PINNED_IDS,
    q_search_boosting,
    q_search_dismax,
    q_search_pinned,
)
from hbase_observer_es_spark.operators.hybrid import (
    RRF_K,
    q_search_hybrid_rrf,
)

from .conftest import SF_ORACLE


def test_pinned_ids_head_results_in_curated_order(spark):
    """ES pinned semantics: the pinned block leads in LIST order (not score
    order, not id order), organic hits follow."""
    rows = q_search_pinned(spark, SF_ORACLE).collect()
    assert [r.doc_id for r in rows[: len(PINNED_IDS)]] == list(PINNED_IDS)
    # organic tail is score-ordered and unpinned
    tail = rows[len(PINNED_IDS):]
    assert all(r.pin_pos is None for r in tail)
    tfs = [r.tf for r in tail]
    assert tfs == sorted(tfs, reverse=True)


def test_boosting_demotes_but_never_excludes(spark):
    """score must equal pos_tf x negative_boost exactly for demoted docs and
    pos_tf for the rest — and demotion must not drop the doc."""
    rows = q_search_boosting(spark, SF_ORACLE).collect()
    assert rows, "boosting query returned nothing at oracle SF"
    for r in rows:
        expected = r.pos_tf * (NEG_BOOST if r.demoted else 1.0)
        assert r.score == expected, r


def test_dismax_score_bounds(spark):
    """dis_max + tie_breaker lies between max(s) and s1+s2."""
    for r in q_search_dismax(spark, SF_ORACLE).collect():
        mx = max(r.s1, r.s2)
        assert mx <= r.score <= r.s1 + r.s2, r


def test_hybrid_rrf_score_is_rank_reciprocal_sum(spark):
    """Each fused score must reconstruct from the emitted ranks alone."""
    rows = q_search_hybrid_rrf(spark, SF_ORACLE).collect()
    assert rows
    both = 0
    for r in rows:
        expected = 0.0
        if r.r_lex is not None:
            expected += 1.0 / (RRF_K + r.r_lex)
        if r.r_vec is not None:
            expected += 1.0 / (RRF_K + r.r_vec)
        assert r.rrf_score == expected, r
        both += r.r_lex is not None and r.r_vec is not None
    # the fixture produces at least one doc ranked by both sides — the case
    # RRF exists for; if this ever fails the fixture no longer exercises fusion
    assert both >= 1


def test_triplet_mine_labels_and_margin(spark):
    """positive must share the anchor's label, the hard negative must not,
    and the margin must be the exact pos-neg difference."""
    rows = q_sim_triplet_mine(spark, SF_ORACLE).collect()
    assert rows
    labels = {
        r.vec_id: r.label
        for r in table(spark, SF_ORACLE, "embeddings").select("vec_id", "label").collect()
    }
    for r in rows:
        assert labels[r.pos_id] == r.a_label, r
        assert labels[r.neg_id] != r.a_label, r
        assert r.margin == r.pos_cos - r.neg_cos, r
        assert r.pos_id != r.a_id and r.neg_id != r.a_id


def test_percolate_modes_behave_as_declared(spark):
    """'or' queries must fire on either term alone; 'and' must not; 'phrase'
    only on adjacency — checked against a direct Python evaluation of the
    registry over the corpus (both engines share one formulation, so the
    oracle alone can't catch a formulation bug)."""
    from hbase_observer_es_spark.operators.percolate import (
        PERCOLATOR_QUERIES,
        q_search_percolate,
    )

    got = {
        r.query_id: (r.n_matches, r.first_doc_id)
        for r in q_search_percolate(spark, SF_ORACLE).collect()
    }
    docs = [
        (r.doc_id, [t for t in r.text.split(" ") if t])
        for r in table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    ]
    for qid, mode, a, b in PERCOLATOR_QUERIES:
        hits = []
        for doc_id, tk in docs:
            if mode == "and":
                m = a in tk and b in tk
            elif mode == "or":
                m = a in tk or b in tk
            else:
                m = any(x == a and y == b for x, y in zip(tk, tk[1:]))
            if m:
                hits.append(doc_id)
        if hits:
            assert got[qid] == (len(hits), min(hits)), (qid, mode)
        else:
            assert qid not in got, (qid, mode)
