"""Semantics pins for the round-8 surface: invariants the oracle hash alone
doesn't articulate (it would pass equally for a different-but-consistent
implementation pair)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table
from hbase_observer_es_spark.operators.es_extra import (
    LOOKUP_DOC_ID,
    SUGGEST_MAX_EDITS,
    SUGGEST_PROBES,
    SUGGEST_SIZE,
    q_search_suggest_term,
    q_search_terms_lookup,
)
from hbase_observer_es_spark.operators.es_join import (
    HC_MIN_CHILDREN,
    HC_QTY,
    HP_PRIORITY,
    HP_TOTALPRICE,
    q_join_has_child,
    q_join_has_parent,
)
from hbase_observer_es_spark.operators.rescore import (
    RESCORE_WINDOW,
    q_search_rescore,
)
from hbase_observer_es_spark.operators.search import TOP_K

from .conftest import SF_ORACLE


def test_has_child_counts_and_bound(spark):
    """Every returned parent's n_children must equal the true matching-child
    count and respect min_children; no qualifying parent may be missing."""
    rows = {r.o_orderkey: r.n_children for r in q_join_has_child(spark, SF_ORACLE).collect()}
    li = table(spark, SF_ORACLE, "lineitem")
    truth = {
        r.l_orderkey: r.n
        for r in li.filter(F.col("l_quantity") >= HC_QTY)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    expected = {k: v for k, v in truth.items() if v >= HC_MIN_CHILDREN}
    assert rows == expected
    assert all(v >= HC_MIN_CHILDREN for v in rows.values())


def test_has_parent_is_exactly_children_of_matching_parents(spark):
    """has_parent returns each matching parent's children, all of them, and
    nothing whose parent fails the filter — the ES join-field contract."""
    out = q_join_has_parent(spark, SF_ORACLE).collect()
    orders = table(spark, SF_ORACLE, "orders")
    good = {
        r.o_orderkey
        for r in orders.filter(
            (F.col("o_orderpriority") == HP_PRIORITY)
            & (F.col("o_totalprice") > HP_TOTALPRICE)
        ).collect()
    }
    assert out, "selective parent filter matched nothing — fixture drifted"
    assert {r.l_orderkey for r in out} <= good
    li_count = (
        table(spark, SF_ORACLE, "lineitem")
        .filter(F.col("l_orderkey").isin(list(good)))
        .count()
    )
    assert len(out) == li_count  # every child of every matching parent


def test_rescore_top10_is_drawn_from_the_primary_window(spark):
    """Two-phase contract: the final top-10 is sorted by the combined score,
    carries positive primary scores (window membership requires qscore > 0 by
    construction), and every returned doc sits inside the primary
    RESCORE_WINDOW prefix — the rescore may reorder WITHIN the window, never
    reach outside it. The window is rebuilt independently from the DuckDB
    oracle's `win` CTE."""
    import duckdb

    from hbase_observer_es_spark.operators.rescore import SQL_SEARCH_RESCORE

    final = q_search_rescore(spark, SF_ORACLE).collect()
    assert len(final) == TOP_K
    scores = [r.score for r in final]
    assert scores == sorted(scores, reverse=True)
    assert all(r.query_score > 0 for r in final)
    # extract the oracle's window CTE (everything up to the final SELECT) and
    # query the window ids directly
    sql = SQL_SEARCH_RESCORE
    head = sql[: sql.rindex("SELECT doc_id, qscore AS query_score")]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/documents.parquet')"
        )
        window_ids = {
            r[0] for r in con.sql(head + "SELECT doc_id FROM win").fetchall()
        }
    finally:
        con.close()
    assert len(window_ids) <= RESCORE_WINDOW
    assert {r.doc_id for r in final} <= window_ids


def test_suggest_term_candidates_are_close_and_frequency_ranked(spark):
    """Each suggestion must be within the edit budget of its probe, ranks must
    be 1..n ordered by (freq DESC, suggestion ASC), and no probe exceeds
    SUGGEST_SIZE suggestions — the ES suggest.term contract."""
    rows = q_search_suggest_term(spark, SF_ORACLE).collect()
    assert rows, "no suggestions — probes drifted from fixture vocabulary"
    by_probe: dict[str, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe, []).append(r)
    assert set(by_probe) <= set(SUGGEST_PROBES)

    def lev(a: str, b: str) -> int:
        # tiny exact DP — test-side independent implementation
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    for probe, rs_ in by_probe.items():
        rs_.sort(key=lambda r: r.rank)
        assert len(rs_) <= SUGGEST_SIZE
        assert [r.rank for r in rs_] == list(range(1, len(rs_) + 1))
        keys = [(-r.freq, r.suggestion) for r in rs_]
        assert keys == sorted(keys)
        for r in rs_:
            assert lev(r.suggestion, probe) <= SUGGEST_MAX_EDITS, (probe, r)


def test_terms_lookup_counts_shared_distinct_terms(spark):
    """n_shared must equal the exact distinct-token intersection size with the
    lookup document, the lookup doc itself must be absent, and docs with zero
    overlap must be absent."""
    rows = {r.doc_id: r.n_shared for r in q_search_terms_lookup(spark, SF_ORACLE).collect()}
    assert LOOKUP_DOC_ID not in rows
    docs = table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: set(t for t in r.text.split(" ") if t) for r in docs}
    lu = toks[LOOKUP_DOC_ID]
    expected = {
        did: len(ts & lu) for did, ts in toks.items() if did != LOOKUP_DOC_ID and ts & lu
    }
    assert rows == expected


def test_suggest_phrase_is_collate_pruned_and_bigram_ranked(spark):
    """Every suggested phrase must (a) decompose into per-position words
    within the edit budget of the probe, (b) actually occur as a corpus
    bigram with the reported frequency, and (c) be ranked by (freq DESC,
    phrase ASC) with contiguous ranks."""
    from hbase_observer_es_spark.operators.es_extra import (
        PHRASE_PROBE,
        PHRASE_SIZE,
        q_search_suggest_phrase,
    )

    rows = q_search_suggest_phrase(spark, SF_ORACLE).collect()
    assert rows, "no phrase suggestions — probe drifted from fixture vocabulary"
    assert len(rows) <= PHRASE_SIZE
    rows.sort(key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r.freq, r.suggestion) for r in rows]
    assert keys == sorted(keys)
    # independent bigram recount + edit-budget check
    docs = table(spark, SF_ORACLE, "documents").select("text").collect()
    from collections import Counter

    bg = Counter()
    for r in docs:
        tk = [t for t in r.text.split(" ") if t]
        bg.update(f"{a} {b}" for a, b in zip(tk, tk[1:]))
    for r in rows:
        assert bg[r.suggestion] == r.freq, r
        w1, w2 = r.suggestion.split(" ")
        for w, p in ((w1, PHRASE_PROBE[0]), (w2, PHRASE_PROBE[1])):
            m, n = len(w), len(p)
            prev = list(range(n + 1))
            for i in range(1, m + 1):
                cur = [i] + [0] * n
                for j in range(1, n + 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                                 prev[j - 1] + (w[i - 1] != p[j - 1]))
                prev = cur
            assert prev[n] <= 1, (w, p)


def test_range_relation_flags_are_consistent(spark):
    """ES relation algebra: within and contains each imply intersects (every
    returned row), within∧contains iff the ranges are equal — impossible here
    (stored ranges are 30 days, the query range is 60) — and the returned set
    must be exactly the orders whose period overlaps the query range."""
    import datetime as dt

    from hbase_observer_es_spark.operators.es_extra import (
        RANGE_DAYS,
        RANGE_Q_FROM,
        RANGE_Q_TO,
        q_search_range_relation,
    )

    rows = q_search_range_relation(spark, SF_ORACLE).collect()
    assert rows
    qf = dt.date.fromisoformat(RANGE_Q_FROM)
    qt = dt.date.fromisoformat(RANGE_Q_TO)
    for r in rows:
        assert r.r_to == r.r_from + dt.timedelta(days=RANGE_DAYS)
        assert r.r_from < qt and r.r_to > qf  # intersects, by construction
        assert r.is_within == (r.r_from >= qf and r.r_to <= qt)
        assert r.is_contains == (r.r_from <= qf and r.r_to >= qt)
        assert not (r.is_within and r.is_contains)
    o = table(spark, SF_ORACLE, "orders").select(F.to_date("o_orderdate").alias("d")).collect()
    expected = sum(
        1 for r in o if r.d < qt and r.d + dt.timedelta(days=RANGE_DAYS) > qf
    )
    assert len(rows) == expected
