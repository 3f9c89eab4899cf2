"""Edge behavior: pagination continuity, empty-input operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_observer_es_spark.io import table
from hbase_observer_es_spark.operators.cdc import (
    apply_tombstones,
    latest_cell_state,
    merge_documents,
    pivot_cells,
)
from hbase_observer_es_spark.operators.relational_ext import PAGE_SIZE

from .conftest import SF_ORACLE

MUT_SCHEMA = "row_key string, qualifier string, value string, op string, ts timestamp"


def test_keyset_pages_tile_the_total_order(spark):
    """Page 1 (no cursor) + page 2 (cursor = page 1's last row) must equal the
    top-2N of the total order — the invariant that makes keyset pagination a
    correct replacement for OFFSET."""
    o = table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    total = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    page1 = total.limit(PAGE_SIZE).collect()
    last = page1[-1]
    after = (F.col("o_totalprice") < last.o_totalprice) | (
        (F.col("o_totalprice") == last.o_totalprice)
        & (F.col("o_orderkey") > last.o_orderkey)
    )
    page2 = (
        o.filter(after)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(PAGE_SIZE)
        .collect()
    )
    expect = total.limit(2 * PAGE_SIZE).collect()
    assert [tuple(r) for r in page1 + page2] == [tuple(r) for r in expect]


def test_cdc_operators_on_empty_log(spark):
    empty = spark.createDataFrame([], MUT_SCHEMA)
    assert latest_cell_state(empty).count() == 0
    assert apply_tombstones(empty).count() == 0
    assert merge_documents(empty).count() == 0
    assert pivot_cells(empty).count() == 0


def test_delete_only_log(spark):
    import datetime as dt

    only_deletes = spark.createDataFrame(
        [("k", "q", None, "delete", dt.datetime(2024, 1, 1))], MUT_SCHEMA
    )
    assert apply_tombstones(only_deletes).count() == 0


def test_ngram_rep_skips_short_documents(spark, tmp_path):
    """Documents with <2 tokens (incl. empty text) must be filtered BEFORE the
    bigram slice: F.slice with computed length -1 throws at runtime, and the
    DuckDB oracle's WHERE len(tk) >= 2 already excludes these rows. Fixtures
    contain no such docs, so only a synthetic table exercises the guard."""
    from hbase_observer_es_spark.operators.corpus_stats import q_text_ngram_rep

    docs = spark.createDataFrame(
        [
            (1, "", "en", "synth", 0),
            (2, "solo", "en", "synth", 4),
            (3, "a b a b", "en", "synth", 7),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in q_text_ngram_rep(spark, str(tmp_path)).collect()}
    assert set(rows) == {3}  # 0- and 1-token docs dropped, not thrown on
    assert rows[3].n_bigrams == 3 and rows[3].top_count == 2


def test_normalize_constant_frame_emits_null(spark, tmp_path):
    """min-max rescale over a bucket frame where every bucket is equal:
    Spark's 0.0/0.0 is NaN but DuckDB's is NULL, so the division must be
    guarded to NULL on both engines (ADVICE r5). One-day fixture → max==min."""
    import datetime as dt

    from hbase_observer_es_spark.operators.es_aggs_stats import q_agg_normalize

    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 8), 1, "view", 2.5, "{}"),
            (2, dt.datetime(2024, 1, 1, 9), 2, "view", 1.5, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    events.write.parquet(str(tmp_path / "events.parquet"))
    rows = q_agg_normalize(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].norm_value is None  # NULL, not NaN


def test_simhash_near_banding_is_exact(spark):
    """Pigeonhole guarantee: 4 bands over the 60-bit fingerprint find EVERY
    pair with Hamming ≤ 3 — compare against brute-force all-pairs xor."""
    from itertools import combinations

    from hbase_observer_es_spark.operators.dedup import (
        HAM_MAX,
        _simhash_wide,
        q_dedup_simhash_near,
    )
    from .conftest import SF_ORACLE

    fps = {r.doc_id: r.simhash for r in _simhash_wide(spark, SF_ORACLE).collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= HAM_MAX
    }
    banded = {
        (r.a_id, r.b_id) for r in q_dedup_simhash_near(spark, SF_ORACLE).collect()
    }
    assert banded == brute


def test_bucketed_tables_reused_from_disk(spark):
    """Fresh-session reuse: dropping the catalog entries (keeping files) must
    re-register the bucketed copies as external tables, not rewrite them —
    and the join result must be unchanged."""
    from hbase_observer_es_spark.operators.scale_joins import q_join_bucketed
    from .conftest import SF_ORACLE

    first = sorted(tuple(r) for r in q_join_bucketed(spark, SF_ORACLE).collect())
    tables = [
        t.name for t in spark.catalog.listTables("bucketdemo") if "_b_" in t.name
    ]
    assert tables, "bucketed tables should be registered"
    mtimes = {}
    from hbase_observer_es_spark.sources.filestream import SCRATCH
    import os

    for t in tables:
        loc = SCRATCH / "warehouse" / t
        mtimes[t] = os.stat(loc / "_SUCCESS").st_mtime_ns
        spark.sql(f"DROP TABLE bucketdemo.{t}")  # catalog gone, files stay

    again = sorted(tuple(r) for r in q_join_bucketed(spark, SF_ORACLE).collect())
    assert again == first
    for t in tables:
        loc = SCRATCH / "warehouse" / t
        assert os.stat(loc / "_SUCCESS").st_mtime_ns == mtimes[t], "files rewritten"


def test_tracked_persist_does_not_accumulate(spark):
    """Re-invoking a query whose internal frame is persist_tracked releases the
    previous invocation's cache — a long session (bench harness runs 86 queries
    back-to-back) stays bounded at one live frame per call site."""
    from hbase_observer_es_spark.operators.dedup import q_dedup_minhash

    def n_cached() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    q_dedup_minhash(spark, SF_ORACLE).collect()
    first = n_cached()
    q_dedup_minhash(spark, SF_ORACLE).collect()
    q_dedup_minhash(spark, SF_ORACLE).collect()
    assert n_cached() <= first


def test_chunking_covers_every_token_exactly_by_stride(spark):
    """Chunk invariants on the real corpus: chunks start at 1, 1+stride, ...;
    every chunk has 1..CHUNK_TOKENS tokens; concatenating each doc's chunk
    STARTS reconstructs the arithmetic progression (no gap, no dup)."""
    from hbase_observer_es_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        q_text_chunk,
    )

    rows = q_text_chunk(spark, SF_ORACLE).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        assert 1 <= r.n_tokens <= CHUNK_TOKENS
        assert (r.start - 1) % CHUNK_STRIDE == 0
        assert r.chunk_id == (r.start - 1) // CHUNK_STRIDE
        by_doc.setdefault(r.doc_id, []).append(r.start)
    for starts in by_doc.values():
        starts.sort()
        assert starts == list(range(1, starts[-1] + 1, CHUNK_STRIDE))


def test_packing_bins_respect_running_capacity(spark):
    """pack_id must be the floor of the preceding cumulative token count over
    capacity — bins are contiguous in doc_id order and never skip."""
    from hbase_observer_es_spark.operators.pipeline import PACK_CAPACITY, q_text_pack

    rows = sorted(q_text_pack(spark, SF_ORACLE).collect(), key=lambda r: r.doc_id)
    cum = 0
    for r in rows:
        assert r.pack_id == cum // PACK_CAPACITY
        assert r.pack_offset == cum % PACK_CAPACITY
        cum += r.n_tokens


def test_mixture_weights_sum_to_one(spark):
    """Tempered weights are a distribution, and tempering must flatten: the
    largest language's weight shrinks vs its raw share, the smallest grows."""
    from hbase_observer_es_spark.operators.pipeline import q_mixture_weights

    rows = q_mixture_weights(spark, SF_ORACLE).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-9
    big = max(rows, key=lambda r: r.n_tokens)
    small = min(rows, key=lambda r: r.n_tokens)
    assert big.weight < big.share and small.weight > small.share


def test_adjacency_counts_are_consistent(spark):
    """Pairwise intersection counts can never exceed either single-filter
    count (ES adjacency_matrix invariant)."""
    from hbase_observer_es_spark.operators.es_aggs import q_agg_adjacency

    n = {r.key: r.n for r in q_agg_adjacency(spark, SF_ORACLE).collect()}
    for pair, parts in {k: k.split("&") for k in n if "&" in k}.items():
        assert n[pair] <= min(n[parts[0]], n[parts[1]])


def test_autodatehist_respects_target(spark):
    """The chosen interval must keep the bucket count at or under the target,
    and all buckets must share ONE interval."""
    from hbase_observer_es_spark.operators.es_aggs import (
        AUTO_HIST_TARGET,
        q_agg_autodatehist,
    )

    rows = q_agg_autodatehist(spark, SF_ORACLE).collect()
    assert 0 < len(rows) <= AUTO_HIST_TARGET
    assert len({r.interval_us for r in rows}) == 1


def test_mm_oracle_ascii_equivalence():
    """The q_mm_decode fake codec reads the payload's first BYTE while its
    DuckDB oracle reads the first CHARACTER's codepoint (ascii()), and n_bytes
    vs n_chars likewise — equivalent ONLY while the documents fixture is pure
    ASCII. Pin that precondition here so a fixture refresh cannot silently
    invalidate the oracle (multimodal.py module docstring, round-4 verdict #3)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            "SELECT COUNT(*) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} non-ASCII documents break the q_mm_decode oracle"


def test_gopher_zero_token_document(spark, tmp_path):
    """A zero-token document makes the mean-len/uniq ratios 0/0: under Spark's
    ANSI mode an unguarded division throws DIVIDE_BY_ZERO at runtime, and
    DuckDB would emit NULL — so both ratio rules (bits 4, 8) are gated behind
    n_tok > 0 on both engines (ADVICE r6). Fixtures contain no empty docs, so
    only a synthetic table exercises the guard. The empty doc must fail ONLY
    the min-tokens rule (bit 1)."""
    import duckdb

    from hbase_observer_es_spark.operators.splits import SQL_TEXT_GOPHER, q_text_gopher

    docs = spark.createDataFrame(
        [
            (1, "", "en", "synth", 0),
            (2, "hello world", "en", "synth", 11),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    srows = sorted(tuple(r) for r in q_text_gopher(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orows = sorted(con.sql(SQL_TEXT_GOPHER).fetchall())
    assert srows == orows
    (row,) = srows
    # lang=en, 2 docs, 0 kept; both fail bit 1 (0 and 2 tokens < 30); bit 4
    # fails only for "hello world" (mean 5.0 > 4.9) — the empty doc's ratio
    # rules are NULL-gated, so it contributes to neither bit 4 nor bit 8
    assert row == ("en", 2, 0, 2, 0, 1, 0)
