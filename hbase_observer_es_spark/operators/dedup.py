"""Deduplication suite for LLM-data pipelines over `documents` (north-star).

Four levels, all UDF-free (higher-order functions inside whole-stage codegen):

* exact           — hash-groupBy on content (q_dedup_exact)
* exact-similarity— all-pairs token-set Jaccard (q_dedup_jaccard): the ground truth,
                    quadratic — only viable inside small buckets
* MinHash + LSH   — q_dedup_minhash: shingle → k minhashes → band → bucket-join →
                    verify. THE 100 TB path: candidate generation is a shuffle on
                    band signatures (linear), verification only touches candidates.
* SimHash         — q_dedup_simhash: 16-bit frequency-weighted fingerprint per doc;
                    equal fingerprints ⇒ near-dup buckets.

Shingle note: the fixture vocabulary is tiny (~31 words), which makes unigram
token sets non-discriminative (random docs reach Jaccard 0.9). q_dedup_jaccard
keeps token-set semantics as the exact baseline; q_dedup_minhash shingles on word
TRIGRAMS (order-sensitive, high-cardinality) — the standard web-dedup choice, and
the only one whose LSH buckets stay small on low-entropy text.

All hashes are an engine-neutral polynomial rolling hash (base 31 mod 1e9+7) so the
DuckDB oracle can mirror the *entire* LSH pipeline, not just the final answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, persist_tracked, table
from .graph import min_label_fixpoint
from .text import MOD

# 16 fixed universal-hash permutations (a*h + b) mod MOD, 4 bands × 4 rows.
PERM_A = (3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59)
PERM_B = (7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67)
N_BANDS, BAND_ROWS = 4, 4
JACCARD_THRESHOLD = 0.9


# ---------------------------------------------------------------------------
# shared expressions (Spark) and SQL fragments (DuckDB) — kept side by side so
# the two pipelines cannot drift.
# ---------------------------------------------------------------------------


def _tok_set() -> Column:
    return F.array_distinct(F.split(F.col("text"), " "))


_SQL_TOK_SET = "list_distinct(string_split(text, ' '))"


def _rollhash(c: Column) -> Column:
    """Polynomial rolling hash of one token — nested fold over its characters."""
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(31) + x) % F.lit(MOD),
    )


_SQL_ROLLHASH = (
    "list_reduce(list_transform(string_split({tok}, ''), "
    "c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc * 31 + c) % " + str(MOD) + ")"
)


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


_SQL_JACCARD = (
    "CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# q_dedup_exact
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text. One shuffle on the
    content hash; at 100 TB group on md5(text) instead of raw text to bound key
    width (same plan shape)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


SQL_DEDUP_EXACT = """
SELECT doc_id, lang, source, n_chars
FROM (
    SELECT doc_id, lang, source, n_chars,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
    FROM documents
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# token dictionary + bitset encoding (the fast exact-set representation)
# ---------------------------------------------------------------------------


N_ID_BUCKETS = 32  # parallelism of dense-id assignment; any value works


def _bitset_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encode each document's token set into fixed-width bitmask words.

    vocab (distinct tokens) gets dense ids in [0, V) WITHOUT a global
    single-partition sort: tokens hash into N_ID_BUCKETS buckets, each bucket
    row_numbers its tokens in parallel (per-bucket windows), and the per-bucket
    counts — N_ID_BUCKETS integers, driver-side metadata, never data — turn
    into prefix-sum offsets so ``tid = offset[bucket] + local_id``. The widest
    bucket bounds the critical path at any vocabulary size (a billion-term web
    vocab spreads over the buckets instead of serializing through one task).
    Any bijective token→id map works — only SET identity matters downstream.

    Each doc then aggregates ``1 << (tid % 64)`` per word with bit_or. Set
    intersection/union become bit_count(a & b) — O(words) per pair instead of
    O(|set|) array ops. Dictionary encoding like this is exactly what you'd do
    at 100 TB (the dict is a broadcastable dim; huge vocabs would shard it or
    fall back to MinHash).
    """
    # fan_out measured SLOWER here (r17 gate A/B: 2.31 -> 2.76 s median) —
    # the encode pipeline's branches each pay the spread shuffle while the
    # head() cache already bounds the serial part; left unspread.
    d = table(spark, sf_dir, "documents").select("doc_id", _tok_set().alias("tk"))
    toks = d.select(F.explode("tk").alias("t")).filter(F.col("t") != "").distinct()
    tb = toks.withColumn(
        "bkt", F.pmod(F.xxhash64("t"), F.lit(N_ID_BUCKETS)).cast("int")
    )
    counts = {
        r["bkt"]: r["n"]
        for r in tb.groupBy("bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for k in range(N_ID_BUCKETS):
        offsets.append((k, acc))
        acc += counts.get(k, 0)
    vocab_size = acc
    n_words = max(1, -(-vocab_size // 64))
    w = Window.partitionBy("bkt").orderBy("t")  # per-bucket, runs in parallel
    off_df = spark.createDataFrame(offsets, "bkt int, off int")
    vocab = (
        tb.withColumn("lid", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "bkt")
        .select("t", (F.col("off") + F.col("lid")).alias("tid"))
    )
    exploded = d.select("doc_id", F.explode("tk").alias("t")).filter(F.col("t") != "")
    with_ids = exploded.join(F.broadcast(vocab), "t")
    word_aggs = [
        F.expr(
            f"bit_or(CASE WHEN tid >= {wi * 64} AND tid < {(wi + 1) * 64} "
            f"THEN CAST(1 AS BIGINT) << (tid % 64) ELSE CAST(0 AS BIGINT) END)"
        ).alias(f"w{wi}")
        for wi in range(n_words)
    ]
    enc = with_ids.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("sz"), *word_aggs
    )
    return enc.withColumn("n_words", F.lit(n_words))


def _bitset_pair_jaccard(n_words: int) -> Column:
    inter = None
    for wi in range(n_words):
        c = F.bit_count(F.col(f"a_w{wi}").bitwiseAND(F.col(f"b_w{wi}")))
        inter = c if inter is None else inter + c
    union = F.col("a_sz") + F.col("b_sz") - inter
    return inter.cast("double") / union.cast("double")


def _pair_frames(enc: DataFrame, n_words: int) -> tuple[DataFrame, DataFrame]:
    a = enc.select(
        F.col("doc_id").alias("a_id"), F.col("sz").alias("a_sz"),
        *[F.col(f"w{wi}").alias(f"a_w{wi}") for wi in range(n_words)],
    )
    b = enc.select(
        F.col("doc_id").alias("b_id"), F.col("sz").alias("b_sz"),
        *[F.col(f"w{wi}").alias(f"b_w{wi}") for wi in range(n_words)],
    )
    return a, b


# ---------------------------------------------------------------------------
# q_dedup_jaccard — exact all-pairs ground truth
# ---------------------------------------------------------------------------


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs (≥ 0.9), bitset-accelerated.

    Two exact prunes before any per-pair set math:
    * size-ratio prune IN the join condition: J(A,B) ≥ t forces
      min(|A|,|B|) ≥ t·max(|A|,|B|) — provably no false negatives;
    * bitset jaccard (bit_count over dictionary words) for surviving pairs —
      identical integer counts to array intersect/union, so the DuckDB oracle
      (which uses list ops) matches bit-for-bit.
    """
    # persist: the encoded frame feeds BOTH sides of the pair self-join, and
    # the n_words head() below doubles as its materialization — without the
    # persist the dictionary-encode pipeline re-executes per join branch
    # (measured 2.3s -> 1.0s at sf0.1)
    enc = persist_tracked(_bitset_docs(spark, sf_dir), "dedup.jaccard.enc")
    n_words = enc.select("n_words").head()[0]
    a, b = _pair_frames(enc, n_words)
    size_ok = (
        F.least(F.col("a_sz"), F.col("b_sz")).cast("double")
        >= F.lit(JACCARD_THRESHOLD) * F.greatest(F.col("a_sz"), F.col("b_sz"))
    )
    j = _bitset_pair_jaccard(n_words)
    return (
        a.join(b, (F.col("a_id") < F.col("b_id")) & size_ok)
        .select("a_id", "b_id", j.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


SQL_DEDUP_JACCARD = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOK_SET} AS tk FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       {_SQL_JACCARD.format(a='a.tk', b='b.tk')} AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE {_SQL_JACCARD.format(a='a.tk', b='b.tk')} >= {JACCARD_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# q_dedup_minhash — MinHash + LSH banding, then exact verification
# ---------------------------------------------------------------------------


def _minhash_cols() -> list[Column]:
    # one F.expr per permutation instead of per-literal Column composition:
    # same array_min(transform(...)) Catalyst tree (integer math, exact), a
    # dozen py4j round trips instead of ~250 per plan build (r16, guide §5)
    return [
        F.expr(
            f"array_min(transform(hs, h -> ({pa} * h + {pb}) % {MOD}))"
        ).alias(f"mh{i}")
        for i, (pa, pb) in enumerate(zip(PERM_A, PERM_B))
    ]


SHINGLE_N = 3


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, hs): distinct word-trigram shingle hashes, as pure int64 math.

    Each token is char-folded to a rolling hash ONCE; a shingle hash is then a
    3-element integer fold over consecutive token hashes ((acc*31 + h) % MOD).
    The token-hash array is hoisted into its OWN projection: an expression nested
    inside the shingle lambda would be re-evaluated for every shingle index
    (lambda bodies get no subexpression reuse), which profiled 8× slower; as a
    multi-referenced named column, CollapseProject keeps it computed once per row.
    slice() clips at the sequence end, so docs shorter than SHINGLE_N tokens
    degrade to one shorter shingle instead of erroring — mirrored in SQL.

    fan_out (r17): the tokenize+rollhash+shingle fold is this frame's
    compute, and over the sub-split fixture scan it ran in ONE task; the
    gated spread parallelizes the materialization for every consumer
    (minhash, clusters, jaccard-eval truth).
    """
    d = fan_out(table(spark, sf_dir, "documents"))
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    th_df = d.select("doc_id", F.transform(toks, _rollhash).alias("th"))
    th = F.col("th")
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(th) - (SHINGLE_N - 1), F.lit(1))
    )
    shingle = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(th, i, SHINGLE_N),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * F.lit(31) + x) % F.lit(MOD),
        ),
    )
    return th_df.select("doc_id", F.array_distinct(shingle).alias("hs"))


# expects {th} = a column of per-token rolling hashes (list_transform + rollhash);
# list_reduce has no init arg but f(h1, h2) == fold-from-0 since 0*31 + h1 = h1.
_SQL_SHINGLE_HASHES = (
    "list_distinct(list_transform("
    "  generate_series(1, greatest(len({th}) - 2, 1)),"
    f"  i -> list_reduce({{th}}[i:i+2], (acc, x) -> (acc * 31 + x) % {MOD})))"
)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs over word-trigram shingles, ≥ 0.9 Jaccard.

    Pipeline: trigram shingle set → rolling hash per shingle → 16 permuted
    minhashes → 4 bands of 4 → shuffle on (band, signature) → candidate pairs
    from shared buckets → size-ratio prune → exact shingle-Jaccard verify on
    candidates only.

    Scale notes (the 100 TB plan):
    * candidate generation is linear — one shuffle keyed on band signature;
    * the pair join carries ONLY (doc_id, doc_id); shingle arrays are attached
      after dropDuplicates via joins on the (small) per-doc shingle frame, so
      the widest rows never ride through the pair-dedup shuffle;
    * the size-ratio prune (min ≥ t·max) is exact — no false negatives;
    * trigram shingles keep buckets discriminative even on low-entropy text
      (unigram sets over a 31-word vocab put 77% of docs in one bucket).
    """
    # the shingle frame feeds FOUR plan branches (both sides of the bucket
    # self-join and both verify joins); unpersisted, the shingle+rollhash
    # pipeline re-executes per branch (measured ~1.1s/run at sf0.1). One
    # (doc_id, hs) row per doc — MEMORY_AND_DISK-safe at fixture scale; at
    # 100 TB you'd materialize it to a table once per corpus snapshot instead.
    d = persist_tracked(_shingled_docs(spark, sf_dir), "dedup.minhash.shingles")
    minh = d.select("doc_id", *_minhash_cols())
    band_structs = [
        F.struct(
            F.lit(bi).alias("band_id"),
            F.concat_ws(
                "-", *[F.col(f"mh{bi * BAND_ROWS + r}") for r in range(BAND_ROWS)]
            ).alias("sig"),
        )
        for bi in range(N_BANDS)
    ]
    bands = minh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("doc_id", "band.band_id", "band.sig")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    hs = d.select("doc_id", "hs", F.size("hs").alias("sz"))
    pairs = (
        cand.join(hs.select(F.col("doc_id").alias("a_id"),
                            F.col("hs").alias("a_hs"),
                            F.col("sz").alias("a_sz")), "a_id")
        .join(hs.select(F.col("doc_id").alias("b_id"),
                        F.col("hs").alias("b_hs"),
                        F.col("sz").alias("b_sz")), "b_id")
        .filter(
            F.least(F.col("a_sz"), F.col("b_sz")).cast("double")
            >= F.lit(JACCARD_THRESHOLD) * F.greatest(F.col("a_sz"), F.col("b_sz"))
        )
    )
    j = _jaccard(F.col("a_hs"), F.col("b_hs"))
    return (
        pairs.select("a_id", "b_id", j.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _sql_minhash_pipeline() -> str:
    mh_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({pa} * h + {pb}) % {MOD})) AS mh{i}"
        for i, (pa, pb) in enumerate(zip(PERM_A, PERM_B))
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, hs, {bi} AS band_id, {sig} AS sig FROM minh".format(
            bi=bi,
            sig=" || '-' || ".join(
                f"CAST(mh{bi * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
            ),
        )
        for bi in range(N_BANDS)
    )
    return f"""
WITH toksf AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), t -> t <> '') AS tk
               FROM documents),
thash AS (SELECT doc_id,
                 list_transform(tk, t -> {_SQL_ROLLHASH.format(tok='t')}) AS th
          FROM toksf),
shing AS (SELECT doc_id, {_SQL_SHINGLE_HASHES.format(th='th')} AS hs FROM thash),
minh AS (SELECT doc_id, hs, {mh_exprs} FROM shing),
bands AS ({band_selects}),
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.hs AS a_hs, b.hs AS b_hs
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, {_SQL_JACCARD.format(a='a_hs', b='b_hs')} AS jaccard
FROM cand
WHERE {_SQL_JACCARD.format(a='a_hs', b='b_hs')} >= {JACCARD_THRESHOLD}
"""


SQL_DEDUP_MINHASH = _sql_minhash_pipeline()


# ---------------------------------------------------------------------------
# q_dedup_simhash — 16-bit frequency-weighted fingerprint
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per token-occurrence hash, each bit votes ±1 weighted by term
    frequency; fingerprint bit b = 1 iff the vote sum is positive. Near-dup docs
    land on fingerprints within small Hamming distance; equal fingerprints form
    dedup buckets directly. One explode + one groupBy — linear, map-side combined."""
    # fan_out measured NEUTRAL here (r17 gate A/B 0.99 vs 1.02 s) and the
    # single-exchange shape is pinned (test_simhash_is_one_explode_one_agg)
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    hashed = tok.select("doc_id", _rollhash(F.col("t")).alias("h"))
    # expr-text vote/fingerprint builders: identical sum(CASE)/CASE chains to
    # the former per-bit Column composition, built in 16+1 py4j calls instead
    # of ~500 (r16 plan-build measurement, guide §5)
    votes = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    fp = F.expr(
        " + ".join(
            f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(SIMHASH_BITS)
        )
    )
    return agg.select("doc_id", fp.cast("bigint").alias("simhash"))


def _sql_simhash() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
hashed AS (
    SELECT doc_id, {_SQL_ROLLHASH.format(tok='t')} AS h FROM tok WHERE t <> ''
),
agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg
"""


SQL_DEDUP_SIMHASH = _sql_simhash()


# ---------------------------------------------------------------------------
# q_dedup_simhash_near — Hamming-distance neighborhoods via bit-banding
# ---------------------------------------------------------------------------

NEAR_BITS = 60  # wide fingerprint for banding; see entropy note in _simhash_wide
HAM_BANDS, HAM_BAND_BITS, HAM_MAX = 4, 15, 3
# second universal hash extending the 30-bit rolling hash to 60 usable bits
_H2_A, _H2_B = 1_000_003, 12345


def _simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 60-bit frequency-weighted SimHash.

    The 16-bit fingerprint q_dedup_simhash buckets on is far too narrow for
    Hamming BANDING — 4-bit band values put ~1/16 of the whole corpus in every
    bucket, and candidate generation degenerates toward all-pairs (measured
    ~10× the corpus-linear cost at sf0.1). Width is what makes SimHash LSH
    work; production uses 64 bits. The rolling token hash only carries ~30 bits
    of entropy (mod 1e9+7), so bits 30..59 vote from a second universal hash
    h2 = (a·h1 + b) mod M — independent in the same sense as the MinHash
    permutation family above.
    """
    d = fan_out(table(spark, sf_dir, "documents"))  # r17: spread the tokenize
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    hashed = tok.select("doc_id", _rollhash(F.col("t")).alias("h1")).withColumn(
        "h2", (F.lit(_H2_A) * F.col("h1") + F.lit(_H2_B)) % F.lit(MOD)
    )
    # expr-text vote/fingerprint builders (see q_dedup_simhash): identical
    # trees, 60+1 py4j calls instead of ~1 700 per plan build (r16, guide §5)
    def _vote(b: int) -> Column:
        src, off = ("h1", b) if b < 30 else ("h2", b - 30)
        return F.expr(
            f"sum(CASE WHEN (shiftright({src}, {off}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"v{b}")

    agg = hashed.groupBy("doc_id").agg(*[_vote(b) for b in range(NEAR_BITS)])
    fp = F.expr(
        " + ".join(
            f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(NEAR_BITS)
        )
    )
    return agg.select("doc_id", fp.cast("bigint").alias("simhash"))


def _sql_simhash_wide() -> str:
    votes = ", ".join(
        "SUM(CASE WHEN ({src} >> {off}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}".format(
            src="h1" if b < 30 else "h2", off=b if b < 30 else b - 30, b=b
        )
        for b in range(NEAR_BITS)
    )
    fp = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(NEAR_BITS)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
h1s AS (
    SELECT doc_id, {_SQL_ROLLHASH.format(tok='t')} AS h1 FROM tok WHERE t <> ''
),
hashed AS (SELECT doc_id, h1, ({_H2_A} * h1 + {_H2_B}) % {MOD} AS h2 FROM h1s),
agg AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg
"""


def q_dedup_simhash_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs whose SimHash fingerprints differ in ≤ HAM_MAX bits —
    the Hamming neighborhood q_dedup_simhash's equal-fingerprint buckets miss.

    Same LSH shape as MinHash banding, applied to BITS: split the 60-bit
    fingerprint (_simhash_wide) into 4 bands of 15 bits and bucket-join per
    band. Pigeonhole makes this EXACT for d ≤ 3: a pair differing in ≤ 3 bits
    must agree on at least one of the 4 bands, so every qualifying pair
    surfaces as a candidate; `bit_count(xor) ≤ d` then verifies candidates
    only. Candidate generation is one shuffle on (band, 15-bit value) — linear
    in docs, and 2^15 band values keep buckets near-singleton so the candidate
    set stays ~|true pairs|. The banding itself is the SHARED implementation
    in ``operators/hammingband.py`` (same one imagehash/audiohash use).
    """
    # ONE banded-hamming implementation repo-wide: delegate to
    # hammingband.hash_near_dups (the parameterized explode/bucket-join/
    # bit_count shape imagehash + audiohash already share). It persists the
    # fingerprint frame before the self-join (the frame feeds both sides),
    # so the explode+60-vote agg runs once. 60-bit fingerprints are
    # non-negative, so the shared unsigned band shift is bit-identical to
    # the signed shift this site used before consolidating.
    from .hammingband import hash_near_dups

    pairs = hash_near_dups(
        _simhash_wide(spark, sf_dir),
        hash_col="simhash",
        id_col="doc_id",
        threshold=HAM_MAX,
        persist_key="dedup.simhash.fps",
        n_bands=HAM_BANDS,
        band_bits=HAM_BAND_BITS,
    )
    return pairs.select(
        "a_id", "b_id", F.col("hamming").cast("int").alias("hamming")
    )


SQL_DEDUP_SIMHASH_NEAR = f"""
WITH fps AS ({_sql_simhash_wide().strip()}),
bands AS (
    SELECT doc_id,
           b.band_id,
           (simhash >> (b.band_id * {HAM_BAND_BITS})) & {(1 << HAM_BAND_BITS) - 1} AS band_val
    FROM fps, (SELECT unnest(range({HAM_BANDS})) AS band_id) b
),
cand AS (
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT c.a_id, c.b_id,
       CAST(bit_count(xor(fa.simhash, fb.simhash)) AS INTEGER) AS hamming
FROM cand c
JOIN fps fa ON c.a_id = fa.doc_id
JOIN fps fb ON c.b_id = fb.doc_id
WHERE bit_count(xor(fa.simhash, fb.simhash)) <= {HAM_MAX}
"""


# ---------------------------------------------------------------------------
# q_dedup_clusters — connected components over the near-dup pair graph
# ---------------------------------------------------------------------------


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components of the MinHash pair graph, by
    iterative min-label propagation — the Spark iterative-algorithm pattern.

    Pair lists (q_dedup_minhash) overcount: A~B and B~C may be one duplicate
    group. Components give the dedup unit directly; the cluster representative
    (min doc_id) is the survivor. The fixpoint itself is
    ``graph.min_label_fixpoint`` (the single shared implementation since the
    round-11 consolidation — see its docstring for the loop mechanics,
    lineage discipline, and the large-star/small-star scale note); this
    query's job is the edge frame and the loop-width tuning around it.

    Oracle: recursive-CTE transitive closure in DuckDB — same fixpoint, so the
    iterative result is hash-checked, not rows-only.
    """
    # persist the DIRECTED pair frame and count it BEFORE building the
    # bidirectional union: the count materializes the cache, so the whole
    # MinHash pipeline executes exactly once — an unpersisted union would
    # evaluate its two branches (each containing the full pipeline) separately
    # during edge materialization (measured ~0.5 s at sf0.1).
    pairs = q_dedup_minhash(spark, sf_dir).select("a_id", "b_id").persist()
    n_pairs = pairs.count()
    # the iterating frames are edge-count sized (tiny next to the corpus) — run
    # the loop at a shuffle width sized to the EDGE COUNT, not the corpus: near-
    # dup graphs are tiny relative to their corpus (248 pairs for 60 k docs at
    # sf0.1), and every extra partition is a per-iteration task-launch tax.
    # ~100 k edges per partition is the scale heuristic; a 10-billion-edge run
    # gets the wide shuffle it needs from the same line. The width is applied
    # PER-FRAME via explicit repartition-by-key inside min_label_fixpoint
    # (same task counts as a session-conf override, but scoped to this
    # query's plan — a concurrent query on the same session never sees a
    # degraded shuffle width). Pre-partitioning the symmetrized frame on
    # ``dst`` lets the loop's join reuse the cached distribution.
    loop_parts = max(1, min(32, (2 * n_pairs) // 100_000))
    sym = (
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(
            pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
        )
        .repartition(loop_parts, "dst")
        .persist()
    )
    # max_iter=100 is the fail-loud diameter bound (near-dup graphs cluster
    # densely; the fixture diameters are single-digit)
    labels = min_label_fixpoint(sym, loop_parts=loop_parts, max_iter=100)
    sym.unpersist()
    d = table(spark, sf_dir, "documents").select("doc_id")
    out = (
        d.join(labels, d.doc_id == labels.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    result = out.withColumn(
        "is_survivor", (F.col("doc_id") == F.col("cluster_id")).cast("boolean")
    )
    pairs.unpersist()
    return result


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({SQL_DEDUP_MINHASH.strip().rstrip()}),
edges AS (
    SELECT a_id AS u, b_id AS v FROM pairs
    UNION ALL
    SELECT b_id AS u, a_id AS v FROM pairs
),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
    SELECT u AS node, LEAST(u, MIN(v)) AS label FROM reach GROUP BY u
)
SELECT d.doc_id,
       COALESCE(l.label, d.doc_id) AS cluster_id,
       (d.doc_id = COALESCE(l.label, d.doc_id)) AS is_survivor
FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
"""


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_jaccard": q_dedup_jaccard,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_simhash_near": q_dedup_simhash_near,
    "q_dedup_clusters": q_dedup_clusters,
}

ORACLES = {
    "q_dedup_exact": SQL_DEDUP_EXACT,
    "q_dedup_jaccard": SQL_DEDUP_JACCARD,
    "q_dedup_minhash": SQL_DEDUP_MINHASH,
    "q_dedup_simhash": SQL_DEDUP_SIMHASH,
    "q_dedup_simhash_near": SQL_DEDUP_SIMHASH_NEAR,
    "q_dedup_clusters": SQL_DEDUP_CLUSTERS,
}
