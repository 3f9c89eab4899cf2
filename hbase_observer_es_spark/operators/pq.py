"""Product quantization (PQ) — compressed vector codes + ADC search.

``q_embed_quant`` (``operators/similarity.py``) ships the 4×-compression
int8 export; production vector systems go much further with PRODUCT
quantization (Jégou et al. 2011, the Faiss ``PQ``/``IVF,PQ`` workhorse):
split each D-dim vector into M contiguous subvectors, learn a K-centroid
codebook PER subspace, and store each vector as M small codes — at
``M=8, K=128`` (or ``M=7, K=256``) a 64-dim float32 vector becomes one
8-byte int64 (32× smaller; the classic unsigned ``M=8, K=256`` byte layout
needs one more bit than Spark's SIGNED bigint holds, and ``_check_mk``
rejects it loudly rather than overflow), and
similarity search runs directly over the codes via asymmetric distance
computation (ADC): per probe, precompute the M×K table of
probe-subvector→centroid distances, then every stored vector's distance is
just M table lookups summed.

This module is the deterministic PySpark form of all three pieces:

* ``pq_train`` — per-subspace Lloyd's k-means with the SAME zero-RNG
  discipline as ``similarity.train_centroids`` (Knuth-hash seed ranking,
  fold-exact distance math, bounded per-iteration collect of the M·K
  codebook rows), run over all M subspaces AT ONCE: one explode to
  (vec_id, sub, subvec) rows, each iteration one broadcast join + one
  argmin agg + one mean agg, shuffles carrying one row per (vector,
  subspace). PQ codebooks are conventionally trained on a bounded sample
  (Faiss trains on ~100k vectors) — pass a sampled frame for the 100 TB
  corpus; encoding scales independently of training.
* ``pq_encode`` — assign each subvector to its nearest codeword and pack
  the M codes into ONE int64 column (any ``M ≤ 8, K ≤ 256`` whose pack
  fits a signed 64-bit word): scalar-only
  output per the engine's hash contract, 8 bytes per vector on disk, and
  the pack is pure integer math (``Σ codeᵢ·256ⁱ``) so codes round-trip
  exactly. One broadcast join + one map-side-reduced groupBy(vec_id).
* ``pq_adc_topk`` — the serving path: unpack each code with shift/mod
  integer math, join the M·K broadcast distance table, sum M lookups per
  vector, ``TakeOrdered`` the top-K under a TOTAL (distance, vec_id)
  ordering. No full-vector math touches the corpus side at query time —
  that is the entire point of PQ.

Determinism: no RNG anywhere (seeding ranks vectors by the Knuth
multiplicative hash ``(vec_id·2654435761) mod 2³²`` per subspace); mean
updates are decimal-exact element-wise (the ``similarity._cell_means``
rule), so training is independent of partitioning and rerun-stable;
distances are sequential left folds (``F.aggregate``), so — given a fixed
codebook — a pure-Python sequential-fold model reproduces every encode
and ADC value BIT-EXACTLY. All pinned by ``tests/test_pq.py``. Ties (equidistant codewords) break to the lowest
code id, totally ordered.

Scale posture: the codebook is M·K rows (≤2048 at the operating point) —
always broadcastable; encode's only shuffle keys on vec_id with map-side
partial aggregation; ADC's per-probe table is M·K rows built corpus-free.
The classic IVF,PQ composition is implemented: ``pq_ivf_index`` marries
the trained full-vector cells with the packed codes, and ``pq_ivfadc_topk``
routes a probe to its ``nprobe`` nearest cells and runs ADC only over
those cells' 8-byte codes — with ``nprobe`` = all cells it equals flat ADC
exactly (pinned), so the IVF layer provably prunes without rescoring.

Not registry-checked this round (the round-10 verification window is
full); registration-ready: encode/ADC are SQL-expressible over a
materialized codebook the same way ``q_sim_ivf_trained`` replays its
centroids, and the tests already run the pure-model mirror the oracle
would. Reference parity note: the reference (HbaseDataSyncEsObserver.java)
has no vector surface at all — this is LLM-pipeline capability.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import SEED_MOD, SEED_MULT

PQ_M = 4          # subspaces
PQ_K = 16         # codewords per subspace
PQ_ITERS = 2      # Lloyd iterations (matches KMEANS_ITERS)
_PACK_BASE = 256  # per-code radix in the packed int64


def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² as a sequential left fold — same fold-exactness idiom as
    ``similarity._dot``: a Python loop over floats reproduces it bit-exactly."""
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _check_mk(m: int, k: int) -> None:
    if not 1 <= m <= 8:
        raise ValueError(f"PQ: m must be in [1, 8] to pack into int64, got {m}")
    if not 2 <= k <= _PACK_BASE:
        raise ValueError(f"PQ: k must be in [2, {_PACK_BASE}], got {k}")
    # the pack must fit a SIGNED int64: max packed value is
    # (k-1)·(256^m − 1)/255, which overflows 2^63−1 exactly when m=8 and
    # k>128 — the classic M=8,K=256 byte layout needs an UNSIGNED 64-bit
    # word, which Spark's bigint is not (review finding; was a silent-wrap
    # or ANSI ArithmeticException at the advertised operating point)
    if (k - 1) * (_PACK_BASE**m - 1) // (_PACK_BASE - 1) > 2**63 - 1:
        raise ValueError(
            f"PQ: m={m}, k={k} cannot pack into a signed int64 "
            f"(use m<=7 at k=256, or k<=128 at m=8)"
        )


def _subvectors(e: DataFrame, m: int) -> DataFrame:
    """(vec_id, sub, subvec): the M contiguous slices of each embedding.
    Fails loudly when the dimension does not divide by m — silent ragged
    slices would corrupt every downstream distance."""
    d = F.size("embedding")
    bad = F.raise_error(
        F.concat(
            F.lit(f"PQ: embedding dimension "),
            d.cast("string"),
            F.lit(f" not divisible by m={m}"),
        )
    )
    sub_len = (d / m).cast("int")
    return e.select(
        "vec_id",
        F.when(d % m != 0, bad).otherwise(sub_len).alias("_sl"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col("embedding"),
    ).select(
        "vec_id",
        "sub",
        F.slice(
            F.transform(F.col("embedding"), lambda v: v.cast("double")),
            F.col("sub") * F.col("_sl") + 1,
            F.col("_sl"),
        ).alias("subvec"),
    )


def _nearest_code(
    subs: DataFrame, codebook: DataFrame, carry_subvec: bool = False
) -> DataFrame:
    """(vec_id, sub, code, sqdist[, subvec]): each subvector's nearest
    codeword under squared L2, ties to the lowest code. The argmin is a
    ``min`` over a (sqdist, code) struct with map-side partial aggregation —
    the ``similarity._assign_cells`` pre-reduce discipline, so the shuffle
    carries one row per (vector, subspace), not per scored codeword.
    ``carry_subvec`` rides the subvector through the agg (``F.first``, the
    ``_assign_cells`` move) so the train loop's mean update needs no
    re-join against the exploded corpus. A subvector/codeword length
    mismatch (an m inconsistent with the codebook) fails loudly here
    instead of null-padding through ``zip_with``."""
    length_ok = F.size("subvec") == F.size("codeword")
    bad = F.raise_error(
        F.concat(
            F.lit("PQ: subvector length "),
            F.size("subvec").cast("string"),
            F.lit(" != codeword length "),
            F.size("codeword").cast("string"),
            F.lit(" — m does not match the codebook"),
        )
    )
    scored = subs.join(F.broadcast(codebook), "sub").select(
        "vec_id",
        "sub",
        "code",
        "subvec",
        F.when(~length_ok, bad)
        .otherwise(_sq_l2(F.col("subvec"), F.col("codeword")))
        .alias("sqdist"),
    )
    aggs = [F.min(F.struct("sqdist", "code")).alias("m")]
    if carry_subvec:
        aggs.append(F.first("subvec").alias("subvec"))
    out = scored.groupBy("vec_id", "sub").agg(*aggs)
    cols = ["vec_id", "sub", F.col("m.code").alias("code"),
            F.col("m.sqdist").alias("sqdist")]
    if carry_subvec:
        cols.append(F.col("subvec"))
    return out.select(*cols)


def _make_code_assigner(cb_local: dict):
    """Vectorized twin of ``_nearest_code`` for the TRAINING loop (r17,
    guide §4): a pandas UDF closing over the current codebook (M·K·(D/M)
    doubles — the same parameter-bounded rows the loop already collects to
    the driver) that reproduces the JVM fold-exact squared-L2 argmin
    BIT-FOR-BIT:

    * every accumulation runs in DIM ORDER (``acc = acc + (x_d−y_d)²``),
      one IEEE-754 double subtract/multiply/add per step — the exact op
      sequence of the ``zip_with`` + ``F.aggregate`` left fold, vectorized
      ACROSS rows and codewords, never across dims;
    * ``np.argmin`` returns the FIRST minimum, which with codeword rows
      sorted by code id is exactly the ``min(struct(sqdist, code))``
      ties-to-lowest-code rule.

    Bit-equality against the JVM path is pinned by
    ``tests/test_pq.py::test_pandas_code_assigner_matches_jvm``.
    """
    import numpy as np
    import pandas as pd

    per_sub: dict[int, tuple] = {}
    for s in sorted({s for s, _ in cb_local}):
        codes = sorted(c for s2, c in cb_local if s2 == s)
        C = np.array([cb_local[(s, c)] for c in codes], dtype=np.float64)
        per_sub[s] = (np.array(codes, dtype=np.int64), C)

    @F.pandas_udf("int")
    def assign(sub: pd.Series, subvec: pd.Series) -> pd.Series:
        out = np.empty(len(sub), dtype=np.int64)
        sub_np = sub.to_numpy()
        for s, (codes, C) in per_sub.items():
            mask = sub_np == s
            if not mask.any():
                continue
            E = np.array(list(subvec[mask]), dtype=np.float64)
            acc = np.zeros((E.shape[0], C.shape[0]))
            for d in range(C.shape[1]):
                diff = E[:, d][:, None] - C[None, :, d]
                acc = acc + diff * diff
            out[mask] = codes[np.argmin(acc, axis=1)]
        return pd.Series(out).astype("int32")

    return assign


def pq_train(
    e: DataFrame, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS
) -> DataFrame:
    """Learn the per-subspace codebooks: (sub, code, codeword). Zero-RNG
    (module docstring); per iteration the collect is the M·K codebook rows
    — bounded by the parameters, the ``train_centroids`` acceptable-collect
    class. Train on a SAMPLE at corpus scale; encode scales separately.

    r17: the loop keeps the codebook as a plain Python dict (the literal
    frame is created once at the end) and runs the per-iteration ASSIGNMENT
    through ``_make_code_assigner``'s vectorized pandas UDF over those
    driver-resident codewords instead of the broadcast-join + interpreted
    ``F.aggregate`` fold of ``_nearest_code`` — bit-identical codes (see
    the assigner's docstring and its pinning test), so the decimal-exact
    mean update downstream is unchanged and the trained codebook stays
    bit-identical to the DuckDB mirror. ``_nearest_code`` itself (the
    encode/serving path that is part of returned query PLANS) is
    untouched."""
    _check_mk(m, k)
    subs = _subvectors(e, m)
    # seed: the k vectors whose vec_id ranks smallest under the Knuth hash,
    # sliced into their m subvectors. The hash depends only on vec_id, so
    # every subspace's seed set is the SAME k vectors — collect them ONCE
    # in (h, vec_id) rank order (TakeOrdered preserves it; row i is the old
    # row_number()-1 == i code) and slice driver-side: the float→double
    # widening and the contiguous slice match ``_subvectors`` exactly.
    h = (F.col("vec_id") * F.lit(SEED_MULT)) % F.lit(SEED_MOD)
    seed_rows = (
        e.select("vec_id", "embedding", h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cb_local: dict[tuple[int, int], list[float]] = {}
    for code, r in enumerate(seed_rows):
        emb = [float(x) for x in r["embedding"]]
        if len(emb) % m != 0:
            raise ValueError(
                f"PQ: embedding dimension {len(emb)} not divisible by m={m}"
            )
        sl = len(emb) // m
        for s in range(m):
            cb_local[(s, code)] = emb[s * sl : (s + 1) * sl]
    spark = e.sparkSession
    for _ in range(iters):
        assign = _make_code_assigner(cb_local)
        assigned = subs.select(
            "sub", assign(F.col("sub"), F.col("subvec")).alias("code"), "subvec"
        )
        # element-wise member means, decimal-exact like similarity._cell_means
        # so the result is independent of aggregation order (a double sum
        # would drift with partitioning and break rerun determinism)
        dims = assigned.select(
            "sub", "code", F.posexplode(F.col("subvec")).alias("dim", "val")
        )
        means = dims.groupBy("sub", "code", "dim").agg(
            (
                F.sum(F.col("val").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mv")
        )
        # M·K·(D/M) rows — the same doubles the nested codeword form
        # carried, just unnested: the driver re-nests them (sort by dim,
        # exactly the old array_sort(collect_list(struct(dim,mv)))
        # projection, see similarity._assemble_means).
        rows = means.collect()
        by_code: dict[tuple[int, int], list] = {}
        for r in rows:
            by_code.setdefault((int(r["sub"]), int(r["code"])), []).append(
                (int(r["dim"]), float(r["mv"]))
            )
        cb_local = {
            sc: [mv for _, mv in sorted(dims_)]
            for sc, dims_ in by_code.items()
        }
        # The rows are already on the driver — run the subspace-coverage
        # check HERE in Python (r16; same check, same failure wording).
        subs_seen = {int(r["sub"]) for r in rows}
        _raise_unless_covers(subs_seen, m)
    codebook = spark.createDataFrame(
        sorted((s, c, v) for (s, c), v in cb_local.items()),
        "sub int, code int, codeword array<double>",
    )
    # tag the literal frame so pq_encode's _check_codebook can skip its
    # Spark job (~0.55 s of pure job-launch overhead for a 64-row local
    # relation, r16 measurement); reusing a trained codebook under a
    # different m still pays the real check
    try:
        codebook._hoes_codebook_checked_m = m  # type: ignore[attr-defined]
    except Exception:  # pragma: no cover - exotic frame proxies
        pass
    return codebook


def _raise_unless_covers(subs_seen: set[int], m: int) -> None:
    """Shared coverage predicate for the driver-side and Spark-side checks:
    the codebook must cover exactly subspaces 0..m-1."""
    if subs_seen != set(range(m)):
        mn = min(subs_seen) if subs_seen else None
        mx = max(subs_seen) if subs_seen else None
        raise ValueError(
            f"PQ: codebook covers {len(subs_seen)} subspaces "
            f"[{mn}..{mx}], but m={m} needs exactly 0..{m - 1}"
        )


def _check_codebook(codebook: DataFrame, m: int) -> None:
    """The codebook must cover exactly subspaces 0..m-1 — an inner join
    against a mismatched codebook would silently DROP the uncovered
    subspaces from every code (review finding). One bounded action over the
    M·K-row codebook — skipped when ``pq_train`` already validated THIS
    frame's rows on the driver (the tag carries the m it was checked
    against, so reusing a trained codebook under a different m still pays
    the real check)."""
    if getattr(codebook, "_hoes_codebook_checked_m", None) == m:
        return
    row = codebook.agg(
        F.count_distinct("sub").alias("n"),
        F.min("sub").alias("mn"),
        F.max("sub").alias("mx"),
    ).collect()[0]
    if row["n"] != m or row["mn"] != 0 or row["mx"] != m - 1:
        raise ValueError(
            f"PQ: codebook covers {row['n']} subspaces "
            f"[{row['mn']}..{row['mx']}], but m={m} needs exactly 0..{m - 1}"
        )


def pq_encode(e: DataFrame, codebook: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, pq_code, sq_err): each vector's M codes packed into one
    int64 (``Σ codeᵢ·256ⁱ`` — exact, reversible integer math) plus its
    total squared quantization error (the per-vector quality signal an
    index builder monitors). One broadcast join + one map-side-reduced
    groupBy. ``sq_err`` folds the per-subspace terms in SUB ORDER (sorted
    collect, sequential fold) — a plain double ``sum`` would depend on
    aggregation order and drift across partitionings/engines, breaking
    both the bit-exact model tests and a future oracle hash."""
    _check_mk(m, 2)
    _check_codebook(codebook, m)
    assigned = _nearest_code(_subvectors(e, m), codebook)
    return (
        assigned.groupBy("vec_id")
        .agg(
            F.sum(
                F.col("code").cast("long")
                * F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("sub") * F.lit(8)).cast("int"),
                )
            ).alias("pq_code"),
            F.array_sort(F.collect_list(F.struct("sub", "sqdist"))).alias("_t"),
        )
        .select(
            "vec_id",
            "pq_code",
            F.aggregate(
                F.col("_t"), F.lit(0.0), lambda acc, t: acc + t["sqdist"]
            ).alias("sq_err"),
        )
    )


def unpack_code(pq_code: Column, sub: Column) -> Column:
    """Code of subspace ``sub`` out of a packed int64 — a true integer
    right-shift, the exact inverse of the encode pack. NOT ``/``: Spark
    evaluates bigint ``/`` in DOUBLE, whose 53-bit mantissa silently
    corrupts any pack wider than 53 bits (review finding); ``shiftright``
    stays in int64 and the packed value is non-negative by the
    ``_check_mk`` bound, so the arithmetic shift is exact."""
    return (
        F.call_function(
            "shiftright", pq_code.cast("long"), (sub * F.lit(8)).cast("int")
        )
        % _PACK_BASE
    ).cast("int")


def pq_adc_topk(
    probe: list[float],
    codes: DataFrame,
    codebook: DataFrame,
    top_k: int = 10,
    m: int = PQ_M,
) -> DataFrame:
    """Asymmetric-distance top-K over PACKED codes: (vec_id, adc_sqdist),
    smallest first, ties to the lowest vec_id (total order).

    The probe-side table is built by scoring the M·K codebook against the
    probe's subvectors — corpus-free, broadcast back; the corpus side is
    unpack (integer math) + M lookups + sum, map-side reduced, then
    ``TakeOrdered``. ADC distance equals the exact squared L2 between the
    probe and each vector's RECONSTRUCTION — pinned by test."""
    _check_mk(m, 2)
    if len(probe) % m != 0:
        raise ValueError(
            f"PQ: probe dimension {len(probe)} not divisible by m={m}"
        )
    _check_codebook(codebook, m)  # after the free local checks: it acts
    spark = codes.sparkSession
    sl = len(probe) // m
    probe_subs = spark.createDataFrame(
        [(s, [float(x) for x in probe[s * sl : (s + 1) * sl]]) for s in range(m)],
        "sub int, psub array<double>",
    )
    table = probe_subs.join(codebook, "sub").select(
        "sub", "code", _sq_l2(F.col("psub"), F.col("codeword")).alias("d")
    )
    exploded = codes.select(
        "vec_id",
        "pq_code",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select("vec_id", "sub", unpack_code(F.col("pq_code"), F.col("sub")).alias("code"))
    # a code with no table row (packed under a different m/k than this
    # codebook) would silently vanish from the inner join and shrink the
    # sum — count the surviving lookups and fail loudly on any shortfall
    short = F.raise_error(
        F.concat(
            F.lit("PQ: a packed code had only "),
            F.col("_n").cast("string"),
            F.lit(f" of {m} codebook lookups — codes and codebook disagree"),
        )
    )
    return (
        exploded.join(F.broadcast(table), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("_d"), F.count(F.lit(1)).alias("_n"))
        .select(
            "vec_id",
            F.when(F.col("_n") != m, short).otherwise(F.col("_d")).alias(
                "adc_sqdist"
            ),
        )
        .orderBy(F.asc("adc_sqdist"), F.asc("vec_id"))
        .limit(top_k)
    )


def pq_ivf_index(
    e: DataFrame, centroids: DataFrame, codebook: DataFrame, m: int = PQ_M
) -> DataFrame:
    """The IVF,PQ index: (cell, vec_id, pq_code). Cell membership comes from
    the trained full-vector centroids (``similarity._assign_cells`` — the
    same assignment the ``q_sim_ivf_trained`` index uses), codes from
    ``pq_encode``; one equi-join on vec_id marries them. This is the Faiss
    ``IVF<k>,PQ<m>`` storage layout: at 100 TB the index is a (cell-
    partitioned) table of 8-byte codes — the full vectors never need to be
    read at query time again."""
    from .similarity import _assign_cells

    member = _assign_cells(
        e.select("vec_id", "embedding"), centroids
    ).select("vec_id", "cell")
    codes = pq_encode(e, codebook, m)
    return member.join(codes, "vec_id").select("cell", "vec_id", "pq_code")


def pq_ivfadc_topk(
    probe: list[float],
    index: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    top_k: int = 10,
    nprobe: int = 2,
    m: int = PQ_M,
) -> DataFrame:
    """IVF,ADC serving: route the probe to its ``nprobe`` nearest cells,
    then run ADC ONLY over the codes stored in those cells. The corpus-side
    cost is |probed cells| · 8-byte codes, not the corpus — the two-level
    pruning that makes billion-vector serving work.

    Routing uses COSINE against the k-row centroid frame — the SAME metric
    ``_assign_cells`` used to place the vectors (review finding: L2 routing
    against cosine-assigned, non-unit-norm mean centroids disagrees on
    orderings, so a small ``nprobe`` could fail to scan even the cell
    holding the probe's own vector; metric-consistent routing restores the
    standard IVF self-find guarantee). With ``nprobe`` = the full cell
    count the result equals ``pq_adc_topk`` over all codes exactly (pinned
    by test); smaller ``nprobe`` trades recall for a proportionally
    smaller scan, measured by ``pq_recall``."""
    if nprobe < 1:
        raise ValueError("PQ: nprobe must be >= 1")
    from .similarity import _dot, _norm

    probe_col = F.array(*[F.lit(float(x)) for x in probe])
    dim_ok = F.size("centroid") == len(probe)
    bad = F.raise_error(
        F.concat(
            F.lit(f"PQ: probe dimension {len(probe)} != centroid dimension "),
            F.size("centroid").cast("string"),
        )
    )
    near = (
        centroids.select(
            "cell",
            F.when(~dim_ok, bad)
            .otherwise(
                _dot(probe_col, F.col("centroid"))
                / (_norm(probe_col) * _norm(F.col("centroid")))
            )
            .alias("c"),
        )
        .orderBy(F.desc("c"), F.asc("cell"))  # k rows: bounded by the param
        .limit(nprobe)
        .select("cell")
    )
    cand = index.join(F.broadcast(near), "cell").select("vec_id", "pq_code")
    return pq_adc_topk(probe, cand, codebook, top_k=top_k, m=m)


def pq_recall(
    e: DataFrame,
    codebook: DataFrame,
    centroids: DataFrame | None = None,
    top_k: int = 10,
    nprobe: int = 2,
    m: int = PQ_M,
    probe_mod: int = 100,
) -> DataFrame:
    """Recall@K of the compressed index against exact L2 ground truth — the
    evaluation every PQ deployment runs before trusting its codes
    (``ann_eval.q_ann_recall`` discipline, L2 flavor): one row per probe,
    ``(probe_id, n_hits, recall)``.

    The approximate side is the PRODUCTION serving path unchanged — flat
    ADC when ``centroids`` is None, IVF,ADC with the given ``nprobe``
    otherwise — so evaluating the index exercises the index. The exact side
    is brute-force squared L2 with the same fold and the same
    (distance ASC, vec_id ASC) total order, so set equality is
    well-defined. Probes are every ``probe_mod``-th vector; at 100 TB the
    brute-force side is |probes|·|corpus| folds, throttled by the probe
    count (the bounded-probe-sample rule recall evaluation always runs
    under)."""
    if probe_mod < 1:
        raise ValueError("PQ: probe_mod must be >= 1")
    probes = e.filter(F.col("vec_id") % probe_mod == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
            "probe_emb"
        ),
    )
    corpus = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias(
            "emb"
        ),
    )
    exact = (
        corpus.join(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            _sq_l2(F.col("emb"), F.col("probe_emb")).alias("d"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("d"), F.asc("vec_id"))
    truth = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("probe_id", "vec_id")
    )
    # the serving path, probe by probe: each probe's ADC list is one
    # bounded TakeOrdered job — the evaluation harness mirrors how a
    # serving tier is actually exercised (per-request), and the probe
    # sample is bounded by probe_mod. Codes/index/codebook are CACHED for
    # the loop: each per-probe collect would otherwise re-execute the full
    # corpus-encode lineage, multiplying the dominant cost by the probe
    # count (review finding); only the path actually served is built.
    spark = e.sparkSession
    cached = [codebook.cache()]
    if centroids is not None:
        index = pq_ivf_index(e, centroids, codebook, m).cache()
        cached += [index, centroids.cache()]
        codes = None
    else:
        index = None
        codes = pq_encode(e, codebook, m).cache()
        cached.append(codes)
    try:
        rows = []
        for p in probes.collect():  # bounded: the probe sample
            pid = int(p["probe_id"])
            vec = [float(x) for x in p["probe_emb"]]
            if index is not None:
                got = pq_ivfadc_topk(
                    vec, index, centroids, codebook, top_k=top_k + 1,
                    nprobe=nprobe, m=m,
                )
            else:
                got = pq_adc_topk(vec, codes, codebook, top_k=top_k + 1, m=m)
            ids = [int(r["vec_id"]) for r in got.collect() if r["vec_id"] != pid]
            rows.append((pid, ids[:top_k]))
    finally:
        for df in cached:
            df.unpersist()
    approx = spark.createDataFrame(
        [(pid, vid) for pid, ids in rows for vid in ids],
        "probe_id long, vec_id long",
    )
    hits = truth.join(approx, ["probe_id", "vec_id"]).groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        truth.groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("n_truth"))
        .join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.col("n_truth").cast("double")
            ).alias("recall"),
        )
        .orderBy("probe_id")
    )


# --- registration-ready query twin + ANSI-SQL oracle -------------------------
#
# q_embed_pq is the (spark, sf_dir) form of train→encode over the embeddings
# table, and SQL_EMBED_PQ is its DuckDB mirror — the same CTE-replay
# discipline as similarity.SQL_SIM_IVF_TRAINED (the codebook is re-derived
# inside the oracle, iteration count generated from the same constants, so
# Spark and SQL cannot drift apart silently). Held OUT of the registry this
# round (the r10 verification window is full); registering in r11 is one
# registry row + a rotation re-splice.


def q_embed_pq(spark, sf_dir: str):
    """PQ train→encode over the embeddings table: (vec_id, pq_code, sq_err),
    one row per vector, scalar-only columns. The codebook derives from the
    same table (the ``q_sim_ivf_trained`` convention: training is part of
    the replayed computation, not an external artifact)."""
    from ..io import table

    # fan_out measured SLOWER here (r17 gate A/B: 2.99 -> 3.31 s median) —
    # like q_sim_ivf_trained, the training costs are collect-side and each
    # iteration's re-derivation would re-pay the spread shuffle. Unspread.
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    codebook = pq_train(e)
    return pq_encode(e, codebook).orderBy("vec_id")


def _sql_sq_l2(a: str, b: str) -> str:
    """DuckDB mirror of ``_sq_l2``: list_reduce over squared element diffs.
    list_reduce seeds from the first element — bit-identical to Spark's
    fold from 0.0 because (0.0 + x) == x exactly for finite doubles."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
    )


def _sql_pq_ctes(m: int, k: int, iters: int) -> str:
    """CTE chain mirroring pq_train: subvectors → seed codebook →
    (assign, means)×iters. Generated from the SAME constants as the Spark
    path — iteration count and geometry have one source of truth."""
    from .similarity import SEED_MOD, SEED_MULT

    sl = f"(len(embedding) // {m})"
    parts = [
        f"""subs AS (
    SELECT vec_id, u.sub,
           list_transform(
               embedding[(u.sub * {sl} + 1):((u.sub + 1) * {sl})],
               v -> CAST(v AS DOUBLE)
           ) AS subvec
    FROM embeddings, unnest(range(0, {m})) AS u(sub)
),
seeds AS (
    SELECT vec_id, (vec_id * {SEED_MULT}) % {SEED_MOD} AS h
    FROM embeddings ORDER BY h, vec_id LIMIT {k}
),
seed_codes AS (
    SELECT vec_id, CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS code
    FROM seeds
),
cb0 AS (
    SELECT s.sub, sc.code, s.subvec AS codeword
    FROM subs s JOIN seed_codes sc USING (vec_id)
)"""
    ]
    pick = "(min(struct_pack(d := d, code := code))).code"
    for i in range(1, iters + 1):
        parts.append(
            f"""assign{i} AS (
    SELECT vec_id, sub, {pick} AS code
    FROM (
        SELECT s.vec_id, s.sub, c.code,
               {_sql_sq_l2('s.subvec', 'c.codeword')} AS d
        FROM subs s JOIN cb{i - 1} c USING (sub)
    )
    GROUP BY vec_id, sub
),
dims{i} AS (
    SELECT a.sub, a.code, u.i - 1 AS dim, s.subvec[u.i] AS val
    FROM assign{i} a
    JOIN subs s USING (vec_id, sub),
    unnest(range(1, len(s.subvec) + 1)) AS u(i)
),
cb{i} AS (
    SELECT sub, code, list(mv ORDER BY dim) AS codeword
    FROM (
        SELECT sub, code, dim,
               CAST(SUM(CAST(val AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS mv
        FROM dims{i} GROUP BY sub, code, dim
    )
    GROUP BY sub, code
)"""
        )
    return ",\n".join(parts)


SQL_EMBED_PQ = f"""
WITH {_sql_pq_ctes(PQ_M, PQ_K, PQ_ITERS)},
cb AS (SELECT * FROM cb{PQ_ITERS}),
final_assign AS (
    SELECT vec_id, sub,
           (min(struct_pack(d := d, code := code))).code AS code,
           (min(struct_pack(d := d, code := code))).d AS sqdist
    FROM (
        SELECT s.vec_id, s.sub, c.code,
               {_sql_sq_l2('s.subvec', 'c.codeword')} AS d
        FROM subs s JOIN cb c USING (sub)
    )
    GROUP BY vec_id, sub
)
SELECT vec_id,
       CAST(SUM(CAST(code AS BIGINT) * (CAST(1 AS BIGINT) << (8 * sub))) AS BIGINT) AS pq_code,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(sqdist ORDER BY sub)),
           (x, y) -> x + y
       ) AS sq_err
FROM final_assign
GROUP BY vec_id
ORDER BY vec_id
"""


# Registered round 11 (the r10 window cleared): the PQ train→encode path is
# driver-verified against the DuckDB codebook-replay oracle above.
QUERIES = {"q_embed_pq": q_embed_pq}
ORACLES = {"q_embed_pq": SQL_EMBED_PQ}
