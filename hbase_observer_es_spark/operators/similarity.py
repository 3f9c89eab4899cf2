"""Similarity search over `embeddings` (north-star): brute-force k-NN, threshold
pair mining, and an IVF-bucketed approximate path for scale.

The vector math is pure higher-order-function folds (zip_with + aggregate) —
JVM-side, no UDF, and the fold order (left-to-right, zero init) matches DuckDB's
list_reduce exactly, so cosine values are bit-identical across engines.

Scale posture: brute-force k-NN is O(n·d) per probe — fine for one probe, wrong for
many. q_sim_ivf is the scale path: partition vectors by coarse cluster (the fixture's
`label` plays the IVF cell id; with raw data you'd k-means first), route each probe to
its nearest centroid(s), search only those cells. Same two-stage shape as FAISS-IVF,
expressed as joins + aggs. An embedding-heavy deployment would add a pandas_udf
(numpy BLAS) scorer per partition — plumbing identical, see operators/udf_surface.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fan_out, persist_tracked, table

PROBE_VEC_ID = 0
PAIR_COS_THRESHOLD = 0.3  # fixture labels are loose clusters (within-label p99 ≈ .3)
K = 5


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left fold — bit-identical to DuckDB's list_reduce mirror.

    Measured note: an unrolled 64-term `element_at` expression (to get inside
    whole-stage codegen) profiled 4× SLOWER than this fold — a 256-node
    arithmetic tree exceeds codegen limits and falls back to per-node
    interpretation, while the fold's lambda is one tight interpreted loop.
    The numpy BLAS path (q_sim_knn_pudf) is the actual fast lane when fold-order
    exactness isn't required."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


_SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _sql_norm(a: str) -> str:
    return f"sqrt({_SQL_DOT.format(a=a, b=a)})"


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _sql_cosine(a: str, b: str) -> str:
    return f"({_SQL_DOT.format(a=a, b=b)} / ({_sql_norm(a)} * {_sql_norm(b)}))"


def q_sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k cosine neighbors of the probe vector (vec_id=0).

    The probe is broadcast (1 row) against the full table — a map-only scan, then
    TakeOrdered for top-k. No shuffle of the big side; at 100 TB this is one pass.
    """
    e = table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb")
    )
    cos = _cosine(F.col("embedding"), F.col("probe_emb"))
    return (
        e.filter(F.col("vec_id") != PROBE_VEC_ID)
        .join(F.broadcast(probe))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(K)
    )


SQL_SIM_KNN = f"""
WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID})
SELECT vec_id, label,
       {_sql_cosine('embedding', 'probe_emb')} AS cos_sim
FROM embeddings, probe
WHERE vec_id <> {PROBE_VEC_ID}
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {K}
"""


def q_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs above a cosine threshold, restricted to within-label —
    the blocked form of all-pairs similarity: the label bucket bounds the quadratic
    blowup exactly like an LSH/IVF cell would at 100 TB.

    Implementation: applyInPandas per label block, with the FOLD-EXACT numpy
    trick — accumulate the dot product dimension-by-dimension (vectorized across
    all pairs at once, sequential across dims), which performs float adds in the
    exact (0+p₁)+p₂+… association of the JVM fold and the SQL list_reduce mirror,
    so every cosine is bit-identical to the oracle while the block's whole pair
    matrix costs 64 vectorized ops instead of |pairs|·64 interpreted lambda steps
    (profiled ~10×; a plain `M @ q` BLAS product would be faster still but
    reorders the adds — see q_sim_knn_pudf for that rows-only variant).
    At 100 TB blocks come from LSH/IVF cells; a block must fit one task."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings").select("label", "vec_id", "embedding")

    def pairs_of(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.vstack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"label": [], "a_id": [], "b_id": [], "cos_sim": []}
            ).astype({"label": "int32", "a_id": "int64", "b_id": "int64",
                      "cos_sim": "float64"})
        ai, bi = np.triu_indices(n, k=1)
        dot = np.zeros(len(ai))
        sq = np.zeros(n)
        for d in range(M.shape[1]):  # dim-sequential: fold-exact association
            col = M[:, d]
            dot = dot + col[ai] * col[bi]
            sq = sq + col * col
        nrm = np.sqrt(sq)
        cos = dot / (nrm[ai] * nrm[bi])
        keep = cos >= PAIR_COS_THRESHOLD
        return pd.DataFrame(
            {
                "label": np.full(int(keep.sum()), pdf["label"].iloc[0], dtype="int32"),
                "a_id": ids[ai[keep]],
                "b_id": ids[bi[keep]],
                "cos_sim": cos[keep],
            }
        )

    return e.groupBy("label").applyInPandas(
        pairs_of, "label int, a_id long, b_id long, cos_sim double"
    )


SQL_SIM_PAIRS = f"""
SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
       {_sql_cosine('a.embedding', 'b.embedding')} AS cos_sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= {PAIR_COS_THRESHOLD}
"""


def _centroids(e: DataFrame) -> DataFrame:
    """(label, centroid): element-wise means per label, computed with
    decimal-exact sums (posexplode → per-dimension agg → reassemble) so the
    routing decision is deterministic across engines. Two tiny shuffles, output
    bounded by |cells| — always broadcastable."""
    dims = e.select("label", F.posexplode(F.col("embedding")).alias("dim", "val"))
    return (
        dims.groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("val").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


_SQL_CENT_CTES = """
dims AS (
    SELECT label, i - 1 AS dim, embedding[i] AS val
    FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cent AS (
    SELECT label,
           list(m ORDER BY dim) AS centroid
    FROM (
        SELECT label, dim,
               CAST(SUM(CAST(val AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS m
        FROM dims GROUP BY label, dim
    )
    GROUP BY label
)"""


def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: route the probe to its nearest cell centroid, then exact
    top-k inside that cell only — the linear-scan cost drops to |cell|.
    """
    # fan_out measured SLOWER here (r17 gate A/B: 1.03 -> 1.20 s median):
    # every branch (centroid means, probe, cell scan) re-pays the spread
    # shuffle and the per-branch compute is too small to amortize it.
    e = table(spark, sf_dir, "embeddings")
    cent = _centroids(e)
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb")
    )
    best = (
        cent.join(F.broadcast(probe))
        .select(
            "label",
            _cosine(F.col("centroid"), F.col("probe_emb")).alias("c_cos"),
        )
        .orderBy(F.desc("c_cos"), F.asc("label"))
        .limit(1)
        .select(F.col("label").alias("best_label"))
    )
    cos = _cosine(F.col("embedding"), F.col("probe_emb"))
    return (
        e.join(F.broadcast(best), e.label == F.col("best_label"))
        .join(F.broadcast(probe))
        .filter(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(K)
    )


SQL_SIM_IVF = f"""
WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
{_SQL_CENT_CTES},
best AS (
    SELECT label AS best_label
    FROM cent, probe
    ORDER BY {_sql_cosine('centroid', 'probe_emb')} DESC, label ASC
    LIMIT 1
)
SELECT vec_id, label, {_sql_cosine('embedding', 'probe_emb')} AS cos_sim
FROM embeddings, probe, best
WHERE label = best_label AND vec_id <> {PROBE_VEC_ID}
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {K}
"""


PROBE_MOD = 25  # probe set = every 25th vector — a stand-in probes table


def q_sim_ivf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-probe IVF ANN: top-k for MANY probes at once — the form a
    training-data pipeline actually runs (millions of queries, not one).

    Same two building blocks as q_sim_ivf, turned into set operations:
    * routing is probes ⋈ broadcast(centroids) — the centroid table is bounded
      by |cells|, so routing is map-side at any probe count; row_number picks
      each probe's best cell;
    * scoring joins each probe against ONLY its cell's vectors. Here the routed
      probe set is small → broadcast; at 100 TB with huge probe sets you'd
      shuffle both sides on the cell id instead — co-partitioned equi-join,
      same plan shape, never all-pairs;
    * per-probe top-k is one window over the cell-scored rows (cells bound the
      rows per probe, so the window partitions stay small).
    """
    # fan_out A/B'd NEUTRAL here (r17 gate A/B 1.55 vs 1.47 s median with a
    # full-bench run flagging the spread) — like q_sim_ivf, the _centroids
    # branches re-pay the spread shuffle; left unspread.
    e = table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    routed = probes.join(F.broadcast(_centroids(e))).select(
        "probe_id",
        "probe_emb",
        "label",
        _cosine(F.col("centroid"), F.col("probe_emb")).alias("c_cos"),
    )
    w_route = Window.partitionBy("probe_id").orderBy(F.desc("c_cos"), F.asc("label"))
    best = (
        routed.withColumn("rn", F.row_number().over(w_route))
        .filter(F.col("rn") == 1)
        .select("probe_id", "probe_emb", F.col("label").alias("cell"))
    )
    scored = (
        e.join(F.broadcast(best), e.label == F.col("cell"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "label",
            _cosine(F.col("embedding"), F.col("probe_emb")).alias("cos_sim"),
        )
    )
    w_topk = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w_topk))
        .filter(F.col("rk") <= K)
        .select("probe_id", "vec_id", "label", "cos_sim")
    )


SQL_SIM_IVF_BATCH = f"""
WITH probes AS (
    SELECT vec_id AS probe_id, embedding AS probe_emb
    FROM embeddings WHERE vec_id % {PROBE_MOD} = 0
),
{_SQL_CENT_CTES},
routed AS (
    SELECT probe_id, probe_emb, label,
           {_sql_cosine('centroid', 'probe_emb')} AS c_cos
    FROM probes, cent
),
best AS (
    SELECT probe_id, probe_emb, label AS cell
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY c_cos DESC, label ASC
        ) AS rn
        FROM routed
    )
    WHERE rn = 1
),
scored AS (
    SELECT b.probe_id, e.vec_id, e.label,
           {_sql_cosine('e.embedding', 'b.probe_emb')} AS cos_sim
    FROM embeddings e JOIN best b ON e.label = b.cell
    WHERE e.vec_id <> b.probe_id
)
SELECT probe_id, vec_id, label, cos_sim
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id ASC
    ) AS rk
    FROM scored
)
WHERE rk <= {K}
"""


# --- learned IVF: deterministic k-means (Lloyd's) ----------------------------
#
# Everywhere else the fixture's `label` column stands in for the IVF cell id —
# an honest shortcut (DIVERGENCES.md D11), but a real 100 TB corpus has no
# labels. train_centroids learns the cells from raw vectors, and
# q_sim_ivf_trained routes the batch-ANN through the LEARNED cells, so the IVF
# family now stands up on unlabeled embeddings end to end.

KMEANS_K = 8
KMEANS_ITERS = 2
# Knuth multiplicative hash constants — pure integer arithmetic, so ANY engine
# computes the identical pseudo-random seed ranking (no RNG, same determinism
# discipline as _lsh_weights below)
SEED_MULT = 2654435761
SEED_MOD = 4294967296

# lexicographic struct max == argmax by (cosine, then LOWEST cell id); both
# engines define struct comparison field-by-field, so the winner is identical
_SQL_PICK_CELL = "(max(struct_pack(c := c, nc := -cell, cell := cell))).cell"


def _pick_cell() -> Column:
    return F.max(
        F.struct(
            F.col("c").alias("c"),
            (-F.col("cell")).alias("nc"),
            F.col("cell").alias("cell"),
        )
    )


def _assign_cells(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, embedding, vnorm, cell): each vector's best cell under
    fold-exact cosine, ties to the lowest cell id.

    The argmax is a ``max`` over a (cosine, -cell, cell) struct, NOT a window:
    max's PARTIAL phase reduces the k·N scored rows map-side, so the shuffle
    carries one row per vector — the same pre-reduce discipline as q_join_asof.

    Norms are HOISTED into named columns (one fold per vector / per centroid)
    instead of recomputed inside the cosine for every (vector, centroid) pair —
    bit-identical because the association ``dot / (norm_a * norm_b)`` is
    unchanged; same trick as q_sim_lsh_batch (17→4.4 s there). ``vnorm`` rides
    along in the output so downstream scoring reuses it.
    """
    v = vecs.withColumn("_vn", _norm(F.col("embedding")))
    c = cent.withColumn("_cn", _norm(F.col("centroid")))
    scored = v.join(F.broadcast(c)).select(
        "vec_id",
        "embedding",
        "_vn",
        "cell",
        (
            _dot(F.col("embedding"), F.col("centroid"))
            / (F.col("_vn") * F.col("_cn"))
        ).alias("c"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            _pick_cell().alias("m"),
            F.first("embedding").alias("embedding"),
            F.first("_vn").alias("vnorm"),
        )
        .select("vec_id", "embedding", "vnorm", F.col("m.cell").alias("cell"))
    )


def _cell_dim_means(assigned: DataFrame) -> DataFrame:
    """(cell, dim, m): element-wise member means, decimal-exact like
    _centroids so every engine lands on bit-identical centroids. The
    train loop collects THIS frame (k·D rows — the same k·D doubles the
    old array form carried, just unnested) and assembles the per-cell
    arrays on the driver: the second groupBy's exchange + stage existed
    only to re-nest rows the driver was about to flatten anyway
    (r16 optimization; ~1 stage + 1 exchange per Lloyd iteration)."""
    dims = assigned.select("cell", F.posexplode(F.col("embedding")).alias("dim", "val"))
    return dims.groupBy("cell", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(18,8)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )


def _make_cell_assigner(cent_rows: list[tuple[int, list[float]]]):
    """Vectorized twin of ``_assign_cells`` for the TRAINING loop (r17,
    guide §4): a pandas UDF closing over the current centroid list (k·D
    doubles — the same parameter-bounded rows the loop already collects to
    the driver) that reproduces the JVM fold-exact cosine argmax
    BIT-FOR-BIT:

    * every accumulation runs in DIM ORDER (``acc = acc + x_d·y_d``), one
      IEEE-754 double add/multiply per step — the exact op sequence of the
      ``F.aggregate`` left fold, vectorized ACROSS rows, never across dims;
    * norms are hoisted once per vector/centroid and the cosine is
      ``dot / (vnorm · cnorm)`` with the same association;
    * ``np.argmax`` returns the FIRST maximum, which with centroid rows
      sorted by cell id is exactly the ``max(struct(c, -cell, cell))``
      ties-to-lowest-cell rule (and for the no-NaN inputs this engine
      feeds it — finite embeddings, non-zero norms — the orderings agree
      everywhere).

    Bit-equality against the JVM path is pinned by
    ``tests/test_similarity_paths.py::test_pandas_cell_assigner_matches_jvm``.
    """
    import numpy as np
    import pandas as pd

    ordered = sorted(cent_rows, key=lambda t: t[0])
    cells = np.array([c for c, _ in ordered], dtype=np.int64)
    C = np.array([v for _, v in ordered], dtype=np.float64)  # (k, D)
    k, D = C.shape if C.size else (0, 0)
    cn = np.zeros(k)
    for d in range(D):
        cn = cn + C[:, d] * C[:, d]
    cn = np.sqrt(cn)

    @F.pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        E = np.array(list(emb), dtype=np.float64)  # float32→double: exact
        n = E.shape[0]
        dots = np.zeros((n, k))
        vn = np.zeros(n)
        for d in range(D):
            ed = E[:, d]
            dots = dots + ed[:, None] * C[None, :, d]
            vn = vn + ed * ed
        c = dots / (np.sqrt(vn)[:, None] * cn[None, :])
        return pd.Series(cells[np.argmax(c, axis=1)]).astype("int32")

    return assign


def _assemble_means(rows) -> list[tuple[int, list[float]]]:
    """Driver-side re-nest of collected (cell, dim, m) rows into
    (cell, [m_0..m_D-1]) — exactly ``array_sort(collect_list(struct(dim,m)))``
    followed by the field projection, so the assembled arrays are
    bit-identical to the old Spark-side form."""
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(int(r["cell"]), []).append((int(r["dim"]), float(r["m"])))
    return [
        (cell, [m for _, m in sorted(dims)])
        for cell, dims in sorted(by_cell.items())
    ]


def train_centroids(
    e: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Deterministic Lloyd's k-means over raw embeddings → (cell, centroid).

    No RNG anywhere, so a DuckDB mirror reproduces every iteration exactly:
    * init: the k vectors ranked smallest by the Knuth hash
      ``(vec_id * SEED_MULT) % SEED_MOD`` — pseudo-random spread, pure integer
      math (the seed-ranking window runs over k rows, bounded by the
      parameter, never by data);
    * assignment: argmax fold-exact cosine via _assign_cells (map-side
      pre-reduced);
    * update: decimal-exact element-wise means (_cell_means).

    Each iteration is one broadcast join + two aggs — the same join+agg loop
    shape as q_dedup_clusters' connected components. At 100 TB the
    per-iteration shuffle is one row per vector; centroids stay a k-row
    broadcastable dim throughout. A cell that loses every member drops out
    (standard Lloyd's degeneracy; mirrored by the SQL twin).

    Each iteration MATERIALIZES its k centroid rows — bounded by the
    parameters, the same acceptable-collect class as the trained-index
    deploy in q_sim_ivf_trained — and the loop keeps them as a plain
    Python list (r17): the literal frame is created ONCE at the end.
    The per-iteration ASSIGNMENT runs through ``_make_cell_assigner``'s
    vectorized pandas UDF over those driver-resident centroids instead of
    the broadcast-join + interpreted ``F.aggregate`` fold of
    ``_assign_cells`` — bit-identical cells (see the assigner's docstring
    and its pinning test), so the decimal-exact mean update downstream is
    unchanged and the trained centroids stay bit-identical to the DuckDB
    mirror. ``_assign_cells`` itself (the serving/membership path that is
    part of returned query PLANS) is untouched.
    """
    h = (F.col("vec_id") * F.lit(SEED_MULT)) % F.lit(SEED_MOD)
    # k seed rows, collected in (h, vec_id) rank order: row i is exactly the
    # old row_number()-1 == i cell assignment (TakeOrdered preserves order)
    seed_rows = (
        e.select("vec_id", "embedding", h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    cent_local = [
        (i, [float(x) for x in r["embedding"]]) for i, r in enumerate(seed_rows)
    ]
    spark = e.sparkSession
    for _ in range(iters):
        assign = _make_cell_assigner(cent_local)
        assigned = e.select(
            assign(F.col("embedding")).alias("cell"), "embedding"
        )
        # k·D rows — the same k·D doubles the nested form collected, minus
        # the re-nesting groupBy's exchange (see _cell_dim_means)
        rows = _cell_dim_means(assigned).collect()
        cent_local = _assemble_means(rows)
    return spark.createDataFrame(
        cent_local, "cell int, centroid array<double>"
    )


def q_sim_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-probe IVF ANN over TRAINED cells — q_sim_ivf_batch minus the
    label shortcut: k-means learns the cells, membership and routing both come
    from the learned centroids, nothing reads `label`.

    Plan shape: train (iterated join+agg, executed ONCE) → membership
    equi-join on cell → per-probe top-k window over cell-bounded candidates.
    train_centroids already returns the centroids as a literal k-row frame
    (k·dim doubles bounded by the parameter, never data — the same
    acceptable-collect class as q_sim_knn_pudf's 1-row probe), which keeps
    the deep Lloyd's lineage out of the downstream plan; collect→literal is
    also exactly how a trained index is deployed: centroids are model
    artifacts, not query-time dataflow. The raw-vector scan is persisted for
    the duration: training iterations, membership, and probe selection all
    re-read it (at 100 TB: a cached cluster table / DISK_ONLY tier — the
    knob, not the plan, changes).
    """
    # persist the PRUNED projection — caching the raw table would bake the
    # label column into the cached relation and defeat the unlabeled-corpus
    # scan-pruning property (pinned by test_trained_ivf_reads_no_label)
    # fan_out measured SLOWER here (r17 gate A/B: 2.86 -> 3.20 s median);
    # the training actions' costs are collect-side, not scan-side, and the
    # spread shuffle taxes every cache materialization. Left unspread.
    e = persist_tracked(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "similarity.q_sim_ivf_trained.e",
    )
    cent = train_centroids(e)
    member = _assign_cells(e, cent)
    probes = e.filter(F.col("vec_id") % PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_emb"),
        _norm(F.col("embedding")).alias("_pn"),  # hoisted probe norm
    )
    routed_scored = probes.join(
        F.broadcast(cent.withColumn("_cn", _norm(F.col("centroid"))))
    ).select(
        "probe_id",
        "probe_emb",
        "_pn",
        "cell",
        (
            _dot(F.col("probe_emb"), F.col("centroid"))
            / (F.col("_pn") * F.col("_cn"))
        ).alias("c"),
    )
    routed = (
        routed_scored.groupBy("probe_id")
        .agg(
            _pick_cell().alias("m"),
            F.first("probe_emb").alias("probe_emb"),
            F.first("_pn").alias("pnorm"),
        )
        .select("probe_id", "probe_emb", "pnorm", F.col("m.cell").alias("cell"))
    )
    # member carries vnorm, routed carries pnorm: the per-candidate cosine is
    # ONE dot fold — dot/(vnorm*pnorm) keeps _cosine's exact association
    scored = (
        member.join(F.broadcast(routed), "cell")
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            "cell",
            (
                _dot(F.col("embedding"), F.col("probe_emb"))
                / (F.col("vnorm") * F.col("pnorm"))
            ).alias("cos_sim"),
        )
    )
    w_topk = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w_topk))
        .filter(F.col("rk") <= K)
        .select("probe_id", "vec_id", "cell", "cos_sim")
    )


def _sql_kmeans_ctes(k: int, iters: int) -> str:
    """CTE chain mirroring train_centroids: seeds → cent0 → (assign, cent)×iters.
    Generated, not hand-unrolled — iteration count is the single source of truth."""
    parts = [
        f"""seeds AS (
    SELECT vec_id, embedding, (vec_id * {SEED_MULT}) % {SEED_MOD} AS h
    FROM embeddings ORDER BY h, vec_id LIMIT {k}
),
cent0 AS (
    SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS cell,
           embedding AS centroid
    FROM seeds
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""assign{i} AS (
    SELECT vec_id, embedding, {_SQL_PICK_CELL} AS cell
    FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               {_sql_cosine('e.embedding', 'c.centroid')} AS c
        FROM embeddings e, cent{i - 1} c
    )
    GROUP BY vec_id, embedding
),
dims{i} AS (
    SELECT cell, i - 1 AS dim, embedding[i] AS val
    FROM assign{i}, unnest(range(1, len(embedding) + 1)) AS u(i)
),
cent{i} AS (
    SELECT cell, list(m ORDER BY dim) AS centroid
    FROM (
        SELECT cell, dim,
               CAST(SUM(CAST(val AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*) AS m
        FROM dims{i} GROUP BY cell, dim
    )
    GROUP BY cell
)"""
        )
    return ",\n".join(parts)


SQL_SIM_IVF_TRAINED = f"""
WITH {_sql_kmeans_ctes(KMEANS_K, KMEANS_ITERS)},
cent AS (SELECT * FROM cent{KMEANS_ITERS}),
member AS (
    SELECT vec_id, embedding, {_SQL_PICK_CELL} AS cell
    FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               {_sql_cosine('e.embedding', 'c.centroid')} AS c
        FROM embeddings e, cent c
    )
    GROUP BY vec_id, embedding
),
probes AS (
    SELECT vec_id AS probe_id, embedding AS probe_emb
    FROM embeddings WHERE vec_id % {PROBE_MOD} = 0
),
routed AS (
    SELECT probe_id, probe_emb, {_SQL_PICK_CELL} AS cell
    FROM (
        SELECT p.probe_id, p.probe_emb, c.cell,
               {_sql_cosine('p.probe_emb', 'c.centroid')} AS c
        FROM probes p, cent c
    )
    GROUP BY probe_id, probe_emb
),
scored AS (
    SELECT r.probe_id, m.vec_id, m.cell,
           {_sql_cosine('m.embedding', 'r.probe_emb')} AS cos_sim
    FROM member m JOIN routed r ON m.cell = r.cell
    WHERE m.vec_id <> r.probe_id
)
SELECT probe_id, vec_id, cell, cos_sim
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id ASC
    ) AS rk
    FROM scored
)
WHERE rk <= {K}
"""


# --- random-hyperplane LSH (SimHash-for-vectors) -----------------------------
#
# P(bit agrees) = 1 - angle/π, so near-identical vectors agree on almost every
# bit and banding finds them with high probability while random pairs share a
# 4-bit band only ~1/16 of the time. Hyperplane weights are a deterministic
# integer hash of (plane, dim) — no RNG — baked as literals into BOTH the Spark
# expressions and the oracle SQL, so signatures are bit-identical across engines
# (the dot products are the same left folds as _dot).
LSH_PLANES = 16
LSH_BAND_BITS = 4
LSH_BANDS = LSH_PLANES // LSH_BAND_BITS
EMB_DIM = 64  # fixture embedding width (FIXTURES.md); weights are per-dim literals


def _lsh_weights(p: int) -> list[float]:
    # murmur-style avalanche per (plane, dim): an affine formula here makes the
    # per-dim step constant mod the range, which leaves half the planes
    # constant-sign (dead signature bits) and all planes correlated — caught by
    # tests/test_banding_properties.py. Runs only at plan-build time; the
    # results are baked as literals into both engines' expressions.
    out = []
    for d in range(EMB_DIM):
        h = (p * 0x9E3779B1 + d * 0x85EBCA77) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0xC2B2AE3D) & 0xFFFFFFFF
        h ^= h >> 16
        out.append(float((h % 2001) - 1000))
    return out


def _lsh_band_cols(col_name: str = "embedding") -> list[Column]:
    """The LSH_BANDS band values of a vector's LSH signature, as columns.

    Each band is built as ONE ``F.expr`` over Spark-SQL text (the exact
    Catalyst twin of the former per-plane ``F.lit``/``F.array`` composition:
    same zip_with/aggregate fold, same literals, same cast chain — only the
    construction path changed). The literal form paid ~1 040 ``F.lit`` py4j
    round trips per plan build (~1.6 s driver-side at r16 measurement,
    guide §5: the driver should do almost no work); the text form is 4
    ``expr`` calls. Runs only at plan-build time — the executed plan is
    identical."""
    bands = []
    for b in range(LSH_BANDS):
        terms = []
        for i in range(LSH_BAND_BITS):
            p = b * LSH_BAND_BITS + i
            arr = "array(" + ", ".join(f"{x!r}D" for x in _lsh_weights(p)) + ")"
            dot = (
                f"aggregate(zip_with({col_name}, {arr}, "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "0.0D, (acc, x) -> acc + x)"
            )
            terms.append(f"(CAST(({dot} >= 0) AS INT) * {1 << i})")
        bands.append(F.expr(" + ".join(terms)).alias(f"b{b}"))
    return bands


def _sql_lsh_band(b: int) -> str:
    terms = []
    for i in range(LSH_BAND_BITS):
        p = b * LSH_BAND_BITS + i
        wlit = "[" + ", ".join(repr(x) for x in _lsh_weights(p)) + "]"
        dot = _SQL_DOT.format(a="embedding", b=wlit)
        terms.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END) * {1 << i}")
    return " + ".join(terms)


def q_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — the hash-routing sibling of q_sim_ivf's cell-routing.

    Candidate set = vectors sharing at least one signature band with the probe;
    exact cosine re-ranks the candidates and keeps the top-k. With a 1-row
    probe the band test is a broadcast filter (map-only over the corpus — the
    OR never becomes an all-pairs join); the many-probe form exploded on
    (band_idx, band_value) is an equi-join on bucket keys, the same shape as
    minhash LSH (operators/dedup.py) and q_sim_ivf_batch's routing join.

    Approximation is by design: recall depends on how strongly neighbors beat
    the 1 - angle/π coin flip; misses are possible and the oracle mirrors the
    same bucketing, so correctness is checked exactly while the operator stays
    honestly approximate (like ES ANN / FAISS-LSH).
    """
    e = fan_out(table(spark, sf_dir, "embeddings"))  # r17: spread the band folds
    sigs = e.select("vec_id", "label", "embedding", *_lsh_band_cols("embedding"))
    probe = sigs.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb"),
        *[F.col(f"b{b}").alias(f"p{b}") for b in range(LSH_BANDS)],
    )
    band_match = None
    for b in range(LSH_BANDS):
        m = F.col(f"b{b}") == F.col(f"p{b}")
        band_match = m if band_match is None else (band_match | m)
    cos = _cosine(F.col("embedding"), F.col("probe_emb"))
    return (
        sigs.filter(F.col("vec_id") != PROBE_VEC_ID)
        .join(F.broadcast(probe), band_match)
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(K)
    )


SQL_SIM_LSH = f"""
WITH sigs AS (
    SELECT vec_id, label, embedding,
           {", ".join(f"{_sql_lsh_band(b)} AS b{b}" for b in range(LSH_BANDS))}
    FROM embeddings
),
probe AS (
    SELECT embedding AS probe_emb,
           {", ".join(f"b{b} AS p{b}" for b in range(LSH_BANDS))}
    FROM sigs WHERE vec_id = {PROBE_VEC_ID}
)
SELECT vec_id, label, {_sql_cosine('embedding', 'probe_emb')} AS cos_sim
FROM sigs, probe
WHERE vec_id <> {PROBE_VEC_ID}
  AND ({" OR ".join(f"b{b} = p{b}" for b in range(LSH_BANDS))})
ORDER BY cos_sim DESC, vec_id ASC
LIMIT {K}
"""


def q_sim_lsh_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-probe LSH ANN — the bucket-join form of q_sim_lsh, for MANY probes.

    Candidate generation becomes a pure equi-join: both sides explode their
    signatures to (band_idx, band_value) rows and meet on the bucket key —
    exactly MinHash LSH's candidate shape (operators/dedup.py) and the hash-
    routing counterpart of q_sim_ivf_batch's centroid join. A probe and corpus
    vector meet once per shared band, so candidates are deduped on
    (probe, vec) before the exact cosine re-rank; per-probe top-k is a window
    over candidate rows only.

    Scale: the join shuffles on (band_idx, band_value) — linear in corpus +
    probes, never all-pairs; bucket skew (a hot band value) is AQE skew-join
    territory, and adding planes/bands tightens buckets at the cost of recall,
    the standard LSH dial. Here the probe side is small so Spark broadcasts
    it; with millions of probes the same plan degrades gracefully to a
    co-partitioned shuffle join on the bucket key.
    """
    e = fan_out(table(spark, sf_dir, "embeddings"))  # r17: spread the band folds
    # hoist the L2 norm to a per-VECTOR column: the candidate join fans each
    # vector out to many pairs, and recomputing the norm fold per pair tripled
    # the scoring cost (measured 17s -> ~6s at sf0.1). Same value, same fold —
    # the oracle hoists identically.
    sigs = e.select(
        "vec_id", "label", "embedding",
        _norm(F.col("embedding")).alias("nrm"),
        *_lsh_band_cols("embedding"),
    )
    bands_arr = F.array(
        *[F.struct(F.lit(b).alias("bi"), F.col(f"b{b}").alias("bv"))
          for b in range(LSH_BANDS)]
    )
    corpus = sigs.select(
        "vec_id", "label", "embedding", "nrm", F.explode(bands_arr).alias("band")
    ).select("vec_id", "label", "embedding", "nrm", "band.bi", "band.bv")
    probes = (
        sigs.filter(F.col("vec_id") % PROBE_MOD == 0)
        .select(F.col("vec_id").alias("probe_id"),
                F.col("embedding").alias("probe_emb"),
                F.col("nrm").alias("probe_nrm"),
                F.explode(bands_arr).alias("band"))
        .select("probe_id", "probe_emb", "probe_nrm", "band.bi", "band.bv")
    )
    cand = (
        corpus.join(probes, ["bi", "bv"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "probe_emb", "probe_nrm", "vec_id", "label",
                "embedding", "nrm")
        .dropDuplicates(["probe_id", "vec_id"])
    )
    # scoring stays a JVM fold: a fold-exact numpy pandas_udf was tried and
    # LOST here (~5.2s vs ~4.4s warm at sf0.1) — unlike q_sim_pairs, where the
    # pair matrix is built INSIDE the UDF, the candidate join has already
    # expanded the pairs, so the Arrow hop would ship 2×64 doubles per pair
    # (~250 MB at sf0.1) just to save interpreted adds. The hoisted norms keep
    # it one fold per pair.
    scored = cand.select(
        "probe_id",
        "vec_id",
        "label",
        (
            _dot(F.col("embedding"), F.col("probe_emb"))
            / (F.col("nrm") * F.col("probe_nrm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K)
        .select("probe_id", "vec_id", "label", "cos_sim")
    )


SQL_SIM_LSH_BATCH = f"""
WITH sigs AS (
    SELECT vec_id, label, embedding,
           {_sql_norm('embedding')} AS nrm,
           {", ".join(f"{_sql_lsh_band(b)} AS b{b}" for b in range(LSH_BANDS))}
    FROM embeddings
),
probes AS (
    SELECT vec_id AS probe_id, embedding AS probe_emb, nrm AS probe_nrm,
           {", ".join(f"b{b} AS p{b}" for b in range(LSH_BANDS))}
    FROM sigs WHERE vec_id % {PROBE_MOD} = 0
),
cand AS (
    SELECT p.probe_id, p.probe_emb, p.probe_nrm, s.vec_id, s.label,
           s.embedding, s.nrm
    FROM sigs s JOIN probes p
      ON ({" OR ".join(f"s.b{b} = p.p{b}" for b in range(LSH_BANDS))})
    WHERE s.vec_id <> p.probe_id
),
scored AS (
    SELECT probe_id, vec_id, label,
           {_SQL_DOT.format(a='embedding', b='probe_emb')} / (nrm * probe_nrm) AS cos_sim
    FROM cand
)
SELECT probe_id, vec_id, label, cos_sim
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id ASC
    ) AS rk
    FROM scored
)
WHERE rk <= {K}
"""


def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup DEDUP: the survivor set under keep-lowest-id.

    q_sim_pairs mines the near-dup pairs; this applies the dedup policy — drop
    every vector that has a same-label neighbor with a smaller id above the
    threshold (the transitive-closure-free greedy used by big corpus dedups:
    each duplicate names at least one earlier survivor-or-duplicate it matches).
    One anti-join over the (small) duplicate-id set; the quadratic part is the
    label-blocked pair mining, bounded exactly as at 100 TB by the block size.
    """
    e = table(spark, sf_dir, "embeddings")
    dups = q_sim_pairs(spark, sf_dir).select(F.col("b_id").alias("vec_id")).distinct()
    return e.join(dups, "vec_id", "left_anti").select("vec_id", "label")


SQL_DEDUP_EMBED = f"""
WITH pairs AS ({SQL_SIM_PAIRS})
SELECT vec_id, label
FROM embeddings
WHERE vec_id NOT IN (SELECT b_id FROM pairs)
"""


def q_sim_knn_pudf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force k-NN scored by a numpy pandas_udf — the production BLAS path.

    Same query shape as q_sim_knn; the cosine runs as `M @ q` over whole Arrow
    batches (one GEMV per batch) instead of a per-row JVM fold. This is what an
    embedding-heavy deployment runs at 100 TB: Arrow amortizes the JVM↔Python
    hop, BLAS amortizes the flops. The probe is ONE vector fetched driver-side
    (the only acceptable collect: k rows / single probe, never the corpus).

    BLAS pairwise summation reorders the float adds, so raw scores differ from
    the SQL mirror in final ulps — the oracle therefore compares the NEIGHBOR
    SET, not the scores: the top-k is computed with BLAS, then projected to
    (vec_id, label) sorted by id. Ulp noise can't flip set membership unless
    ranks k/k+1 are within float epsilon, which the fixture is nowhere near.
    """
    import numpy as np

    e = table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select("embedding").head()[0]
    q = np.asarray(probe, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf("double")
    def cos(emb):
        M = np.vstack(emb.to_numpy()).astype(np.float64)
        return pd.Series((M @ q) / (np.linalg.norm(M, axis=1) * qn))

    return (
        e.filter(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", "label", cos("embedding").alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(K)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


SQL_SIM_KNN_PUDF = f"""
WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
topk AS (
    SELECT vec_id, label,
           {_sql_cosine('embedding', 'probe_emb')} AS cos_sim
    FROM embeddings, probe
    WHERE vec_id <> {PROBE_VEC_ID}
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT {K}
)
SELECT vec_id, label FROM topk ORDER BY vec_id
"""


# --- int8 embedding quantization (index export / storage compression) --------

QUANT_LEVELS = 127  # symmetric int8: codes in [-127, 127]


def q_embed_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding — the storage/export form
    ANN systems ship (4× smaller than float32, SIMD-scorable): per vector,
    scale = max|v_i| / 127, code_i = floor(127 · v_i / max|v_i|).

    Long format (vec_id, dim, code, scale) — scalar columns only, so the
    result is hash-comparable (array outputs break value canonicalization).

    Scale: pure per-row codegen'd column math — no shuffle, no UDF; the
    posexplode is the export layout, not a plan cost. Cross-engine exactness
    needs no decimal detour: float32 inputs widen to exact doubles, the
    127·v/max chain is IEEE-identical in any engine, and floor is unambiguous
    (unlike round(), whose tie mode differs between engines). Zero vectors
    quantize to code 0 with scale 0 rather than dividing by zero.
    """
    e = table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    dims = e.select(
        "vec_id",
        maxabs.alias("ma"),
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    )
    code = (
        F.when(F.col("ma") == 0, F.lit(0))
        .otherwise(
            F.floor(F.lit(float(QUANT_LEVELS)) * F.col("val").cast("double") / F.col("ma"))
        )
        .cast("int")
    )
    return dims.select(
        "vec_id",
        "dim",
        code.alias("code"),
        (F.col("ma") / F.lit(float(QUANT_LEVELS))).alias("scale"),
    )


SQL_EMBED_QUANT = f"""
WITH prepared AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS ma
    FROM embeddings
)
SELECT vec_id, i - 1 AS dim,
       CAST(CASE WHEN ma = 0 THEN 0
                 ELSE floor({QUANT_LEVELS}.0 * CAST(embedding[i] AS DOUBLE) / ma)
            END AS INTEGER) AS code,
       ma / {QUANT_LEVELS}.0 AS scale
FROM prepared, unnest(range(1, len(embedding) + 1)) AS u(i)
"""


RANGE_COS_THRESHOLD = 0.25


def q_sim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold (range) similarity search: EVERY vector within cosine ≥ τ of the
    probe — the radius-query sibling of q_sim_knn's top-k. This is the primitive
    near-duplicate retrieval and recall-oriented RAG filters use when "give me k"
    is the wrong contract (result size is data-determined, not caller-capped).

    Same scale shape as q_sim_knn: the 1-row probe is broadcast, the scan is
    map-only, and the threshold filter prunes before any ordering — there is no
    top-k heap and no global sort; output order is by vec_id for determinism.
    At 100 TB the IVF/LSH routes (q_sim_ivf*, q_sim_lsh*) bound the scanned
    cells first; the in-cell scoring is exactly this query.
    """
    e = table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("embedding").alias("probe_emb")
    )
    cos = _cosine(F.col("embedding"), F.col("probe_emb"))
    return (
        e.filter(F.col("vec_id") != PROBE_VEC_ID)
        .join(F.broadcast(probe))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= RANGE_COS_THRESHOLD)
        .orderBy("vec_id")
    )


SQL_SIM_RANGE = f"""
WITH probe AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = {PROBE_VEC_ID})
SELECT vec_id, label,
       {_sql_cosine('embedding', 'probe_emb')} AS cos_sim
FROM embeddings, probe
WHERE vec_id <> {PROBE_VEC_ID}
  AND {_sql_cosine('embedding', 'probe_emb')} >= {RANGE_COS_THRESHOLD}
ORDER BY vec_id
"""


QUERIES = {
    "q_sim_knn": q_sim_knn,
    "q_sim_pairs": q_sim_pairs,
    "q_sim_ivf": q_sim_ivf,
    "q_sim_ivf_batch": q_sim_ivf_batch,
    "q_sim_ivf_trained": q_sim_ivf_trained,
    "q_sim_lsh": q_sim_lsh,
    "q_sim_lsh_batch": q_sim_lsh_batch,
    "q_dedup_embed": q_dedup_embed,
    "q_sim_knn_pudf": q_sim_knn_pudf,
    "q_embed_quant": q_embed_quant,
    "q_sim_range": q_sim_range,
}

ORACLES = {
    "q_sim_knn": SQL_SIM_KNN,
    "q_sim_pairs": SQL_SIM_PAIRS,
    "q_sim_ivf": SQL_SIM_IVF,
    "q_sim_ivf_batch": SQL_SIM_IVF_BATCH,
    "q_sim_ivf_trained": SQL_SIM_IVF_TRAINED,
    "q_sim_lsh": SQL_SIM_LSH,
    "q_sim_lsh_batch": SQL_SIM_LSH_BATCH,
    "q_dedup_embed": SQL_DEDUP_EMBED,
    # neighbor-set projection — set membership is ulp-stable even though BLAS scores aren't
    "q_sim_knn_pudf": SQL_SIM_KNN_PUDF,
    "q_embed_quant": SQL_EMBED_QUANT,
    "q_sim_range": SQL_SIM_RANGE,
}
