"""Approximate nearest neighbour search over embedding columns.

Three tiers (SURVEY-style cascade, same pattern as the DTW LB cascade):

- :func:`brute_cosine_topk` — exact, JVM-side ``zip_with``/``aggregate``
  dot products + a top-k window; the baseline and the verification tier.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane LSH
  (Charikar 2002). Signatures are computed in ONE vectorized pandas UDF
  (a single BLAS matmul per Arrow batch: (batch x dim) @ (dim x
  tables*planes)); candidates come from a bucket equi-join (shuffle
  keyed on (table, bucket) — never N²), then exact cosine ranks the
  candidates. Recall is tunable with n_tables/n_planes and measured by
  the ``ann_lsh_recall`` registry query.
- :func:`ivf_cosine_topk` — IVF-Flat (the FAISS coarse-quantizer
  layout): spherical-k-means centroids trained driver-side on a
  deterministic sample, corpus shuffled once onto inverted lists,
  queries probe their ``n_probe`` nearest lists. Recall measured by
  ``ann_ivf_recall``.

Hyperplanes are seeded deterministically — same buckets every run and
every partitioning (resume-safe, like every kernel in this engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

SEED = 42


def _planes(dim: int, n_tables: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((dim, n_tables * n_planes))


def add_lsh_buckets(
    emb: DataFrame, dim: int, n_tables: int = 8, n_planes: int = 12,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``buckets array<long>`` (one signed-bit bucket per table)
    via a single matmul per Arrow batch."""
    planes = _planes(dim, n_tables, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        bits = (mat @ planes) > 0  # (batch, tables*planes)
        bits = bits.reshape(len(mat), n_tables, n_planes)
        codes = (bits * weights).sum(axis=2)  # (batch, tables)
        # namespace buckets by table so one join key suffices
        codes = codes + (np.arange(n_tables) << np.int64(n_planes))
        return pd.Series(list(codes))

    return emb.withColumn("buckets", buckets(F.col(vec_col)))


def _norm_dot(a_col: str, b_col: str):
    dot = F.aggregate(
        F.zip_with(a_col, b_col, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a_col, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b_col, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query side, rank
    with a per-query window.

    Norms are materialized ONCE per row on each side before the join
    (higher-order array functions are interpreted, not codegen'd — the
    per-pair form recomputed every corpus norm per query and every
    query norm per corpus row; hoisting is bit-identical, same left
    fold per row, and cuts the interpreted work to the dot product)."""
    norm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    corpus = emb.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).cast("array<double>").alias("_c"),
    ).withColumn("_cn", norm(F.col("_c")))
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
    ).withColumn("_qn", norm(F.col("_q")))
    dot = F.aggregate(
        F.zip_with("_q", "_c", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("query_id") != F.col("nn_id"))
        .withColumn("cosine", dot / (F.col("_qn") * F.col("_cn")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("nn_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def lsh_cosine_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_tables: int = 8, n_planes: int = 12,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact-rank them."""
    corpus = add_lsh_buckets(emb, dim, n_tables, n_planes, vec_col).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).cast("array<double>").alias("_c"),
        F.explode("buckets").alias("_bkt"),
    )
    qs = add_lsh_buckets(queries, dim, n_tables, n_planes, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
        F.explode("buckets").alias("_bkt"),
    )
    cands = (
        corpus.join(qs, on="_bkt")
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "_q", "nn_id", "_c")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        cands.withColumn("cosine", _norm_dot("_q", "_c"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def train_ivf_centroids(
    emb: DataFrame, dim: int, n_list: int = 16, sample: int = 4096,
    max_it: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Train the IVF coarse quantizer: spherical k-means (cosine
    geometry — vectors and centroids unit-normalized) on a
    deterministic hash-ordered sample, Lloyd-iterated in numpy on the
    driver.

    Scale shape (the FAISS-IVF recipe): the TRAINED object is tiny
    (n_list x dim floats — a few MB even at n_list=2^16), so training
    on a bounded sample driver-side and broadcasting the centroids into
    the assignment UDF is the production pattern; only assignment and
    search are distributed. Sample order is ``xxhash64(id)`` — same
    centroids every run and every partitioning (resume-safe)."""
    rows = (
        emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(SEED)
    C = X[rng.choice(len(X), size=min(n_list, len(X)), replace=False)]
    for _ in range(max_it):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.sum(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def add_ivf_lists(
    emb: DataFrame, centroids: np.ndarray, n_probe: int = 1,
    vec_col: str = "embedding", out_col: str = "list_ids",
) -> DataFrame:
    """Append ``list_ids array<int>``: the ``n_probe`` nearest coarse
    centroids per vector (one BLAS matmul per Arrow batch). Corpus
    vectors use n_probe=1 (their inverted list); queries probe several."""
    C = centroids

    @pandas_udf("array<int>")
    def lists(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ C.T
        p = min(n_probe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p].astype(np.int32)
        return pd.Series(list(top))

    return emb.withColumn(out_col, lists(F.col(vec_col)))


def ivf_cosine_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_list: int = 16, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k (the second scale path next to LSH):
    corpus vectors shuffle once onto their inverted list; each query
    probes its ``n_probe`` closest lists; candidates are exact-cosine
    ranked. Work per query scales with n_probe/n_list of the corpus,
    never N². Imbalanced lists (clustered corpora) are AQE-skew-join
    territory — same mitigation as every bucket join in this engine."""
    if centroids is None:
        centroids = train_ivf_centroids(
            emb, dim, n_list=n_list, id_col=id_col, vec_col=vec_col
        )
    corpus = add_ivf_lists(emb, centroids, 1, vec_col).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).cast("array<double>").alias("_c"),
        F.explode("list_ids").alias("_list"),
    )
    qs = add_ivf_lists(queries, centroids, n_probe, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
        F.explode("list_ids").alias("_list"),
    )
    cands = (
        corpus.join(qs, on="_list")
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "_q", "nn_id", "_c")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        cands.withColumn("cosine", _norm_dot("_q", "_c"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cosine", 4).alias("cosine"))
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> DataFrame:
    """recall@k of the approximate result vs the exact one."""
    a = approx.where(F.col("rank") <= k).select("query_id", "nn_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "nn_id")
    hit = a.join(e, ["query_id", "nn_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("hits")
    )
    per_q = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("total")).join(
        hit, "query_id", "left"
    ).select(
        "query_id",
        (F.coalesce(F.col("hits"), F.lit(0)) / F.col("total")).alias("recall"),
    )
    return per_q.agg(F.round(F.avg("recall"), 4).alias("recall_at_k"))


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized codes on the inverted lists (Jegou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
# FAISS IVFPQ layout, with by_residual=True: codes quantize the RESIDUAL
# x_norm − centroid[list(x)], the standard FAISS recall lift — residuals
# are centered and much smaller than raw vectors, so the same code
# budget spends its resolution where the coarse quantizer left error).
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    emb: DataFrame, dim: int, m: int = 8, ks: int = 32, sample: int = 4096,
    max_it: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Train the product quantizer: split the (unit-normalized) vector
    into ``m`` subspaces of ``dim/m`` dims, run a seeded L2 Lloyd
    k-means with ``ks`` centroids independently in each subspace, on the
    same deterministic hash-ordered sample as the coarse quantizer.
    Returns ``(m, ks, dim/m)``. Like the IVF centroids, the trained
    object is tiny (m*ks*dsub floats) — train driver-side once,
    broadcast into the encode/search UDFs.

    With ``centroids`` given, trains on RESIDUALS (each sample minus its
    nearest coarse centroid) — ``by_residual=True``."""
    assert dim % m == 0, "dim must split evenly into m subspaces"
    dsub = dim // m
    rows = (
        emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if centroids is not None:
        X = X - centroids[np.argmax(X @ centroids.T, axis=1)]
    rng = np.random.default_rng(SEED)
    books = np.empty((m, ks, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ks, len(S)), replace=False)]
        for _ in range(max_it):
            d2 = (
                (S * S).sum(1)[:, None]
                - 2.0 * (S @ C.T)
                + (C * C).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j, : len(C)] = C
        if len(C) < ks:  # degenerate tiny-sample case: pad by repeat
            books[j, len(C):] = C[0]
    return books


def encode_pq(
    emb: DataFrame, codebooks: np.ndarray,
    vec_col: str = "embedding", out_col: str = "pq_code",
    centroids: np.ndarray | None = None, list_col: str = "list_ids",
) -> DataFrame:
    """Append ``pq_code array<int>`` (m sub-codes per vector): one
    vectorized argmin per subspace per Arrow batch. This column — a few
    BYTES per vector instead of dim floats — is what the corpus side of
    the search shuffles and stores; at 100 TB the raw embedding column
    never leaves the scan.

    With ``centroids`` given, encodes the RESIDUAL vs the row's coarse
    list (``list_col[0]``, as appended by :func:`add_ivf_lists`) —
    ``by_residual=True``."""
    m, ks, dsub = codebooks.shape
    CB = codebooks
    CC = centroids

    def _encode(mat: np.ndarray) -> np.ndarray:
        out = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            S = mat[:, j * dsub : (j + 1) * dsub]
            C = CB[j]
            d2 = (
                (S * S).sum(1)[:, None]
                - 2.0 * (S @ C.T)
                + (C * C).sum(1)[None, :]
            )
            out[:, j] = np.argmin(d2, axis=1)
        return out

    if CC is None:

        @pandas_udf("array<int>")
        def codes(v: pd.Series) -> pd.Series:
            mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            return pd.Series(list(_encode(mat)))

        return emb.withColumn(out_col, codes(F.col(vec_col)))

    @pandas_udf("array<int>")
    def codes_res(v: pd.Series, lists: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        lid = np.asarray([int(ls[0]) for ls in lists])
        return pd.Series(list(_encode(mat - CC[lid])))

    return emb.withColumn(out_col, codes_res(F.col(vec_col), F.col(list_col)))


def ivf_pq_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_list: int = 16, n_probe: int = 4, m: int = 8, ks: int = 32,
    id_col: str = "vec_id", vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    by_residual: bool = True,
    refine: int | None = 4,
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-bounded scale tier below
    IVF-Flat: the corpus crosses the list shuffle as (id, m sub-codes)
    only, and candidates are ranked by asymmetric distance (query side
    exact, corpus side reconstructed from the codebooks). The scoring
    UDF reconstructs gathered centroids and dots them against the
    normalized query — arithmetically the SAME sum as the classic
    per-query ADC lookup table (grouped by subspace), kept in gather
    form so one einsum per Arrow batch covers all queries in the batch.

    ``by_residual=True`` (the FAISS default and recall lift): codes
    quantize x_norm − C[list], and ADC scores q·C[list] + q·recon(r) —
    the coarse term is exact, the PQ budget covers only the residual.

    ``refine`` (FAISS's IVFPQR / refine stage): the top ``refine·k`` ADC
    candidates per query are re-ranked by EXACT cosine. The raw vectors
    for that are fetched by a semi-join on the ≤ refine·k·n_queries
    surviving ids — the 100 TB corpus embedding column still never
    crosses the candidate shuffle; only the tiny winner set is re-read.
    Recall then approaches the IVF-Flat ceiling for the same probe
    budget while the candidate scan stays PQ-cheap. ``refine=None``
    returns raw ADC ranking. Measured by ``ann_ivfpq_recall``."""
    if centroids is None:
        centroids = train_ivf_centroids(
            emb, dim, n_list=n_list, id_col=id_col, vec_col=vec_col
        )
    if codebooks is None:
        codebooks = train_pq_codebooks(
            emb, dim, m=m, ks=ks, id_col=id_col, vec_col=vec_col,
            centroids=centroids if by_residual else None,
        )
    mm, _, dsub = codebooks.shape
    CB = codebooks
    CC = centroids if by_residual else None

    with_lists = add_ivf_lists(emb, centroids, 1, vec_col)
    corpus = encode_pq(
        with_lists, codebooks, vec_col,
        centroids=CC, list_col="list_ids",
    ).select(
        F.col(id_col).alias("nn_id"),
        "pq_code",
        F.explode("list_ids").alias("_list"),
    )
    qs = add_ivf_lists(queries, centroids, n_probe, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
        F.explode("list_ids").alias("_list"),
    )

    @pandas_udf("double")
    def adc(code: pd.Series, q: pd.Series, lst: pd.Series) -> pd.Series:
        codes_ = np.asarray([np.asarray(c, dtype=np.int64) for c in code])
        qmat = np.asarray([np.asarray(x, dtype=np.float64) for x in q])
        qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
        recon = CB[np.arange(mm)[None, :], codes_]  # (b, m, dsub)
        recon = recon.reshape(len(codes_), mm * dsub)
        if CC is not None:
            recon = recon + CC[np.asarray(lst, dtype=np.int64)]
        return pd.Series(np.einsum("bd,bd->b", qmat, recon))

    cands = (
        corpus.join(qs, on="_list")
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "_q", "nn_id", "pq_code", "_list")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("nn_id")
    )
    scored = (
        cands.withColumn("approx_cosine", adc("pq_code", "_q", "_list"))
        .withColumn("rank", F.row_number().over(w))
    )
    if refine is None:
        return scored.where(F.col("rank") <= k).select(
            "query_id", "nn_id", "rank",
            F.round("approx_cosine", 4).alias("approx_cosine"),
        )
    pool = scored.where(F.col("rank") <= refine * k).select(
        "query_id", "_q", "nn_id"
    )
    raw = emb.select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).cast("array<double>").alias("_c"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("nn_id")
    )
    return (
        pool.join(raw, "nn_id")
        .withColumn("approx_cosine", _norm_dot("_q", "_c"))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "nn_id", "rank",
            F.round("approx_cosine", 4).alias("approx_cosine"),
        )
    )


def semdedup(
    emb: DataFrame,
    dim: int,
    n_list: int = 16,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by cosine
    similarity WITHIN k-means clusters — a document is dropped iff some
    lower-id document in its cluster is >= ``tau`` cosine-similar
    (lowest id = canonical keeper, deterministic).

    Scale shape: the cluster assignment reuses the IVF coarse quantizer
    (driver-trained on a bounded hash-ordered sample, broadcast into
    one BLAS matmul per Arrow batch), so the pair generation is a
    self-join ON THE CLUSTER KEY — work scales with sum(cluster_size^2)
    = N^2/n_list for balanced clusters, never all-pairs; n_list grows
    with the corpus (FAISS sizing: ~sqrt(N) lists) to hold the
    per-cluster quadratic cost constant. Invariant (gated): among kept
    rows no same-cluster pair reaches tau, because a would-be duplicate
    always has the lower-id end as witness regardless of that witness's
    own keep status.

    Returns (id, cluster, keep boolean).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            emb, dim, n_list=n_list, id_col=id_col, vec_col=vec_col
        )
    assigned = (
        add_ivf_lists(emb, centroids, n_probe=1, vec_col=vec_col, out_col="_l")
        .withColumn("cluster", F.element_at("_l", 1))
        .drop("_l")
    ).persist()
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
        "cluster",
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        "cluster",
    )
    dup_of = (
        a.join(b, "cluster")
        .where(F.col("id_b") < F.col("id_a"))
        .where(_norm_dot("va", "vb") >= tau)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(
            dup_of.withColumn("_dup", F.lit(True)), id_col, "left"
        )
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# E7 — int8 scalar quantization (the vector-DB storage staple: 4x less
# memory/IO than float32, SIMD-int8 distance kernels downstream). Train
# stats are per-dimension (mn, mx) over the corpus; code
# q = floor((x - mn) * 255 / (mx - mn) + 0.5) in [0, 255]; dequantize
# xr = mn + q * (mx - mn) / 255. Everything is deterministic float
# arithmetic on identical inputs — bit-portable across engines.
# ---------------------------------------------------------------------------

_SQ8_Q = (
    "CASE WHEN {mx} > {mn} THEN CAST(floor((({x}) - {mn})"
    " * CAST(255 AS DOUBLE) / ({mx} - {mn}) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " ELSE CAST(0 AS BIGINT) END"
)
_SQ8_XR = (
    "CASE WHEN {mx} > {mn} THEN {mn} + CAST({q} AS DOUBLE)"
    " * ({mx} - {mn}) / CAST(255 AS DOUBLE) ELSE {mn} END"
)


def sq8_dim_stats(emb: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (i, n, mn, mx) training stats: posexplode +
    ONE map-side-combined groupBy(i) — the shuffle carries 64 rows per
    task regardless of corpus size."""
    vals = emb.select(
        F.posexplode(
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
        ).alias("i", "x")
    )
    return vals.groupBy("i").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )


def sq8_reconstructed(emb: DataFrame, dim: int, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """(id, reconstructed array<double>) after an int8 quantize →
    dequantize round trip. The 64-entry stat arrays ride a broadcast
    cross join (a few KB); codes and reconstruction are per-row HOFs
    inside codegen — zero extra shuffles over the corpus."""
    stats = sq8_dim_stats(emb, id_col, vec_col)
    arrs = stats.agg(
        F.sort_array(F.collect_list(F.struct("i", "mn", "mx"))).alias("_s")
    ).select(
        F.expr("transform(_s, s -> s.mn)").alias("_mns"),
        F.expr("transform(_s, s -> s.mx)").alias("_mxs"),
    )
    q = _SQ8_Q.format(
        x=f"CAST(element_at({vec_col}, j + 1) AS DOUBLE)",
        mn="element_at(_mns, j + 1)",
        mx="element_at(_mxs, j + 1)",
    )
    xr = _SQ8_XR.format(
        q=q, mn="element_at(_mns, j + 1)", mx="element_at(_mxs, j + 1)"
    )
    return (
        emb.crossJoin(F.broadcast(arrs))
        .select(
            F.col(id_col),
            F.expr(f"transform(sequence(0, {dim} - 1), j -> {xr})").alias(
                vec_col
            ),
        )
    )


# ---------------------------------------------------------------------------
# Multi-probe LSH (Lv et al., VLDB 2007): instead of buying recall with
# MORE tables (each one replicates the corpus index), the QUERY probes
# extra buckets per table — the codes obtained by flipping the bits
# whose hyperplane margins are smallest. Corpus-side cost is unchanged;
# only the tiny query side fans out.
# ---------------------------------------------------------------------------


def add_lsh_multiprobe_buckets(
    emb: DataFrame, dim: int, n_tables: int = 4, n_planes: int = 4,
    n_flip: int = 2, vec_col: str = "embedding",
) -> DataFrame:
    """Append ``buckets array<long>``: per table, the base bucket plus
    the ``n_flip`` Hamming-1 perturbations flipping the
    smallest-|projection| bits (the classic multi-probe sequence) —
    (1 + n_flip) · n_tables probe buckets per query."""
    planes = _planes(dim, n_tables, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        proj = (mat @ planes).reshape(len(mat), n_tables, n_planes)
        bits = proj > 0
        base = (bits * weights).sum(axis=2)  # (batch, tables)
        ns = np.arange(n_tables) << np.int64(n_planes)
        # flip order: ascending |margin| per (row, table)
        order = np.argsort(np.abs(proj), axis=2)[:, :, :n_flip]
        out = []
        for r in range(len(mat)):
            probes = list(base[r] + ns)
            for t in range(n_tables):
                for f in range(order.shape[2]):
                    probes.append(
                        (base[r, t] ^ weights[order[r, t, f]]) + ns[t]
                    )
            out.append(np.asarray(probes, dtype=np.int64))
        return pd.Series(out)

    return emb.withColumn("buckets", buckets(F.col(vec_col)))


def lsh_multiprobe_topk(
    emb: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_tables: int = 4, n_planes: int = 4, n_flip: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: the corpus is bucketed ONCE per table
    (n_tables× index replication — 4× smaller here than the
    single-probe tier's 16 tables); queries fan out to the Hamming-1
    probe sequence. Candidates are exact-ranked like every other tier."""
    corpus = add_lsh_buckets(emb, dim, n_tables, n_planes, vec_col).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).cast("array<double>").alias("_c"),
        F.explode("buckets").alias("_bkt"),
    )
    qs = add_lsh_multiprobe_buckets(
        queries, dim, n_tables, n_planes, n_flip, vec_col
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_q"),
        F.explode("buckets").alias("_bkt"),
    )
    cands = (
        corpus.join(qs, on="_bkt")
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "_q", "nn_id", "_c")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        cands.withColumn("cosine", _norm_dot("_q", "_c"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nn_id", "rank", F.round("cosine", 4).alias("cosine"))
    )
