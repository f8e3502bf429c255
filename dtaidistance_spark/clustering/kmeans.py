"""DTW k-means with DBA means (SURVEY §2 C1;
``ref:dtaidistance/clustering/kmeans.py::KMeans`` semantics, re-expressed
Spark-first).

Driver-side loop; per iteration:

- **assign** (``mapInPandas``): every Arrow batch of series is scored
  against the k broadcast centers with the batched anti-diagonal DTW
  kernel (:func:`dtaidistance_spark.kernels.dtw_distance_batch`) — one
  DP per center over the whole batch, argmin per row. No shuffle.
- **update**: one hash shuffle on cluster id — literally
  :func:`dtaidistance_spark.operators.rollup.dba_rollup` with the
  cluster as the key and a constant timestamp (one rollup window per
  cluster), so the tested JVM-side sort/sample/Arrow path and the
  mega-batched DBA kernel are reused verbatim.

Determinism (resume/parity contract): centers are initialized from the
k docs with the smallest ``xxhash64(doc_id)`` (seeded, data-independent
of partitioning), iteration count is fixed, ties in argmin go to the
lowest cluster index, and DBA members are sorted by doc_id — the
single-process twin (:func:`dtw_kmeans_local`) reproduces the Spark
result exactly (gated in tests).

Empty clusters keep their previous center (the reference drops or
reseeds depending on options; keeping is deterministic and mask-safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from dtaidistance_spark import kernels as K
from dtaidistance_spark.operators import rollup as R

_EPOCH = "2026-01-01 00:00:00"


def _prep_local(tokens, length: int) -> np.ndarray:
    return K.paa(np.asarray(tokens, dtype=np.float64), length)


def init_centers(df: DataFrame, k: int, length: int,
                 id_col: str = "doc_id", value_col: str = "tokens") -> np.ndarray:
    """k seed centers: the k docs with smallest xxhash64(doc_id)."""
    rows = (
        df.select(id_col, value_col)
        .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    return np.stack([_prep_local(r[value_col], length) for r in rows])


def init_centers_pp(df: DataFrame, k: int, length: int, window: int,
                    id_col: str = "doc_id", value_col: str = "tokens") -> np.ndarray:
    """Deterministic k-means++-style seeding under DTW (the upstream
    ``kmeansplusplus_centers`` option, made resume-safe): the first
    center is the doc with the smallest xxhash64(doc_id); each further
    center is the doc FARTHEST (max min-DTW-distance to the chosen
    centers, ties to the LARGEST doc_id) — the farthest-point variant
    of k-means++ (deterministic argmax instead of d²-weighted sampling,
    which would need a random draw the resume contract forbids; spread
    quality is the same mechanism).

    Distributed shape: k-1 passes, each ONE mapInPandas scoring pass
    (batched DTW vs the newest center only, folded into a running min —
    each pass persisted so lineage never re-scores earlier centers)
    + a max_by aggregate; no shuffle of the series themselves. Ties on
    the max min-distance go to the LARGEST doc_id (struct max_by order,
    mirrored exactly by the local twin)."""
    centers = [init_centers(df, 1, length, id_col, value_col)[0]]
    scored = df.select(
        F.col(id_col).cast("string").alias(id_col),
        F.col(value_col).cast("array<double>").alias(value_col),
        F.lit(float("inf")).alias("_mind"),
    )
    win = window
    prev_cached = None

    for _ in range(k - 1):
        def kernel(batches, newest=centers[-1].copy()):
            # default-arg binding: the closure must freeze THIS
            # iteration's center even if a stage is re-executed later
            for pdf in batches:
                mat = np.stack([_prep_local(t, length) for t in pdf[value_col]])
                lens = np.full(len(mat), length, dtype=np.int64)
                d = K.dtw_distance_batch(newest, mat, lens, window=win)
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    value_col: pdf[value_col],
                    "_mind": np.minimum(
                        pdf["_mind"].to_numpy(dtype=np.float64), d
                    ),
                })

        scored = scored.mapInPandas(
            kernel, f"{id_col} string, {value_col} array<double>, _mind double"
        ).persist()
        far = scored.agg(
            F.max_by(
                F.struct(id_col, value_col), F.struct("_mind", F.col(id_col))
            ).alias("s")
        ).select("s.*").collect()[0]
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = scored
        centers.append(_prep_local(far[value_col], length))
    if prev_cached is not None:
        prev_cached.unpersist()
    return np.stack(centers)


def kmeanspp_centers_local(pdf: pd.DataFrame, k: int, length: int, window: int,
                           hash_fn, id_col: str = "doc_id",
                           value_col: str = "tokens") -> np.ndarray:
    """Single-process exact twin of :func:`init_centers_pp`."""
    mats = np.stack([_prep_local(t, length) for t in pdf[value_col]])
    lens = np.full(len(mats), length, dtype=np.int64)
    ids = [str(x) for x in pdf[id_col]]
    first = min(range(len(ids)), key=lambda i: (hash_fn(ids[i]), ids[i]))
    chosen = [first]
    mind = K.dtw_distance_batch(mats[first], mats, lens, window=window)
    for _ in range(k - 1):
        # max min-distance, ties to the LARGEST doc_id (Spark max_by
        # over struct(_mind, id) — the whole struct is maximized)
        far = max(range(len(ids)), key=lambda i: (mind[i], ids[i]))
        chosen.append(far)
        mind = np.minimum(
            mind, K.dtw_distance_batch(mats[far], mats, lens, window=window)
        )
    return mats[chosen].copy()


def assign_step(
    df: DataFrame, centers: np.ndarray, length: int, window: int,
    id_col: str = "doc_id", value_col: str = "tokens",
) -> DataFrame:
    """(doc_id, cluster, dist): argmin over k batched DTW evaluations.

    Centers ride an EXPLICIT Spark broadcast (round-5 hygiene): closure
    capture pickles the (k, length) matrix into every serialized task,
    while a broadcast ships it once per executor — the difference is
    noise at k=3 but real at k=1000×1024 floats.  The kernel copies
    out of the broadcast buffer once per task (numpy views over the
    pickled buffer are read-only)."""
    k = len(centers)
    bcast = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(centers)
    )

    def kernel(batches):
        bc = np.array(bcast.value, dtype=np.float64, copy=True)
        # cascading LB-pruned assignment (SURVEY C1): center 0 seeds the
        # running best; every later center first bounds each member with
        # LB_Keogh vs the CENTER's envelope (one envelope per center per
        # batch) and runs the full DP only where lb < best, with
        # max_dist = the batch's worst best for early abandon. Exact:
        # lb >= best implies d >= best, and equal-distance ties keep the
        # earlier center either way — identical argmin to the dense
        # k x B distance matrix.
        for pdf in batches:
            mat = np.stack([_prep_local(t, length) for t in pdf[value_col]])
            lens = np.full(len(mat), length, dtype=np.int64)
            best = K.dtw_distance_batch(bc[0], mat, lens, window=window)
            cl = np.zeros(len(mat), dtype=np.int64)
            for c in range(1, k):
                lo, hi = K.lb_keogh_envelope(bc[c], window)
                above = np.maximum(mat - hi[None, :], 0.0)
                below = np.maximum(lo[None, :] - mat, 0.0)
                lb = np.sqrt((above * above + below * below).sum(axis=1))
                cand = lb < best
                if not cand.any():
                    continue
                d = K.dtw_distance_batch(
                    bc[c], mat[cand], lens[cand], window=window,
                    max_dist=float(np.max(best[cand])),
                )
                upd = d < best[cand]
                idx = np.nonzero(cand)[0][upd]
                best[idx] = d[upd]
                cl[idx] = c
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cluster": cl.astype(np.int32),
                    "dist": best,
                }
            )

    return df.select(id_col, value_col).mapInPandas(
        kernel, f"{id_col} string, cluster int, dist double"
    )


def dtw_kmeans(
    df: DataFrame, k: int = 3, max_it: int = 3, length: int = 64,
    window: int = 8, max_members: int = 256, dba_max_it: int = 2,
    id_col: str = "doc_id", value_col: str = "tokens",
    init: str = "hash", drop_stddev: float | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Returns (assignments DataFrame, centers (k, length)).

    ``init``: 'hash' (k smallest xxhash64(doc_id), the default) or
    'kmeans++' (deterministic farthest-point seeding under DTW,
    upstream's ``kmeansplusplus_centers`` option).

    ``drop_stddev``: upstream's per-cluster variance monitor — members
    whose assignment distance exceeds mean + drop_stddev * stddev_samp
    of their cluster are EXCLUDED from that iteration's DBA update
    (still assigned); clusters too small for a sample stddev keep all
    members. Pure SQL aggregate + broadcast join, no extra kernel
    work."""
    df = df.select(id_col, value_col).persist()
    if init == "kmeans++":
        centers = init_centers_pp(df, k, length, window, id_col, value_col)
    else:
        centers = init_centers(df, k, length, id_col, value_col)
    assigned = None
    for _ in range(max_it):
        assigned = assign_step(df, centers, length, window, id_col, value_col)
        keep = assigned.select(id_col, "cluster")
        if drop_stddev is not None:
            from pyspark.sql.functions import broadcast

            stats = assigned.groupBy("cluster").agg(
                F.avg("dist").alias("_m"),
                F.stddev_samp("dist").alias("_s"),
            )
            keep = (
                assigned.join(broadcast(stats), "cluster")
                .where(
                    F.col("_s").isNull()
                    | (F.col("dist") <= F.col("_m") + drop_stddev * F.col("_s"))
                )
                .select(id_col, "cluster")
            )
        members = df.join(keep, id_col)
        rolled = R.dba_rollup(
            members.withColumn("_ts", F.lit(_EPOCH).cast("timestamp")),
            tier="1 day", key_col="cluster", value_col=value_col,
            ts_col="_ts", id_col=id_col, max_members=max_members,
            dba_window=window, dba_max_it=dba_max_it,
            barycenter_len=length,
        )
        new = {int(r["key"]): np.asarray(r["barycenter"]) for r in rolled.collect()}
        centers = np.stack([new.get(c, centers[c]) for c in range(k)])
    final = assign_step(df, centers, length, window, id_col, value_col)
    df.unpersist()
    return final, centers


def dtw_kmeans_local(
    pdf: pd.DataFrame, k: int = 3, max_it: int = 3, length: int = 64,
    window: int = 8, max_members: int = 256, dba_max_it: int = 2,
    id_col: str = "doc_id", value_col: str = "tokens",
    hash_fn=None, init: str = "hash", drop_stddev: float | None = None,
) -> tuple[pd.DataFrame, np.ndarray, int]:
    """Single-process exact twin (the parity oracle). ``hash_fn`` maps
    doc_id -> the same value Spark's xxhash64 produces (pass a dict
    built once via Spark, or any deterministic surrogate for pure-local
    experiments).

    Returns ``(assignments, centers, performed_it)`` — the iteration
    count actually performed: the loop stops once an update leaves every
    center bit-identical (upstream KMeans semantics, where callers use
    ``performed_it < max_it`` to detect convergence). Stopping early
    cannot change the result — converged centers reproduce themselves —
    so exact parity with the fixed-iteration Spark driver holds."""
    d = pdf.copy()
    mats = np.stack([_prep_local(t, length) for t in d[value_col]])
    lens = np.full(len(mats), length, dtype=np.int64)
    if init == "kmeans++":
        centers = kmeanspp_centers_local(
            d, k, length, window, hash_fn, id_col, value_col
        )
    else:
        order = sorted(range(len(d)), key=lambda i: (hash_fn(d[id_col].iloc[i]), d[id_col].iloc[i]))
        centers = mats[order[:k]].copy()

    def assign(centers):
        dists = np.stack(
            [K.dtw_distance_batch(centers[c], mats, lens, window=window) for c in range(k)]
        )
        cl = np.argmin(dists, axis=0)
        return cl, dists[cl, np.arange(len(mats))]

    performed_it = 0
    for _ in range(max_it):
        cl, dist_it = assign(centers)
        trimmed = np.zeros(len(cl), dtype=bool)
        if drop_stddev is not None:
            for c in range(k):
                sel = cl == c
                if sel.sum() >= 2:
                    m = float(np.mean(dist_it[sel]))
                    s = float(np.std(dist_it[sel], ddof=1))
                    trimmed |= sel & (dist_it > m + drop_stddev * s)
        new_centers = centers.copy()
        for c in range(k):
            idx = [
                i
                for i in sorted(range(len(d)), key=lambda i: d[id_col].iloc[i])
                if cl[i] == c and not trimmed[i]
            ]
            if not idx:
                continue
            arrays = [np.asarray(d[value_col].iloc[i], dtype=np.float64) for i in idx]
            center, _, _ = R.rollup_group(
                arrays, max_members=max_members, dba_window=window,
                dba_max_it=dba_max_it, barycenter_len=length,
            )
            new_centers[c] = center
        performed_it += 1
        converged = np.array_equal(new_centers, centers)
        centers = new_centers
        if converged:
            break
    cl, dist = assign(centers)
    out = pd.DataFrame({id_col: d[id_col].values, "cluster": cl.astype(np.int32), "dist": dist})
    return out, centers, performed_it
