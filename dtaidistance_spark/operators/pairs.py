"""Pairwise / set-level DTW operators — the reference's "joins".

Replaces ``ref:dtaidistance/dtw.py::distance_matrix(block=...)`` (M1/M2)
with the relational formulation: a condensed pairs DataFrame
``(id_a, id_b, dist)`` with ``id_a < id_b`` — the dense N×N matrix is
never materialized (SURVEY §4.3).

Scale design — the LB cascade as *relational filters* so Catalyst prunes
pairs before the expensive kernel ever runs:

1. per-series features (length, first/last/min/max, LB_Keogh envelope)
   are computed ONCE per series and materialized as columns — an
   algebraic improvement over the reference, which recomputes envelopes
   per pair;
2. candidate generation is an equi-join on length buckets (a series in
   bucket b joins buckets b-1..b+1 via explode), never a crossJoin —
   ``max_length_diff`` pruning exactly as in the reference kernel;
3. LB_Kim as a pure-SQL filter (whole-stage codegen);
4. LB_Keogh vectorized numpy filter, then banded DTW with
   ``max_dist=threshold`` early abandoning (PrunedDTW), inside ONE
   ``mapInPandas`` stage.

Stage boundaries are explicit DataFrames because Catalyst treats pandas
UDFs as opaque and will not reorder filters around them (SURVEY §4.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dtaidistance_spark import kernels as K

_FEATURE_COLS = "first_v double, last_v double, min_v double, max_v double"


def with_series_features(
    df: DataFrame, value_col: str = "tokens", env_window: int | None = None
) -> DataFrame:
    """Materialize per-series scalars (JVM-side) and, optionally, the
    LB_Keogh envelope (vectorized pandas UDF) once per series."""
    v = F.col(value_col).cast("array<double>")
    out = (
        df.withColumn("_v", v)
        .withColumn("n_v", F.size("_v"))
        .withColumn("first_v", F.element_at("_v", 1))
        .withColumn("last_v", F.element_at("_v", -1))
        .withColumn("min_v", F.array_min("_v"))
        .withColumn("max_v", F.array_max("_v"))
    )
    if env_window is not None:
        from pyspark.sql.pandas.functions import pandas_udf

        @pandas_udf("struct<lo: array<double>, hi: array<double>>")
        def env_udf(vals: pd.Series) -> pd.DataFrame:
            los, his = [], []
            for a in vals:
                lo, hi = K.lb_keogh_envelope(
                    np.asarray(a, dtype=np.float64), env_window
                )
                los.append(lo)
                his.append(hi)
            return pd.DataFrame({"lo": los, "hi": his})

        out = out.withColumn("_env", env_udf("_v"))
    return out


def candidate_pairs(
    feats: DataFrame,
    id_col: str = "doc_id",
    max_length_diff: int | None = None,
    lb_kim_threshold: float | None = None,
    broadcast_max_series: int = 4096,
    exhaustive_max_series: int | None = 10_000,
) -> DataFrame:
    """Self-join on length buckets (+ neighbors) with id_a < id_b, then the
    LB_Kim SQL prefilter. No crossJoin, no N² shuffle rows.

    ``max_length_diff=None`` = exhaustive mode (the reference's
    unbounded ``distance_matrix``): every pair is a candidate, so the
    join key degenerates to a SALT — ``pmod(xxhash64(id_a), S)`` on one
    side, all S values on the other — which spreads the all-pairs join
    across S tasks instead of one. S scales with the cluster (S ~
    defaultParallelism, floor 16) so a 1000-executor run is not capped
    at 16-way spread; the output is invariant to S (each pair meets in
    exactly one bucket).

    Exhaustive-mode guards (both probed with ONE cheap column-pruned
    ``limit(cap + 1).count()`` job, never a full count):

    - past ``broadcast_max_series`` the salted S×-exploded build side no
      longer fits any sane broadcast threshold, so the join is pinned to
      a SHUFFLE hash join (both sides hash-partition on the salt bucket
      — identical pair set, no driver-side collect of the corpus).
      Below it the planner may broadcast, which is the right plan small.
    - past ``exhaustive_max_series`` the N² candidate count itself is
      the mistake (10k series = 50M exact-DTW pairs), so the call fails
      loudly; pass a larger value (or ``None``) to opt in explicitly,
      or set ``max_length_diff`` to get the bucketed join.
    """
    exhaustive = max_length_diff is None
    if exhaustive:
        probe_cap = max(
            broadcast_max_series,
            exhaustive_max_series if exhaustive_max_series is not None else 0,
        )
        n_probe = feats.limit(probe_cap + 1).count()
        if (
            exhaustive_max_series is not None
            and n_probe > exhaustive_max_series
        ):
            raise ValueError(
                f"exhaustive dtw_pairs (max_length_diff=None) over more "
                f"than {exhaustive_max_series} series is an all-pairs "
                f"join (>{exhaustive_max_series**2 // 2} kernel "
                f"candidates); set max_length_diff for the bucketed "
                f"join, or raise/None exhaustive_max_series to opt in"
            )
        force_shuffle = n_probe > broadcast_max_series
    else:
        force_shuffle = False
    n_salt = max(16, feats.sparkSession.sparkContext.defaultParallelism)
    bucket_w = max(max_length_diff or 64, 1)
    a = feats.select(
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("v_a"),
        F.col("n_v").alias("n_a"),
        F.col("first_v").alias("fa"),
        F.col("last_v").alias("la"),
        F.col("min_v").alias("mina"),
        F.col("max_v").alias("maxa"),
        *( [F.col("_env").alias("env_a")] if "_env" in feats.columns else [] ),
        (
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)).cast("long")
            if exhaustive
            else F.floor(F.col("n_v") / bucket_w)
        ).alias("bkt"),
    )
    b = feats.select(
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("v_b"),
        F.col("n_v").alias("n_b"),
        F.col("first_v").alias("fb"),
        F.col("last_v").alias("lb"),
        F.col("min_v").alias("minb"),
        F.col("max_v").alias("maxb"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")
            if exhaustive
            else F.array(
                F.floor(F.col("n_v") / bucket_w) - 1,
                F.floor(F.col("n_v") / bucket_w),
                F.floor(F.col("n_v") / bucket_w) + 1,
            )
        ).alias("bkt"),
    )
    if force_shuffle:
        a = a.hint("shuffle_hash")
        b = b.hint("shuffle_hash")
    pairs = a.join(b, ["bkt"]).where(F.col("id_a") < F.col("id_b"))
    if max_length_diff is not None:
        pairs = pairs.where(
            F.abs(F.col("n_a") - F.col("n_b")) <= max_length_diff
        )
    if lb_kim_threshold is not None:
        lb = (
            "greatest(abs(fa - fb), abs(la - lb), "
            "abs(mina - minb), abs(maxa - maxb))"
        )
        pairs = pairs.where(F.expr(lb) <= lb_kim_threshold)
    return pairs


def dtw_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    value_col: str = "tokens",
    window: int | None = None,
    max_length_diff: int | None = None,
    use_lb_keogh: bool = True,
    penalty: float | None = None,
    max_step: float | None = None,
    psi=None,
    broadcast_max_series: int = 4096,
    exhaustive_max_series: int | None = 10_000,
) -> DataFrame:
    """All pairs within DTW distance ``threshold``: the distance-matrix
    workload as LB-cascade + banded early-abandoning DTW. ``penalty`` /
    ``max_step`` / ``psi`` mirror the K1 kernel parameters.
    ``broadcast_max_series`` / ``exhaustive_max_series`` gate exhaustive
    mode (see :func:`candidate_pairs`): past the first the salted join
    is pinned to a shuffle hash join instead of a broadcast; past the
    second the all-pairs request fails loudly unless opted into.

    Returns (id_a, id_b, dist) with id_a < id_b (condensed form).

    Admissibility note: ``penalty`` and ``max_step`` only INCREASE
    distances, so the LB cascade stays a valid prefilter; psi
    relaxation can DECREASE them below LB_Kim/LB_Keogh, so any nonzero
    psi disables both prefilters (every length-bucket candidate goes to
    the exact kernel, which still early-abandons at the threshold).
    """
    psi_zero = psi is None or psi == 0
    use_lb = use_lb_keogh and psi_zero
    # degenerate-row policy (as in the rollup): null/empty series have
    # no defined DTW distance — drop before feature/pair generation
    feats = with_series_features(
        df.where(F.size(F.col(value_col)) > 0), value_col,
        env_window=window if use_lb else None,
    )
    # candidates carry ONLY v_b: v_a is constant per id_a group, so it
    # crosses the shuffle + Arrow boundary once per SERIES (cogroup
    # side 2) instead of once per PAIR — halves candidate shuffle bytes
    cand = candidate_pairs(
        feats,
        id_col=id_col,
        max_length_diff=max_length_diff,
        lb_kim_threshold=threshold if psi_zero else None,
        broadcast_max_series=broadcast_max_series,
        exhaustive_max_series=exhaustive_max_series,
    ).select("id_a", "id_b", "v_b")
    series_a = feats.select(F.col(id_col).alias("id_a"), "_v")

    win = window
    thr = threshold
    use_env = use_lb
    pen, mstep, kpsi = penalty, max_step, psi
    empty = pd.DataFrame({"id_a": [], "id_b": [], "dist": []})

    def kernel(grp: pd.DataFrame, ref: pd.DataFrame) -> pd.DataFrame:
        # per id_a group (cogroup key; also the shuffle key — near-
        # uniform lengths collapse the bucket join into one bucket, and
        # keying the kernel stage on high-cardinality id_a is what
        # parallelizes it): ONE vectorized LB_Keogh pass against env(a)
        # (direction-swapped vs the per-pair form — both directions are
        # admissible lower bounds, and env(a) is computed once per
        # group instead of env(b) once per pair), then ONE batched
        # anti-diagonal DP over the group's survivors. Exactness is
        # unchanged: the final filter is the true DTW.
        if not len(grp) or not len(ref):
            return empty
        ida = ref["id_a"].iloc[0]
        a = np.asarray(ref["_v"].iloc[0], dtype=np.float64)
        arrs = [np.asarray(v, dtype=np.float64) for v in grp["v_b"]]
        ids_b = list(grp["id_b"])
        lengths = np.asarray([len(x) for x in arrs], dtype=np.int64)
        L = int(lengths.max())
        M = np.zeros((len(arrs), L))
        for i, x in enumerate(arrs):
            M[i, : len(x)] = x
        keep = np.ones(len(arrs), dtype=bool)
        if use_env:
            # widest band over the group's lengths -> loosest (still
            # admissible) bound, one envelope for all; only the first
            # min(len(b_i), len(a)) positions contribute (as in the
            # per-pair kernel)
            lo, hi = K.lb_keogh_envelope(a, win, r=L)
            n = min(L, len(a))
            above = np.maximum(M[:, :n] - hi[None, :n], 0.0)
            below = np.maximum(lo[None, :n] - M[:, :n], 0.0)
            pad = np.arange(n)[None, :] >= lengths[:, None]
            above[pad] = 0.0
            below[pad] = 0.0
            lb = np.sqrt((above * above + below * below).sum(axis=1))
            keep = lb <= thr
        if not keep.any():
            return empty
        # max_dist=thr: batch early abandon (PrunedDTW across the whole
        # group) — members that can no longer beat the threshold are
        # compacted out of the DP mid-flight
        d = K.dtw_distance_batch(
            a, M[keep], lengths[keep], window=win, max_dist=thr,
            penalty=pen, max_step=mstep, psi=kpsi,
        )
        kept_ids = [b for b, k in zip(ids_b, keep) if k]
        out = [(ida, idb, float(dv)) for idb, dv in zip(kept_ids, d) if dv <= thr]
        return pd.DataFrame(out, columns=["id_a", "id_b", "dist"])

    return (
        cand.groupby("id_a")
        .cogroup(series_a.groupby("id_a"))
        .applyInPandas(kernel, "id_a string, id_b string, dist double")
    )


def dtw_knn(
    df: DataFrame,
    queries: list[tuple[str, np.ndarray]],
    k: int = 5,
    id_col: str = "doc_id",
    value_col: str = "tokens",
    window: int | None = None,
) -> DataFrame:
    """k nearest series to each query under banded DTW (M5 shape).

    Queries are broadcast inside the UDF closure. Per Arrow batch, per
    query — the UCR-suite cascade, batched:

    1. LB_Kim (first/last/min/max) and LB_Keogh vs the query's envelope,
       both vectorized over the whole batch (one envelope per query per
       batch, not per pair);
    2. candidates sorted by lower bound ascending; the first chunk seeds
       the running kth-best, later chunks run the batched anti-diagonal
       DP with ``max_dist = current kth`` (batch early abandon), and the
       scan stops at the first candidate whose LB exceeds the kth-best —
       admissible because LB <= true distance;
    3. only the partition-local top-k rows are emitted (the global top-k
       is a subset of the union of partition top-ks), so the final
       window-rank shuffle carries O(k · partitions) rows, not N·Q.

    Exactness: abandoned members have true distance > the kth-best at
    abandon time >= the final kth-best, so they can never enter the
    top-k; ties break on doc_id in both the local and global rank.
    """
    qlist = [(qid, np.asarray(q, dtype=np.float64)) for qid, q in queries]
    win = window
    chunk_sz = max(int(k), 64)

    def kernel(batches):
        for pdf in batches:
            arrays = [np.asarray(a, dtype=np.float64) for a in pdf[value_col]]
            if not arrays:
                continue
            ids = list(pdf[id_col])
            lengths = np.asarray([len(x) for x in arrays], dtype=np.int64)
            L = int(lengths.max())
            M = np.zeros((len(arrays), L))
            for i, x in enumerate(arrays):
                M[i, : len(x)] = x
            firsts = np.asarray([x[0] for x in arrays])
            lasts = np.asarray([x[-1] for x in arrays])
            mins = np.asarray([x.min() for x in arrays])
            maxs = np.asarray([x.max() for x in arrays])
            pad = np.arange(L)[None, :] >= lengths[:, None]
            rows = {"query_id": [], "doc_id": [], "dist": []}
            for qid, q in qlist:
                lb = np.maximum.reduce([
                    np.abs(firsts - q[0]), np.abs(lasts - q[-1]),
                    np.abs(mins - q.min()), np.abs(maxs - q.max()),
                ])
                lo, hi = K.lb_keogh_envelope(q, win, r=L)
                n = min(L, len(q))
                above = np.maximum(M[:, :n] - hi[None, :n], 0.0)
                below = np.maximum(lo[None, :n] - M[:, :n], 0.0)
                above[pad[:, :n]] = 0.0
                below[pad[:, :n]] = 0.0
                lb = np.maximum(
                    lb, np.sqrt((above * above + below * below).sum(axis=1))
                )
                order = np.argsort(lb, kind="stable")
                kth = np.inf
                found: list[tuple[float, str]] = []
                for c0 in range(0, len(order), chunk_sz):
                    chunk = order[c0 : c0 + chunk_sz]
                    if lb[chunk[0]] > kth:
                        break  # sorted by LB: nothing later can qualify
                    chunk = chunk[lb[chunk] <= kth]
                    if not len(chunk):
                        continue
                    d = K.dtw_distance_batch(
                        q, M[chunk], lengths[chunk], window=win,
                        max_dist=None if np.isinf(kth) else kth,
                    )
                    found.extend(
                        (float(dv), ids[m]) for m, dv in zip(chunk, d)
                        if np.isfinite(dv)
                    )
                    if len(found) >= k:
                        found.sort()
                        found = found[:k]
                        kth = found[-1][0]
                found.sort()
                for dv, did in found[:k]:
                    rows["query_id"].append(qid)
                    rows["doc_id"].append(did)
                    rows["dist"].append(dv)
            yield pd.DataFrame(rows)

    dists = (
        df.where(F.size(F.col(value_col)) > 0)
        .select(id_col, F.col(value_col).cast("array<double>").alias(value_col))
        .mapInPandas(kernel, "query_id string, doc_id string, dist double")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "doc_id")
    return (
        dists.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "dist")
    )


# ---------------------------------------------------------------------------
# M4/M5 — subsequence alignment / search
# ---------------------------------------------------------------------------


def subsequence_best_match(query: np.ndarray, series: np.ndarray, window=None):
    """Best-matching window of ``series`` for ``query``: DTW with free
    start/end on the series side (psi on s2 only) —
    ``ref:dtaidistance/subsequence/dtw.py::subsequence_alignment``.
    Returns (start, end, value)."""
    query = np.asarray(query, dtype=np.float64)
    series = np.asarray(series, dtype=np.float64)
    c = len(series)
    d, m = K.warping_paths(query, series, window=window, psi=(0, 0, c, c))
    # best end = argmin of last row; backtrack from there
    j_end = int(np.argmin(m[-1, 1:])) + 1
    path = K.best_path(m, row=m.shape[0] - 1, col=j_end)
    start = path[0][1]
    end = path[-1][1]
    return int(start), int(end), float(m[-1, j_end])


def subsequence_search(
    df: DataFrame,
    query: np.ndarray,
    k: int | None = None,
    id_col: str = "doc_id",
    value_col: str = "tokens",
    window: int | None = None,
) -> DataFrame:
    """Rank series by their best-matching subsequence for ``query``;
    ``k`` keeps the global top-k (TakeOrderedAndProject)."""
    q = np.asarray(query, dtype=np.float64)
    win = window

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "start": [], "end": [], "value": []}
            for did, a in zip(pdf[id_col], pdf[value_col]):
                s = np.asarray(a, dtype=np.float64)
                st, en, val = subsequence_best_match(q, s, window=win)
                rows["doc_id"].append(did)
                rows["start"].append(st)
                rows["end"].append(en)
                rows["value"].append(val)
            yield pd.DataFrame(rows)

    out = df.where(F.size(F.col(value_col)) > 0).select(
        id_col, F.col(value_col).cast("array<double>").alias(value_col)
    ).mapInPandas(kernel, "doc_id string, start int, end int, value double")
    out = out.orderBy("value", "doc_id")
    return out.limit(k) if k else out
