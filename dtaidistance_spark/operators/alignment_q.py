"""Registry queries for the path/alignment/preprocessing parity surface
(P1–P6, K7, S2): warping paths, warp, Needleman-Wunsch token alignment,
multivariate DTW, smoothing. Kernel values are gated in
tests/test_alignment.py; ``smoothing_events`` carries a DuckDB oracle
(the moving-average low-pass is window SQL in both engines)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window, functions as F

from dtaidistance_spark import kernels as K
from dtaidistance_spark.operators import qutil as Q
from dtaidistance_spark.operators.queries import T, register


@register("warping_paths_demo")
def warping_paths_demo(spark, sf_dir):
    """P1–P5 over consecutive synthetic series pairs: distance, path
    length, warping amount (non-diagonal moves), path endpoints — the
    debug/explain surface of the path machinery, Arrow-batched."""
    df = Q.paa_series_df(spark, 24, length=48)

    def kernel(batches):
        for b in batches:
            out = {"id_a": [], "id_b": [], "dist": [], "path_len": [],
                   "warping_amount": [], "path_head": []}
            docs = list(zip(b["doc_id"], b["tokens"]))
            for (ia, ta), (ib, tb) in zip(docs[:-1], docs[1:]):
                d, m = K.warping_paths(
                    np.asarray(ta, dtype=np.float64),
                    np.asarray(tb, dtype=np.float64),
                    window=8,
                )
                path = K.best_path(m)
                out["id_a"].append(ia)
                out["id_b"].append(ib)
                out["dist"].append(round(d, 4))
                out["path_len"].append(len(path))
                out["warping_amount"].append(K.warping_amount(path))
                out["path_head"].append([list(p) for p in path[:4]])
            yield pd.DataFrame(out)

    return Q.jsonify_complex(
        df.coalesce(1)
        .sortWithinPartitions("doc_id")
        .mapInPandas(
            kernel,
            "id_a string, id_b string, dist double, path_len int, "
            "warping_amount int, path_head array<array<int>>",
        )
    )


@register("needleman_wunsch_docs")
def needleman_wunsch_docs(spark, sf_dir):
    """P6: global alignment of consecutive documents' first 24 words
    (discrete token sequences; candidate for exact-dup diffing)."""
    docs = (
        T(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 12)
        .select("doc_id", F.slice(F.split(F.lower("text"), " "), 1, 24).alias("w"))
    )

    def kernel(batches):
        for b in batches:
            out = {"id_a": [], "id_b": [], "score": [], "n_gaps": []}
            rows = list(zip(b["doc_id"], b["w"]))
            for (ia, wa), (ib, wb) in zip(rows[:-1], rows[1:]):
                score, m = K.needleman_wunsch(list(wa), list(wb))
                al = K.best_alignment(m, list(wa), list(wb))
                out["id_a"].append(int(ia))
                out["id_b"].append(int(ib))
                out["score"].append(float(score))
                out["n_gaps"].append(sum(1 for i, j in al if i < 0 or j < 0))
            yield pd.DataFrame(out)

    return (
        docs.coalesce(1)
        .sortWithinPartitions("doc_id")
        .mapInPandas(kernel, "id_a long, id_b long, score double, n_gaps int")
    )


@register(
    "nw_invariants",
    oracle="""
    WITH d AS (
        SELECT doc_id, len(string_split(lower(text), ' ')[1:24]) AS l
        FROM documents WHERE doc_id < 12
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.l AS len_a, b.l AS len_b,
           true AS gaps_ok, true AS score_ok
    FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
    WHERE b.doc_id < 12
    """,
)
def nw_invariants(spark, sf_dir):
    """Driver-checkable projection of the NW aligner (P6): per pair the
    input lengths (SQL-recomputable) plus two invariant booleans the
    oracle asserts true — n_gaps >= |len_a - len_b| (an optimal global
    alignment needs at least the length difference in gaps) and
    score <= min(len_a, len_b) (match=+1 caps the score at the shorter
    side). A broken DP or backtrack flips a boolean or drops a pair."""
    docs = (
        T(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 12)
        .select("doc_id", F.slice(F.split(F.lower("text"), " "), 1, 24).alias("w"))
    )

    def kernel(batches):
        for b in batches:
            out = {"id_a": [], "id_b": [], "len_a": [], "len_b": [],
                   "gaps_ok": [], "score_ok": []}
            rows = list(zip(b["doc_id"], b["w"]))
            for (ia, wa), (ib, wb) in zip(rows[:-1], rows[1:]):
                wa, wb = list(wa), list(wb)
                score, m = K.needleman_wunsch(wa, wb)
                al = K.best_alignment(m, wa, wb)
                n_gaps = sum(1 for i, j in al if i < 0 or j < 0)
                out["id_a"].append(int(ia))
                out["id_b"].append(int(ib))
                out["len_a"].append(len(wa))
                out["len_b"].append(len(wb))
                out["gaps_ok"].append(n_gaps >= abs(len(wa) - len(wb)))
                out["score_ok"].append(score <= min(len(wa), len(wb)))
            yield pd.DataFrame(out)

    return (
        docs.coalesce(1)
        .sortWithinPartitions("doc_id")
        .mapInPandas(
            kernel,
            "id_a long, id_b long, len_a long, len_b long, "
            "gaps_ok boolean, score_ok boolean",
        )
    )


@register("dtw_ndim_pairs")
def dtw_ndim_pairs(spark, sf_dir):
    """K7: dependent 2-dim DTW over (value, lagged value) event series
    per type — one shared warping path across dimensions."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    series = (
        ev.withColumn("value2", F.lag("value", 1, 0.0).over(w))
        .groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value", "value2"))
            ).alias("evs")
        )
        .select(
            "event_type",
            F.slice(F.transform("evs", lambda e: e["value"]), 1, 200).alias("v1"),
            F.slice(F.transform("evs", lambda e: e["value2"]), 1, 200).alias("v2"),
        )
    )

    def kernel(batches):
        for b in batches:
            rows = sorted(zip(b["event_type"], b["v1"], b["v2"]))
            out = {"type_a": [], "type_b": [], "dist_ndim": []}
            for (ta, a1, a2), (tb, b1, b2) in [
                (x, y) for x in rows for y in rows if x[0] < y[0]
            ]:
                sa = np.stack([a1, a2], axis=1)
                sb = np.stack([b1, b2], axis=1)
                out["type_a"].append(ta)
                out["type_b"].append(tb)
                out["dist_ndim"].append(
                    round(K.dtw_ndim_distance(sa, sb, window=16), 4)
                )
            yield pd.DataFrame(out)

    return series.coalesce(1).mapInPandas(
        kernel, "type_a string, type_b string, dist_ndim double"
    )


@register(
    "dtw_ndim_check",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           true AS finite, true AS nonneg
    FROM t a JOIN t b ON a.event_type < b.event_type
    """,
)
def dtw_ndim_check(spark, sf_dir):
    """Driver-checkable projection of K7: the multivariate kernel must
    produce a finite nonnegative distance for EVERY unordered pair of
    event types (the oracle enumerates the pairs from SQL and asserts
    both invariants) — a crashed kernel drops pairs, a broken band or
    masking yields inf/NaN."""
    pairs = dtw_ndim_pairs(spark, sf_dir)
    return pairs.select(
        "type_a",
        "type_b",
        (~F.isnan("dist_ndim") & ~F.col("dist_ndim").eqNullSafe(float("inf"))).alias("finite"),
        (F.col("dist_ndim") >= 0).alias("nonneg"),
    )


@register(
    "ndim_paths_check",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           true AS corner_ok, true AS path_ok, true AS dba_ok
    FROM t a JOIN t b ON a.event_type < b.event_type
    """,
)
def ndim_paths_check(spark, sf_dir):
    """Driver-checkable projection of the multivariate path/barycenter
    surface (dtw_ndim.warping_paths / warping_path + ndim DBA): per
    unordered event-type pair, the full-matrix corner must equal the
    two-row distance kernel, the backtracked path must be a complete
    monotone path, and the 2-dim DBA of the pair must be finite with
    one barycenter point per center position and dimension."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    series = (
        ev.withColumn("value2", F.lag("value", 1, 0.0).over(w))
        .groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value", "value2"))
            ).alias("evs")
        )
        .select(
            "event_type",
            F.slice(F.transform("evs", lambda e: e["value"]), 1, 120).alias("v1"),
            F.slice(F.transform("evs", lambda e: e["value2"]), 1, 120).alias("v2"),
        )
    )

    def kernel(batches):
        for b in batches:
            rows = sorted(zip(b["event_type"], b["v1"], b["v2"]))
            out = {"type_a": [], "type_b": [], "corner_ok": [],
                   "path_ok": [], "dba_ok": []}
            for (ta, a1, a2), (tb, b1, b2) in [
                (x, y) for x in rows for y in rows if x[0] < y[0]
            ]:
                sa = np.stack([np.asarray(a1), np.asarray(a2)], axis=1)
                sb = np.stack([np.asarray(b1), np.asarray(b2)], axis=1)
                d_two_row = K.dtw_ndim_distance(sa, sb, window=16)
                d_mat, m = K.dtw_ndim_warping_paths(sa, sb, window=16)
                path = K.best_path(m)
                r, c = len(sa), len(sb)
                center = K.dba([sa, sb], max_it=2, window=16)
                out["type_a"].append(ta)
                out["type_b"].append(tb)
                out["corner_ok"].append(abs(d_two_row - d_mat) < 1e-9)
                out["path_ok"].append(
                    path[0] == (0, 0)
                    and path[-1] == (r - 1, c - 1)
                    and max(r, c) <= len(path) <= r + c - 1
                )
                out["dba_ok"].append(
                    center.shape == (len(center), 2)
                    and bool(np.all(np.isfinite(center)))
                )
            yield pd.DataFrame(out)

    return series.coalesce(1).mapInPandas(
        kernel,
        "type_a string, type_b string, corner_ok boolean, "
        "path_ok boolean, dba_ok boolean",
    )


@register(
    "smoothing_events",
    oracle="""
    SELECT event_id,
           round(avg(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
           ), 4) AS smoothed
    FROM events
    """,
)
def smoothing_events(spark, sf_dir):
    """S2 as window SQL: centered moving-average low-pass per series
    (identical frame semantics in Spark and DuckDB — the kernel twin
    :func:`kernels.smoothing` is gated in tests)."""
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    return ev.select(
        "event_id", F.round(F.avg("value").over(w), 4).alias("smoothed")
    )


@register(
    "warping_paths_check",
    oracle="""
    WITH ids AS (SELECT unnest(range(23)) AS i)
    SELECT 'doc' || lpad(i::VARCHAR, 12, '0') AS id_a,
           'doc' || lpad((i + 1)::VARCHAR, 12, '0') AS id_b,
           true AS dist_ok, true AS path_ok, true AS warp_ok
    FROM ids
    """,
)
def warping_paths_check(spark, sf_dir):
    """Driver-checkable projection of the path machinery (P1-P5): the
    oracle enumerates the exact consecutive synthetic pairs by id and
    asserts three invariants the matrices must satisfy — dist finite and
    >= 0, path length in [max(r,c), r+c-1] (a monotone path over a
    48x48 grid), warping amount in [0, path_len)."""
    df = Q.paa_series_df(spark, 24, length=48)

    def kernel(batches):
        for b in batches:
            out = {"id_a": [], "id_b": [], "dist_ok": [], "path_ok": [],
                   "warp_ok": []}
            docs = list(zip(b["doc_id"], b["tokens"]))
            for (ia, ta), (ib, tb) in zip(docs[:-1], docs[1:]):
                d, m = K.warping_paths(
                    np.asarray(ta, dtype=np.float64),
                    np.asarray(tb, dtype=np.float64),
                    window=8,
                )
                path = K.best_path(m)
                wa = K.warping_amount(path)
                out["id_a"].append(ia)
                out["id_b"].append(ib)
                out["dist_ok"].append(bool(np.isfinite(d) and d >= 0))
                out["path_ok"].append(48 <= len(path) <= 95)
                out["warp_ok"].append(0 <= wa < len(path))
            yield pd.DataFrame(out)

    return (
        df.coalesce(1)
        .sortWithinPartitions("doc_id")
        .mapInPandas(
            kernel,
            "id_a string, id_b string, dist_ok boolean, path_ok boolean, "
            "warp_ok boolean",
        )
    )


# ---------------------------------------------------------------------------
# S2 upstream-true — Butterworth filtfilt smoothing
# ---------------------------------------------------------------------------

_BW_B, _BW_A = K.butter2_lowpass(0.2)  # smooth=0.1 -> wn = 2*smooth
_BW_ZI = K.lfilter_zi(_BW_B, _BW_A)
_B0, _B1, _B2 = (repr(float(v)) for v in _BW_B)
_A1, _A2 = repr(float(_BW_A[1])), repr(float(_BW_A[2]))
_Z1, _Z2 = repr(float(_BW_ZI[0])), repr(float(_BW_ZI[1]))


def _bw_step(acc: str, x: str) -> str:
    """One direct-form-II-transposed step as a list-state fold body —
    the EXACT float tree of kernels.lfilter's inner loop (y computed as
    b0*x + z1; each recomputation is the same correctly-rounded double),
    so DuckDB's fold reproduces the numpy kernel bit-for-bit."""
    return (
        f"list_concat([{_B1}*{x} - {_A1}*({_B0}*{x} + {acc}[1]) + {acc}[2],"
        f" {_B2}*{x} - {_A2}*({_B0}*{x} + {acc}[1])],"
        f" list_append({acc}[3:], {_B0}*{x} + {acc}[1]))"
    )


_BW_FOLD_F = (
    f"list_reduce(list_prepend([{_Z1}*ext[1], {_Z2}*ext[1]],"
    f" list_transform(ext, v -> [v])),"
    f" (acc, xl) -> {_bw_step('acc', 'xl[1]')})"
)
_BW_FOLD_B = (
    f"list_reduce(list_prepend([{_Z1}*ysf[n + 18], {_Z2}*ysf[n + 18]],"
    f" list_transform(list_reverse(ysf), v -> [v])),"
    f" (acc, xl) -> {_bw_step('acc', 'xl[1]')})"
)


@register(
    "butterworth_smooth",
    oracle=f"""
    WITH bw0 AS (
      SELECT user_id, event_type,
             list_transform(list_sort(list({{'ts': ts, 'event_id': event_id,
                                             'value': value}})),
                            r -> r.value) AS xs,
             count(*)::BIGINT AS n
      FROM events GROUP BY user_id, event_type HAVING count(*) > 9
    ),
    bw1 AS (
      SELECT user_id, event_type, n,
        list_concat(list_concat(
          list_transform(range(0, 9), i -> 2.0*xs[1] - xs[10 - i]), xs),
          list_transform(range(0, 9), i -> 2.0*xs[n] - xs[n - 1 - i])) AS ext
      FROM bw0
    ),
    bw2 AS (SELECT user_id, event_type, n, ({_BW_FOLD_F})[3:] AS ysf
            FROM bw1),
    bw3 AS (SELECT user_id, event_type, n,
                   list_reverse(({_BW_FOLD_B})[3:]) AS ysb FROM bw2),
    bw4 AS (SELECT user_id, event_type, n, ysb[10:n + 9] AS sm FROM bw3)
    SELECT user_id, event_type,
           CAST(generate_subscripts(sm, 1) - 1 AS INT) AS pos,
           unnest(sm) AS smoothed
    FROM bw4
    """,
)
def butterworth_smooth(spark, sf_dir):
    """S2 UPSTREAM-TRUE (``ref:dtaidistance/preprocessing.py::
    smoothing``): zero-phase 2nd-order Butterworth low-pass
    (smooth=0.1, i.e. butter(2, 0.2) + filtfilt with odd padding and
    steady-state zi) over each (user, event_type) value series — the
    dependency-free :func:`kernels.filtfilt` running inside ONE Arrow
    mapInPandas after one shuffle onto the series key. The oracle
    re-derives the filter as a DuckDB list-state fold spelling the
    IDENTICAL float tree (y = b0·x + z1; z1' = b1·x − a1·y + z2;
    z2' = b2·x − a2·y, zi/coefficient literals repr-injected), so every
    smoothed double hash-matches bit-exactly — no tolerance anywhere.
    The moving-average twin ``smoothing_events`` stays as the pure
    window-SQL form; this one is the numerically upstream-faithful S2."""
    import pandas as pd

    ev = T(spark, sf_dir, "events")
    g = (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("pts"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") > 9)
        .select(
            "user_id",
            "event_type",
            F.expr("transform(pts, p -> p.value)").alias("xs"),
        )
    )

    def kern(it):
        for pdf in it:
            uids, etys, poss, sms = [], [], [], []
            for uid, ety, xs in zip(
                pdf["user_id"], pdf["event_type"], pdf["xs"]
            ):
                y = K.filtfilt(_BW_B, _BW_A, np.asarray(xs, np.float64))
                uids.extend([uid] * len(y))
                etys.extend([ety] * len(y))
                poss.extend(range(len(y)))
                sms.extend(y)
            yield pd.DataFrame(
                {
                    "user_id": pd.Series(uids, dtype="int64"),
                    "event_type": pd.Series(etys, dtype="object"),
                    "pos": pd.Series(poss, dtype="int32"),
                    "smoothed": pd.Series(sms, dtype="float64"),
                }
            )

    return g.mapInPandas(
        kern, "user_id bigint, event_type string, pos int, smoothed double"
    )
