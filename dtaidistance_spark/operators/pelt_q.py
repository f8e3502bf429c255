"""TS71 — PELT optimal changepoint detection per series (Killick,
Fearnhead & Eckley JASA'12): the OPTIMAL-partitioning upgrade of the
changepoint family — CUSUM (TS-) finds one shift, binary segmentation
(TS25/TS26) greedily recurses and can misplace points, PELT minimizes
the exact penalized cost

    Σ_segments C(seg) + β·(#changepoints),
    C(s..t) = Σx² − (Σx)²/len        (the L2 / piecewise-mean cost)

over ALL partitions in amortized O(n) via inequality pruning, and is
provably exact when the pruning condition holds (L2 does).

Penalty: the standard BIC-style β = 2·σ̂²·ln(n) with σ̂² the series'
own global variance (deterministic, no tuning loop).

Implementation: an Arrow mapInPandas kernel — one series = one unit
of work, int64 prefix sums inside the kernel keep every segment cost
exact up to the single float division; ZERO exchanges (the TS62-family
pure-map shape; a DP with data-dependent pruning is exactly the
semantics HOF folds can't express, the documented kernel criterion).
Rows-only in the driver artifact: the optimal-partition objective is
not ANSI SQL — its correctness gate is the EXHAUSTIVE O(n²) dynamic
program in pytest (bit-equal costs and identical changepoint sets on
every checked series) plus a planted-shift hand case, and the
objective-dominance property PELT_cost ≤ cost(no split) ∧ ≤
cost(binseg-style single best split).

Output per series: n, cap used, n_changepoints, the 1-indexed
changepoint positions as a compact string, and the optimal penalized
cost (rounded 1e-6, HALF_UP like the SQL convention).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register

_N = 512
_CAP = 1024


def pelt_l2(x: np.ndarray, beta: float):
    """Exact PELT with L2 cost; returns (changepoints, total_cost).
    Positions are the 1-indexed LAST element of each non-final
    segment.  int64 prefix sums; costs float64."""
    n = len(x)
    p1 = np.zeros(n + 1, dtype=np.int64)
    p2 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(x, out=p1[1:])
    np.cumsum(x.astype(np.int64) ** 2, out=p2[1:])

    f = np.empty(n + 1)
    f[0] = -beta
    last = np.zeros(n + 1, dtype=np.int64)
    cand = np.array([0], dtype=np.int64)
    for t in range(1, n + 1):
        # vectorized candidate evaluation: f[s] + C(s, t) + beta
        d = (p1[t] - p1[cand]).astype(np.float64)
        vals = (
            f[cand]
            + (p2[t] - p2[cand]).astype(np.float64)
            - d * d / (t - cand)
            + beta
        )
        k = int(np.argmin(vals))
        f[t] = vals[k]
        last[t] = cand[k]
        # PELT pruning: drop s that can never win again
        cand = np.append(cand[vals - beta <= f[t]], t)
    cps = []
    t = n
    while t > 0:
        s = int(last[t])
        if s > 0:
            cps.append(s)
        t = s
    return sorted(cps), float(f[n])


@register("pelt_changepoints")
def pelt_changepoints(spark, sf_dir):
    """TS71: PELT optimal changepoints per series (module header) —
    Arrow kernel, int64 prefix sums, BIC-style penalty, zero
    exchanges."""
    docs = synth.sequences_df(spark, _N).selectExpr(
        "doc_id",
        f"slice(tokens, 1, least(n_tok, {_CAP})) AS v",
    )

    def kern(batches):
        for pdf in batches:
            rows = []
            for doc_id, v in zip(pdf["doc_id"], pdf["v"]):
                x = np.asarray(v, dtype=np.int64)
                n = len(x)
                var = float(x.var())
                beta = 2.0 * var * math.log(n) if var > 0 else 1.0
                cps, cost = pelt_l2(x, beta)
                rows.append(
                    (
                        doc_id,
                        n,
                        len(cps),
                        ",".join(str(c) for c in cps[:64]),
                        math.floor(cost * 1e6 + 0.5) / 1e6,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "l",
                    "n_changepoints",
                    "changepoints",
                    "penalized_cost",
                ],
            )

    return docs.mapInPandas(
        kern,
        schema=(
            "doc_id string, l long, n_changepoints long,"
            " changepoints string, penalized_cost double"
        ),
    )
