"""TS131 — seasonal-naive baseline evaluation per series (the m4/fpp3
benchmark forecaster: ŷ_t = y_{t−64}, the corpus' own seasonal
period): the missing BASELINE of the forecast family — SES/Holt/
damped/Holt-Winters (TS82/TS83/TS127/TS85) all report MASE against
the lag-1 naive, but on a seasonal corpus the honest yardstick is the
seasonal naive, and WHICH baseline wins is itself the diagnostic
(Hyndman-Koehler IJF'06 define MASE against exactly these two).

Per doc (first min(n_tok, 512) tokens, docs with n_tok ≥ 128), both
error sums over the SAME prediction range t = 65..m:

    sn_sae = Σ |y_t − y_{t−64}|     (seasonal naive, lag 64)
    n1_sae = Σ |y_t − y_{t−1}|      (naive, lag 1)
    mase64 = sn_sae / n1_sae        (the seasonal-vs-naive ratio)

EXACTNESS: every error term is an int64 absolute difference of raw
tokens — both sums are exact BIGINT folds (ascending-t sequence, no
descend hazard: m ≥ 128 > 65), the winner flag is an exact integer
comparison (sn_sae < n1_sae — no float boundary anywhere, hazard-8e
discipline), and the single float is one division, floor-1e6,
NULL-guarded on a constant series (n1_sae = 0).

Honest (gated) reading — measured (495 docs with n_tok ≥ 128): the
corpus bisects EXACTLY at the crossover — the seasonal naive wins
243/495 (49.1 %) and the median mase64 is 1.0066, a coin flip —
because the generator puts both regimes in play: the period-64 sine
cancels bit-perfectly in y_t − y_{t−64} (integer period), so the
seasonal-naive error is the pure ramp step 64·hm (plus wrap
spikes) while the lag-1 error carries the ~100-token seasonal first
difference; small-slope docs crush the naive (min mase 0.0108),
steep-slope docs saturate toward the closed-form ramp ceiling
mase = 64 exactly (measured max 64.372, wrap spikes nudging past
it; the pure-ramp control pins 64.000000 on the nose).  Both
regimes are real mass — the reason a pipeline evaluates BOTH
baselines before trusting any MASE.

Scale shape: ZERO exchanges — two HOF folds per row in the scan
projection (the forecast-battery posture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_CAP = 512
_S = 64
_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _sae(eng: str, lag: int) -> str:
    """Exact BIGINT Σ|v[t] − v[t−lag]| over t = 65..m (ascending)."""
    if eng == "spark":
        # m is BIGINT so the sequence lambda var is BIGINT — element_at
        # needs an INT index (cast inside, bounds ≤ 512)
        term = (
            f"abs(element_at(v, CAST(t AS INT))"
            f" - element_at(v, CAST(t - {lag} AS INT)))"
        )
        return (
            f"aggregate(sequence({_S} + 1, m), CAST(0 AS BIGINT),"
            f" (a, t) -> a + CAST({term} AS BIGINT))"
        )
    term = f"abs(v[t] - v[t - {lag}])"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range({_S} + 1, m + 1),"
        f" t -> CAST({term} AS BIGINT))), (a, x) -> a + x)"
    )


_TAIL_COLS = [
    "CASE WHEN n1_sae > 0 THEN "
    + _F6.format(x="(CAST(sn_sae AS DOUBLE) / CAST(n1_sae AS DOUBLE))")
    + " ELSE CAST(NULL AS DOUBLE) END AS mase64",
    "CAST(CASE WHEN sn_sae < n1_sae THEN 1 ELSE 0 END AS BIGINT)"
    " AS sn_wins",
]
_TAIL = ", ".join(_TAIL_COLS)


@register(
    "seasonal_naive_eval",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id,
             list_transform(tokens[1:least(n_tok, {_CAP})],
                            x -> CAST(x AS BIGINT)) AS v
      FROM synth WHERE n_tok >= 128
    ),
    s1 AS (
      SELECT doc_id, CAST(len(v) AS BIGINT) AS m, v FROM s0
    ),
    s2 AS (
      SELECT doc_id, m,
             {_sae('duck', _S)} AS sn_sae,
             {_sae('duck', 1)} AS n1_sae
      FROM s1
    )
    SELECT doc_id, m, CAST(m - {_S} AS BIGINT) AS n_eval,
           sn_sae, n1_sae, {_TAIL}
    FROM s2
    """,
)
def seasonal_naive_eval(spark, sf_dir):
    """TS131: seasonal-naive (lag 64) vs naive (lag 1) MASE per
    series (module header) — exact int64 error sums over the shared
    prediction range, integer winner flag, one floored division."""
    return (
        synth.sequences_df(spark, _N)
        .where(F.col("n_tok") >= 128)
        .selectExpr(
            "doc_id",
            f"transform(slice(tokens, 1, least(n_tok, {_CAP})),"
            " x -> CAST(x AS BIGINT)) AS v",
        )
        .selectExpr("doc_id", "CAST(size(v) AS BIGINT) AS m", "v")
        .selectExpr(
            "doc_id",
            "m",
            f"{_sae('spark', _S)} AS sn_sae",
            f"{_sae('spark', 1)} AS n1_sae",
        )
        .selectExpr(
            "doc_id",
            "m",
            f"CAST(m - {_S} AS BIGINT) AS n_eval",
            "sn_sae",
            "n1_sae",
            *_TAIL_COLS,
        )
    )
