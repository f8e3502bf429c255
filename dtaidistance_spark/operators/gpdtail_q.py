"""TS110 — GPD peaks-over-threshold tail fit (Hosking–Wallis
Technometrics'87 PWM closed form; Pickands Ann.Stat.'75; the
Dekkers–Einmahl–de Haan Ann.Stat.'89 moment estimator) over the
same purchase-cents tail TS107's Hill triple examined — the
completion of the extremes toolkit, because Hill is structurally
BLIND to ξ ≤ 0: it can only ever report "how heavy", never "in
fact bounded".  The three dials here all see the whole shape line:

  GPD-PWM (excesses y over u = x_(k+1), k = 100, ascending-order
  weights exact):  a0 = mean y,  a1 = Σ y_(i)·(k−i_asc)/(k(k−1))
      ξ̂ = 2 − a0/(a0 − 2a1),   σ̂ = 2·a0·a1/(a0 − 2a1)
  Pickands (k = 25):  ξ̂_P = ln((x_(25)−x_(50))/(x_(50)−x_(100)))/ln 2
  DEdH moment (k = 100): M1 = Hill H_k, M2 = mean squared log
      spacing;  ξ̂_M = M1 + 1 − ½/(1 − M1²/M2)

plus the mean-excess pair (me over x_(101) and x_(51); GPD ⇒ linear
mean excess, slope sign = tail verdict) and, when ξ̂ < 0, the
implied finite endpoint û = u + σ̂/(−ξ̂).

Exactness: exact cents; a0/a1 numerators are INT64 weighted sums
over the desc-sorted array; M1/M2 are pinned-order ln folds (the
TS107 posture); every estimator is one float tree, floor-1e6;
NULL-guarded (n > 101, positive spacings for Pickands' log).

Honest (gated) reading — measured, and the draft's "bounded tail"
guess was WRONG in the interesting direction: the dials cluster at
ZERO — ξ̂_GPD = −0.042, ξ̂_M = −0.021, ξ̂_P = +0.19 (Pickands at
depth 25 carries ±0.5-class noise, gated as such) — and the
mean-excess pair is DEAD FLAT (5 249.47 → 5 250.62 cents between
the k = 100 and k = 50 thresholds, 0.02% apart), which is the
memorylessness signature: constant mean excess ⇔ exponential
excess law.  So the refined verdict over TS107: not "no power
tail" (Hill's negative-only statement) and not "finite endpoint"
(the draft guess) but EXPONENTIAL-CLASS (Gumbel domain, ξ = 0) —
exactly the regime where a Hill plot must drift, closing the loop
on TS107's measured 36% drift.  At ξ̂ ≈ 0 the implied endpoint is
numerically meaningless (would read 143 194 cents vs the observed
max 37 071), so endpoint_est is guarded to ξ̂ < −0.1 and is NULL
on the corpus — reported-NULL is the honest output here.  Gates:
planted exponential ⇒ all three dials ≈ 0 with flat mean excess;
planted bounded-uniform ⇒ ξ̂ → −1 with endpoint recovered within
1%; planted Pareto(α = 2) ⇒ ξ̂ ≈ +0.5 on all three; the corpus
zero-cluster + flat-mean-excess + NULL-endpoint reads pinned.

Scale shape: identical to TS107 — one filtered scan → the sorted
cents array (declared small-collect verification tier, ~2k
purchases; at corpus scale the same folds run over the existing
distributed top-k machinery) → constant-size folds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 100
_KP = 25  # Pickands depth: uses x_(25), x_(50), x_(100)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(sv, CAST({i} AS INT))") if sp else (
        lambda i: f"sv[{i}]"
    )

    def red(k: int, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, {k}), CAST(0 AS DOUBLE),"
                f" (a, i) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform(range(1, {k} + 1),"
            f" i -> CAST(({term}) AS DOUBLE))), (a, q) -> a + q)"
        )

    def redi(k: int, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, {k}), CAST(0 AS BIGINT),"
                f" (a, i) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, {k} + 1),"
            f" i -> CAST(({term}) AS BIGINT))), (a, q) -> a + q)"
        )

    u = el(str(_K + 1))
    u50 = el("51")
    lnu = f"ln({_D(u)})"
    return {
        # INT64 excess sums for the PWM pair at k = 100
        "s0": redi(_K, f"{el('i')} - {u}"),
        # desc index i ⇒ ascending weight (k − i_asc) = (i − 1)
        "s1": redi(_K, f"({el('i')} - {u}) * (i - 1)"),
        # mean-excess numerator over x_(51) at k = 50
        "s0_50": redi(50, f"{el('i')} - {u50}"),
        # pinned-order ln folds for the DEdH moment pair
        "m1s": red(_K, f"ln({_D(el('i'))}) - {lnu}"),
        "m2s": red(
            _K,
            f"(ln({_D(el('i'))}) - {lnu}) * (ln({_D(el('i'))}) - {lnu})",
        ),
        # PWM pair at k = 50 for the threshold-stability column
        "s1_50": redi(50, f"({el('i')} - {u50}) * (i - 1)"),
        "x25": el(str(_KP)),
        "x50": el(str(2 * _KP)),
        "x100": el(str(4 * _KP)),
        "u": u,
        "xmax": el("1"),
    }


def _out() -> list[str]:
    g = f"n > {_K + 1}"
    a0 = f"({_D('s0')} / {_D(_K)})"
    a1 = f"({_D('s1')} / ({_D(_K)} * {_D(_K - 1)}))"
    den = f"({a0} - 2 * {a1})"
    xi = f"(2 - {a0} / {den})"
    sg = f"(2 * {a0} * {a1} / {den})"
    a0_50 = f"({_D('s0_50')} / {_D(50)})"
    a1_50 = f"({_D('s1_50')} / ({_D(50)} * {_D(49)}))"
    den50 = f"({a0_50} - 2 * {a1_50})"
    xi50 = f"(2 - {a0_50} / {den50})"
    m1 = f"({_D('m1s')} / {_D(_K)})"
    m2 = f"({_D('m2s')} / {_D(_K)})"
    xim = f"({m1} + 1 - 0.5 / (1 - {m1} * {m1} / {m2}))"
    pick_g = f"{g} AND (x25 - x50) > 0 AND (x50 - x100) > 0"
    xip = f"(ln({_D('(x25 - x50)')} / {_D('(x50 - x100)')}) / ln(2.0))"
    # endpoint only meaningful for decisively negative shape: at
    # |ξ̂| ≲ 0.1 the implied endpoint u + σ/(−ξ) is numerically
    # unstable junk (measured: ξ̂ = −0.042 would "imply" 143 194
    # cents against an observed max of 37 071)
    ep_g = f"{g} AND {xi} < -0.1"
    endpoint = f"({_D('u')} + {sg} / (0.0 - {xi}))"
    return [
        f"CASE WHEN {g} THEN CAST(u AS BIGINT)"
        " ELSE CAST(NULL AS BIGINT) END AS threshold_u",
        f"CASE WHEN {g} AND abs({den}) > 1e-300"
        f" THEN {_F6.format(x=xi)}"
        " ELSE CAST(NULL AS DOUBLE) END AS xi_gpd",
        f"CASE WHEN {g} AND abs({den}) > 1e-300"
        f" THEN {_F6.format(x=sg)}"
        " ELSE CAST(NULL AS DOUBLE) END AS sigma_gpd",
        f"CASE WHEN {g} AND abs({den50}) > 1e-300"
        f" THEN {_F6.format(x=xi50)}"
        " ELSE CAST(NULL AS DOUBLE) END AS xi_gpd_k50",
        f"CASE WHEN {pick_g} THEN {_F6.format(x=xip)}"
        " ELSE CAST(NULL AS DOUBLE) END AS xi_pickands",
        f"CASE WHEN {g} AND m2s > 0 AND"
        f" abs(1 - {m1} * {m1} / {m2}) > 1e-12"
        f" THEN {_F6.format(x=xim)}"
        " ELSE CAST(NULL AS DOUBLE) END AS xi_moment",
        f"CASE WHEN {g} THEN {_F6.format(x=a0)}"
        " ELSE CAST(NULL AS DOUBLE) END AS mean_excess_k100",
        f"CASE WHEN n > 51 THEN {_F6.format(x=a0_50)}"
        " ELSE CAST(NULL AS DOUBLE) END AS mean_excess_k50",
        f"CASE WHEN {ep_g} AND abs({den}) > 1e-300"
        f" THEN {_F6.format(x=endpoint)}"
        " ELSE CAST(NULL AS DOUBLE) END AS endpoint_est",
        f"CASE WHEN {g} THEN CAST(xmax AS BIGINT)"
        " ELSE CAST(NULL AS BIGINT) END AS observed_max",
    ]


@register(
    "gpd_tail_fit",
    oracle=f"""
    WITH p AS (
      SELECT CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    packed AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             list_reverse(list_sort(list(cents))) AS sv
      FROM p
    ),
    sums AS (
      SELECT n,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM packed
    )
    SELECT CAST(n AS BIGINT) AS n_purchases, {", ".join(_out())}
    FROM sums
    """,
)
def gpd_tail_fit(spark, sf_dir):
    """TS110: GPD-PWM + Pickands + DEdH moment shape estimators over
    purchase cents (module header) — INT64 excess sums, pinned ln
    folds, one float tree per dial, floor-1e6."""
    p = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr(
            "CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents"
        )
    )
    packed = p.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("reverse(array_sort(collect_list(cents)))").alias("sv"),
    )
    sums = packed.selectExpr(
        "n",
        *[f"{x} AS {k}" for k, x in _folds("spark").items()],
    )
    return sums.selectExpr("CAST(n AS BIGINT) AS n_purchases", *_out())
