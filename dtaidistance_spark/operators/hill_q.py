"""TS107 — Hill tail-index estimator on purchase values (Hill
Ann.Stat.'75; the Hill-plot practice per Drees–de Haan–Resnick'00):
HOW heavy is the tail?  R52's Gini said the spend distribution is
light; the Hill estimator makes the tail claim quantitative and
testable — fit the top-k order statistics to a Pareto tail
x^{−α}:

    H_k = (1/k)·Σ_{i=1..k} ln( x_(i) / x_(k+1) ),   α̂_k = 1/H_k

(x_(i) = i-th LARGEST), reported at k ∈ {20, 50, 100} — the
Hill-plot triple, because the estimator's one real failure mode is
k-sensitivity and reporting one k hides it.  α < 2 means infinite
variance (plan capacity differently), α < 1 infinite mean; a
non-Pareto distribution shows itself as k-DRIFT of α̂ across the
triple — the signature read live below.

Exactness: values in exact cents; per-k sums are pinned-order ln
folds over the DESC-sorted array (Σ ln x_(i) − k·ln x_(k+1) —
ln's of integers, the TS95 posture); one shared double tree;
floor-1e6; NULL-guarded at n ≤ k or x_(k+1) ≤ 0.

Honest (gated) reading — measured: the triple DRIFTS — α̂ falls
4.74 → 4.16 → 3.48 across k = 20/50/100 (a 36% swing) — and the
drift is the verdict: a genuine Pareto tail holds the Hill plot
FLAT across the triple (the planted-Pareto gate shows < 10%
swing), so these purchase values have no power tail, merely
upper order statistics whose log-spacings keep changing
character as k digs deeper below the ≈ 490 endpoint.  Reading a
single k (α̂₁₀₀ = 3.5, "moderately heavy") is the classic
Hill-plot mistake the triple exists to prevent — and note the
DIRECTION of the drift was itself mis-guessed in this module's
draft and corrected by the measurement, which is precisely why
the dial reports three k's and not a story.  Gates: planted
exact Pareto(α = 1.5) flat and recovering α (checked at k ≥ 100,
where the α/√k sampling noise — ±0.34 at k = 20 — no longer
dominates); planted exponential drifting > 30%; scale invariance
H(c·x) = H(x) exact; the two-point hand case.

Scale shape: one filtered scan → the sorted cents array (the
declared small-collect verification tier, ~2k purchases; at
corpus scale the same folds run over the top-k sketch the ANN/
top-k machinery already provides) → three constant-size folds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_KS = (20, 50, 100)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(sv, CAST({i} AS INT))") if sp else (
        lambda i: f"sv[{i}]"
    )
    out = {}
    for k in _KS:
        if sp:
            lnsum = (
                f"aggregate(sequence(1, {k}), CAST(0 AS DOUBLE),"
                f" (a, i) -> a + ln({_D(el('i'))}))"
            )
        else:
            lnsum = (
                f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
                f" list_transform(range(1, {k} + 1),"
                f" i -> ln({_D(el('i'))}))), (a, q) -> a + q)"
            )
        out[f"lnsum_{k}"] = lnsum
        out[f"xk1_{k}"] = el(str(k + 1))
    return out


def _out() -> list[str]:
    cols = []
    for k in _KS:
        h = (
            f"((lnsum_{k} - CAST({k} AS DOUBLE) * ln({_D(f'xk1_{k}')}))"
            f" / CAST({k} AS DOUBLE))"
        )
        g = f"n > {k} AND xk1_{k} > 0"
        cols.append(
            f"CASE WHEN {g} THEN {_F6.format(x=h)}"
            f" ELSE CAST(NULL AS DOUBLE) END AS hill_h_{k}"
        )
        cols.append(
            f"CASE WHEN {g} AND {h} > 0"
            f" THEN {_F6.format(x=f'(CAST(1 AS DOUBLE) / {h})')}"
            f" ELSE CAST(NULL AS DOUBLE) END AS alpha_{k}"
        )
    return cols


@register(
    "hill_tail_index",
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
def hill_tail_index(spark, sf_dir):
    """TS107: the Hill-plot triple over purchase cents (module
    header) — desc-sorted exact cents, pinned ln folds, one double
    tree, floor-1e6."""
    p = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .selectExpr(
            "CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents"
        )
    )
    packed = p.agg(
        F.count("*").cast("long").alias("n"),
        F.expr(
            "reverse(array_sort(collect_list(cents)))"
        ).alias("sv"),
    )
    sums = packed.selectExpr(
        "n",
        *[f"{x} AS {k}" for k, x in _folds("spark").items()],
    )
    return sums.selectExpr("CAST(n AS BIGINT) AS n_purchases", *_out())
