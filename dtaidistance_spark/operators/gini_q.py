"""R52 — spend-concentration audit over users: Gini, Lorenz shares,
and Theil T (Gini 1912; Lorenz 1905; Theil'67): the inequality
family — every usage-billing / abuse / whale-analysis pipeline
reports "how concentrated is activity across accounts?", and the
three classics answer it from different angles: Gini (rank-linear,
the headline number), Lorenz shares (the operational quantiles:
what do the top 1% / top 10% / bottom 50% hold?), and Theil T
(log-based, exactly decomposable across subgroups — the one you
can split by region later).

    Gini = Σ_i (2i − n − 1)·x_(i) / (n·Σx)      (sorted ascending)
    Theil T = Σ (x_i/X)·ln(x_i·n/X)             (0 ≤ T ≤ ln n)

over per-user TOTAL spend in exact cents (purchases only,
declared).  Machinery: one keyed sum per user, then the sorted
per-user array (150 values — the declared driver-scale step)
feeds index-weighted integer folds: the Gini numerator
Σ(2i−n−1)x_(i) and every Lorenz cumulative are EXACT INT64; Gini
and the share ratios are single divisions; Theil's ln chain folds
in pinned sorted order; floor-1e6; NULL-guarded at zero total.

Honest (gated) reading — measured at sf0.01: per-user spend is the
sum of ~13 iid purchase values, so concentration is LOW and the
dials agree on how low — Gini 0.191, Theil 0.0595 (the small-
inequality approximation T ≈ CV²/2 holds to ~10%, gated against
the exact CV from the emitted moments), top-1% share 2.97% (2.2×
parity), top-10% 17.2%, bottom-50% 36.8% — a light-tailed
population where the whale report comes back empty, which is the
CORRECT answer for sums of bounded iid draws (CLT compression of
relative spread), and the gate pins all five numbers at both
scales (sf0.001 reads mildly higher — 15 users, less averaging —
Gini 0.228, the direction itself informative).  The planted Pareto population (α = 1.16, the
80/20 shape) reads Gini ≈ 0.6+, top-10% ≈ 60%+ in pytest, and
the closed cases (perfect equality ⇒ all zeros; one-user-owns-
everything ⇒ Gini = (n−1)/n, T = ln n) are exact.

Scale shape: one map-side-combined per-user sum; the sorted fold
runs over |users| values (the declared small-collect step — at
corpus scale the same folds run over a t-digest/quantile sketch
of the spend distribution with identical downstream algebra).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(sv, CAST({i} AS INT))") if sp else (
        lambda i: f"sv[{i}]"
    )

    def fold(term: str, lo="1", hi="n", acc="BIGINT") -> str:
        if sp:
            return (
                f"aggregate(sequence(CAST({lo} AS INT), CAST({hi} AS INT)),"
                f" CAST(0 AS {acc}), (a, i) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS {acc}),"
            f" list_transform(range(CAST({lo} AS BIGINT),"
            f" CAST({hi} AS BIGINT) + 1),"
            f" i -> CAST({term} AS {acc}))), (a, q) -> a + q)"
        )

    x = el("i")
    return {
        "tot": fold(x),
        "tot2": fold(f"{x} * {x}"),
        "gnum": fold(f"(2 * CAST(i AS BIGINT) - n - 1) * {x}"),
        # Lorenz cumulative sums at the operational cut points
        "bot50": fold(x, hi="n DIV 2"),
        "top10": fold(x, lo="n - CAST(ceil(n / 10.0) AS BIGINT) + 1"),
        "top1": fold(x, lo="n - CAST(ceil(n / 100.0) AS BIGINT) + 1"),
        # Theil: pinned-order ln chain over the sorted shares
        "tln": fold(
            f"CASE WHEN {x} > 0 THEN {_D(x)} * ln({_D(x)})"
            f" ELSE CAST(0 AS DOUBLE) END",
            acc="DOUBLE",
        ),
    }


_GINI = f"({_D('gnum')} / ({_D('n')} * {_D('tot')}))"
# Theil T = Σ(x/X)ln(x n/X) = [Σ x ln x]/X − ln(X/n)
_THEIL = f"((tln / {_D('tot')}) - ln({_D('tot')} / {_D('n')}))"
_G = "tot > 0"

_TOP1 = f"({_D('top1')} / {_D('tot')})"
_TOP10 = f"({_D('top10')} / {_D('tot')})"
_BOT50 = f"({_D('bot50')} / {_D('tot')})"

_OUT = [
    "CAST(n AS BIGINT) AS n_users",
    "CAST(tot AS BIGINT) AS total_cents",
    f"CASE WHEN {_G} THEN {_F6.format(x=_GINI)}"
    " ELSE CAST(NULL AS DOUBLE) END AS gini",
    f"CASE WHEN {_G} THEN {_F6.format(x=_THEIL)}"
    " ELSE CAST(NULL AS DOUBLE) END AS theil_t",
    f"CASE WHEN {_G} THEN {_F6.format(x=_TOP1)}"
    " ELSE CAST(NULL AS DOUBLE) END AS top1_share",
    f"CASE WHEN {_G} THEN {_F6.format(x=_TOP10)}"
    " ELSE CAST(NULL AS DOUBLE) END AS top10_share",
    f"CASE WHEN {_G} THEN {_F6.format(x=_BOT50)}"
    " ELSE CAST(NULL AS DOUBLE) END AS bottom50_share",
]


@register(
    "spend_concentration",
    oracle=f"""
    WITH spend AS (
      SELECT user_id,
             CAST(SUM(CAST(floor(100.0 * value + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    packed AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             list_sort(list(cents)) AS sv
      FROM spend
    ),
    sums AS (
      SELECT n,
             {", ".join(f"{x.replace('n DIV 2', 'n // 2')} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM packed
    )
    SELECT {", ".join(_OUT)}
    FROM sums
    """,
)
def spend_concentration(spark, sf_dir):
    """R52: Gini/Lorenz/Theil over per-user purchase totals (module
    header) — keyed cent sums, sorted index-weighted int64 folds,
    pinned Theil ln chain, floor-1e6."""
    spend = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(SUM(CAST(floor(100.0 * value + 0.5) AS BIGINT))"
                " AS BIGINT)"
            ).alias("cents")
        )
    )
    packed = spend.agg(
        F.count("*").cast("long").alias("n"),
        F.expr("array_sort(collect_list(cents))").alias("sv"),
    )
    sums = packed.selectExpr(
        "n",
        *[f"{x} AS {k}" for k, x in _folds("spark").items()],
    )
    return sums.selectExpr(*_OUT)
