"""TS113 — Jonckheere–Terpstra ordered-alternative trend test per
event type (Jonckheere Biometrika'54; Terpstra Indag.Math.'52;
tie-corrected variance per Lehmann'75 / the SAS PROC FREQ form):
the k-sample test the ANOVA family cannot replace — Kruskal–Wallis
(TS59) asks "are the groups different AT ALL?" and burns power in
every direction; JT asks the sharper ORDERED question "do values
trend upward across g₁ < g₂ < … < g_k?" by summing all k(k−1)/2
pairwise Mann–Whitney counts in the group order:

    J = Σ_{g<h} U_{gh},  U_{gh} = #{(i∈g, j∈h): x_i < x_j} + ½ ties

Here: do event VALUES trend across the ordered day quarters
(00–06 < 06–12 < 12–18 < 18–24), per event type — the
"are mornings cheaper?" dial.

Exactness: cents-exact values; per-(type, value) group counts and
partitioned prefix sums (the TS59 machinery, PARTITIONED windows
only); every U doubled to clear tie-halves — U₂ = Σ_v c_h·(2·cum_g
− c_g) — so J₂, E₂ = (N² − Σn_g²)/2 and every variance ingredient
(A = N(N−1)(2N+5) − Σ_g n_g(n_g−1)(2n_g+5) − Σ_v t_v(t_v−1)(2t_v+5),
B₁ = Σ_g n_g(n_g−1)(n_g−2), B₂ = Σ_v t_v(t_v−1)(t_v−2),
C₁ = Σ_g n_g(n_g−1), C₂ = Σ_v t_v(t_v−1)) is exact INT64;
Var = A/72 + B₁·B₂/(36·N(N−1)(N−2)) + C₁·C₂/(8·N(N−1)) and
z = (J₂ − E₂)/(2·√Var) form ONE float tree (the B₁·B₂ product
deliberately multiplies in DOUBLE — at 10⁶ rows/group the int64
product would overflow; the factors stay exact), floor-1e6,
verdict |z| > 1.96.

Honest (gated) reading — measured, and the corpus handed us the
textbook multiplicity lesson LIVE: event values are generated
iid-exponential independent of timestamp, so the correct answer is
NO trend in any type — yet at sf0.01 the click dial FIRES
(z = −2.158), one false positive among five tests, exactly the
≈ 23% family-wise accident rate five α = 0.05 dials carry.  The
proof it is an accident and not a generator effect is the
replication ladder, gated at both scales: at 10× the data the
click z must grow to ≈ −6.8 if the trend were real — instead it
COLLAPSES to +0.244 (and reads −0.724 at sf0.001) — the signature
of a null fluctuation, demonstrating within one registry entry why
a pipeline watching many JT dials must FDR-correct
(bh_fdr_chow exists for exactly this) or replicate before acting.
Gates: planted monotone trend firing hard (z > 5) and scaling with
√n; planted V-shape staying quiet (JT's orderedness is real
directional power, not relabeling); the U-sum identity J = Σ U_gh
against brute force on small samples; the tie-corrected variance
collapsing to the textbook no-tie formula on tie-free data; the
sf0.01 single-false-positive + sf0.1 collapse pinned.

Scale shape: one pivot-count exchange to ≤ |type × distinct cents|
rows, partitioned prefix sums, one map-side-combinable aggregate
per type — zero partition-less windows, zero collects.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_G = 4  # ordered day quarters

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_GRP = range(_G)


def _j2() -> str:
    """Σ_{g<h} U₂_{gh} summed per value-row, to be sum()-aggregated."""
    terms = []
    for g in _GRP:
        for h in _GRP:
            if g < h:
                terms.append(f"c_{h} * (2 * cum_{g} - c_{g})")
    return "(" + " + ".join(terms) + ")"


_TV = "(" + " + ".join(f"c_{g}" for g in _GRP) + ")"


def _var_z_cols() -> list[str]:
    n = "(" + " + ".join(f"n_{g}" for g in _GRP) + ")"
    an = (
        "("
        + " + ".join(
            f"n_{g} * (n_{g} - 1) * (2 * n_{g} + 5)" for g in _GRP
        )
        + ")"
    )
    b1 = (
        "("
        + " + ".join(f"n_{g} * (n_{g} - 1) * (n_{g} - 2)" for g in _GRP)
        + ")"
    )
    c1 = "(" + " + ".join(f"n_{g} * (n_{g} - 1)" for g in _GRP) + ")"
    a = f"({n} * ({n} - 1) * (2 * {n} + 5) - {an} - at)"
    # doubled E: 2E = (N² − Σn²)/2 = Σ_{g<h} n_g·n_h — pure integer
    e2 = (
        "("
        + " + ".join(
            f"n_{g} * n_{h}"
            for g in _GRP
            for h in _GRP
            if g < h
        )
        + ")"
    )
    var = (
        f"({_D(a)} / 72.0"
        f" + {_D(b1)} * {_D('bt')}"
        f" / (36.0 * {_D(n)} * ({_D(n)} - 1.0) * ({_D(n)} - 2.0))"
        f" + {_D(c1)} * {_D('ct')} / (8.0 * {_D(n)} * ({_D(n)} - 1.0)))"
    )
    z = f"(({_D('j2')} - {_D(e2)}) / (2.0 * sqrt({var})))"
    g = f"{n} > 10"
    return [
        f"CAST(j2 AS BIGINT) AS j2_stat",
        f"CAST({e2} AS BIGINT) AS e2_stat",
        f"CASE WHEN {g} THEN {_F6.format(x=var)}"
        " ELSE CAST(NULL AS DOUBLE) END AS var_j",
        f"CASE WHEN {g} THEN {_F6.format(x=z)}"
        " ELSE CAST(NULL AS DOUBLE) END AS z",
        f"CAST(CASE WHEN {g} AND abs({z}) > 1.96 THEN 1 ELSE 0 END"
        " AS BIGINT) AS reject_trend",
    ]


@register(
    "jonckheere_trend",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents,
             CAST(hour(ts) // 6 AS BIGINT) AS grp
      FROM events
    ),
    piv AS (
      SELECT event_type, cents,
             {", ".join(
                 f"CAST(sum(CASE WHEN grp = {g} THEN 1 ELSE 0 END)"
                 f" AS BIGINT) AS c_{g}" for g in _GRP)}
      FROM ev GROUP BY event_type, cents
    ),
    cums AS (
      SELECT event_type, cents,
             {", ".join(f"c_{g}" for g in _GRP)},
             {", ".join(
                 f"CAST(sum(c_{g}) OVER (PARTITION BY event_type"
                 f" ORDER BY cents) AS BIGINT) AS cum_{g}"
                 for g in _GRP)}
      FROM piv
    ),
    agg AS (
      SELECT event_type,
             CAST(sum({_j2()}) AS BIGINT) AS j2,
             {", ".join(
                 f"CAST(sum(c_{g}) AS BIGINT) AS n_{g}" for g in _GRP)},
             CAST(sum({_TV} * ({_TV} - 1) * (2 * {_TV} + 5))
                  AS BIGINT) AS at,
             CAST(sum({_TV} * ({_TV} - 1) * ({_TV} - 2))
                  AS BIGINT) AS bt,
             CAST(sum({_TV} * ({_TV} - 1)) AS BIGINT) AS ct
      FROM cums GROUP BY event_type
    )
    SELECT event_type, {", ".join(f"n_{g}" for g in _GRP)},
           {", ".join(_var_z_cols())}
    FROM agg
    """,
)
def jonckheere_trend(spark, sf_dir):
    """TS113: Jonckheere–Terpstra z per event type across ordered day
    quarters (module header) — INT64 doubled pairwise-U sums,
    tie-corrected Lehmann variance, one float tree, floor-1e6."""
    ev = T(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents",
        "CAST(hour(ts) DIV 6 AS BIGINT) AS grp",
    )
    piv = ev.groupBy("event_type", "cents").agg(
        *[
            F.sum(F.when(F.col("grp") == g, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{g}")
            for g in _GRP
        ]
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = piv.select(
        "event_type",
        "cents",
        *[F.col(f"c_{g}") for g in _GRP],
        *[
            F.sum(f"c_{g}").over(w).cast("long").alias(f"cum_{g}")
            for g in _GRP
        ],
    )
    agg = cums.groupBy("event_type").agg(
        F.sum(F.expr(_j2())).cast("long").alias("j2"),
        *[
            F.sum(f"c_{g}").cast("long").alias(f"n_{g}")
            for g in _GRP
        ],
        F.sum(F.expr(f"{_TV} * ({_TV} - 1) * (2 * {_TV} + 5)"))
        .cast("long")
        .alias("at"),
        F.sum(F.expr(f"{_TV} * ({_TV} - 1) * ({_TV} - 2)"))
        .cast("long")
        .alias("bt"),
        F.sum(F.expr(f"{_TV} * ({_TV} - 1)")).cast("long").alias("ct"),
    )
    return agg.selectExpr(
        "event_type",
        *[f"n_{g}" for g in _GRP],
        *_var_z_cols(),
    )
