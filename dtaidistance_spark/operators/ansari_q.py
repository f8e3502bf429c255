"""TS112 — Ansari–Bradley two-sample SCALE test per source pair +
Mood's k-sample MEDIAN test (Ansari–Bradley AoMS'60; Mood'50 §16;
conditional linear-rank moments per Hájek–Šidák): the dispersion
complement to TS59 — Mann–Whitney asks "did the location shift?",
Ansari–Bradley asks "did the SPREAD change?" (scores grow from both
ends toward the middle: a_r = min(r, N+1−r); a compressed sample
concentrates mid-ranks and scores HIGH), and Mood's median test is
the coarsest, most assumption-free location check of all — a χ² on
the 2×3 above/below-grand-median table, the test you run when even
ranks are suspect.

Exactness strategy (the novel bit vs TS59): with heavy integer
ties, per-observation AB scores are tie-block AVERAGES — rationals,
not integers — so instead of per-i scores the engine computes exact
INT64 closed-form block score sums S₂(v) over each tie block
(lo, hi] (two arithmetic series split at s = ⌊(N+1)/2⌋, doubled to
clear halves), then evaluates the two rational reductions
T₂ = Σ_v c_a·S₂/t and Q₂ = Σ_v S₂²/t as PINNED-ORDER array folds
over the tok-sorted value support (the TS107 posture — both
engines add the same doubles in the same order).  The test is then
CONDITIONALLY exact given the realized tie pattern (Hájek–Šidák
conditional moments):  E[T₂] = n_a·ΣA₂/N with ΣA₂ exact INT64,
Var[T₂] = n_a·n_b·(Q₂ − ΣA₂²/N)/(N(N−1)); z is one float tree,
floor-1e6, verdict |z| > 1.96.  No per-row Python, no
partition-less windows (the T59/T70 bucketed prefix sums).

Mood's median: M = smallest value with combined inclusive
cumulative ≥ ⌈N/2⌉ (declared convention), ties AT M dropped (the
standard choice), χ² over the 2×3 table as one float tree from six
INT64 counts, df = 2, verdict vs χ²₀.₉₅(2).

Honest (gated) reading — measured: source labels are hash-assigned
independent of content, so the sources are genuinely homogeneous
in BOTH location and scale — the AB z triple reads
−1.018 / −0.251 / +0.175 (all |z| < 1.96) and Mood's χ² = 1.634
< 5.99: a correctly calibrated dial refusing to fire on null
data, the calibration read TS59/T70 made through location
statistics, now through the dispersion axis nothing else in the
registry covers.  Gates: block-sum hand case (full block of N = 4
has S₂ = 12); planted spread-change (×3 wider) rejecting in both
orientations; planted pure location shift firing Mood but NOT AB
at matched spread; null calibration over 100 LCG re-labelings
(reject rate ≤ 10%); the corpus no-fire reads pinned.

Scale shape: identical to TS59 — one pivot-count exchange reduces
the corpus to ≤ vocab rows, bucketed prefix sums, one ≤ vocab-row
pinned fold per pair (the support is fixed at 50 257 regardless of
corpus scale — the declared small reduction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.mannwhitney_q import (
    _N,
    _PAIRS,
    _SRC,
    _cums_spark,
    _cums_sql,
)
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_CHI2_95_DF2 = "5.991464547107982"


def _s2(a: str, b: str) -> str:
    """Doubled AB block score sum over tie block (lo, hi] of the
    (a,b) pair ranking, N = n_a + n_b: two arithmetic series split
    at s = (N+1) DIV 2.  Exact INT64."""
    t = f"(c_{a} + c_{b})"
    hi = f"(cum_{a} + cum_{b})"
    lo = f"({hi} - {t})"
    n = f"(n_{a} + n_{b})"
    s = f"(CAST(floor(({n} + 1) / 2.0) AS BIGINT))"
    rhi_low = f"(CASE WHEN {hi} < {s} THEN {hi} ELSE {s} END)"
    low_cnt = (
        f"(CASE WHEN {rhi_low} > {lo} THEN {rhi_low} - {lo} ELSE 0 END)"
    )
    low_sum = f"(({lo} + 1 + {rhi_low}) * {low_cnt})"
    rlo_hi = f"(CASE WHEN {lo} > {s} THEN {lo} ELSE {s} END)"
    hi_cnt = (
        f"(CASE WHEN {hi} > {rlo_hi} THEN {hi} - {rlo_hi} ELSE 0 END)"
    )
    hi_sum = (
        f"(2 * ({n} + 1) * {hi_cnt} - ({rlo_hi} + 1 + {hi}) * {hi_cnt})"
    )
    return f"({low_sum} + {hi_sum})"


def _fold(eng: str, arr: str, term: str) -> str:
    """Pinned-order double fold of ``term`` (fields of x) over the
    tok-sorted array ``arr``."""
    if eng == "spark":
        return (
            f"aggregate({arr}, CAST(0 AS DOUBLE),"
            f" (acc, x) -> acc + ({term}))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform({arr}, x -> CAST(({term}) AS DOUBLE))),"
        f" (acc, q) -> acc + q)"
    )


def _zab(a: str, b: str) -> str:
    na = f"CAST(n_{a} AS DOUBLE)"
    nb = f"CAST(n_{b} AS DOUBLE)"
    nn = f"CAST(n_{a} + n_{b} AS DOUBLE)"
    e = f"({na} * CAST(suma2_{a}_{b} AS DOUBLE) / {nn})"
    ss = (
        f"(q2_{a}_{b} - CAST(suma2_{a}_{b} AS DOUBLE)"
        f" * CAST(suma2_{a}_{b} AS DOUBLE) / {nn})"
    )
    var = f"({na} * {nb} * {ss} / ({nn} * ({nn} - 1.0)))"
    return f"((t2_{a}_{b} - {e}) / sqrt({var}))"


def _ab_oracle() -> str:
    packs = []
    for a, b in _PAIRS:
        packs.append(
            f"list_sort(list([CAST(tok AS DOUBLE),"
            f" CAST(c_{a} AS DOUBLE), CAST(s2_{a}_{b} AS DOUBLE),"
            f" CAST(c_{a} + c_{b} AS DOUBLE)])"
            f" FILTER (WHERE c_{a} + c_{b} > 0)) AS arr_{a}_{b}"
        )
        packs.append(
            f"CAST(sum(s2_{a}_{b}) FILTER (WHERE c_{a} + c_{b} > 0)"
            f" AS BIGINT) AS suma2_{a}_{b}"
        )
    sel = []
    for a, b in _PAIRS:
        sel.append(
            f"{_fold('duck', f'arr_{a}_{b}', 'x[3] * x[2] / x[4]')}"
            f" AS t2_{a}_{b}"
        )
        sel.append(
            f"{_fold('duck', f'arr_{a}_{b}', 'x[3] * x[3] / x[4]')}"
            f" AS q2_{a}_{b}"
        )
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS src_a, '{b}' AS src_b,"
        f" n_{a} AS n_a, n_{b} AS n_b, suma2_{a}_{b} AS sum_a2, "
        + _F6.format(x=f"t2_{a}_{b}")
        + " AS t2_a, "
        + _F6.format(x=_zab(a, b))
        + " AS z,"
        + f" CAST(CASE WHEN abs({_zab(a, b)}) > 1.96 THEN 1 ELSE 0 END"
        + " AS BIGINT) AS reject_scale FROM folded"
        for a, b in _PAIRS
    )
    return (
        synth_sql(_N)
        + _cums_sql()
        + f"""
    , s2v AS (
      SELECT cums.*, tot.*,
             {", ".join(f"{_s2(a, b)} AS s2_{a}_{b}" for a, b in _PAIRS)}
      FROM cums, tot
    ),
    packed AS (
      SELECT {", ".join(f"any_value(n_{s}) AS n_{s}" for s in _SRC)},
             {", ".join(packs)}
      FROM s2v
    ),
    folded AS (
      SELECT packed.*, {", ".join(sel)} FROM packed
    )
    {rows}
    """
    )


@register("ansari_bradley_pairs", oracle=_ab_oracle())
def ansari_bradley_pairs(spark, sf_dir):
    """TS112: Ansari–Bradley scale z per source pair (module header)
    — INT64 closed-form tie-block score sums, pinned-order rational
    folds, conditional moments, one float tree, floor-1e6."""
    cums, tot = _cums_spark(spark)
    s2v = cums.crossJoin(F.broadcast(tot)).select(
        "*",
        *[F.expr(_s2(a, b)).alias(f"s2_{a}_{b}") for a, b in _PAIRS],
    )
    aggs = [
        F.expr(f"any_value(n_{s})").alias(f"n_{s}") for s in _SRC
    ]
    for a, b in _PAIRS:
        aggs.append(
            F.expr(
                f"array_sort(collect_list(CASE WHEN c_{a} + c_{b} > 0"
                f" THEN array(CAST(tok AS DOUBLE),"
                f" CAST(c_{a} AS DOUBLE), CAST(s2_{a}_{b} AS DOUBLE),"
                f" CAST(c_{a} + c_{b} AS DOUBLE)) END))"
            ).alias(f"arr_{a}_{b}")
        )
        aggs.append(
            F.expr(
                f"CAST(sum(CASE WHEN c_{a} + c_{b} > 0"
                f" THEN s2_{a}_{b} ELSE 0 END) AS BIGINT)"
            ).alias(f"suma2_{a}_{b}")
        )
    packed = s2v.agg(*aggs)
    folded = packed.select(
        "*",
        *[
            F.expr(
                _fold(
                    "spark",
                    f"arr_{a}_{b}",
                    "element_at(x, 3) * element_at(x, 2)"
                    " / element_at(x, 4)",
                )
            ).alias(f"t2_{a}_{b}")
            for a, b in _PAIRS
        ],
        *[
            F.expr(
                _fold(
                    "spark",
                    f"arr_{a}_{b}",
                    "element_at(x, 3) * element_at(x, 3)"
                    " / element_at(x, 4)",
                )
            ).alias(f"q2_{a}_{b}")
            for a, b in _PAIRS
        ],
    )
    parts = []
    for a, b in _PAIRS:
        parts.append(
            folded.select(
                F.lit(a).alias("src_a"),
                F.lit(b).alias("src_b"),
                F.col(f"n_{a}").alias("n_a"),
                F.col(f"n_{b}").alias("n_b"),
                F.col(f"suma2_{a}_{b}").alias("sum_a2"),
                F.expr(_F6.format(x=f"t2_{a}_{b}")).alias("t2_a"),
                F.expr(_F6.format(x=_zab(a, b))).alias("z"),
                F.expr(
                    f"CAST(CASE WHEN abs({_zab(a, b)}) > 1.96"
                    f" THEN 1 ELSE 0 END AS BIGINT)"
                ).alias("reject_scale"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Mood's k-sample median test over the same support
# ---------------------------------------------------------------------------


def _mood_chi2() -> str:
    """χ² over the 2×3 (above/below × source) table from the six
    INT64 counts above_s / below_s."""
    na = "(" + " + ".join(f"above_{s}" for s in _SRC) + ")"
    nb = "(" + " + ".join(f"below_{s}" for s in _SRC) + ")"
    nn = f"({na} + {nb})"
    cells = []
    for s in _SRC:
        ms = f"(above_{s} + below_{s})"
        for o, m in (("above", na), ("below", nb)):
            e = (
                f"(CAST({m} AS DOUBLE) * CAST({ms} AS DOUBLE)"
                f" / CAST({nn} AS DOUBLE))"
            )
            cells.append(
                f"(CAST({o}_{s} AS DOUBLE) - {e})"
                f" * (CAST({o}_{s} AS DOUBLE) - {e}) / {e}"
            )
    return "(" + " + ".join(cells) + ")"


@register(
    "mood_median_sources",
    oracle=synth_sql(_N)
    + _cums_sql()
    + f"""
    , m AS (
      SELECT min(tok) AS med FROM cums, tot
      WHERE {" + ".join(f"cum_{s}" for s in _SRC)}
            >= CAST(floor(({" + ".join(f"n_{s}" for s in _SRC)} + 1) / 2.0) AS BIGINT)
    ),
    row_m AS (
      SELECT m.med,
             {", ".join(
                 f"CAST(cum_{s} - c_{s} AS BIGINT) AS below_{s},"
                 f" CAST(n_{s} - cum_{s} AS BIGINT) AS above_{s},"
                 f" CAST(c_{s} AS BIGINT) AS tied_{s}"
                 for s in _SRC)}
      FROM cums, tot, m
      WHERE cums.tok = m.med
    )
    SELECT med AS median_tok,
           {", ".join(
               f"below_{s}, above_{s}, tied_{s}" for s in _SRC)},
           {_F6.format(x=_mood_chi2())} AS chi2,
           CAST('{_CHI2_95_DF2}' AS DOUBLE) AS crit_05,
           CAST(CASE WHEN {_mood_chi2()}
                > CAST('{_CHI2_95_DF2}' AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_median
    FROM row_m
    """,
)
def mood_median_sources(spark, sf_dir):
    """TS112: Mood's k-sample median test across sources (module
    header) — grand median from the inclusive cumulatives, ties at
    the median dropped, χ² one float tree over six INT64 counts."""
    cums, tot = _cums_spark(spark)
    ct = cums.crossJoin(F.broadcast(tot))
    m = ct.where(
        F.expr(
            " + ".join(f"cum_{s}" for s in _SRC)
            + " >= CAST(floor(("
            + " + ".join(f"n_{s}" for s in _SRC)
            + " + 1) / 2.0) AS BIGINT)"
        )
    ).agg(F.min("tok").alias("med"))
    row_m = (
        ct.join(F.broadcast(m), F.col("tok") == F.col("med"))
        .select(
            "med",
            *[
                x
                for s in _SRC
                for x in (
                    F.expr(f"CAST(cum_{s} - c_{s} AS BIGINT)").alias(
                        f"below_{s}"
                    ),
                    F.expr(f"CAST(n_{s} - cum_{s} AS BIGINT)").alias(
                        f"above_{s}"
                    ),
                    F.expr(f"CAST(c_{s} AS BIGINT)").alias(f"tied_{s}"),
                )
            ],
        )
    )
    return row_m.selectExpr(
        "med AS median_tok",
        *[
            c
            for s in _SRC
            for c in (f"below_{s}", f"above_{s}", f"tied_{s}")
        ],
        _F6.format(x=_mood_chi2()) + " AS chi2",
        f"CAST('{_CHI2_95_DF2}' AS DOUBLE) AS crit_05",
        f"CAST(CASE WHEN {_mood_chi2()}"
        f" > CAST('{_CHI2_95_DF2}' AS DOUBLE)"
        f" THEN 1 ELSE 0 END AS BIGINT) AS reject_median",
    )
