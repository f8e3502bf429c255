"""TS129 — Lepage's joint location–scale two-sample test per source
pair (Lepage Biometrika'71): L = z_W² + z_AB² ~ χ²(2) — the canonical
COMBINATION of the Wilcoxon/Mann–Whitney location component (TS59)
and the Ansari–Bradley scale component (TS112), asked one question:
"did the distribution move OR stretch?"  A pipeline screening a new
corpus slice against production wants exactly this single alarm —
running the two tests separately and OR-ing at 1.96 each inflates
the false-alarm rate past 9.5%, while Lepage's χ²(2) composition
holds the joint size at 5% (the textbook reason the combined
statistic exists; the standardized components are asymptotically
independent under H₀, Lepage's own result).

Implementation is COMPOSITION, not re-derivation: the module chains
the two parent machineries verbatim over the SHARED ex/piv/cums/tot
prefix-sum backbone (mannwhitney_q's doubled-midrank INT64 r2/tie
sums and z tree; ansari_q's closed-form tie-block score sums,
pinned-order rational folds and conditional-moment z tree), then
adds ONE line of new algebra: L = z_W² + z_AB² against the
χ²₀.₉₅(2) literal.  Every exactness argument is inherited from the
parents, whose registry twins stay green beside this one.

Honest (gated) reading — measured: the three source pairs read
L = 2.697 / 0.337 / 0.031 (web–code / web–books / code–books), all
below 5.99 — the location axis (TS59: all null) and the scale axis
(TS112: all null) stay null JOINTLY, with web–code's L fed almost
equally by both components (z_W = 1.289, z_AB = −1.018: each
comfortably inside ±1.96, their squares summing to the one L worth
watching); the combined dial adds what the separate nulls could
not: the 5% JOINT size held without multiplicity correction.  Gates: L ≡ z_W² + z_AB² recomputed from the parent
registry queries' own emitted z columns (cross-query consistency,
the TS53 shared-divisor-bug precedent); a planted location shift
firing through the z_W component alone; a planted scale change
firing through z_AB alone; a planted shift+stretch firing L when
NEITHER single component crosses 1.96 (the case the combination
exists for); the corpus pins.

Scale shape: identical to the parents — one pivot-count exchange to
the ≤ vocab-sized support, bucketed prefix sums, one ≤ vocab-row
pinned fold per pair.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.ansari_q import _fold, _s2, _zab
from dtaidistance_spark.operators.mannwhitney_q import (
    _CHI2_95_DF2,
    _PAIRS,
    _SRC,
    _cums_spark,
    _cums_sql,
    _r2,
    _tie,
    _z,
)
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _lepage(a: str, b: str) -> str:
    return f"(({_z(a, b)}) * ({_z(a, b)}) + ({_zab(a, b)}) * ({_zab(a, b)}))"


def _duck_oracle() -> str:
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
        packs.append(
            f"CAST(sum({_r2(a, b)}) AS BIGINT) AS r2_{a}_{b}"
        )
        packs.append(
            f"CAST(sum({_tie(a, b)}) AS BIGINT) AS t_{a}_{b}"
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
        sel.append(
            f"r2_{a}_{b} - n_{a} * (n_{a} + 1) AS u2_{a}_{b}"
        )
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS src_a, '{b}' AS src_b,"
        f" n_{a} AS n_a, n_{b} AS n_b, "
        + _F6.format(x=_z(a, b))
        + " AS z_w, "
        + _F6.format(x=_zab(a, b))
        + " AS z_ab, "
        + _F6.format(x=_lepage(a, b))
        + " AS lepage_l,"
        + f" CAST(CASE WHEN {_lepage(a, b)} > {_CHI2_95_DF2}"
        + " THEN 1 ELSE 0 END AS BIGINT) AS reject_same FROM folded"
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


@register("lepage_location_scale", oracle=_duck_oracle())
def lepage_location_scale(spark, sf_dir):
    """TS129: Lepage L = z_W² + z_AB² per source pair (module header)
    — the TS59 and TS112 machineries chained over the shared prefix-
    sum backbone, one new line of algebra, χ²(2) verdict."""
    cums, tot = _cums_spark(spark)
    s2v = cums.crossJoin(F.broadcast(tot)).select(
        "*",
        *[F.expr(_s2(a, b)).alias(f"s2_{a}_{b}") for a, b in _PAIRS],
    )
    aggs = [F.expr(f"any_value(n_{s})").alias(f"n_{s}") for s in _SRC]
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
        aggs.append(
            F.expr(f"CAST(sum({_r2(a, b)}) AS BIGINT)").alias(
                f"r2_{a}_{b}"
            )
        )
        aggs.append(
            F.expr(f"CAST(sum({_tie(a, b)}) AS BIGINT)").alias(
                f"t_{a}_{b}"
            )
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
        *[
            F.expr(f"r2_{a}_{b} - n_{a} * (n_{a} + 1)").alias(
                f"u2_{a}_{b}"
            )
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
                F.expr(_F6.format(x=_z(a, b))).alias("z_w"),
                F.expr(_F6.format(x=_zab(a, b))).alias("z_ab"),
                F.expr(_F6.format(x=_lepage(a, b))).alias("lepage_l"),
                F.expr(
                    f"CAST(CASE WHEN {_lepage(a, b)} > {_CHI2_95_DF2}"
                    " THEN 1 ELSE 0 END AS BIGINT)"
                ).alias("reject_same"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
