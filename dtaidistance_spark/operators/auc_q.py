"""T87 — exact ROC-AUC of a screening score against a source label
(Hanley–McNeil Radiology'82 for AUC = P(X>Y) + ½P(X=Y); the
Mann–Whitney U identity; tie-corrected z per Kendall): the
classifier-evaluation primitive the curation family lacked — T67
computes quality SCORES, the nb classifier predicts classes; AUC
is how a pipeline decides whether any score is WORTH thresholding
before it burns a filtration pass on it.  Here: does document
LENGTH (n_chars, an exact integer score) discriminate code-source
docs from web-source docs?

    AUC = [Σ_s pos_s · (2·cumneg_<s + neg_s)] / (2·n₁·n₂)

computed at SCORE GRANULARITY: one (score → pos_s, neg_s) count
aggregate, then the ordered cumulative runs through the
ARRAY-ACCUMULATOR fold (sort_array(collect_list) + one
aggregate()/list_reduce pass — the KM/BH-FDR posture, zero Window
nodes; distinct-score rows are the declared small sequential
step, and the numerator U₂ = 2U stays EXACT INT64 until the final
division).  The tie-corrected Mann–Whitney z uses
Σ(t³−t) over score multiplicities (t = pos_s + neg_s, int64) in
the standard variance; Gini = 2·AUC − 1; floor-1e6; two-sided
verdict at 1.96; NULL-guarded at an empty class.

Honest (gated) reading — measured: document length carries NO
source signal — AUC = 0.554 at sf0.01 and 0.469 at sf0.001 (the
sign even flips across scales: pure sampling noise at n = 25+25),
z inside ±1.96 both times, verdict 0 — the "don't burn a
filtration pass thresholding this score" answer, which is
exactly the decision AUC exists to make cheaply BEFORE a filter
ships.  Bands gated at both scales; the discrimination lives in
pytest: the AUC(score) + AUC(−score) = 1 antisymmetry, the
all-ties AUC = ½ exact case, a planted perfectly-separating
score (AUC = 1, z decisive), and the textbook hand example with
ties recomputed against the midrank formula.

Scale shape: one keyed count aggregate (map-side combined) + one
driver-scale fold over distinct scores — the corpus crosses the
wire once; nothing global is windowed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_POS = "code"
_NEG = "web"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# fold state: [cumneg, u2, n1, n2, tiesum]; input rows [score, p, n]
_SPARK_STEP = (
    "array(array("
    "element_at(element_at(acc, 1), 1) + element_at(x, 3),"  # cumneg
    "element_at(element_at(acc, 1), 2) + element_at(x, 2)"
    " * (2 * element_at(element_at(acc, 1), 1) + element_at(x, 3)),"
    "element_at(element_at(acc, 1), 3) + element_at(x, 2),"
    "element_at(element_at(acc, 1), 4) + element_at(x, 3),"
    "element_at(element_at(acc, 1), 5)"
    " + (element_at(x, 2) + element_at(x, 3))"
    " * (element_at(x, 2) + element_at(x, 3))"
    " * (element_at(x, 2) + element_at(x, 3))"
    " - (element_at(x, 2) + element_at(x, 3))))"
)

_DUCK_STEP = (
    "[[acc[1][1] + x[1][3],"
    " acc[1][2] + x[1][2] * (2 * acc[1][1] + x[1][3]),"
    " acc[1][3] + x[1][2],"
    " acc[1][4] + x[1][3],"
    " acc[1][5] + (x[1][2] + x[1][3]) * (x[1][2] + x[1][3])"
    " * (x[1][2] + x[1][3]) - (x[1][2] + x[1][3])]]"
)

# final tree from the 5 folded int64s (exposed as columns)
_AUC = f"({_D('u2')} / (CAST(2 AS DOUBLE) * {_D('n1')} * {_D('n2')}))"
_NT = "(n1 + n2)"
_MU = f"({_D('n1')} * {_D('n2')} / CAST(2 AS DOUBLE))"
_VAR = (
    f"({_D('n1')} * {_D('n2')} / CAST(12 AS DOUBLE)"
    f" * (CAST({_NT} + 1 AS DOUBLE)"
    f" - {_D('tiesum')} / ({_D(_NT)} * {_D(f'{_NT} - 1')})))"
)
_ZR = f"(({_D('u2')} / CAST(2 AS DOUBLE) - {_MU}) / sqrt({_VAR}))"
_G = "n1 > 0 AND n2 > 0"

_OUT = [
    "n1",
    "n2",
    f"CASE WHEN {_G} THEN {_F6.format(x=_AUC)}"
    " ELSE CAST(NULL AS DOUBLE) END AS auc",
    f"CASE WHEN {_G} THEN {_F6.format(x=f'(2 * {_AUC} - 1)')}"
    " ELSE CAST(NULL AS DOUBLE) END AS gini",
    f"CASE WHEN {_G} AND {_VAR} > 0 THEN {_F6.format(x=_ZR)}"
    " ELSE CAST(NULL AS DOUBLE) END AS z_mwu",
    f"CAST(CASE WHEN NOT ({_G}) OR {_VAR} <= 0 THEN NULL"
    f" WHEN abs({_ZR}) > 1.959963984540054 THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_no_signal",
]


@register(
    "auc_length_source",
    oracle=f"""
    WITH lab AS (
      SELECT CAST(n_chars AS BIGINT) AS score,
             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS y
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    bys AS (
      SELECT score,
             CAST(SUM(y) AS BIGINT) AS p,
             CAST(SUM(1 - y) AS BIGINT) AS n
      FROM lab GROUP BY score
    ),
    packed AS (
      SELECT list_sort(list([[CAST(score AS BIGINT), p, n]])) AS rows_
      FROM bys
    ),
    folded AS (
      SELECT list_reduce(
               list_prepend([[CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                              CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                              CAST(0 AS BIGINT)]], rows_),
               (acc, x) -> {_DUCK_STEP}) AS st
      FROM packed
    ),
    fin AS (
      SELECT st[1][1] AS cumneg, st[1][2] AS u2,
             st[1][3] AS n1, st[1][4] AS n2, st[1][5] AS tiesum
      FROM folded
    )
    SELECT {", ".join(_OUT)}
    FROM fin
    """,
)
def auc_length_source(spark, sf_dir):
    """T87: exact tie-corrected ROC-AUC of n_chars for code-vs-web
    (module header) — score-granular counts, array-accumulator
    cumulative fold (zero Window nodes), int64 U₂ and tie sums,
    one shared double tree, floor-1e6.

    Note: the synthetic `documents.source` values are src0/src1/…;
    src1 plays "code" (positive), src0 "web" (negative) — the
    label contract is declared here and pinned in the gate."""
    lab = (
        T(spark, sf_dir, "documents")
        .where(F.col("source").isin("src0", "src1"))
        .selectExpr(
            "CAST(n_chars AS BIGINT) AS score",
            "CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS y",
        )
    )
    bys = lab.groupBy("score").agg(
        F.expr("CAST(SUM(y) AS BIGINT)").alias("p"),
        F.expr("CAST(SUM(1 - y) AS BIGINT)").alias("n"),
    )
    packed = bys.agg(
        F.expr(
            "array_sort(collect_list(array(score, p, n)))"
        ).alias("rows_")
    )
    folded = packed.selectExpr(
        f"""aggregate(rows_,
             array(array(CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                         CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                         CAST(0 AS BIGINT))),
             (acc, x) -> {_SPARK_STEP}) AS st"""
    ).selectExpr(
        "element_at(element_at(st, 1), 1) AS cumneg",
        "element_at(element_at(st, 1), 2) AS u2",
        "element_at(element_at(st, 1), 3) AS n1",
        "element_at(element_at(st, 1), 4) AS n2",
        "element_at(element_at(st, 1), 5) AS tiesum",
    )
    return folded.selectExpr(*_OUT)
