"""TS105 — record statistics per series (Rényi'62 record theorem;
Glick Am.Math.Monthly'78 survey): how many times does a series set
a new all-time HIGH (and low)?  For ANY iid continuous sequence
the answer is universal — E[R_n] = H_n (the harmonic number),
Var[R_n] = H_n − H_n⁽²⁾, independent of the distribution — which
makes the record count one of the purest randomness dials there
is: no moments, no symmetry, no scale enter the null.  An
operations pipeline reads it directly ("we hit a new latency
record 14 times this month — is that drift or luck?"), and the
registry's trend family (MK, OLS, CUSUM) gets a complement that
reacts ONLY to extremes.

    R↑ = #{j : y_j > max(y_1..y_{j−1})},  R↓ likewise with min
    (strict, first element counts as both — the convention under
    which E[R] = H_n exactly; integer ties undercount vs the
    continuous null and the adjacent-tie count is emitted),
    z = (R − H_n)/√(H_n − H_n⁽²⁾),  two-sided at 1.96.

Exactness: both record counts run as LINEAR state folds over the
token array (state = [running max, count] as a 2-int list — the
array-accumulator posture at per-element granularity; no O(n²)
prefix scan); H_n and H_n⁽²⁾ fold 1/j in pinned order; one shared
double tree; floor-1e6; NULL-guarded at n < 15.

Honest (gated) reading — measured, and it INVERTED the draft's
"most trend-sensitive dial" guess into the operator's real
character: records see the ENVELOPE, not the texture.  The
fast-mixing majority reads near-null (median z↑ = 0.22, z↓ =
0.27; rejects 24.6%/25.6% — elevated but nothing like the 94%
the runs/turning-points pair fires on the SAME corpus, a
contrast gated directly): the wrap oscillation that floods every
within-envelope dial barely touches the running max/min once the
early extremes are set.  What records DO catch is the
smooth-ramp minority — a heavy positive tail to z↑ = +179 — and
the PAIR identifies what it caught: in that tail z↓ sits BELOW
its null (median −1.2, corr(z↑, z↓) = −0.10 corpus-wide) — the
classic one-way-trend split (rising docs keep minting highs while
suppressing new lows), measured exactly where the draft expected
"both directions together" and the data said otherwise.  A
quarter of the corpus rejecting on extremes with a trend-shaped
pair-split, while nine-tenths reject on texture, is precisely the
two-dial decomposition a monitoring stack wants.  The LCG iid null sits at ~nominal with R ≈ H_n ≈ ln n + γ
(the universality gate, checked against exact H_n), and the
sorted-ascending extreme (R↑ = n, R↓ = 1) is exact.

Scale shape: ZERO exchanges — two linear folds per row, a pure
map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_BIG = 60000  # > any token

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_Z95 = "1.959963984540054"


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    if sp:
        up = (
            "element_at(aggregate(v, array(CAST(-1 AS BIGINT),"
            " CAST(0 AS BIGINT)), (acc, x) -> array("
            " greatest(element_at(acc, 1), x),"
            " element_at(acc, 2) + CASE WHEN x > element_at(acc, 1)"
            " THEN 1 ELSE 0 END)), 2)"
        )
        dn = (
            f"element_at(aggregate(v, array(CAST({_BIG} AS BIGINT),"
            " CAST(0 AS BIGINT)), (acc, x) -> array("
            " least(element_at(acc, 1), x),"
            " element_at(acc, 2) + CASE WHEN x < element_at(acc, 1)"
            " THEN 1 ELSE 0 END)), 2)"
        )
        ties = (
            "aggregate(sequence(1, CAST(n - 1 AS INT)),"
            " CAST(0 AS BIGINT), (a, j) -> a + CASE WHEN"
            " element_at(v, CAST(j AS INT))"
            " = element_at(v, CAST(j + 1 AS INT))"
            " THEN 1 ELSE 0 END)"
        )
        hn = (
            "aggregate(sequence(1, CAST(n AS INT)), CAST(0 AS DOUBLE),"
            " (a, j) -> a + CAST(1 AS DOUBLE) / CAST(j AS DOUBLE))"
        )
        hn2 = (
            "aggregate(sequence(1, CAST(n AS INT)), CAST(0 AS DOUBLE),"
            " (a, j) -> a + CAST(1 AS DOUBLE)"
            " / (CAST(j AS DOUBLE) * CAST(j AS DOUBLE)))"
        )
    else:
        wrap = "list_transform(v, x -> [x])"
        up = (
            f"list_reduce(list_prepend([CAST(-1 AS BIGINT),"
            f" CAST(0 AS BIGINT)], {wrap}), (acc, x) ->"
            " [greatest(acc[1], x[1]),"
            " acc[2] + CASE WHEN x[1] > acc[1] THEN 1 ELSE 0 END])[2]"
        )
        dn = (
            f"list_reduce(list_prepend([CAST({_BIG} AS BIGINT),"
            f" CAST(0 AS BIGINT)], {wrap}), (acc, x) ->"
            " [least(acc[1], x[1]),"
            " acc[2] + CASE WHEN x[1] < acc[1] THEN 1 ELSE 0 END])[2]"
        )
        ties = (
            "list_reduce(list_prepend(CAST(0 AS BIGINT),"
            " list_transform(range(CAST(1 AS BIGINT), n),"
            " j -> CAST(CASE WHEN v[j] = v[j + 1] THEN 1 ELSE 0 END"
            " AS BIGINT))), (a, q) -> a + q)"
        )
        hn = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            " list_transform(range(CAST(1 AS BIGINT), n + 1),"
            " j -> CAST(1 AS DOUBLE) / CAST(j AS DOUBLE))),"
            " (a, q) -> a + q)"
        )
        hn2 = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            " list_transform(range(CAST(1 AS BIGINT), n + 1),"
            " j -> CAST(1 AS DOUBLE)"
            " / (CAST(j AS DOUBLE) * CAST(j AS DOUBLE)))),"
            " (a, q) -> a + q)"
        )
    return {"r_up": up, "r_dn": dn, "ties": ties, "hn": hn, "hn2": hn2}


_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_SD = "sqrt(hn - hn2)"
_ZU = f"(({_D('r_up')} - hn) / {_SD})"
_ZD = f"(({_D('r_dn')} - hn) / {_SD})"
_G = "n >= 15"

_OUT = [
    f"CASE WHEN {_G} THEN {_F6.format(x='hn')}"
    " ELSE CAST(NULL AS DOUBLE) END AS harmonic_n",
    f"CASE WHEN {_G} THEN {_F6.format(x=_ZU)}"
    " ELSE CAST(NULL AS DOUBLE) END AS z_up",
    f"CASE WHEN {_G} THEN {_F6.format(x=_ZD)}"
    " ELSE CAST(NULL AS DOUBLE) END AS z_down",
    f"CAST(CASE WHEN NOT ({_G}) THEN NULL"
    f" WHEN abs({_ZU}) > {_Z95} THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_up",
    f"CAST(CASE WHEN NOT ({_G}) THEN NULL"
    f" WHEN abs({_ZD}) > {_Z95} THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_down",
]


@register(
    "record_statistics",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, n,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM docs
    )
    SELECT doc_id, n, r_up, r_dn, ties,
           {", ".join(_OUT)}
    FROM sums
    """,
)
def record_statistics(spark, sf_dir):
    """TS105: upper/lower record counts vs the Rényi H_n null per
    series (module header) — linear [max,count] state folds, pinned
    harmonic folds, one double tree, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return sums.selectExpr("doc_id", "n", "r_up", "r_dn", "ties", *_OUT)
