"""TS80 — Engle-Granger two-step cointegration test between paired
series (Engle & Granger Econometrica'87; MacKinnon'91/2010 critical
values): the LEVELS-relationship verdict completing the paired-series
family — Granger (TS65) asks whether A's past helps forecast B's
CHANGES; Engle-Granger asks whether some linear combination of the
LEVELS is stationary (a shared stochastic trend).

Step 1: OLS  y = α + β·x  over the pair (x = doc A, y = doc B,
both sliced to L = min(n_a, n_b)); cleared slope β = B₁/C₁ with
B₁ = L·Sxy − Sx·Sy, C₁ = L·Sxx − Sx².

Step 2: lag-0 ADF on the residuals e_t = ỹ_t − β·x̃_t (tilde =
full-sample centering; no deterministic terms — the EG convention,
residuals are mean-zero by construction):

    γ̂ = Σ e_{t−1}Δe_t / Σ e²_{t−1},
    t  = γ̂·√(m−1) · √(Σe²_{t−1}) / √SSR,   m = L−1 transitions,

where every e-sum EXPANDS in β over 14 exact INT64 sufficient
statistics (full sums Sx Sy Sxx Syy Sxy; head sums Hx Hy Hxx Hyy
Hxy over t ≤ L−1; cross-lag sums Cxx Cyy Cxy Cyx; endpoint values) —
e.g. Σ e_{t−1}Δe_t = D₁ − βD₂ − βD₃ + β²D₄ with
D₁ = (Cyy − Hyy) − ȳ(y_L − y₁) etc., and
SSR = ΣΔe² − 2γ̂·Num + γ̂²·Den with ΣΔe² = Sdyy − 2β·Sdxy + β²·Sdxx,
all by the telescoping identities (each pinned in pytest against a
direct numpy residual regression).  The whole statistic is ONE shared
double tree over the int64 sums (floor-1e6); verdict t < −3.3377
(MacKinnon 2010 asymptotic 5% point for 2 variables with constant,
declared).  NULL-guarded at C₁ ≤ 0, Den ≤ 0, SSR ≤ 0, or m < 30.

Honest (gated) reading — the textbook MISUSE signal, reported rather
than hidden: Engle-Granger presumes BOTH inputs are I(1); these token
series are bounded and largely stationary (TS63's ADF rejects unit
roots broadly), so the step-2 residuals are stationary for most pairs
and the test "finds cointegration" at a HIGH rate (~90%+) — which
here means only "the residual has no unit root", exactly what
stationary inputs guarantee.  The gate pins that measured rate; the
real discriminating evidence lives in pytest: two independent random
walks (genuinely I(1), no relationship) must mostly FAIL to reject,
while a planted cointegrated pair (shared random walk + stationary
offsets) must reject decisively.

Scale shape: ZERO exchanges beyond the 1-row-per-pair broadcast zip
join of consecutive docs; all folds linear in L.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_EG_CRIT = "-3.3377"  # MacKinnon (2010) asymptotic 5%, 2 vars, constant


def _folds(eng: str) -> dict[str, str]:
    """14 int64 folds + 4 endpoints over the sliced pair arrays
    xa (= x) and xb (= y), 1-indexed, plus column L."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, CAST({i} AS INT))") if sp else (
        lambda a, i: f"{a}[{i}]"
    )

    def fold(lo: str, hi: str, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(CAST({lo} AS INT), CAST({hi} AS INT)),"
                f" CAST(0 AS BIGINT), (a, t) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(CAST({lo} AS BIGINT),"
            f" CAST({hi} AS BIGINT) + 1),"
            f" t -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    x = el("xa", "t")
    y = el("xb", "t")
    xl = el("xa", "t - 1")
    yl = el("xb", "t - 1")
    return {
        # full sums t = 1..L
        "sx": fold("1", "L", x),
        "sy": fold("1", "L", y),
        "sxx": fold("1", "L", f"{x} * {x}"),
        "syy": fold("1", "L", f"{y} * {y}"),
        "sxy": fold("1", "L", f"{x} * {y}"),
        # head sums t = 1..L−1
        "hx": fold("1", "L - 1", x),
        "hy": fold("1", "L - 1", y),
        "hxx": fold("1", "L - 1", f"{x} * {x}"),
        "hyy": fold("1", "L - 1", f"{y} * {y}"),
        "hxy": fold("1", "L - 1", f"{x} * {y}"),
        # cross-lag sums t = 2..L  (lag · current)
        "cxx": fold("2", "L", f"{xl} * {x}"),
        "cyy": fold("2", "L", f"{yl} * {y}"),
        "cxy": fold("2", "L", f"{xl} * {y}"),  # x_{t−1}·y_t
        "cyx": fold("2", "L", f"{yl} * {x}"),  # y_{t−1}·x_t
        # endpoints
        "x1": f"CAST({el('xa', '1')} AS BIGINT)",
        "xn": f"CAST({el('xa', 'L')} AS BIGINT)",
        "y1": f"CAST({el('xb', '1')} AS BIGINT)",
        "yn": f"CAST({el('xb', 'L')} AS BIGINT)",
    }


def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


# the shared double tree (identical strings both engines)
_XB = f"({_d('sx')} / {_d('L')})"
_YB = f"({_d('sy')} / {_d('L')})"
_BETA = (
    f"(({_d('L')} * {_d('sxy')} - {_d('sx')} * {_d('sy')})"
    f" / ({_d('L')} * {_d('sxx')} - {_d('sx')} * {_d('sx')}))"
)
# head-centered second moments (Σ over t ≤ L−1 of centered products)
_A1 = f"({_d('hyy')} - 2.0 * {_YB} * {_d('hy')} + {_d('L - 1')} * {_YB} * {_YB})"
_A2 = (
    f"({_d('hxy')} - {_YB} * {_d('hx')} - {_XB} * {_d('hy')}"
    f" + {_d('L - 1')} * {_XB} * {_YB})"
)
_A3 = f"({_d('hxx')} - 2.0 * {_XB} * {_d('hx')} + {_d('L - 1')} * {_XB} * {_XB})"
# lag·diff cross terms
_D1 = f"({_d('cyy - hyy')} - {_YB} * {_d('yn - y1')})"
_D2 = f"({_d('cyx - hxy')} - {_YB} * {_d('xn - x1')})"
_D3 = f"({_d('cxy - hxy')} - {_XB} * {_d('yn - y1')})"
_D4 = f"({_d('cxx - hxx')} - {_XB} * {_d('xn - x1')})"
# diff second moments (exact int64 inside the cast)
_SDYY = _d("(syy - y1 * y1) + hyy - 2 * cyy")
_SDXY = _d("(sxy - x1 * y1) - cxy - cyx + hxy")
_SDXX = _d("(sxx - x1 * x1) + hxx - 2 * cxx")

_NUM = f"({_D1} - {_BETA} * {_D2} - {_BETA} * {_D3} + {_BETA} * {_BETA} * {_D4})"
_DEN = f"({_A1} - 2.0 * {_BETA} * {_A2} + {_BETA} * {_BETA} * {_A3})"
_GAMMA = f"({_NUM} / {_DEN})"
_SDEE = f"({_SDYY} - 2.0 * {_BETA} * {_SDXY} + {_BETA} * {_BETA} * {_SDXX})"
_SSR = f"({_SDEE} - 2.0 * {_GAMMA} * {_NUM} + {_GAMMA} * {_GAMMA} * {_DEN})"
_T = (
    f"({_GAMMA} * sqrt({_d('L - 2')}) * sqrt({_DEN}) / sqrt({_SSR}))"
)
_GUARD = (
    "L >= 31"
    f" AND (L * sxx - sx * sx) > 0"
    f" AND {_DEN} > 0 AND {_SSR} > 0"
)


@register(
    "engle_granger_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             least(a.n, b.n) AS L,
             list_slice(a.v, 1, least(a.n, b.n)) AS xa,
             list_slice(b.v, 1, least(a.n, b.n)) AS xb
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
    ),
    sums AS (
      SELECT doc_a, doc_b, L,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM prs
    )
    SELECT doc_a, doc_b, CAST(L - 1 AS BIGINT) AS m,
           sx, sy, sxx, syy, sxy, hxy, cxx, cyy, cxy, cyx,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_BETA)}
                ELSE CAST(NULL AS DOUBLE) END AS beta,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_GAMMA)}
                ELSE CAST(NULL AS DOUBLE) END AS gamma,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_T)}
                ELSE CAST(NULL AS DOUBLE) END AS eg_t,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                WHEN {_T} < {_EG_CRIT} THEN 1 ELSE 0 END
                AS BIGINT) AS cointegrated
    FROM sums
    """,
)
def engle_granger_pairs(spark, sf_dir):
    """TS80: Engle-Granger two-step cointegration t for 64
    consecutive-doc pairs (module header) — 14 int64 sufficient
    statistics + endpoints, residual ADF expanded in β by telescoping
    identities, one shared double tree, floor-1e6, verdict vs the
    MacKinnon −3.3377 asymptotic 5% point."""
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, x -> CAST(x AS BIGINT))").alias("v"),
    )
    a = docs.where(F.col("i") % 2 == 0).select(
        "i",
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("v").alias("va"),
    )
    b = docs.select(
        (F.col("i") - 1).alias("i"),
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("v").alias("vb"),
    )
    prs = a.join(F.broadcast(b), "i").selectExpr(
        "doc_a",
        "doc_b",
        "least(na, nb) AS L",
        "slice(va, 1, CAST(least(na, nb) AS INT)) AS xa",
        "slice(vb, 1, CAST(least(na, nb) AS INT)) AS xb",
    )
    sums = prs.select(
        "doc_a",
        "doc_b",
        "L",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return sums.selectExpr(
        "doc_a",
        "doc_b",
        "CAST(L - 1 AS BIGINT) AS m",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        "hxy",
        "cxx",
        "cyy",
        "cxy",
        "cyx",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_BETA)}"
        " ELSE CAST(NULL AS DOUBLE) END AS beta",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_GAMMA)}"
        " ELSE CAST(NULL AS DOUBLE) END AS gamma",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_T)}"
        " ELSE CAST(NULL AS DOUBLE) END AS eg_t",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        f" WHEN {_T} < {_EG_CRIT} THEN 1 ELSE 0 END"
        " AS BIGINT) AS cointegrated",
    )
