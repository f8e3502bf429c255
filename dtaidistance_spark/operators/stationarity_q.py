"""TS63/TS64 — the classical stationarity verdict PAIR per series:
Dickey-Fuller unit-root test (TS63, Dickey & Fuller JASA'79, lag-0
with constant — the null is a unit root) and the KPSS
level-stationarity test (TS64, Kwiatkowski-Phillips-Schmidt-Shin
J.Econometrics'92, bandwidth-0 short-run variance — the null is
stationarity).  Running both with OPPOSITE nulls is the textbook
confirmatory design: concordant answers settle the question, and the
two discordant cells expose borderline series.

TS63 (DF): regress Δy_t on y_{t−1} with constant over the m = n−1
transitions.  This is EXACTLY the TS61 cleared-OLS machinery with
(x, y) = (lagged level, difference): A = m·Σxd − Σx·Σd,
B = m·Σxx − (Σx)², C = m·Σdd − (Σd)², all pure INT64 folds (bounds
for n ≤ 8192, y < 50257: |A|, B, C ≤ 1.7e17), and
t = A·√((m−2)/(B·C − A²)) is ONE shared float tree (floor-1e6).
Verdict: unit root REJECTED when t < −2.86 — the asymptotic 5%
Dickey-Fuller critical value for the constant case (Fuller 1976
Table 8.5.2; a tabulated constant, like 1.96, not derivable
algebraically).

TS64 (KPSS): η = Σ_t S_t² / (n²·σ̂²) with S_t the partial sums of
deviations and σ̂² the bandwidth-0 (iid short-run) variance — the
simplest published variant, declared.  Cleared to integers:
u_t = n·P_t − t·Σy (int64, |u_t| ≤ 3.4e12, and u_n = 0 exactly — the
telescoping check), Q = Σ u_t² accumulated in DECIMAL(38,0)
(≤ 9.6e28; emitted as an exact digit STRING per the stats_moments
pandas-hop lesson), M2 = n·Σy² − (Σy)² int64, and
η = Q / (n²·M2) one shared float tree.  Verdict: stationarity
rejected when η > 0.463 (KPSS'92 Table 1, level case, 5%).

Honest (gated) reading: the mod-V wraps make most series stationary
sawtooths and the two tests CONCUR — 487/512 land in the
(DF rejects unit root, KPSS retains stationarity) cell; the 9
unwrapped-ramp docs land in the opposite concordant cell
(nonstationary by both framings); 16 are borderline-discordant; and
the no-evidence cell (DF retains AND KPSS retains) is EMPTY — every
series is long enough for at least one test to speak.

Scale shape: ZERO exchanges for both — DF is pure per-row folds;
KPSS threads the prefix sum through a struct-accumulator fold
(named_struct / DuckDB struct literal), so even the running sum never
explodes or shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _df_folds(eng: str) -> dict[str, str]:
    """Transition folds over j = 1..m (1-indexed array v, m = n−1):
    x = v[j], d = v[j+1] − v[j]."""
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")
    x = el("j")
    d = f"({el('j + 1')} - {el('j')})"

    def fold(term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, CAST(n AS INT) - 1),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, CAST(n AS INT)),"
            f" j -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    return {
        "s_x": fold(x),
        "s_xx": fold(f"{x} * {x}"),
        "s_d": fold(d),
        "s_xd": fold(f"{x} * {d}"),
        "s_dd": fold(f"{d} * {d}"),
    }


_DF_ABC = {
    "a_num": "(n - 1) * s_xd - s_x * s_d",
    "b_den": "(n - 1) * s_xx - s_x * s_x",
    "c_num": "(n - 1) * s_dd - s_d * s_d",
}

_DF_T = (
    "CASE WHEN CAST(c_num AS DOUBLE) * CAST(b_den AS DOUBLE)"
    " - CAST(a_num AS DOUBLE) * CAST(a_num AS DOUBLE) > 0.0 THEN"
    " CAST(a_num AS DOUBLE)"
    " * sqrt((CAST(n AS DOUBLE) - 3.0)"
    " / (CAST(c_num AS DOUBLE) * CAST(b_den AS DOUBLE)"
    " - CAST(a_num AS DOUBLE) * CAST(a_num AS DOUBLE)))"
    " ELSE CAST(NULL AS DOUBLE) END"
)

_DF_REJ = (
    "CAST(CASE WHEN ({t}) IS NULL THEN NULL"
    " WHEN ({t}) < -2.86 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "adf_unit_root",
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
                        for k, x in _df_folds("duck").items())}
      FROM docs
    ),
    abc AS (
      SELECT doc_id, n,
             {", ".join(f"CAST({x} AS BIGINT) AS {k}"
                        for k, x in _DF_ABC.items())}
      FROM sums
    )
    SELECT doc_id, n, a_num, b_den, c_num,
           {_F6.format(x=_DF_T)} AS t_stat,
           {_DF_REJ.format(t=_DF_T)} AS reject_unit_root
    FROM abc
    """,
)
def adf_unit_root(spark, sf_dir):
    """TS63: lag-0 Dickey-Fuller unit-root t per series (module
    header) — cleared int64 A/B/C over the transition folds, t one
    shared tree, verdict t < −2.86 (Fuller'76 constant-case 5%)."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        *[F.expr(x).alias(k) for k, x in _df_folds("spark").items()],
    )
    abc = sums.select(
        "doc_id",
        "n",
        *[F.expr(x).cast("long").alias(k) for k, x in _DF_ABC.items()],
    )
    return abc.select(
        "doc_id",
        "n",
        "a_num",
        "b_den",
        "c_num",
        F.expr(_F6.format(x=_DF_T)).alias("t_stat"),
        F.expr(_DF_REJ.format(t=_DF_T)).alias("reject_unit_root"),
    )


# ---------------------------------------------------------------- KPSS

_KP_SUMS_SPARK = {
    "s1": "aggregate(v, CAST(0 AS BIGINT), (a, y) -> a + y)",
    "s2": "aggregate(v, CAST(0 AS BIGINT), (a, y) -> a + y * y)",
}
_KP_SUMS_DUCK = {
    "s1": (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(v, y -> y)), (a, q) -> a + q)"
    ),
    "s2": (
        "list_reduce(list_prepend(CAST(0 AS BIGINT),"
        " list_transform(v, y -> y * y)), (a, q) -> a + q)"
    ),
}

# struct-accumulator prefix fold: p = running Σy, t = position,
# q = Σ (n·p − t·s1)² in DECIMAL(38,0)/HUGEINT.  u_t is written out
# twice — HOF lambdas have no LET.
#
# LIVE HAZARD (caught by the 5-element hand probe before the oracle
# could bless it): DuckDB 1.0 evaluates the struct-literal fields of a
# list_reduce lambda SEQUENTIALLY, and later fields see the PARTIALLY
# UPDATED accumulator — with 'q' listed after 'p'/'t' its a.p/a.t were
# already overwritten, silently double-counting the current element
# (u₂ read as 5·(P₂+y₂) − 14·(t+1) = −17 instead of −8).  Spark's
# named_struct is pure (a is bound once per call).  The ORDER-ROBUST
# form lists 'q' FIRST: sequential evaluation then reads the pristine
# accumulator, and pure evaluation is unaffected — both engines agree.
_KP_Q_SPARK = (
    "aggregate(v,"
    " named_struct('q', CAST(0 AS DECIMAL(38,0)),"
    " 'p', CAST(0 AS BIGINT), 't', CAST(0 AS BIGINT)),"
    " (a, y) -> named_struct("
    " 'q', a.q + CAST(n * (a.p + y) - (a.t + 1) * s1 AS DECIMAL(38,0))"
    " * CAST(n * (a.p + y) - (a.t + 1) * s1 AS DECIMAL(38,0)),"
    " 'p', a.p + y, 't', a.t + 1),"
    " a -> a.q)"
)
_KP_Q_DUCK = (
    "list_reduce(list_prepend("
    " {'q': CAST(0 AS HUGEINT), 'p': CAST(0 AS BIGINT),"
    " 't': CAST(0 AS BIGINT)},"
    " list_transform(v, y -> {'q': CAST(0 AS HUGEINT), 'p': y,"
    " 't': CAST(1 AS BIGINT)})),"
    " (a, e) -> {"
    " 'q': a.q + CAST(n * (a.p + e.p) - (a.t + e.t) * s1 AS HUGEINT)"
    " * CAST(n * (a.p + e.p) - (a.t + e.t) * s1 AS HUGEINT),"
    " 'p': a.p + e.p, 't': a.t + e.t})['q']"
)

_ETA = "(CAST(q AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(m2 AS DOUBLE)))"

_KP_REJ = (
    "CAST(CASE WHEN m2 <= 0 THEN NULL"
    f" WHEN ({_ETA}) > 0.463 THEN 1 ELSE 0 END AS BIGINT)"
)

_KP_GUARD = "CASE WHEN m2 > 0 THEN {x} ELSE CAST(NULL AS DOUBLE) END"


@register(
    "kpss_level_stat",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, n, v,
             {", ".join(f"{x} AS {k}" for k, x in _KP_SUMS_DUCK.items())}
      FROM docs
    ),
    w AS (
      SELECT doc_id, n, s1,
             CAST(n * s2 - s1 * s1 AS BIGINT) AS m2,
             {_KP_Q_DUCK} AS q
      FROM sums
    )
    SELECT doc_id, n, s1, m2,
           q::VARCHAR AS q,
           {_F6.format(x=_KP_GUARD.format(x=_ETA))} AS eta,
           {_KP_REJ} AS reject_stationary
    FROM w
    """,
)
def kpss_level_stat(spark, sf_dir):
    """TS64: bandwidth-0 KPSS level-stationarity η per series (module
    header) — struct-accumulator prefix fold keeps u_t = n·P_t − t·Σy
    integer, Q exact in DECIMAL(38,0) (digit-string emitted), η one
    shared tree, verdict η > 0.463 (KPSS'92 level 5%)."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        "v",
        *[F.expr(x).alias(k) for k, x in _KP_SUMS_SPARK.items()],
    )
    w = sums.select(
        "doc_id",
        "n",
        "s1",
        F.expr("CAST(n * s2 - s1 * s1 AS BIGINT)").alias("m2"),
        F.expr(_KP_Q_SPARK).alias("q"),
    )
    return w.select(
        "doc_id",
        "n",
        "s1",
        "m2",
        F.expr("CAST(q AS STRING)").alias("q"),
        F.expr(_F6.format(x=_KP_GUARD.format(x=_ETA))).alias("eta"),
        F.expr(_KP_REJ).alias("reject_stationary"),
    )
