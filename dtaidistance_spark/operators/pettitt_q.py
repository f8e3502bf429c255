"""TS57 — Pettitt change-point test (Pettitt JRSS-C'79): the
NONPARAMETRIC single-changepoint detector — a Mann-Whitney statistic
swept over every split — complementing the parametric CUSUM (R30) and
SSE-based binseg (TS25/26): it needs no variance model and is immune
to outliers, which is why hydrology/climate pipelines default to it.

Statistic: U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j), K = max_t |U_t|,
changepoint t* = the first argmax, approximate significance
p ≈ 2·exp(−6K²/(n³+n²)).

Exactness: with Pettitt's own recurrence U_t = Σ_{i≤t} V_i where
V_i = Σ_j sgn(x_i − x_j), the sweep is O(n²) INTEGER algebra — V via
per-position HOF count differences, U via prefix slice-folds — over
the first 128 tokens; K, t*, and the tie rule (smallest t) are pure
int64.  The single float is the p tree (floor-1e6), verdict vs 0.05.

Scale shape: ZERO exchanges — per-row HOFs; a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_CAP = 128

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"
        self.fil = "filter" if self.sp else "list_filter"
        self.siz = "size" if self.sp else "len"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self, n) -> str:
        return f"sequence(0, ({n}) - 1)" if self.sp else f"range({n})"


def _stage(e: _E) -> dict[str, str]:
    # V_i = #(x_i > x_j) − #(x_i < x_j) over all j
    gt = f"{e.siz}({e.fil}(v, y -> {e.el('v', 'i + 1')} > y))"
    lt = f"{e.siz}({e.fil}(v, y -> {e.el('v', 'i + 1')} < y))"
    vv = (
        f"{e.tr}({e.seq0('nn')}, i -> CAST({gt} - {lt} AS BIGINT))"
    )
    return {"vv": vv}


def _stage2(e: _E) -> dict[str, str]:
    # U_t (1-based t, t = 1..nn−1) via prefix slice-folds of vv
    if e.sp:
        pre = (
            "aggregate(slice(vv, 1, t), CAST(0 AS BIGINT),"
            " (a, x) -> a + x)"
        )
        uu = f"transform(sequence(1, nn - 1), t -> {pre})"
    else:
        pre = (
            "list_reduce(list_prepend(CAST(0 AS BIGINT),"
            " list_slice(vv, 1, t)), (a, x) -> a + x)"
        )
        uu = f"list_transform(range(1, nn), t -> {pre})"
    return {"uu": uu}


def _stage3(e: _E) -> dict[str, str]:
    absmax = (
        f"array_max({e.tr}(uu, u -> abs(u)))"
        if e.sp
        else f"list_max({e.tr}(uu, u -> abs(u)))"
    )
    first_arg = e.el(
        f"{e.fil}({e.seq0(f'{e.siz}(uu)')},"
        f" t -> abs({e.el('uu', 't + 1')}) = kk)",
        1,
    )
    return {
        "kk": f"CAST({absmax} AS BIGINT)",
        # first argmax, emitted 1-based
        "t_star": f"CAST(({first_arg}) + 1 AS BIGINT)",
    }


_P = (
    "(CAST(2 AS DOUBLE) * exp(-(CAST(6 AS DOUBLE)"
    " * CAST(kk AS DOUBLE) * CAST(kk AS DOUBLE))"
    " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
    " + CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))))"
)


@register(
    "pettitt_changepoint",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id, least(n_tok, {_CAP}) AS nn,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    s1 AS (
      SELECT doc_id, nn, {_stage(_E('duck'))['vv']} AS vv FROM s0
    ),
    s2 AS (
      SELECT doc_id, nn, {_stage2(_E('duck'))['uu']} AS uu FROM s1
    ),
    s3 AS (
      SELECT doc_id, nn,
             {", ".join(f"{x} AS {k}" for k, x in _stage3(_E('duck')).items())}
      FROM s2
    )
    SELECT doc_id, nn, kk AS k_stat, t_star,
           {_F6.format(x=_P)} AS p_approx,
           CAST(CASE WHEN {_P} < CAST(0.05 AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_stable
    FROM s3
    """,
)
def pettitt_changepoint(spark, sf_dir):
    """TS57: Pettitt nonparametric changepoint per series (module
    header) — V/U integer algebra via the prefix recurrence, K and
    first-argmax t* int64, p tree floor-1e6, verdict vs 0.05."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    s0 = docs.select(
        "doc_id",
        F.expr(f"least(n_tok, {_CAP})").alias("nn"),
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}),"
            f" x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    s1 = s0.select("doc_id", "nn", F.expr(_stage(e)["vv"]).alias("vv"))
    s2 = s1.select("doc_id", "nn", F.expr(_stage2(e)["uu"]).alias("uu"))
    s3 = s2.select(
        "doc_id",
        "nn",
        *[F.expr(x).alias(k) for k, x in _stage3(e).items()],
    )
    return s3.select(
        "doc_id",
        "nn",
        F.col("kk").alias("k_stat"),
        "t_star",
        F.expr(_F6.format(x=_P)).alias("p_approx"),
        F.expr(
            f"CAST(CASE WHEN {_P} < CAST(0.05 AS DOUBLE)"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_stable"),
    )
