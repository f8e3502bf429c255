"""TS47 — detrended fluctuation analysis (DFA-1, Peng et al. PRE'94):
the long-range-correlation exponent that, unlike TS40's rescaled
range, removes per-box LINEAR trends before measuring fluctuation —
the standard scaling diagnostic for nonstationary series (α ≈ 0.5
uncorrelated, α ≈ 1 1/f, α ≈ 1.5 Brownian).

Exactness design: over the first nn = min(n_tok, 128) tokens, the
mean-centered profile is kept INTEGER by nn-scaling —
Ỹ_i = nn·P_i − i·S where P_i is the int64 prefix sum (all ≤ 8.2e8, so
every Ỹ is also EXACTLY representable as a double).  Per box of size
s ∈ {4, 8, 16, 32}: the OLS residual sum of squares in closed form
RSS = (C_yy − C_ty²/C_tt)/s with C_ty = s·B − St·A, C_yy = s·Q − A²,
where A = Σy and B = Σ t·y are integer-valued doubles (≤ 3.4e12 <
2⁵³ — exact regardless of order) and Q = Σy² (up to 4.4e19) is an
ORDER-PINNED left fold, so both engines accumulate the identical IEEE
sequence (the Goertzel/Holt precedent); C_tt and St are per-s integer
literals.  F(s) = √(Σ_b RSS_b / (n_b·s)) / nn and α = the 4-point
ln-ln OLS slope — one shared verbatim tree (floor-1e6 outputs, α from
the RAW f values).

Scale shape: ZERO exchanges — per-row HOFs (the prefix table is O(n²)
slice-folds bounded by the 128 cap).  A pure map job at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_NN = 128
_SS = (4, 8, 16, 32)

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq(self, lo, hi) -> str:
        if self.sp:
            return f"sequence({lo}, {hi})"
        return f"range({lo}, ({hi}) + 1)"

    def ifold(self, arr: str) -> str:
        """Order-pinned int64 left fold sum of an int64 list."""
        if self.sp:
            return (
                f"aggregate({arr}, CAST(0 AS BIGINT), (a, x) -> a + x)"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}),"
            f" (a, x) -> a + x)"
        )

    def ffold(self, arr: str) -> str:
        """Order-pinned DOUBLE left fold sum of a double list."""
        if self.sp:
            return (
                f"aggregate({arr}, CAST(0 AS DOUBLE), (a, x) -> a + x)"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {arr}),"
            f" (a, x) -> a + x)"
        )

    def slice(self, a: str, start1, ln) -> str:
        if self.sp:
            return f"slice({a}, {start1}, {ln})"
        return f"list_slice({a}, {start1}, ({start1}) + ({ln}) - 1)"


def _stage_w(e: _E) -> dict[str, str]:
    if e.sp:
        w = (
            f"transform(slice(tokens, 1, {_NN}),"
            f" x -> CAST(x AS BIGINT))"
        )
    else:
        w = (
            f"list_transform(list_slice(tokens, 1, {_NN}),"
            f" x -> CAST(x AS BIGINT))"
        )
    return {"nn": f"least(n_tok, {_NN})", "w": w}


def _stage_prof(e: _E) -> dict[str, str]:
    # P_i per prefix (O(n²) slice-folds, bounded by the 128 cap);
    # Ỹ_i = nn·P_i − i·S, exactly representable as double
    stot = e.ifold("w")
    prefix = e.ifold(e.slice("w", "1", "i"))
    prof = (
        f"{e.tr}({e.seq(1, 'nn')}, i -> CAST(CAST(nn AS BIGINT)"
        f" * ({prefix}) - CAST(i AS BIGINT) * stot AS DOUBLE))"
    )
    return {"stot": stot, "prof": prof}


def _fs_expr(e: _E, s: int) -> str:
    """Σ_b RSS_b for box size s, then F(s)/nn — one double expr."""
    st = s * (s + 1) // 2
    stt2 = s * (s + 1) * (2 * s + 1) // 6  # Σ t²
    ctt = s * stt2 - st * st
    y = e.slice("prof", f"b * {s} + 1", str(s))
    a_sum = e.ffold(y)
    b_sum = e.ffold(
        f"{e.tr}({e.seq(0, s - 1)}, j ->"
        f" CAST(j + 1 AS DOUBLE) * {e.el('yy', 'j + 1')})"
    )
    q_sum = e.ffold(f"{e.tr}(yy, p -> p * p)")
    rss = (
        f"(((CAST({s} AS DOUBLE) * q) - (a * a))"
        f" - ((CAST({s} AS DOUBLE) * b) - (CAST({st} AS DOUBLE) * a))"
        f" * ((CAST({s} AS DOUBLE) * b) - (CAST({st} AS DOUBLE) * a))"
        f" / CAST({ctt} AS DOUBLE)) / CAST({s} AS DOUBLE)"
    )
    # bind yy (the box slice), then a/b/q, via single-element-array
    # transforms (the hurst_rs precedent)
    if e.sp:
        rss_z = (
            rss.replace(" q)", " z.q)")
            .replace("(a ", "(z.a ")
            .replace(" a)", " z.a)")
            .replace(" b)", " z.b)")
        )
        per_box = (
            f"element_at(transform(array(struct({a_sum} AS a,"
            f" {b_sum} AS b, {q_sum} AS q)), z -> {rss_z}), 1)"
        )
        boxed = (
            f"aggregate(transform(sequence(0, nn DIV {s} - 1), b ->"
            f" element_at(transform(array({y}), yy -> {per_box}), 1)),"
            f" CAST(0 AS DOUBLE), (acc, r) -> acc + r)"
        )
        nb = f"nn DIV {s}"
    else:
        rss_z = (
            rss.replace(" q)", " z['q'])")
            .replace("(a ", "(z['a'] ")
            .replace(" a)", " z['a'])")
            .replace(" b)", " z['b'])")
        )
        per_box = (
            f"list_transform([{{'a': {a_sum}, 'b': {b_sum},"
            f" 'q': {q_sum}}}], z -> {rss_z})[1]"
        )
        boxed = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform(range(nn // {s}), b ->"
            f" list_transform([{y}], yy -> {per_box})[1])),"
            f" (acc, r) -> acc + r)"
        )
        nb = f"nn // {s}"
    return (
        f"sqrt(({boxed}) / (CAST({nb} AS DOUBLE)"
        f" * CAST({s} AS DOUBLE))) / CAST(nn AS DOUBLE)"
    )


def _ln(k) -> str:
    return f"ln(CAST({k} AS DOUBLE))"


def _alpha_tree() -> str:
    m = len(_SS)
    sx = " + ".join(_ln(s) for s in _SS)
    sy = " + ".join(f"ln(f_{s})" for s in _SS)
    sxy = " + ".join(f"{_ln(s)} * ln(f_{s})" for s in _SS)
    sxx = " + ".join(f"{_ln(s)} * {_ln(s)}" for s in _SS)
    ok = " AND ".join(f"f_{s} > CAST(0 AS DOUBLE)" for s in _SS)
    raw = (
        f"(({sxy}) - ({sx}) * ({sy}) / CAST({m} AS DOUBLE))"
        f" / (({sxx}) - ({sx}) * ({sx}) / CAST({m} AS DOUBLE))"
    )
    return f"CASE WHEN {ok} THEN {raw} ELSE CAST(NULL AS DOUBLE) END"


@register(
    "dfa_alpha",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id, n_tok,
             {", ".join(f"{x} AS {k}" for k, x in _stage_w(_E('duck')).items())}
      FROM synth
    ),
    s1 AS (
      SELECT doc_id, nn, w, {_stage_prof(_E('duck'))['stot']} AS stot
      FROM s0
    ),
    s2 AS (
      SELECT doc_id, nn, {_stage_prof(_E('duck'))['prof']} AS prof
      FROM s1
    ),
    s3 AS (
      SELECT doc_id, nn,
             {", ".join(f"{_fs_expr(_E('duck'), s)} AS f_{s}" for s in _SS)}
      FROM s2
    )
    SELECT doc_id, nn,
           {", ".join(_FLOOR6.format(x=f"f_{s}") + f" AS f_{s}" for s in _SS)},
           {_FLOOR6.format(x=_alpha_tree())} AS alpha
    FROM s3
    """,
)
def dfa_alpha(spark, sf_dir):
    """TS47: DFA-1 scaling exponent per series (module header) —
    integer nn-scaled profile, closed-form per-box OLS residuals with
    order-pinned folds, F(s) at s ∈ {4,8,16,32}, α = the shared
    4-point ln-ln OLS tree (floor-1e6 outputs, α from RAW f).  Plan:
    ZERO exchanges — a pure map job."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    s0 = docs
    for k, x in _stage_w(e).items():
        s0 = s0.withColumn(k, F.expr(x))
    s1 = s0.withColumn("stot", F.expr(_stage_prof(e)["stot"]))
    s2 = s1.select(
        "doc_id", "nn", F.expr(_stage_prof(e)["prof"]).alias("prof")
    )
    s3 = s2.select(
        "doc_id",
        "nn",
        *[F.expr(_fs_expr(e, s)).alias(f"f_{s}") for s in _SS],
    )
    return s3.select(
        "doc_id",
        "nn",
        *[
            F.expr(_FLOOR6.format(x=f"f_{s}")).alias(f"f_{s}")
            for s in _SS
        ],
        F.expr(_FLOOR6.format(x=_alpha_tree())).alias("alpha"),
    )
