"""TS94 — detrended cross-correlation coefficient ρ_DCCA between
paired series (Podobnik–Stanley PRL'08; Zebende Physica A'11
coefficient form): the CROSS member of the scaling family — DFA
(TS47) reads each series' own long-range correlation after removing
per-box linear trends; DCCA asks whether two series' DETRENDED
fluctuations co-move at each scale, the dial that separates "both
trend upward" (which raw correlation conflates) from "their
wiggles are coupled".  Scale-resolved: ρ(s) can differ at s = 4
and s = 32 when coupling lives at one timescale only — the
box-domain analog of TS88's per-frequency coherence.

Per consecutive-doc pair, both series truncated to nn = 128 (pairs
shorter than nn DROPPED in both engines — the TS88 convention),
integer profiles Ỹ_i = nn·P_i − i·S (the TS47 nn-scaling: exact
int64-valued doubles; the common factor cancels in ρ).  For box
size s ∈ {4, 8, 16, 32}, non-overlapping boxes, per-box OLS-{1,t}
residual cross-products in closed form (u, v ∈ {x, y}):

    Σ rᵘ·rᵛ = [ (s·Suv − Su·Sv) − Ctu·Ctv/Ctt ] / s,
    Ctu = s·Bu − St·Su,   Ctt = s·Stt − St²  (integer literals),

F²uv(s) = box-average, and ρ(s) = F²xy / √(F²xx·F²yy) — by
Cauchy–Schwarz over the stacked residual vectors ρ ∈ [−1, 1]
always (gated).  Exactness: profile values ≤ 8.2e8 are exact
doubles; the per-box sums are ORDER-PINNED left folds (identical
IEEE sequence both engines — the TS47 precedent for Σ prof² beyond
2⁵³); everything after is ONE shared double tree; floor-1e6;
NULL-guarded at degenerate F²xx/F²yy.

Honest (gated) reading — measured: consecutive docs are
independent generators, and ρ_DCCA reads that honestly at every
scale (median |ρ| ≈ 0.07–0.09, mean ≈ 0, max |ρ| = 0.43, no
systematic sign, at s = 4 through 32) — notable because the pairs
SHARE the period-64 architecture, which a raw correlation can
read as coupling; the per-box detrending strips exactly that
common smooth structure and leaves the verdict to the
innovations.  The discriminating controls
live in pytest: a shared-innovation pair reads ρ > 0.9 at every
scale, an anti-coupled pair ρ < −0.9, and DCCA of a series with
itself is exactly 1 at all scales (the F²xy = F²xx degeneracy).

Scale shape: one broadcast consecutive-doc zip join, then ZERO
exchanges — per-row HOF folds (O(nn²) prefix slice-folds bounded
by the 128 cap), a pure map job at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs
_NN = 128
_SS = (4, 8, 16, 32)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"

    def el(self, a: str, i) -> str:
        if self.sp:
            return f"element_at({a}, CAST({i} AS INT))"
        return f"{a}[{i}]"

    def seq(self, lo, hi) -> str:
        if self.sp:
            return f"sequence({lo}, {hi})"
        return f"range({lo}, ({hi}) + 1)"

    def ifold(self, arr: str) -> str:
        if self.sp:
            return f"aggregate({arr}, CAST(0 AS BIGINT), (a, x) -> a + x)"
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {arr}),"
            f" (a, x) -> a + x)"
        )

    def ffold(self, arr: str) -> str:
        if self.sp:
            return f"aggregate({arr}, CAST(0 AS DOUBLE), (a, x) -> a + x)"
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {arr}),"
            f" (a, x) -> a + x)"
        )

    def slice(self, a: str, start1, ln) -> str:
        if self.sp:
            return f"slice({a}, {start1}, {ln})"
        return f"list_slice({a}, {start1}, ({start1}) + ({ln}) - 1)"

    def prof(self, x: str) -> str:
        """Ỹ_i = nn·P_i − i·S as exact DOUBLE array (TS47 scaling)."""
        stot = self.ifold(x)
        prefix = self.ifold(self.slice(x, "1", "i"))
        return (
            f"{self.tr}({self.seq(1, _NN)}, i -> CAST("
            f"CAST({_NN} AS BIGINT) * ({prefix})"
            f" - CAST(i AS BIGINT) * ({stot}) AS DOUBLE))"
        )

    def boxsum(self, s: int, term: str) -> str:
        """Σ over boxes bx of Σ over jj=1..s of term(bx, jj)."""
        inner = self.ffold(f"{self.tr}({self.seq(1, s)}, jj -> {term})")
        return self.ffold(
            f"{self.tr}({self.seq(0, _NN // s - 1)}, bx -> {inner})"
        )


def _folds(eng: str) -> dict[str, str]:
    """The 5 per-size box-level sums needed for F²xx/F²yy/F²xy,
    pre-reduced: we emit Σ_boxes of each per-box CLEARED residual
    product directly (one fold per quantity)."""
    e = _E(eng)
    out = {}
    for s in _SS:
        st = s * (s + 1) // 2
        stt = s * (s + 1) * (2 * s + 1) // 6
        ctt = s * stt - st * st
        px = lambda: e.el("px", f"bx * {s} + jj")  # noqa: E731
        py = lambda: e.el("py", f"bx * {s} + jj")  # noqa: E731
        # per-box sums (inner folds), composed into the cleared
        # residual product, then summed over boxes — binding via
        # re-expansion (each sum re-derived where referenced; pure
        # expressions, identical both engines)
        sx = e.ffold(f"{e.tr}({e.seq(1, s)}, jj -> {px()})")
        sy = e.ffold(f"{e.tr}({e.seq(1, s)}, jj -> {py()})")
        bxs = e.ffold(
            f"{e.tr}({e.seq(1, s)}, jj -> CAST(jj AS DOUBLE) * {px()})"
        )
        bys = e.ffold(
            f"{e.tr}({e.seq(1, s)}, jj -> CAST(jj AS DOUBLE) * {py()})"
        )
        qxx = e.ffold(f"{e.tr}({e.seq(1, s)}, jj -> {px()} * {px()})")
        qyy = e.ffold(f"{e.tr}({e.seq(1, s)}, jj -> {py()} * {py()})")
        qxy = e.ffold(f"{e.tr}({e.seq(1, s)}, jj -> {px()} * {py()})")

        def rss(q, su, sv, bu, bv):
            ctu = f"(CAST({s} AS DOUBLE) * ({bu}) - CAST({st} AS DOUBLE) * ({su}))"
            ctv = f"(CAST({s} AS DOUBLE) * ({bv}) - CAST({st} AS DOUBLE) * ({sv}))"
            return (
                f"(((CAST({s} AS DOUBLE) * ({q}) - ({su}) * ({sv}))"
                f" - {ctu} * {ctv} / CAST({ctt} AS DOUBLE))"
                f" / CAST({s} AS DOUBLE))"
            )

        out[f"fxx_{s}"] = e.ffold(
            f"{e.tr}({e.seq(0, _NN // s - 1)},"
            f" bx -> {rss(qxx, sx, sx, bxs, bxs)})"
        )
        out[f"fyy_{s}"] = e.ffold(
            f"{e.tr}({e.seq(0, _NN // s - 1)},"
            f" bx -> {rss(qyy, sy, sy, bys, bys)})"
        )
        out[f"fxy_{s}"] = e.ffold(
            f"{e.tr}({e.seq(0, _NN // s - 1)},"
            f" bx -> {rss(qxy, sx, sy, bxs, bys)})"
        )
    return out


def _cols() -> list[str]:
    cols = []
    for s in _SS:
        g = f"fxx_{s} > 0 AND fyy_{s} > 0"
        rho = f"(fxy_{s} / sqrt(fxx_{s} * fyy_{s}))"
        cols.append(
            f"CASE WHEN {g} THEN {_F6.format(x=rho)}"
            f" ELSE CAST(NULL AS DOUBLE) END AS rho_s{s}"
        )
    return cols


@register(
    "dcca_pairs",
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
             list_slice(a.v, 1, {_NN}) AS xa,
             list_slice(b.v, 1, {_NN}) AS xb
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
      WHERE a.n >= {_NN} AND b.n >= {_NN}
    ),
    profs AS (
      SELECT doc_a, doc_b,
             {_E("duck").prof("xa")} AS px,
             {_E("duck").prof("xb")} AS py
      FROM prs
    ),
    folded AS (
      SELECT doc_a, doc_b,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM profs
    )
    SELECT doc_a, doc_b, {", ".join(_cols())}
    FROM folded
    """,
)
def dcca_pairs(spark, sf_dir):
    """TS94: ρ_DCCA at s ∈ {4,8,16,32} for 64 consecutive-doc pairs
    (module header) — TS47 integer profiles, order-pinned box folds,
    closed-form box-OLS residual products, one shared double tree,
    floor-1e6."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, x -> CAST(x AS BIGINT))").alias("v"),
    )
    a = docs.where((F.col("i") % 2 == 0) & (F.col("n") >= _NN)).select(
        "i",
        F.col("doc_id").alias("doc_a"),
        F.expr(f"slice(v, 1, {_NN})").alias("xa"),
    )
    b = docs.where(F.col("n") >= _NN).select(
        (F.col("i") - 1).alias("i"),
        F.col("doc_id").alias("doc_b"),
        F.expr(f"slice(v, 1, {_NN})").alias("xb"),
    )
    prs = a.join(F.broadcast(b), "i").select("doc_a", "doc_b", "xa", "xb")
    profs = prs.select(
        "doc_a",
        "doc_b",
        F.expr(e.prof("xa")).alias("px"),
        F.expr(e.prof("xb")).alias("py"),
    )
    folded = profs.select(
        "doc_a",
        "doc_b",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return folded.selectExpr("doc_a", "doc_b", *_cols())
