"""TS58 — Kendall τ-b between paired series (Kendall Biometrika'38;
the τ-b tie correction): the third rank-correlation next to TS15's
Spearman (which needs ranks) and TS27's Pearson (which needs moments)
— τ counts concordant vs discordant PAIRS directly, the most robust
of the three and the one with the cleanest integer structure.

Pairs: consecutive docs (2p, 2p+1), first 64 positions of each.  ALL
sufficient statistics are int64 HOF counts over the 2 016 index
pairs: concordant C, discordant D, ties-in-x-only Tx, ties-in-y-only
Ty (pairs tied in both count in neither correction term).  τ-b =
(C − D)/√((n₀−Tx−Txy)·(n₀−Ty−Txy))... spelled exactly as
(C − D)/√(nx·ny) with nx = C + D + Ty, ny = C + D + Tx — the standard
identity keeping every input int64; ONE float divide+sqrt, floor-1e6.

Scale shape: ZERO exchanges beyond the 1-row-per-pair zip join of
consecutive docs (broadcast); O(n²) HOFs bounded by the 64 cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs
_CAP = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.fil = "filter" if self.sp else "list_filter"
        self.siz = "size" if self.sp else "len"
        self.tr = "transform" if self.sp else "list_transform"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def cnt2(self, pred: str) -> str:
        """Count over index pairs 0 ≤ i < j < CAP of pred(i, j)."""
        inner = (
            f"{self.siz}({self.fil}("
            + (
                f"sequence(i + 1, {_CAP} - 1)"
                if self.sp
                else f"range(i + 1, {_CAP})"
            )
            + f", j -> {pred}))"
        )
        outer = (
            f"sequence(0, {_CAP} - 2)"
            if self.sp
            else f"range({_CAP} - 1)"
        )
        if self.sp:
            return (
                f"aggregate({outer}, CAST(0 AS BIGINT),"
                f" (a, i) -> a + {inner})"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform({outer}, i -> CAST({inner} AS BIGINT))),"
            f" (a, x) -> a + x)"
        )


def _counts(e: _E) -> dict[str, str]:
    dx = f"({e.el('xa', 'i + 1')} - {e.el('xa', 'j + 1')})"
    dy = f"({e.el('xb', 'i + 1')} - {e.el('xb', 'j + 1')})"
    return {
        "c_cnt": e.cnt2(f"{dx} * {dy} > 0"),
        "d_cnt": e.cnt2(f"{dx} * {dy} < 0"),
        "tx_cnt": e.cnt2(f"{dx} = 0 AND {dy} != 0"),
        "ty_cnt": e.cnt2(f"{dy} = 0 AND {dx} != 0"),
    }


_TAU = (
    "CASE WHEN (c_cnt + d_cnt + ty_cnt) > 0"
    " AND (c_cnt + d_cnt + tx_cnt) > 0 THEN"
    " CAST(c_cnt - d_cnt AS DOUBLE)"
    " / sqrt(CAST(c_cnt + d_cnt + ty_cnt AS DOUBLE)"
    " * CAST(c_cnt + d_cnt + tx_cnt AS DOUBLE))"
    " ELSE CAST(NULL AS DOUBLE) END"
)


@register(
    "kendall_tau_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.v AS xa, b.v AS xb
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
    ),
    cc AS (
      SELECT doc_a, doc_b,
             {", ".join(f"{x} AS {k}" for k, x in _counts(_E('duck')).items())}
      FROM prs
    )
    SELECT doc_a, doc_b, c_cnt, d_cnt, tx_cnt, ty_cnt,
           {_F6.format(x=_TAU)} AS tau_b
    FROM cc
    """,
)
def kendall_tau_pairs(spark, sf_dir):
    """TS58: Kendall τ-b for 64 consecutive-doc pairs (module header)
    — concordant/discordant/tie counts all int64 over the 2 016 index
    pairs, τ-b one float tree, floor-1e6."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}),"
            f" x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    a = docs.where(F.col("i") % 2 == 0).select(
        F.col("i"),
        F.col("doc_id").alias("doc_a"),
        F.col("v").alias("xa"),
    )
    b = docs.select(
        (F.col("i") - 1).alias("i"),
        F.col("doc_id").alias("doc_b"),
        F.col("v").alias("xb"),
    )
    prs = a.join(F.broadcast(b), "i")
    cc = prs.select(
        "doc_a",
        "doc_b",
        *[F.expr(x).alias(k) for k, x in _counts(e).items()],
    )
    return cc.select(
        "doc_a",
        "doc_b",
        "c_cnt",
        "d_cnt",
        "tx_cnt",
        "ty_cnt",
        F.expr(_F6.format(x=_TAU)).alias("tau_b"),
    )
