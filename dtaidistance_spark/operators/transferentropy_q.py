"""TS96 — transfer entropy in BOTH directions between paired series
(Schreiber PRL'00; the G-test form of the conditional-independence
null): the DIRECTIONAL completion of the dependence family — TS95's
symbolic MI reads whether two series are coupled AT ALL, Granger
(TS65) whether A's past LINEARLY improves forecasts of B; transfer
entropy asks the model-free version of Granger's question:

    TE_{X→Y} = H(y_{t+1} | y_t) − H(y_{t+1} | y_t, x_t)
             = Σ p(y',y,x) · ln[ n_{y'yx}·n_y / (n_{yx}·n_{y'y}) ],

the information x_t adds about y's NEXT symbol beyond y's own
present — zero iff y' ⊥ x | y, asymmetric by construction (the
arrow TS92 reads within one series, read BETWEEN two).  Fold-4
symbols (4³ = 64 triple cells over N = 511 transitions, ~8 per
cell, declared) on the first 512 tokens of each consecutive-doc
pair (short pairs dropped both engines).  N·TE decomposes into
four Σ n·ln n terms over exact INT64 indicator-fold counts (the
TS95 machinery with one extra index), G = 2N·TE has the
χ²((4−1)·(4−1)·4 = 36) conditional-independence null, and the
Miller–Madow-type bias floor (m_{y'yx} − m_{yx} − m_{y'y} + m_y)/2N
is emitted beside each TE.  Both directions come from the SAME
fold set with roles swapped; one shared double tree; floor-1e6;
verdicts at 50.998460165711464 (χ²₀.₉₅(36)).

Honest (gated) reading — measured: both directions sit AT their
bias floors (TE medians 0.0293/0.0317 nats vs the MM floor
0.0352, against the ln 4 ≈ 1.39 ceiling) — no information flows
between independent generators — with rejects at 17%/12% vs the
nominal 5%: the serial-correlation inflation of the iid
conditional-independence null, somewhat stronger than TS95's
unconditional 12% because conditioning on y_t spends cells and
the mod-4 trace mixes a bit slower than mod-8.  Net
directionality te_net is centered on 0 (median −0.001, |max|
0.067 — inside bias-difference noise): the honest "no arrow"
verdict.  The
decisive controls live in pytest: a pure lag-1 copy y_{t+1} = x_t
reads TE_{x→y} ≈ ln 4 with TE_{y→x} at the floor (the directional
split Granger gets only for linear coupling, here for an arbitrary
symbol map — the bijection twin is gated too), and the iid LCG
null rejects at ~nominal in both directions.

Scale shape: one broadcast consecutive-doc zip join, then ZERO
exchanges — per-row integer indicator folds, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.symbolicmi_q import _E
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs
_L = 512
_T = _L - 1  # transitions
_M = 4  # symbol modulus

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_CHI36 = "50.998460165711464"


def _tfolds(eng: str) -> dict[str, str]:
    """The four n·ln n sums + occupied-cell counts per direction.

    Direction d = (tgt, src): triples (tgt_{j+1}, tgt_j, src_j).
    Cell decode for the 64 triple cells: y' = cc DIV 16,
    y = (cc DIV 4) % 4, x = cc % 4; pair cells 0..15: hi = cc DIV 4,
    lo = cc % 4."""
    e = _E(eng)
    dv = "DIV" if e.sp else "//"

    def cnt(cond):
        return e.ifold(
            f"{e.tr}({e.seq(1, _T)}, jj ->"
            f" CASE WHEN {cond} THEN CAST(1 AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )

    out = {}
    for tag, tgt, src in (("xy", "ay", "ax"), ("yx", "ax", "ay")):
        trip = cnt(
            f"{e.el(tgt, 'jj + 1')} = cc {dv} 16"
            f" AND {e.el(tgt, 'jj')} = (cc {dv} 4) % 4"
            f" AND {e.el(src, 'jj')} = cc % 4"
        )
        pair_sx = cnt(
            f"{e.el(tgt, 'jj')} = cc {dv} 4 AND {e.el(src, 'jj')} = cc % 4"
        )
        pair_tt = cnt(
            f"{e.el(tgt, 'jj + 1')} = cc {dv} 4"
            f" AND {e.el(tgt, 'jj')} = cc % 4"
        )
        marg = cnt(f"{e.el(tgt, 'jj')} = cc")
        out[f"jln_{tag}"] = e.nlogn_sum(64, trip)
        out[f"pln_{tag}"] = e.nlogn_sum(16, pair_sx)
        out[f"tln_{tag}"] = e.nlogn_sum(16, pair_tt)
        out[f"mln_{tag}"] = e.nlogn_sum(_M, marg)
        out[f"mj_{tag}"] = e.occ_sum(64, trip)
        out[f"mp_{tag}"] = e.occ_sum(16, pair_sx)
        out[f"mt_{tag}"] = e.occ_sum(16, pair_tt)
        out[f"mm_{tag}"] = e.occ_sum(_M, marg)
    return out


_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731
_TD = f"CAST({_T} AS DOUBLE)"


def _te(tag: str) -> str:
    return (
        f"((jln_{tag} + mln_{tag} - pln_{tag} - tln_{tag}) / {_TD})"
    )


def _bias(tag: str) -> str:
    return (
        f"({_D(f'mj_{tag} - mp_{tag} - mt_{tag} + mm_{tag}')}"
        f" / (CAST(2 AS DOUBLE) * {_TD}))"
    )


_OUT = []
for tag in ("xy", "yx"):
    g = f"(CAST(2 AS DOUBLE) * {_TD} * {_te(tag)})"
    _OUT += [
        f"{_F6.format(x=_te(tag))} AS te_{tag}",
        f"{_F6.format(x=_bias(tag))} AS bias_{tag}",
        f"CAST(CASE WHEN {g} > {_CHI36} THEN 1 ELSE 0 END"
        f" AS BIGINT) AS reject_noflow_{tag}",
    ]
_NET = f"({_te('xy')} - {_te('yx')})"
_OUT.append(f"{_F6.format(x=_NET)} AS te_net")


@register(
    "transfer_entropy_pairs",
    oracle=synth_sql(_ND)
    + f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, x -> CAST(x % {_M} AS BIGINT)) AS s
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             list_slice(a.s, 1, {_L}) AS ax,
             list_slice(b.s, 1, {_L}) AS ay
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
      WHERE a.n >= {_L} AND b.n >= {_L}
    ),
    folded AS (
      SELECT doc_a, doc_b,
             {", ".join(f"{x} AS {k}"
                        for k, x in _tfolds("duck").items())}
      FROM prs
    )
    SELECT doc_a, doc_b, mj_xy, mj_yx,
           {", ".join(_OUT)}
    FROM folded
    """,
)
def transfer_entropy_pairs(spark, sf_dir):
    """TS96: fold-4 transfer entropy both directions per
    consecutive-doc pair (module header) — 168 exact int64 indicator
    folds via the TS95 machinery, four n·ln n terms per direction,
    one shared double tree, floor-1e6."""
    docs = synth.sequences_df(spark, _ND).select(
        F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr(
            f"transform(tokens, x -> CAST(x % {_M} AS BIGINT))"
        ).alias("s"),
    )
    a = docs.where((F.col("i") % 2 == 0) & (F.col("n") >= _L)).select(
        "i",
        F.col("doc_id").alias("doc_a"),
        F.expr(f"slice(s, 1, {_L})").alias("ax"),
    )
    b = docs.where(F.col("n") >= _L).select(
        (F.col("i") - 1).alias("i"),
        F.col("doc_id").alias("doc_b"),
        F.expr(f"slice(s, 1, {_L})").alias("ay"),
    )
    prs = a.join(F.broadcast(b), "i").select("doc_a", "doc_b", "ax", "ay")
    folded = prs.select(
        "doc_a",
        "doc_b",
        *[F.expr(x).alias(k) for k, x in _tfolds("spark").items()],
    )
    return folded.selectExpr("doc_a", "doc_b", "mj_xy", "mj_yx", *_OUT)
