"""TS88 — magnitude-squared coherence at the fundamental period
between paired series (Welch IEEE-AU'67 segment averaging; the
frequency-domain companion of TS12's time-domain cross-correlation):
do two series share their period-64 oscillation — co-moving at the
SAME phase structure — or are their rhythms independent?

    Coh = |S̄xy|² / (S̄xx · S̄yy)  ∈ [0, 1],

with S̄ the K-segment averages of the cross/auto spectra at the
period-64 DFT bin.  The averaging is the POINT: a single-segment
"coherence" is identically 1 (|XȲ|² = |X|²|Y|² for one ordinate —
gated as the degenerate case), so K = 8 whole-cycle segments
(declared; pairs shorter than K·P = 512 are DROPPED — Spark's
element_at is strict where DuckDB's indexing is NULL-tolerant, so the
filter runs BEFORE the folds in both engines) make the statistic
informative, with null
expectation ≈ 1/K.

Exactness: each segment's DFT coefficient comes from the TS13/TS68
Goertzel machinery — the pinned 2cos(2π/64) decimal literal drives
the state fold, and the finalization Re = s₁·cosω − s₂,
Im = s₁·sinω uses pinned cos/sin literals (no libm at query time) —
16 folds (8 segments × 2 sides) over the sliced pair arrays, every
chain order-pinned (segments 1..8), floor-1e6 finals.  Segments
close WHOLE cycles, so the DC component is exactly orthogonal to the
bin and no demeaning is needed.

Honest (gated) reading: the paired docs are INDEPENDENT series, so
even though BOTH carry genuine period-64 power (TS68), their PHASES
are unrelated and the averaged cross-spectrum cancels — measured
coherence concentrates near the 1/K = 0.125 null floor, and the test
correctly refuses to see a shared rhythm; the positive control
(y = x shifted by half a period ⇒ coherence ≈ 1 with the phase in
the cross-spectrum sign) lives in pytest.

Scale shape: ZERO exchanges beyond the broadcast consecutive-doc zip
join; all folds linear in L.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128  # docs → 64 pairs
_P = 64
_K = 8

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# pinned literals for ω = 2π/64
_C2 = "CAST('1.9903694533443939' AS DOUBLE)"   # 2cosω
_COS = "CAST('0.9951847266721969' AS DOUBLE)"  # cosω
_SIN = "CAST('0.0980171403295606' AS DOUBLE)"  # sinω


def _folds(eng: str) -> dict[str, str]:
    """16 Goertzel state folds: g{side}{s} over segment s of xa/xb
    (each segment = elements (s−1)·64+1 .. s·64, whole cycles)."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, CAST({i} AS INT))") if sp else (
        lambda a, i: f"{a}[{i}]"
    )
    out = {}
    for side, arr in (("a", "xa"), ("b", "xb")):
        for s in range(1, _K + 1):
            o = (s - 1) * _P
            first = el(arr, str(o + 1))
            x = el(arr, "t")
            if sp:
                out[f"g{side}{s}"] = (
                    f"aggregate(sequence({o + 2}, {o + _P}),"
                    f" array(CAST({first} AS DOUBLE), CAST(0 AS DOUBLE)),"
                    f" (st, t) -> array((CAST({x} AS DOUBLE)"
                    f" + {_C2} * element_at(st, 1)) - element_at(st, 2),"
                    f" element_at(st, 1)))"
                )
            else:
                out[f"g{side}{s}"] = (
                    f"list_reduce(list_prepend("
                    f" [CAST({first} AS DOUBLE), CAST(0 AS DOUBLE)],"
                    f" list_transform(range({o + 2}, {o + _P} + 1),"
                    f" t -> [CAST({x} AS DOUBLE), CAST(0 AS DOUBLE)])),"
                    f" (st, e) -> [(e[1] + {_C2} * st[1]) - st[2], st[1]])"
                )
    return out


def _el(eng: str, col: str, i: int) -> str:
    return (
        f"element_at({col}, {i})" if eng == "spark" else f"{col}[{i}]"
    )


def _spectra(eng: str) -> str:
    """Shared double tree: per-segment Re/Im, the order-pinned K-sums,
    and the coherence ratio — identical strings modulo element access."""
    re = {}
    im = {}
    for side in ("a", "b"):
        for s in range(1, _K + 1):
            g1 = _el(eng, f"g{side}{s}", 1)
            g2 = _el(eng, f"g{side}{s}", 2)
            re[(side, s)] = f"({g1} * {_COS} - {g2})"
            im[(side, s)] = f"({g1} * {_SIN})"
    # S̄xy real/imag: Σ (ReA·ReB + ImA·ImB), Σ (ImA·ReB − ReA·ImB)
    sxy_re = " + ".join(
        f"({re[('a', s)]} * {re[('b', s)]}"
        f" + {im[('a', s)]} * {im[('b', s)]})"
        for s in range(1, _K + 1)
    )
    sxy_im = " + ".join(
        f"({im[('a', s)]} * {re[('b', s)]}"
        f" - {re[('a', s)]} * {im[('b', s)]})"
        for s in range(1, _K + 1)
    )
    sxx = " + ".join(
        f"({re[('a', s)]} * {re[('a', s)]}"
        f" + {im[('a', s)]} * {im[('a', s)]})"
        for s in range(1, _K + 1)
    )
    syy = " + ".join(
        f"({re[('b', s)]} * {re[('b', s)]}"
        f" + {im[('b', s)]} * {im[('b', s)]})"
        for s in range(1, _K + 1)
    )
    return sxy_re, sxy_im, sxx, syy


def _cols(eng: str) -> list[str]:
    sxy_re, sxy_im, sxx, syy = _spectra(eng)
    coh = (
        f"((({sxy_re}) * ({sxy_re}) + ({sxy_im}) * ({sxy_im}))"
        f" / (({sxx}) * ({syy})))"
    )
    guard = f"L >= {_K * _P} AND ({sxx}) > 0 AND ({syy}) > 0"
    return [
        f"CASE WHEN {guard} THEN {_F6.format(x=f'({sxx})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS sxx",
        f"CASE WHEN {guard} THEN {_F6.format(x=f'({syy})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS syy",
        f"CASE WHEN {guard} THEN {_F6.format(x=f'({sxy_re})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS sxy_re",
        f"CASE WHEN {guard} THEN {_F6.format(x=f'({sxy_im})')}"
        " ELSE CAST(NULL AS DOUBLE) END AS sxy_im",
        f"CASE WHEN {guard} THEN {_F6.format(x=coh)}"
        " ELSE CAST(NULL AS DOUBLE) END AS coherence",
    ]


@register(
    "coherence_pairs",
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
    longprs AS (
      SELECT * FROM prs WHERE L >= 512
    ),
    folded AS (
      SELECT doc_a, doc_b, L,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM longprs
    )
    SELECT doc_a, doc_b, CAST(L AS BIGINT) AS l_used,
           {", ".join(_cols("duck"))}
    FROM folded
    """,
)
def coherence_pairs(spark, sf_dir):
    """TS88: Welch K=8 magnitude-squared coherence at period 64 for
    64 consecutive-doc pairs (module header) — 16 pinned-literal
    Goertzel folds, order-pinned segment sums, one ratio tree,
    floor-1e6."""
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
    ).where(F.col("L") >= _K * _P)
    folded = prs.select(
        "doc_a",
        "doc_b",
        "L",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return folded.selectExpr(
        "doc_a",
        "doc_b",
        "CAST(L AS BIGINT) AS l_used",
        *_cols("spark"),
    )
