"""TS42 — Allan variance (Allan 1966; IEEE 1139 — the clock/sensor
stability statistic): for averaging time τ, AVAR(τ) = ½⟨(ȳ_{k+1} −
ȳ_k)²⟩ over consecutive disjoint τ-bins.  Its slope over τ is the
standard noise-type diagnostic (white/flicker/random-walk) — the
time-series-quality triage a sensor-data pipeline runs before rollup,
complementary to TS40's Hurst R/S.

Exactness: per dyadic τ ∈ {4, 8, 16, 32}, the bin SUMS b_k are int64;
ȳ_{k+1} − ȳ_k = (b_{k+1} − b_k)/τ, so

    AVAR(τ) = Σ_k (b_{k+1} − b_k)² / (2·(M−1)·τ²)

has an int64-exact numerator (b ≤ 32·50256 ≈ 1.6e6; diff² ≤ 2.6e12;
×2047 terms ≈ 5e15 ≪ 2⁶³) and ONE float divide per τ — floor-1e6,
zero float-sum caveats.  Bin sums bind once per block via the
single-element-array transform trick's simpler cousin: one
``transform`` producing the b_k array, then one fold over consecutive
pairs.

Scale shape: ZERO exchanges — per-row HOFs inside the scan
projection; a pure map job at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_TAUS = (4, 8, 16, 32)

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _bins(eng: str, tau: int) -> str:
    """Array of per-bin int64 sums for averaging time ``tau``."""
    sp = eng == "spark"
    if sp:
        return (
            f"transform(sequence(0, n_tok DIV {tau} - 1), b ->"
            f" aggregate(slice(tokens, b * {tau} + 1, {tau}),"
            f" CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT)))"
        )
    return (
        f"list_transform(range(n_tok // {tau}), b ->"
        f" list_reduce(list_transform("
        f"list_slice(tokens, b * {tau} + 1, b * {tau} + {tau}),"
        f" x -> CAST(x AS BIGINT)), (a, x) -> a + x))"
    )


def _ssd(eng: str) -> str:
    """Σ (bins[k+1] − bins[k])² over consecutive pairs (int64)."""
    sp = eng == "spark"
    el = (lambda i: f"element_at(bb, {i})") if sp else (lambda i: f"bb[{i}]")
    d = f"({el('k + 2')} - {el('k + 1')})"
    if sp:
        return (
            f"aggregate(sequence(0, size(bb) - 2), CAST(0 AS BIGINT),"
            f" (a, k) -> a + {d} * {d})"
        )
    return (
        f"list_reduce(list_transform(range(len(bb) - 1),"
        f" k -> {d} * {d}), (a, x) -> a + x)"
    )


def _avar(tau: int) -> str:
    """AVAR from ssd_{tau} and m_{tau} columns — shared verbatim."""
    return (
        f"CAST(ssd_{tau} AS DOUBLE)"
        f" / (CAST(2 AS DOUBLE) * CAST(m_{tau} - 1 AS DOUBLE)"
        f" * CAST({tau * tau} AS DOUBLE))"
    )


def _stage(eng: str) -> list[str]:
    sp = eng == "spark"
    out = []
    for tau in _TAUS:
        bins = _bins(eng, tau)
        ssd = _ssd(eng)
        if sp:
            bound = (
                f"element_at(transform(array({bins}), bb -> {ssd}), 1)"
            )
            m = f"n_tok DIV {tau}"
        else:
            bound = f"list_transform([{bins}], bb -> {ssd})[1]"
            m = f"n_tok // {tau}"
        out.append(f"{bound} AS ssd_{tau}")
        out.append(f"CAST({m} AS BIGINT) AS m_{tau}")
    return out


@register(
    "allan_variance",
    oracle=synth_sql(_N)
    + f"""
    , s1 AS (
      SELECT doc_id, n_tok, {", ".join(_stage("duck"))}
      FROM synth
    )
    SELECT doc_id, n_tok,
           {", ".join(f"ssd_{t}, m_{t}" for t in _TAUS)},
           {", ".join(_FLOOR6.format(x=_avar(t)) + f" AS avar_{t}" for t in _TAUS)}
    FROM s1
    """,
)
def allan_variance(spark, sf_dir):
    """TS42: Allan variance at τ ∈ {{4,8,16,32}} per series (module
    header) — int64-exact Σ(b_{{k+1}}−b_k)² numerators (emitted), bin
    counts M, and AVAR = ssd/(2(M−1)τ²) as one float divide each
    (floor-1e6).  Plan: ZERO exchanges — a pure map job."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    s1 = docs.select(
        "doc_id", "n_tok", *[F.expr(x) for x in _stage("spark")]
    )
    return s1.select(
        "doc_id",
        "n_tok",
        *[c for t in _TAUS for c in (f"ssd_{t}", f"m_{t}")],
        *[
            F.expr(_FLOOR6.format(x=_avar(t))).alias(f"avar_{t}")
            for t in _TAUS
        ],
    )
