"""Haar discrete wavelet transform over the token series (E9) — the
multi-resolution energy decomposition a retention/compression policy
reads next to the PAA fidelity audit (TS29): how much series energy
lives at each dyadic scale, with Parseval's identity verified IN-ENGINE
as an exact int64 equality per row.

Unnormalized Haar on the first 64 tokens (every synthetic doc has
n_tok ≥ 64): level l halves the series — a_k = a_{2k} + a_{2k+1},
d_k = a_{2k} − a_{2k+1} — so every coefficient is an INTEGER; after 6
levels one approximation value (= Σ of the 64 tokens) and 63 detail
coefficients remain.  The unnormalized transform's Parseval identity,
multiplied through by 2^L to clear denominators, is pure int64:

    64·Σx² = Σ_l 2^(6−l)·Σd_l² + a₆²         (≤ ~10¹³, exact)

emitted as the ``parseval_ok`` flag — a wrong slice, swapped sign, or
off-by-one pairing anywhere breaks the equality on every row.  The
per-scale energy shares are ratios of identical int64s (floor-1e6), so
the whole operator is bit-exact cross-engine with no float caveats.

Plan shape: ZERO exchanges — one nested-binding expression per row
(each level's array is bound once via the single-element-array
transform trick, so nothing re-evaluates per element access); at any
corpus size this is a pure map job inside the scan projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_W = 64  # first 64 tokens, 6 Haar levels
_L = 6

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _haar_expr(eng: str) -> str:
    """One expression → array<bigint> [approx, e1..e6, ssq]; value tree
    shared across engines (function spellings differ)."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, {i})") if sp else (
        lambda a, i: f"{a}[{i}]"
    )
    tr = "transform" if sp else "list_transform"
    arr = (lambda b: f"array({b})") if sp else (lambda b: f"[{b}]")
    seq0 = (lambda m: f"sequence(0, {m} - 1)") if sp else (
        lambda m: f"range({m})"
    )
    if sp:
        a0 = f"transform(slice(tokens, 1, {_W}), x -> CAST(x AS BIGINT))"
    else:
        a0 = (
            f"list_transform(list_slice(tokens, 1, {_W}),"
            f" x -> CAST(x AS BIGINT))"
        )

    def lvl(v: str, m: int) -> str:
        return (
            f"{tr}({seq0(m)}, k -> {el(v, '2 * k + 1')}"
            f" + {el(v, '2 * k + 2')})"
        )

    def energy(v: str, m: int) -> str:
        term = (
            f"({el(v, '2 * k + 1')} - {el(v, '2 * k + 2')})"
            f" * ({el(v, '2 * k + 1')} - {el(v, '2 * k + 2')})"
        )
        if sp:
            return (
                f"aggregate(transform({seq0(m)}, k -> {term}),"
                f" CAST(0 AS BIGINT), (a, z) -> a + z)"
            )
        return f"list_reduce({tr}({seq0(m)}, k -> {term}), (a, z) -> a + z)"

    if sp:
        ssq = "aggregate(v0, CAST(0 AS BIGINT), (a, z) -> a + z * z)"
    else:
        ssq = "list_reduce(list_transform(v0, z -> z * z), (a, z) -> a + z)"

    # innermost: all v0..v6 in scope
    out = arr(
        ", ".join(
            [el("v6", 1)]
            + [energy(f"v{l - 1}", _W >> l) for l in range(1, _L + 1)]
            + [ssq]
        )
    )
    # wrap from the inside out: bind v6 from v5, …, v1 from v0, v0 from a0
    for l in range(_L, 0, -1):
        out = el(
            f"{tr}({arr(lvl(f'v{l - 1}', _W >> l))}, v{l} -> {out})", 1
        )
    return el(f"{tr}({arr(a0)}, v0 -> {out})", 1)


def _post(hh_el) -> dict[str, str]:
    """Derived columns from the hh array (shared verbatim tree text);
    ``hh_el(i)`` formats the 1-based accessor."""
    e = {l: hh_el(1 + l) for l in range(1, _L + 1)}
    wdet = " + ".join(
        f"CAST({1 << (_L - l)} AS BIGINT) * {e[l]}" for l in range(1, _L + 1)
    )
    lhs = f"CAST({_W} AS BIGINT) * {hh_el(8)}"
    rhs = f"({wdet}) + {hh_el(1)} * {hh_el(1)}"
    cols = {"approx": hh_el(1)}
    for l in range(1, _L + 1):
        cols[f"e{l}"] = e[l]
    cols["lhs"] = lhs
    cols["rhs"] = rhs
    cols["parseval_ok"] = f"CAST(({lhs}) = ({rhs}) AS BIGINT)"
    for l in range(1, _L + 1):
        num = f"CAST({1 << (_L - l)} AS BIGINT) * {e[l]}"
        cols[f"frac{l}"] = _FLOOR6.format(
            x=(
                f"CASE WHEN ({wdet}) > 0 THEN CAST({num} AS DOUBLE)"
                f" / CAST(({wdet}) AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
            )
        )
    return cols


@register(
    "haar_dwt_energy",
    oracle=synth_sql(_N)
    + f"""
    , hq AS (
      SELECT doc_id, {_haar_expr("duck")} AS hh FROM synth
    )
    SELECT doc_id,
           {", ".join(f"{x} AS {c}" for c, x in _post(lambda i: f"hh[{i}]").items())}
    FROM hq
    """,
)
def haar_dwt_energy(spark, sf_dir):
    """E9: 6-level unnormalized Haar DWT over each series' first 64
    tokens — integer coefficients throughout, per-scale detail
    energies, and the 2^L-cleared Parseval identity emitted as an
    in-engine int64 equality flag (module header).  Scale shares are
    ratios of identical int64s (floor-1e6).  Plan: zero exchanges."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "tokens")
    hq = docs.select("doc_id", F.expr(_haar_expr("spark")).alias("hh"))
    return hq.select(
        "doc_id",
        *[
            F.expr(x).alias(c)
            for c, x in _post(lambda i: f"element_at(hh, {i})").items()
        ],
    )
