"""TS75 — permutation entropy per series (Bandt-Pompe PRL'02): THE
standard model-free complexity measure for time series — symbolize
each length-3 window by its ORDINAL pattern (which of the 6 orderings
the values take), then take the Shannon entropy of the pattern
distribution, normalized by ln 6 to 0..1.  Complements the entropy
family: sample entropy (RQA) reads amplitude-space recurrence, LZ/ZIP
proxies read exact repetition; PE reads ORDER structure and is
invariant to any monotone transform of the values.

Symbolization (declared): fold-8 token values (coarse quantization is
standard Bandt-Pompe practice and makes ties COMMON, so the tie-break
is genuinely exercised); ties break by position — earlier index ranks
lower (the stable order-of-appearance convention), which for the
ordered positions j < j+1 < j+2 collapses every pairwise comparison to
``<=``:

    code = 4·(x ≤ y) + 2·(y ≤ z) + (x ≤ z)   ∈ {0, 2, 3, 4, 5, 7}

(codes 1 and 6 violate transitivity and CANNOT occur — pytest-gated
at zero).  The six pattern counts are int64 ``size(filter(...))``
HOFs per row; H = −Σ (c/n)·ln(c/n) is ONE order-pinned float chain
(ascending code order, identical expression tree both engines),
pe_norm = H/ln 6, floor-1e6.

Scale shape: ZERO exchanges — per-row JVM codegen HOFs over the token
array, a pure map job at any corpus size (the same shape as TS48's
randomness battery).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 128
_L = 64
_NT = _L - 2  # triples per series
_MOD = 8
_CODES = (0, 2, 3, 4, 5, 7)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _code(eng: str) -> str:
    """Ordinal-pattern code of the triple at offset j (0-based)."""
    if eng == "spark":
        v = "element_at(t, j + {o}) % " + str(_MOD)
    else:
        v = "t[j + {o}] % " + str(_MOD)
    x, y, z = v.format(o=1), v.format(o=2), v.format(o=3)
    return (
        f"(4 * (CASE WHEN {x} <= {y} THEN 1 ELSE 0 END)"
        f" + 2 * (CASE WHEN {y} <= {z} THEN 1 ELSE 0 END)"
        f" + (CASE WHEN {x} <= {z} THEN 1 ELSE 0 END))"
    )


def _counts(eng: str) -> list[str]:
    code = _code(eng)
    if eng == "spark":
        return [
            f"CAST(size(filter(sequence(0, {_NT - 1}),"
            f" j -> {code} = {k})) AS BIGINT) AS c{k}"
            for k in _CODES
        ]
    return [
        f"CAST(len(list_filter(range({_NT}),"
        f" j -> {code} = {k})) AS BIGINT) AS c{k}"
        for k in _CODES
    ]


def _entropy() -> str:
    """Order-pinned −Σ p·ln p chain over the six counts (identical
    text both engines: only CASE/ln/CAST, shared SQL)."""
    terms = [
        f"(CASE WHEN c{k} > 0 THEN"
        f" -(CAST(c{k} AS DOUBLE) / {_NT}.0)"
        f" * ln(CAST(c{k} AS DOUBLE) / {_NT}.0)"
        f" ELSE CAST(0 AS DOUBLE) END)"
        for k in _CODES
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "permutation_entropy",
    oracle=synth_sql(_N)
    + f"""
    , s AS (SELECT doc_id, tokens[1:{_L}] AS t FROM synth),
    c AS (SELECT doc_id, {', '.join(_counts('duck'))} FROM s)
    SELECT doc_id, c0, c2, c3, c4, c5, c7,
           {_F6.format(x=_entropy() + ' / ln(6.0)')} AS pe_norm
    FROM c
    """,
)
def permutation_entropy(spark, sf_dir):
    """TS75: Bandt-Pompe permutation entropy (m=3, lag 1, fold-8
    symbols, stable tie-break) per synthetic series (module header) —
    six int64 pattern counts as per-row HOFs, one order-pinned
    entropy chain, floor-1e6, zero exchanges."""
    df = synth.sequences_df(spark, _N).withColumn(
        "t", F.slice("tokens", 1, _L)
    )
    sel = [F.expr(c) for c in _counts("spark")]
    c = df.select("doc_id", *sel)
    return c.select(
        "doc_id",
        *[f"c{k}" for k in _CODES],
        F.expr(_F6.format(x=_entropy() + " / ln(6.0)")).alias("pe_norm"),
    )
