"""TS128 — multiscale sample entropy per series (Costa–Goldberger–
Peng PRL'02; built on TS44's Richman–Moorman SampEn m = 2): SampEn
re-measured on coarse-grained versions of the series at scales
τ ∈ {1, 2, 4, 8} — THE dial that separates "complex at every scale"
(1/f-like: flat MSE curve) from "random at one scale" (white noise:
MSE FALLS with τ, because averaging kills uncorrelated variation)
and from "regular" (low everywhere); single-scale SampEn cannot make
that three-way distinction, which is why MSE became the standard
complexity battery.

Exactness (the novel bit vs TS44): the coarse-grained series is kept
as non-overlapping block SUMS, not means — Chebyshev matching of
block means against tolerance r is EXACTLY equivalent to matching
block sums against τ·r (multiply both sides by τ), so with the TS44
integer tolerance ε = 1000 the scale-τ tolerance is the exact
integer τ·ε and every A/B template count stays INT64-exact at every
scale, no rational means anywhere.  Window: first 256 tokens
(declared cap; navail = min(n_tok, 256), n_cg = ⌊navail/τ⌋,
n_templates = n_cg − 2, i < j over shared template positions — the
R-M convention making A ≤ B and SampEn ≥ 0 by construction).
SampEn = −ln(A/B) floor-1e6, NULL when A = 0 or n_cg < 4.

Honest (gated) reading — measured: the corpus is the exact OPPOSITE
of white noise under coarse-graining — median SampEn climbs the
whole scale ladder, 0.0538 → 0.1513 → 0.3863 → 0.8077 (τ = 1, 2,
4, 8), and 502 of 512 series have their MINIMUM entropy at τ = 1
(34 scale-rows NULL at A = 0): at native resolution the
deterministic ring rotation makes consecutive templates
near-repeating (low entropy), and block-summing progressively
cancels that rotation and exposes the phase noise underneath —
the structured-plus-noise signature, where white noise would have
FALLEN with τ (the control gate shows the fall).  Gates: numpy recompute per sampled doc at every
scale; the sums-vs-means tolerance equivalence (block-mean SampEn
with r ≡ block-sum SampEn with τ·r, bit-equal); τ = 1 ≡ TS44 on the
shared 64-window (identity on a constructed 64-token doc); white-
noise control (MSE falls with τ) vs a planted 1/f-ish control
(flatter curve); the corpus pins.

Scale shape: ZERO exchanges — per-row HOF work only (O(Σ_τ n_cg²)
≈ 75k steps/row at the 256 cap, the declared verification-bounded
cost), a pure map job over the scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_CAP = 256
_EPS = 1000
_SCALES = (1, 2, 4, 8)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _cg(eng: str, tau: int) -> str:
    """Coarse-grained BLOCK-SUM series at scale tau from the capped
    token slice ``v`` (1-based arrays both engines)."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, {i})") if sp else (
        lambda a, i: f"{a}[{i}]"
    )
    if tau == 1:
        return "v"
    inner = " + ".join(el("v", f"k * {tau} + {t}") for t in range(1, tau + 1))
    if sp:
        # Guarded: Spark sequence(0, -1) is the DESCENDING [0, -1]
        # (DuckDB range(0, 0) is empty) — for size(v) < tau emit a
        # typed empty array instead so the engines cannot diverge if
        # the cap/corpus ever admits ultra-short docs.
        return (
            f"CASE WHEN size(v) >= {tau} THEN"
            f" transform(sequence(0, CAST(size(v) DIV {tau} AS INT) - 1),"
            f" k -> {inner})"
            f" ELSE CAST(array() AS ARRAY<BIGINT>) END"
        )
    return (
        f"list_transform(range(0, CAST(len(v) // {tau} AS BIGINT)),"
        f" k -> {inner})"
    )


def _counts(eng: str, tau: int) -> dict[str, str]:
    """A/B template counts over the scale-tau series ``w`` with the
    exact integer tolerance tau*eps; nt = n_cg - 2 per row."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, {i})") if sp else (
        lambda a, i: f"{a}[{i}]"
    )
    eps = tau * _EPS
    chb2 = (
        f"greatest(abs({el('w', 'i + 1')} - {el('w', 'j + 1')}),"
        f" abs({el('w', 'i + 2')} - {el('w', 'j + 2')})) <= {eps}"
    )
    chb3 = (
        f"greatest(abs({el('w', 'i + 1')} - {el('w', 'j + 1')}),"
        f" abs({el('w', 'i + 2')} - {el('w', 'j + 2')}),"
        f" abs({el('w', 'i + 3')} - {el('w', 'j + 3')})) <= {eps}"
    )
    if sp:
        seq = "sequence(0, CAST(nt AS INT) - 1)"
        fil = lambda pred: f"size(filter({seq}, j -> j > i AND {pred}))"  # noqa: E731
        mk = (
            lambda pred: f"aggregate({seq}, CAST(0 AS BIGINT),"
            f" (a, i) -> a + {fil(pred)})"
        )
    else:
        seq = "range(0, CAST(nt AS BIGINT))"
        fil = lambda pred: f"len(list_filter({seq}, j -> j > i AND {pred}))"  # noqa: E731
        mk = (
            lambda pred: f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform({seq}, i -> CAST({fil(pred)} AS BIGINT))),"
            " (a, x) -> a + x)"
        )
    return {"b_cnt": mk(chb2), "a_cnt": mk(chb3)}


_SAMPEN = (
    "CASE WHEN a_cnt > 0 AND b_cnt > 0 AND n_cg >= 4 THEN"
    " -ln(CAST(a_cnt AS DOUBLE) / CAST(b_cnt AS DOUBLE))"
    " ELSE CAST(NULL AS DOUBLE) END"
)


def _duck_oracle() -> str:
    per_scale = []
    for tau in _SCALES:
        per_scale.append(
            f"""
    SELECT doc_id, CAST({tau} AS BIGINT) AS scale,
           CAST(len(w) AS BIGINT) AS n_cg, b_cnt, a_cnt
    FROM (
      SELECT doc_id, w, CAST(len(w) AS BIGINT) - 2 AS nt,
             {_counts("duck", tau)["b_cnt"]} AS b_cnt,
             {_counts("duck", tau)["a_cnt"]} AS a_cnt
      FROM (SELECT doc_id, {_cg("duck", tau)} AS w FROM s0)
    )"""
        )
    return (
        synth_sql(_N)
        + f"""
    , s0 AS (
      SELECT doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
                            x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    allrows AS ({" UNION ALL ".join(per_scale)})
    SELECT doc_id, scale, n_cg, b_cnt, a_cnt,
           {_F6.format(x=_SAMPEN)} AS sampen
    FROM allrows ORDER BY doc_id, scale
    """
    )


@register("multiscale_entropy", oracle=_duck_oracle())
def multiscale_entropy(spark, sf_dir):
    """TS128: MSE at τ ∈ {1, 2, 4, 8} (module header) — block-sum
    coarse-graining with the exact τ·ε tolerance keeps every template
    count INT64 at every scale; zero exchanges."""
    docs = synth.sequences_df(spark, _N).selectExpr(
        "doc_id",
        f"transform(slice(tokens, 1, {_CAP}), x -> CAST(x AS BIGINT))"
        " AS v",
    )
    parts = []
    for tau in _SCALES:
        c = _counts("spark", tau)
        parts.append(
            docs.selectExpr(
                "doc_id", "v", _cg("spark", tau) + " AS w"
            )
            .selectExpr(
                "doc_id", "w", "CAST(size(w) AS BIGINT) - 2 AS nt"
            )
            .selectExpr(
                "doc_id",
                f"CAST({tau} AS BIGINT) AS scale",
                "CAST(size(w) AS BIGINT) AS n_cg",
                c["b_cnt"] + " AS b_cnt",
                c["a_cnt"] + " AS a_cnt",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.selectExpr(
        "doc_id",
        "scale",
        "n_cg",
        "b_cnt",
        "a_cnt",
        _F6.format(x=_SAMPEN) + " AS sampen",
    ).orderBy("doc_id", "scale")
