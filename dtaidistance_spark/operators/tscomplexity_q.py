"""Series-complexity measures over the synthetic token table, round-3
batch: permutation entropy (Bandt & Pompe 2002) — the standard
ordinal-pattern complexity score a time-series triage pipeline uses to
separate structured signals from noise before spending DTW/matrix-
profile budget on them.

TS30b — permutation entropy, order m = 3: every length-3 window of the
series is reduced to its ordinal pattern (the permutation that sorts
it, ties broken by position — the Bandt-Pompe convention), the 6
pattern frequencies are counted, and PE = −Σ p·ln p (normalized
variant divides by ln 6).  Everything up to the final entropy is
int64-exact: pattern ranks are pure comparisons, pattern ids are
r0·9 + r1·3 + r2 ∈ {5,7,11,15,19,21}, counts come from HOF
``filter``+``size`` inside codegen — ZERO shuffles, zero explode; the
only float is the last −Σ p·ln p, whose 6-term tree is inlined
verbatim in both engines (floor-1e6 under the libm-ulp precedent of
T38 token_entropy).

The synthetic series are modular token ramps with a period-64 seasonal
component (see synth.py) — strongly structured, so PE sits well below
ln 6 and separates from a hashed (noise-like) control; the pytest gate
recomputes every row against a naive numpy ordinal-pattern counter.

Scale shape: one parquet/synth scan, per-row HOFs, no exchange at all
until the (tiny) output. At 10^12 sequences this is a pure map job —
the ideal plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

# pattern id for 0-based window start w over the token array; `EL(k)`
# is the engine's 1-based element accessor applied at offset w+k.
_PIDS = (5, 7, 11, 15, 19, 21)


def _pid_expr(el: str) -> str:
    """The shared rank-algebra text; ``el`` formats a 1-based element
    access (engine-specific), offsets are w+1, w+2, w+3."""
    t0, t1, t2 = (el.format(i) for i in (1, 2, 3))
    r0 = (
        f"(CASE WHEN {t1} < {t0} THEN 1 ELSE 0 END"
        f" + CASE WHEN {t2} < {t0} THEN 1 ELSE 0 END)"
    )
    r1 = (
        f"(CASE WHEN {t0} <= {t1} THEN 1 ELSE 0 END"
        f" + CASE WHEN {t2} < {t1} THEN 1 ELSE 0 END)"
    )
    r2 = (
        f"(CASE WHEN {t0} <= {t2} THEN 1 ELSE 0 END"
        f" + CASE WHEN {t1} <= {t2} THEN 1 ELSE 0 END)"
    )
    return f"({r0} * 9 + {r1} * 3 + {r2})"


# identical entropy tree in both engines: 6 terms in ascending-pid
# order, each CASE-guarded, division + ln repeated verbatim (no
# let-binding inside the expression).
def _pe_sum(cols: tuple[str, ...] = tuple(f"c{p}" for p in _PIDS)) -> str:
    term = (
        "CASE WHEN {c} > 0 THEN (CAST({c} AS DOUBLE) / CAST(nw AS DOUBLE))"
        " * ln(CAST({c} AS DOUBLE) / CAST(nw AS DOUBLE))"
        " ELSE CAST(0 AS DOUBLE) END"
    )
    return " + ".join(term.format(c=c) for c in cols)


_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


@register(
    "perm_entropy",
    oracle=synth_sql(_N)
    + f"""
    , pids AS (
      SELECT doc_id, n_tok,
             list_transform(range(n_tok - 2), w ->
               {_pid_expr("tokens[w + {}]")}) AS pids
      FROM synth
    ),
    cnt AS (
      SELECT doc_id, n_tok, n_tok - 2 AS nw,
             {", ".join(
                 f"len(list_filter(pids, p -> p = {p})) AS c{p}"
                 for p in _PIDS)}
      FROM pids
    ),
    pe AS (
      SELECT *, -({_pe_sum()}) AS pe_raw FROM cnt
    )
    SELECT doc_id, nw, {", ".join(f"c{p}" for p in _PIDS)},
           {_FLOOR6.format(x="pe_raw")} AS pe,
           {_FLOOR6.format(x="(pe_raw / ln(CAST(6 AS DOUBLE)))")} AS pe_norm
    FROM pe
    """,
)
def perm_entropy(spark, sf_dir):
    """TS30b: order-3 permutation entropy per synthetic series —
    ordinal-pattern ids by pure rank algebra (ties to the earlier
    position), HOF filter+size counts (int64), and the 6-term
    −Σ p·ln p tree shared verbatim with the DuckDB oracle (floor-1e6).
    Plan: zero exchanges — per-row codegen HOFs only."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    pids = docs.withColumn(
        "pids",
        F.expr(
            f"transform(sequence(0, n_tok - 3), w -> "
            f"{_pid_expr('element_at(tokens, w + {})')})"
        ),
    )
    cnt = pids.select(
        "doc_id",
        (F.col("n_tok") - F.lit(2)).alias("nw"),
        *[
            F.expr(f"size(filter(pids, p -> p = {p}))").alias(f"c{p}")
            for p in _PIDS
        ],
    )
    pe = cnt.withColumn("pe_raw", F.expr(f"-({_pe_sum()})"))
    return pe.select(
        "doc_id",
        "nw",
        *[f"c{p}" for p in _PIDS],
        F.expr(_FLOOR6.format(x="pe_raw")).alias("pe"),
        F.expr(_FLOOR6.format(x="(pe_raw / ln(CAST(6 AS DOUBLE)))")).alias(
            "pe_norm"
        ),
    )
