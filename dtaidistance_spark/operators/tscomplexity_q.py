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


# ---------------------------------------------------------------------------
# T54 — exact distinct-token count in EVERY sliding window (repetition
# density): windowed COUNT DISTINCT is not a SQL window aggregate in
# either engine, but "occurrence j is the first of its token in window
# ending at i" ⟺ i ∈ [max(j, prev_occ_j + W), j + W − 1] — an
# INTERVAL, so per-position distinct counts are the same ±1 histogram
# + partitioned prefix sum used by FLUSS. All int64, bit-exact.
# ---------------------------------------------------------------------------

_NW = 128  # docs
_W = 64  # window length


@register(
    "sliding_distinct_tokens",
    oracle=synth_sql(_NW)
    + f"""
    , pos AS MATERIALIZED (
      SELECT doc_id, n_tok, t.j AS i, CAST(tokens[t.j + 1] AS BIGINT) AS v
      FROM synth, unnest(range(n_tok)) AS t(j)
    ),
    occ AS (
      SELECT doc_id, n_tok, i, v,
             coalesce(lag(i) OVER (PARTITION BY doc_id, v ORDER BY i),
                      -{_W}) AS prev
      FROM pos
    ),
    deltas AS (
      SELECT doc_id, greatest(i, prev + {_W}) AS p, 1 AS d
      FROM occ
      UNION ALL
      SELECT doc_id, i + {_W} AS p, -1 AS d
      FROM occ WHERE i + {_W} < n_tok
    ),
    axis AS (
      SELECT doc_id, i AS p, 0 AS d FROM pos
    ),
    summed AS (
      SELECT doc_id, p, sum(d) AS dd
      FROM (SELECT * FROM deltas UNION ALL SELECT * FROM axis)
      GROUP BY doc_id, p
    ),
    cum AS (
      SELECT doc_id, p,
             CAST(sum(dd) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_distinct
      FROM summed
    )
    SELECT doc_id, p AS pos, n_distinct
    FROM cum WHERE p >= {_W} - 1
    """,
)
def sliding_distinct_tokens(spark, sf_dir):
    """T54: per series, the EXACT number of distinct tokens inside
    every length-64 sliding window — the repetition-density curve a
    quality filter reads (a window full of one token has n_distinct 1;
    healthy text sits near W). Windowed count-distinct has no window-
    aggregate form, so it is rewritten as first-occurrence intervals
    (prev-occurrence via ONE (doc, token)-partitioned lag) + the ±1
    histogram / partitioned-prefix-sum. Measured plan: THREE exchanges
    — the (doc, token) lag sort, the (doc, pos) histogram reduce
    (map-side combined), the per-doc cumsum window — each carrying at
    most one row per token position, all int64; no state is
    corpus-sized."""
    docs = synth.sequences_df(spark, _NW).select("doc_id", "n_tok", "tokens")
    pos = docs.select(
        "doc_id",
        "n_tok",
        F.posexplode(F.expr("transform(tokens, x -> CAST(x AS BIGINT))")).alias(
            "i", "v"
        ),
    )
    from pyspark.sql import Window

    occ = pos.withColumn(
        "prev",
        F.coalesce(
            F.lag("i").over(Window.partitionBy("doc_id", "v").orderBy("i")),
            F.lit(-_W),
        ),
    )
    starts = occ.select(
        "doc_id", F.greatest(F.col("i"), F.col("prev") + _W).alias("p"),
        F.lit(1).alias("d"),
    )
    ends = occ.where(F.col("i") + _W < F.col("n_tok")).select(
        "doc_id", (F.col("i") + _W).alias("p"), F.lit(-1).alias("d")
    )
    axis = pos.select("doc_id", F.col("i").alias("p"), F.lit(0).alias("d"))
    summed = (
        starts.unionByName(ends)
        .unionByName(axis)
        .groupBy("doc_id", "p")
        .agg(F.sum("d").alias("dd"))
    )
    cum = summed.withColumn(
        "n_distinct",
        F.sum("dd")
        .over(
            Window.partitionBy("doc_id")
            .orderBy("p")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    )
    return cum.where(F.col("p") >= _W - 1).select(
        "doc_id", F.col("p").alias("pos"), "n_distinct"
    )
