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


# ---------------------------------------------------------------------------
# TS40 — Hurst exponent by rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------
# Mandelbrot-Wallis R/S: for each dyadic window size w ∈ {8,16,32,64},
# split the series into ⌊n/w⌋ disjoint blocks; per block the range R of
# the cumulative mean-deviation walk over the block stddev S, averaged
# over blocks; H = OLS slope of ln(R/S) on ln(w).  Everything until the
# final divide/sqrt is INT64-EXACT by scaling each block by w:
# deviations d_i = w·x_i − Σx (ints), walk prefixes and their min/max
# via one [z, mn, mx] array fold (Z_w = 0 always, so the origin is in
# the range for free), SSD = Σ d_i² (≤ 2^50), and
# R/S = R_scaled / sqrt(SSD / w) — two int64s into one float.  The
# per-w block mean is a left fold over the block array in index order,
# so the float accumulation order is engine-identical (the kalman_filter
# list_reduce precedent); the 4-point log-log OLS slope is one shared
# verbatim tree over the raw (unfloored) R/S values.
#
# Scale shape: zero exchanges — per-row HOFs inside the scan projection,
# O(n) per window size (block sums/folds partition the array; the
# single-element-array transform trick binds Σx and the deviation array
# once per block, so nothing is re-evaluated per element).

_HWS = (8, 16, 32, 64)


def _rs_expr(eng: str, w: int) -> str:
    """R/S mean over ⌊n_tok/w⌋ blocks as one expression (engine-shared
    value tree; only function spellings differ)."""
    sp = eng == "spark"
    el = (lambda a, i: f"element_at({a}, {i})") if sp else (
        lambda a, i: f"{a}[{i}]"
    )
    tr = "transform" if sp else "list_transform"
    fil = "filter" if sp else "list_filter"
    siz = "size" if sp else "len"
    arr = (lambda body: f"array({body})") if sp else (lambda body: f"[{body}]")
    blk = (
        f"slice(tokens, b * {w} + 1, {w})"
        if sp
        else f"list_slice(tokens, b * {w} + 1, b * {w} + {w})"
    )
    if sp:
        s_expr = (
            f"aggregate({blk}, CAST(0 AS BIGINT),"
            f" (a, x) -> a + CAST(x AS BIGINT))"
        )
    else:
        s_expr = (
            f"list_reduce({tr}({blk}, x -> CAST(x AS BIGINT)),"
            f" (a, x) -> a + x)"
        )
    d_expr = f"{tr}({blk}, x -> CAST({w} AS BIGINT) * CAST(x AS BIGINT) - s)"
    if sp:
        fold_rm = (
            f"aggregate(slice(d, 2, {w} - 1),"
            f" array({el('d', 1)}, {el('d', 1)}, {el('d', 1)}),"
            f" (st, z) -> array({el('st', 1)} + z,"
            f" least({el('st', 2)}, {el('st', 1)} + z),"
            f" greatest({el('st', 3)}, {el('st', 1)} + z)))"
        )
        ssd = f"aggregate(d, CAST(0 AS BIGINT), (a, z) -> a + z * z)"
    else:
        fold_rm = (
            f"list_reduce({tr}(d, z -> [z, z, z]),"
            f" (st, z) -> [st[1] + z[1],"
            f" least(st[2], st[1] + z[1]),"
            f" greatest(st[3], st[1] + z[1])])"
        )
        ssd = f"list_reduce({tr}(d, z -> z * z), (a, z) -> a + z)"
    r_expr = el(
        f"{tr}({arr(fold_rm)}, st -> {el('st', 3)} - {el('st', 2)})", 1
    )
    pair = arr(f"{r_expr}, {ssd}")
    with_d = el(f"{tr}({arr(d_expr)}, d -> {pair})", 1)
    with_s = el(f"{tr}({arr(s_expr)}, s -> {with_d})", 1)
    nb = (
        f"sequence(0, n_tok DIV {w} - 1)" if sp else f"range(n_tok // {w})"
    )
    blocks = f"{tr}({nb}, b -> {with_s})"
    term = (
        f"CASE WHEN {el('p', 2)} > 0 THEN CAST({el('p', 1)} AS DOUBLE)"
        f" / sqrt(CAST({el('p', 2)} AS DOUBLE) / CAST({w} AS DOUBLE))"
        f" ELSE CAST(0 AS DOUBLE) END"
    )
    if sp:
        rs_sum = (
            f"aggregate(transform(bl, p -> {term}), CAST(0 AS DOUBLE),"
            f" (a, x) -> a + x)"
        )
    else:
        rs_sum = f"list_reduce(list_transform(bl, p -> {term}), (a, x) -> a + x)"
    nv = f"{siz}({fil}(bl, p -> {el('p', 2)} > 0))"
    body = (
        f"CASE WHEN {nv} > 0 THEN {rs_sum} / CAST({nv} AS DOUBLE)"
        f" ELSE CAST(NULL AS DOUBLE) END"
    )
    return el(f"{tr}({arr(blocks)}, bl -> {body})", 1)


def _ln(k) -> str:
    return f"ln(CAST({k} AS DOUBLE))"


def _hurst_tree() -> str:
    """4-point OLS slope of ln(rs_w) on ln(w) — shared verbatim."""
    sx = " + ".join(_ln(w) for w in _HWS)
    sy = " + ".join(f"ln(rs_{w})" for w in _HWS)
    sxy = " + ".join(f"{_ln(w)} * ln(rs_{w})" for w in _HWS)
    sxx = " + ".join(f"{_ln(w)} * {_ln(w)}" for w in _HWS)
    ok = " AND ".join(f"rs_{w} > CAST(0 AS DOUBLE)" for w in _HWS)
    raw = (
        f"(({sxy}) - ({sx}) * ({sy}) / CAST(4 AS DOUBLE))"
        f" / (({sxx}) - ({sx}) * ({sx}) / CAST(4 AS DOUBLE))"
    )
    return f"CASE WHEN {ok} THEN {raw} ELSE CAST(NULL AS DOUBLE) END"


@register(
    "hurst_rs",
    oracle=synth_sql(_N)
    + f"""
    , rsq AS (
      SELECT doc_id, n_tok,
             {", ".join(f"{_rs_expr('duck', w)} AS rs_{w}" for w in _HWS)}
      FROM synth
    )
    SELECT doc_id, n_tok,
           {", ".join(_FLOOR6.format(x=f"rs_{w}") + f" AS rs_{w}" for w in _HWS)},
           {_FLOOR6.format(x=_hurst_tree())} AS hurst
    FROM rsq
    """,
)
def hurst_rs(spark, sf_dir):
    """TS40: Hurst exponent per series by classic rescaled-range
    analysis (module header) — block algebra int64-exact via the
    w-scaled deviation walk, one float divide+sqrt per block, block
    means as order-pinned left folds, and the ln–ln OLS slope over
    w ∈ {8,16,32,64} as one verbatim cross-engine tree (floor-1e6
    outputs; hurst from the RAW rs values).  Plan: zero exchanges —
    a pure map job at any corpus size."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    rsq = docs.select(
        "doc_id",
        "n_tok",
        *[F.expr(_rs_expr("spark", w)).alias(f"rs_{w}") for w in _HWS],
    )
    return rsq.select(
        "doc_id",
        "n_tok",
        *[
            F.expr(_FLOOR6.format(x=f"rs_{w}")).alias(f"rs_{w}")
            for w in _HWS
        ],
        F.expr(_FLOOR6.format(x=_hurst_tree())).alias("hurst"),
    )
