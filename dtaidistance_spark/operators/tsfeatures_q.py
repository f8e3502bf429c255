"""TS41 — canonical per-series feature battery (the tsfresh/catch22
shape): ~20 of the standard time-series triage features computed for
every synthetic series in ONE zero-exchange map job.  A curation
pipeline reads these to route series (flat vs periodic vs bursty)
before spending DTW / matrix-profile budget — the same role
`tsfresh.extract_features` plays single-node (public API: tsfresh
``feature_calculators``; catch22, Lubba et al. DMKD'19).

Exactness design — every feature is INT64-EXACT except four ratios:

* mean-relative tests never materialize the float mean: ``x_i > mean``
  ⟺ ``n·x_i > S`` (S = Σx), so above/below-mean counts, mean-crossing
  counts, and longest above/below strikes are pure integer algebra.
* ``beyond 2σ`` never materializes σ: ``(x_i − μ)² > 4σ²`` ⟺
  ``(n·x_i − S)² > 4·(n·Σx² − S²)`` — all int64 (bounds: n ≤ 8192,
  x < 50257 ⇒ (n·x)² ≤ 1.7e17, 4·var_n2 ≤ 6.8e17 ≪ 2⁶³).
* c3 nonlinearity Σ x_t·x_{t+1}·x_{t+2} ≤ 8190·50256³ ≈ 1.04e18 — the
  largest integer in the battery, still inside int64.
* the doubled median (2·median is always an integer for integer data)
  avoids the ``.5`` float entirely.
* longest strikes use the run-boundary interval trick — run starts =
  positions where the above-mean flag rises, run ends = where it
  falls; lengths = ends − starts + 1 elementwise — all HOF ``filter``
  over index sequences, no sequential fold needed.

The four floats (mean_abs_change, cid_ce, beyond2_ratio,
distinct_ratio) are single divides/sqrts of int64s, floor-1e6 under
the module precedent — bit-exact cross-engine.

Scale shape: per-row HOFs inside the scan projection, ZERO exchanges —
at 10¹² sequences this is a pure map job, the ideal plan.  The only
O(n log n) step is one array_sort for the median.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _Eng:
    """Engine-shared expression spelling (the hurst_rs precedent)."""

    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"
        self.fil = "filter" if self.sp else "list_filter"
        self.siz = "size" if self.sp else "len"
        self.div = "DIV" if self.sp else "//"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self, n) -> str:
        """Index list 0..n-1."""
        return f"sequence(0, {n} - 1)" if self.sp else f"range({n})"

    def tok(self, i) -> str:
        """tokens[i] (1-based), cast to int64."""
        return f"CAST({self.el('tokens', i)} AS BIGINT)"

    def isum(self, idx_hi: str, body: str) -> str:
        """Σ over i in 0..idx_hi-1 of int64 ``body(i)``."""
        if self.sp:
            return (
                f"aggregate(sequence(0, {idx_hi} - 1), CAST(0 AS BIGINT),"
                f" (a, i) -> a + ({body}))"
            )
        return (
            f"list_reduce(list_transform(range({idx_hi}),"
            f" i -> ({body})), (a, x) -> a + x)"
        )

    def cnt(self, idx_hi: str, pred: str) -> str:
        """count of i in 0..idx_hi-1 where pred(i)."""
        return f"{self.siz}({self.fil}(self_seq, i -> {pred}))".replace(
            "self_seq", self.seq0(idx_hi)
        )

    def amax0(self, arr: str) -> str:
        m = f"array_max({arr})" if self.sp else f"list_max({arr})"
        return f"coalesce({m}, CAST(0 AS BIGINT))"


def _stage1(e: _Eng) -> dict[str, str]:
    """Columns computed once per row from (doc_id, n_tok, tokens)."""
    srt = "array_sort(tokens)" if e.sp else "list_sort(tokens)"
    nd = (
        "size(array_distinct(tokens))"
        if e.sp
        else "len(list_distinct(tokens))"
    )
    mx = "array_max(tokens)" if e.sp else "list_max(tokens)"
    mn = "array_min(tokens)" if e.sp else "list_min(tokens)"
    return {
        "s": e.isum("n_tok", e.tok("i + 1")),
        "q": e.isum("n_tok", f"{e.tok('i + 1')} * {e.tok('i + 1')}"),
        "mx": f"CAST({mx} AS BIGINT)",
        "mn": f"CAST({mn} AS BIGINT)",
        "srt": srt,
        "n_distinct": f"CAST({nd} AS BIGINT)",
    }


def _stage2(e: _Eng) -> dict[str, str]:
    """Columns needing stage-1 scalars (s, q)."""
    nx = f"CAST(n_tok AS BIGINT) * {e.tok('i + 1')}"
    return {
        "var_n2": "CAST(n_tok AS BIGINT) * q - s * s",
        # above/below-mean flags as int arrays (strict; == mean is neither)
        "fa": f"{e.tr}({e.seq0('n_tok')}, i ->"
        f" CASE WHEN {nx} > s THEN 1 ELSE 0 END)",
        "fb": f"{e.tr}({e.seq0('n_tok')}, i ->"
        f" CASE WHEN {nx} < s THEN 1 ELSE 0 END)",
        "locs_mx": f"{e.fil}({e.seq0('n_tok')}, i ->"
        f" {e.tok('i + 1')} = mx)",
    }


def _strike(e: _Eng, f: str) -> str:
    """Longest run of 1s in flag array ``f`` — run boundaries by HOF
    filter (rise/fall positions), lengths elementwise, max.  The
    starts/ends arrays are bound ONCE via the single-element-array
    struct trick (the hurst_rs precedent); ``__ST__``/``__EN__``
    placeholders keep the substitution collision-free."""
    fi1 = e.el(f, "i + 1")
    fi0 = e.el(f, "i")
    fi2 = e.el(f, "i + 2")
    first = f"{fi1} = 1 AND (i = 0 OR {fi0} = 0)"
    last = f"{fi1} = 1 AND (i = n_tok - 1 OR {fi2} = 0)"
    starts = f"{e.fil}({e.seq0('n_tok')}, i -> {first})"
    ends = f"{e.fil}({e.seq0('n_tok')}, i -> {last})"
    # starts and ends are equal-length and pair up in order
    n_runs = f"{e.siz}(__ST__)"
    lens = (
        f"{e.tr}({e.seq0(n_runs)}, k ->"
        f" CAST({e.el('__EN__', 'k + 1')} - {e.el('__ST__', 'k + 1')}"
        f" + 1 AS BIGINT))"
    )
    if e.sp:
        body = e.amax0(lens).replace("__ST__", "z.st").replace(
            "__EN__", "z.en"
        )
        return (
            f"element_at(transform("
            f"array(struct({starts} AS st, {ends} AS en)),"
            f" z -> {body}), 1)"
        )
    body = e.amax0(lens).replace("__ST__", "z['st']").replace(
        "__EN__", "z['en']"
    )
    return (
        f"list_transform([{{'st': {starts}, 'en': {ends}}}],"
        f" z -> {body})[1]"
    )


def _features(e: _Eng) -> dict[str, str]:
    """Final battery — every entry references stage-1/2 columns only."""
    i_mid1 = f"CAST((n_tok + 1) {e.div} 2 AS INT)"
    i_lo = f"CAST(n_tok {e.div} 2 AS INT)"
    i_hi = f"CAST(n_tok {e.div} 2 + 1 AS INT)"
    med = (
        f"CASE WHEN n_tok % 2 = 1"
        f" THEN 2 * CAST({e.el('srt', i_mid1)} AS BIGINT)"
        f" ELSE CAST({e.el('srt', i_lo)} AS BIGINT)"
        f" + CAST({e.el('srt', i_hi)} AS BIGINT) END"
    )
    d_abs = f"abs({e.tok('i + 2')} - {e.tok('i + 1')})"
    d_sq = (
        f"({e.tok('i + 2')} - {e.tok('i + 1')})"
        f" * ({e.tok('i + 2')} - {e.tok('i + 1')})"
    )
    nx = f"CAST(n_tok AS BIGINT) * {e.tok('i + 1')}"
    t1, t2, t3 = e.tok("i + 1"), e.tok("i + 2"), e.tok("i + 3")
    fa1, fa2 = e.el("fa", "i + 1"), e.el("fa", "i + 2")
    cross = e.cnt("n_tok - 1", f"{fa1} != {fa2}")
    peaks = e.cnt("n_tok - 2", f"{t2} > {t1} AND {t2} > {t3}")
    beyond = e.cnt("n_tok", f"({nx} - s) * ({nx} - s) > 4 * var_n2")
    loc_last = e.el("locs_mx", f"{e.siz}(locs_mx)")
    return {
        "s_sum": "s",
        "abs_energy": "q",
        "rng": "mx - mn",
        "median2": med,
        "abs_change_sum": e.isum("n_tok - 1", d_abs),
        "var_n2": "var_n2",
        "n_crossings": f"CAST({cross} AS BIGINT)",
        "count_above": f"CAST({e.siz}({e.fil}(fa, v -> v = 1)) AS BIGINT)",
        "count_below": f"CAST({e.siz}({e.fil}(fb, v -> v = 1)) AS BIGINT)",
        "strike_above": _strike(e, "fa"),
        "strike_below": _strike(e, "fb"),
        "n_peaks": f"CAST({peaks} AS BIGINT)",
        "c3_stat": e.isum("n_tok - 2", f"{t1} * {t2} * {t3}"),
        "lag1_dot": e.isum("n_tok - 1", f"{t1} * {t2}"),
        "cid_sq": e.isum("n_tok - 1", d_sq),
        "beyond2_cnt": f"CAST({beyond} AS BIGINT)",
        "first_loc_max": f"CAST({e.el('locs_mx', 1)} AS BIGINT)",
        "last_loc_max": f"CAST({loc_last} AS BIGINT)",
        "n_distinct": "n_distinct",
    }


_FLOATS = {
    "mean_abs_change": "CAST(abs_change_sum AS DOUBLE)"
    " / CAST(n_tok - 1 AS DOUBLE)",
    "cid_ce": "sqrt(CAST(cid_sq AS DOUBLE))",
    "beyond2_ratio": "CAST(beyond2_cnt AS DOUBLE) / CAST(n_tok AS DOUBLE)",
    "distinct_ratio": "CAST(n_distinct AS DOUBLE) / CAST(n_tok AS DOUBLE)",
}


def _duck_sql() -> str:
    e = _Eng("duck")
    s1 = _stage1(e)
    s2 = _stage2(e)
    feats = _features(e)
    f_int = ", ".join(f"{x} AS {k}" for k, x in feats.items())
    f_flt = ", ".join(
        _FLOOR6.format(x=x) + f" AS {k}" for k, x in _FLOATS.items()
    )
    return (
        synth_sql(_N)
        + f"""
    , s1 AS (
      SELECT doc_id, n_tok, tokens,
             {", ".join(f"{x} AS {k}" for k, x in s1.items())}
      FROM synth
    ),
    s2 AS (
      SELECT *, {", ".join(f"{x} AS {k}" for k, x in s2.items())}
      FROM s1
    ),
    f AS (
      SELECT doc_id, n_tok, {f_int} FROM s2
    )
    SELECT *, {f_flt} FROM f
    """
    )


@register("ts_features", oracle=_duck_sql())
def ts_features(spark, sf_dir):
    """TS41: the tsfresh-style feature battery (module header) — 19
    int64-exact features + 4 floor-1e6 ratios per series, mean-relative
    tests by the n·x vs S integer trick, beyond-2σ by the scaled
    (n·x−S)² vs 4·var_n2 comparison, longest strikes by run-boundary
    interval HOFs, the median doubled to stay integer.  Plan: ZERO
    exchanges — per-row codegen HOFs over the synth scan."""
    e = _Eng("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    d = docs
    for k, x in _stage1(e).items():
        d = d.withColumn(k, F.expr(x))
    for k, x in _stage2(e).items():
        d = d.withColumn(k, F.expr(x))
    feats = _features(e)
    d = d.select(
        "doc_id",
        "n_tok",
        *[F.expr(x).alias(k) for k, x in feats.items()],
    )
    return d.select(
        "*",
        *[
            F.expr(_FLOOR6.format(x=x)).alias(k)
            for k, x in _FLOATS.items()
        ],
    )
