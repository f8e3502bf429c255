"""TS48 — the classical randomness-test battery per series (Kendall &
Stuart; Brockwell-Davis §1.6 — the i.i.d.-noise screens a forecasting
pipeline runs on residuals): turning-point test, Wald-Wolfowitz runs
test about the median, and the difference-sign test.  Complements
TS45's Ljung-Box (which reads autocorrelation; these read order
statistics and are robust to marginal distribution).

All three statistics are INT64-EXACT counts; each z-score is one
shared verbatim float tree over those counts (floor-1e6), and each
verdict compares |z| against the 1.96 literal:

* turning points T: strict sign change of consecutive differences
  ((x_{i}−x_{i−1})·(x_{i+1}−x_i) < 0 — integer product, ties count as
  no turn); E[T] = 2(n−2)/3, Var[T] = (16n−29)/90.
* runs R about the median: the doubled-median trick (2x vs med2)
  keeps the above/below split integer; equals are DROPPED (the
  standard convention); R = 1 + transitions among kept signs, with
  n1/n2 the kept counts; E and Var the Wald-Wolfowitz formulas.
* difference signs D: count of positive first differences;
  E = (n−1)/2, Var = (n+1)/12.

Scale shape: ZERO exchanges — per-row HOFs; a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"
        self.fil = "filter" if self.sp else "list_filter"
        self.siz = "size" if self.sp else "len"
        self.div = "DIV" if self.sp else "//"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self, n) -> str:
        return f"sequence(0, ({n}) - 1)" if self.sp else f"range({n})"

    def tok(self, i) -> str:
        return f"CAST({self.el('tokens', i)} AS BIGINT)"

    def cnt(self, n, pred) -> str:
        return f"CAST({self.siz}({self.fil}({self.seq0(n)}, i -> {pred})) AS BIGINT)"


def _stage1(e: _E) -> dict[str, str]:
    srt = "array_sort(tokens)" if e.sp else "list_sort(tokens)"
    i_mid1 = f"CAST((n_tok + 1) {e.div} 2 AS INT)"
    i_lo = f"CAST(n_tok {e.div} 2 AS INT)"
    i_hi = f"CAST(n_tok {e.div} 2 + 1 AS INT)"
    med2 = (
        f"CASE WHEN n_tok % 2 = 1"
        f" THEN 2 * CAST({e.el('__SRT__', i_mid1)} AS BIGINT)"
        f" ELSE CAST({e.el('__SRT__', i_lo)} AS BIGINT)"
        f" + CAST({e.el('__SRT__', i_hi)} AS BIGINT) END"
    )
    if e.sp:
        med2 = (
            f"element_at(transform(array({srt}), srt ->"
            f" {med2.replace('__SRT__', 'srt')}), 1)"
        )
    else:
        med2 = (
            f"list_transform([{srt}], srt ->"
            f" {med2.replace('__SRT__', 'srt')})[1]"
        )
    d1 = f"({e.tok('i + 2')} - {e.tok('i + 1')})"
    d2 = f"({e.tok('i + 3')} - {e.tok('i + 2')})"
    # kept signs: +1 above median, -1 below, equals dropped
    sgn = (
        f"CASE WHEN 2 * {e.tok('i + 1')} > med2 THEN 1"
        f" WHEN 2 * {e.tok('i + 1')} < med2 THEN -1 ELSE 0 END"
    )
    kept = (
        f"{e.fil}({e.tr}({e.seq0('n_tok')}, i -> {sgn}), s -> s != 0)"
    )
    return {
        "med2": med2,
        "t_cnt": e.cnt("n_tok - 2", f"{d1} * {d2} < 0"),
        "d_cnt": e.cnt("n_tok - 1", f"{d1} > 0"),
        "kept": kept,
    }


def _stage2(e: _E) -> dict[str, str]:
    k1, k2 = e.el("kept", "i + 1"), e.el("kept", "i + 2")
    trans = e.cnt(f"{e.siz}(kept) - 1", f"{k1} != {k2}")
    return {
        "n1": f"CAST({e.siz}({e.fil}(kept, s -> s = 1)) AS BIGINT)",
        "n2": f"CAST({e.siz}({e.fil}(kept, s -> s = -1)) AS BIGINT)",
        "r_cnt": f"CASE WHEN {e.siz}(kept) = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE 1 + {trans} END",
    }


_D = "CAST({x} AS DOUBLE)"


def _z_turn() -> str:
    n = _D.format(x="n_tok")
    e_t = f"(CAST(2 AS DOUBLE) * ({n} - CAST(2 AS DOUBLE)) / CAST(3 AS DOUBLE))"
    v_t = (
        f"((CAST(16 AS DOUBLE) * {n} - CAST(29 AS DOUBLE))"
        f" / CAST(90 AS DOUBLE))"
    )
    return f"(({_D.format(x='t_cnt')} - {e_t}) / sqrt({v_t}))"


def _z_runs() -> str:
    n1, n2 = _D.format(x="n1"), _D.format(x="n2")
    m = f"({n1} + {n2})"
    e_r = f"(CAST(2 AS DOUBLE) * {n1} * {n2} / {m} + CAST(1 AS DOUBLE))"
    v_r = (
        f"(CAST(2 AS DOUBLE) * {n1} * {n2}"
        f" * (CAST(2 AS DOUBLE) * {n1} * {n2} - {n1} - {n2})"
        f" / ({m} * {m} * ({m} - CAST(1 AS DOUBLE))))"
    )
    z = f"(({_D.format(x='r_cnt')} - {e_r}) / sqrt({v_r}))"
    return (
        f"CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 1 THEN {z}"
        f" ELSE CAST(NULL AS DOUBLE) END"
    )


def _z_diff() -> str:
    n = _D.format(x="n_tok")
    e_d = f"(({n} - CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE))"
    v_d = f"(({n} + CAST(1 AS DOUBLE)) / CAST(12 AS DOUBLE))"
    return f"(({_D.format(x='d_cnt')} - {e_d}) / sqrt({v_d}))"


def _verdict(z: str) -> str:
    return (
        f"CAST(CASE WHEN abs({z}) > CAST(1.96 AS DOUBLE)"
        f" THEN 1 ELSE 0 END AS BIGINT)"
    )


@register(
    "randomness_tests",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id, n_tok, tokens,
             {_stage1(_E('duck'))["med2"]} AS med2
      FROM synth
    ),
    s1 AS (
      SELECT doc_id, n_tok, med2,
             {", ".join(f"{x} AS {k}" for k, x in _stage1(_E('duck')).items() if k != "med2")}
      FROM s0
    ),
    s2 AS (
      SELECT doc_id, n_tok, med2, t_cnt, d_cnt,
             {", ".join(f"{x} AS {k}" for k, x in _stage2(_E('duck')).items())}
      FROM s1
    )
    SELECT doc_id, n_tok, med2, t_cnt, d_cnt, n1, n2, r_cnt,
           {_FLOOR6.format(x=_z_turn())} AS z_turning,
           {_FLOOR6.format(x=_z_runs())} AS z_runs,
           {_FLOOR6.format(x=_z_diff())} AS z_diffsign,
           {_verdict(_z_turn())} AS rej_turning,
           {_verdict(_z_diff())} AS rej_diffsign
    FROM s2
    """,
)
def randomness_tests(spark, sf_dir):
    """TS48: turning-point / runs-about-median / difference-sign
    randomness battery (module header) — all counts int64, z-scores
    shared verbatim trees floor-1e6, verdicts vs the 1.96 literal.
    Plan: ZERO exchanges — a pure map job."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    s1 = docs
    for k, x in _stage1(e).items():
        s1 = s1.withColumn(k, F.expr(x))
    s2 = s1.select(
        "doc_id",
        "n_tok",
        "med2",
        "t_cnt",
        "d_cnt",
        *[F.expr(x).alias(k) for k, x in _stage2(e).items()],
    )
    return s2.select(
        "doc_id",
        "n_tok",
        "med2",
        "t_cnt",
        "d_cnt",
        "n1",
        "n2",
        "r_cnt",
        F.expr(_FLOOR6.format(x=_z_turn())).alias("z_turning"),
        F.expr(_FLOOR6.format(x=_z_runs())).alias("z_runs"),
        F.expr(_FLOOR6.format(x=_z_diff())).alias("z_diffsign"),
        F.expr(_verdict(_z_turn())).alias("rej_turning"),
        F.expr(_verdict(_z_diff())).alias("rej_diffsign"),
    )
