"""TS43/TS44 — recurrence quantification analysis (Zbilut & Webber's
RQA: recurrence rate, determinism, laminarity) and sample entropy
(Richman & Moorman AJP 2000) per series — the nonlinear-dynamics
regularity screens that complement TS30b's permutation entropy and
TS40's Hurst exponent in a triage battery.

Both run on the first 64 tokens of each series and are INTEGER-EXACT
up to one final divide (and one ln for SampEn):

* TS43 ``recurrence_quant``: the recurrence predicate
  ``|v_i − v_j| ≤ ε`` (ε = 1000 token units) is pure int64 algebra, so
  every count is exact — n_rec_all over all 64² pairs, off-LOI
  recurrences, DET's diagonal-neighbor condition ((i−1,j−1) or
  (i+1,j+1) also recurrent ⇒ the point sits on a diagonal line of
  length ≥ 2 — the l_min = 2 form), and LAM's vertical analog.
  RR/DET/LAM are single divides, floor-1e6.
* TS44 ``sample_entropy``: Richman-Moorman m = 2, Chebyshev tolerance
  r = 1000, template indices i < j ≤ N−m−1 (both A and B count over
  the same 62 template positions — the R-M convention that makes
  A ≤ B and SampEn ≥ 0 by construction).  A and B are int64 counts;
  SampEn = −ln(A/B) floor-1e6, NULL when A = 0.

O(n²) per row at n = 64 (4 096 HOF steps) — deliberate: this is the
exact verification tier, and the slice bound keeps it O(1) per row at
corpus scale.  Plan: ZERO exchanges — a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_W = 64  # slice length
_EPS = 1000

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"
        self.tr = "transform" if self.sp else "list_transform"
        self.fil = "filter" if self.sp else "list_filter"
        self.siz = "size" if self.sp else "len"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def seq0(self, n) -> str:
        return f"sequence(0, {n} - 1)" if self.sp else f"range({n})"

    def slice64(self) -> str:
        if self.sp:
            return (
                f"transform(slice(tokens, 1, {_W}),"
                f" x -> CAST(x AS BIGINT))"
            )
        return (
            f"list_transform(list_slice(tokens, 1, {_W}),"
            f" x -> CAST(x AS BIGINT))"
        )

    def rec(self, i: str, j: str) -> str:
        """|v[i+1] − v[j+1]| ≤ ε  (0-based i, j)."""
        return (
            f"abs({self.el('v', f'{i} + 1')}"
            f" - {self.el('v', f'{j} + 1')}) <= {_EPS}"
        )

    def cnt2(self, pred: str) -> str:
        """Σ_i |{j : pred(i,j)}| over i,j in 0..W−1 (int64)."""
        inner = f"{self.siz}({self.fil}({self.seq0(_W)}, j -> {pred}))"
        if self.sp:
            return (
                f"aggregate({self.seq0(_W)}, CAST(0 AS BIGINT),"
                f" (a, i) -> a + {inner})"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform({self.seq0(_W)}, i -> CAST({inner}"
            f" AS BIGINT))), (a, x) -> a + x)"
        )


def _rqa_cols(e: _E) -> dict[str, str]:
    rec = e.rec("i", "j")
    diag = (
        f"(i > 0 AND j > 0 AND {e.rec('i - 1', 'j - 1')})"
        f" OR (i < {_W} - 1 AND j < {_W} - 1"
        f" AND {e.rec('i + 1', 'j + 1')})"
    )
    vert = (
        f"(j > 0 AND {e.rec('i', 'j - 1')})"
        f" OR (j < {_W} - 1 AND {e.rec('i', 'j + 1')})"
    )
    return {
        "n_rec_all": e.cnt2(rec),
        "n_rec_off": e.cnt2(f"i != j AND {rec}"),
        "n_det_off": e.cnt2(f"i != j AND {rec} AND ({diag})"),
        "n_lam_off": e.cnt2(f"i != j AND {rec} AND ({vert})"),
    }


_RR = f"CAST(n_rec_all AS DOUBLE) / CAST({_W * _W} AS DOUBLE)"
_DET = (
    "CASE WHEN n_rec_off > 0 THEN CAST(n_det_off AS DOUBLE)"
    " / CAST(n_rec_off AS DOUBLE) ELSE CAST(NULL AS DOUBLE) END"
)
_LAM = (
    "CASE WHEN n_rec_off > 0 THEN CAST(n_lam_off AS DOUBLE)"
    " / CAST(n_rec_off AS DOUBLE) ELSE CAST(NULL AS DOUBLE) END"
)


@register(
    "recurrence_quant",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id, {_E('duck').slice64()} AS v FROM synth
    ),
    s1 AS (
      SELECT doc_id,
             {", ".join(f"{x} AS {k}" for k, x in _rqa_cols(_E('duck')).items())}
      FROM s0
    )
    SELECT doc_id, n_rec_all, n_rec_off, n_det_off, n_lam_off,
           {_FLOOR6.format(x=_RR)} AS rr,
           {_FLOOR6.format(x=_DET)} AS det,
           {_FLOOR6.format(x=_LAM)} AS lam
    FROM s1
    """,
)
def recurrence_quant(spark, sf_dir):
    """TS43: RQA over the first 64 tokens (module header) — int64
    recurrence/determinism/laminarity counts at ε = 1000, ratios
    floor-1e6.  Plan: ZERO exchanges."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "tokens")
    s0 = docs.select("doc_id", F.expr(e.slice64()).alias("v"))
    s1 = s0.select(
        "doc_id",
        *[F.expr(x).alias(k) for k, x in _rqa_cols(e).items()],
    )
    return s1.select(
        "*",
        F.expr(_FLOOR6.format(x=_RR)).alias("rr"),
        F.expr(_FLOOR6.format(x=_DET)).alias("det"),
        F.expr(_FLOOR6.format(x=_LAM)).alias("lam"),
    )


# ---------------------------------------------------------------------------
# TS44 — sample entropy
# ---------------------------------------------------------------------------

_NT = _W - 3 + 1  # 62 template start positions (R-M convention, m=2)


def _sampen_cols(e: _E) -> dict[str, str]:
    chb2 = (
        f"greatest(abs({e.el('v', 'i + 1')} - {e.el('v', 'j + 1')}),"
        f" abs({e.el('v', 'i + 2')} - {e.el('v', 'j + 2')})) <= {_EPS}"
    )
    chb3 = (
        f"greatest(abs({e.el('v', 'i + 1')} - {e.el('v', 'j + 1')}),"
        f" abs({e.el('v', 'i + 2')} - {e.el('v', 'j + 2')}),"
        f" abs({e.el('v', 'i + 3')} - {e.el('v', 'j + 3')})) <= {_EPS}"
    )
    inner_b = (
        f"{e.siz}({e.fil}({e.seq0(_NT)}, j -> j > i AND {chb2}))"
    )
    inner_a = (
        f"{e.siz}({e.fil}({e.seq0(_NT)}, j -> j > i AND {chb3}))"
    )
    if e.sp:
        mk = (
            lambda inner: f"aggregate({e.seq0(_NT)}, CAST(0 AS BIGINT),"
            f" (a, i) -> a + {inner})"
        )
    else:
        mk = (
            lambda inner: f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform({e.seq0(_NT)}, i -> CAST({inner}"
            f" AS BIGINT))), (a, x) -> a + x)"
        )
    return {"b_cnt": mk(inner_b), "a_cnt": mk(inner_a)}


_SAMPEN = (
    "CASE WHEN a_cnt > 0 AND b_cnt > 0 THEN"
    " -ln(CAST(a_cnt AS DOUBLE) / CAST(b_cnt AS DOUBLE))"
    " ELSE CAST(NULL AS DOUBLE) END"
)


@register(
    "sample_entropy",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id, {_E('duck').slice64()} AS v FROM synth
    ),
    s1 AS (
      SELECT doc_id,
             {", ".join(f"{x} AS {k}" for k, x in _sampen_cols(_E('duck')).items())}
      FROM s0
    )
    SELECT doc_id, b_cnt, a_cnt,
           {_FLOOR6.format(x=_SAMPEN)} AS sampen
    FROM s1
    """,
)
def sample_entropy(spark, sf_dir):
    """TS44: Richman-Moorman SampEn(m=2, r=1000) over the first 64
    tokens — A/B template-match counts int64-exact (i < j over the
    shared 62 template positions, so A ≤ B and SampEn ≥ 0 by
    construction), −ln(A/B) floor-1e6, NULL when A = 0.  Plan: ZERO
    exchanges."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select("doc_id", "tokens")
    s0 = docs.select("doc_id", F.expr(e.slice64()).alias("v"))
    s1 = s0.select(
        "doc_id",
        *[F.expr(x).alias(k) for k, x in _sampen_cols(e).items()],
    )
    return s1.select(
        "doc_id",
        "b_cnt",
        "a_cnt",
        F.expr(_FLOOR6.format(x=_SAMPEN)).alias("sampen"),
    )
