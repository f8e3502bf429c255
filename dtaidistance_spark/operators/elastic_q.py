"""K12 registry queries — full-value DuckDB oracles for the elastic
distance family (``dtaidistance_spark.elastic``): LCSS, EDR, ERP,
MSM, TWE, soft-DTW.

Two oracle modes, both exact (zero rounding tolerance):

* **Band degeneration** (the ``diag_q.py`` trick extended): at
  ``window = 0`` each general DP visits only its diagonal, where the
  value has a closed integer-exact form DuckDB recomputes with list
  lambdas — LCSS(ε) = #{i : |a_i − b_i| ≤ ε}, ERP/MSM = Σ|a_i − b_i|,
  TWE = 2·Σ|a_i − b_i| − |a_n − b_n| (0-padding telescopes the i−1
  term), soft-DTW = Σ(a_i − b_i)² (a single path makes the stable
  soft-min EXACT — softmin over one finite value returns it
  bit-for-bit).  Token values < 50257 keep every sum integer-valued
  in float64 (< 2⁵³), so Spark and DuckDB are bit-identical.  Only
  the window parameter degenerates — the banded DP machinery (border
  chains, INF masking, per-metric recursions, the ε/g/c/ν/λ/γ
  parameter paths) is the driven code; GENERAL configurations are
  pytest-gated against brute-force reference DPs
  (tests/test_elastic.py).

* **Full-DP Levenshtein identity** (EDR): at ``epsilon = 0`` on
  integers EDR IS classic Levenshtein, so ``edr_token_pairs`` runs
  the COMPLETE unbanded 64×64 DP over fold-64 token values and DuckDB
  recomputes it independently via its native ``levenshtein()`` on
  injectively-rendered strings (chr(33 + v) over already-folded
  values, the T65 rendering, so equality is preserved both sides) —
  a genuinely different algorithm (DuckDB's C++ edit distance)
  certifying every cell-path of the Python DP, not just the diagonal.

Pair population: all C(96, 2) = 4560 pairs of the 64-token-sliced
synthetic corpus via :func:`elastic.elastic_all_pairs` (the
size-guarded production path: broadcast self-join, repartition 32,
Arrow-batched kernel — pairs partition across executors; corpus-scale
candidates come from the LSH stack via :func:`elastic.elastic_score`,
T65's scorer posture).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import elastic as E
from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 96
_L = 64
_EPS = 2000  # LCSS tolerance on raw tokens (~8% match rate)
_FOLD = 64  # EDR fold: injective chr rendering, dense match structure

_PAIR_SQL = f"""
    , s AS (SELECT doc_id, tokens[1:{_L}] AS t FROM synth),
    pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.t AS ta, b.t AS tb
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
"""

_L1 = (
    f"list_sum(list_transform(range({_L}),"
    " j -> abs(ta[j+1] - tb[j+1])))::BIGINT"
)


def _sliced(spark):
    return synth.sequences_df(spark, _N).withColumn(
        "tokens", F.slice("tokens", 1, _L)
    )


@register(
    "lcss_diag_pairs",
    oracle=synth_sql(_N)
    + _PAIR_SQL
    + f"""
    SELECT id_a, id_b,
           list_sum(list_transform(range({_L}),
             j -> CASE WHEN abs(ta[j+1] - tb[j+1]) <= {_EPS}
                  THEN 1 ELSE 0 END))::BIGINT AS lcss,
           CAST(floor(list_sum(list_transform(range({_L}),
             j -> CASE WHEN abs(ta[j+1] - tb[j+1]) <= {_EPS}
                  THEN 1 ELSE 0 END)) * 1000000.0 / {_L}
             + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE) AS lcss_sim
    FROM pr
    """,
)
def lcss_diag_pairs(spark, sf_dir):
    """K12/LCSS full-value oracle at window=0: the banded LCSS DP
    (tolerance branch, skip propagation, band masking all driven)
    collapses to the aligned ε-match count, recomputed independently
    by DuckDB; similarity = LCSS/L floor-1e6."""
    out = E.elastic_all_pairs(
        _sliced(spark), "lcss", out_col="lcss_f", epsilon=_EPS, window=0
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("lcss_f").cast("long").alias("lcss"),
        F.expr(
            f"CAST(floor(lcss_f * 1000000.0 / {_L}"
            " + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
        ).alias("lcss_sim"),
    )


@register(
    "edr_token_pairs",
    oracle=synth_sql(_N)
    + f"""
    , s AS (SELECT doc_id,
              list_transform(tokens[1:{_L}], t -> t % {_FOLD}) AS t,
              list_aggregate(list_transform(tokens[1:{_L}],
                t -> chr(CAST(33 + t % {_FOLD} AS INT))),
                'string_agg', '') AS r
            FROM synth),
    pr AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.r AS ra, b.r AS rb
      FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(levenshtein(ra, rb) AS BIGINT) AS edr,
           CAST(floor((1.0 - levenshtein(ra, rb) / CAST({_L} AS DOUBLE))
             * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)
             AS edr_sim
    FROM pr
    """,
)
def edr_token_pairs(spark, sf_dir):
    """K12/EDR full-DP oracle: EDR(ε=0) on fold-64 tokens IS classic
    Levenshtein, recomputed by DuckDB's native C++ edit distance on
    the injectively-rendered strings — every cell-path of the
    complete (unbanded) Python DP certified, not just the diagonal."""
    df = _sliced(spark).withColumn(
        "tokens", F.expr(f"transform(tokens, t -> t % {_FOLD})")
    )
    out = E.elastic_all_pairs(df, "edr", out_col="edr_f", epsilon=0.0)
    return out.select(
        "id_a",
        "id_b",
        F.col("edr_f").cast("long").alias("edr"),
        F.expr(
            f"CAST(floor((1.0 - edr_f / CAST({_L} AS DOUBLE))"
            " * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
        ).alias("edr_sim"),
    )


@register(
    "erp_diag_pairs",
    oracle=synth_sql(_N)
    + _PAIR_SQL
    + f"""
    SELECT id_a, id_b, CAST({_L1} AS DOUBLE) AS erp
    FROM pr
    """,
)
def erp_diag_pairs(spark, sf_dir):
    """K12/ERP full-value oracle at window=0: the gap-penalty DP
    (border cumulative |·−g| chains, three-way min, band masking all
    driven, g=7) visits only the diagonal where ERP = Σ|a_i − b_i|,
    integer-exact."""
    out = E.elastic_all_pairs(
        _sliced(spark), "erp", out_col="erp", g=7.0, window=0
    )
    return out.select("id_a", "id_b", "erp")


@register(
    "msm_diag_pairs",
    oracle=synth_sql(_N)
    + _PAIR_SQL
    + f"""
    SELECT id_a, id_b, CAST({_L1} AS DOUBLE) AS msm
    FROM pr
    """,
)
def msm_diag_pairs(spark, sf_dir):
    """K12/MSM full-value oracle at window=0: the move-split-merge DP
    (chained borders, the between-test split/merge cost C at c=1.5,
    band masking all driven) visits only moves on the diagonal where
    MSM = Σ|a_i − b_i| — the same closed form as ERP through an
    entirely different recursion."""
    out = E.elastic_all_pairs(
        _sliced(spark), "msm", out_col="msm", c=1.5, window=0
    )
    return out.select("id_a", "id_b", "msm")


@register(
    "twe_diag_pairs",
    oracle=synth_sql(_N)
    + _PAIR_SQL
    + f"""
    SELECT id_a, id_b,
           CAST(2 * {_L1} - abs(ta[{_L}] - tb[{_L}]) AS DOUBLE) AS twe
    FROM pr
    """,
)
def twe_diag_pairs(spark, sf_dir):
    """K12/TWE full-value oracle at window=0 (ν=0.5, λ=1): Marteau's
    match op costs |a_i−b_i| + |a_{i−1}−b_{i−1}| + 2ν·0, so with the
    conventional 0-padding the diagonal value telescopes to
    2·Σ|a_i − b_i| − |a_n − b_n|, integer-exact — the delete chains,
    stiffness and λ machinery are on the driven path (gated off-diag
    in pytest)."""
    out = E.elastic_all_pairs(
        _sliced(spark), "twe", out_col="twe", nu=0.5, lam=1.0, window=0
    )
    return out.select("id_a", "id_b", "twe")


@register(
    "soft_dtw_diag_pairs",
    oracle=synth_sql(_N)
    + _PAIR_SQL
    + f"""
    SELECT id_a, id_b,
           CAST(list_sum(list_transform(range({_L}),
             j -> (ta[j+1] - tb[j+1]) * (ta[j+1] - tb[j+1])))
             AS DOUBLE) AS soft_dtw
    FROM pr
    """,
)
def soft_dtw_diag_pairs(spark, sf_dir):
    """K12/soft-DTW full-value oracle at window=0 (γ=1): a single
    in-band path makes the stable soft-min EXACT (softmin of one
    finite value is that value bit-for-bit — exp(−INF) underflows to
    0, log(1) = 0), so soft-DTW = Σ(a_i − b_i)², integer-exact in
    float64; the γ soft-min machinery is the driven path (its
    genuinely-soft regime is pytest-gated: γ→0 limit vs DTW², soft ≤
    hard, monotone in γ)."""
    out = E.elastic_all_pairs(
        _sliced(spark), "soft_dtw", out_col="soft_dtw", gamma=1.0, window=0
    )
    return out.select("id_a", "id_b", "soft_dtw")
