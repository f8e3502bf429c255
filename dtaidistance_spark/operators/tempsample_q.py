"""T66 — temperature-based source sampling weights (the multilingual
α-sampling recipe of mBERT/XLM-R/mT5, Conneau et al.'20 §3.1; Raffel
'20): rebalance source probabilities as p_s ∝ n_s^α (α = 0.3) so
low-resource sources are upsampled without letting them dominate —
THE mixing policy a multi-source training pipeline derives before
T20's domain_mixing_sample executes it.

Per source, over the token table: n_docs / n_tokens (int64), raw share
p_raw = n_s/N, tempered share p_alpha = n_s^0.3 / Σ n^0.3, the boost
factor p_alpha/p_raw, and expected epochs over each source at a
declared 10 M-token budget (budget·p_alpha/n_s) — the number that
flags over-repetition risk (Muennighoff'23: > 4 epochs of a source
degrades).  The Σ n^0.3 normalizer is a 3-term order-pinned fold over
the source-sorted array (no float aggregate); pow under the libm-ulp
precedent; floats floor-1e6.

Scale shape: ONE map-side-combined (source) aggregate — 3 rows out at
any corpus size — plus a broadcast single-row normalizer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_ALPHA = "CAST(0.3 AS DOUBLE)"
_BUDGET = 10_000_000

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_POW = f"pow(CAST(n_tokens AS DOUBLE), {_ALPHA})"


def _zsum(eng: str) -> str:
    """Order-pinned Σ of the source-sorted n^α array ``zl``."""
    if eng == "spark":
        return "aggregate(zl, CAST(0 AS DOUBLE), (a, x) -> a + x)"
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), zl),"
        " (a, x) -> a + x)"
    )


@register(
    "temperature_sampling",
    oracle=synth_sql(_N)
    + f"""
    , per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM synth GROUP BY source
    ),
    packed AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS n_total,
             list({_POW} ORDER BY source) AS zl
      FROM per
    ),
    nrm AS (SELECT n_total, {_zsum('duck')} AS z FROM packed)
    SELECT per.source, per.n_docs, per.n_tokens, nrm.n_total,
           {_F6.format(
               x="CAST(per.n_tokens AS DOUBLE)"
               " / CAST(nrm.n_total AS DOUBLE)")} AS p_raw,
           {_F6.format(
               x=f"pow(CAST(per.n_tokens AS DOUBLE), {_ALPHA}) / nrm.z")}
             AS p_alpha,
           {_F6.format(
               x=f"(pow(CAST(per.n_tokens AS DOUBLE), {_ALPHA}) / nrm.z)"
               " / (CAST(per.n_tokens AS DOUBLE)"
               " / CAST(nrm.n_total AS DOUBLE))")} AS boost,
           {_F6.format(
               x=f"CAST({_BUDGET} AS DOUBLE)"
               f" * (pow(CAST(per.n_tokens AS DOUBLE), {_ALPHA}) / nrm.z)"
               " / CAST(per.n_tokens AS DOUBLE)")} AS epochs
    FROM per, nrm
    """,
)
def temperature_sampling(spark, sf_dir):
    """T66: α = 0.3 temperature sampling weights per source (module
    header) — one 3-row aggregate, an order-pinned normalizer fold,
    broadcast back; raw/tempered shares, boost, and expected epochs
    at the declared 10M-token budget, all floor-1e6."""
    docs = synth.sequences_df(spark, _N).select("source", "n_tok")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    packed = per.groupBy().agg(
        F.sum("n_tokens").cast("long").alias("n_total"),
        F.expr(
            f"transform(array_sort(collect_list("
            f"struct(source, {_POW} AS zz))), p -> p.zz)"
        ).alias("zl"),
    )
    nrm = packed.select(
        "n_total", F.expr(_zsum("spark")).alias("z")
    )
    j = per.crossJoin(F.broadcast(nrm))
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_total",
        F.expr(
            _F6.format(
                x="CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE)"
            )
        ).alias("p_raw"),
        F.expr(_F6.format(x=f"{_POW} / z")).alias("p_alpha"),
        F.expr(
            _F6.format(
                x=f"({_POW} / z) / (CAST(n_tokens AS DOUBLE)"
                " / CAST(n_total AS DOUBLE))"
            )
        ).alias("boost"),
        F.expr(
            _F6.format(
                x=f"CAST({_BUDGET} AS DOUBLE) * ({_POW} / z)"
                " / CAST(n_tokens AS DOUBLE)"
            )
        ).alias("epochs"),
    )
