"""T36b — Heaps'-law exponent fit per source (Heaps'78; Herdan'60):
T36 (``vocab_growth``) emits the vocabulary-growth CURVE
(N_k, V_k after each doc); this operator fits the law itself,
V ≈ K·N^β, per source — the one-number dial that pairs with T42's
Zipf slope (the two laws are duals: β ≈ 1/α for a Zipfian corpus,
Lü-Zhang-Zhou EPL'10): β near 1 means the stream keeps minting new
types (dedup/curation sees unbounded vocabulary), β well below 1
means the vocabulary is closing.

Method: OLS of y = ln V_k on x = ln N_k over every checkpoint
(doc-index order, the T36 first-occurrence algebra re-derived
in-query so this oracle stands alone):

    β    = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
    ln K = (Σy − β·Σx)/n          →  K = exp(ln K)
    r²   = (n·Σxy − Σx·Σy)² / ((n·Σxx − Σx²)·(n·Σyy − Σy²))

Exactness: N_k and V_k are exact INT64 (the T36 cumsum algebra); the
five OLS sums are ORDER-PINNED folds over the checkpoint array sorted
by doc index (list_reduce / aggregate with a DOUBLE accumulator —
plain-double folds are row-safe in DuckDB, the struct-accumulator
hazard does not apply), ln/exp on identical doubles via the shared
container libm (the dfa_alpha / hurst_rs precedent), one shared
verbatim float tree, floor-1e6 emissions.

Honest (gated) reading — measured (512 docs; sources are 22 books /
89 code / 401 web docs): the three sources sit at three points of
ONE saturation trajectory, ordered by token mass — Heaps' β is a
corpus-age dial here.  books (17.8k tokens): β = 0.946601,
r² = 0.999487 — pre-saturation, the stream still minting types
near-linearly (V = 14 852).  code (113k tokens): β = 0.752479,
r² = 0.972682, V = 45 016 — mid-bend.  web (540k tokens):
β = 0.363902, r² = 0.767793 and V = 50 257 EXACTLY — the source has
exhausted the entire token space, the log-log curve has gone flat,
and the power-law form has broken down outright (K = 504.7 is no
longer a "constant"): the bounded-vocabulary endgame where Heaps'
law holds only as the pre-saturation envelope.  The pure-power-law
control in pytest recovers its planted β exactly (r² = 1), so the
bend is the corpus, not the fit.

Scale shape: identical to T36 (one explode shuffle with map-side
combine for first occurrences, one broadcast-joined per-doc count,
one PARTITIONED window cumsum) plus a 3-row per-source fold — the
fit adds nothing to the shuffle plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _fold(eng: str, term: str) -> str:
    """Order-pinned Σ term(e) over the sorted checkpoint array ``arr``
    (elements expose e.nk / e.vk as BIGINT)."""
    if eng == "spark":
        return (
            f"aggregate(arr, CAST(0 AS DOUBLE), (a, e) -> a + ({term}))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(arr, e -> ({term}))), (a, q) -> a + q)"
    )


_X = "ln(CAST(e.nk AS DOUBLE))"
_Y = "ln(CAST(e.vk AS DOUBLE))"

# the shared verbatim fit tree over the five fold sums
_BETA = (
    "((CAST(n AS DOUBLE) * sxy - sx * sy)"
    " / (CAST(n AS DOUBLE) * sxx - sx * sx))"
)
_LNK = f"((sy - {_BETA} * sx) / CAST(n AS DOUBLE))"
_R2 = (
    "((CAST(n AS DOUBLE) * sxy - sx * sy)"
    " * (CAST(n AS DOUBLE) * sxy - sx * sy)"
    " / ((CAST(n AS DOUBLE) * sxx - sx * sx)"
    " * (CAST(n AS DOUBLE) * syy - sy * sy)))"
)


def _fit_select(eng: str) -> str:
    """The per-source fit projection over (source, n, arr, n_tokens,
    vocab) — identical float tree both engines."""
    return (
        "source, n AS n_checkpoints, n_tokens, vocab, "
        + _F6.format(x=_BETA)
        + " AS beta, "
        + _F6.format(x=f"exp({_LNK})")
        + " AS k_coeff, "
        + _F6.format(x=_R2)
        + " AS r2"
    )


_DUCK_ORACLE = (
    synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, source, n_tok,
             CAST(substr(doc_id, 4) AS BIGINT) AS i, tokens
      FROM synth
    ),
    ex AS (SELECT source, i, unnest(tokens) AS tok FROM docs),
    fo AS (SELECT source, tok, min(i) AS first_i FROM ex GROUP BY 1, 2),
    nt AS (
      SELECT source, first_i AS i, count(*)::BIGINT AS new_types
      FROM fo GROUP BY 1, 2
    ),
    j AS (
      SELECT d.source, d.i, d.n_tok,
             coalesce(nt.new_types, 0) AS new_types
      FROM docs d LEFT JOIN nt ON nt.source = d.source AND nt.i = d.i
    ),
    curve AS (
      SELECT source, i,
             sum(n_tok::BIGINT) OVER (
               PARTITION BY source ORDER BY i)::BIGINT AS nk,
             sum(new_types) OVER (
               PARTITION BY source ORDER BY i)::BIGINT AS vk
      FROM j
    ),
    packed AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n,
             max(nk)::BIGINT AS n_tokens,
             max(vk)::BIGINT AS vocab,
             list(struct_pack(nk := nk, vk := vk) ORDER BY i) AS arr
      FROM curve GROUP BY source
    ),
    sums AS (
      SELECT source, n, n_tokens, vocab,
             {_fold('duck', _X)} AS sx,
             {_fold('duck', _Y)} AS sy,
             {_fold('duck', f'{_X} * {_X}')} AS sxx,
             {_fold('duck', f'{_X} * {_Y}')} AS sxy,
             {_fold('duck', f'{_Y} * {_Y}')} AS syy
      FROM packed
    )
    SELECT {_fit_select('duck')} FROM sums
    """
)


def _fit_from_curve(curve):
    """The fit layer over a growth-curve DataFrame
    ``(source, i, nk, vk)`` — exposed so pytest can feed constructed
    curves (pure power law, numpy parity) through the exact
    production float tree."""
    packed = (
        curve.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("nk").cast("long").alias("n_tokens"),
            F.max("vk").cast("long").alias("vocab"),
            F.array_sort(
                F.collect_list(F.struct("i", "nk", "vk"))
            ).alias("_s"),
        )
        .withColumn(
            "arr", F.expr("transform(_s, s -> struct(s.nk AS nk, s.vk AS vk))")
        )
    )
    sums = packed.selectExpr(
        "source",
        "n",
        "n_tokens",
        "vocab",
        f"{_fold('spark', _X)} AS sx",
        f"{_fold('spark', _Y)} AS sy",
        f"{_fold('spark', f'{_X} * {_X}')} AS sxx",
        f"{_fold('spark', f'{_X} * {_Y}')} AS sxy",
        f"{_fold('spark', f'{_Y} * {_Y}')} AS syy",
    )
    return sums.selectExpr(*[s.strip() for s in _fit_select("spark").split(", ")])


@register("heaps_law_fit", oracle=_DUCK_ORACLE)
def heaps_law_fit(spark, sf_dir):
    """T36b: the Heaps'-law β/K/r² fit per source (module header) —
    T36's first-occurrence curve algebra re-derived, then order-pinned
    ln-ln OLS folds over the checkpoint array; one shared verbatim
    float tree, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "source",
        "n_tok",
        F.expr("CAST(substr(doc_id, 4) AS BIGINT)").alias("i"),
        "tokens",
    )
    ex = docs.select("source", "i", F.explode("tokens").alias("tok"))
    fo = ex.groupBy("source", "tok").agg(F.min("i").alias("first_i"))
    nt = fo.groupBy("source", F.col("first_i").alias("i")).agg(
        F.count(F.lit(1)).alias("new_types")
    )
    j = docs.join(nt, ["source", "i"], "left").select(
        "source",
        "i",
        "n_tok",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    w = Window.partitionBy("source").orderBy("i")
    curve = j.select(
        "source",
        "i",
        F.sum(F.col("n_tok").cast("long")).over(w).cast("long").alias("nk"),
        F.sum("new_types").over(w).cast("long").alias("vk"),
    )
    return _fit_from_curve(curve)
