"""Corpus-level token statistics, round-3 batch: Heaps'-law vocabulary
growth, weighted systematic (PPS) sampling with a DISTRIBUTED prefix
sum, and per-source unigram Shannon entropy — the three curves/knobs a
training-data pipeline reads before fixing a domain mix.

T36 — vocab growth: "first occurrence" turns running-count-distinct
(not expressible as a window aggregate in either engine) into plain
relational algebra: a token contributes exactly once, at min(doc
index) within its source, so the curve is a groupBy + one PARTITIONED
window cumsum.  All int64 — bit-exact.

T37 — PPS sample: systematic sampling by cumulative weight needs a
GLOBAL running sum, which naively is the banned partition-less window
(single-partition sort of the corpus).  Instead the doc axis is cut
into buckets, each bucket cumsums independently (partitioned window),
and bucket OFFSETS come from a tiny bucket-totals aggregate joined
back — the classic two-level scan that turns prefix-sum into two
bounded shuffles at any scale.  Selection arithmetic is pure int64
(a doc is picked iff a multiple of step = total div k lands inside
its weight span), so the sample is deterministic, exact, and
retry-idempotent — no RNG, no floats.

T38 — entropy: unigram count table (one map-side-combined shuffle),
then H = −Σ p·log2 p per source.  Follows the unigram_logprob
precedent: the cross-row float sum's accumulation noise (~1e-12
relative here) sits far below the round(6) grain, and log2 on
identical doubles differs by ≤1 ulp across libms.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

# ---------------------------------------------------------------------------
# T36 — Heaps'-law vocabulary-growth curve (per source)
# ---------------------------------------------------------------------------


@register(
    "vocab_growth",
    oracle=synth_sql(_N)
    + """
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
      SELECT d.doc_id, d.source, d.i, d.n_tok,
             coalesce(nt.new_types, 0) AS new_types
      FROM docs d LEFT JOIN nt ON nt.source = d.source AND nt.i = d.i
    )
    SELECT doc_id, source, new_types,
           sum(n_tok::BIGINT) OVER (
             PARTITION BY source ORDER BY i)::BIGINT AS cum_tokens,
           sum(new_types) OVER (
             PARTITION BY source ORDER BY i)::BIGINT AS cum_types
    FROM j
    """,
)
def vocab_growth(spark, sf_dir):
    """T36: Heaps'-law vocabulary growth per source — after each doc
    (in deterministic doc-index order), how many tokens have streamed
    past and how many DISTINCT token types have appeared.  Running
    count-distinct is not a window aggregate, so it is rewritten as
    first-occurrence algebra: groupBy (source, token) → min(doc index)
    (one shuffle, map-side combined), count first-occurrences per doc,
    left-join back onto docs (AQE broadcasts the small side), then ONE
    partitioned window cumsum.  Everything int64 — bit-exact.  At
    100 TB the per-source running sum becomes the same two-level
    bucket scan as ``pps_systematic_sample``; the algebraic core
    (first-occurrence extraction) is already the scalable shape."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
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
    j = (
        docs.join(nt, ["source", "i"], "left")
        .select(
            "doc_id",
            "source",
            "i",
            "n_tok",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
    )
    w = Window.partitionBy("source").orderBy("i")
    return j.select(
        "doc_id",
        "source",
        "new_types",
        F.sum(F.col("n_tok").cast("bigint")).over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_types"),
    )


# ---------------------------------------------------------------------------
# T37 — weighted systematic (PPS) sample via distributed prefix sum
# ---------------------------------------------------------------------------

_BUCKET = 64  # docs per prefix-sum bucket
_K = 32  # target sample size


@register(
    "pps_systematic_sample",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, source, n_tok::BIGINT AS w,
             CAST(substr(doc_id, 4) AS BIGINT) AS i
      FROM synth
    ),
    b AS (SELECT *, i // {_BUCKET} AS bkt FROM docs),
    cw AS (
      SELECT *, sum(w) OVER (PARTITION BY bkt ORDER BY i)::BIGINT AS cw_in
      FROM b
    ),
    bt AS (SELECT bkt, sum(w)::BIGINT AS bw FROM b GROUP BY bkt),
    off AS (
      SELECT b1.bkt,
             coalesce(sum(b2.bw), 0)::BIGINT AS off
      FROM bt b1 LEFT JOIN bt b2 ON b2.bkt < b1.bkt
      GROUP BY b1.bkt
    ),
    tot AS (SELECT sum(w)::BIGINT AS total FROM docs),
    g AS (
      SELECT cw.doc_id, cw.source, cw.w,
             off.off + cw.cw_in AS cum_w,
             tot.total // {_K} AS step
      FROM cw JOIN off USING (bkt), tot
    )
    SELECT doc_id, source, w, cum_w,
           (cum_w // step - (cum_w - w) // step)::BIGINT AS n_ticks
    FROM g
    WHERE cum_w // step > (cum_w - w) // step
    """,
)
def pps_systematic_sample(spark, sf_dir):
    """T37: probability-proportional-to-size systematic sample — lay
    every doc's weight (token count) end to end on an integer line,
    drop a tick every step = total div 32, keep docs whose span
    contains a tick (long docs can earn several ticks → n_ticks).
    The global cumulative weight is a DISTRIBUTED prefix sum: docs
    bucket by index (64/bucket), each bucket cumsums under a
    partitioned window, and bucket offsets come from a bucket-totals
    self-join (B² on the tiny totals table — at 100 TB you'd tier the
    buckets, same algebra).  Pure int64 throughout: deterministic,
    retry-idempotent, bit-exact, and expected pick count per doc is
    exactly k·w/total — the textbook PPS estimator with zero RNG."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        "source",
        F.col("n_tok").cast("bigint").alias("w"),
        F.expr("CAST(substr(doc_id, 4) AS BIGINT)").alias("i"),
    )
    b = docs.withColumn("bkt", F.expr(f"i DIV {_BUCKET}"))
    cw = b.withColumn(
        "cw_in", F.sum("w").over(Window.partitionBy("bkt").orderBy("i"))
    )
    bt = b.groupBy("bkt").agg(F.sum("w").alias("bw"))
    off = (
        bt.alias("b1")
        .join(bt.alias("b2"), F.col("b2.bkt") < F.col("b1.bkt"), "left")
        .groupBy(F.col("b1.bkt").alias("bkt"))
        .agg(F.coalesce(F.sum("b2.bw"), F.lit(0)).alias("off"))
    )
    tot = docs.agg(F.sum("w").alias("total"))
    g = (
        cw.join(F.broadcast(off), "bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            "w",
            (F.col("off") + F.col("cw_in")).alias("cum_w"),
            F.expr(f"total DIV {_K}").alias("step"),
        )
    )
    return g.where(
        F.expr("cum_w DIV step > (cum_w - w) DIV step")
    ).select(
        "doc_id",
        "source",
        "w",
        "cum_w",
        F.expr("CAST(cum_w DIV step - (cum_w - w) DIV step AS BIGINT)").alias(
            "n_ticks"
        ),
    )


# ---------------------------------------------------------------------------
# T38 — per-source unigram Shannon entropy
# ---------------------------------------------------------------------------


@register(
    "token_entropy",
    oracle=synth_sql(_N)
    + """
    , ex AS (SELECT source, unnest(tokens) AS tok FROM synth),
    c AS (SELECT source, tok, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2),
    t AS (
      SELECT source, sum(cnt)::BIGINT AS total,
             count(*)::BIGINT AS vocab_size
      FROM c GROUP BY source
    )
    SELECT c.source, t.total AS n_tokens, t.vocab_size,
           round(sum(-(cnt::DOUBLE / t.total)
                     * log2(cnt::DOUBLE / t.total)), 6) AS entropy_bits,
           round(sum(-(cnt::DOUBLE / t.total)
                     * log2(cnt::DOUBLE / t.total))
                 / log2(t.vocab_size::DOUBLE), 6) AS entropy_norm
    FROM c JOIN t USING (source)
    GROUP BY c.source, t.total, t.vocab_size
    """,
)
def token_entropy(spark, sf_dir):
    """T38: Shannon entropy of each source's unigram token distribution
    (bits/token) plus the vocabulary-normalized efficiency H/log2|V| —
    the diversity dial for domain mixing (a low-entropy source is
    repetitive; near-1 efficiency means a flat distribution).  One
    map-side-combined shuffle for counts, one per-source aggregate for
    the sum; the cross-row float sum follows the unigram_logprob
    precedent (accumulation noise ~1e-12 relative, far under the
    round(6) grain).  Only the first (source, token) shuffle carries
    corpus-derived volume; every later exchange moves vocab- or
    source-sized tables."""
    ex = synth.sequences_df(spark, _N).select(
        "source", F.explode("tokens").alias("tok")
    )
    c = ex.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.groupBy("source").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab_size")
    )
    p = F.col("cnt").cast("double") / F.col("total")
    h = F.sum(-p * F.log2(p))
    return (
        c.join(F.broadcast(t), "source")
        .groupBy("source", F.col("total").alias("n_tokens"), "vocab_size")
        .agg(
            F.round(h, 6).alias("entropy_bits"),
            F.round(
                h / F.log2(F.col("vocab_size").cast("double")), 6
            ).alias("entropy_norm"),
        )
    )


# ---------------------------------------------------------------------------
# T40 — pairwise Jensen-Shannon divergence between source distributions
# ---------------------------------------------------------------------------


def _js_term(p, q):
    """Per-token JS contribution, spelled once so Spark and DuckDB walk
    the identical float tree: 0.5*p*log2(2p/(p+q)) + symmetric, with
    zero-probability sides contributing 0 exactly."""
    return (
        f"(CASE WHEN {p} > 0 THEN CAST(0.5 AS DOUBLE) * {p} * "
        f"log2((CAST(2 AS DOUBLE) * {p}) / ({p} + {q})) ELSE 0 END"
        f" + CASE WHEN {q} > 0 THEN CAST(0.5 AS DOUBLE) * {q} * "
        f"log2((CAST(2 AS DOUBLE) * {q}) / ({p} + {q})) ELSE 0 END)"
    )


_JS_PAIRS = (("web", "code"), ("web", "books"), ("code", "books"))


def _js_cols(engine_round):
    cols = []
    for a, b in _JS_PAIRS:
        p = f"(CAST(c_{a} AS DOUBLE) / t_{a})"
        q = f"(CAST(c_{b} AS DOUBLE) / t_{b})"
        cols.append(
            engine_round(f"sum({_js_term(p, q)})") + f" AS js_{a}_{b}"
        )
        cols.append(
            f"sum(CASE WHEN c_{a} > 0 AND c_{b} > 0 THEN 1 ELSE 0 END)"
            f"::BIGINT AS overlap_{a}_{b}"
            if engine_round is _duck_round
            else f"CAST(sum(CASE WHEN c_{a} > 0 AND c_{b} > 0 THEN 1 ELSE 0"
            f" END) AS BIGINT) AS overlap_{a}_{b}"
        )
    return cols


def _duck_round(x):
    return f"round({x}, 6)"


def _spark_round(x):
    return f"round({x}, 6)"


@register(
    "js_divergence",
    oracle=synth_sql(_N)
    + f"""
    , ex AS (SELECT source, unnest(tokens) AS tok FROM synth),
    c AS (SELECT source, tok, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2),
    piv AS (
      SELECT tok,
        sum(CASE WHEN source = 'web' THEN cnt ELSE 0 END)::BIGINT AS c_web,
        sum(CASE WHEN source = 'code' THEN cnt ELSE 0 END)::BIGINT AS c_code,
        sum(CASE WHEN source = 'books' THEN cnt ELSE 0 END)::BIGINT
          AS c_books
      FROM c GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(c_web) AS DOUBLE) AS t_web,
             CAST(sum(c_code) AS DOUBLE) AS t_code,
             CAST(sum(c_books) AS DOUBLE) AS t_books
      FROM piv
    )
    SELECT {", ".join(_js_cols(_duck_round))}
    FROM piv, tot
    """,
)
def js_divergence(spark, sf_dir):
    """T40: pairwise Jensen-Shannon divergence (bits, in [0,1]) between
    the three sources' unigram token distributions, plus vocabulary
    overlap counts — the symmetric, bounded domain-shift measure a
    mixing pipeline reads next to ``token_entropy``.  The count table
    pivots to one row per token with a column per source (so all three
    pairs price in ONE pass over the vocab-sized table), zero sides
    contribute exactly 0, and the shared `_js_term` spelling keeps both
    engines' float trees identical (round(6) under the established
    float-sum precedent).  Plan: one map-side-combined (source, token)
    shuffle, one token-keyed pivot aggregate, one single-row reduce —
    only vocab-sized data ever crosses an exchange."""
    ex = synth.sequences_df(spark, _N).select(
        "source", F.explode("tokens").alias("tok")
    )
    c = ex.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    piv = c.groupBy("tok").agg(
        *[
            F.sum(
                F.when(F.col("source") == s, F.col("cnt")).otherwise(0)
            ).alias(f"c_{s}")
            for s in ("web", "code", "books")
        ]
    )
    tot = piv.agg(
        *[
            F.sum(f"c_{s}").cast("double").alias(f"t_{s}")
            for s in ("web", "code", "books")
        ]
    )
    return piv.crossJoin(F.broadcast(tot)).selectExpr(
        "*"
    ).groupBy().agg(
        *[
            F.expr(col.rsplit(" AS ", 1)[0]).alias(col.rsplit(" AS ", 1)[1])
            for col in _js_cols(_spark_round)
        ]
    )


# ---------------------------------------------------------------------------
# T41 — interpolated bigram LM perplexity scoring
# ---------------------------------------------------------------------------

_LAM = "CAST(0.75 AS DOUBLE)"  # interpolation weight on the bigram term


@register(
    "bigram_logprob",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      FROM documents
    ),
    bg AS (
      SELECT doc_id, pos, tok AS w2,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
      FROM t
    ),
    uni AS (SELECT tok, count(*)::BIGINT AS c1 FROM t GROUP BY tok),
    tot AS (SELECT sum(c1)::BIGINT AS n FROM uni),
    bi AS (
      SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg
      WHERE w1 IS NOT NULL GROUP BY 1, 2
    ),
    scored AS (
      SELECT bg.doc_id,
             -ln({_LAM} * (CAST(bi.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE))
                 + (CAST(1 AS DOUBLE) - {_LAM})
                   * (CAST(u2.c1 AS DOUBLE) / CAST(tot.n AS DOUBLE)))
               AS nll
      FROM bg
      JOIN uni u1 ON u1.tok = bg.w1
      JOIN uni u2 ON u2.tok = bg.w2
      JOIN bi ON bi.w1 = bg.w1 AND bi.w2 = bg.w2, tot
      WHERE bg.w1 IS NOT NULL
    )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(nll), 4) AS avg_neg_logprob,
           avg(nll) <= 3.0 AS keep
    FROM scored GROUP BY doc_id
    """,
)
def bigram_logprob(spark, sf_dir):
    """T41: interpolated bigram language-model scoring (the step past
    ``unigram_logprob`` toward the CCNet/KenLM recipe): train bigram +
    unigram counts over the corpus in two aggregations, score every
    bigram with P(w2|w1) = 0.75·c(w1w2)/c(w1) + 0.25·c(w2)/N (Jelinek-
    Mercer interpolation — the unigram backoff term keeps unseen-pair
    probability mass positive, though over the training corpus itself
    every scored pair was seen), and keep low-perplexity docs.  Plan:
    bigram formation is a lag window per doc (one doc exchange),
    counts are map-side-combined, and the three scoring joins are
    token-keyed — Zipf-skewed keys are exactly what AQE skew-join
    splitting is on for, and at corpus scale the count tables AQE-
    broadcast just like the unigram LM's.  avg(-ln p) per doc at
    round(4) under the float-sum precedent."""
    doc = T(spark, sf_dir, "documents")
    t = doc.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    bg = t.select(
        "doc_id",
        "pos",
        F.col("tok").alias("w2"),
        F.lag("tok").over(
            Window.partitionBy("doc_id").orderBy("pos")
        ).alias("w1"),
    ).where(F.col("w1").isNotNull())
    uni = t.groupBy("tok").agg(F.count(F.lit(1)).alias("c1")).persist()
    tot = uni.agg(F.sum("c1").alias("n"))
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    p_bi = F.col("c2").cast("double") / F.col("c1_w1").cast("double")
    p_uni = F.col("c1_w2").cast("double") / F.col("n").cast("double")
    nll = -F.log(
        F.expr(_LAM) * p_bi + (F.lit(1.0) - F.expr(_LAM)) * p_uni
    )
    scored = (
        bg.join(uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1_w1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1_w2")), "w2")
        .join(bi, ["w1", "w2"])
        .crossJoin(F.broadcast(tot))
        .select("doc_id", nll.alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("nll"), 4).alias("avg_neg_logprob"),
        (F.avg("nll") <= 3.0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# T42 — Zipf rank-frequency fit per source
# ---------------------------------------------------------------------------


@register(
    "zipf_fit",
    oracle=synth_sql(_N)
    + """
    , ex AS (SELECT source, unnest(tokens) AS tok FROM synth),
    c AS (SELECT source, tok, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2),
    r AS (
      SELECT source, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, tok) AS rank
      FROM c
    ),
    xy AS (
      SELECT source, ln(rank::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM r
    ),
    s AS (
      SELECT source, count(*)::BIGINT AS v,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy GROUP BY source
    )
    SELECT source, v AS vocab_size,
      round((v * sxy - sx * sy) / (v * sxx - sx * sx), 4) AS zipf_slope,
      round((sy - ((v * sxy - sx * sy) / (v * sxx - sx * sx)) * sx)
            / v, 4) AS log_intercept,
      round(pow(v * sxy - sx * sy, 2)
            / ((v * sxx - sx * sx) * (v * syy - sy * sy)), 4) AS r2
    FROM s
    """,
)
def zipf_fit(spark, sf_dir):
    """T42: Zipf's-law fit per source — OLS of ln(count) on ln(rank)
    over the full rank-frequency curve, emitting the power-law slope
    (Zipf predicts ≈ −1 for natural text; the synthetic near-uniform
    token table sits much flatter — the value is the DIAGNOSTIC, it
    tells you how head-heavy a source is before you pick dedup and
    sampling knobs), log-intercept, and R².  Ranks come from a
    PARTITIONED window over the vocab-sized count table with a total
    (cnt DESC, tok) order; the five OLS sums ride one per-source
    aggregate under the round(4) float-sum precedent (pow(x,2) of an
    identical difference is one multiply — spelled pow in both
    engines).  Plan: one map-side-combined count shuffle, one
    vocab-sized window sort per source, one tiny reduce."""
    ex = synth.sequences_df(spark, _N).select(
        "source", F.explode("tokens").alias("tok")
    )
    c = ex.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    r = c.select(
        "source",
        "cnt",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("cnt").desc(), F.col("tok")
            )
        )
        .alias("rank"),
    )
    xy = r.select(
        "source",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    s = xy.groupBy("source").agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("v") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("v") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "source",
        F.col("v").alias("vocab_size"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("v"), 4).alias(
            "log_intercept"
        ),
        F.round(
            F.pow(
                F.col("v") * F.col("sxy") - F.col("sx") * F.col("sy"), 2
            )
            / (
                (F.col("v") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("v") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            4,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# T43 — exact token percentiles via count-cum positional selection
# ---------------------------------------------------------------------------

_PCTS = (50, 90, 99)


@register(
    "token_percentiles_exact",
    oracle=synth_sql(_N)
    + f"""
    , ex AS (SELECT source, unnest(tokens) AS tok FROM synth),
    c AS (SELECT source, tok, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2),
    w AS (
      SELECT source, tok, cnt,
             sum(cnt) OVER (PARTITION BY source ORDER BY tok)::BIGINT AS cum,
             sum(cnt) OVER (PARTITION BY source)::BIGINT AS n
      FROM c
    )
    SELECT source, max(n) AS n,
      {", ".join(
        f"min(CASE WHEN cum >= (n * {p} + 99) // 100 THEN tok END) AS p{p}"
        for p in _PCTS)}
    FROM w GROUP BY source
    """,
)
def token_percentiles_exact(spark, sf_dir):
    """T43: EXACT percentiles of the token-id distribution per source
    by counting, not sorting raw data — the scale recipe for exact
    quantiles over discrete domains: (source, token) counts (map-side
    combined, ≤|V| rows per source cross the shuffle), a PARTITIONED
    cumulative window over the vocab-sized table, and the p-th
    percentile is the smallest token whose running count reaches
    ceil(n·p/100) (the inverse-CDF / type-1 quantile, all int64 —
    bit-exact, no interpolation to reconcile).  Contrast
    ``events_percentiles`` (continuous domain ⇒ sort-based exact or
    t-digest approx) and ``uddq_sketch`` (mergeable approx): on a
    50k-value discrete domain the count table IS the full
    distribution, so exactness costs one vocab-sized shuffle no matter
    how many trillions of tokens stream by."""
    ex = synth.sequences_df(spark, _N).select(
        "source", F.explode("tokens").alias("tok")
    )
    c = ex.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = c.select(
        "source",
        "tok",
        F.sum("cnt")
        .over(Window.partitionBy("source").orderBy("tok"))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n"),
    )
    return w.groupBy("source").agg(
        F.max("n").alias("n"),
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.expr(f"(n * {p} + 99) DIV 100"),
                    F.col("tok"),
                )
            ).alias(f"p{p}")
            for p in _PCTS
        ],
    )


# ---------------------------------------------------------------------------
# T47 — cross-doc n-gram novelty (first-occurrence algebra over 5-grams)
# ---------------------------------------------------------------------------

_G = 5                        # gram order
_NM1, _NB1 = 2147483647, 50333   # two independent 31-bit poly hashes:
_NM2, _NB2 = 2147483629, 50341   # the pair key is ~62 bits — collisions
_NP1 = [pow(_NB1, _G - 1 - i, _NM1) for i in range(_G)]
_NP2 = [pow(_NB2, _G - 1 - i, _NM2) for i in range(_G)]


def _gram_terms(pows, mod, tok_at):
    s = " + ".join(
        f"{tok_at(i)} * CAST({pows[i]} AS BIGINT)" for i in range(_G)
    )
    return f"(({s}) % {mod})"


_GRAMS_SPARK = (
    "transform(sequence(0, n_tok - %d), j -> struct(%s AS g1, %s AS g2))"
    % (
        _G,
        _gram_terms(_NP1, _NM1, lambda i: f"CAST(tokens[j + {i}] AS BIGINT)"),
        _gram_terms(_NP2, _NM2, lambda i: f"CAST(tokens[j + {i}] AS BIGINT)"),
    )
)
_GRAMS_DUCK = (
    "list_transform(range(0, n_tok - %d), j -> {'g1': %s, 'g2': %s})"
    % (
        _G - 1,
        _gram_terms(_NP1, _NM1, lambda i: f"tokens[j + {i} + 1]::BIGINT"),
        _gram_terms(_NP2, _NM2, lambda i: f"tokens[j + {i} + 1]::BIGINT"),
    )
)


@register(
    "ngram_novelty",
    oracle=synth_sql(_N)
    + f"""
    , hh AS (
      SELECT doc_id, source, n_tok,
             CAST(substr(doc_id, 4) AS BIGINT) AS i, tokens,
             ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS h
      FROM synth
    ),
    docs AS (
      SELECT doc_id, source, n_tok, i, tokens FROM hh
      UNION ALL
      SELECT doc_id || '~s', source,
             n_tok + (1 + h % 7)::INT, i + {_N},
             list_concat(
               list_transform(range(1, 1 + (1 + h % 7)::INT),
                 s -> ((h % 50257 + s * 7919) % 50257)::INT),
               tokens)
      FROM hh
    ),
    ex AS (
      SELECT i, q.g1 AS g1, q.g2 AS g2
      FROM docs, unnest({_GRAMS_DUCK}) AS t(q)
    ),
    gc AS (
      SELECT i, g1, g2, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2, 3
    ),
    fo AS (SELECT g1, g2, min(i) AS first_i FROM gc GROUP BY 1, 2),
    pj AS (
      SELECT gc.i, gc.cnt, (fo.first_i = gc.i) AS is_novel
      FROM gc JOIN fo USING (g1, g2)
    ),
    per AS (
      SELECT i,
             sum(cnt)::BIGINT AS n_grams,
             sum(CASE WHEN is_novel THEN cnt ELSE 0 END)::BIGINT
               AS novel_pos,
             sum(is_novel::INT)::BIGINT AS novel_types
      FROM pj GROUP BY 1
    )
    SELECT d.doc_id, d.source, p.n_grams, p.novel_pos, p.novel_types,
           CAST(floor(CAST(p.novel_pos AS DOUBLE)
                / CAST(p.n_grams AS DOUBLE)
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS novel_frac
    FROM docs d JOIN per p ON p.i = d.i
    """,
)
def ngram_novelty(spark, sf_dir):
    """T47: cross-doc 5-gram novelty — per doc (in deterministic doc-
    index stream order), the fraction of its 5-gram positions whose
    gram has never appeared in ANY earlier doc: the diversity /
    memorization-risk score a pipeline reads before sampling, and the
    n-gram generalization of T36's first-occurrence algebra (running
    "seen before?" is not a window aggregate, but min(doc index) per
    gram is plain relational algebra).  Gram identity is a pair of
    independent 31-bit polynomial hashes (~62 bits; precomputed-power
    weighted sums, exact int64, identical both engines — no modmul
    overflow, no folds).  Everything is int64 except the one fraction,
    floor-1e6-rounded with the shared spelling.  Plan: scan-side HOF
    gram hashing, ONE map-side-combined (i, g1, g2) count shuffle, a
    gram-keyed min-reduce + join (the Zipf-join story of the unigram
    LM: AQE skew splitting; the gram count table is the corpus-sized
    price of EXACT novelty — same bill as exact dedup), then a per-doc
    reduce.

    The measured universe appends a prefix-edited twin of every doc
    (1..7 deterministic tokens prepended, stream index i + N, the CDC
    twin construction) because the raw synth corpus has zero cross-doc
    gram overlap: originals score ~1.0 novelty, twins ~0 — the
    contaminated-crawl signature the metric exists to surface."""
    base = synth.sequences_df(spark, _N).select(
        "doc_id",
        "source",
        "n_tok",
        F.expr("CAST(substr(doc_id, 4) AS BIGINT)").alias("i"),
        "tokens",
        F.conv(F.substring(F.md5("doc_id"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    pre = (
        "transform(sequence(1, CAST(1 + h % 7 AS INT)),"
        " s -> CAST((h % 50257 + s * 7919) % 50257 AS INT))"
    )
    docs = base.select(
        "doc_id", "source", "n_tok", "i", "tokens"
    ).unionAll(
        base.select(
            F.concat("doc_id", F.lit("~s")).alias("doc_id"),
            "source",
            (F.col("n_tok") + (F.lit(1) + F.col("h") % 7).cast("int")).alias(
                "n_tok"
            ),
            (F.col("i") + _N).alias("i"),
            F.expr(f"concat({pre}, tokens)").alias("tokens"),
        )
    )
    ex = docs.select("i", F.explode(F.expr(_GRAMS_SPARK)).alias("q")).select(
        "i", F.col("q.g1").alias("g1"), F.col("q.g2").alias("g2")
    )
    gc = ex.groupBy("i", "g1", "g2").agg(F.count(F.lit(1)).alias("cnt"))
    fo = gc.groupBy("g1", "g2").agg(F.min("i").alias("first_i"))
    pj = gc.join(fo, ["g1", "g2"]).select(
        "i", "cnt", (F.col("first_i") == F.col("i")).alias("is_novel")
    )
    per = pj.groupBy("i").agg(
        F.sum("cnt").alias("n_grams"),
        F.sum(F.when(F.col("is_novel"), F.col("cnt")).otherwise(0)).alias(
            "novel_pos"
        ),
        F.sum(F.col("is_novel").cast("int")).alias("novel_types"),
    )
    frac = (
        F.floor(
            F.col("novel_pos").cast("double")
            / F.col("n_grams").cast("double")
            * 1000000.0
            + 0.5
        ).cast("double")
        / 1000000.0
    )
    return docs.join(per, "i").select(
        "doc_id",
        "source",
        "n_grams",
        "novel_pos",
        "novel_types",
        frac.alias("novel_frac"),
    )


# ---------------------------------------------------------------------------
# T49 — vocabulary-pruning coverage curve (tokenizer sizing)
# ---------------------------------------------------------------------------

_PRUNE_KS = (256, 1024, 4096, 16384)


@register(
    "vocab_prune_coverage",
    oracle=synth_sql(_N)
    + f"""
    , ex AS (SELECT source, unnest(tokens) AS tok FROM synth),
    ct AS (
      SELECT source, tok, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2
    ),
    rk AS (
      SELECT source, tok, cnt,
             row_number() OVER (PARTITION BY source
                                ORDER BY cnt DESC, tok) AS rnk
      FROM ct
    ),
    tot AS (
      SELECT source, sum(cnt)::BIGINT AS total_pos,
             count(*)::BIGINT AS total_types
      FROM ct GROUP BY 1
    ),
    ks AS (SELECT unnest([{", ".join(str(k) for k in _PRUNE_KS)}])::BIGINT
             AS k),
    kept AS (
      SELECT rk.source, ks.k,
             sum(CASE WHEN rnk <= ks.k THEN cnt ELSE 0 END)::BIGINT
               AS kept_pos,
             sum(CASE WHEN rnk <= ks.k THEN 1 ELSE 0 END)::BIGINT
               AS kept_types
      FROM rk CROSS JOIN ks GROUP BY 1, 2
    )
    SELECT kept.source, kept.k, tot.total_pos, tot.total_types,
           kept.kept_pos, kept.kept_types,
           (tot.total_pos - kept.kept_pos)::BIGINT AS oov_pos,
           CAST(floor(CAST(kept.kept_pos AS DOUBLE)
                / CAST(tot.total_pos AS DOUBLE)
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS coverage
    FROM kept JOIN tot USING (source)
    """,
)
def vocab_prune_coverage(spark, sf_dir):
    """T49: the tokenizer-sizing curve — per source and candidate vocab
    size K ∈ {256, 1k, 4k, 16k}, what fraction of token POSITIONS the
    top-K types (by count, ties to the smaller token id) cover, and
    how many positions fall out-of-vocabulary.  This is the number a
    vocab-truncation / UNK-threshold decision reads, and it is exact:
    counts, ranks, kept/oov positions all int64; the one coverage
    float is floor-1e6 on the shared tree.  Plan: one map-side-combined
    (source, token) count shuffle reduces the corpus; the rank window
    is PARTITIONED over the vocab-sized table (T42's shape), and the
    K-grid cross join fans each vocab row onto 4 grid points before a
    tiny reduce — corpus size appears only in the first exchange."""
    ex = synth.sequences_df(spark, _N).select(
        "source", F.explode("tokens").alias("tok")
    )
    ct = ex.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    rk = ct.withColumn("rnk", F.row_number().over(w))
    tot = ct.groupBy("source").agg(
        F.sum("cnt").alias("total_pos"),
        F.count(F.lit(1)).alias("total_types"),
    )
    ks = spark.range(0, len(_PRUNE_KS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _PRUNE_KS]), (F.col("id") + 1).cast("int")
        ).cast("long").alias("k")
    )
    kept = rk.crossJoin(F.broadcast(ks)).groupBy("source", "k").agg(
        F.sum(F.when(F.col("rnk") <= F.col("k"), F.col("cnt")).otherwise(0))
        .alias("kept_pos"),
        F.sum(F.when(F.col("rnk") <= F.col("k"), 1).otherwise(0))
        .alias("kept_types"),
    )
    cov = (
        F.floor(
            F.col("kept_pos").cast("double")
            / F.col("total_pos").cast("double")
            * 1000000.0
            + 0.5
        ).cast("double")
        / 1000000.0
    )
    return kept.join(tot, "source").select(
        "source", "k", "total_pos", "total_types", "kept_pos", "kept_types",
        (F.col("total_pos") - F.col("kept_pos")).alias("oov_pos"),
        cov.alias("coverage"),
    )
