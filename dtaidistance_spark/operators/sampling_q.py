"""Corpus sampling / splitting / decontamination operators over the
``documents`` table — the selection half of a training-data pipeline
(the filtering half lives in ``text_q`` / ``dedup_q``).

Everything here is *deterministic by construction*: sampling and split
decisions come from portable md5-prefix hashes (the same
``('0x' || substr(md5(x), 1, k))::BIGINT`` twin DuckDB evaluates
bit-identically), never from ``rand()``. Two reasons: (a) the driver's
oracle compares value hashes, so the decision rule itself must be
re-derivable in SQL; (b) at 100 TB a resumable pipeline needs
idempotent selection — re-running a failed partition must keep exactly
the same rows (the same property the checkpoint-resume contract in
``sources/tableio.py`` relies on).

Scale notes per operator are on the docstrings; the common shape is
one explode (or none) + one hash-partitioned aggregate, all JVM-side
whole-stage-codegen SQL — no Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from dtaidistance_spark.operators.queries import T, register

# ---------------------------------------------------------------------------
# T19 — benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------
#
# The standard LLM-training hygiene step (GPT-3 appendix C / Gopher /
# Llama recipes): drop or flag any training document sharing a word
# n-gram with the evaluation benchmark. There is no external benchmark
# in this sandbox, so the eval set is a deterministic slice of the
# corpus itself (doc_id % 37 == 0) — the *mechanism* (gram explode,
# broadcast eval-gram set, semi-join, per-doc hit counts) is exactly
# the production one.

_DECON_N = 4  # word 4-grams; the short synthetic word-soup docs make the
# production 13-gram rule vacuous (zero overlap) and 3-grams flag 60 %+
# of the corpus — 4 keeps a realistic, non-vacuous contamination rate


def _gram_expr(n: int) -> str:
    """JVM expression: all word n-grams of the split column ``ws``."""
    body = " || ' ' || ".join(f"element_at(ws, i + {j})" for j in range(n))
    return f"transform(sequence(1, size(ws) - {n - 1}), i -> {body})"


@register(
    "decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS ws
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(
                   list_slice(ws, i, i + {_DECON_N - 1}), ' ') AS g
        FROM toks, unnest(generate_series(1, len(ws) - {_DECON_N - 1}))
             AS t(i)
        WHERE len(ws) >= {_DECON_N}
    ),
    eval_grams AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 37 = 0
    ),
    hits AS (
        SELECT tg.doc_id, count(*) AS n_hit
        FROM grams tg JOIN eval_grams e USING (g)
        WHERE tg.doc_id % 37 <> 0
        GROUP BY tg.doc_id
    )
    SELECT t.doc_id, t.source,
           greatest(len(ws) - {_DECON_N - 1}, 0)::BIGINT AS n_grams,
           coalesce(n_hit, 0)::BIGINT AS n_contaminated,
           coalesce(n_hit, 0) > 0 AS contaminated
    FROM toks t LEFT JOIN hits USING (doc_id)
    WHERE t.doc_id % 37 <> 0
    """,
)
def decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag every training document sharing
    a word 4-gram with the (deterministic ``doc_id % 37`` slice) eval
    set; reports per-doc distinct-hit counts.

    Plan: gram explode on both sides (JVM ``transform``+``explode``,
    no Python), DISTINCT per (doc, gram), inner join train grams to the
    eval gram set, one count aggregate, left join back onto the doc
    spine. The eval-gram side of a real run is benchmark-sized (MBs) —
    Spark broadcast-hash-joins it automatically under AQE, so the 100 TB
    train side never shuffles on the gram key; only the per-doc count
    aggregate shuffles, and that carries one row per (doc, hit) pair.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("ws")
    )
    grams = (
        d.where(F.size("ws") >= _DECON_N)
        .select("doc_id", F.explode(F.expr(_gram_expr(_DECON_N))).alias("g"))
        .distinct()
    )
    eval_grams = (
        grams.where(F.col("doc_id") % 37 == 0).select("g").distinct()
    )
    hits = (
        grams.where(F.col("doc_id") % 37 != 0)
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    spine = d.where(F.col("doc_id") % 37 != 0).select(
        "doc_id",
        "source",
        F.greatest(F.size("ws") - (_DECON_N - 1), F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    return spine.join(hits, "doc_id", "left").select(
        "doc_id",
        "source",
        "n_grams",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_contaminated"),
        (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# T20 — deterministic domain-mixing sample (per-source hash sampling)
# ---------------------------------------------------------------------------


@register(
    "domain_mixing_sample",
    oracle="""
    WITH d AS (
        SELECT source, n_chars,
               substr(source, 4)::INT AS src_num,
               ('0x' || substr(md5('mix|' || doc_id::VARCHAR), 1, 8))::BIGINT
                   % 10000 AS bkt
        FROM documents
    ),
    r AS (
        SELECT *, CASE WHEN src_num % 2 = 0 THEN 2500 ELSE 7500 END
                      AS rate_bp
        FROM d
    )
    SELECT source, rate_bp::BIGINT AS rate_bp,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN bkt < rate_bp THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN bkt < rate_bp THEN n_chars ELSE 0 END)::BIGINT
               AS kept_chars,
           round(sum(CASE WHEN bkt < rate_bp THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS achieved_rate
    FROM r GROUP BY source, rate_bp
    """,
)
def domain_mixing_sample(spark, sf_dir):
    """Domain-mixing downsample: keep each document iff its md5 bucket
    (out of 10 000) falls below the source's mixing rate (25 % for
    even-numbered sources, 75 % for odd — standing in for a tuned
    per-domain weight table a la DoReMi/Pile mixing).

    Hash sampling instead of ``sample()``/``rand()`` on purpose: the
    decision is a pure row-local projection — idempotent across
    retries, stable under repartitioning, re-derivable by the oracle —
    and at scale it costs zero shuffles (the only exchange below is the
    per-source *report* aggregate; the kept-rows stream itself never
    moves). The rate table in production is a broadcast dim join.
    """
    d = T(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.substring("source", 4, 8).cast("int").alias("src_num"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10000
        ).alias("bkt"),
    )
    d = d.withColumn(
        "rate_bp",
        F.when(F.col("src_num") % 2 == 0, F.lit(2500))
        .otherwise(F.lit(7500))
        .cast("long"),
    )
    kept = F.col("bkt") < F.col("rate_bp")
    return d.groupBy("source", "rate_bp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept.cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_chars"),
        F.round(
            F.sum(kept.cast("double")) / F.count(F.lit(1)), 4
        ).alias("achieved_rate"),
    )


# ---------------------------------------------------------------------------
# T21 — deterministic train/val/test split
# ---------------------------------------------------------------------------


@register(
    "train_split_assign",
    oracle="""
    WITH d AS (
        SELECT source, n_chars,
               ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))
                   ::BIGINT % 100 AS bkt
        FROM documents
    )
    SELECT source,
           CASE WHEN bkt < 90 THEN 'train'
                WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS n_chars
    FROM d GROUP BY 1, 2
    """,
)
def train_split_assign(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment by md5 bucket of
    doc_id — the split survives reshuffles, re-runs, and corpus
    growth (an existing doc never changes split when new docs arrive,
    unlike ``randomSplit``). Row-local projection + one report
    aggregate; zero shuffles on the assignment itself.
    """
    d = T(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("split|"), F.col("doc_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("bkt"),
    )
    split = (
        F.when(F.col("bkt") < 90, "train")
        .when(F.col("bkt") < 95, "val")
        .otherwise("test")
        .alias("split")
    )
    return (
        d.select("source", "n_chars", split)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# T22 — Bloom-filter incremental dedup (new batch vs historical corpus)
# ---------------------------------------------------------------------------
#
# The incremental-ingest pattern: instead of joining every new batch
# against the full historical corpus (a 100 TB shuffle), keep a Bloom
# filter of historical content hashes, broadcast it, and probe new rows
# with a vectorized kernel — no join, no shuffle, bounded memory.
#
# Everything is deterministic and DuckDB-re-derivable: the k=7 bit
# positions come from two 32-bit md5-prefix halves (double hashing,
# h2 forced odd), m = 65536 bits fixed, so the oracle rebuilds the
# *identical* filter in SQL and even the false-positive count is an
# exactly-hashed column, not a tolerance bound. (m is sized for the
# test tier; production sizes m from the historical cardinality and
# the same tree-aggregated build below scales — each partition
# contributes one m/8-byte bitmap, OR-merged, like the bounded IVF
# training sample in operators/ann.py.)

_BLOOM_M = 65536  # bits
_BLOOM_K = 7


def _bloom_hashes(df):
    """JVM-side projection of the two 32-bit double-hashing halves."""
    hx = F.md5("text")
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").bitwiseOR(
        F.lit(1)
    )
    return df.select(
        "doc_id",
        F.substring("source", 4, 8).cast("int").alias("src_num"),
        hx.alias("hx"),
        h1.alias("h1"),
        h2.alias("h2"),
    )


def _bloom_build(hist_df) -> np.ndarray:
    """Tree-aggregated Bloom build: one bounded m/8-byte bitmap per
    partition crosses to the driver, OR-merged. The per-partition body
    is pure numpy over Arrow batches (no per-row Python)."""

    def part(batches):
        bits = np.zeros(_BLOOM_M, dtype=bool)
        for pdf in batches:
            if len(pdf):
                idx = (
                    pdf["h1"].to_numpy(np.int64)[:, None]
                    + np.arange(_BLOOM_K, dtype=np.int64)[None, :]
                    * pdf["h2"].to_numpy(np.int64)[:, None]
                ) % _BLOOM_M
                bits[idx.ravel()] = True
        yield pd.DataFrame({"bitmap": [np.packbits(bits).tobytes()]})

    schema = StructType([StructField("bitmap", BinaryType())])
    rows = hist_df.select("h1", "h2").mapInPandas(part, schema).collect()
    bits = np.zeros(_BLOOM_M, dtype=bool)
    for r in rows:
        bits |= np.unpackbits(np.frombuffer(r.bitmap, np.uint8)).astype(bool)
    return bits


@register(
    "bloom_dedup_check",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, substr(source, 4)::INT AS src_num, md5(text) AS hx,
               ('0x' || substr(md5(text), 1, 8))::BIGINT AS h1,
               (('0x' || substr(md5(text), 9, 8))::BIGINT | 1) AS h2
        FROM documents
    ),
    bits AS (
        SELECT DISTINCT (h1 + i * h2) % {_BLOOM_M} AS idx
        FROM h, unnest(generate_series(0, {_BLOOM_K - 1})) AS t(i)
        WHERE src_num < 10
    ),
    flags AS (
        SELECT doc_id, bool_and(b.idx IS NOT NULL) AS flagged
        FROM (SELECT doc_id, (h1 + i * h2) % {_BLOOM_M} AS idx
              FROM h,
                   unnest(generate_series(0, {_BLOOM_K - 1})) AS t(i)) p
        LEFT JOIN bits b USING (idx)
        GROUP BY doc_id
    ),
    j AS (
        SELECT h.*, f.flagged,
               hx IN (SELECT DISTINCT hx FROM h WHERE src_num < 10)
                   AS in_hist
        FROM h JOIN flags f USING (doc_id)
    )
    SELECT sum(CASE WHEN src_num < 10 THEN 1 ELSE 0 END)::BIGINT AS n_hist,
           count(*)::BIGINT AS n_probe,
           bool_and(CASE WHEN src_num < 10 THEN flagged ELSE TRUE END)
               AS hist_all_flagged,
           sum(CASE WHEN src_num >= 10 THEN 1 ELSE 0 END)::BIGINT AS n_new,
           sum(CASE WHEN src_num >= 10 AND in_hist THEN 1 ELSE 0 END)
               ::BIGINT AS n_new_exact_dup,
           sum(CASE WHEN src_num >= 10 AND flagged THEN 1 ELSE 0 END)
               ::BIGINT AS n_new_flagged
    FROM j
    """,
)
def bloom_dedup_check(spark, sf_dir):
    """Bloom-filter incremental dedup: build the filter over the
    historical slice (sources src0-src9), broadcast the 8 KB bitmap,
    probe EVERY document with a vectorized Arrow kernel. Historical
    members must all be flagged (a Bloom filter has no false
    negatives — driver-checked as ``hist_all_flagged``); the new-batch
    flag count decomposes into exact duplicates (re-derived by SQL
    join) plus false positives, and because the hash twins are
    portable md5 prefixes the oracle rebuilds the identical filter and
    matches ``n_new_flagged`` exactly. No join and no shuffle on the
    probe path — the scan stays where it is.
    """
    h = _bloom_hashes(T(spark, sf_dir, "documents"))
    bits = _bloom_build(h.where(F.col("src_num") < 10))
    b = spark.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        idx = (
            h1.to_numpy(np.int64)[:, None]
            + np.arange(_BLOOM_K, dtype=np.int64)[None, :]
            * h2.to_numpy(np.int64)[:, None]
        ) % _BLOOM_M
        return pd.Series(b.value[idx].all(axis=1))

    hist_hx = (
        h.where(F.col("src_num") < 10)
        .select("hx")
        .distinct()
        .withColumn("in_hist", F.lit(True))
    )
    j = (
        h.withColumn("flagged", probe("h1", "h2"))
        .join(F.broadcast(hist_hx), "hx", "left")
        .withColumn("in_hist", F.coalesce("in_hist", F.lit(False)))
    )
    old = F.col("src_num") < 10
    new = F.col("src_num") >= 10
    return j.agg(
        F.sum(old.cast("long")).cast("long").alias("n_hist"),
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.bool_and(
            F.when(old, F.col("flagged")).otherwise(F.lit(True))
        ).alias("hist_all_flagged"),
        F.sum(new.cast("long")).cast("long").alias("n_new"),
        F.sum((new & F.col("in_hist")).cast("long"))
        .cast("long")
        .alias("n_new_exact_dup"),
        F.sum((new & F.col("flagged")).cast("long"))
        .cast("long")
        .alias("n_new_flagged"),
    )


# ---------------------------------------------------------------------------
# T51 — deterministic training order: hash-shuffle + proportional
# source interleave (the dataloader's "shuffle and mix" as rank algebra)
# ---------------------------------------------------------------------------


@register(
    "training_order_mix",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('mix|' || doc_id::VARCHAR), 1, 15))::BIGINT
               AS hkey
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, hkey,
             row_number() OVER (PARTITION BY source
                                ORDER BY hkey, doc_id) AS rnk
      FROM h
    ),
    ns AS (SELECT source, count(*)::BIGINT AS n_s FROM h GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS n FROM h)
    SELECT r.doc_id, r.source, r.rnk::BIGINT AS rank_in_source, ns.n_s,
           ((2 * r.rnk - 1) * tot.n // (2 * ns.n_s))::BIGINT AS mix_key
    FROM r JOIN ns USING (source), tot
    """,
)
def training_order_mix(spark, sf_dir):
    """T51: the dataloader's "globally shuffle, keep sources evenly
    interleaved" as pure rank algebra — deterministic, idempotent, and
    bit-exact, with NO rand() (the module's md5-decision contract).

    Each doc gets a per-source shuffle rank r from the portable md5
    hash (ties to doc_id), and its global position key is

        mix_key = (2r − 1) · N div (2 · n_s)

    — the r-th doc of a source lands at its source's r-th proportional
    slot, so ANY prefix of the (mix_key, source, rank) order contains
    each source within ±1 slot of its corpus share: heterogeneous-
    source curricula stay well-mixed at every step, which a plain
    global hash sort does NOT guarantee for skewed sources (an 80%
    source can open a plain shuffle with long same-source runs; here
    runs are bounded by the proportion).  All int64.  Plan: one
    (source)-partitioned rank window + two broadcast-sized aggregates;
    the consumer sorts by the emitted key — a sort, not a window, so
    nothing here is a partition-less WindowExec."""
    from pyspark.sql import Window

    h = T(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long").alias("hkey"),
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    r = h.withColumn("rnk", F.row_number().over(w))
    ns = h.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = h.agg(F.count(F.lit(1)).alias("n"))
    return (
        r.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            F.col("rnk").cast("long").alias("rank_in_source"),
            "n_s",
            F.expr("(2 * rnk - 1) * n DIV (2 * n_s)")
            .cast("long")
            .alias("mix_key"),
        )
    )


# ---------------------------------------------------------------------------
# T52 — weighted reservoir sampling without replacement (Efraimidis-
# Spirakis A-Res), deterministic md5 draws
# ---------------------------------------------------------------------------

_RES_N = 512
_RES_K = 256
# shared float tree: u in (0, 1] from the 52-bit md5 prefix (+1 so u>0),
# key = -ln(u)/w  — smaller key = selected. 2^52 = 4503599627370496.
_RES_KEY = (
    "(-ln((CAST(h52 AS DOUBLE) + CAST(1 AS DOUBLE))"
    " / CAST(4503599627370496 AS DOUBLE)) / CAST(n_tok AS DOUBLE))"
)
_RES_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


@register(
    "weighted_reservoir_sample",
    oracle=None,  # set below (needs synth_sql; late import avoids a cycle)
)
def weighted_reservoir_sample(spark, sf_dir):
    """T52: one-pass weight-proportional sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006 A-Res): every doc draws u from a
    portable md5 prefix (52 bits, +1 so u>0), scores key = -ln(u)/w
    with w = n_tok, and the k = 256 smallest keys ARE the sample —
    heavier docs get stochastically smaller keys, and any prefix of
    the key order is itself a valid weighted sample.

    Determinism contract (the module's md5-decision rule): zero RNG —
    the draw is a pure row-local projection, idempotent across task
    retries and repartitioning, and re-derivable by the DuckDB oracle.
    The only float is the key itself; engines' ln() agree to 1 ulp on
    identical doubles, and with 512 keys spread over ~[1e-6, 0.2] a
    1-ulp flip of the ORDER is beyond astronomically unlikely (gap
    ~1e-4 vs 1e-17); the emitted key is floor-1e6.

    Scale shape: map-side key projection + TakeOrderedAndProject
    (bounded per-partition heap of k, k-row merge) — no full sort, no
    unbounded state, 100 TB-safe; rank derived on the 256 survivors by
    the qutil zero-Window re-rank."""
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.qutil import global_topk

    docs = synth.sequences_df(spark, _RES_N).select("doc_id", "source", "n_tok")
    keyed = docs.withColumn(
        "h52",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ares|"), F.col("doc_id"))), 1, 13),
            16,
            10,
        ).cast("long"),
    ).withColumn("key_raw", F.expr(_RES_KEY))
    top = global_topk(
        keyed.select("doc_id", "source", "n_tok", "key_raw"),
        [(F.col("key_raw"), False), (F.col("doc_id"), False)],
        _RES_K,
    )
    return top.select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        "source",
        "n_tok",
        F.expr(_RES_F6.format(x="key_raw")).alias("key6"),
    )


def _res_oracle() -> str:
    from dtaidistance_spark.operators.synth_q import synth_sql

    return (
        synth_sql(_RES_N)
        + f"""
    , keyed AS (
      SELECT doc_id, source, n_tok,
             ('0x' || substr(md5('ares|' || doc_id), 1, 13))::BIGINT AS h52
      FROM synth
    ),
    scored AS (
      SELECT doc_id, source, n_tok, {_RES_KEY} AS key_raw FROM keyed
    ),
    top AS (
      SELECT * FROM scored ORDER BY key_raw, doc_id LIMIT {_RES_K}
    )
    SELECT row_number() OVER (ORDER BY key_raw, doc_id) AS rank,
           doc_id, source, n_tok,
           {_RES_F6.format(x="key_raw")} AS key6
    FROM top
    """
    )


from dtaidistance_spark.operators.queries import ORACLE as _ORACLE  # noqa: E402

_ORACLE["weighted_reservoir_sample"] = _res_oracle()
