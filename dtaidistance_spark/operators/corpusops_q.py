"""Corpus-curation operators, round 2 batch: C4/FineWeb rule filters,
PII redaction, and BM25 ranked retrieval — all pure JVM SQL (zero
Python on any path) and all fully DuckDB-oracled on the shared
``documents`` table.

Determinism notes (the oracle hash is exact, so every float must match):

- ratios are single divisions of EXACT integer aggregates (word counts,
  character sums) — both engines perform one correctly-rounded IEEE
  division of identical operands, so no rounding tolerance is needed;
- BM25 uses ``ln`` (libm vs Java ``Math.log`` may differ in the last
  ulp) and a cross-term sum (aggregation order differs), so scores are
  rounded to 6 decimals before ranking ON BOTH SIDES, making the
  ranking itself deterministic;
- the synthetic corpus contains no real PII, so ``pii_redact`` injects
  deterministic doc_id-derived emails/phones IN THE QUERY (same
  expression in the oracle) — the redaction path is exercised for
  real, not vacuously.

Scale: every operator is scan → (optional explode) → hash aggregate;
filters/projections push into the parquet scan; the only shuffles are
the per-key aggregates. BM25's document-frequency table is vocabulary-
sized — broadcast in production.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.qutil import global_topk

# ---------------------------------------------------------------------------
# T23 — C4/FineWeb-style rule filters
# ---------------------------------------------------------------------------

_C4_RULES = """
    n_words BETWEEN 20 AND 10000
    AND mean_word_len BETWEEN 2.0 AND 12.0
    AND frac_unique >= 0.05
    AND NOT has_lorem AND NOT has_brace
"""


@register(
    "c4_quality_filters",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             string_split(text, ' ') AS ws,
             lower(text) AS lt, text
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(ws) AS n_words,
             list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)
               AS mean_word_len,
             len(list_distinct(ws))::DOUBLE / len(ws) AS frac_unique,
             contains(lt, 'lorem ipsum') AS has_lorem,
             contains(text, '{{') AS has_brace,
             ends_with(rtrim(text), '.') AS ends_period
      FROM w
    )
    SELECT doc_id, n_words, mean_word_len, frac_unique,
           has_lorem, has_brace, ends_period,
           ({_C4_RULES}) AS keep
    FROM m
    """,
)
def c4_quality_filters(spark, sf_dir):
    """T23: the C4 / FineWeb heuristic gate (Raffel et al. 2020 §2.2,
    Penedo et al. 2024) as one codegen'd pass: word-count band, mean
    word length band, lexical-diversity floor, lorem-ipsum / curly-brace
    blocklist, terminal-punctuation flag. All integer-exact arithmetic;
    rule branches the synthetic corpus can't trigger (lorem/brace/
    period) are pytest-gated on constructed rows."""
    docs = T(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        F.lower("text").alias("lt"),
        "text",
    ).select(
        "doc_id",
        F.size("ws").alias("n_words"),
        (
            F.expr(
                "aggregate(transform(ws, x -> length(x)), 0L, (a, x) -> a + x)"
            ).cast("double")
            / F.size("ws")
        ).alias("mean_word_len"),
        (F.size(F.array_distinct("ws")).cast("double") / F.size("ws")).alias(
            "frac_unique"
        ),
        F.col("lt").contains("lorem ipsum").alias("has_lorem"),
        F.col("text").contains("{").alias("has_brace"),
        F.expr("rtrim(text) LIKE '%.'").alias("ends_period"),
    )
    return m.withColumn("keep", F.expr(_C4_RULES))


# ---------------------------------------------------------------------------
# T24 — PII redaction
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{4}-\d{4}"


@register(
    "pii_redact",
    oracle=f"""
    WITH inj AS (
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' call 555-0100-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                       ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}'))::INT AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}'))::INT AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM inj
    """,
)
def pii_redact(spark, sf_dir):
    """T24: PII scrubbing (email + phone patterns) as JVM regex — count
    and mask per document. The corpus carries no PII, so deterministic
    doc_id-derived addresses are injected in-query (identical expression
    in the oracle) and the md5 of the redacted text proves the masking
    is byte-identical. Patterns are deliberately lookaround-free so the
    Java and RE2 engines agree."""
    docs = T(spark, sf_dir, "documents")
    inj = docs.select(
        "doc_id",
        F.concat(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call 555-0100-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    return inj.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# T25 — BM25 ranked retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("table", "merge", "window")
_K1, _B, _TOPK = 1.2, 0.75, 20


@register(
    "bm25_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    dl AS (SELECT doc_id, len(ws) AS dl FROM d),
    stats AS (
      SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
    ),
    tok AS (
      SELECT doc_id, unnest(ws) AS tok FROM d
    ),
    tf AS (
      SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM tok
      WHERE tok IN {_BM25_TERMS!r}
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_K1} + 1.0)
               / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * dl.dl / stats.avgdl))
             ) AS s
      FROM tf
      JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(s, 6) AS score,
           row_number() OVER (ORDER BY round(s, 6) DESC, doc_id)::INT AS rank
    FROM scored
    QUALIFY rank <= {_TOPK}
    """,
)
def bm25_topk(spark, sf_dir):
    """T25: BM25 (Robertson/Okapi, k1=1.2 b=0.75) top-20 for a fixed
    term set, end-to-end JVM SQL: explode -> tf, the vocabulary-sized
    df/idf table (broadcast in production), length-normalized scoring,
    global top-k (TakeOrderedAndProject). Scores rounded to 6 decimals
    on both sides BEFORE ranking (ln differs in the last ulp across
    libm implementations; the cross-term sum order is engine-defined)."""
    docs = T(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    dl = d.select("doc_id", F.size("ws").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.explode("ws").alias("tok"))
        .where(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_s",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            )
            * F.col("tf")
            * (_K1 + 1.0)
            / (
                F.col("tf")
                + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
    )
    return global_topk(
        scored.select("doc_id", "score"),
        [(F.col("score"), True), (F.col("doc_id"), False)],
        _TOPK,
    ).select("doc_id", "score", "rank")


# ---------------------------------------------------------------------------
# T30 — cross-document repeated-substring dedup (Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

_SUB_K = 4  # gram width in words (Lee et al. use 50 BPE tokens; the
            # synthetic vocab is tiny, so 4 words already collides)


@register(
    "substring_dedup_spans",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(ws[i : i + {_SUB_K} - 1], ' ')) AS gh
      FROM d, unnest(range(1, len(ws) - {_SUB_K} + 2)) AS t(i)
    ),
    dup AS (
      SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
    ),
    cov AS (
      SELECT g.doc_id, g.pos AS s, g.pos + {_SUB_K} AS e
      FROM g JOIN dup USING (gh)
    ),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_i
      FROM cov
    ),
    grp AS (
      SELECT doc_id, s, e,
             sum(new_i) OVER (PARTITION BY doc_id ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    )
    SELECT doc_id, min(s)::INT AS span_start, max(e)::INT AS span_end,
           (max(e) - min(s))::INT AS span_len
    FROM grp GROUP BY doc_id, island
    """,
)
def substring_dedup_spans(spark, sf_dir):
    """T30: cross-document repeated-substring detection (the Spark
    shape of Lee et al. 2022's suffix-array dedup): hash every
    {_SUB_K}-word gram, find grams occurring in >= 2 DISTINCT
    documents, cover each occurrence's [pos, pos+k) span, and merge
    overlapping spans per document with the gaps-and-islands window
    (running max of span ends). Returns the mergeable cut-list
    (doc_id, span_start, span_end) a removal pass would apply.

    Scale shape: one shuffle on the gram hash for the duplicate-gram
    aggregate (map-side combined), one semi-join back (the dup-gram
    table is corpus-shrinking — broadcast when it fits), one window
    sort per doc for the merge. All JVM SQL; the md5 gram hash is the
    DuckDB-portable twin of the production xxhash64."""
    docs = T(spark, sf_dir, "documents")
    k = _SUB_K
    g = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(split(text, ' ')) - {k}), "
                f"i -> struct(i AS pos, md5(array_join(slice(split(text, ' '), "
                f"i + 1, {k}), ' ')) AS gh))"
            )
        ).alias("x"),
    ).select("doc_id", "x.pos", "x.gh")
    dup = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gh")
    )
    cov = g.join(dup, "gh").select(
        "doc_id", F.col("pos").alias("s"), (F.col("pos") + k).alias("e")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = cov.withColumn(
        "new_i",
        (F.col("s") > F.coalesce(prev_max, F.lit(-1))).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_i").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return grp.groupBy("doc_id", "island").agg(
        F.min("s").cast("int").alias("span_start"),
        F.max("e").cast("int").alias("span_end"),
        (F.max("e") - F.min("s")).cast("int").alias("span_len"),
    ).drop("island")
