"""SAX-word-indexed subsequence search (iSAX-style, Shieh & Keogh 2008).

The scale path for windowed similarity search: instead of scanning all
W windows per query (the ``subsequence_search`` brute tier, M5), every
window is symbolized once into a SAX word (z-norm -> PAA -> N(0,1)
quartile letters) and the corpus of windows is BUCKETED by word; a
query probes its own word's bucket with an equi-join and ranks only
those candidates by exact z-normalized distance. Identical windows get
identical words, near-identical windows almost always collide (PAA is
a contraction), and at 100 TB the index is a bucketed table the query
side broadcast-joins into — never an all-windows cross product.

Everything is JVM SQL (HOF aggregates inside codegen; ZERO Python, zero
shuffles on the index build beyond the source scan): window explode via
``transform(sequence(...))``, integer power sums, the same z-norm
letter formula as ``tsops_q.sax_symbols`` (proven bit-deterministic
across engines), and the matrix-profile family's 2L(1-corr) exact
expression tree for the candidate ranking — so the whole operator,
join included, is FULL-VALUE DuckDB-oracle-able.

Window length 16 with 4 segments keeps every internal division a power
of two (exact in float64); stride 8 halves the index size while any
length-24+ match region still contains an aligned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

L = 16
STRIDE = 8
SEGS = 4
SEG = L // SEGS
BREAKS = (-0.6745, 0.0, 0.6745)

# SAX word from a length-16 window w with precomputed integer sums
# (sx, sxx). All divisions are by powers of two -> exact; the letter
# comparisons see identically rounded doubles in Spark and DuckDB.
_WORD_SPARK = f"""
array_join(transform(sequence(0, {SEGS - 1}), j -> CASE
  WHEN ((aggregate(slice(w, cast(j * {SEG} AS INT) + 1, {SEG}),
                   0L, (a, x) -> a + cast(x AS BIGINT)) / {float(SEG)}D
         - sx / {float(L)}D)
        / sqrt(sxx / {float(L)}D - (sx / {float(L)}D) * (sx / {float(L)}D)))
       < {BREAKS[0]}D THEN 'a'
  WHEN ((aggregate(slice(w, cast(j * {SEG} AS INT) + 1, {SEG}),
                   0L, (a, x) -> a + cast(x AS BIGINT)) / {float(SEG)}D
         - sx / {float(L)}D)
        / sqrt(sxx / {float(L)}D - (sx / {float(L)}D) * (sx / {float(L)}D)))
       < {BREAKS[1]}D THEN 'b'
  WHEN ((aggregate(slice(w, cast(j * {SEG} AS INT) + 1, {SEG}),
                   0L, (a, x) -> a + cast(x AS BIGINT)) / {float(SEG)}D
         - sx / {float(L)}D)
        / sqrt(sxx / {float(L)}D - (sx / {float(L)}D) * (sx / {float(L)}D)))
       < {BREAKS[2]}D THEN 'c'
  ELSE 'd' END), '')
"""

_D2_SPARK = f"""
2D * {float(L)}D * (1D - (CASE
  WHEN ({L} * sxx - sx * sx) > 0 AND ({L} * q_sxx - q_sx * q_sx) > 0
  THEN greatest(-1D, least(1D,
    cast({L} * aggregate(zip_with(w, q_w, (x, y) -> cast(x AS BIGINT) * y),
                         0L, (a, x) -> a + x)
         - sx * q_sx AS DOUBLE)
    / (sqrt(cast({L} * sxx - sx * sx AS DOUBLE))
       * sqrt(cast({L} * q_sxx - q_sx * q_sx AS DOUBLE)))))
  WHEN ({L} * sxx - sx * sx) = 0 AND ({L} * q_sxx - q_sx * q_sx) = 0
  THEN 1D
  ELSE 0D END))
"""


def sax_window_index(
    df: DataFrame,
    max_len: int | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Explode every series into stride-{STRIDE} length-{L} windows and
    symbolize each: ``(doc_id, pos, w, sx, sxx, word)``. Scan-side
    codegen only; persist/bucket the result by ``word`` at scale."""
    t = (
        F.slice(tokens_col, 1, max_len).alias("t")
        if max_len is not None
        else F.col(tokens_col).alias("t")
    )
    base = df.select(F.col(id_col).alias("doc_id"), t).where(
        F.size("t") >= L
    )
    win = base.select(
        "doc_id",
        F.expr(
            f"explode(transform(sequence(0, size(t) - {L}, {STRIDE}),"
            f" s -> struct(cast(s AS INT) AS pos,"
            f" slice(t, cast(s AS INT) + 1, {L}) AS w)))"
        ).alias("x"),
    ).select("doc_id", "x.pos", "x.w")
    sums = win.select(
        "doc_id",
        "pos",
        "w",
        F.expr("aggregate(w, 0L, (a, x) -> a + cast(x AS BIGINT))").alias("sx"),
        F.expr(
            "aggregate(w, 0L, (a, x) -> a + cast(x AS BIGINT) * cast(x AS BIGINT))"
        ).alias("sxx"),
    )
    return sums.withColumn("word", F.expr(_WORD_SPARK))


def sax_subseq_search(
    index_df: DataFrame, query_df: DataFrame, k: int = 10
) -> DataFrame:
    """Probe the word index: equi-join each query window's SAX word
    against the bucketed index (broadcast the query side — it is the
    small one by contract), rank candidates by exact z-normalized
    distance ``2L(1 - corr)``, keep top-``k``. ``query_df`` columns:
    (query_id, w) — length-{L} integer windows."""
    q = (
        query_df.select(F.col("query_id"), F.col("w"))
        .withColumn(
            "sx", F.expr("aggregate(w, 0L, (a, x) -> a + cast(x AS BIGINT))")
        )
        .withColumn(
            "sxx",
            F.expr(
                "aggregate(w, 0L, (a, x) -> a + cast(x AS BIGINT) * cast(x AS BIGINT))"
            ),
        )
        .withColumn("word", F.expr(_WORD_SPARK))
        .select(
            "query_id",
            F.col("w").alias("q_w"),
            F.col("sx").alias("q_sx"),
            F.col("sxx").alias("q_sxx"),
            F.col("word").alias("q_word"),
        )
    )
    cand = index_df.join(
        F.broadcast(q), index_df["word"] == q["q_word"], "inner"
    ).withColumn("d2", F.expr(_D2_SPARK))
    ranked = cand.select(
        "query_id",
        "doc_id",
        "pos",
        "d2",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy("d2", "doc_id", "pos")
        )
        .alias("rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("query_id"))
        .alias("n_candidates"),
    )
    return ranked.where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Registry query: 48 truncated docs indexed; two probes — a VERBATIM
# window of doc 5 (must return itself at rank 1, d2 within ulps of 0)
# and a window of doc 40. Fully oracled: DuckDB
# re-derives windows, words, the bucket join, every distance, and the
# ranking with the same expression trees.
# ---------------------------------------------------------------------------

_NI = 48
_IMAXLEN = 256
_D = "doc{:012d}".format

_WORD_DUCK = """
array_to_string(list_transform(range(4), j -> CASE
  WHEN ((list_sum(w[(j * 4)::INT + 1 : (j * 4)::INT + 4]) / 4.0
         - sx / 16.0)
        / sqrt(sxx / 16.0 - (sx / 16.0) * (sx / 16.0))) < -0.6745 THEN 'a'
  WHEN ((list_sum(w[(j * 4)::INT + 1 : (j * 4)::INT + 4]) / 4.0
         - sx / 16.0)
        / sqrt(sxx / 16.0 - (sx / 16.0) * (sx / 16.0))) < 0.0 THEN 'b'
  WHEN ((list_sum(w[(j * 4)::INT + 1 : (j * 4)::INT + 4]) / 4.0
         - sx / 16.0)
        / sqrt(sxx / 16.0 - (sx / 16.0) * (sx / 16.0))) < 0.6745 THEN 'c'
  ELSE 'd' END), '')
"""

_SAXQ = synth_sql(_NI) + f"""
, trunc AS (
  SELECT doc_id, list_slice(tokens, 1, least(n_tok, {_IMAXLEN})) AS t
  FROM synth
),
winx AS (
  SELECT doc_id,
         unnest(range(0, len(t) - {L} + 1, {STRIDE})) AS pos, t
  FROM trunc WHERE len(t) >= {L}
),
widx AS (
  SELECT doc_id, pos::INT AS pos,
         list_slice(t, pos::INT + 1, pos::INT + {L}) AS w
  FROM winx
),
sidx AS (
  SELECT doc_id, pos, w,
         list_sum(w) AS sx,
         list_sum(list_transform(w, x -> x * x)) AS sxx
  FROM widx
),
indexed AS (SELECT *, {_WORD_DUCK} AS word FROM sidx),
probes AS (
  SELECT 'probe_self' AS query_id,
         (SELECT w FROM widx WHERE doc_id = '{_D(5)}' AND pos = 24) AS q_w
  UNION ALL
  SELECT 'probe_other',
         (SELECT w FROM widx WHERE doc_id = '{_D(40)}' AND pos = 48)
),
qstats AS (
  SELECT query_id, q_w,
         list_sum(q_w) AS q_sx,
         list_sum(list_transform(q_w, x -> x * x)) AS q_sxx
  FROM probes
),
qwords AS (
  SELECT query_id, q_w, q_sx, q_sxx,
         (SELECT {_WORD_DUCK} FROM (SELECT q_w AS w, q_sx AS sx, q_sxx AS sxx))
           AS q_word
  FROM qstats
),
candx AS (
  SELECT q.query_id, i.doc_id, i.pos,
         2 * 16.0 * (1 - (CASE
           WHEN (16 * i.sxx - i.sx * i.sx) > 0
            AND (16 * q.q_sxx - q.q_sx * q.q_sx) > 0
           THEN greatest(-1.0, least(1.0,
             (16 * list_sum(list_transform(range(16),
                    kk -> i.w[kk + 1] * q.q_w[kk + 1]))
              - i.sx * q.q_sx)::DOUBLE
             / (sqrt((16 * i.sxx - i.sx * i.sx)::DOUBLE)
                * sqrt((16 * q.q_sxx - q.q_sx * q.q_sx)::DOUBLE))))
           WHEN (16 * i.sxx - i.sx * i.sx) = 0
            AND (16 * q.q_sxx - q.q_sx * q.q_sx) = 0
           THEN 1.0
           ELSE 0.0 END)) AS d2
  FROM indexed i JOIN qwords q ON i.word = q.q_word
),
rankedx AS (
  SELECT query_id, doc_id, pos, d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, doc_id, pos) AS rank,
         count(*) OVER (PARTITION BY query_id) AS n_candidates
  FROM candx
)
"""


@register(
    "sax_subseq_topk",
    oracle=_SAXQ
    + """
    SELECT query_id, doc_id, pos, d2, rank::INT AS rank,
           n_candidates::BIGINT AS n_candidates
    FROM rankedx WHERE rank <= 10
    """,
)
def sax_subseq_topk(spark, sf_dir):
    """iSAX-style indexed subsequence search, fully oracled end-to-end:
    index ~1.4k windows of 48 truncated docs by SAX word, probe with a
    verbatim window of doc 5 (itself at rank 1, d2 within ulps of 0) and a
    window of doc 40; every candidate distance, the ranking, and the
    bucket sizes hash-match DuckDB's re-derivation of the identical
    index + join."""
    seqs = synth.sequences_df(spark, _NI)
    idx = sax_window_index(seqs, max_len=_IMAXLEN)
    probes = idx.where(
        ((F.col("doc_id") == _D(5)) & (F.col("pos") == 24))
        | ((F.col("doc_id") == _D(40)) & (F.col("pos") == 48))
    ).select(
        F.when(F.col("doc_id") == _D(5), "probe_self")
        .otherwise("probe_other")
        .alias("query_id"),
        "w",
    )
    return sax_subseq_search(idx, probes, k=10)
