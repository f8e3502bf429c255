"""Registry queries for the matrix-profile operator — FULL-VALUE
DuckDB-oracled (the same exactness trick as ``diag_q``: integer tokens
make every squared-Euclidean subsequence distance an exact int64, so
the brute-force O(q^2 m) SQL twin reproduces the production kernel's
output bit-for-bit, including the argmin tie rule ORDER BY (d2, j) ==
numpy first-occurrence argmin).

Corpus: the first 48 synthetic docs truncated to 128 tokens (the truncation
keeps the SQL twin's pair join at ~700k rows); m=8, exclusion zone 4.
The Spark side is the PRODUCTION ``matrixprofile.matrix_profile``
operator — blocked BLAS kernel, mapInPandas, zero shuffles — only the
corpus is small, no code path is swapped.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators import matrixprofile as MP
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.qutil import global_topk
from dtaidistance_spark.operators.synth_q import synth_sql

_N_DOCS = 48
_MAXLEN = 128
_M = 8
_EXCL = 4

# brute-force profile CTE over the re-derived synthetic table:
# windows -> within-doc pair join outside the exclusion zone -> exact
# integer d2 -> rank-1 neighbor per (doc, pos)
_BRUTE = synth_sql(_N_DOCS) + f"""
, trunc AS (
  SELECT doc_id,
         list_slice(tokens, 1, least(n_tok, {_MAXLEN})) AS t,
         least(n_tok, {_MAXLEN}) AS n
  FROM synth
),
winx AS (
  SELECT doc_id, unnest(range(n - {_M} + 1)) AS i, t
  FROM trunc
),
wins AS (
  SELECT doc_id, i, list_slice(t, i + 1, i + {_M}) AS w
  FROM winx
),
pd2 AS (
  SELECT a.doc_id, a.i AS pos, b.i AS j,
         list_sum(list_transform(range({_M}),
           k -> (a.w[k + 1] - b.w[k + 1]) * (a.w[k + 1] - b.w[k + 1])
         )) AS d2
  FROM wins a JOIN wins b
    ON a.doc_id = b.doc_id AND abs(a.i - b.i) > {_EXCL}
),
prof AS (
  SELECT doc_id, pos, j, d2,
         row_number() OVER (PARTITION BY doc_id, pos ORDER BY d2, j) AS rn
  FROM pd2
)
"""


def _profile_df(spark):
    seqs = synth.sequences_df(spark, _N_DOCS).withColumn(
        "tokens", F.slice("tokens", 1, _MAXLEN)
    )
    return MP.matrix_profile(seqs, m=_M, excl=_EXCL)


@register(
    "matrix_profile_self",
    oracle=_BRUTE
    + """
    SELECT doc_id, pos::INT AS pos, j::INT AS nn_pos, d2::BIGINT AS d2
    FROM prof WHERE rn = 1
    """,
)
def matrix_profile_self(spark, sf_dir):
    """Full per-position matrix profile of 48 series (~5.8k rows), every
    (nearest-neighbor position, distance) pair hash-checked against the
    brute-force SQL twin."""
    return _profile_df(spark)


@register(
    "matrix_profile_motifs",
    oracle=_BRUTE
    + """
    , mp AS (SELECT doc_id, pos, j, d2 FROM prof WHERE rn = 1),
    ranked AS (
      SELECT doc_id, pos, j, d2,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2, pos)
               AS r_motif,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2 DESC, pos)
               AS r_discord
      FROM mp
    )
    SELECT mo.doc_id,
           mo.pos::INT AS motif_pos, mo.j::INT AS motif_nn,
           mo.d2::BIGINT AS motif_d2,
           di.pos::INT AS discord_pos, di.d2::BIGINT AS discord_d2
    FROM ranked mo
    JOIN ranked di ON mo.doc_id = di.doc_id
    WHERE mo.r_motif = 1 AND di.r_discord = 1
    """,
)
def matrix_profile_motifs(spark, sf_dir):
    """Downstream analytics over the profile: per series the best motif
    pair (global profile argmin; ties -> smallest pos, and its stored
    neighbor) and the top discord (profile argmax — the anomaly
    primitive). One row per doc, fully oracled."""
    mp = _profile_df(spark)
    w_motif = Window.partitionBy("doc_id").orderBy("d2", "pos")
    w_disc = Window.partitionBy("doc_id").orderBy(F.desc("d2"), F.asc("pos"))
    ranked = mp.select(
        "doc_id",
        "pos",
        "nn_pos",
        "d2",
        F.row_number().over(w_motif).alias("r_motif"),
        F.row_number().over(w_disc).alias("r_discord"),
    )
    mo = ranked.where(F.col("r_motif") == 1).select(
        "doc_id",
        F.col("pos").alias("motif_pos"),
        F.col("nn_pos").alias("motif_nn"),
        F.col("d2").alias("motif_d2"),
    )
    di = ranked.where(F.col("r_discord") == 1).select(
        "doc_id",
        F.col("pos").alias("discord_pos"),
        F.col("d2").alias("discord_d2"),
    )
    return mo.join(di, "doc_id")


# ---------------------------------------------------------------------------
# AB-join: contamination screening of the corpus against a "benchmark"
# query set. Two of the four bench series are VERBATIM 24-token slices
# of corpus docs 3 and 7 (planted contamination -> exact d2=0 hits at
# known offsets); the other two are foreign series (docs 200/201, not
# in the corpus). DuckDB re-derives both sides and the full join.
# ---------------------------------------------------------------------------

_D = "doc{:012d}".format
_AB = synth_sql(202) + f"""
, corpusx AS (
  SELECT doc_id, list_slice(tokens, 1, least(n_tok, {_MAXLEN})) AS t
  FROM synth WHERE doc_id <= '{_D(63)}'
),
benchx AS (
  SELECT 'bench_' || doc_id AS q_doc,
         CASE WHEN doc_id IN ('{_D(3)}', '{_D(7)}')
              THEN list_slice(tokens, 18, 41)
              ELSE list_slice(tokens, 1, 24) END AS qt
  FROM synth
  WHERE doc_id IN ('{_D(3)}', '{_D(7)}', '{_D(200)}', '{_D(201)}')
),
cwin AS (
  SELECT doc_id, unnest(range(len(t) - {_M} + 1)) AS i, t FROM corpusx
),
cw AS (SELECT doc_id, i, list_slice(t, i + 1, i + {_M}) AS w FROM cwin),
qwin AS (
  SELECT q_doc, unnest(range(len(qt) - {_M} + 1)) AS j, qt FROM benchx
),
qw AS (SELECT q_doc, j, list_slice(qt, j + 1, j + {_M}) AS w FROM qwin),
abd2 AS (
  SELECT c.doc_id, c.i AS pos, q.q_doc, q.j AS q_pos,
         list_sum(list_transform(range({_M}),
           k -> (c.w[k + 1] - q.w[k + 1]) * (c.w[k + 1] - q.w[k + 1])
         )) AS d2
  FROM cw c CROSS JOIN qw q
),
abprof AS (
  SELECT doc_id, pos, q_doc, q_pos, d2,
         row_number() OVER (PARTITION BY doc_id, pos
                            ORDER BY d2, q_doc, q_pos) AS rn
  FROM abd2
)
"""


def _ab_inputs(spark):
    seqs = synth.sequences_df(spark, 202)
    corpus = seqs.where(F.col("doc_id") <= _D(63)).withColumn(
        "tokens", F.slice("tokens", 1, _MAXLEN)
    )
    bench = seqs.where(
        F.col("doc_id").isin(_D(3), _D(7), _D(200), _D(201))
    ).select(
        F.concat(F.lit("bench_"), F.col("doc_id")).alias("doc_id"),
        F.when(
            F.col("doc_id").isin(_D(3), _D(7)), F.slice("tokens", 18, 24)
        ).otherwise(F.slice("tokens", 1, 24)).alias("tokens"),
    )
    return corpus, bench


@register(
    "mp_ab_profile",
    oracle=_AB
    + """
    SELECT doc_id, pos::INT AS pos, q_doc, q_pos::INT AS q_pos,
           d2::BIGINT AS d2
    FROM abprof WHERE rn = 1
    """,
)
def mp_ab_profile(spark, sf_dir):
    """Full AB-join profile: for all ~7.7k corpus windows, the nearest
    of the 68 benchmark windows, every (neighbor, distance) hash-checked
    against the brute SQL twin (incl. the planted d2=0 runs)."""
    corpus, bench = _ab_inputs(spark)
    return MP.matrix_profile_ab(corpus, bench, m=_M)


@register(
    "contamination_screen",
    oracle=_AB
    + """
    , mp AS (SELECT doc_id, pos, q_doc, q_pos, d2 FROM abprof WHERE rn = 1),
    best AS (
      SELECT doc_id, pos, q_doc, q_pos, d2,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2, pos) AS rb
      FROM mp
    ),
    agg AS (
      SELECT doc_id, count(*) FILTER (WHERE d2 = 0) AS n_exact FROM mp
      GROUP BY doc_id
    )
    SELECT b.doc_id, b.pos::INT AS best_pos, b.q_doc AS best_q_doc,
           b.q_pos::INT AS best_q_pos, b.d2::BIGINT AS best_d2,
           a.n_exact
    FROM best b JOIN agg a ON b.doc_id = a.doc_id
    WHERE b.rb = 1
    """,
)
def contamination_screen(spark, sf_dir):
    """Per-corpus-doc contamination verdict: the globally closest
    benchmark window (docs 3 and 7 must surface their planted verbatim
    slices at d2=0 with 17 exact windows each) plus the count of exact
    m-token overlaps. One row per corpus doc, fully oracled."""
    corpus, bench = _ab_inputs(spark)
    mp = MP.matrix_profile_ab(corpus, bench, m=_M)
    w_best = Window.partitionBy("doc_id").orderBy("d2", "pos")
    best = (
        mp.withColumn("rb", F.row_number().over(w_best))
        .where(F.col("rb") == 1)
        .select(
            "doc_id",
            F.col("pos").alias("best_pos"),
            F.col("q_doc").alias("best_q_doc"),
            F.col("q_pos").alias("best_q_pos"),
            F.col("d2").alias("best_d2"),
        )
    )
    agg = mp.groupBy("doc_id").agg(
        F.sum((F.col("d2") == 0).cast("long")).alias("n_exact")
    )
    return best.join(agg, "doc_id")


# ---------------------------------------------------------------------------
# Z-normalized profile (standard MASS/SCAMP semantics) — real-valued yet
# bit-exact across engines: integer sums feed exactly one sqrt, one
# product, one division, one clip, one affine map per pair, each
# IEEE-754 correctly rounded, and the SQL spells the identical
# expression tree. 32 docs keep the brute twin at ~470k pairs.
# ---------------------------------------------------------------------------

_NZ = 32

_ZBRUTE = synth_sql(_NZ) + f"""
, trunc AS (
  SELECT doc_id,
         list_slice(tokens, 1, least(n_tok, {_MAXLEN})) AS t,
         least(n_tok, {_MAXLEN}) AS n
  FROM synth
),
winx AS (
  SELECT doc_id, unnest(range(n - {_M} + 1)) AS i, t
  FROM trunc
),
wins AS (
  SELECT doc_id, i, list_slice(t, i + 1, i + {_M}) AS w
  FROM winx
),
wstats AS (
  SELECT doc_id, i, w,
         list_sum(w) AS sx,
         list_sum(list_transform(w, x -> x * x)) AS sxx
  FROM wins
),
zd2 AS (
  SELECT a.doc_id, a.i AS pos, b.i AS j,
         16.0 * (1.0 - (
           CASE
             WHEN ({_M} * a.sxx - a.sx * a.sx) > 0
              AND ({_M} * b.sxx - b.sx * b.sx) > 0
             THEN greatest(-1.0, least(1.0,
               ({_M} * list_sum(list_transform(range({_M}),
                  k -> a.w[k + 1] * b.w[k + 1])) - a.sx * b.sx)::DOUBLE
               / (sqrt({_M} * a.sxx - a.sx * a.sx)
                  * sqrt({_M} * b.sxx - b.sx * b.sx))))
             WHEN ({_M} * a.sxx - a.sx * a.sx) = 0
              AND ({_M} * b.sxx - b.sx * b.sx) = 0
             THEN 1.0
             ELSE 0.0
           END)) AS d2
  FROM wstats a JOIN wstats b
    ON a.doc_id = b.doc_id AND abs(a.i - b.i) > {_EXCL}
),
zprof AS (
  SELECT doc_id, pos, j, d2,
         row_number() OVER (PARTITION BY doc_id, pos ORDER BY d2, j) AS rn
  FROM zd2
)
"""


@register(
    "matrix_profile_znorm",
    oracle=_ZBRUTE
    + """
    SELECT doc_id, pos::INT AS pos, j::INT AS nn_pos, d2
    FROM zprof WHERE rn = 1
    """,
)
def matrix_profile_znorm(spark, sf_dir):
    """Z-normalized matrix profile of 32 series — REAL-valued doubles
    hash-matched bit-for-bit against the brute SQL twin (see module
    comment for why no tolerance is needed)."""
    seqs = synth.sequences_df(spark, _NZ).withColumn(
        "tokens", F.slice("tokens", 1, _MAXLEN)
    )
    return MP.matrix_profile_znorm(seqs, m=_M, excl=_EXCL)


@register(
    "corpus_discords",
    oracle=_ZBRUTE
    + """
    , mp AS (SELECT doc_id, pos, d2 FROM zprof WHERE rn = 1),
    disc AS (
      SELECT doc_id, pos, d2,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2 DESC, pos)
               AS rd
      FROM mp
    ),
    topg AS (
      SELECT doc_id, pos, d2,
             row_number() OVER (ORDER BY d2 DESC, doc_id, pos) AS grank
      FROM disc WHERE rd = 1
    )
    SELECT grank::INT AS grank, doc_id, pos::INT AS pos, d2
    FROM topg WHERE grank <= 10
    """,
)
def corpus_discords(spark, sf_dir):
    """Corpus-level anomaly report: each series' top discord (z-norm
    profile argmax — its least-repeated subsequence), globally ranked;
    the 10 most anomalous (doc, pos) sites across the corpus. Fully
    oracled (same IEEE-identical expression tree as
    matrix_profile_znorm)."""
    mp = MP.matrix_profile_znorm(
        synth.sequences_df(spark, _NZ).withColumn(
            "tokens", F.slice("tokens", 1, _MAXLEN)
        ),
        m=_M,
        excl=_EXCL,
    )
    per_doc = (
        mp.withColumn(
            "rd",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("d2"), F.asc("pos"))
            ),
        )
        .where(F.col("rd") == 1)
        .select("doc_id", "pos", "d2")
    )
    return global_topk(
        per_doc,
        [(F.col("d2"), True), (F.col("doc_id"), False), (F.col("pos"), False)],
        10,
        rank_col="grank",
    ).select("grank", "doc_id", "pos", "d2")


@register(
    "corpus_motifs",
    oracle=_ZBRUTE
    + """
    , mpm AS (SELECT doc_id, pos, j, d2 FROM zprof WHERE rn = 1),
    mot AS (
      SELECT doc_id, pos, j, d2,
             row_number() OVER (PARTITION BY doc_id ORDER BY d2, pos)
               AS rm
      FROM mpm
    ),
    topm AS (
      SELECT doc_id, pos, j, d2,
             row_number() OVER (ORDER BY d2, doc_id, pos) AS grank
      FROM mot WHERE rm = 1
    )
    SELECT grank::INT AS grank, doc_id, pos::INT AS pos,
           j::INT AS nn_pos, d2
    FROM topm WHERE grank <= 10
    """,
)
def corpus_motifs(spark, sf_dir):
    """Corpus-level motif report (the twin of corpus_discords): each
    series' top MOTIF site (z-norm profile argmin — its best-repeated
    subsequence) with its nearest-neighbor position, globally ranked;
    the 10 strongest repeats across the corpus. Per-doc reduction
    happens before the tiny global sort (no all-rows global window at
    scale), and every double rides the same IEEE-identical expression
    tree as matrix_profile_znorm, so the ranking is fully
    driver-hashed."""
    mp = MP.matrix_profile_znorm(
        synth.sequences_df(spark, _NZ).withColumn(
            "tokens", F.slice("tokens", 1, _MAXLEN)
        ),
        m=_M,
        excl=_EXCL,
    )
    per_doc = (
        mp.withColumn(
            "rm",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("d2"), F.asc("pos"))
            ),
        )
        .where(F.col("rm") == 1)
        .select("doc_id", "pos", "nn_pos", "d2")
    )
    return global_topk(
        per_doc,
        [(F.col("d2"), False), (F.col("doc_id"), False), (F.col("pos"), False)],
        10,
        rank_col="grank",
    ).select("grank", "doc_id", "pos", "nn_pos", "d2")


# ---------------------------------------------------------------------------
# MP7 — FLUSS regime detection over SPLICED series: a regime-switching
# corpus is constructed in-engine (first 128 tokens of doc 2p followed
# by first 128 of doc 2p+1 — a true generator change at position 128),
# and FLUSS must rediscover the splice. Fully DuckDB-oracled: the
# profile via the exact integer brute twin, arc counts via the
# histogram + partitioned-window prefix sum (#(lo < i) − #(hi ≤ i)),
# CAC via the shared verbatim float tree.
# ---------------------------------------------------------------------------

_NFB = 64  # base docs → ~30 spliced pairs (both halves need n_tok ≥ 128)
_HALF = 128
_FQ = 2 * _HALF - _M + 1  # 249 positions
_ZONE = 5 * _M  # stumpy's excl_factor=5 edge zone

_FLUSS_CAC_SQL = f"""
       CASE WHEN pos < {_ZONE} OR pos > {_FQ} - 1 - {_ZONE}
            THEN CAST(1 AS DOUBLE)
            ELSE CAST(floor(least(CAST(1 AS DOUBLE),
                   CAST(ac AS DOUBLE) /
                     (CAST(2 AS DOUBLE) * CAST(pos AS DOUBLE)
                      * CAST({_FQ} - pos AS DOUBLE) / CAST({_FQ} AS DOUBLE)))
                 * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)
       END"""

_FLUSS_BRUTE = synth_sql(_NFB) + f"""
, fbase AS (
  SELECT doc_id, tokens, CAST(substr(doc_id, 4, 12) AS BIGINT) AS i
  FROM synth WHERE n_tok >= {_HALF}
),
fev AS (
  SELECT i // 2 AS p, doc_id AS pair_id, tokens[1:{_HALF}] AS tl
  FROM fbase WHERE i % 2 = 0
),
fod AS (
  SELECT i // 2 AS p, tokens[1:{_HALF}] AS tr
  FROM fbase WHERE i % 2 = 1
),
sp AS (
  SELECT pair_id, list_concat(tl, tr) AS t FROM fev JOIN fod USING (p)
),
fwinx AS (SELECT pair_id, unnest(range({_FQ})) AS i, t FROM sp),
fwins AS (
  SELECT pair_id, i, list_slice(t, i + 1, i + {_M}) AS w FROM fwinx
),
fpd2 AS (
  SELECT a.pair_id, a.i AS pos, b.i AS j,
         list_sum(list_transform(range({_M}),
           k -> (a.w[k + 1] - b.w[k + 1]) * (a.w[k + 1] - b.w[k + 1])
         )) AS d2
  FROM fwins a JOIN fwins b
    ON a.pair_id = b.pair_id AND abs(a.i - b.i) > {_EXCL}
),
fprof AS (
  SELECT pair_id, pos, j,
         row_number() OVER (PARTITION BY pair_id, pos ORDER BY d2, j) AS rn
  FROM fpd2
),
arcs AS (
  SELECT pair_id, least(pos, j) AS lo, greatest(pos, j) AS hi
  FROM fprof WHERE rn = 1
),
positions AS (SELECT pair_id, unnest(range({_FQ})) AS pos FROM sp),
lo_h AS (SELECT pair_id, lo AS v, count(*) AS c FROM arcs GROUP BY 1, 2),
hi_h AS (SELECT pair_id, hi AS v, count(*) AS c FROM arcs GROUP BY 1, 2),
joined AS (
  SELECT p.pair_id, p.pos,
         coalesce(l.c, 0) AS lc, coalesce(h.c, 0) AS hc
  FROM positions p
  LEFT JOIN lo_h l ON l.pair_id = p.pair_id AND l.v = p.pos
  LEFT JOIN hi_h h ON h.pair_id = p.pair_id AND h.v = p.pos
),
acs AS (
  SELECT pair_id, pos,
         CAST(sum(lc) OVER w - lc - sum(hc) OVER w AS BIGINT) AS ac
  FROM joined
  WINDOW w AS (PARTITION BY pair_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cacs AS (
  SELECT pair_id, pos, ac, {_FLUSS_CAC_SQL} AS cac FROM acs
)
"""


def _spliced_df(spark):
    base = synth.sequences_df(spark, _NFB).select(
        "doc_id",
        "n_tok",
        "tokens",
        F.expr("CAST(substring(doc_id, 4, 12) AS BIGINT)").alias("i"),
    ).where(F.col("n_tok") >= _HALF)
    ev = base.where(F.expr("i % 2 = 0")).select(
        F.expr("i DIV 2").alias("p"),
        F.col("doc_id").alias("pair_id"),
        F.expr(f"slice(tokens, 1, {_HALF})").alias("tl"),
    )
    od = base.where(F.expr("i % 2 = 1")).select(
        F.expr("i DIV 2").alias("p"),
        F.expr(f"slice(tokens, 1, {_HALF})").alias("tr"),
    )
    return ev.join(od, "p").select(
        "pair_id", F.expr("concat(tl, tr)").alias("tokens")
    )


@register(
    "fluss_cac",
    oracle=_FLUSS_BRUTE
    + """
    SELECT pair_id AS doc_id, pos::INT AS pos, ac, cac FROM cacs
    """,
)
def fluss_cac(spark, sf_dir):
    """MP7a: the full FLUSS corrected arc curve of every spliced series
    (~30 pairs × 249 positions), bit-exact vs the SQL twin — profile,
    arc prefix-sum, AND the parabola-normalized float all hash-match.
    Spark side is the production zero-shuffle mapInPandas kernel."""
    return MP.fluss(_spliced_df(spark), m=_M, excl=_EXCL, id_col="pair_id")


@register(
    "fluss_regimes",
    oracle=_FLUSS_BRUTE
    + f"""
    , best AS (
      SELECT pair_id, pos, ac, cac,
             row_number() OVER (PARTITION BY pair_id ORDER BY cac, pos) AS rn
      FROM cacs
    )
    SELECT pair_id AS doc_id, pos::INT AS boundary, ac, cac AS cac_min,
           (pos >= {_HALF} - 2 * _M_SENTINEL_ AND pos <= {_HALF} + 2 * _M_SENTINEL_)
             AS near_splice
    FROM best WHERE rn = 1
    """.replace("_M_SENTINEL_", str(_M)),
)
def fluss_regimes(spark, sf_dir):
    """MP7b: the regime boundary per spliced series = global CAC
    argmin (ties to the smallest position), with ``near_splice``
    flagging recovery of the planted generator change at 128 (± 2m —
    windows straddling the splice start at 121). The detection-rate
    floor lives in pytest; the oracle pins every boundary choice
    bit-exactly."""
    out = MP.fluss(_spliced_df(spark), m=_M, excl=_EXCL, id_col="pair_id")
    w = Window.partitionBy("doc_id").orderBy(F.asc("cac"), F.asc("pos"))
    best = out.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return best.select(
        "doc_id",
        F.col("pos").alias("boundary"),
        "ac",
        F.col("cac").alias("cac_min"),
        (
            (F.col("pos") >= _HALF - 2 * _M) & (F.col("pos") <= _HALF + 2 * _M)
        ).alias("near_splice"),
    )
