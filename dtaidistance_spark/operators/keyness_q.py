"""T79/T80 — corpus-linguistics staples over the documents table:

T79 ``dunning_keyness``: Dunning log-likelihood (G²) keyness per
(source, word) — THE standard "what words characterize this source"
statistic (Dunning CL'93; the AntConc/WordSmith keyword default,
preferred over χ² exactly because expected counts get small).  Full
2×2 form over [word∈source, word∈rest; other∈source, other∈rest]:
G² = 2·Σ O·ln(O/E) with the 0·ln(0) = 0 convention, signed by
over/under-use.  Top-5 per source by a PARTITIONED window (rank over
the shared unfloored G² tree + word tiebreak — deterministic in both
engines, no partition-less WindowExec).

Scale shape: one explode→(source, word) map-side-combined aggregate
is the only fact-sized shuffle; word totals, source totals, and the
grand total are vocabulary-/source-sized and BROADCAST back onto the
counts.  At 100 TB the vocabulary side stays small (type counts grow
~Heaps √N), so the plan holds.

T80 ``lexical_diversity``: Yule's K, Simpson's D, type-token ratio,
and hapax count per document (Yule'44; Simpson Nature'49) — the
repetitiveness dials a curation pipeline reads next to T13's quality
score.  K = 10⁴·(Σc² − N)/N², D = Σc(c−1)/(N(N−1)), both EXACT
int64 until one final divide (c ≤ N ≤ doc length, no overflow);
f6-floored.  Two shuffles: explode→(doc, word) counts, then the
per-doc rollup (map-side combinable).

Honest (gated) readings: the synthetic corpus has a 31-word
vocabulary shared by every source, so keyness G² values are MODEST
(no source owns a word exclusively) yet nonzero — the mix genuinely
differs; and with ~31 types a 100+-token doc is massively repetitive:
TTR is tiny, K is large (uniform-31 baseline ≈ 10⁴/31 ≈ 320).  The
gates pin both measured bands.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_TOPK = 5


def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


def _oln(o: str, e: str) -> str:
    """O·ln(O/E) with the 0·ln(0) = 0 convention."""
    return (
        f"(CASE WHEN {o} > 0 THEN {_d(o)} * ln({_d(o)} / ({e}))"
        " ELSE CAST(0 AS DOUBLE) END)"
    )


# 2×2 cells from (a = count in source, stot, tot, n):
#   b = tot − a  (word in rest), c = stot − a, d = n − stot − b
_EA = f"({_d('stot')} * {_d('tot')} / {_d('n')})"
_EB = f"(({_d('n')} - {_d('stot')}) * {_d('tot')} / {_d('n')})"
_EC = f"({_d('stot')} * ({_d('n')} - {_d('tot')}) / {_d('n')})"
_ED = f"(({_d('n')} - {_d('stot')}) * ({_d('n')} - {_d('tot')}) / {_d('n')})"
_G2 = (
    "(2.0 * ("
    + " + ".join(
        [
            _oln("a", _EA),
            _oln("tot - a", _EB),
            _oln("stot - a", _EC),
            _oln("n - stot - (tot - a)", _ED),
        ]
    )
    + "))"
)
_OVER = (
    f"CAST(CASE WHEN {_d('a')} * {_d('n')} > {_d('stot')} * {_d('tot')}"
    " THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "dunning_keyness",
    oracle=f"""
    WITH words AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    sw AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS a
      FROM words GROUP BY source, word
    ),
    wt AS (SELECT word, CAST(sum(a) AS BIGINT) AS tot FROM sw GROUP BY word),
    st AS (SELECT source, CAST(sum(a) AS BIGINT) AS stot FROM sw GROUP BY source),
    g AS (
      SELECT sw.source, sw.word, sw.a, st.stot, wt.tot,
             (SELECT CAST(sum(a) AS BIGINT) FROM sw) AS n
      FROM sw JOIN wt USING (word) JOIN st USING (source)
    ),
    scored AS (
      SELECT source, word, a, stot, tot, n, {_G2} AS g2_raw, {_OVER} AS overused,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_G2} DESC, word ASC) AS rnk
      FROM g
    )
    SELECT source, word, a, stot, tot, n,
           {_F6.format(x="g2_raw")} AS g2, overused,
           CAST(rnk AS BIGINT) AS rnk
    FROM scored WHERE rnk <= {_TOPK}
    """,
)
def dunning_keyness(spark, sf_dir):
    """T79: Dunning G² keyness, top-5 per source (module header) —
    one fact-sized shuffle, broadcast vocabulary/source totals,
    partitioned window only."""
    from pyspark.sql import Window

    words = T(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    sw = words.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    wt = sw.groupBy("word").agg(F.sum("a").cast("long").alias("tot"))
    st = sw.groupBy("source").agg(F.sum("a").cast("long").alias("stot"))
    n1 = sw.agg(F.sum("a").cast("long").alias("n"))
    g = (
        sw.join(F.broadcast(wt), "word")
        .join(F.broadcast(st), "source")
        .join(F.broadcast(n1))
    )
    w = Window.partitionBy("source").orderBy(
        F.expr(_G2).desc(), F.col("word").asc()
    )
    scored = g.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= _TOPK
    )
    return scored.selectExpr(
        "source",
        "word",
        "a",
        "stot",
        "tot",
        "n",
        f"{_F6.format(x=_G2)} AS g2",
        f"{_OVER} AS overused",
        "CAST(rnk AS BIGINT) AS rnk",
    )


_K = (
    f"(10000.0 * ({_d('sc2')} - {_d('nt')}) / ({_d('nt')} * {_d('nt')}))"
)
_SIMP = f"({_d('scc1')} / ({_d('nt')} * ({_d('nt')} - 1.0)))"
_TTR = f"({_d('vt')} / {_d('nt')})"
_LGUARD = "nt >= 2"


@register(
    "lexical_diversity",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    dw AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS c
      FROM words GROUP BY doc_id, word
    ),
    per AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS vt,
             CAST(sum(c * c) AS BIGINT) AS sc2,
             CAST(sum(c * (c - 1)) AS BIGINT) AS scc1,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
      FROM dw GROUP BY doc_id
    )
    SELECT doc_id, nt, vt, sc2, scc1, hapax,
           CASE WHEN {_LGUARD} THEN {_F6.format(x=_K)}
                ELSE CAST(NULL AS DOUBLE) END AS yule_k,
           CASE WHEN {_LGUARD} THEN {_F6.format(x=_SIMP)}
                ELSE CAST(NULL AS DOUBLE) END AS simpson_d,
           CASE WHEN {_LGUARD} THEN {_F6.format(x=_TTR)}
                ELSE CAST(NULL AS DOUBLE) END AS ttr
    FROM per
    """,
)
def lexical_diversity(spark, sf_dir):
    """T80: Yule's K / Simpson's D / TTR / hapax per document
    (module header) — exact int64 repeat-structure sums, one final
    divide each, floor-1e6."""
    words = T(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    dw = words.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = dw.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("nt"),
        F.count(F.lit(1)).cast("long").alias("vt"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("scc1"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
    )
    return per.selectExpr(
        "doc_id",
        "nt",
        "vt",
        "sc2",
        "scc1",
        "hapax",
        f"CASE WHEN {_LGUARD} THEN {_F6.format(x=_K)}"
        " ELSE CAST(NULL AS DOUBLE) END AS yule_k",
        f"CASE WHEN {_LGUARD} THEN {_F6.format(x=_SIMP)}"
        " ELSE CAST(NULL AS DOUBLE) END AS simpson_d",
        f"CASE WHEN {_LGUARD} THEN {_F6.format(x=_TTR)}"
        " ELSE CAST(NULL AS DOUBLE) END AS ttr",
    )
