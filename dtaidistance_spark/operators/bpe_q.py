"""Distributed BPE tokenizer training (T53), round-3 batch: the merge-
learning loop of byte-pair encoding (Sennrich et al. 2016; byte-level
per GPT-2) run as pure relational algebra over the token table — the
canonical "train the tokenizer on the corpus you curated" step of an
LLM data pipeline. The corpus is folded to a 16-symbol alphabet
(token % 16) so the near-uniform synthetic ramp still yields DENSE
adjacent-pair statistics (winning counts ~1e3, like real subword
corpora) instead of degenerate count-2 ties — and minted ids can win
later rounds, the hierarchical behavior that makes BPE BPE.

Each round: (1) adjacent-pair counts — one lead() window per doc + ONE
map-side-combined (a, b) aggregate; (2) the winner pair by
``ORDER BY cnt DESC, a, b LIMIT 1`` (TakeOrderedAndProject, broadcast
back — NO driver collect anywhere); (3) leftmost-non-overlapping merge
application, relationally: a match can overlap its neighbor ONLY in
runs of a repeated token (a = b), so greedy-leftmost selection is the
classic gaps-and-islands parity rule — island id = i − cum(matches),
select matches at even offset from their island's first match, drop
the position AFTER each selected match, renumber with a partitioned
row_number. Every window is partitioned by doc_id; everything is
int64; the learned merge table is therefore BIT-EXACT — the DuckDB
oracle unrolls the identical K stages and hash-matches both the merge
table and the compression accounting.

Scale notes: K rounds cost K bounded passes over the corpus (the
honest price of exact distributed BPE — production trains on a
bounded sample, which is this same plan behind one md5-bucket filter);
per-round state is ONE broadcast row. Each round's positions table is
persisted so round r+1 reads a materialization, not an r-deep
recompute chain.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 256  # docs
_K = 6  # merge rounds
_NID0 = 100001  # first minted token id (corpus vocab < 50257)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


# ---------------------------------------------------------------------------
# the unrolled SQL twin
# ---------------------------------------------------------------------------


def _stage_sql(r: int) -> str:
    nid = _NID0 + r
    return f"""
, cnt_{r} AS (
  SELECT a, b, count(*) AS cnt FROM (
    SELECT v AS a,
           lead(v) OVER (PARTITION BY doc_id ORDER BY i) AS b
    FROM pos_{r}
  ) WHERE b IS NOT NULL GROUP BY a, b
),
win_{r} AS MATERIALIZED (
  SELECT a, b, cnt FROM cnt_{r} ORDER BY cnt DESC, a, b LIMIT 1),
m_{r} AS (
  SELECT p.doc_id, p.source, p.i, p.v,
         CASE WHEN p.v = w.a
                   AND lead(p.v) OVER (PARTITION BY p.doc_id ORDER BY p.i)
                       = w.b
              THEN 1 ELSE 0 END AS mt
  FROM pos_{r} p, win_{r} w
),
c_{r} AS (
  SELECT *, i - sum(mt) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM m_{r}
),
s_{r} AS (
  SELECT *, CASE WHEN mt = 1
                      AND (i - min(CASE WHEN mt = 1 THEN i END)
                           OVER (PARTITION BY doc_id, isl)) % 2 = 0
                 THEN 1 ELSE 0 END AS sel
  FROM c_{r}
),
k_{r} AS (
  SELECT *, coalesce(lag(sel) OVER (PARTITION BY doc_id ORDER BY i), 0)
              AS consumed
  FROM s_{r}
),
pos_{r + 1} AS MATERIALIZED (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS i,
         CASE WHEN sel = 1 THEN CAST({nid} AS BIGINT) ELSE v END AS v
  FROM k_{r} WHERE consumed = 0
)"""


def _bpe_sql_prefix(k: int = _K) -> str:
    head = (
        synth_sql(_N)
        + """
, pos_0 AS MATERIALIZED (
  SELECT doc_id, source, t.j AS i,
         CAST(tokens[t.j + 1] % 16 AS BIGINT) AS v
  FROM synth, unnest(range(n_tok)) AS t(j)
)"""
    )
    return head + "".join(_stage_sql(r) for r in range(k))


_BPE_MERGES_TAIL = "\nUNION ALL\n".join(
    f"SELECT {r + 1} AS round, a, b, cnt,"
    f" CAST({_NID0 + r} AS BIGINT) AS new_id FROM win_{r}"
    for r in range(_K)
)

_BPE_STATS_TAIL = f"""
, fin AS (SELECT doc_id, source, count(*) AS n_after FROM pos_{_K}
          GROUP BY doc_id, source),
orig AS (SELECT doc_id, count(*) AS n_before FROM pos_0 GROUP BY doc_id)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_before) AS BIGINT) AS tok_before,
       CAST(sum(n_after) AS BIGINT) AS tok_after,
       {_F6.format(
           x="(CAST(sum(n_after) AS DOUBLE) / CAST(sum(n_before) AS DOUBLE))"
       )} AS ratio
FROM fin JOIN orig USING (doc_id) GROUP BY source
"""


# ---------------------------------------------------------------------------
# the Spark pipeline — the SAME relational plan, round by round
# ---------------------------------------------------------------------------


def _bpe_rounds(spark, k: int = _K):
    """Returns (list of 1-row winner DFs, final positions DF, pos_0 DF).
    Every window is partitioned by doc_id; the per-round learned state
    is one broadcast row; each round's positions are persisted."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "source", "tokens")
    pos = docs.select(
        "doc_id",
        "source",
        F.posexplode("tokens").alias("i", "v"),
    ).withColumn("v", (F.col("v") % 16).cast("long")).persist()
    pos0 = pos
    winners, pos = _train_loop(pos, k)
    return winners, pos, pos0


def _apply_merge(pos, win, nid: int):
    """One island-parity merge pass: replace every leftmost-non-
    overlapping (a, b) adjacency (from the broadcast 1-row `win`) with
    `nid` and renumber. Shared by training (round r's own winner) and
    held-out encoding (a trained merge table applied to unseen docs)."""
    wd = Window.partitionBy("doc_id").orderBy("i")
    m = pos.crossJoin(F.broadcast(win.select("a", "b"))).withColumn(
            "mt",
            F.when(
                (F.col("v") == F.col("a"))
                & (F.lead("v").over(wd) == F.col("b")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    c = m.withColumn(
        "isl",
        F.col("i")
        - F.sum("mt").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wi = Window.partitionBy("doc_id", "isl")
    s = c.withColumn(
        "sel",
        F.when(
            (F.col("mt") == 1)
            & (
                (
                    F.col("i")
                    - F.min(F.when(F.col("mt") == 1, F.col("i"))).over(wi)
                )
                % 2
                == 0
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    kdf = s.withColumn(
        "consumed", F.coalesce(F.lag("sel").over(wd), F.lit(0))
    )
    return (
        kdf.where(F.col("consumed") == 0)
        .withColumn(
            "v",
            F.when(F.col("sel") == 1, F.lit(nid).cast("long")).otherwise(
                F.col("v")
            ),
        )
        .withColumn("i", F.row_number().over(wd) - F.lit(1))
        .select("doc_id", "source", "i", "v")
    )


def _train_loop(pos, k: int):
    wd = Window.partitionBy("doc_id").orderBy("i")
    winners = []
    for r in range(k):
        prs = pos.withColumn("b", F.lead("v").over(wd))
        cnt = (
            prs.where(F.col("b").isNotNull())
            .groupBy(F.col("v").alias("a"), "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        win = cnt.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1)
        winners.append(win)
        pos = _apply_merge(pos, win, _NID0 + r).persist()
    return winners, pos


@register("bpe_train_merges", oracle=_bpe_sql_prefix() + _BPE_MERGES_TAIL)
def bpe_train_merges(spark, sf_dir):
    """T53a: the learned BPE merge table — K = 6 rounds of (winning
    adjacent pair, its count, the minted token id), bit-exact vs the
    unrolled SQL twin. Ties break to the smallest (a, b); overlap
    resolution is greedy-leftmost via the island-parity rule."""
    winners, _, _ = _bpe_rounds(spark)
    outs = [
        w.select(
            F.lit(r + 1).alias("round"),
            "a",
            "b",
            "cnt",
            F.lit(_NID0 + r).cast("long").alias("new_id"),
        )
        for r, w in enumerate(winners)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


@register("bpe_apply_stats", oracle=_bpe_sql_prefix() + _BPE_STATS_TAIL)
def bpe_apply_stats(spark, sf_dir):
    """T53b: compression accounting after applying all K learned
    merges — per source: docs, tokens before/after, after/before ratio
    (floor-1e6). Every merged occurrence removes exactly one position,
    so tok_before − tok_after = Σ applied merges; the oracle recomputes
    the whole K-round pipeline independently."""
    _, fin, pos0 = _bpe_rounds(spark)
    after = fin.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    before = pos0.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_before"))
    return (
        after.join(before, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_before").cast("long").alias("tok_before"),
            F.sum("n_after").cast("long").alias("tok_after"),
        )
        .withColumn(
            "ratio",
            F.expr(
                _F6.format(
                    x=(
                        "(CAST(tok_after AS DOUBLE)"
                        " / CAST(tok_before AS DOUBLE))"
                    )
                )
            ),
        )
    )


# ---------------------------------------------------------------------------
# T53c — the train -> encode contract: the merge table learned on docs
# 0..255 applied to HELD-OUT docs 256..383, encoded streams pinned by
# md5 (bit-exact tokenizer application, the artifact a pipeline ships)
# ---------------------------------------------------------------------------

_NE = 384  # train = idx < 256, eval = idx in [256, 384)


def _estage_sql(r: int) -> str:
    nid = _NID0 + r
    return f"""
, em_{r} AS (
  SELECT p.doc_id, p.source, p.i, p.v,
         CASE WHEN p.v = w.a
                   AND lead(p.v) OVER (PARTITION BY p.doc_id ORDER BY p.i)
                       = w.b
              THEN 1 ELSE 0 END AS mt
  FROM epos_{r} p, win_{r} w
),
ec_{r} AS (
  SELECT *, i - sum(mt) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM em_{r}
),
es_{r} AS (
  SELECT *, CASE WHEN mt = 1
                      AND (i - min(CASE WHEN mt = 1 THEN i END)
                           OVER (PARTITION BY doc_id, isl)) % 2 = 0
                 THEN 1 ELSE 0 END AS sel
  FROM ec_{r}
),
ek_{r} AS (
  SELECT *, coalesce(lag(sel) OVER (PARTITION BY doc_id ORDER BY i), 0)
              AS consumed
  FROM es_{r}
),
epos_{r + 1} AS MATERIALIZED (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS i,
         CASE WHEN sel = 1 THEN CAST({nid} AS BIGINT) ELSE v END AS v
  FROM ek_{r} WHERE consumed = 0
)"""


def _bpe_holdout_oracle(k: int = _K) -> str:
    head = (
        synth_sql(_NE)
        + """
, idxd AS (
  SELECT *, CAST(substr(doc_id, 4, 12) AS BIGINT) AS di FROM synth
),
pos_0 AS MATERIALIZED (
  SELECT doc_id, source, t.j AS i,
         CAST(tokens[t.j + 1] % 16 AS BIGINT) AS v
  FROM idxd, unnest(range(n_tok)) AS t(j) WHERE di < 256
),
epos_0 AS MATERIALIZED (
  SELECT doc_id, source, t.j AS i,
         CAST(tokens[t.j + 1] % 16 AS BIGINT) AS v
  FROM idxd, unnest(range(n_tok)) AS t(j) WHERE di >= 256
)"""
    )
    stages = "".join(_stage_sql(r) + _estage_sql(r) for r in range(k))
    tail = f"""
, eb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_before
         FROM epos_0 GROUP BY doc_id),
ea AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_after,
              md5(string_agg(v::VARCHAR, ',' ORDER BY i)) AS enc_md5
       FROM epos_{k} GROUP BY doc_id)
SELECT doc_id, n_before, n_after, enc_md5 FROM eb JOIN ea USING (doc_id)
"""
    return head + stages + tail


@register("bpe_encode_holdout", oracle=_bpe_holdout_oracle())
def bpe_encode_holdout(spark, sf_dir):
    """T53c: the trained tokenizer APPLIED — the merge table learned on
    docs 0..255 encodes 128 held-out docs, and every encoded stream is
    pinned by md5 (bit-exact application, not just counts). Same
    island-parity passes as training, with each round's winner arriving
    as a broadcast row; the unrolled SQL twin re-learns AND re-applies
    independently. This is the train/apply split a production pipeline
    ships: the learned artifact is 6 rows, the application is 6 bounded
    passes over any corpus."""
    winners, _, _ = _bpe_rounds(spark)
    docs = synth.sequences_df(spark, _NE).select(
        "doc_id",
        "source",
        "tokens",
        F.expr("CAST(substring(doc_id, 4, 12) AS BIGINT)").alias("di"),
    )
    epos = (
        docs.where(F.col("di") >= 256)
        .select("doc_id", "source", F.posexplode("tokens").alias("i", "v"))
        .withColumn("v", (F.col("v") % 16).cast("long"))
        .persist()
    )
    eb = epos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    cur = epos
    for r, win in enumerate(winners):
        cur = _apply_merge(cur, win, _NID0 + r).persist()
    ea = cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.md5(
            F.expr(
                "concat_ws(',', transform(array_sort(collect_list("
                "struct(i, v))), s -> CAST(s.v AS STRING)))"
            ).cast("binary")
        ).alias("enc_md5"),
    )
    return eb.join(ea, "doc_id")
