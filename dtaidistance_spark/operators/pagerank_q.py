"""T60 — TextRank: weighted PageRank over the token co-occurrence
graph (Mihalcea & Tarau EMNLP'04; Page et al.'99) — the classic
graph-centrality keyword/importance scorer, here over the fold-256
bigram transition graph of the corpus (nodes = token folds, edge
weight = bigram count), the same graph T57's KN model reads.

Determinism design — float PageRank cannot be bit-exact across engines
(per-node Σ of float contributions races on order), so scores live in
INTEGER micro-units summing to T = 10¹²:

    pr₀(v)   = T div 256
    pr_{k+1}(b) = R + Σ_a  ⌊ pr_k(a) · c(a,b) · 17 / (20 · W(a)) ⌋

with damping 17/20 = 0.85 exactly, teleport R = 3·T div (20·256), and
W(a) = Σ_b c(a,b).  Every contribution is an int64 floor division
(max pr·c·17 ≈ 5.1e18 < 2⁶³ — the scale T is chosen against this
bound), and int64 addition is order-free, so K = 8 iterations are
bit-identical in Spark and in the DuckDB oracle's 8 unrolled
MATERIALIZED stages (the BPE-unroll precedent).  Floor remainders +
dangling-node leak make total mass mildly sub-T — deterministic, and
bounded in pytest.

Scale shape: the corpus crosses the wire once (the bigram count);
every iteration is edges ⋈ broadcast(pr) + one map-side-combined
groupBy(b) sum + the dense-axis left join — the standard distributed
PageRank round with a 256-row state table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_NB = 256  # docs
_MOD = 256  # folds / nodes
_T = 10**12
_K = 8
_R = 3 * _T // (20 * _MOD)

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# Spark integer division is DIV (/ would go through DOUBLE and lose
# exactness above 2^53); DuckDB spells it // in the oracle SQL
_CONTRIB = "(pr * c * 17) DIV (20 * w_out)"


def _duck_sql() -> str:
    stages = []
    for k in range(1, _K + 1):
        stages.append(
            f"""
    pr{k} AS MATERIALIZED (
      SELECT ax.fold,
             CAST({_R} AS BIGINT) + coalesce(s.contrib, 0) AS pr
      FROM axis ax LEFT JOIN (
        SELECT e.b AS fold,
               CAST(sum((p.pr * e.c * 17) // (20 * l.w_out))
                 AS BIGINT) AS contrib
        FROM edges e
        JOIN pr{k - 1} p ON p.fold = e.a
        JOIN lft l ON l.a = e.a
        GROUP BY e.b
      ) s ON s.fold = ax.fold
    )"""
        )
    return (
        synth_sql(_NB)
        + f"""
    , pos AS (
      SELECT doc_id, unnest(list_transform(range(n_tok - 1), i ->
        [CAST(tokens[i + 1] % {_MOD} AS BIGINT),
         CAST(tokens[i + 2] % {_MOD} AS BIGINT)])) AS pr2
      FROM synth
    ),
    edges AS (
      SELECT pr2[1] AS a, pr2[2] AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM pos GROUP BY 1, 2
    ),
    lft AS (
      SELECT a, CAST(sum(c) AS BIGINT) AS w_out FROM edges GROUP BY a
    ),
    rgt AS (
      SELECT b, CAST(sum(c) AS BIGINT) AS w_in FROM edges GROUP BY b
    ),
    axis AS (SELECT unnest(range({_MOD})) AS fold),
    pr0 AS (
      SELECT fold, CAST({_T // _MOD} AS BIGINT) AS pr FROM axis
    ),{",".join(stages)}
    SELECT ax.fold,
           coalesce(l.w_out, 0) AS w_out,
           coalesce(r.w_in, 0) AS w_in,
           p.pr AS pr_final,
           {_FLOOR6.format(
               x=f"CAST(p.pr AS DOUBLE) / CAST({_T} AS DOUBLE)")}
             AS pr_share
    FROM axis ax
    JOIN pr{_K} p ON p.fold = ax.fold
    LEFT JOIN lft l ON l.a = ax.fold
    LEFT JOIN rgt r ON r.b = ax.fold
    """
    )


@register("token_pagerank", oracle=_duck_sql())
def token_pagerank(spark, sf_dir):
    """T60: integer-exact weighted PageRank over the fold-256 bigram
    graph (module header) — K = 8 rounds of edges ⋈ broadcast(pr),
    int64 floor-division contributions (order-free sums ⇒ bit-exact),
    damping 17/20, dense-axis teleport.  The corpus crosses the wire
    once; each round moves only the 256-row state."""
    docs = synth.sequences_df(spark, _NB).select("doc_id", "n_tok", "tokens")
    bg = docs.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, n_tok - 2), i -> array("
                f"CAST(element_at(tokens, i + 1) % {_MOD} AS BIGINT),"
                f"CAST(element_at(tokens, i + 2) % {_MOD} AS BIGINT)))"
            )
        ).alias("pr2")
    ).select(
        F.expr("element_at(pr2, 1)").alias("a"),
        F.expr("element_at(pr2, 2)").alias("b"),
    )
    edges = bg.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lft = edges.groupBy("a").agg(F.sum("c").cast("long").alias("w_out"))
    rgt = edges.groupBy("b").agg(F.sum("c").cast("long").alias("w_in"))
    ew = edges.join(lft, "a").persist()
    axis = spark.range(_MOD).select(F.col("id").cast("long").alias("fold"))
    pr = axis.select(
        "fold", F.lit(_T // _MOD).cast("long").alias("pr")
    )
    for _ in range(_K):
        contrib = (
            ew.join(
                F.broadcast(pr.withColumnRenamed("fold", "a")), "a"
            )
            .select(
                F.col("b").alias("fold"),
                F.expr(_CONTRIB).cast("long").alias("part"),
            )
            .groupBy("fold")
            .agg(F.sum("part").cast("long").alias("contrib"))
        )
        pr = axis.join(F.broadcast(contrib), "fold", "left").select(
            "fold",
            (
                F.lit(_R).cast("long")
                + F.coalesce("contrib", F.lit(0))
            )
            .cast("long")
            .alias("pr"),
        )
    return (
        axis.join(F.broadcast(pr), "fold")
        .join(
            F.broadcast(lft.withColumnRenamed("a", "fold")),
            "fold",
            "left",
        )
        .join(
            F.broadcast(rgt.withColumnRenamed("b", "fold")),
            "fold",
            "left",
        )
        .select(
            "fold",
            F.coalesce("w_out", F.lit(0)).cast("long").alias("w_out"),
            F.coalesce("w_in", F.lit(0)).cast("long").alias("w_in"),
            F.col("pr").alias("pr_final"),
            F.expr(
                _FLOOR6.format(
                    x=f"CAST(pr AS DOUBLE) / CAST({_T} AS DOUBLE)"
                )
            ).alias("pr_share"),
        )
    )
