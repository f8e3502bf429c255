"""Distributed-sketch and sampling operators, round 2: Count-Min
heavy hitters, deterministic stratified sampling, bigram PMI — all
pure JVM SQL, all fully DuckDB-oracled.

The Count-Min sketch uses the same portable-hash-twin trick as the
Bloom dedup operator: bucket indexes come from md5 (computable
identically in Spark SQL and DuckDB), so the oracle REBUILDS the
identical 4x256 counter array and recomputes the exact same estimates
— the sketch itself is hash-verified, not just its invariants. The
sketch is a sum-merge of per-partition counts (map-side combinable,
associative — the tree-aggregate shape), which is what makes it a
single-shuffle operator at any scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.qutil import global_topk

_D = 4      # CMS depth (hash rows)
_W = 256    # CMS width (counters per row)
_TOPK = 20


def _bucket_expr(i: int, tok: str) -> str:
    """Portable md5 bucket: first 8 hex chars -> uint32 -> % width.
    Spark: conv(...,16,10) returns a decimal STRING -> cast; DuckDB:
    ('0x' || substr)::BIGINT. Both nonnegative, same modulus."""
    return (
        f"pmod(cast(conv(substr(md5(concat('{i}:', {tok})), 1, 8), 16, 10) "
        f"AS BIGINT), {_W})"
    )


def _bucket_sql(i: int, tok: str) -> str:
    return f"((('0x' || substr(md5('{i}:' || {tok}), 1, 8))::BIGINT % {_W} + {_W}) % {_W})"


_CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
exact AS (
  SELECT t, count(*) AS true_cnt FROM tok GROUP BY t
),
top AS (
  SELECT t, true_cnt,
         row_number() OVER (ORDER BY true_cnt DESC, t) AS rnk
  FROM exact QUALIFY rnk <= {_TOPK}
),
sketch AS (
  {" UNION ALL ".join(
      f"SELECT {i} AS row_i, {_bucket_sql(i, 't')} AS bucket, "
      f"count(*) AS cnt FROM tok GROUP BY 1, 2"
      for i in range(_D)
  )}
),
est AS (
  SELECT top.t, top.true_cnt, top.rnk, min(sketch.cnt) AS cms_est
  FROM top JOIN sketch
    ON sketch.row_i = 0 AND sketch.bucket = {_bucket_sql(0, "top.t")}
    OR sketch.row_i = 1 AND sketch.bucket = {_bucket_sql(1, "top.t")}
    OR sketch.row_i = 2 AND sketch.bucket = {_bucket_sql(2, "top.t")}
    OR sketch.row_i = 3 AND sketch.bucket = {_bucket_sql(3, "top.t")}
  GROUP BY 1, 2, 3
)
SELECT t AS tok, true_cnt, rnk AS rank, cms_est,
       cms_est >= true_cnt AS no_underestimate
FROM est
"""


@register("cms_heavy_hitters", oracle=_CMS_ORACLE)
def cms_heavy_hitters(spark, sf_dir):
    """T27: Count-Min sketch (Cormode/Muthukrishnan 2005) heavy
    hitters: a 4x256 counter array built as ONE map-side-combined
    (row, bucket) count aggregate over the exploded corpus — the
    per-partition sketches merge by addition, the classic distributed
    sketch. The top-20 exact tokens are then estimated from the sketch
    (min over the 4 hashed counters) and the CMS no-underestimate
    theorem is surfaced as a column. md5 bucket twins let DuckDB
    rebuild the IDENTICAL sketch, so the estimates themselves
    hash-match, not just the invariant."""
    tok = T(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    )
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("true_cnt"))
    top = global_topk(
        exact,
        [(F.col("true_cnt"), True), (F.col("t"), False)],
        _TOPK,
    )
    # sketch: explode each token into its _D (row, bucket) cells, one
    # hash aggregate — partial counts ARE the per-partition sketches
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.expr(_bucket_expr(i, "t")).alias("bucket"),
                    )
                    for i in range(_D)
                ]
            )
        ).alias("c")
    ).select("c.row_i", "c.bucket")
    sketch = cells.groupBy("row_i", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # estimate: join the candidate's _D buckets against the sketch
    probes = top.select(
        "t",
        "true_cnt",
        "rank",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.expr(_bucket_expr(i, "t")).alias("bucket"),
                    )
                    for i in range(_D)
                ]
            )
        ).alias("p"),
    ).select("t", "true_cnt", "rank", "p.row_i", "p.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("t", "true_cnt", "rank")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        F.col("t").alias("tok"),
        "true_cnt",
        "rank",
        "cms_est",
        (F.col("cms_est") >= F.col("true_cnt")).alias("no_underestimate"),
    )


@register(
    "stratified_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id
             ) AS rnk
      FROM documents
    )
    SELECT doc_id, source, rnk AS rank FROM r WHERE rnk <= 25
    """,
)
def stratified_sample(spark, sf_dir):
    """T28: deterministic stratified sampling — exactly k=25 documents
    per source, chosen by md5 hash rank. Unlike ``randomSplit``/
    ``sample`` this is idempotent across retries, partitionings, and
    corpus APPENDS that don't touch the hash order's winners — the
    right way to pin eval slices at 100 TB (same argument as
    train_split_assign / domain_mixing_sample, but exact-k per
    stratum). One window sort per stratum; no Python."""
    docs = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 25)
        .select("doc_id", "source", "rank")
    )


@register(
    "token_pmi",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(ws)),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM d
    ),
    bc AS (SELECT bigram, count(*) AS n_ab FROM bg GROUP BY bigram),
    un AS (
      SELECT unnest(ws) AS t FROM d
    ),
    uc AS (SELECT t, count(*) AS n FROM un GROUP BY t),
    tot AS (
      SELECT (SELECT count(*) FROM un) AS n_tok,
             (SELECT count(*) FROM bg) AS n_bg
    ),
    pmi AS (
      SELECT bc.bigram, bc.n_ab,
             round(ln(
               (bc.n_ab::DOUBLE / tot.n_bg)
               / ((a.n::DOUBLE / tot.n_tok) * (b.n::DOUBLE / tot.n_tok))
             ), 6) AS pmi
      FROM bc
      JOIN uc a ON a.t = string_split(bc.bigram, ' ')[1]
      JOIN uc b ON b.t = string_split(bc.bigram, ' ')[2]
      CROSS JOIN tot
      WHERE bc.n_ab >= 5
    )
    SELECT bigram, n_ab, pmi,
           row_number() OVER (ORDER BY pmi DESC, bigram)::INT AS rank
    FROM pmi QUALIFY rank <= 30
    """,
)
def token_pmi(spark, sf_dir):
    """T29: bigram pointwise mutual information (collocation mining /
    tokenizer-merge scoring): bigram counts via a JVM transform+explode
    (the decontaminate gram pattern), unigram counts broadcast onto the
    bigram stream, PMI = ln(p(ab) / (p(a)p(b))) rounded(6) both sides
    (libm ln ulps), min support 5, top 30. Two explode aggregates and
    two broadcast joins — no Python, no N² anywhere."""
    docs = T(spark, sf_dir, "documents")
    d = docs.select(F.split("text", " ").alias("ws"))
    # guard on the bigram side only: Spark's sequence(1, 0) steps
    # DOWNWARD (a 1-word doc would yield [1, 0] and an invalid
    # element_at) — DuckDB's range(1, 1) is naturally empty; unigram
    # counts must keep every doc on both sides
    bg = d.where(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("bigram")
    )
    bc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_ab"))
    un = d.select(F.explode("ws").alias("t"))
    uc = un.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    tot = un.agg(F.count(F.lit(1)).alias("n_tok")).crossJoin(
        bg.agg(F.count(F.lit(1)).alias("n_bg"))
    )
    pmi = (
        bc.where(F.col("n_ab") >= 5)
        .withColumn("_a", F.split("bigram", " ")[0])
        .withColumn("_b", F.split("bigram", " ")[1])
        .join(
            F.broadcast(uc.select(F.col("t").alias("_a"), F.col("n").alias("na"))),
            "_a",
        )
        .join(
            F.broadcast(uc.select(F.col("t").alias("_b"), F.col("n").alias("nb"))),
            "_b",
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") / F.col("n_bg"))
                    / (
                        (F.col("na").cast("double") / F.col("n_tok"))
                        * (F.col("nb").cast("double") / F.col("n_tok"))
                    )
                ),
                6,
            ),
        )
    )
    return global_topk(
        pmi.select("bigram", "n_ab", "pmi"),
        [(F.col("pmi"), True), (F.col("bigram"), False)],
        30,
    ).select("bigram", "n_ab", "pmi", "rank")


# ---------------------------------------------------------------------------
# T31 — HyperLogLog mergeable distinct sketch (Flajolet et al. 2007), the
# continuous-aggregate distinct-count rollup (TimescaleDB `hyperloglog`,
# Druid/BigQuery HLL columns). p = 8 -> 256 registers.
#
# Portability contract (same recipe as the CMS/Bloom twins): the 60-bit
# hash is the first 15 hex chars of md5 (Spark `conv(...,16,10)`, DuckDB
# `('0x'||...)::BIGINT`), the register index is hash % 256, and rho is
# 53 - bitlength(hash div 256) via `bin()` (unpadded binary string in BOTH
# engines; the div-256 quotient is a 52-bit value, so rho ranges 1..53).
# DuckDB rebuilds the IDENTICAL register array, so the sketch itself
# hash-matches — and because every fold term 1/2^r is an exact dyadic and
# the 256-term harmonic sum folds in pinned register order, the FLOAT
# estimate matches bit-for-bit too (round(4) only guards the ln() of the
# small-range branch, not the sum).
#
# Scale shape: rho extraction is scan-side codegen; the sketch is ONE
# map-side-combined max() aggregate onto (group, idx) — 256 rows per group
# cross the shuffle regardless of input size, the canonical distributed-
# sketch plan. Register-wise max is associative/commutative, which is the
# mergeability contract `hll_union_check` proves: partial sketches rolled
# up tier-to-tier (or partition-to-partition) equal the sketch of the
# union, so a continuous aggregate can store 256 bytes per window and
# answer distinct-count queries without ever rescanning the raw tier.
# ---------------------------------------------------------------------------

_HLL_M = 256
_HLL_HV_SPARK = "cast(conv(substr(md5(cast(t AS STRING)), 1, 15), 16, 10) AS BIGINT)"
# every literal CAST to DOUBLE: bare decimal literals parse as DECIMAL in
# both engines but with DIFFERENT scale/rounding rules, so an uncast alpha
# is not the same double on both sides (the 1e-8 discrepancy that moved
# the books estimate across a rounding boundary — caught by the strict
# %.6f local gate, invisible at the driver's %.6g grain)
_HLL_ALPHA = (
    "CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) "
    "+ CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)) "
    "* CAST(256 AS DOUBLE) * CAST(256 AS DOUBLE)"
)

# round-to-4dp is spelled MANUALLY (floor(x*1e4 + 0.5)/1e4) because the
# engines' built-in round() algorithms differ: Spark rounds the exact
# decimal expansion of the double (BigDecimal HALF_UP) while DuckDB
# rounds after a float multiply — a value landing on the x.xxxx5
# boundary (the 'books' estimate does) flips by one grain between them.
# floor over the identical multiply/add op tree is bit-deterministic.
_HLL_EST_SPARK = f"""(CAST(floor(({_HLL_ALPHA} /
  aggregate(regs, cast(0 AS DOUBLE),
    (s, x) -> s + CAST(1 AS DOUBLE)
      / cast(shiftleft(cast(1 AS BIGINT), x) AS DOUBLE)))
  * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
  / CAST(10000 AS DOUBLE))"""

_HLL_EST_DUCK = f"""(CAST(floor(({_HLL_ALPHA} /
  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(regs, r ->
    CAST(1 AS DOUBLE) / ((1::BIGINT << r)::DOUBLE))), (s, x) -> s + x))
  * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)
  / CAST(10000 AS DOUBLE))"""

_HLL_REGS_DUCK = """
tok AS (SELECT source, unnest(tokens) AS t FROM synth),
hh AS (SELECT source,
         ('0x' || substr(md5(t::VARCHAR), 1, 15))::BIGINT AS hv FROM tok),
ir AS (SELECT source, hv % 256 AS idx,
         CASE WHEN hv // 256 = 0 THEN 53
              ELSE 53 - length(bin(hv // 256)) END AS rho FROM hh),
regrows AS (SELECT source, idx, max(rho) AS r FROM ir GROUP BY 1, 2),
packed AS (SELECT source, list(idx ORDER BY idx) AS idxs,
                  list(r ORDER BY idx) AS rs FROM regrows GROUP BY source),
arr AS (SELECT source, list_transform(range(256), j ->
          coalesce(rs[list_position(idxs, j)], 0)) AS regs FROM packed)
"""

_HLL_N = 512  # synth rows; must match synth_q.synth_sql(_HLL_N) in oracles


def _hll_regs_spark(spark):
    """(source, regs: array<int> length 256) — the per-source HLL sketch
    over the synthetic token table. One shuffle; 256 rows per source."""
    from dtaidistance_spark import synth

    tok = synth.sequences_df(spark, _HLL_N).select(
        "source", F.explode("tokens").alias("t")
    )
    ir = tok.selectExpr(
        "source",
        f"pmod({_HLL_HV_SPARK}, 256) AS idx",
        f"CASE WHEN ({_HLL_HV_SPARK} div 256) = 0 THEN 53 "
        f"ELSE 53 - length(bin({_HLL_HV_SPARK} div 256)) END AS rho",
    )
    regrows = ir.groupBy("source", "idx").agg(F.max("rho").alias("r"))
    packed = regrows.groupBy("source").agg(
        F.expr("map_from_entries(sort_array(collect_list(struct(idx, r))))")
        .alias("m")
    )
    return packed.selectExpr(
        "source",
        "transform(sequence(0, 255), j -> "
        "coalesce(element_at(m, cast(j AS BIGINT)), 0)) AS regs",
    )


def _synth_sql_hll():
    from dtaidistance_spark.operators.synth_q import synth_sql

    return synth_sql(_HLL_N)


@register(
    "hll_distinct",
    oracle=_synth_sql_hll()
    + ", "
    + _HLL_REGS_DUCK
    + f"""
    , tru AS (SELECT source, count(DISTINCT t)::BIGINT AS true_distinct
              FROM tok GROUP BY source)
    SELECT arr.source, 256 AS m,
           md5(array_to_string(regs, ',')) AS reg_md5,
           list_sum(regs)::BIGINT AS reg_sum,
           len(list_filter(regs, r -> r = 0))::BIGINT AS v_zero,
           {_HLL_EST_DUCK} AS est_raw,
           CASE WHEN {_HLL_EST_DUCK} <= 640.0
                 AND len(list_filter(regs, r -> r = 0)) > 0
                THEN CAST(floor((CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE)
                       / len(list_filter(regs, r -> r = 0))))
                       * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       AS DOUBLE) / CAST(10000 AS DOUBLE)
                ELSE {_HLL_EST_DUCK} END AS est,
           true_distinct
    FROM arr JOIN tru ON arr.source = tru.source
    """,
)
def hll_distinct(spark, sf_dir):
    """T31: HyperLogLog distinct-token sketch per source over the
    north-rule token table — register array, harmonic-mean estimate
    (small-range linear-counting branch included), and the exact
    distinct count for the error column. The register md5 AND the float
    estimate hash-match DuckDB's independent rebuild (dyadic fold terms
    in pinned order — see the section comment). ~7% observed error at
    m=256 vs the true 15k-50k distinct tokens per source."""
    from dtaidistance_spark import synth

    arr = _hll_regs_spark(spark)
    tok = synth.sequences_df(spark, _HLL_N).select(
        "source", F.explode("tokens").alias("t")
    )
    tru = tok.groupBy("source").agg(
        F.countDistinct("t").alias("true_distinct")
    )
    return (
        arr.join(tru, "source")
        .selectExpr(
            "source",
            "256 AS m",
            "md5(array_join(regs, ',')) AS reg_md5",
            "aggregate(regs, cast(0 AS BIGINT), (s, x) -> s + x) AS reg_sum",
            "cast(size(filter(regs, r -> r = 0)) AS BIGINT) AS v_zero",
            f"{_HLL_EST_SPARK} AS est_raw",
            f"""CASE WHEN {_HLL_EST_SPARK} <= 640.0
                 AND size(filter(regs, r -> r = 0)) > 0
                THEN CAST(floor((CAST(256 AS DOUBLE) * ln(CAST(256 AS DOUBLE)
                       / size(filter(regs, r -> r = 0))))
                       * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                       AS DOUBLE) / CAST(10000 AS DOUBLE)
                ELSE {_HLL_EST_SPARK} END AS est""",
            "true_distinct",
        )
    )


@register(
    "hll_union_check",
    oracle=_synth_sql_hll()
    + ", "
    + _HLL_REGS_DUCK
    + f"""
    , merged0 AS (SELECT idx, max(r) AS r FROM regrows GROUP BY 1),
    mpacked AS (SELECT list(idx ORDER BY idx) AS idxs,
                       list(r ORDER BY idx) AS rs FROM merged0),
    merged AS (SELECT list_transform(range(256), j ->
                 coalesce(rs[list_position(idxs, j)], 0)) AS regs
               FROM mpacked),
    dhh AS (SELECT DISTINCT ('0x' || substr(md5(t::VARCHAR), 1, 15))::BIGINT
              AS hv FROM tok),
    dir AS (SELECT hv % 256 AS idx,
              CASE WHEN hv // 256 = 0 THEN 53
                   ELSE 53 - length(bin(hv // 256)) END AS rho FROM dhh),
    dregrows AS (SELECT idx, max(rho) AS r FROM dir GROUP BY 1),
    dpacked AS (SELECT list(idx ORDER BY idx) AS idxs,
                       list(r ORDER BY idx) AS rs FROM dregrows),
    darr AS (SELECT list_transform(range(256), j ->
               coalesce(rs[list_position(idxs, j)], 0)) AS regs
             FROM dpacked)
    SELECT 256 AS m,
           (SELECT count(DISTINCT source) FROM synth)::BIGINT AS n_sources,
           (SELECT md5(array_to_string(regs, ',')) FROM merged) AS merged_md5,
           (SELECT md5(array_to_string(regs, ',')) FROM darr) AS direct_md5,
           (SELECT md5(array_to_string(regs, ',')) FROM merged)
             = (SELECT md5(array_to_string(regs, ',')) FROM darr)
             AS union_equals_direct,
           (SELECT {_HLL_EST_DUCK} FROM merged) AS est_merged,
           (SELECT count(DISTINCT t) FROM tok)::BIGINT AS true_distinct
    """,
)
def hll_union_check(spark, sf_dir):
    """T31b: the HLL mergeability contract — register-wise max of the
    per-source sketches equals the sketch built directly over the
    distinct union of all tokens. This is exactly the merge a
    continuous-aggregate tier performs when rolling partial sketches
    up (256 bytes per window instead of a rescan), so the identity is
    the correctness proof for distinct-count rollups. The merge runs
    as a zip_with(greatest) fold over the collected per-source arrays
    (3 rows — bounded by the source cardinality, not the data)."""
    arr = _hll_regs_spark(spark)
    merged = arr.agg(
        F.expr(
            "aggregate(collect_list(regs), "
            " transform(sequence(0, 255), j -> 0), "
            " (acc, a) -> zip_with(acc, a, (x, y) -> greatest(x, y)))"
        ).alias("regs")
    )
    from dtaidistance_spark import synth

    tok = synth.sequences_df(spark, _HLL_N).select(
        "source", F.explode("tokens").alias("t")
    )
    dtok = tok.select("t").distinct()
    dir_ = dtok.selectExpr(
        f"pmod({_HLL_HV_SPARK}, 256) AS idx",
        f"CASE WHEN ({_HLL_HV_SPARK} div 256) = 0 THEN 53 "
        f"ELSE 53 - length(bin({_HLL_HV_SPARK} div 256)) END AS rho",
    )
    dregs = dir_.groupBy("idx").agg(F.max("rho").alias("r"))
    dpacked = dregs.agg(
        F.expr("map_from_entries(sort_array(collect_list(struct(idx, r))))")
        .alias("m")
    )
    darr = dpacked.selectExpr(
        "transform(sequence(0, 255), j -> "
        "coalesce(element_at(m, cast(j AS BIGINT)), 0)) AS regs"
    )
    nsrc = synth.sequences_df(spark, _HLL_N).agg(
        F.countDistinct("source").alias("n_sources")
    )
    ndis = tok.agg(F.countDistinct("t").alias("true_distinct"))
    m = merged.select(
        F.lit(256).alias("m"),
        F.expr("md5(array_join(regs, ','))").alias("merged_md5"),
        F.expr(_HLL_EST_SPARK).alias("est_merged"),
    )
    d = darr.select(F.expr("md5(array_join(regs, ','))").alias("direct_md5"))
    return (
        m.crossJoin(d)
        .crossJoin(nsrc)
        .crossJoin(ndis)
        .select(
            "m",
            "n_sources",
            "merged_md5",
            "direct_md5",
            (F.col("merged_md5") == F.col("direct_md5")).alias(
                "union_equals_direct"
            ),
            "est_merged",
            "true_distinct",
        )
    )


# ---------------------------------------------------------------------------
# T32 — UddSketch-style mergeable quantile sketch (TimescaleDB
# `percentile_agg` / `uddsketch`): a log-bucketed histogram with EXACT
# integer bucket edges, so — unlike a float-gamma UddSketch — the whole
# sketch, the merge, and the percentile estimates are bit-reproducible
# across engines with no tolerance anywhere.
#
# Bucketing (tokens are int32 in [0, VOCAB)): values 0..7 get identity
# buckets (exact); v >= 8 gets idx = 8*e + sub where e = bitlength(v)-1
# (length of the unpadded bin() string, the HLL rho trick) and sub = the
# three bits after the leading one. Bucket width is 2^(e-3), i.e. a
# fixed <= 1/8 relative width (gamma = 2^(1/8) in UddSketch terms), so a
# midpoint estimate carries <= ~6.7% relative error by construction.
# Edges reconstruct exactly: lo = (8+sub) << (e-3), hi = lo + width - 1.
#
# Scale shape: bucket assignment is scan-side codegen; the sketch is ONE
# map-side-combined count aggregate onto (source, idx) — at most 128
# rows per group cross the shuffle regardless of input size. Percentile
# selection folds over the <=128-length packed array (no partition-less
# window anywhere); rank r_q = ceil(q*n/100) in pure integers. The
# per-value exact percentile used as the verification column is the full
# sort the sketch REPLACES at scale — it rides a source-partitioned
# cumulative window over distinct values.
#
# Mergeability contract (`uddq_merge_check`): bucket counts are summed,
# so the merge is associative/commutative — per-source sketches rolled
# up equal the sketch built directly over all tokens (md5 equality),
# exactly the merge a continuous-aggregate tier performs to answer
# percentile queries from <= 128 counters per window without a rescan.
# ---------------------------------------------------------------------------

_UDQ_N = 256

_UDQ_IDX_SPARK = (
    "CASE WHEN t < 8 THEN t ELSE (length(bin(CAST(t AS BIGINT))) - 1) * 8"
    " + (shiftright(t, length(bin(CAST(t AS BIGINT))) - 4) & 7) END"
)
_UDQ_IDX_DUCK = (
    "CASE WHEN t < 8 THEN t ELSE (length(bin(t::BIGINT)) - 1) * 8"
    " + ((t >> (length(bin(t::BIGINT)) - 4)) & 7) END"
)


def _udq_edges(i: str, engine: str):
    """(lo, hi, est) integer expressions for bucket index ``i``."""
    if engine == "spark":
        w = f"shiftleft(1, (({i}) div 8) - 3)"
        dv = "div"
    else:
        w = f"(1 << ((({i}) // 8) - 3))"
        dv = "//"
    lo = f"CASE WHEN ({i}) < 8 THEN ({i}) ELSE (8 + ({i}) % 8) * {w} END"
    hi = (
        f"CASE WHEN ({i}) < 8 THEN ({i})"
        f" ELSE (8 + ({i}) % 8) * {w} + {w} - 1 END"
    )
    est = f"(({lo}) + ({hi})) {dv} 2"
    return lo, hi, est


_UDQ_QS = (50, 90, 99)

# shared DuckDB prefix: bucket counts, packed sketch, cumulative fold
_UDQ_DUCK_BK = f"""
tok AS (SELECT source, unnest(tokens) AS t FROM synth),
bk AS (SELECT source, {_UDQ_IDX_DUCK} AS idx, count(*)::BIGINT AS cnt
       FROM tok GROUP BY 1, 2),
packed AS (SELECT source,
             list(idx ORDER BY idx) AS idxs,
             list(cnt ORDER BY idx) AS cnts,
             md5(string_agg(idx::VARCHAR || ':' || cnt::VARCHAR, ','
                            ORDER BY idx)) AS sketch_md5
           FROM bk GROUP BY source),
cc AS (SELECT *, list_transform(range(1, len(cnts) + 1),
                   k -> list_sum(cnts[1:k])::BIGINT) AS cums FROM packed),
tt AS (SELECT *, cums[len(cums)] AS n_total FROM cc),
rr AS (SELECT *,
         {", ".join(f"idxs[list_filter(range(1, len(cums) + 1), "
                    f"k -> cums[k] >= ({q} * n_total + 99) // 100)[1]]"
                    f" AS i{q}" for q in _UDQ_QS)}
       FROM tt)
"""


def _synth_sql_udq():
    from dtaidistance_spark.operators.synth_q import synth_sql

    return synth_sql(_UDQ_N)


def _udq_bk_spark(spark):
    """(source, idx, cnt) — the per-source bucket-count sketch rows.
    One map-side-combined shuffle; <=128 rows per source."""
    from dtaidistance_spark import synth

    tok = synth.sequences_df(spark, _UDQ_N).select(
        "source", F.explode("tokens").alias("t")
    )
    return (
        tok.selectExpr("source", f"{_UDQ_IDX_SPARK} AS idx")
        .groupBy("source", "idx")
        .agg(F.count("*").alias("cnt"))
    )


def _udq_packed_spark(bk):
    """Pack per-source sketch rows into ordered (idxs, cnts) arrays with
    the canonical md5, cumulative counts, totals, and the selected
    bucket index per target percentile — all array HOFs, no window."""
    packed = bk.groupBy("source").agg(
        F.expr("sort_array(collect_list(struct(idx, cnt)))").alias("a")
    ).selectExpr(
        "source",
        "transform(a, s -> s.idx) AS idxs",
        "transform(a, s -> s.cnt) AS cnts",
        "md5(array_join(transform(a, s -> concat(CAST(s.idx AS STRING),"
        " ':', CAST(s.cnt AS STRING))), ',')) AS sketch_md5",
    )
    cc = packed.selectExpr(
        "*",
        "transform(sequence(1, size(cnts)), k -> aggregate(slice(cnts,"
        " 1, k), CAST(0 AS BIGINT), (s, x) -> s + x)) AS cums",
    ).selectExpr("*", "element_at(cums, size(cums)) AS n_total")
    sels = [
        f"element_at(idxs, element_at(filter(sequence(1, size(cums)),"
        f" k -> element_at(cums, k) >= ({q} * n_total + 99) div 100), 1))"
        f" AS i{q}"
        for q in _UDQ_QS
    ]
    return cc.selectExpr("*", *sels)


def _udq_out_cols(engine: str):
    cols = []
    for q in _UDQ_QS:
        lo, hi, est = _udq_edges(f"i{q}", engine)
        cols += [
            f"{est} AS p{q}_est",
            f"p{q}_exact",
            f"(p{q}_exact >= ({lo}) AND p{q}_exact <= ({hi}))"
            f" AS p{q}_ok",
        ]
    return cols


@register(
    "uddq_sketch",
    oracle=_synth_sql_udq()
    + ", "
    + _UDQ_DUCK_BK
    + f"""
    , vc AS (SELECT source, t, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
    vw AS (SELECT source, t,
             sum(c) OVER (PARTITION BY source ORDER BY t)::BIGINT AS vcum
           FROM vc),
    ex AS (SELECT vw.source,
             {", ".join(f"min(CASE WHEN vcum >= ({q} * n_total + 99) // 100"
                        f" THEN t END) AS p{q}_exact" for q in _UDQ_QS)}
           FROM vw JOIN rr ON vw.source = rr.source
           GROUP BY vw.source)
    SELECT rr.source, n_total, len(idxs)::BIGINT AS n_buckets, sketch_md5,
           {", ".join(_udq_out_cols("duck"))}
    FROM rr JOIN ex ON rr.source = ex.source
    """,
)
def uddq_sketch(spark, sf_dir):
    """T32: mergeable log-bucket quantile sketch per source — packed
    (idx, cnt) histogram (md5-canonical), p50/p90/p99 midpoint
    estimates from the sketch, the EXACT per-source percentiles as
    verification columns, and the p*_ok invariant that the exact value
    lies inside the selected bucket (true by construction: the sketch
    is a lossless bucket histogram, so the rank-r value falls in the
    chosen bucket — the estimate error is bounded by the <=1/8 relative
    bucket width). Every column is integer or md5 — bit-exact oracle.
    Scale: one (source, idx) count shuffle (<=128 rows per source);
    the exact columns ride a source-partitioned cumulative window over
    distinct values — the very sort the sketch replaces at scale."""
    from pyspark.sql import Window

    from dtaidistance_spark import synth

    bk = _udq_bk_spark(spark)
    rr = _udq_packed_spark(bk)
    tok = synth.sequences_df(spark, _UDQ_N).select(
        "source", F.explode("tokens").alias("t")
    )
    vc = tok.groupBy("source", "t").agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vw = vc.withColumn("vcum", F.sum("c").over(w))
    ex = (
        vw.join(rr.select("source", "n_total"), "source")
        .groupBy("source")
        .agg(
            *[
                F.expr(
                    f"min(CASE WHEN vcum >= ({q} * n_total + 99) div 100"
                    f" THEN t END)"
                ).alias(f"p{q}_exact")
                for q in _UDQ_QS
            ]
        )
    )
    return rr.join(ex, "source").selectExpr(
        "source",
        "n_total",
        "CAST(size(idxs) AS BIGINT) AS n_buckets",
        "sketch_md5",
        *_udq_out_cols("spark"),
    )


@register(
    "uddq_merge_check",
    oracle=_synth_sql_udq()
    + ", "
    + _UDQ_DUCK_BK
    + f"""
    , mg AS (SELECT idx, sum(cnt)::BIGINT AS cnt FROM bk GROUP BY idx),
    mpacked AS (SELECT list(idx ORDER BY idx) AS idxs,
                  list(cnt ORDER BY idx) AS cnts,
                  md5(string_agg(idx::VARCHAR || ':' || cnt::VARCHAR, ','
                                 ORDER BY idx)) AS merged_md5
                FROM mg),
    mcc AS (SELECT *, list_transform(range(1, len(cnts) + 1),
                    k -> list_sum(cnts[1:k])::BIGINT) AS cums FROM mpacked),
    mtt AS (SELECT *, cums[len(cums)] AS n_total FROM mcc),
    mrr AS (SELECT *,
            {", ".join(f"idxs[list_filter(range(1, len(cums) + 1), "
                       f"k -> cums[k] >= ({q} * n_total + 99) // 100)[1]]"
                       f" AS i{q}" for q in _UDQ_QS)}
            FROM mtt),
    dk AS (SELECT {_UDQ_IDX_DUCK} AS idx, count(*)::BIGINT AS cnt
           FROM tok GROUP BY 1),
    dmd AS (SELECT md5(string_agg(idx::VARCHAR || ':' || cnt::VARCHAR, ','
                                  ORDER BY idx)) AS direct_md5 FROM dk)
    SELECT (SELECT count(DISTINCT source) FROM synth)::BIGINT AS n_sources,
           n_total, merged_md5, direct_md5,
           merged_md5 = direct_md5 AS merge_equals_direct,
           {", ".join(f"{_udq_edges(f'i{q}', 'duck')[2]} AS p{q}_est"
                      for q in _UDQ_QS)}
    FROM mrr CROSS JOIN dmd
    """,
)
def uddq_merge_check(spark, sf_dir):
    """T32b: the quantile-sketch mergeability contract — summing the
    per-source bucket counts yields byte-identical sketch bytes (md5)
    to the sketch built directly over ALL tokens, because bucket-count
    merge is associative/commutative addition. This is the rollup a
    continuous-aggregate tier performs: <=128 counters per window
    answer percentile queries with bounded relative error and no raw
    rescan. Output also carries the merged-sketch p50/p90/p99
    estimates (identical to direct by the md5 identity)."""
    from dtaidistance_spark import synth

    bk = _udq_bk_spark(spark)
    mg = bk.groupBy("idx").agg(F.sum("cnt").alias("cnt"))
    mrr = (
        mg.groupBy()
        .agg(F.expr("sort_array(collect_list(struct(idx, cnt)))").alias("a"))
        .selectExpr(
            "transform(a, s -> s.idx) AS idxs",
            "transform(a, s -> s.cnt) AS cnts",
            "md5(array_join(transform(a, s -> concat(CAST(s.idx AS"
            " STRING), ':', CAST(s.cnt AS STRING))), ',')) AS merged_md5",
        )
        .selectExpr(
            "*",
            "transform(sequence(1, size(cnts)), k -> aggregate(slice("
            "cnts, 1, k), CAST(0 AS BIGINT), (s, x) -> s + x)) AS cums",
        )
        .selectExpr("*", "element_at(cums, size(cums)) AS n_total")
        .selectExpr(
            "*",
            *[
                f"element_at(idxs, element_at(filter(sequence(1,"
                f" size(cums)), k -> element_at(cums, k) >="
                f" ({q} * n_total + 99) div 100), 1)) AS i{q}"
                for q in _UDQ_QS
            ],
        )
    )
    tok = synth.sequences_df(spark, _UDQ_N).select(
        "source", F.explode("tokens").alias("t")
    )
    dk = (
        tok.selectExpr(f"{_UDQ_IDX_SPARK} AS idx")
        .groupBy("idx")
        .agg(F.count("*").alias("cnt"))
    )
    dmd = (
        dk.groupBy()
        .agg(F.expr("sort_array(collect_list(struct(idx, cnt)))").alias("a"))
        .selectExpr(
            "md5(array_join(transform(a, s -> concat(CAST(s.idx AS"
            " STRING), ':', CAST(s.cnt AS STRING))), ',')) AS direct_md5"
        )
    )
    nsrc = (
        synth.sequences_df(spark, _UDQ_N)
        .agg(F.countDistinct("source").alias("n_sources"))
    )
    return (
        nsrc.crossJoin(mrr)
        .crossJoin(dmd)
        .selectExpr(
            "n_sources",
            "n_total",
            "merged_md5",
            "direct_md5",
            "merged_md5 = direct_md5 AS merge_equals_direct",
            *[
                f"{_udq_edges(f'i{q}', 'spark')[2]} AS p{q}_est"
                for q in _UDQ_QS
            ],
        )
    )


# ---------------------------------------------------------------------------
# T39 — Misra-Gries / SpaceSaving mergeable heavy-hitter summary
# ---------------------------------------------------------------------------
#
# The k-counter Misra-Gries summary of a COUNTED batch has a closed form:
# decrement every count by d = the (k+1)-th largest count value (0 when
# the batch has <= k distinct tokens) and keep the survivors (> d) — at
# most k remain, and every kept estimate undercounts its true batch count
# by exactly d. Summaries MERGE by summing surviving estimates per token
# and applying the same (k+1)-th-largest decrement to the combined table
# (Agarwal et al., "Mergeable Summaries", PODS'12). Total undercount of
# any token is then bounded by sum(d_b over buckets) + d_merge — the
# bound is emitted per row and PROVEN in-data against the exact counts
# (pure int64 end to end, so the whole thing hashes with no tolerance).
#
# Scale shape: explode -> groupBy(bucket, token) is ONE map-side-combined
# shuffle; each bucket's decrement d_b is a positional pick from a
# per-bucket sorted count array (counts only — ties don't matter when
# picking a VALUE), survivors join d_b back broadcast-small; the merged
# table holds <= buckets*k rows, so the final decrement + the exact-count
# verification join are bounded regardless of corpus size. No windows at
# all, partition-less or otherwise.

_MG_K = 16
_MG_BUCKET = 64


@register(
    "misra_gries_topk",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id // {_MG_BUCKET} AS bkt,
             unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    c AS (SELECT bkt, tok, count(*)::BIGINT AS cnt FROM ex GROUP BY 1, 2),
    dct AS (
      SELECT bkt,
             coalesce((list_sort(list(cnt), 'DESC'))[{_MG_K} + 1], 0)
               AS d_b
      FROM c GROUP BY bkt
    ),
    part AS (
      SELECT c.bkt, c.tok, c.cnt - dct.d_b AS est_b
      FROM c JOIN dct USING (bkt) WHERE c.cnt > dct.d_b
    ),
    merged AS (
      SELECT tok, sum(est_b)::BIGINT AS s FROM part GROUP BY tok
    ),
    dmrg AS (
      SELECT coalesce((list_sort(list(s), 'DESC'))[{_MG_K} + 1], 0)
               AS d_m
      FROM merged
    ),
    dsum AS (SELECT sum(d_b)::BIGINT AS d_total FROM dct),
    fin AS (
      SELECT tok, s - d_m AS est, d_m FROM merged, dmrg WHERE s > d_m
    ),
    tru AS (SELECT tok, count(*)::BIGINT AS true_cnt FROM ex GROUP BY tok)
    SELECT fin.tok, fin.est, tru.true_cnt,
           (tru.true_cnt - fin.est)::BIGINT AS err,
           (dsum.d_total + fin.d_m)::BIGINT AS bound,
           (tru.true_cnt - fin.est) <= (dsum.d_total + fin.d_m)
             AS bound_ok,
           tru.true_cnt >= fin.est AS underestimate_ok
    FROM fin JOIN tru USING (tok), dsum
    """,
)
def misra_gries_topk(spark, sf_dir):
    """T39: mergeable Misra-Gries heavy-hitter summary over the
    documents word stream (Zipf-skewed, so real heavy hitters exist) — per-bucket k = 16 counter summaries in closed form
    (decrement by the (k+1)-th largest count, keep survivors), merged
    by summing and re-decrementing, exactly the Agarwal et al.
    mergeable-summaries recipe that lets 1000 executors each ship k
    counters instead of a vocabulary-sized table.  Every kept token's
    estimate provably undercounts by at most Σd_bucket + d_merge; both
    sides of that inequality are emitted and the oracle re-derives the
    whole pipeline (pure int64 → bit-exact hash, no tolerance).  See
    the section comment for the plan shape."""
    ex = T(spark, sf_dir, "documents").select(
        F.expr(f"doc_id DIV {_MG_BUCKET}").alias("bkt"),
        F.explode(F.split(F.lower("text"), " ")).alias("tok"),
    )
    c = ex.groupBy("bkt", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    dct = c.groupBy("bkt").agg(
        F.expr(
            f"coalesce(element_at(reverse(sort_array(collect_list(cnt))),"
            f" {_MG_K} + 1), CAST(0 AS BIGINT))"
        ).alias("d_b")
    )
    part = (
        c.join(F.broadcast(dct), "bkt")
        .where(F.col("cnt") > F.col("d_b"))
        .select("bkt", "tok", (F.col("cnt") - F.col("d_b")).alias("est_b"))
    )
    merged = part.groupBy("tok").agg(F.sum("est_b").alias("s"))
    dmrg = merged.groupBy().agg(
        F.expr(
            f"coalesce(element_at(reverse(sort_array(collect_list(s))),"
            f" {_MG_K} + 1), CAST(0 AS BIGINT))"
        ).alias("d_m")
    )
    dsum = dct.groupBy().agg(F.sum("d_b").alias("d_total"))
    fin = (
        merged.crossJoin(F.broadcast(dmrg))
        .where(F.col("s") > F.col("d_m"))
        .select("tok", (F.col("s") - F.col("d_m")).alias("est"), "d_m")
    )
    tru = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        fin.join(tru, "tok")
        .crossJoin(F.broadcast(dsum))
        .select(
            "tok",
            "est",
            "true_cnt",
            (F.col("true_cnt") - F.col("est")).alias("err"),
            (F.col("d_total") + F.col("d_m")).alias("bound"),
            (
                (F.col("true_cnt") - F.col("est"))
                <= (F.col("d_total") + F.col("d_m"))
            ).alias("bound_ok"),
            (F.col("true_cnt") >= F.col("est")).alias("underestimate_ok"),
        )
    )
