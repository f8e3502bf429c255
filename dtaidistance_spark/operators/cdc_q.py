"""Content-defined chunking (CDC) dedup — the storage/dedup technique
that fixed-width chunking cannot replicate: chunk boundaries are picked
by a rolling *content* hash, so inserting k tokens at the front of a
document shifts only the chunks that touch the edit — every boundary
downstream re-synchronizes and the chunk hashes match again.  This is
the LBFS/rsync/FastCDC landmark idea applied to pre-tokenized training
sequences: near-duplicate docs that differ by a prefix/insertion (boiler
plate, headers, shingled crawls) dedup at the CHUNK level even though
whole-doc md5 and fixed-offset chunking both miss them.

All three queries are bit-exact oracled — the entire pipeline is
integer arithmetic + md5:

* the rolling hash at position j is a plain weighted sum
  ``h_j = (sum_i toks[j-W+1+i] * B^(W-1-i) mod M) % M`` with
  ``M = 2^31-1`` and the powers precomputed as Python constants, so
  each term is < 2^47 and the 8-term sum < 2^50 — exact int64, no
  fold, no modmul overflow, the identical expression in both engines;
* a boundary falls after j iff ``h_j % D == 0`` (D=61 → mean chunk
  ~61 tokens, the pure landmark rule — no min/max clamp, so the rule
  is stateless and fully relational);
* chunk identity is md5 over the comma-joined token slice.

Scale shape: boundary detection and chunk hashing are scan-side HOFs
inside whole-stage codegen — ZERO shuffles per document, no Python.
The dedup rollups then group the corpus-sized chunk-instance table by
chunk md5 — one map-side-combined shuffle on a uniform key, exactly
the T1 exact-dedup shape, so the 100 TB story is the same: the only
data crossing the wire is (md5, len) pairs, never token payloads.

The shifted-twin universe (each doc unioned with a copy carrying a
deterministic 1..7-token prefix) is constructed in-query from the same
synth table both engines re-derive, so the robustness measurement —
CDC re-syncs, fixed-width never re-aligns — is itself oracled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 256
_W = 8                       # rolling-hash window (tokens)
_M = 2147483647              # 2^31 - 1: keeps every term inside int64
_B = 50333                   # prime > vocab size 50257
_POW = [pow(_B, _W - 1 - i, _M) for i in range(_W)]
_D = 61                      # boundary divisor -> mean chunk ~61 tokens
_FIX = 61                    # fixed-width baseline chunk length
_V = 50257


def _hash_sum(tok_at):
    """The W-term weighted sum (pre-mod) at position j; ``tok_at(o)``
    renders a BIGINT reference to the token o positions back from j."""
    return " + ".join(
        f"{tok_at(_W - 1 - i)} * CAST({_POW[i]} AS BIGINT)"
        for i in range(_W)
    )


# Spark: 0-based array indexing, sequence() inclusive on both ends.
_BPOS_SPARK = (
    f"filter(sequence({_W - 1}, nt - 2), j -> "
    f"(({_hash_sum(lambda o: f'CAST(toks[j - {o}] AS BIGINT)')}) % {_M})"
    f" % {_D} = 0)"
)
# DuckDB: 1-based indexing, range() exclusive of the upper bound.
_BPOS_DUCK = (
    f"list_filter(range({_W - 1}, nt - 1), j -> "
    f"(({_hash_sum(lambda o: f'toks[j - {o} + 1]::BIGINT')}) % {_M})"
    f" % {_D} = 0)"
)

# chunk c (0-based) spans tokens[starts[c] .. ends[c]] inclusive, where
# starts = [0] ++ (bpos+1), ends = bpos ++ [nt-1].  zip_with (not
# transform-with-indexing) is load-bearing for PERFORMANCE, not style:
# CollapseProject inlines the bpos expression into its uses, and a
# per-element bpos[c] lookup would then re-run the whole O(n·W)
# boundary scan once per chunk — O(n²/D) per row.  zip_with's array
# arguments are evaluated once per ROW, and the lambda touches only its
# own (s, e) pair, so chunking stays O(n) per row even after collapse.
_CHUNKS_SPARK = (
    "zip_with("
    " concat(array(0), transform(bpos, x -> x + 1)),"
    " concat(bpos, array(nt - 1)),"
    " (s, e) -> struct("
    "   md5(array_join(cast(slice(toks, s + 1, e - s + 1)"
    "     AS array<string>), ',')) AS cmd5,"
    "   e - s + 1 AS clen))"
)
_CHUNKS_DUCK = (
    "list_transform(range(0, len(bpos) + 1), c -> {"
    "  'cmd5': md5(array_to_string(toks["
    "    (CASE WHEN c = 0 THEN 0 ELSE bpos[c] + 1 END) + 1 :"
    "    (CASE WHEN c = len(bpos) THEN nt - 1 ELSE bpos[c + 1] END) + 1"
    "  ], ',')),"
    "  'clen': (CASE WHEN c = len(bpos) THEN nt - 1 ELSE bpos[c + 1] END)"
    "    - (CASE WHEN c = 0 THEN 0 ELSE bpos[c] + 1 END) + 1})"
)

# fixed-width baseline: chunk c spans [c*F .. min((c+1)*F, nt) - 1].
_FCHUNKS_SPARK = (
    f"transform(sequence(0, CAST((nt + {_FIX - 1}) DIV {_FIX} AS INT) - 1),"
    f" c -> md5(array_join(cast(slice(toks, c * {_FIX} + 1,"
    f" least({_FIX}, nt - c * {_FIX})) AS array<string>), ',')))"
)
_FCHUNKS_DUCK = (
    f"list_transform(range(0, (nt + {_FIX - 1}) // {_FIX}),"
    f" c -> md5(array_to_string(toks[c * {_FIX} + 1 :"
    f" least((c + 1) * {_FIX}, nt)], ',')))"
)

# shifted twin: prepend k = 1 + h%7 deterministic tokens.
_PRE_SPARK = (
    f"transform(sequence(1, CAST(1 + h % 7 AS INT)),"
    f" s -> CAST((h % {_V} + s * 7919) % {_V} AS INT))"
)
_PRE_DUCK = (
    f"list_transform(range(1, 1 + (1 + h % 7)::INT),"
    f" s -> ((h % {_V} + s * 7919) % {_V})::INT)"
)

# DuckDB CTE building the orig + shifted universe with bpos per row.
_UNI_DUCK = f"""
    , hh AS (
      SELECT doc_id, source, tokens,
             ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS h
      FROM synth
    ),
    uni AS (
      SELECT doc_id, source, 'o' AS variant,
             tokens AS toks, len(tokens) AS nt FROM hh
      UNION ALL
      SELECT doc_id, source, 's' AS variant,
             list_concat({_PRE_DUCK}, tokens) AS toks,
             len(tokens) + (1 + h % 7) AS nt
      FROM hh
    ),
    ub AS (SELECT *, {_BPOS_DUCK} AS bpos FROM uni)
"""


def _universe(spark):
    """Spark side of the orig + shifted-twin universe with bpos."""
    seq = synth.sequences_df(spark, _N).select(
        "doc_id",
        "source",
        "tokens",
        F.conv(F.substring(F.md5("doc_id"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    orig = seq.select(
        "doc_id",
        "source",
        F.lit("o").alias("variant"),
        F.col("tokens").alias("toks"),
        F.size("tokens").alias("nt"),
    )
    shif = seq.select(
        "doc_id",
        "source",
        F.lit("s").alias("variant"),
        F.expr(f"concat({_PRE_SPARK}, tokens)").alias("toks"),
        (F.size("tokens") + (F.lit(1) + F.col("h") % 7).cast("int")).alias(
            "nt"
        ),
    )
    return orig.unionAll(shif).withColumn("bpos", F.expr(_BPOS_SPARK))


# ---------------------------------------------------------------------------
# T44 — per-doc CDC chunk summary (original corpus)
# ---------------------------------------------------------------------------


@register(
    "cdc_chunk_summary",
    oracle=synth_sql(_N)
    + _UNI_DUCK
    + f"""
    , ch AS (SELECT *, {_CHUNKS_DUCK} AS chunks FROM ub WHERE variant = 'o'),
    fl AS (
      SELECT doc_id, source, nt,
             len(chunks) AS n_chunks,
             list_sum(list_transform(chunks, c -> c.clen))::BIGINT
               AS sum_len,
             list_min(list_transform(chunks, c -> c.clen)) AS min_len,
             list_max(list_transform(chunks, c -> c.clen)) AS max_len,
             md5(array_to_string(
               list_transform(chunks, c -> c.cmd5), '|')) AS chunks_md5
      FROM ch
    )
    SELECT doc_id, source, nt AS n_tok, n_chunks, sum_len,
           min_len::BIGINT AS min_len, max_len::BIGINT AS max_len,
           chunks_md5
    FROM fl
    """,
)
def cdc_chunk_summary(spark, sf_dir):
    """T44: content-defined chunking of every doc — boundary positions
    from the rolling landmark hash (see module docstring), one summary
    row per doc carrying the chunk count, exact length stats (sum_len
    must equal n_tok — the partition-into-chunks invariant, oracled),
    and a chain md5 over the ordered chunk hashes so the oracle pins
    every chunk's identity and order without exploding rows.  Plan:
    scan-side HOFs only — zero exchanges for the chunking itself."""
    uni = _universe(spark).where(F.col("variant") == "o")
    ch = uni.withColumn("chunks", F.expr(_CHUNKS_SPARK))
    return ch.select(
        "doc_id",
        "source",
        F.col("nt").cast("long").alias("n_tok"),
        F.size("chunks").cast("long").alias("n_chunks"),
        F.expr(
            "aggregate(chunks, 0L, (a, c) -> a + CAST(c.clen AS BIGINT))"
        ).alias("sum_len"),
        F.expr("array_min(transform(chunks, c -> c.clen))")
        .cast("long")
        .alias("min_len"),
        F.expr("array_max(transform(chunks, c -> c.clen))")
        .cast("long")
        .alias("max_len"),
        F.md5(
            F.expr("array_join(transform(chunks, c -> c.cmd5), '|')")
        ).alias("chunks_md5"),
    )


# ---------------------------------------------------------------------------
# T45 — shift-robustness: CDC re-syncs after a prefix edit, fixed doesn't
# ---------------------------------------------------------------------------


@register(
    "cdc_shift_robustness",
    oracle=synth_sql(_N)
    + _UNI_DUCK
    + f"""
    , ch AS (
      SELECT doc_id, variant,
             list_transform({_CHUNKS_DUCK}, q -> q.cmd5) AS cdc5,
             {_FCHUNKS_DUCK} AS fix5
      FROM ub
    ),
    inst AS (
      SELECT doc_id, variant, 'cdc' AS scheme, unnest(cdc5) AS cmd5 FROM ch
      UNION ALL
      SELECT doc_id, variant, 'fix' AS scheme, unnest(fix5) AS cmd5 FROM ch
    ),
    d AS (SELECT DISTINCT doc_id, variant, scheme, cmd5 FROM inst),
    shared AS (
      SELECT o.doc_id, o.scheme, count(*)::BIGINT AS shared
      FROM d o JOIN d s
        ON s.doc_id = o.doc_id AND s.scheme = o.scheme
       AND s.cmd5 = o.cmd5 AND o.variant = 'o' AND s.variant = 's'
      GROUP BY 1, 2
    ),
    cb AS (
      SELECT doc_id,
             count(DISTINCT CASE WHEN scheme = 'cdc' THEN cmd5 END)::BIGINT
               AS n_cdc,
             count(DISTINCT CASE WHEN scheme = 'fix' THEN cmd5 END)::BIGINT
               AS n_fix
      FROM d WHERE variant = 'o' GROUP BY 1
    )
    SELECT b.doc_id, b.n_cdc,
           coalesce(sc.shared, 0)::BIGINT AS shared_cdc,
           b.n_fix, coalesce(sf.shared, 0)::BIGINT AS shared_fix
    FROM cb b
    LEFT JOIN shared sc ON sc.doc_id = b.doc_id AND sc.scheme = 'cdc'
    LEFT JOIN shared sf ON sf.doc_id = b.doc_id AND sf.scheme = 'fix'
    """,
)
def cdc_shift_robustness(spark, sf_dir):
    """T45: the measurement that justifies CDC — per doc, how many
    DISTINCT chunk hashes the original shares with its shifted twin
    (a deterministic 1..7-token prefix prepended), under CDC vs
    fixed-width chunking.  CDC boundaries depend only on local content,
    so every boundary past the first window after the edit lands in the
    same place and shared_cdc ≈ n_cdc; fixed-width offsets all shift by
    k (never a multiple of the width here), so shared_fix is 0 except
    for accidental content collisions.  Relational intersection (exploded
    distinct chunk rows, self-join on (doc, scheme, md5)) rather than
    list-intersect builtins, whose dedup/order semantics differ across
    engines.  Plan: HOF chunking scan-side; the join keys on md5 —
    uniform, map-side combined, broadcast-sized per doc."""
    # persist: the chunk-hash projection (the expensive interpreted-HOF
    # scan) feeds two union branches and two join sides — computed once.
    ch = _universe(spark).select(
        "doc_id",
        "variant",
        F.expr(f"transform({_CHUNKS_SPARK}, q -> q.cmd5)").alias("cdc5"),
        F.expr(_FCHUNKS_SPARK).alias("fix5"),
    ).persist()
    inst = ch.select(
        "doc_id", "variant", F.lit("cdc").alias("scheme"),
        F.explode("cdc5").alias("cmd5"),
    ).unionAll(
        ch.select(
            "doc_id", "variant", F.lit("fix").alias("scheme"),
            F.explode("fix5").alias("cmd5"),
        )
    )
    d = inst.distinct()
    o = d.where(F.col("variant") == "o").select("doc_id", "scheme", "cmd5")
    s = d.where(F.col("variant") == "s").select("doc_id", "scheme", "cmd5")
    shared = o.join(s, ["doc_id", "scheme", "cmd5"]).groupBy(
        "doc_id", "scheme"
    ).agg(F.count(F.lit(1)).alias("shared"))
    base = (
        d.where(F.col("variant") == "o")
        .groupBy("doc_id")
        .agg(
            F.countDistinct(
                F.when(F.col("scheme") == "cdc", F.col("cmd5"))
            ).alias("n_cdc"),
            F.countDistinct(
                F.when(F.col("scheme") == "fix", F.col("cmd5"))
            ).alias("n_fix"),
        )
    )
    sc = shared.where(F.col("scheme") == "cdc").select(
        "doc_id", F.col("shared").alias("shared_cdc")
    )
    sf = shared.where(F.col("scheme") == "fix").select(
        "doc_id", F.col("shared").alias("shared_fix")
    )
    return (
        base.join(sc, "doc_id", "left")
        .join(sf, "doc_id", "left")
        .select(
            "doc_id",
            "n_cdc",
            F.coalesce("shared_cdc", F.lit(0)).cast("long").alias(
                "shared_cdc"
            ),
            "n_fix",
            F.coalesce("shared_fix", F.lit(0)).cast("long").alias(
                "shared_fix"
            ),
        )
    )


# ---------------------------------------------------------------------------
# T46 — corpus-level chunk-store dedup savings, CDC vs fixed
# ---------------------------------------------------------------------------


@register(
    "cdc_dedup_stats",
    oracle=synth_sql(_N)
    + _UNI_DUCK
    + f"""
    , ch AS (
      SELECT doc_id, variant, {_CHUNKS_DUCK} AS cdc,
             {_FCHUNKS_DUCK} AS fix5, nt FROM ub
    ),
    inst AS (
      SELECT 'cdc' AS scheme, q.cmd5 AS cmd5, q.clen::BIGINT AS clen
      FROM ch, unnest(cdc) AS t(q)
      UNION ALL
      SELECT 'fix' AS scheme, fix5[c0 + 1] AS cmd5,
             least({_FIX}, nt - c0 * {_FIX})::BIGINT AS clen
      FROM ch, unnest(range(0, len(fix5))) AS t(c0)
    ),
    per AS (
      SELECT scheme, cmd5, count(*)::BIGINT AS cnt, min(clen) AS clen
      FROM inst GROUP BY 1, 2
    )
    SELECT scheme,
           sum(cnt)::BIGINT AS total_chunks,
           count(*)::BIGINT AS distinct_chunks,
           sum(cnt * clen)::BIGINT AS total_tokens,
           sum(clen)::BIGINT AS stored_tokens,
           sum((cnt - 1) * clen)::BIGINT AS saved_tokens,
           CAST(floor(CAST(sum((cnt - 1) * clen) AS DOUBLE)
                / CAST(sum(cnt * clen) AS DOUBLE)
                * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS DOUBLE) / CAST(10000.0 AS DOUBLE) AS saved_ratio
    FROM per GROUP BY 1
    """,
)
def cdc_dedup_stats(spark, sf_dir):
    """T46: the chunk-store view of the same universe — if every chunk
    instance went into a content-addressed store, how many tokens does
    each scheme actually store vs dedupe away?  The shifted twins make
    the corpus ~50% redundant; CDC recovers nearly all of it (every
    re-synced chunk is stored once), fixed-width recovers almost none.
    Exact int64 throughout; the one ratio uses the engine-identical
    floor(x*1e4+0.5)/1e4 spelling.  Plan: chunk instances groupBy'd on
    md5 (map-side combined) then a 2-row rollup — at 100 TB this is
    the canonical exact-dedup shuffle, moving only (md5, len) pairs."""
    # persist: both union branches (cdc + fixed instances) scan this.
    ch = _universe(spark).select(
        "doc_id",
        "variant",
        "nt",
        F.expr(_CHUNKS_SPARK).alias("cdc"),
        F.expr(_FCHUNKS_SPARK).alias("fix5"),
    ).persist()
    ci = ch.select(
        F.lit("cdc").alias("scheme"),
        F.explode("cdc").alias("c"),
    ).select("scheme", F.col("c.cmd5").alias("cmd5"),
             F.col("c.clen").cast("long").alias("clen"))
    fi = ch.select(
        "nt", F.posexplode("fix5").alias("c", "cmd5")
    ).select(
        F.lit("fix").alias("scheme"),
        "cmd5",
        F.least(F.lit(_FIX), F.col("nt") - F.col("c") * _FIX)
        .cast("long")
        .alias("clen"),
    )
    per = ci.unionAll(fi).groupBy("scheme", "cmd5").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("clen").alias("clen")
    )
    saved = F.sum((F.col("cnt") - 1) * F.col("clen")).cast("double")
    total = F.sum(F.col("cnt") * F.col("clen")).cast("double")
    return per.groupBy("scheme").agg(
        F.sum("cnt").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).alias("total_tokens"),
        F.sum("clen").alias("stored_tokens"),
        F.sum((F.col("cnt") - 1) * F.col("clen")).alias("saved_tokens"),
        (F.floor(saved / total * 10000.0 + 0.5).cast("double") / 10000.0)
        .alias("saved_ratio"),
    )


# ---------------------------------------------------------------------------
# T50 — chunk-store provenance: net-new vs reused tokens per doc
# ---------------------------------------------------------------------------


@register(
    "cdc_provenance",
    oracle=synth_sql(_N)
    + _UNI_DUCK
    + f"""
    , ch AS (
      SELECT doc_id, variant,
             CASE WHEN variant = 'o'
                  THEN CAST(substr(doc_id, 4) AS BIGINT)
                  ELSE CAST(substr(doc_id, 4) AS BIGINT) + {_N} END AS i,
             {_CHUNKS_DUCK} AS chunks, nt
      FROM ub
    ),
    inst AS (
      SELECT doc_id, variant, i, q.cmd5 AS cmd5, q.clen::BIGINT AS clen
      FROM ch, unnest(chunks) AS t(q)
    ),
    fo AS (SELECT cmd5, min(i) AS first_i FROM inst GROUP BY 1),
    pj AS (
      SELECT inst.doc_id, inst.variant, inst.i, inst.clen,
             (fo.first_i = inst.i) AS is_first_doc, inst.cmd5
      FROM inst JOIN fo USING (cmd5)
    ),
    per AS (
      SELECT doc_id, variant,
             sum(clen)::BIGINT AS total_tokens,
             sum(CASE WHEN is_first_doc THEN 0 ELSE clen END)::BIGINT
               AS reused_tokens,
             count(*)::BIGINT AS n_chunks
      FROM pj GROUP BY 1, 2
    ),
    store AS (
      SELECT doc_id, variant, sum(clen)::BIGINT AS new_store_tokens
      FROM (
        SELECT DISTINCT doc_id, variant, i, cmd5, clen
        FROM pj WHERE is_first_doc
      ) GROUP BY 1, 2
    )
    SELECT per.doc_id, per.variant, per.total_tokens, per.n_chunks,
           per.reused_tokens,
           coalesce(store.new_store_tokens, 0)::BIGINT AS new_store_tokens,
           CAST(floor(CAST(per.reused_tokens AS DOUBLE)
                / CAST(per.total_tokens AS DOUBLE)
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS frac_reused
    FROM per LEFT JOIN store USING (doc_id, variant)
    """,
)
def cdc_provenance(spark, sf_dir):
    """T50: dedup-aware storage accounting — per doc (in deterministic
    stream order: originals first, twins at index i + N), how many of
    its tokens are REUSED from chunks first seen in an earlier doc vs
    how many NET-NEW tokens it adds to a content-addressed chunk store
    (distinct first-occurring chunks, each counted once).  This is the
    per-document bill a dedup-at-ingest pipeline reads: originals pay
    full price, prefix-edited twins pay only their edit-touched chunks.
    Convention (same as T47): a chunk is 'new' for every instance in
    its FIRST doc, 'reused' elsewhere.  All int64 + one floor-1e6
    fraction.  Plan: scan-side chunking, one map-side-combined chunk
    min-reduce, a chunk-keyed join (the exact-dedup shuffle shape),
    and a per-doc reduce."""
    ch = _universe(spark).select(
        "doc_id",
        "variant",
        F.expr(
            f"CASE WHEN variant = 'o' THEN CAST(substr(doc_id, 4) AS BIGINT)"
            f" ELSE CAST(substr(doc_id, 4) AS BIGINT) + {_N} END"
        ).alias("i"),
        F.explode(F.expr(_CHUNKS_SPARK)).alias("q"),
    ).select(
        "doc_id", "variant", "i",
        F.col("q.cmd5").alias("cmd5"),
        F.col("q.clen").cast("long").alias("clen"),
    ).persist()
    fo = ch.groupBy("cmd5").agg(F.min("i").alias("first_i"))
    pj = ch.join(fo, "cmd5").select(
        "doc_id", "variant", "i", "clen", "cmd5",
        (F.col("first_i") == F.col("i")).alias("is_first_doc"),
    )
    per = pj.groupBy("doc_id", "variant").agg(
        F.sum("clen").alias("total_tokens"),
        F.sum(
            F.when(F.col("is_first_doc"), 0).otherwise(F.col("clen"))
        ).alias("reused_tokens"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    store = (
        pj.where(F.col("is_first_doc"))
        .select("doc_id", "variant", "i", "cmd5", "clen")
        .distinct()
        .groupBy("doc_id", "variant")
        .agg(F.sum("clen").alias("new_store_tokens"))
    )
    frac = (
        F.floor(
            F.col("reused_tokens").cast("double")
            / F.col("total_tokens").cast("double")
            * 1000000.0
            + 0.5
        ).cast("double")
        / 1000000.0
    )
    return per.join(store, ["doc_id", "variant"], "left").select(
        "doc_id", "variant", "total_tokens", "n_chunks", "reused_tokens",
        F.coalesce("new_store_tokens", F.lit(0)).cast("long").alias(
            "new_store_tokens"
        ),
        frac.alias("frac_reused"),
    )
