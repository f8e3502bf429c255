"""Registry queries for the dedup operators (documents/embeddings
tables), each with a DuckDB oracle where SQL-expressible.

The tokenization contract shared with every oracle:
``string_split(lower(text), ' ')`` == Spark ``split(lower(text), ' ')``;
shingles are word trigrams, deduped (list_distinct/array_distinct);
docs with < 3 words drop out of shingle ops.

Spark-side shingles are HASHED (``xxhash64(w1,w2,w3)`` longs, see
``dedup.shingles``) while the DuckDB oracle builds the string trigrams —
set cardinalities and therefore every Jaccard value are identical
w.h.p. (64-bit collisions ~1e-9 at this scale), which the value-hash
compare in the driver sweep verifies end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import dedup as D
from dtaidistance_spark.operators.queries import T, register

_SHINGLE_CTE = """
    WITH w AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              FOR i IN range(1, len(ws) - 1)]) AS s
        FROM w WHERE len(ws) >= 3
    ),
    j AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
"""

_JACCARD_ORACLE = (
    _SHINGLE_CTE
    + """
    SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.8
"""
)


@register(
    "exact_dedup",
    oracle="""
    SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def exact_dedup(spark, sf_dir):
    return D.exact_dedup(T(spark, sf_dir, "documents"))


@register("minhash_lsh_neardups", oracle=_JACCARD_ORACLE)
def minhash_lsh_neardups(spark, sf_dir):
    """Sub-quadratic MinHash+LSH candidates, exactly verified — output
    must equal the brute-force SQL pairs at jaccard >= 0.8 (banding
    b=21, r=3 makes the miss probability ~3e-7 at j=0.8)."""
    return D.minhash_lsh_pairs(T(spark, sf_dir, "documents"), threshold=0.8)


@register("ngram_jaccard_pairs", oracle=_JACCARD_ORACLE)
def ngram_jaccard_pairs_q(spark, sf_dir):
    """Brute-force exact trigram-shingle Jaccard pairs (small-N tier)."""
    return D.ngram_jaccard_pairs(T(spark, sf_dir, "documents"), threshold=0.8)


@register("simhash_neardups")
def simhash_neardups(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 3 on 64-bit fingerprints);
    rows-only — xxhash64 has no DuckDB twin, the SimHash kernel is
    gated against a plain-Python oracle in tests/test_dedup.py (the
    fully-oracled portable twin is ``simhash_neardups_md5``)."""
    fps = D.simhash64(T(spark, sf_dir, "documents"))
    return D.simhash_candidates(fps, max_hamming=3).orderBy("id_a", "id_b")


@register(
    "simhash_neardups_md5",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ), hashed AS (
        SELECT doc_id, ('0x' || substr(md5('sim|' || w), 1, 15))::BIGINT AS h
        FROM words
    ), bitsum AS (
        SELECT doc_id, b, sum((h >> b) & 1) AS ones, count(*) AS n
        FROM hashed, (SELECT unnest(range(60)) AS b) GROUP BY 1, 2
    ), fp AS (
        SELECT doc_id,
               sum(CASE WHEN ones * 2 > n THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS f
        FROM bitsum GROUP BY 1
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.f, b.f)) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= 3
    """,
)
def simhash_neardups_md5(spark, sf_dir):
    """The portable SimHash twin, FULLY oracled: 60-bit md5-derived
    fingerprints (identical hex-prefix hash in both engines), 4x15-bit
    pigeonhole banding in Spark vs brute-force pairs in DuckDB — the
    oracle therefore also proves the banding loses no pair at
    hamming <= 3."""
    fps = D.simhash64(T(spark, sf_dir, "documents"), portable=True)
    return D.simhash_candidates(
        fps, max_hamming=3, n_bands=4, band_bits=15
    ).orderBy("id_a", "id_b")


@register(
    "cosine_neardup_pairs",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_inner_product(a.e, b.e)
                 / (sqrt(list_inner_product(a.e, a.e))
                    * sqrt(list_inner_product(b.e, b.e))), 4) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.e, b.e)
          / (sqrt(list_inner_product(a.e, a.e))
             * sqrt(list_inner_product(b.e, b.e))) >= 0.4
    """,
)
def cosine_neardup_pairs_q(spark, sf_dir):
    return D.cosine_neardup_pairs(T(spark, sf_dir, "embeddings"), threshold=0.4)


@register(
    "neardup_components",
    oracle=_SHINGLE_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
    e AS (SELECT id_a AS s, id_b AS d FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    reach(id, r) AS (
        SELECT s, s FROM e
        UNION
        SELECT s, d FROM e
        UNION
        SELECT e.s, reach.r FROM e JOIN reach ON e.d = reach.id
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    sizes AS (SELECT component_id, count(*) AS cluster_size
              FROM comp GROUP BY 1)
    SELECT comp.id AS doc_id, comp.component_id, sizes.cluster_size,
           comp.id = comp.component_id AS is_canonical
    FROM comp JOIN sizes USING (component_id)
    """,
)
def neardup_components_q(spark, sf_dir):
    """Dedup cluster assignment: connected components (iterative
    min-label propagation, one shuffle join per round) over the
    MinHash-LSH pair graph at jaccard >= 0.8, yielding the canonical
    doc per cluster; the oracle recomputes the transitive closure in
    DuckDB with a recursive CTE over the brute-force pair graph."""
    pairs = D.minhash_lsh_pairs(T(spark, sf_dir, "documents"), threshold=0.8)
    return D.neardup_components(pairs)


# ---------------------------------------------------------------------------
# T48 — MinHash+LSH recall audit against planted twin ground truth
# ---------------------------------------------------------------------------

_TW_N = 256


def _twin_universe(spark):
    """Orig + prefix-edited-twin token docs (the T44/T47 construction):
    every (doc, doc~s) pair is a KNOWN near-duplicate — twin shingle
    sets are supersets of the originals', so exact 5-gram Jaccard =
    |A|/|B| is high by construction and the 256 pairs form a planted
    ground truth for recall measurement."""
    from dtaidistance_spark import synth

    base = synth.sequences_df(spark, _TW_N).select(
        "doc_id",
        "n_tok",
        "tokens",
        F.conv(F.substring(F.md5("doc_id"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    pre = (
        "transform(sequence(1, CAST(1 + h % 7 AS INT)),"
        " s -> CAST((h % 50257 + s * 7919) % 50257 AS INT))"
    )
    return base.select(
        "doc_id", F.lit("o").alias("variant"), "n_tok", "tokens"
    ).unionAll(
        base.select(
            F.concat("doc_id", F.lit("~s")).alias("doc_id"),
            F.lit("s").alias("variant"),
            (F.col("n_tok") + (F.lit(1) + F.col("h") % 7).cast("int")).alias(
                "n_tok"
            ),
            F.expr(f"concat({pre}, tokens)").alias("tokens"),
        )
    )


@register("minhash_twin_recall")
def minhash_twin_recall(spark, sf_dir):
    """T48: end-to-end recall of the T2 MinHash+LSH candidate stage,
    measured against the planted twin ground truth — the quality
    evidence the dedup stack owes, exactly like the ANN recall checks.
    Token docs get hashed 5-gram shingle sets (``xxhash64`` over the
    window — the production shingle path), the N_MINHASH min()
    signature and banded bucket self-join run UNCHANGED from
    ``operators/dedup.py``, and the output row reports how many of the
    256 known near-dup pairs surfaced as candidates.  Rows-only
    (xxhash64 has no DuckDB twin); the oracled ground-truth side is
    ``minhash_twin_recall_check``, and the banding analysis (b=21 r=3:
    miss prob ≤ 3e-7 at j = 0.8) predicts recall = 1.0."""
    uni = _twin_universe(spark)
    sh = uni.withColumn(
        "_sh",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, size(tokens) - 5),"
                " j -> xxhash64(tokens[j], tokens[j + 1], tokens[j + 2],"
                " tokens[j + 3], tokens[j + 4]))"
            )
        ),
    ).persist()
    sig = D.minhash_signature(sh, id_col="doc_id").persist()
    cands = D.lsh_candidates(sig, id_col="doc_id")
    truth_found = cands.where(
        F.col("id_b") == F.concat(F.col("id_a"), F.lit("~s"))
    )
    n_found = truth_found.count()
    return spark.createDataFrame(
        [(int(_TW_N), int(n_found),
          __import__("math").floor(n_found / _TW_N * 1e4 + 0.5) / 1e4)],
        "n_truth_pairs long, n_found long, recall double",
    )




def _twin_check_oracle():
    """DuckDB re-derivation of the twin universe + exact gram Jaccard
    (the T47 CTE shapes; imports deferred to avoid import-order
    coupling at module load)."""
    from dtaidistance_spark.operators.synth_q import synth_sql
    from dtaidistance_spark.operators.tokenstats_q import _GRAMS_DUCK

    return (
        synth_sql(_TW_N)
        + f"""
    , hh AS (
      SELECT doc_id, n_tok, tokens,
             ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS h
      FROM synth
    ),
    uni AS (
      SELECT doc_id, 'o' AS variant, n_tok, tokens FROM hh
      UNION ALL
      SELECT doc_id, 's', n_tok + (1 + h % 7)::INT,
             list_concat(
               list_transform(range(1, 1 + (1 + h % 7)::INT),
                 s -> ((h % 50257 + s * 7919) % 50257)::INT),
               tokens)
      FROM hh
    ),
    gr AS (
      SELECT DISTINCT doc_id, variant, q.g1 AS g1, q.g2 AS g2
      FROM uni, unnest({_GRAMS_DUCK}) AS t(q)
    ),
    o AS (SELECT doc_id, g1, g2 FROM gr WHERE variant = 'o'),
    s AS (SELECT doc_id, g1, g2 FROM gr WHERE variant = 's'),
    i AS (
      SELECT o.doc_id, count(*)::BIGINT AS inter
      FROM o JOIN s USING (doc_id, g1, g2) GROUP BY 1
    ),
    na AS (SELECT doc_id, count(*)::BIGINT AS sh_o FROM o GROUP BY 1),
    nb AS (SELECT doc_id, count(*)::BIGINT AS sh_s FROM s GROUP BY 1)
    SELECT doc_id, sh_o, sh_s, inter,
           (sh_o + sh_s - inter)::BIGINT AS uni,
           CAST(floor(CAST(inter AS DOUBLE)
                / CAST(sh_o + sh_s - inter AS DOUBLE)
                * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                AS DOUBLE) / CAST(1000000.0 AS DOUBLE) AS jaccard
    FROM na JOIN nb USING (doc_id) JOIN i USING (doc_id)
    """
    )


@register(
    "minhash_twin_recall_check",
    oracle=_twin_check_oracle(),
)
def minhash_twin_recall_check(spark, sf_dir):
    """T48-check (fully oracled): the exact ground truth the recall is
    measured against — per twin pair, the exact 5-gram Jaccard from
    the T47 double-31-bit gram pair key (no xxhash64 anywhere), with
    the intersection computed RELATIONALLY (exploded distinct grams,
    per-doc join) rather than by array-intersect builtins.  The subset
    property (twin grams ⊇ orig grams, so inter = |A|) is verified in
    data, not assumed.  All int64 + one floor-1e6 float."""
    from dtaidistance_spark.operators.tokenstats_q import _GRAMS_SPARK

    uni = _twin_universe(spark).withColumn("n_tok", F.size("tokens"))
    gr = (
        uni.select(
            "doc_id", "variant",
            F.explode(F.expr(_GRAMS_SPARK)).alias("q"),
        )
        .select(
            F.expr("replace(doc_id, '~s', '')").alias("doc_id"),
            "variant",
            F.col("q.g1").alias("g1"),
            F.col("q.g2").alias("g2"),
        )
        .distinct()
    )
    o = gr.where(F.col("variant") == "o").drop("variant")
    s = gr.where(F.col("variant") == "s").drop("variant")
    inter = o.join(s, ["doc_id", "g1", "g2"]).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("inter")
    )
    na = o.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sh_o"))
    nb = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sh_s"))
    j = na.join(nb, "doc_id").join(inter, "doc_id")
    uni_sz = F.col("sh_o") + F.col("sh_s") - F.col("inter")
    jacc = (
        F.floor(
            F.col("inter").cast("double") / uni_sz.cast("double") * 1000000.0
            + 0.5
        ).cast("double")
        / 1000000.0
    )
    return j.select(
        "doc_id", "sh_o", "sh_s", "inter",
        uni_sz.cast("long").alias("uni"),
        jacc.alias("jaccard"),
    )



@register("jaccard_prefix_join", oracle=_JACCARD_ORACLE)
def jaccard_prefix_join(spark, sf_dir):
    """T3 SCALE tier: prefix-filtered exact Jaccard join (PPJoin-style)
    — provably the same pairs as the brute N² tier (same oracle), but
    candidates come from joining only each doc's |s| − ⌈0.8·|s|⌉ + 1
    rarest shingles (rarest-first canonical order from one vocab-sized
    df aggregate). At corpus scale the candidate join is driven by the
    most selective shingles instead of an all-pairs product; the brute
    tier stays as the small-N verification twin."""
    return D.jaccard_prefix_pairs(
        T(spark, sf_dir, "documents"), threshold=0.8
    )


@register(
    "neardup_components_star",
    oracle=_SHINGLE_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
    e AS (SELECT id_a AS s, id_b AS d FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    reach(id, r) AS (
        SELECT s, s FROM e
        UNION
        SELECT s, d FROM e
        UNION
        SELECT e.s, reach.r FROM e JOIN reach ON e.d = reach.id
    ),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id),
    sizes AS (SELECT component_id, count(*) AS cluster_size
              FROM comp GROUP BY 1)
    SELECT comp.id AS doc_id, comp.component_id, sizes.cluster_size,
           comp.id = comp.component_id AS is_canonical
    FROM comp JOIN sizes USING (component_id)
    """,
)
def neardup_components_star(spark, sf_dir):
    """T6 SCALE tier: large-star/small-star connected components
    (Kiveris SoCC'14) over the same MinHash-LSH pair graph — diameter
    HALVES per round (label propagation moves one hop per round), so
    deep chains need O(log d) shuffles. Identical output contract and
    identical recursive-CTE oracle as ``neardup_components``; the
    propagation tier remains the simple-graph default."""
    pairs = D.minhash_lsh_pairs(T(spark, sf_dir, "documents"), threshold=0.8)
    return D.cc_star(pairs)
