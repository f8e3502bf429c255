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
