"""Training-data deduplication operators over the ``documents`` table.

Scale-first design notes (the point of each op at 100 TB):

- ``exact_dedup``: one hash-shuffle on md5(text); Catalyst does a
  partial (map-side) aggregation first, so the shuffle carries one row
  per distinct digest per task, not one per document.
- ``minhash_lsh_pairs``: the scalable near-dup join. Candidate
  generation NEVER goes N²: shingles -> 64-permutation minhash
  signature computed as 64 ``min()`` aggregates (map-side combine; no
  row blowup) -> banded bucket hashes -> self-join on (band, hash) --
  the shuffle key is the bucket, so work scales with bucket sizes, not
  with N². Candidates are then verified with exact shingle Jaccard, so
  the OUTPUT is exact (and DuckDB-oracle-checkable) while the JOIN is
  sub-quadratic. Banding b=32, r=2 => P(candidate | j) = 1-(1-j²)^32:
  ~1.0 at j>=0.8, 0.27 at j=0.1 — tune per corpus.
- ``simhash64``: 64-bit SimHash (Charikar 2002) computed JVM-side with
  bit_count/bitwise SQL over word hashes; hamming-distance candidates
  via 4x16-bit band buckets (any pair within hamming<=3 shares >=1 of
  4 bands by pigeonhole).
- ``cosine_neardup_pairs``: brute-force exact pairs at small N /
  verification tier; the ANN scale path is in :mod:`.ann`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_MINHASH = 63
N_BANDS = 21  # r = N_MINHASH // N_BANDS = 3 rows per band:
# P(candidate | jaccard j) = 1-(1-j^3)^21 — ~1.0 at j>=0.8 (miss 3e-7),
# 0.02 at j=0.1 — an order of magnitude fewer false candidates than r=2
# at the same detection floor, which is what bounds verify-join cost


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens of lowercased text — the shared tokenization
    contract with the DuckDB oracles (string_split(lower(text), ' '))."""
    return df.withColumn("_ws", F.split(F.lower(F.col(text_col)), " "))


def shingles(
    df: DataFrame, k: int = 3, text_col: str = "text", hashed: bool = True
) -> DataFrame:
    """Distinct word k-gram shingles per document (docs with < k words
    are dropped — no shingle set).

    ``hashed=True`` (default) emits each shingle as ``xxhash64(w1..wk)``
    (array<long>) instead of the concatenated string: no string
    allocation in the hot transform, cheaper array_intersect in verify,
    and the minhash stage starts from already-hashed grams. Set
    semantics are identical w.h.p. (64-bit collisions ~1e-9 at 1e5
    shingles/doc), so exact-Jaccard outputs match the string-shingle
    DuckDB oracle value-for-value."""
    d = tokenize(df, text_col)
    d = d.where(F.size("_ws") >= k)
    idx = F.sequence(F.lit(0), F.size("_ws") - k)
    words = lambda i: [F.element_at("_ws", (i + j + 1).cast("int")) for j in range(k)]
    if hashed:
        grams = F.transform(idx, lambda i: F.xxhash64(*words(i)))
    else:
        grams = F.transform(idx, lambda i: F.concat_ws(" ", *words(i)))
    return d.withColumn("_sh", F.array_distinct(grams)).drop("_ws")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content digest: one row per distinct text with the
    canonical keeper (min id) and the duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signature(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """N_MINHASH-permutation minhash signature, computed as N_MINHASH
    ``min()`` aggregates over the exploded (doc, shingle) rows —
    map-side combine keeps the shuffle at one row per doc.

    Each shingle is hashed to a long ONCE (for hashed shingles the gram
    already IS the base hash); the permutations are ``xxhash64(base, i)``
    over (long, int) — measured ~4x cheaper than hashing
    per-permutation string concatenations."""
    ex = sh.select(id_col, F.explode("_sh").alias("_g"))
    if dict(sh.dtypes)["_sh"] == "array<bigint>":
        ex = ex.withColumnRenamed("_g", "_g0")
    else:
        ex = ex.select(id_col, F.xxhash64("_g").alias("_g0"))
    hashes = [
        F.xxhash64(F.col("_g0"), F.lit(i)).alias(f"_h{i}")
        for i in range(N_MINHASH)
    ]
    ex = ex.select(id_col, *hashes)
    sig = ex.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_m{i}") for i in range(N_MINHASH)]
    )
    return sig


def lsh_candidates(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded LSH: hash each band of the signature to a bucket, emit
    (band, bucket) keys, self-join. Returns distinct (id_a, id_b)."""
    r = N_MINHASH // N_BANDS
    bands = F.array(
        *[
            F.xxhash64(F.lit(b), *[F.col(f"_m{b * r + j}") for j in range(r)])
            for b in range(N_BANDS)
        ]
    )
    keyed = sig.select(
        F.col(id_col).alias("_id"), F.posexplode(bands).alias("_band", "_bucket")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def verify_jaccard(
    cands: DataFrame, sh: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate pairs (stage 2 of
    the LSH cascade — makes the output exact regardless of banding)."""
    sets = sh.select(F.col(id_col).alias("_sid"), F.col("_sh"))
    out = (
        cands.join(sets.withColumnRenamed("_sh", "_sa"), F.col("id_a") == F.col("_sid"))
        .drop("_sid")
        .join(sets.withColumnRenamed("_sh", "_sb"), F.col("id_b") == F.col("_sid"))
        .drop("_sid")
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.size("_sa") + F.size("_sb") - F.col("_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float = 0.8, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
    persist_shingles: bool = True,
) -> DataFrame:
    """Near-duplicate pairs at shingle-Jaccard >= threshold via
    MinHash+LSH candidates, exactly verified.

    The shingle stage (interpreted higher-order functions) is consumed
    three times (signature + both verify sides); ``persist_shingles``
    caches it, which is the local stand-in for what a production
    pipeline does anyway — materialize shingles/signatures as a table
    (like the LB_Keogh envelopes) rather than recompute per join."""
    sh = shingles(docs, k=k, text_col=text_col)
    if persist_shingles:
        sh = sh.persist()
    # the signature (one narrow row per doc) feeds BOTH sides of the
    # LSH bucket self-join; persist so it is computed once — at scale
    # this is the materialized signature table a production pipeline
    # keeps alongside the corpus.
    sig = minhash_signature(sh, id_col=id_col)
    if persist_shingles:
        sig = sig.persist()
    cands = lsh_candidates(sig, id_col=id_col)
    return verify_jaccard(cands, sh, threshold, id_col=id_col)


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Brute-force exact shingle-Jaccard pairs (the small-N oracle twin
    of minhash_lsh_pairs; also the verification tier on samples)."""
    sh = shingles(docs, k=k, text_col=text_col).select(
        F.col(id_col).alias("_id"), "_sh"
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.size("_sa") + F.size("_sb") - F.col("_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (Charikar 2002) — 64-bit fingerprint, JVM-side
# ---------------------------------------------------------------------------


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """SimHash per document: sign-sum of word-hash bits, entirely in
    Spark SQL (explode words -> per-bit +/-1 sums -> reassemble).

    ``portable=False`` (default, the scale path): 64-bit xxhash64 word
    hashes — fastest, but xxhash64 has no DuckDB twin, so the result is
    only Python-oracle-testable. ``portable=True``: 60-bit word hashes
    from the first 15 hex chars of md5('sim|' + word) — bit-identical
    reproducible in DuckDB SQL, which makes the whole near-dup pair
    list drive-by-oracle checkable (see ``simhash_neardups_md5``)."""
    n_bits = 60 if portable else 64
    d = tokenize(docs, text_col).select(
        id_col, F.explode("_ws").alias("_w")
    )
    if portable:
        d = d.withColumn(
            "_h",
            F.conv(
                F.substring(F.md5(F.concat(F.lit("sim|"), F.col("_w"))), 1, 15),
                16, 10,
            ).cast("long"),
        )
    else:
        d = d.withColumn("_h", F.xxhash64(F.concat(F.lit("sim|"), F.col("_w"))))
    # per bit: contribution +1 if bit set else -1 => sum = 2*ones - n
    bit_sums = [
        F.sum(F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(F.lit(1))).alias(f"_b{i}")
        for i in range(n_bits)
    ]
    agg = d.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *bit_sums)
    # balanced OR-reduction: a 64-deep left chain makes Catalyst
    # analysis quadratic (measured ~27s per query); depth log2(64)=6
    terms = [
        F.shiftleft((F.col(f"_b{i}") * 2 > F.col("_n")).cast("long"), i)
        for i in range(n_bits)
    ]
    while len(terms) > 1:
        terms = [
            terms[i].bitwiseOR(terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return agg.select(id_col, terms[0].alias("simhash"))


def simhash_candidates(
    fps: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    n_bands: int = 4,
    band_bits: int = 16,
) -> DataFrame:
    """Pairs within hamming distance <= max_hamming of their simhash.
    Pigeonhole banding: split the fingerprint into ``n_bands`` bands of
    ``band_bits`` bits; any pair with <= n_bands - 1 differing bits
    agrees on >= 1 band, so the bucket join finds every such pair, then
    bit_count verifies exactly. (60-bit portable fingerprints use
    n_bands=4, band_bits=15.)"""
    mask = (1 << band_bits) - 1
    bands = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), band_bits * b)
            .bitwiseAND(F.lit(mask))
            .cast("long")
            .alias(f"band{b}")
            for b in range(n_bands)
        ]
    )
    keyed = fps.select(
        F.col(id_col).alias("_id"),
        F.col("simhash").alias("_fp"),
        F.posexplode(bands).alias("_band", "_bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def cosine_neardup_pairs(
    emb: DataFrame, threshold: float = 0.4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine near-duplicate pairs via JVM-side array lambdas
    (zip_with dot product) — the brute-force tier; see :mod:`.ann` for
    the LSH-bucketed scale path."""
    v = emb.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.sqrt(
            F.aggregate(
                F.col(vec_col).cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
        ).alias("_n"),
    )
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    dot = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("_na") * F.col("_nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Near-dup connected components -> canonical doc per cluster
# ---------------------------------------------------------------------------


def neardup_components(
    pairs: DataFrame, max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph, then the
    canonical-doc assignment a dedup pipeline actually keeps: each doc
    appearing in >= 1 pair gets ``component_id`` = the smallest doc id
    reachable from it, plus the component size and an ``is_canonical``
    flag (the doc every other member is deduped against).

    Algorithm: iterative min-label propagation — labels start at the
    doc's own id; each round every vertex takes the min of its own label
    and its neighbours' labels (one shuffle join + one aggregate per
    round), stopping at the first round with zero changes. Near-dup
    graphs are unions of near-cliques (members of a dup cluster pair
    with most other members), so the label diameter is tiny and this
    converges in 2-3 rounds; for adversarially deep graphs the
    large-star/small-star formulation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") halves the diameter per round
    — same join shape, worth swapping in only if profiles show deep
    chains. Each round's frontier is persisted and the previous one
    dropped, so lineage stays O(1) deep and a 1000-executor run shuffles
    only the (vertex, label) pairs, never the corpus.

    ``pairs``: any DataFrame with ``id_a``/``id_b`` string columns
    (e.g. ``minhash_lsh_pairs`` / ``simhash_candidates`` output).
    """
    edges = pairs.select("id_a", "id_b")
    und = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    labels = (
        und.select(F.col("id_a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    labels.count()
    for _ in range(max_iter):
        nbr = (
            und.join(
                labels.select(F.col("id").alias("id_b"), "comp"), "id_b"
            )
            .groupBy("id_a")
            .agg(F.min("comp").alias("_nbr_min"))
            .select(F.col("id_a").alias("id"), "_nbr_min")
        )
        new = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("_nbr_min", F.col("comp"))
                ).alias("comp"),
                (F.coalesce("_nbr_min", F.col("comp")) < F.col("comp")).alias(
                    "_chg"
                ),
            )
            .persist()
        )
        changed = new.where("_chg").count()
        labels.unpersist()
        labels = new.select("id", "comp")
        if changed == 0:
            break
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    out = (
        # comp-keyed shuffle join (component count is data-dependent —
        # could be millions of dup clusters at corpus scale, so no
        # forced broadcast; AQE picks broadcast when sizes is tiny)
        labels.join(sizes, "comp")
        .select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("component_id"),
            "cluster_size",
            (F.col("id") == F.col("comp")).alias("is_canonical"),
        )
    )
    und.unpersist()
    return out


# ---------------------------------------------------------------------------
# T3-scale — prefix-filtered exact Jaccard join (PPJoin-style; Bayardo
# et al. WWW'07 / Chaudhuri et al. ICDE'06). Complete by the prefix-
# filter theorem: the globally-SMALLEST common shingle of any pair with
# jac >= t sits within the first |s| − ⌈t·|s|⌉ + 1 shingles of BOTH
# docs (jac >= t forces |A∩B| >= ⌈t·|s|⌉ on each side), so joining
# prefixes loses nothing — and prefixes are sorted rarest-first so the
# join keys are the most selective shingles in the corpus.
# ---------------------------------------------------------------------------


def jaccard_prefix_pairs(
    docs: DataFrame, threshold: float = 0.8, k: int = 3,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard >= threshold pairs WITHOUT the N² cross join: doc
    shingle lists are ordered by (document frequency, shingle) — one
    vocab-sized df aggregate broadcast back — and only the
    |s| − ⌈t·|s|⌉ + 1 rarest shingles of each doc enter the candidate
    join. Candidates are then verified with the same exact
    array_intersect Jaccard as the brute tier, so the output is
    IDENTICAL row-for-row (same oracle)."""
    t_num, t_den = int(round(threshold * 10)), 10  # exact rational
    sh = shingles(docs, k=k, text_col=text_col).select(
        F.col(id_col).alias("_id"), "_sh"
    )
    ex = sh.select("_id", F.explode("_sh").alias("_g"))
    df_tab = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (
        ex.join(df_tab, "_g")
        .groupBy("_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(_df, _g))),"
                   " s -> s._g)").alias("_ord")
        )
    )
    # p = n − ceil(t·n) + 1, ceil(a·n/b) = (a·n + b − 1) DIV b, exact ints
    pref = ordered.select(
        "_id",
        F.expr(
            f"slice(_ord, 1, size(_ord)"
            f" - (({t_num} * size(_ord) + {t_den} - 1) DIV {t_den}) + 1)"
        ).alias("_pref"),
    ).select("_id", F.explode("_pref").alias("_g"))
    cands = (
        pref.select(F.col("_id").alias("id_a"), "_g")
        .join(pref.select(F.col("_id").alias("id_b"), "_g"), "_g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.size("_sa") + F.size("_sb") - F.col("_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


def cc_star(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the scale tier next to ``neardup_components``'s label
    propagation: each round HALVES the component diameter (propagation
    moves labels one hop per round), so adversarially deep chains
    converge in O(log d) shuffles instead of O(d).

    large-star: every node attaches its LARGER neighbors to the
    minimum of its closed neighborhood; small-star (on edges directed
    large→small): every node attaches its smaller-or-equal neighbors
    and itself to that minimum. At the fixed point the edge set is a
    forest of stars (child → root); roots are component minima —
    identical output contract to ``neardup_components``.
    """
    edges = (
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .persist()
    )
    st = edges.agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(a, b))").alias("s")
    ).collect()[0]
    prev_n, prev_chk = st["n"], st["s"]
    for _ in range(max_iter):
        sym = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        lg = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            sym.join(lg, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
        )
        dirn = large.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        ).distinct()
        sg = dirn.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            dirn.join(sg, "a")
            .where(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(sg.select(F.col("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
            # localCheckpoint, not persist: the iteration would otherwise
            # grow the LOGICAL plan every round (persist only caches the
            # physical result) and AQE's plan-string rendering goes
            # quadratic-to-OOM on deep graphs
            .localCheckpoint()
        )
        # fixed point: star edges are invariant under both steps —
        # (count, order-free checksum) of the canonicalized (large,
        # small) edge set vs the previous round, ONE aggregate per round
        st = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(greatest(a, b), least(a, b)))").alias(
                "s"
            ),
        ).collect()[0]
        edges = small
        if st["n"] == prev_n and st["s"] == prev_chk:
            break
        prev_n, prev_chk = st["n"], st["s"]
    # edges are (child, root); roots are their own component
    members = edges.select(F.col("a").alias("id"), F.col("b").alias("comp"))
    roots = edges.select(F.col("b").alias("id")).distinct().withColumn(
        "comp", F.col("id")
    )
    comp = members.unionByName(roots).distinct()
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("component_id"),
            "cluster_size",
            (F.col("id") == F.col("comp")).alias("is_canonical"),
        )
    )
