

def test_minhash_twin_recall_is_total(spark, sf_dir):
    """T48: the LSH candidate stage finds every planted twin pair, and
    the oracled ground truth behaves as constructed (twin shingle sets
    are supersets: inter == sh_o; Jaccard high)."""
    from dtaidistance_spark.operators.dedup_q import (
        minhash_twin_recall,
        minhash_twin_recall_check,
    )

    rec = minhash_twin_recall(spark, sf_dir).toPandas()
    assert rec.n_truth_pairs[0] == 256
    assert rec.n_found[0] == 256 and rec.recall[0] == 1.0
    chk = minhash_twin_recall_check(spark, sf_dir).toPandas()
    assert len(chk) == 256
    assert (chk.inter == chk.sh_o).all()          # subset property
    assert (chk.jaccard >= 0.7).all()
    assert chk.jaccard.median() > 0.95


def test_jaccard_prefix_join_equals_brute_and_prunes(spark, sf_dir):
    """T3 scale tier: identical pairs to the N² tier, with the
    candidate space measurably pruned (the point of prefix filtering)."""
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    brute = (
        D.ngram_jaccard_pairs(docs, threshold=0.8)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    fast = (
        D.jaccard_prefix_pairs(docs, threshold=0.8)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert brute.equals(fast)
    # candidate pruning: count pairs surviving the prefix join vs N^2/2
    sh = D.shingles(docs).select(F.col("doc_id").alias("_id"), "_sh")
    n = sh.count()
    ex = sh.select("_id", F.explode("_sh").alias("_g"))
    dft = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (
        ex.join(dft, "_g")
        .groupBy("_id")
        .agg(F.expr(
            "transform(array_sort(collect_list(struct(_df, _g))), s -> s._g)"
        ).alias("_ord"))
    )
    pref = ordered.select(
        "_id",
        F.expr(
            "slice(_ord, 1, size(_ord) - ((8 * size(_ord) + 9) DIV 10) + 1)"
        ).alias("_p"),
    ).select("_id", F.explode("_p").alias("_g"))
    cands = (
        pref.select(F.col("_id").alias("a"), "_g")
        .join(pref.select(F.col("_id").alias("b"), "_g"), "_g")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )
    assert cands < n * (n - 1) // 2 / 4  # >4x fewer than all-pairs


def test_cc_star_equals_propagation_and_halves_deep_chains(spark, sf_dir):
    from dtaidistance_spark.operators import dedup as D

    # deep path graph: the adversarial case for label propagation
    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)],
        "id_a string, id_b string",
    )
    out = D.cc_star(chain).toPandas()
    assert (out["component_id"] == "n000").all()
    assert (out["cluster_size"] == 41).all()
    assert out["is_canonical"].sum() == 1
    # equality with the propagation tier on the real LSH pair graph
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.8).persist()
    a = (
        D.neardup_components(pairs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        D.cc_star(pairs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
