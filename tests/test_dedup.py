

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
