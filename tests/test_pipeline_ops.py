"""Kernel gates for the training-data pipeline ops that have no SQL
oracle: SimHash vs a plain-Python oracle, winnowing fingerprints vs a
naive implementation, byte-histogram features vs numpy, LSH ANN recall
floor."""

import hashlib

import numpy as np
import pytest

from dtaidistance_spark.functions import fingerprint as FP
from dtaidistance_spark.operators import ann as A
from dtaidistance_spark.operators import dedup as D
from dtaidistance_spark.operators import multimodal as M


# ---------------------------------------------------------------------------
# winnowing: kernel vs naive reference
# ---------------------------------------------------------------------------


def naive_rolling(text: str, k: int):
    """O(n·k) reference Rabin-Karp."""
    b = text.encode("utf-8", "ignore")
    out = []
    for i in range(len(b) - k + 1):
        h = 0
        for c in b[i : i + k]:
            h = (h * FP.BASE + c) % FP.MOD
        out.append(h)
    return np.asarray(out, dtype=np.int64)


def naive_winnow(hashes, w):
    if len(hashes) == 0:
        return np.asarray(hashes)
    if len(hashes) <= w:
        return np.unique([min(hashes)])
    return np.unique(
        [min(hashes[i : i + w]) for i in range(len(hashes) - w + 1)]
    )


@pytest.mark.parametrize(
    "text", ["the quick brown fox jumps over the lazy dog", "aaaaaaaaaaaa", "ab", ""]
)
def test_winnowing_matches_naive(text):
    k, w = 8, 4
    fast = FP.rolling_hashes(text, k)
    slow = naive_rolling(text, k)
    assert np.array_equal(fast, slow)
    assert np.array_equal(FP.winnow(fast, w), naive_winnow(slow, w))


def test_fingerprint_detects_copies():
    base = "spark rolls up windows with barycenters " * 6
    near = base + "and a small suffix edit"
    other = "completely different content about nothing shared at all here"
    f1, f2, f3 = (FP.fingerprint(t) for t in (base, near, other))
    shared_near = len(np.intersect1d(f1, f2)) / min(len(f1), len(f2))
    shared_other = len(np.intersect1d(f1, f3)) / min(len(f1), len(f3))
    assert shared_near > 0.8 > shared_other


# ---------------------------------------------------------------------------
# simhash: Spark op vs plain-Python oracle (same xxhash via Spark)
# ---------------------------------------------------------------------------


def test_simhash_spark_matches_python(spark):
    import pandas as pd

    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",
        "one two three four five six",
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(3), "text": texts})
    )
    got = {
        r.doc_id: r.simhash for r in D.simhash64(docs).collect()
    }
    # python oracle using Spark's own xxhash64 for the word hashes
    wh = {}
    rows = spark.createDataFrame(
        pd.DataFrame({"w": sorted({w for t in texts for w in t.split()})})
    ).selectExpr("w", "xxhash64(concat('sim|', w)) AS h").collect()
    wh = {r.w: r.h for r in rows}
    for i, t in enumerate(texts):
        ws = t.lower().split(" ")
        bits = 0
        for b in range(64):
            ones = sum((wh[w] >> b) & 1 for w in ws)
            if 2 * ones > len(ws):
                bits |= 1 << b
        want = bits - (1 << 64) if bits >= 1 << 63 else bits
        assert got[i] == want, i
    # near-dup texts differ in few bits, unrelated in many
    h01 = bin((got[0] ^ got[1]) & ((1 << 64) - 1)).count("1")
    h02 = bin((got[0] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert h01 < h02


def test_simhash_candidates_complete(spark):
    """Banding must find EVERY pair within hamming<=3 (pigeonhole)."""
    import pandas as pd

    rng = np.random.default_rng(5)
    base = int(rng.integers(0, 1 << 62))
    fps = [base]
    for nbits in (1, 2, 3, 4, 17):  # flips spread across bands
        x = base
        for b in rng.choice(64, nbits, replace=False):
            x ^= 1 << int(b)
        fps.append(x)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(fps)), "simhash": fps})
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_candidates(df, max_hamming=3).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == 1
    assert (0, 2) in got and got[(0, 2)] == 2
    assert (0, 3) in got and got[(0, 3)] == 3
    assert (0, 4) not in got  # hamming 4: allowed to miss, must not pass filter
    assert (0, 5) not in got


# ---------------------------------------------------------------------------
# multimodal kernel vs numpy; ANN recall floor
# ---------------------------------------------------------------------------


def test_byte_histogram_matches_numpy():
    payload = hashlib.md5(b"x").digest() * 8
    h = M.byte_histogram(payload, bins=16)
    arr = np.frombuffer(payload, dtype=np.uint8)
    want = np.bincount(arr // 16, minlength=16) / len(arr)
    assert np.allclose(h, want)
    assert abs(h.sum() - 1.0) < 1e-12


def test_ann_lsh_recall_floor(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 8)
    approx = A.lsh_cosine_topk(emb, qs, dim=64, k=10, n_tables=16, n_planes=4)
    exact = A.brute_cosine_topk(emb, qs, k=10)
    rec = A.recall_at_k(approx, exact, k=10).collect()[0][0]
    assert rec >= 0.6, rec  # worst-case corpus; documented in ann_q


def test_ann_ivf_recall_floor_and_determinism(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 8)
    # centroids deterministic across calls (hash-ordered sample, fixed seed)
    c1 = A.train_ivf_centroids(emb, dim=64, n_list=16)
    c2 = A.train_ivf_centroids(emb.repartition(7), dim=64, n_list=16)
    assert np.array_equal(c1, c2)
    # unit-norm centroids (spherical k-means invariant)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    approx = A.ivf_cosine_topk(emb, qs, dim=64, k=10, n_list=16, n_probe=6)
    exact = A.brute_cosine_topk(emb, qs, k=10)
    rec = A.recall_at_k(approx, exact, k=10).collect()[0][0]
    assert rec >= 0.6, rec  # worst-case corpus; documented in ann_q
    # full probe == exact: with n_probe=n_list the cascade degenerates
    # to brute force, so the approximate tier must reproduce it
    full = A.ivf_cosine_topk(emb, qs, dim=64, k=10, n_list=16, n_probe=16)
    assert A.recall_at_k(full, exact, k=10).collect()[0][0] == 1.0


def test_audio_resample_matches_numpy(spark, sf_dir):
    """The Spark audio lane equals the local numpy pipeline exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    assets = M.make_assets(docs).persist()
    got = {
        r.asset_id: (r.n_samples, r.n_resampled, np.asarray(r.wave))
        for r in M.audio_resample(assets, dst_rate=8000).collect()
    }
    assert got
    for r in assets.where("kind = 'audio'").collect():
        raw = np.frombuffer(bytes(r.payload), dtype="<i2").astype(np.float64)
        want = np.round(M.pcm_resample(raw, 16000, 8000), 6)
        n_in, n_out, wave = got[r.asset_id]
        assert n_in == len(raw) and n_out == len(want)
        assert np.array_equal(wave, want)
    assets.unpersist()


def test_image_resize_matches_numpy(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    assets = M.make_assets(docs).persist()
    got = {r.asset_id: np.asarray(r.pixels) for r in M.image_resize(assets, 4, 4).collect()}
    assert got
    for r in assets.where("kind = 'image'").collect():
        raw = np.frombuffer(bytes(r.payload), dtype=np.uint8).astype(np.float64)
        gray = raw[: 8 * 16].reshape(8, 16)
        want = np.round(M.block_mean_resize(gray, 4, 4), 6).ravel()
        assert np.array_equal(got[r.asset_id], want)
    # block-mean invariant: resize preserves the global mean exactly for
    # divisible grids
    g = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert abs(M.block_mean_resize(g, 4, 4).mean() - g.mean()) < 1e-12
    assets.unpersist()


def test_lang_id_ngram_profiles():
    """Trigram-profile language ID separates real sample sentences and
    is deterministic; Spark query equals the local kernel row-by-row."""
    en = "the quick brown fox and the lazy dog are in the garden"
    fr = "le chat est dans la maison et le chien est dans le jardin que"
    de = "der hund und die katze sind in einem schönen garten und singen"
    es = "el perro y el gato están en la casa de los abuelos que quieren"
    assert FP.lang_id_ngram(en)[0] == "en"
    assert FP.lang_id_ngram(fr)[0] == "fr"
    assert FP.lang_id_ngram(de)[0] == "de"
    assert FP.lang_id_ngram(es)[0] == "es"
    assert FP.lang_id_ngram("")[0] == "und"
    assert FP.lang_id_ngram("zzz qqq xxx")[0] == "und"


def test_lang_id_ngram_spark_matches_local(spark, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import queries

    got = queries()["lang_id_ngram"](spark, sf_dir).limit(50).collect()
    assert got
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for r in got:
        lang, score = FP.lang_id_ngram(docs[r.doc_id])
        assert (r.pred_lang, r.score) == (lang, score), r.doc_id


# ---------------------------------------------------------------------------
# neardup connected components
# ---------------------------------------------------------------------------


def test_neardup_components_chain_and_islands(spark):
    """A 4-doc chain (a-b, b-c, c-d) must collapse to ONE component with
    min-id canonical even though a and d never pair directly (needs >1
    propagation round); a separate 2-doc island stays its own
    component; docs absent from any pair never appear."""
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": ["d_a", "d_b", "d_c", "x_1"],
                "id_b": ["d_b", "d_c", "d_d", "x_2"],
            }
        )
    )
    rows = {r.doc_id: r for r in D.neardup_components(pairs).collect()}
    assert set(rows) == {"d_a", "d_b", "d_c", "d_d", "x_1", "x_2"}
    for d in ("d_a", "d_b", "d_c", "d_d"):
        assert rows[d].component_id == "d_a"
        assert rows[d].cluster_size == 4
    assert rows["d_a"].is_canonical and not rows["d_b"].is_canonical
    for d in ("x_1", "x_2"):
        assert rows[d].component_id == "x_1"
        assert rows[d].cluster_size == 2
    assert rows["x_1"].is_canonical and not rows["x_2"].is_canonical
