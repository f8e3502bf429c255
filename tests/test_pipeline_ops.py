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


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


def test_pq_codes_deterministic_and_bounded(spark, sf_dir):
    """PQ encoding is seeded + partitioning-independent: same codes on
    every run and under a different partitioning; every sub-code in
    [0, ks)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = A.train_pq_codebooks(emb, dim=64, m=16, ks=64)
    assert books.shape == (16, 64, 4)
    a = {
        r.vec_id: list(r.pq_code)
        for r in A.encode_pq(emb, books).select("vec_id", "pq_code").collect()
    }
    b = {
        r.vec_id: list(r.pq_code)
        for r in A.encode_pq(emb.repartition(7), books)
        .select("vec_id", "pq_code")
        .collect()
    }
    assert a == b
    assert all(0 <= c < 64 for codes in a.values() for c in codes)


def test_ivfpq_adc_matches_numpy_reconstruction(spark, sf_dir):
    """The ADC score Spark ranks by == the numpy codebook-reconstruction
    dot product, row for row (the gather form IS the per-subspace LUT
    sum, reordered)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = A.train_pq_codebooks(emb, dim=64, m=16, ks=64)
    qs = emb.where(F.col("vec_id") < 2)
    got = A.ivf_pq_topk(
        emb, qs, dim=64, k=5, n_list=4, n_probe=4, m=16, ks=64,
        codebooks=books, by_residual=False, refine=None,
    ).collect()
    assert got, "no candidates returned"
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    codes = {
        r.vec_id: np.asarray(r.pq_code)
        for r in A.encode_pq(emb, books).select("vec_id", "pq_code").collect()
    }
    for r in got:
        q = vecs[r.query_id]
        q = q / np.linalg.norm(q)
        recon = books[np.arange(16), codes[r.nn_id]].reshape(64)
        # per-subspace LUT sum (classic ADC formulation)
        lut = sum(
            float(q[j * 4 : (j + 1) * 4] @ books[j, codes[r.nn_id][j]])
            for j in range(16)
        )
        assert abs(float(q @ recon) - lut) < 1e-9
        assert round(lut, 4) == pytest.approx(r.approx_cosine, abs=1e-4)


def test_ivfpq_full_probe_recall_floor(spark, sf_dir):
    """With every list probed, routing loss is zero and the remaining
    error is pure PQ distortion — recall@10 must clear the documented
    floor on the worst-case near-uniform corpus."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 4)
    approx = A.ivf_pq_topk(
        emb, qs, dim=64, k=10, n_list=8, n_probe=8, m=16, ks=64
    )
    exact = A.brute_cosine_topk(emb, qs, k=10)
    rec = A.recall_at_k(approx, exact, k=10).collect()[0].recall_at_k
    assert rec >= 0.5, rec


# ---------------------------------------------------------------------------
# unigram logprob quality filter
# ---------------------------------------------------------------------------


def test_unigram_logprob_matches_local(spark, sf_dir):
    """Spark unigram-LM scores == plain-Python Counter computation,
    doc for doc (round 4), keep flag consistent with the threshold."""
    import math
    from collections import Counter

    from dtaidistance_spark.operators.text_q import unigram_logprob

    got = {r.doc_id: r for r in unigram_logprob(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text.lower().split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    cnt = Counter(t for ws in docs.values() for t in ws)
    tot = sum(cnt.values())
    assert set(got) == set(docs)
    for doc_id, ws in docs.items():
        anlp = sum(-math.log(cnt[t] / tot) for t in ws) / len(ws)
        r = got[doc_id]
        assert r.n_tok == len(ws)
        assert r.avg_neg_logprob == pytest.approx(round(anlp, 4), abs=1e-4)
        assert r.keep == (anlp <= 3.45)


def test_gopher_repetition_flags_spam(spark, tmp_path):
    """The synthetic corpus has zero duplicated 5-grams, so exercise the
    repetition branches directly: a spam doc (one bigram looping) must
    show top_2gram_frac ~1 and dup_5gram_frac 1 and be dropped; a
    diverse doc passes; a doc of huge 'words' fails the word-length
    band."""
    import pandas as pd

    from dtaidistance_spark.operators.text_q import gopher_repetition

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "buy now " * 20,
                " ".join(f"word{i}" for i in range(60)),
                "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb cccccccccccccccc",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    docs["text"] = docs["text"].str.strip()
    sf = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(docs), f"{sf}/documents.parquet")
    rows = {r.doc_id: r for r in gopher_repetition(spark, sf).collect()}
    spam, good, longw = rows[1], rows[2], rows[3]
    assert spam.dup_5gram_frac == 1.0 and spam.top_2gram_frac > 0.4
    assert not spam.keep
    assert good.dup_5gram_frac == 0.0 and good.keep
    assert longw.mean_word_len > 10 and not longw.keep


def test_sequence_packing_invariants(spark, sf_dir):
    """Packing must tile: per doc the spans cover [0, n_tok) contiguously;
    per source stream every window except the last is exactly full."""
    from collections import defaultdict

    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.synth_q import sequence_packing, _N

    rows = sequence_packing(spark, sf_dir).collect()
    n_tok = {r.doc_id: r.n_tok for r in synth.sequences_df(spark, _N).collect()}
    per_doc = defaultdict(list)
    per_chunk = defaultdict(int)
    for r in rows:
        assert r.n_span == r.tok_end - r.tok_start > 0
        per_doc[r.doc_id].append((r.chunk_id, r.tok_start, r.tok_end))
        per_chunk[(r.source, r.chunk_id)] += r.n_span
    assert set(per_doc) == set(n_tok)
    for doc_id, spans in per_doc.items():
        spans.sort()
        assert spans[0][1] == 0 and spans[-1][2] == n_tok[doc_id]
        for (c0, _, e0), (c1, s1, _) in zip(spans, spans[1:]):
            assert c1 == c0 + 1 and s1 == e0  # contiguous, one span/window
    for src in {s for s, _ in per_chunk}:
        chunks = sorted(c for s, c in per_chunk if s == src)
        for c in chunks[:-1]:
            assert per_chunk[(src, c)] == 2048, (src, c)
        assert 0 < per_chunk[(src, chunks[-1])] <= 2048


def test_dsir_weights_favor_target_domain(spark, sf_dir):
    """DSIR importance weights must rank the target domain (lang='en')
    above every other language on average — the defining property of
    importance resampling — and be finite for every doc."""
    import math
    from collections import defaultdict

    from dtaidistance_spark.operators.text_q import dsir_weights

    rows = dsir_weights(spark, sf_dir).collect()
    by_lang = defaultdict(list)
    for r in rows:
        assert math.isfinite(r.dsir_weight)
        by_lang[r.lang].append(r.dsir_weight)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    assert set(means) > {"en"}
    for lang, mu in means.items():
        if lang != "en":
            assert means["en"] > mu, (lang, mu, means["en"])


def test_ivfpq_residual_refine_beats_raw_adc(spark, sf_dir):
    """The two FAISS lifts must actually lift: residual codes + exact
    refine of the 4k ADC pool reach at least the raw-ADC recall (and in
    practice sit near the IVF-Flat ceiling; measured 0.925/0.85 at
    sf0.001/sf0.01), and the refined ranking's scores are true cosines
    (each row matches the exact tier's score for that pair)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 4)
    exact = A.brute_cosine_topk(emb, qs, k=10).persist()
    raw = A.ivf_pq_topk(
        emb, qs, dim=64, k=10, n_list=16, n_probe=10, m=16, ks=64,
        by_residual=False, refine=None,
    )
    lifted = A.ivf_pq_topk(
        emb, qs, dim=64, k=10, n_list=16, n_probe=10, m=16, ks=64,
        by_residual=True, refine=4,
    ).persist()
    r_raw = A.recall_at_k(raw, exact, k=10).collect()[0].recall_at_k
    r_lift = A.recall_at_k(lifted, exact, k=10).collect()[0].recall_at_k
    assert r_lift >= max(r_raw, 0.7), (r_raw, r_lift)
    # refined scores are exact cosines: compare vs the brute tier
    exact_scores = {
        (r.query_id, r.nn_id): r.cosine for r in exact.collect()
    }
    hits = 0
    for r in lifted.collect():
        key = (r.query_id, r.nn_id)
        if key in exact_scores:
            assert r.approx_cosine == pytest.approx(
                exact_scores[key], abs=1e-4
            )
            hits += 1
    assert hits >= 20


def test_props_json_rollup_matches_pandas(spark, sf_dir):
    import json

    import pandas as pd

    from dtaidistance_spark.operators.queries import props_json_rollup

    out = props_json_rollup(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["k"] = ev["props"].map(lambda s: json.loads(s).get("k"))
    ev = ev[ev.k.notna()]
    ev["kb"] = ev["k"].astype(int) // 10
    grp = ev.groupby(["event_type", "kb"])
    assert len(out) == len(grp)
    idx = out.set_index(["event_type", "k_bucket"])
    for (et, kb), g in grp:
        row = idx.loc[(et, kb)]
        assert row["n"] == len(g)
        assert row["sum_k"] == g["k"].sum()
        assert row["n_distinct_k"] == g["k"].nunique()
        assert abs(row["sum_value"] - g["value"].sum()) < 1e-5


def test_embed_decontaminate_matches_numpy(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from dtaidistance_spark.operators.ann_q import embed_decontaminate

    out = embed_decontaminate(spark, sf_dir).toPandas().set_index("label")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    q, c = Xn[:8], Xn[8:]
    best = (c @ q.T).max(axis=1)
    lab = emb.label.to_numpy()[8:]
    for label in np.unique(lab):
        m = lab == label
        row = out.loc[label]
        assert row.n_train == int(m.sum())
        assert row.n_contaminated == int((best[m] >= 0.35).sum())
        assert row.max_best == pytest.approx(best[m].max(), abs=2e-4)
    assert out.n_contaminated.sum() > 0  # threshold actually bites
    assert out.n_contaminated.sum() < out.n_train.sum() / 2


def test_ppm_roundtrip_and_dispatch():
    """T18b: the dependency-free PPM codec round-trips bit-exactly,
    P6 RGB decodes to integer-mean luma, decode_image dispatches on
    magic bytes, and the PIL guard still protects compressed formats."""
    import numpy as np
    import pytest

    from dtaidistance_spark.operators import multimodal as M

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(8, 16)).astype(np.uint8)
    assert (M.decode_ppm(M.encode_ppm(gray)) == gray).all()
    # dispatch goes through decode_image
    assert (M.decode_image(M.encode_ppm(gray)) == gray).all()
    # comment lines in the header are tolerated
    with_comment = b"P5\n# a comment\n16 8\n255\n" + gray.tobytes()
    assert (M.decode_ppm(with_comment) == gray).all()
    # P6 RGB -> integer-mean luma
    rgb = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
    p6 = b"P6\n5 4\n255\n" + rgb.tobytes()
    luma = M.decode_ppm(p6)
    assert (luma == rgb.astype(np.int64).sum(2) // 3).all()
    # compressed formats keep the honest guard (no PIL here)
    if not M._HAS_PIL:
        with pytest.raises(NotImplementedError, match="JPEG/PNG"):
            M.decode_image(b"\x89PNG\r\n\x1a\n....")
    # truncated headers raise instead of hanging (the header scans are
    # bounded: b'' at end-of-bytes is neither whitespace nor consumed,
    # so an unbounded loop would spin forever)
    for bad in (b"P5", b"P5\n", b"P5\n# only a comment", b"P5\n16",
                b"P5\n16 8", b"P6\n16 8"):
        with pytest.raises(ValueError, match="truncated PPM header"):
            M.decode_ppm(bad)


def test_bmp8_roundtrip():
    """T18b: the 8-bit BMP codec round-trips through the bottom-up,
    stride-padded layout (width NOT a multiple of 4 exercises the
    padding), and decode_image dispatches on the BM magic."""
    import numpy as np

    from dtaidistance_spark.operators import multimodal as M

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(6, 7)).astype(np.uint8)  # stride 8
    payload = M.encode_bmp8(gray)
    assert payload[:2] == b"BM"
    assert (M.decode_bmp8(payload) == gray).all()
    assert (M.decode_image(payload) == gray).all()


def test_bilinear_resize_closed_form():
    """At integer downscale factors every align-corners=False sample
    lands exactly between two rows/cols: each output is the mean of 4
    source pixels (the property the full-value oracle uses) — checked
    against an explicit per-pixel recompute, plus the identity case."""
    import numpy as np

    from dtaidistance_spark.operators import multimodal as M

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(8, 16)).astype(np.float64)
    out = M.bilinear_resize(gray, 4, 4)
    for i in range(4):
        for j in range(4):
            expect = (
                gray[2 * i, 4 * j + 1]
                + gray[2 * i, 4 * j + 2]
                + gray[2 * i + 1, 4 * j + 1]
                + gray[2 * i + 1, 4 * j + 2]
            ) / 4.0
            assert abs(out[i, j] - expect) < 1e-12
    # identity at same size
    assert np.allclose(M.bilinear_resize(gray, 16, 8), gray)


def test_image_decode_resize_kernel_matches_numpy(spark, sf_dir):
    """The end-to-end lane (PPM bytes -> decode_image -> both resizes
    in mapInPandas) equals a local recompute on sampled assets."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from dtaidistance_spark.operators import multimodal as M
    from dtaidistance_spark.operators.queries import T

    docs = T(spark, sf_dir, "documents").where("doc_id < 20")
    header = b"P5\n16 8\n255\n"
    raster = F.unhex(
        F.concat_ws(
            "",
            *[
                F.md5(F.concat(F.col("text"), F.lit(f"|{r}")))
                for r in range(8)
            ],
        )
    )
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(F.lit(header), raster).alias("payload"),
    )
    out = (
        M.image_decode_resize(assets, 4, 4)
        .toPandas()
        .set_index("asset_id")
        .sort_index()
    )
    texts = docs.select("doc_id", "text").toPandas().set_index("doc_id")
    for did, text in texts.text.items():
        rows = [
            hashlib.md5(f"{text}|{r}".encode()).digest() for r in range(8)
        ]
        gray = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(
            8, 16
        ).astype(np.float64)
        got = out.loc[did]
        mp = np.round(M.block_mean_resize(gray, 4, 4), 6).ravel()
        bp = np.round(M.bilinear_resize(gray, 4, 4), 6).ravel()
        assert np.array_equal(np.array(got.mean_pixels), mp)
        assert np.array_equal(np.array(got.bilinear_pixels), bp)
