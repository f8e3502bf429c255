"""Behavior gates for the round-2 operator batch (corpusops_q /
tsops_q): the branches the synthetic tables never trigger, driven on
constructed rows, plus local-recompute parity for SAX and the counter
correction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dtaidistance_spark.operators import (  # noqa: F401
    ann_q,
    corpusops_q,
    sketch_q,
    tsops_q,
)
from dtaidistance_spark.operators.queries import REGISTRY


# ---------------------------------------------------------------------------
# C4 filters: blocklist / length branches on constructed docs
# ---------------------------------------------------------------------------


def _c4_on(spark, tmp_path, texts):
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(p + "/documents.parquet")
    out = REGISTRY["c4_quality_filters"](spark, p)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_c4_filters_branches(spark, tmp_path):
    good = "the quick brown fox jumps over a lazy dog " * 5  # 45 words
    rows = _c4_on(
        spark,
        tmp_path,
        [
            good.strip() + " and it ends with a period.",
            "Lorem ipsum dolor sit amet " + good.strip(),
            good.strip() + " { code block }",
            "too short",
            ("a " * 30).strip(),  # 30 words but zero diversity + short words
        ],
    )
    assert rows[0]["keep"] and rows[0]["ends_period"]
    assert rows[1]["has_lorem"] and not rows[1]["keep"]
    assert rows[2]["has_brace"] and not rows[2]["keep"]
    assert rows[3]["n_words"] < 20 and not rows[3]["keep"]
    assert rows[4]["frac_unique"] < 0.05 and not rows[4]["keep"]


# ---------------------------------------------------------------------------
# PII redaction: injected doc_id-derived PII is found and masked
# ---------------------------------------------------------------------------


def test_pii_redact_counts_and_masks(spark, sf_dir):
    out = REGISTRY["pii_redact"](spark, sf_dir).collect()
    by = {r["doc_id"]: r for r in out}
    for d, r in by.items():
        assert r["n_emails"] == (1 if d % 5 == 0 else 0), d
        assert r["n_phones"] == (1 if d % 7 == 0 else 0), d
    # the redacted text of an injected doc no longer hashes like the
    # unredacted concatenation (masking actually happened)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.where(F.col("doc_id") % 5 == 0).limit(1).collect()[0]
    injected = f"{raw['text']} contact user{raw['doc_id']}@example.com now"
    import hashlib

    assert by[raw["doc_id"]]["redacted_md5"] != hashlib.md5(
        injected.encode()
    ).hexdigest()


# ---------------------------------------------------------------------------
# BM25: a doc stuffed with the query term must outrank a sparse one
# ---------------------------------------------------------------------------


def test_bm25_orders_by_relevance(spark, sf_dir):
    out = REGISTRY["bm25_topk"](spark, sf_dir).collect()
    assert len(out) == 20
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


# ---------------------------------------------------------------------------
# counter_rate: hand-computed reset semantics
# ---------------------------------------------------------------------------


def test_counter_rate_reset_semantics(spark, tmp_path):
    # counter goes 10 -> 25 -> 5 (RESET, base 25) -> 12 -> 3 (RESET, 12)
    # corrected: 10, 25, 30, 37, 40  => delta 30, resets 2
    from datetime import datetime, timedelta

    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), 1, "click", v, "")
        for i, v in enumerate([10.0, 25.0, 5.0, 12.0, 3.0])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    p = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(p + "/events.parquet")
    out = REGISTRY["counter_rate"](spark, p).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 5 and r["n_resets"] == 2
    assert r["counter_delta"] == pytest.approx(30.0)


# ---------------------------------------------------------------------------
# minmax_downsample: extrema preserved exactly, 2 rows per bucket
# ---------------------------------------------------------------------------


def test_minmax_downsample_preserves_extrema(spark, sf_dir):
    out = REGISTRY["minmax_downsample"](spark, sf_dir)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_type") == "view")
        .withColumn("day", F.date_trunc("day", "ts"))
    )
    truth = ev.groupBy("user_id", "day").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    j = (
        out.groupBy("user_id", "day")
        .pivot("kind", ["min", "max"])
        .agg(F.first("value"))
        .join(truth, ["user_id", "day"])
    )
    bad = j.where(
        (F.col("min") != F.col("lo")) | (F.col("max") != F.col("hi"))
    ).count()
    assert bad == 0
    assert out.count() == 2 * truth.count()


# ---------------------------------------------------------------------------
# SAX: SQL letters == local numpy recompute with the kernel block scheme
# ---------------------------------------------------------------------------


def test_sax_matches_numpy(spark):
    from dtaidistance_spark import synth

    out = {r["doc_id"]: r["sax"] for r in REGISTRY["sax_symbols"](spark, "").collect()}
    pdf = synth.sequences_local(256)
    m = tsops_q._SEGMENTS
    for doc, toks in list(zip(pdf["doc_id"], pdf["tokens"]))[:40]:
        t = np.asarray(toks, dtype=np.int64)
        n = len(t)
        mu = float(t.sum()) / n
        sigma = np.sqrt(float((t.astype(object) ** 2).sum()) / n - mu * mu)
        letters = []
        for j in range(m):
            lo, hi = (j * n) // m, ((j + 1) * n) // m
            z = (float(t[lo:hi].sum()) / (hi - lo) - mu) / sigma
            letters.append(
                "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
            )
        assert out[doc] == "".join(letters), doc


# ---------------------------------------------------------------------------
# SemDeDup: injected exact/near duplicates
# ---------------------------------------------------------------------------


def test_semdedup_drops_injected_duplicates(spark):
    from dtaidistance_spark.operators import ann as A

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(40)]
    # ids 100..104 duplicate vectors 0..4 exactly (cos == 1)
    rows += [(100 + i, [float(x) for x in base[i]], 0) for i in range(5)]
    # id 200: genuinely novel direction, must be kept
    v = rng.normal(size=16)
    rows.append((200, [float(x) for x in v / np.linalg.norm(v)], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r["vec_id"]: r["keep"]
        for r in A.semdedup(emb, dim=16, n_list=4, tau=0.95).collect()
    }
    assert len(out) == 46
    for i in range(5):
        assert out[100 + i] is False, i  # duplicate dropped
        assert out[i] is True, i  # canonical (lowest id) kept
    assert out[200] is True


# ---------------------------------------------------------------------------
# Sketch trio (sketch_q)
# ---------------------------------------------------------------------------


def test_cms_never_underestimates(spark, sf_dir):
    rows = REGISTRY["cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r["no_underestimate"] for r in rows)
    assert all(r["cms_est"] >= r["true_cnt"] for r in rows)


def test_stratified_sample_exact_k_and_deterministic(spark, sf_dir):
    a = REGISTRY["stratified_sample"](spark, sf_dir)
    counts = {r["source"]: r["n"] for r in a.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_src = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for s, n in counts.items():
        assert n == min(25, per_src[s]), s
    # identical across independent evaluations (hash rank, no RNG)
    ids1 = sorted(r["doc_id"] for r in a.collect())
    ids2 = sorted(
        r["doc_id"] for r in REGISTRY["stratified_sample"](spark, sf_dir)
        .repartition(7).collect()
    )
    assert ids1 == ids2


def test_token_pmi_counts_recount(spark, sf_dir):
    rows = REGISTRY["token_pmi"](spark, sf_dir).collect()
    assert len(rows) == 30
    top = rows[0]
    w1, w2 = top["bigram"].split(" ")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_ab = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat(element_at(split(text, ' '), i), ' ', "
                "element_at(split(text, ' '), i + 1)))"
            )
        ).alias("b")
    ).where(F.col("b") == top["bigram"]).count()
    assert n_ab == top["n_ab"]
    assert all(r["n_ab"] >= 5 for r in rows)


# ---------------------------------------------------------------------------
# LTTB: kernel vs naive reference on a series long enough for the
# real bucketed path (the sf0.01 per-user series are shorter than 16)
# ---------------------------------------------------------------------------


def _naive_lttb(x, y, n_out):
    n = len(x)
    if n_out >= n:
        return list(range(n))
    bounds = [1 + (b * (n - 2)) // (n_out - 2) for b in range(n_out - 1)]
    sel = [0]
    for b in range(n_out - 2):
        lo, hi = bounds[b], bounds[b + 1]
        if b + 2 <= n_out - 2:
            nlo, nhi = bounds[b + 1], bounds[b + 2]
        else:
            nlo, nhi = n - 1, n
        cx = sum(x[nlo:nhi]) / (nhi - nlo)
        cy = sum(y[nlo:nhi]) / (nhi - nlo)
        ax, ay = x[sel[-1]], y[sel[-1]]
        best, best_i = -1.0, lo
        for i in range(lo, hi):
            area = abs((ax - cx) * (y[i] - ay) - (ax - x[i]) * (cy - ay))
            if area > best:
                best, best_i = area, i
        sel.append(best_i)
    sel.append(n - 1)
    return sel


@pytest.mark.parametrize("seed,n,n_out", [(0, 200, 16), (1, 97, 12), (2, 1000, 64)])
def test_lttb_matches_naive(seed, n, n_out):
    from dtaidistance_spark.functions.lttb import lttb

    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0, 1000, n))
    y = np.cumsum(rng.normal(size=n))
    got = list(lttb(x, y, n_out))
    assert got == _naive_lttb(list(x), list(y), n_out)
    assert got[0] == 0 and got[-1] == n - 1
    assert got == sorted(got)


def test_lttb_keeps_extreme_spike():
    from dtaidistance_spark.functions.lttb import lttb

    x = np.arange(300, dtype=float)
    y = np.zeros(300)
    y[137] = 1e6  # an isolated spike a mean-downsampler would dilute
    assert 137 in set(lttb(x, y, 20))


# ---------------------------------------------------------------------------
# substring dedup: hand-constructed shared substring => exact merged span
# ---------------------------------------------------------------------------


def test_substring_dedup_exact_span(spark, tmp_path):
    # docs 0 and 1 share words 3..8 (six words => three 4-grams at
    # positions 3,4,5 covering [3, 9)); doc 2 shares nothing
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [
        f"a0 b0 c0 {shared} x0 y0 z0 w0",
        f"a1 b1 c1 {shared} x1 y1 z1 w1",
        "totally different words with no overlap at all here ok",
    ]
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "docs")
    df.write.mode("overwrite").parquet(p + "/documents.parquet")
    out = REGISTRY["substring_dedup_spans"](spark, p).collect()
    spans = {(r["doc_id"], r["span_start"], r["span_end"], r["span_len"]) for r in out}
    assert spans == {(0, 3, 9, 6), (1, 3, 9, 6)}


# ---------------------------------------------------------------------------
# HyperLogLog (T31): python-reference register parity, estimate accuracy,
# merge == union, and the small-range linear-counting branch.
# ---------------------------------------------------------------------------


def _hll_py(values, m=256):
    """Independent python HLL: same md5 hash/index/rho contract."""
    import hashlib

    regs = [0] * m
    for v in values:
        hv = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = hv % m
        q = hv // m
        rho = 53 if q == 0 else 53 - q.bit_length()
        regs[idx] = max(regs[idx], rho)
    return regs


def _hll_est(regs, m=256):
    import math

    s = 0.0
    for r in regs:
        s += 1.0 / (1 << r)
    raw = 0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0 / s
    v = regs.count(0)
    if raw <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return raw


def test_hll_registers_match_python_reference(spark):
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.sketch_q import _HLL_N

    rows = {
        r["source"]: r
        for r in REGISTRY["hll_distinct"](spark, "unused").collect()
    }
    pdf = synth.sequences_local(_HLL_N)
    for src in ("web", "code", "books"):
        vals = [
            t for toks, s in zip(pdf["tokens"], pdf["source"])
            if s == src for t in toks
        ]
        regs = _hll_py(vals)
        import hashlib

        md5 = hashlib.md5(",".join(map(str, regs)).encode()).hexdigest()
        assert rows[src]["reg_md5"] == md5
        assert rows[src]["reg_sum"] == sum(regs)
        assert abs(rows[src]["est"] - _hll_est(regs)) < 1e-3
        # m=256 HLL standard error is 1.04/sqrt(256) = 6.5%; allow 4 sigma
        true = len(set(vals))
        assert abs(rows[src]["est"] - true) / true < 0.26


def test_hll_merge_equals_union(spark):
    row = REGISTRY["hll_union_check"](spark, "unused").collect()[0]
    assert row["union_equals_direct"] is True
    assert row["n_sources"] == 3
    assert row["merged_md5"] == row["direct_md5"]
    # merged estimate within 4 sigma of the true global distinct count
    assert abs(row["est_merged"] - row["true_distinct"]) / row["true_distinct"] < 0.26


def test_hll_small_range_linear_counting():
    # 10 distinct values: raw HLL over-corrects; linear counting kicks in
    regs = _hll_py(range(10))
    est = _hll_est(regs)
    assert abs(est - 10) < 2.5  # ln-based small-range estimate is tight
    # and the branch actually fired (v_zero > 0, raw <= 640)
    assert regs.count(0) > 0


# ---------------------------------------------------------------------------
# UddSketch-analog quantile sketch (T32): python-reference sketch parity,
# bucket-edge invariants, estimate error bound, merge == direct.
# ---------------------------------------------------------------------------


def _udq_idx_py(v: int) -> int:
    if v < 8:
        return v
    e = v.bit_length() - 1
    return e * 8 + ((v >> (e - 3)) & 7)


def _udq_edges_py(i: int):
    if i < 8:
        return i, i
    w = 1 << (i // 8 - 3)
    lo = (8 + i % 8) * w
    return lo, lo + w - 1


def test_udq_bucket_edges_invariants():
    """Every value lands inside its bucket; relative width <= 1/8 for
    v >= 8; values 0..7 are exact."""
    import random

    rng = random.Random(7)
    vals = list(range(64)) + [rng.randrange(0, 50257) for _ in range(2000)]
    for v in vals:
        i = _udq_idx_py(v)
        lo, hi = _udq_edges_py(i)
        assert lo <= v <= hi, (v, i, lo, hi)
        if v >= 8:
            assert (hi - lo + 1) / lo <= 1 / 8 + 1e-12, (v, i, lo, hi)
        else:
            assert lo == hi == v


def test_udq_sketch_matches_python_reference(spark):
    import hashlib
    from collections import Counter

    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.sketch_q import _UDQ_N, _UDQ_QS

    rows = {
        r["source"]: r
        for r in REGISTRY["uddq_sketch"](spark, "unused").collect()
    }
    pdf = synth.sequences_local(_UDQ_N)
    for src in ("web", "code", "books"):
        vals = sorted(
            t for toks, s in zip(pdf["tokens"], pdf["source"])
            if s == src for t in toks
        )
        c = Counter(_udq_idx_py(int(v)) for v in vals)
        canon = ",".join(f"{i}:{c[i]}" for i in sorted(c))
        r = rows[src]
        assert r["sketch_md5"] == hashlib.md5(canon.encode()).hexdigest()
        assert r["n_total"] == len(vals) and r["n_buckets"] == len(c)
        for q in _UDQ_QS:
            rank = (q * len(vals) + 99) // 100
            exact = vals[rank - 1]
            assert r[f"p{q}_exact"] == exact
            assert r[f"p{q}_ok"] is True
            if exact >= 8:
                rel = abs(r[f"p{q}_est"] - exact) / exact
                assert rel <= 1 / 8, (src, q, r[f"p{q}_est"], exact)
            else:
                assert r[f"p{q}_est"] == exact


def test_udq_merge_equals_direct(spark):
    row = REGISTRY["uddq_merge_check"](spark, "unused").collect()[0]
    assert row["merge_equals_direct"] is True
    assert row["n_sources"] == 3
    assert row["merged_md5"] == row["direct_md5"]
    assert row["p50_est"] <= row["p90_est"] <= row["p99_est"]
