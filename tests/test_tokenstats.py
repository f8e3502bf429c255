"""Semantic gates for tokenstats_q (cross-engine hashes live in
test_oracle.py): vocabulary growth vs a set-based recompute, the PPS
sample vs an integer-line recompute, entropy vs numpy."""

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tokenstats_q import (
    _K,
    _N,
    pps_systematic_sample,
    token_entropy,
    vocab_growth,
)


@pytest.fixture(scope="module")
def loc():
    return synth.sequences_local(_N)


def test_vocab_growth_matches_set_recompute(spark, sf_dir, loc):
    out = vocab_growth(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    seen, cum_tok, cum_typ = {}, {}, {}
    for row in loc.itertuples():  # already in doc-index order
        s = row.source
        vocab = seen.setdefault(s, set())
        new = len(set(row.tokens.tolist()) - vocab)
        vocab.update(row.tokens.tolist())
        cum_tok[s] = cum_tok.get(s, 0) + row.n_tok
        cum_typ[s] = cum_typ.get(s, 0) + new
        got = out.loc[row.doc_id]
        assert got.new_types == new, row.doc_id
        assert got.cum_tokens == cum_tok[s], row.doc_id
        assert got.cum_types == cum_typ[s], row.doc_id
    # Heaps: sublinear growth — once a source has streamed well past the
    # vocab size, types grow much slower than tokens (small sources are
    # still on the steep early part of the curve)
    for s in seen:
        assert cum_typ[s] < cum_tok[s]
        if cum_tok[s] > 4 * 50257:
            assert cum_typ[s] < 0.5 * cum_tok[s]


def test_pps_sample_matches_integer_line(spark, sf_dir, loc):
    out = pps_systematic_sample(spark, sf_dir).toPandas()
    w = loc.n_tok.astype("int64").to_numpy()
    cum = np.cumsum(w)
    total = int(cum[-1])
    step = total // _K
    picks = {}
    for i in range(len(w)):
        lo = int(cum[i]) - int(w[i])
        ticks = int(cum[i]) // step - lo // step
        if ticks > 0:
            picks[loc.doc_id.iloc[i]] = (ticks, int(cum[i]))
    assert set(out.doc_id) == set(picks)
    for r in out.itertuples():
        ticks, cw = picks[r.doc_id]
        assert r.n_ticks == ticks and r.cum_w == cw
    # systematic PPS: tick count is total//step, within one of target k
    assert abs(int(out.n_ticks.sum()) - total // step) == 0
    assert _K <= int(out.n_ticks.sum()) <= _K + 2


def test_token_entropy_matches_numpy(spark, sf_dir, loc):
    out = token_entropy(spark, sf_dir).toPandas().set_index("source")
    for s in out.index:
        toks = np.concatenate(
            [r.tokens for r in loc.itertuples() if r.source == s]
        )
        _, cnt = np.unique(toks, return_counts=True)
        p = cnt / cnt.sum()
        h = float(-(p * np.log2(p)).sum())
        got = out.loc[s]
        assert got.n_tokens == len(toks)
        assert got.vocab_size == len(cnt)
        assert abs(got.entropy_bits - h) < 1e-5
        assert abs(got.entropy_norm - h / np.log2(len(cnt))) < 1e-5
        assert 0 < got.entropy_norm <= 1.0


def test_misra_gries_bounds_and_semantics(spark, sf_dir):
    """T39: every kept estimate is a true undercount within the proven
    MG bound, at most k survive, and the summary recomputes exactly
    from a pure-Python Misra-Gries closed form."""
    from collections import Counter

    import pandas as pd

    from dtaidistance_spark.operators.sketch_q import (
        _MG_BUCKET,
        _MG_K,
        misra_gries_topk,
    )

    out = misra_gries_topk(spark, sf_dir).toPandas()
    assert 0 < len(out) <= _MG_K
    assert out.bound_ok.all() and out.underestimate_ok.all()
    assert (out.err >= 0).all()

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    parts = {}
    d_total = 0
    for bkt, g in docs.groupby(docs.doc_id // _MG_BUCKET):
        cnt = Counter(
            w for t in g.text for w in t.lower().split(" ")
        )
        vals = sorted(cnt.values(), reverse=True)
        d_b = vals[_MG_K] if len(vals) > _MG_K else 0
        d_total += d_b
        for tok, c in cnt.items():
            if c > d_b:
                parts[tok] = parts.get(tok, 0) + (c - d_b)
    svals = sorted(parts.values(), reverse=True)
    d_m = svals[_MG_K] if len(svals) > _MG_K else 0
    want = {t: s - d_m for t, s in parts.items() if s > d_m}
    got = dict(zip(out.tok, out.est))
    assert got == want
    assert (out.bound == d_total + d_m).all()


def test_js_divergence_matches_numpy(spark, sf_dir, loc):
    from dtaidistance_spark.operators.tokenstats_q import js_divergence

    out = js_divergence(spark, sf_dir).toPandas().iloc[0]

    def dist(src):
        toks = np.concatenate(
            [r.tokens for r in loc.itertuples() if r.source == src]
        )
        c = np.bincount(toks, minlength=50257).astype(float)
        return c / c.sum(), c

    P = {s: dist(s) for s in ("web", "code", "books")}
    for a, b in (("web", "code"), ("web", "books"), ("code", "books")):
        p, cp = P[a]
        q, cq = P[b]
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = np.where(p > 0, 0.5 * p * np.log2(np.where(p > 0, p / m, 1)), 0)
            t2 = np.where(q > 0, 0.5 * q * np.log2(np.where(q > 0, q / m, 1)), 0)
        js = float(t1.sum() + t2.sum())
        got = out[f"js_{a}_{b}"]
        assert abs(got - js) < 1e-5, (a, b, got, js)
        assert 0.0 <= got <= 1.0
        assert out[f"overlap_{a}_{b}"] == int(((cp > 0) & (cq > 0)).sum())


def test_bigram_logprob_matches_python_lm(spark, sf_dir):
    """T41: interpolated bigram scores recompute exactly from a
    pure-Python LM (same counts, same interpolation)."""
    import math
    from collections import Counter

    import pandas as pd

    from dtaidistance_spark.operators.tokenstats_q import bigram_logprob

    out = bigram_logprob(spark, sf_dir).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {r.doc_id: r.text.lower().split(" ") for r in docs.itertuples()}
    uni = Counter(w for ws in toks.values() for w in ws)
    n = sum(uni.values())
    bi = Counter(
        (ws[i - 1], ws[i])
        for ws in toks.values()
        for i in range(1, len(ws))
    )
    lam = 0.75
    for doc_id, ws in toks.items():
        nll = [
            -math.log(
                lam * bi[(ws[i - 1], ws[i])] / uni[ws[i - 1]]
                + (1 - lam) * uni[ws[i]] / n
            )
            for i in range(1, len(ws))
        ]
        got = out.loc[doc_id]
        assert got.n_bigrams == len(nll)
        want = sum(nll) / len(nll)
        assert abs(got.avg_neg_logprob - want) < 1e-3
        assert bool(got.keep) == (want <= 3.0 or abs(want - 3.0) < 1e-9)


def test_zipf_fit_matches_numpy_ols(spark, sf_dir, loc):
    from dtaidistance_spark.operators.tokenstats_q import zipf_fit

    out = zipf_fit(spark, sf_dir).toPandas().set_index("source")
    for s in out.index:
        toks = np.concatenate(
            [r.tokens for r in loc.itertuples() if r.source == s]
        )
        _, cnt = np.unique(toks, return_counts=True)
        cnt = np.sort(cnt)[::-1].astype(float)
        x = np.log(np.arange(1, len(cnt) + 1, dtype=float))
        y = np.log(cnt)
        slope, icept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        got = out.loc[s]
        assert got.vocab_size == len(cnt)
        assert abs(got.zipf_slope - slope) < 1e-3, s
        assert abs(got.log_intercept - icept) < 1e-3, s
        assert abs(got.r2 - r2) < 1e-3, s
        assert got.zipf_slope < 0  # frequency decreases with rank


def test_token_percentiles_exact_matches_numpy(spark, sf_dir, loc):
    from dtaidistance_spark.operators.tokenstats_q import (
        token_percentiles_exact,
    )

    out = token_percentiles_exact(spark, sf_dir).toPandas().set_index("source")
    for s in out.index:
        toks = np.sort(
            np.concatenate([r.tokens for r in loc.itertuples() if r.source == s])
        )
        n = len(toks)
        got = out.loc[s]
        assert got.n == n
        for p in (50, 90, 99):
            # inverse-CDF (type-1): smallest x with rank >= ceil(n*p/100)
            want = int(toks[-(-n * p // 100) - 1])
            assert got[f"p{p}"] == want, (s, p)


def test_ngram_novelty_matches_set_recompute(spark, sf_dir, loc):
    """T47: per-doc novel-position/type counts equal a dict-based
    recompute over exact gram tuples (the hash pair is injective on
    this corpus — verified by comparing against tuple identity), over
    the orig + prefix-edited-twin universe."""
    import hashlib
    import math

    from dtaidistance_spark.operators.tokenstats_q import ngram_novelty

    out = ngram_novelty(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == 2 * _N
    universe = []
    for row in loc.itertuples():
        universe.append((row.doc_id, row.tokens.tolist()))
    for row in loc.itertuples():
        h = int(hashlib.md5(row.doc_id.encode()).hexdigest()[:15], 16)
        k = 1 + h % 7
        pre = [(h % 50257 + s * 7919) % 50257 for s in range(1, k + 1)]
        universe.append((row.doc_id + "~s", pre + row.tokens.tolist()))
    first = {}
    docs = []
    for doc_id, toks in universe:  # stream order: origs then twins
        grams = [tuple(toks[j : j + 5]) for j in range(len(toks) - 4)]
        docs.append((doc_id, grams))
        for g in set(grams):
            first.setdefault(g, doc_id)
    for doc_id, grams in docs:
        novel_pos = sum(1 for g in grams if first[g] == doc_id)
        novel_types = len({g for g in grams if first[g] == doc_id})
        got = out.loc[doc_id]
        assert got.n_grams == len(grams)
        assert got.novel_pos == novel_pos, doc_id
        assert got.novel_types == novel_types, doc_id
        assert got.novel_frac == math.floor(
            novel_pos / len(grams) * 1e6 + 0.5
        ) / 1e6
    # the metric separates the two populations: originals are novel,
    # prefix-edited twins are recognized as near-duplicates
    orig = out[~out.index.str.endswith("~s")]
    twin = out[out.index.str.endswith("~s")]
    assert (orig.novel_frac == 1.0).all()
    assert (twin.novel_frac < 0.2).all()


def test_vocab_prune_coverage_matches_counter(spark, sf_dir, loc):
    """T49: coverage curve equals a Counter-based recompute."""
    import math
    from collections import Counter

    from dtaidistance_spark.operators.tokenstats_q import (
        _PRUNE_KS,
        vocab_prune_coverage,
    )

    out = vocab_prune_coverage(spark, sf_dir).toPandas().set_index(
        ["source", "k"]
    )
    by_src = {}
    for row in loc.itertuples():
        by_src.setdefault(row.source, Counter()).update(row.tokens.tolist())
    assert len(out) == len(by_src) * len(_PRUNE_KS)
    for src, ctr in by_src.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(ctr.values())
        for K in _PRUNE_KS:
            kept = sum(c for _, c in ranked[:K])
            got = out.loc[(src, K)]
            assert got.total_pos == total
            assert got.total_types == len(ctr)
            assert got.kept_pos == kept
            assert got.kept_types == min(K, len(ctr))
            assert got.oov_pos == total - kept
            assert got.coverage == math.floor(kept / total * 1e6 + 0.5) / 1e6
    # monotone in K, and the largest K covers (nearly) everything
    for src in by_src:
        cov = [out.loc[(src, K)].coverage for K in _PRUNE_KS]
        assert cov == sorted(cov)
