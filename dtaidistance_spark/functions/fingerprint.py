"""Document fingerprinting: Rabin-Karp rolling hash + winnowing
(Schleimer, Wilkerson, Aiken, SIGMOD 2003 — public paper; not in the
reference). Used for copy-detection joins over the documents table.

The kernel is numpy-vectorized per document (sliding-window hash and
min via stride tricks); the Spark operator batches documents through
``mapInPandas`` so the per-doc Python overhead is amortized across the
Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

BASE = 257
MOD = (1 << 31) - 1  # Mersenne prime 2^31-1


def rolling_hashes(text: str, k: int = 8) -> np.ndarray:
    """Rabin-Karp hashes of every k-char window of ``text`` (vectorized:
    one sliding_window_view + matvec mod M)."""
    codes = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    n = len(codes)
    if n < k:
        return np.empty(0, dtype=np.int64)
    powers = np.empty(k, dtype=np.int64)
    powers[k - 1] = 1
    for j in range(k - 2, -1, -1):
        powers[j] = (powers[j + 1] * BASE) % MOD
    win = np.lib.stride_tricks.sliding_window_view(codes.astype(np.int64), k)
    # (codes * powers) stays < 2^31 * 257 * k < 2^63 for k <= small
    return (win * powers).sum(axis=1) % MOD


def winnow(hashes: np.ndarray, w: int = 4) -> np.ndarray:
    """Winnowing: min hash of every w-window of the rolling hashes,
    rightmost-min tie-break (paper §2.2); returns the sorted distinct
    fingerprint set."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost min: reverse then argmin picks the last occurrence
    mins = win[:, ::-1].min(axis=1)
    return np.unique(mins)


def fingerprint(text: str, k: int = 8, w: int = 4) -> np.ndarray:
    return winnow(rolling_hashes(text.lower(), k), w)


def fingerprint_docs(
    docs: DataFrame, k: int = 8, w: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, fingerprints array<long>) via Arrow-batched kernel."""
    schema = f"{id_col} long, fingerprints array<long>, n_fp int"

    def kernel(batches):
        for pdf in batches:
            fps = [fingerprint(t, k, w) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fingerprints": [f.tolist() for f in fps],
                    "n_fp": [len(f) for f in fps],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# Character n-gram language profiles (Cavnar & Trenkle 1994 style)
# ---------------------------------------------------------------------------

# tiny built-in trigram profiles (top function-word trigrams per
# language, space-padded) — enough to separate major Latin-script
# languages; real deployments load fuller profiles the same way
LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", " to",
           "to ", "ing", "ng ", " in", "in ", "ion", " is", "is ", "ed "),
    "fr": (" le", "le ", " de", "de ", "es ", " la", "la ", "ent", "nt ",
           " et", "et ", "que", " qu", "ue ", "ais", " un", "un ", "ons"),
    "de": (" de", "der", "er ", "ie ", " di", "die", "ein", "in ", "und",
           " un", "nd ", "ch ", "sch", "ich", " ei", "en ", "ung", "ng "),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "que", " qu",
           "ue ", "ión", " en", "en ", "ado", "as ", " lo", "los", "ar "),
}


def trigram_profile_scores(text: str) -> dict[str, float]:
    """Cosine-style overlap of the text's char-trigram frequency against
    each built-in profile (vectorized over the trigram array)."""
    import numpy as np

    s = " " + " ".join(str(text).lower().split()) + " "
    if len(s) < 3:
        return {k: 0.0 for k in LANG_PROFILES}
    grams = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
    tri = (
        grams[:-2].astype(np.int64) * 65536
        + grams[1:-1].astype(np.int64) * 256
        + grams[2:]
    )
    uniq, counts = np.unique(tri, return_counts=True)
    freq = dict(zip(uniq.tolist(), (counts / counts.sum()).tolist()))

    def code(g: str) -> int:
        b = g.encode("utf-8", "ignore")[:3].ljust(3, b" ")
        return b[0] * 65536 + b[1] * 256 + b[2]

    return {
        lang: float(sum(freq.get(code(g), 0.0) for g in profile))
        for lang, profile in LANG_PROFILES.items()
    }


def lang_id_ngram(text: str, min_score: float = 0.01) -> tuple[str, float]:
    """(language, score): argmax profile overlap, 'und' below floor.
    Deterministic ties -> lexicographically first language."""
    scores = trigram_profile_scores(text)
    lang = min(sorted(scores), key=lambda k: (-scores[k], k))
    best = scores[lang]
    return (lang if best >= min_score else "und", round(best, 6))
