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
