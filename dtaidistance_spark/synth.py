"""Deterministic synthetic pre-tokenized sequence table (FIXTURES.md §1).

All randomness derives from a 60-bit md5-based hash of ``doc_id`` so any
subset regenerates identically at any scale and partitioning — in Spark
(distributed, ``mapInPandas``) and in plain Python (the single-process
parity oracle). No external data.

Schema (the ``input_hint`` contract):
    doc_id string, tokens array<int32>, n_tok int32, source string,
    ts timestamp (derived rollup axis)
"""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timezone

import numpy as np
import pandas as pd

VOCAB = 50257
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
EPOCH_S = int(EPOCH.timestamp())

SCHEMA_DDL = (
    "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp"
)


def doc_hash(doc_id: str) -> int:
    """60-bit deterministic hash (first 15 hex chars of md5)."""
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:15], 16)


def gen_row(i: int):
    """One synthetic row for index ``i`` (pure Python/numpy)."""
    doc_id = f"doc{i:012d}"
    h = doc_hash(doc_id)
    n = 64 + (h % 1985)
    if h % 97 < 8:  # long tail
        n = min(n * 4, 8192)
    hm = h % VOCAB
    j = np.arange(n, dtype=np.int64)
    smooth = np.floor(1000.0 * np.sin(2 * math.pi * j / 64.0 + (h % 7))).astype(
        np.int64
    )
    tokens = ((hm * (j + 1)) % VOCAB + smooth) % VOCAB
    m = h % 100
    source = "web" if m < 80 else ("code" if m < 95 else "books")
    ts = EPOCH_S + (i % 86400)
    return doc_id, tokens.astype(np.int32), int(n), source, ts


def gen_pdf(ids) -> pd.DataFrame:
    """Rows for a batch of integer ids — shared by Spark mapInPandas and
    the local parity pipeline."""
    rows = [gen_row(int(i)) for i in ids]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [r[1] for r in rows],
            "n_tok": pd.array([r[2] for r in rows], dtype="int32"),
            "source": [r[3] for r in rows],
            "ts": pd.to_datetime([r[4] for r in rows], unit="s", utc=True).tz_localize(None),
        }
    )


def sequences_local(n: int) -> pd.DataFrame:
    """Single-process generation (parity oracle / tests)."""
    return gen_pdf(range(n))


def sequences_df(spark, n: int, partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas(gen_pdf).

    The generator is keyed only by the row id, so the result is identical
    for every ``partitions`` value — that is test G11's row invariant.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for b in batches:
            yield gen_pdf(b["id"].to_numpy())

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=SCHEMA_DDL)
    )
