"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus Arrow-batched feature kernels.

The container has no media libraries, so the *decode* step is stubbed
(:func:`decode_image` raises ``NotImplementedError`` unless PIL is
importable) — but everything Spark-side is real and tested: the binary
column schema, the metadata struct, the ``mapInPandas`` batch shape,
and a deterministic feature extractor (byte histogram) that exercises
the exact same plumbing a real decoder would.

Assets are synthesized deterministically from the documents table
(md5-derived bytes), so every run and both engines agree on payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover — not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

KINDS = ("image", "audio", "video")


def make_assets(docs: DataFrame, repeats: int = 8) -> DataFrame:
    """Deterministic binary assets from documents: payload =
    unhex(repeat(md5(text), repeats)) -> 16*repeats bytes; kind cycles
    by doc_id; metadata struct is typed per kind."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % len(KINDS) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.unhex(F.repeat(F.md5("text"), repeats)).alias("payload"),
        F.struct(
            F.lit(16).alias("width"),
            F.lit(repeats).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.lit(16) * repeats).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real image decode — requires a media library not present in this
    container; the Spark plumbing around it is fully tested with the
    byte-histogram kernel instead."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not available in this "
            "container; use byte_histogram_features for the tested path"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def byte_histogram(payload: bytes, bins: int = 16) -> np.ndarray:
    """Deterministic per-asset feature: histogram of byte values into
    ``bins`` equal buckets, L1-normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(bins)
    h = np.bincount(arr >> int(np.log2(256 // bins)), minlength=bins).astype(
        np.float64
    )
    return h / h.sum()


def extract_features(assets: DataFrame, bins: int = 16) -> DataFrame:
    """(asset_id, kind, n_bytes, features array<double>) via one
    Arrow-batched kernel — the same batch shape a real decoder/resizer
    would use."""
    schema = "asset_id long, kind string, n_bytes int, features array<double>"

    def kernel(batches):
        for pdf in batches:
            feats = [
                byte_histogram(bytes(p), bins).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(kernel, schema)


def frame_sample(assets: DataFrame, frame_bytes: int = 16, stride: int = 2) -> DataFrame:
    """Video frame sampling over the byte stream: split payload into
    ``frame_bytes`` frames, keep every ``stride``-th, return per-frame
    md5 — pure SQL (substring on binary + transform), no Python."""
    n_frames = (F.length("payload") / frame_bytes).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(stride))
    frames = F.transform(
        idx,
        lambda i: F.md5(
            F.substring("payload", (i * frame_bytes + 1).cast("int"), frame_bytes)
        ),
    )
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            n_frames.alias("n_frames"),
            frames.alias("frame_md5"),
        )
    )
