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


def pcm_resample(wave: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear resample of a PCM waveform (float64 in, float64 out).
    Deterministic, numpy-only — audio payloads ARE decodable here
    because int16 PCM needs no media library."""
    if len(wave) == 0 or src_rate == dst_rate:
        return wave.astype(np.float64)
    n_out = max(1, int(round(len(wave) * dst_rate / src_rate)))
    x_out = np.linspace(0.0, len(wave) - 1, n_out)
    return np.interp(x_out, np.arange(len(wave)), wave)


def audio_resample(assets: DataFrame, dst_rate: int = 8000) -> DataFrame:
    """Audio lane: interpret the binary payload as int16 little-endian
    PCM at ``meta.sample_rate``, linear-resample to ``dst_rate``
    vectorized in one Arrow-batched kernel. Unlike image decode this is
    REAL end-to-end (PCM needs no media library): (asset_id, n_samples,
    n_resampled, wave array<double>)."""
    schema = "asset_id long, n_samples int, n_resampled int, wave array<double>"

    def kernel(batches):
        for pdf in batches:
            ids, n_in, n_out, waves = [], [], [], []
            for aid, p, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                raw = np.frombuffer(bytes(p), dtype="<i2").astype(np.float64)
                out = pcm_resample(raw, int(meta["sample_rate"]), dst_rate)
                ids.append(aid)
                n_in.append(len(raw))
                n_out.append(len(out))
                waves.append(np.round(out, 6).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": ids, "n_samples": n_in,
                    "n_resampled": n_out, "wave": waves,
                }
            )

    return (
        assets.where(F.col("kind") == "audio")
        .select("asset_id", "payload", "meta")
        .mapInPandas(kernel, schema)
    )


def block_mean_resize(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area resize of a 2-D grayscale array via block
    means over an index grid (the numpy stand-in for a real resizer —
    same signature/batch shape, no media library needed)."""
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w))
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        area_rows = csum[y1] - csum[y0]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = (area_rows[x1] - area_rows[x0]) / ((y1 - y0) * (x1 - x0))
    return out


def image_resize(assets: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Image lane: payload bytes as a (meta.height, meta.width)
    grayscale grid, area-resized to (out_h, out_w). The REAL decode
    (jpeg/png) stays behind :func:`decode_image`'s import guard; the
    Spark plumbing — schema, batching, kernel signature — is identical
    and fully tested: (asset_id, out_h, out_w, pixels array<double>,
    row-major)."""
    schema = "asset_id long, out_h int, out_w int, pixels array<double>"

    def kernel(batches):
        for pdf in batches:
            ids, pix = [], []
            for aid, p, meta in zip(pdf["asset_id"], pdf["payload"], pdf["meta"]):
                raw = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                h, w = int(meta["height"]), int(meta["width"])
                gray = raw[: h * w].reshape(h, w)
                ids.append(aid)
                pix.append(
                    np.round(block_mean_resize(gray, out_w, out_h), 6).ravel().tolist()
                )
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "out_h": [out_h] * len(ids),
                    "out_w": [out_w] * len(ids),
                    "pixels": pix,
                }
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "payload", "meta")
        .mapInPandas(kernel, schema)
    )
