"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, plus Arrow-batched feature kernels.

The container has no media libraries, but the image lane is REAL end
to end for the uncompressed formats: :func:`decode_image` dispatches
on magic bytes to dependency-free numpy parsers for binary PPM
(P5/P6) and 8-bit BMP, feeding the area and bilinear resizers — the
``image_decode_resize_check`` registry query oracles every output
pixel against DuckDB's own byte algebra.  Only compressed formats
(JPEG/PNG) keep the honest PIL import guard.  Everything Spark-side
is likewise real and tested: the binary column schema, the metadata
struct, the ``mapInPandas`` batch shape, and the byte-histogram
feature extractor.

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


def encode_ppm(gray: np.ndarray) -> bytes:
    """Binary PPM (P5, maxval 255) bytes for a 2-D uint8 grid."""
    h, w = gray.shape
    return f"P5\n{w} {h}\n255\n".encode() + gray.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Dependency-free binary-PPM decode (P5 grayscale / P6 RGB→luma
    by integer mean): parse the ASCII header (magic, width, height,
    maxval, tolerating comment lines), then read the raster."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM payload")
    magic = payload[:2]
    pos, fields, end = 2, [], len(payload)
    while len(fields) < 3:
        # skip whitespace + comment lines, then read one ASCII token;
        # every scan is bounded by len(payload) so a truncated header
        # raises instead of spinning past the buffer (b'' is neither
        # isspace() nor consumed — an unbounded loop would hang).
        while pos < end and payload[pos : pos + 1].isspace():
            pos += 1
        if pos >= end:
            raise ValueError("truncated PPM header")
        if payload[pos : pos + 1] == b"#":
            while pos < end and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        tok = b""
        while pos < end and not payload[pos : pos + 1].isspace():
            tok += payload[pos : pos + 1]
            pos += 1
        if pos >= end:
            raise ValueError("truncated PPM header")
        fields.append(int(tok))
    pos += 1  # single whitespace after maxval, then the raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    if magic == b"P5":
        arr = np.frombuffer(payload, dtype=np.uint8, count=h * w, offset=pos)
        return arr.reshape(h, w).astype(np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    rgb = arr.reshape(h, w, 3).astype(np.int64)
    return (rgb.sum(axis=2) // 3).astype(np.float64)


def encode_bmp8(gray: np.ndarray) -> bytes:
    """Minimal 8-bit-palette BMP bytes (BITMAPINFOHEADER, grayscale
    palette, 4-byte-aligned bottom-up rows) for a 2-D uint8 grid."""
    h, w = gray.shape
    stride = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    size = offset + stride * h
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + (stride * h).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (256).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = gray[y].astype(np.uint8).tobytes()
        rows.append(row + b"\x00" * (stride - w))
    return header + palette + b"".join(rows)


def decode_bmp8(payload: bytes) -> np.ndarray:
    """Dependency-free decode of the 8-bit uncompressed BMP subset
    (the synthetic-asset format): BITMAPINFOHEADER, bottom-up rows,
    4-byte stride, palette index = gray level."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little")
    h = int.from_bytes(payload[22:26], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 8 or comp != 0:
        raise ValueError("only 8-bit uncompressed BMP supported")
    stride = (w + 3) & ~3
    out = np.empty((h, w), dtype=np.float64)
    for y in range(h):
        start = offset + (h - 1 - y) * stride
        out[y] = np.frombuffer(
            payload, dtype=np.uint8, count=w, offset=start
        )
    return out


def decode_image(payload: bytes):
    """Image decode with a REAL dependency-free path for the synthetic
    asset formats (binary PPM P5/P6 and 8-bit BMP, parsed in numpy);
    compressed formats (JPEG/PNG) still require PIL and keep the
    honest import guard."""
    head = bytes(payload[:2])
    if head in (b"P5", b"P6"):
        return decode_ppm(payload)
    if head == b"BM":
        return decode_bmp8(payload)
    if not _HAS_PIL:
        raise NotImplementedError(
            "JPEG/PNG decode requires PIL/pillow, not available in this "
            "container; PPM/BMP decode is dependency-free, or use "
            "byte_histogram_features for the opaque-bytes path"
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


def bilinear_resize(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pure-numpy bilinear resample (align-corners=False, the
    OpenCV/PIL convention): dst (i, j) samples the source at
    ((i+0.5)·h/out_h − 0.5, (j+0.5)·w/out_w − 0.5), edge-clamped.
    At integer downscale factors the sample point lands exactly
    between two rows/columns, so each output is a closed-form mean of
    4 source pixels — the property the full-value oracle uses."""
    h, w = gray.shape
    sy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    sx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None]
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :]
    tl = gray[np.ix_(y0, x0)]
    tr = gray[np.ix_(y0, x1)]
    bl = gray[np.ix_(y1, x0)]
    br = gray[np.ix_(y1, x1)]
    return (
        tl * (1 - fy) * (1 - fx)
        + tr * (1 - fy) * fx
        + bl * fy * (1 - fx)
        + br * fy * fx
    )


def image_decode_resize(
    assets: DataFrame, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """The END-TO-END image lane: payloads are REAL image files (PPM/
    BMP), decoded by the dependency-free parsers via
    :func:`decode_image`'s format dispatch, then resized BOTH ways
    (area block-mean + bilinear). Output: one row per asset with
    row-major pixel arrays, round(6)."""
    schema = (
        "asset_id long, out_h int, out_w int,"
        " mean_pixels array<double>, bilinear_pixels array<double>"
    )

    def kernel(batches):
        for pdf in batches:
            ids, mp, bp = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                gray = decode_image(bytes(p))
                ids.append(aid)
                mp.append(
                    np.round(
                        block_mean_resize(gray, out_w, out_h), 6
                    ).ravel().tolist()
                )
                bp.append(
                    np.round(
                        bilinear_resize(gray, out_w, out_h), 6
                    ).ravel().tolist()
                )
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "out_h": [out_h] * len(ids),
                    "out_w": [out_w] * len(ids),
                    "mean_pixels": mp,
                    "bilinear_pixels": bp,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(kernel, schema)


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
