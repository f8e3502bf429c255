"""Registry queries for the multimodal plumbing. ``multimodal_assets``
is fully SQL-oracled (payload construction and sizes are portable md5
expressions); the feature/frame kernels are rows-only with pytest
gates against local numpy."""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import multimodal as M
from dtaidistance_spark.operators.qutil import jsonify_complex
from dtaidistance_spark.operators.queries import T, register


@register(
    "multimodal_assets",
    oracle="""
    SELECT doc_id AS asset_id,
           ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
           octet_length(unhex(repeat(md5(text), 8))) AS n_bytes,
           md5(lower(hex(unhex(repeat(md5(text), 8))))) AS payload_md5
    FROM documents
    """,
)
def multimodal_assets(spark, sf_dir):
    """Asset synthesis + binary column round-trip: byte length and the
    md5 of the hex of the payload must match DuckDB exactly."""
    assets = M.make_assets(T(spark, sf_dir, "documents"))
    return assets.select(
        "asset_id",
        "kind",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5(F.lower(F.hex("payload"))).alias("payload_md5"),
    )


@register("multimodal_features")
def multimodal_features(spark, sf_dir):
    """Byte-histogram features through the Arrow-batched kernel
    (rows-only; kernel gated vs local numpy in tests)."""
    assets = M.make_assets(T(spark, sf_dir, "documents"))
    out = M.extract_features(assets)
    return jsonify_complex(
        out.select(
            "asset_id",
            "kind",
            "n_bytes",
            F.transform("features", lambda x: F.round(x, 6)).alias("features"),
        ).orderBy("asset_id")
    )


@register("video_frame_sample")
def video_frame_sample(spark, sf_dir):
    """Strided frame sampling on video assets, pure SQL on binary."""
    assets = M.make_assets(T(spark, sf_dir, "documents"))
    return jsonify_complex(M.frame_sample(assets).orderBy("asset_id"))


@register("audio_resample")
def audio_resample_q(spark, sf_dir):
    """Audio lane end-to-end: int16 PCM payloads linear-resampled
    16 kHz -> 8 kHz in an Arrow-batched kernel (rows-only; kernel vs
    numpy oracle gated in test_pipeline_ops)."""
    docs = T(spark, sf_dir, "documents")
    return jsonify_complex(
        M.audio_resample(M.make_assets(docs), dst_rate=8000).orderBy("asset_id")
    )


@register("image_resize")
def image_resize_q(spark, sf_dir):
    """Image lane: deterministic area resize of the byte-grid grayscale
    stand-in (real jpeg/png decode stays behind the PIL import guard;
    plumbing identical)."""
    docs = T(spark, sf_dir, "documents")
    return jsonify_complex(
        M.image_resize(M.make_assets(docs), out_w=4, out_h=4).orderBy("asset_id")
    )


@register(
    "multimodal_features_check",
    oracle="""
    WITH a AS (
        SELECT doc_id AS asset_id,
               ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
               repeat(md5(text), 8) AS hexs
        FROM documents
    ), bytes AS (
        SELECT asset_id,
               ('0x' || substr(hexs, 2 * i + 1, 2))::INT // 16 AS bin
        FROM a, (SELECT unnest(range(128)) AS i)
    ), h AS (
        SELECT asset_id, bin, count(*) AS cnt FROM bytes GROUP BY 1, 2
    ), grid AS (
        SELECT a.asset_id, a.kind, b.bin
        FROM a, (SELECT unnest(range(16)) AS bin) b
    )
    SELECT g.asset_id, g.kind, 128 AS n_bytes, g.bin::INT AS bin,
           coalesce(h.cnt, 0)::BIGINT AS byte_count
    FROM grid g
    LEFT JOIN h ON h.asset_id = g.asset_id AND h.bin = g.bin
    """,
)
def multimodal_features_check(spark, sf_dir):
    """FULL oracle for the byte-histogram feature kernel: DuckDB
    re-derives every asset's 16-bin byte histogram from the md5-hex
    payload (hex-pair -> byte -> bin) and must match the Arrow-batched
    numpy kernel bin by bin. Counts are compared as integers
    (share * n_bytes is exact — n_bytes is a power of two), sidestepping
    cross-engine decimal-tie rounding."""
    assets = M.make_assets(T(spark, sf_dir, "documents"))
    out = M.extract_features(assets)
    return out.select(
        "asset_id",
        "kind",
        "n_bytes",
        F.posexplode("features").alias("bin", "share"),
    ).select(
        "asset_id",
        "kind",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        "bin",
        F.round(F.col("share") * F.col("n_bytes")).cast("bigint").alias("byte_count"),
    )
