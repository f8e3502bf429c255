"""T92 — zlib compressibility ratio per document (Deutsch RFC 1950/
1951; the compression-ratio quality filter of Gopher §A.1.1 /
C4-style curation): the PRACTICAL twin of T83's LZ76 complexity —
production pipelines screen training text by "how well does it
gzip" because boilerplate, scraped templates and degenerate
repetition compress abnormally well, while alphabet soup compresses
abnormally badly; both tails are quality signals.

    ratio(doc) = len(zlib.compress(utf8(text), level=6)) / len(utf8)

Engine shape: ``mapInPandas`` with Arrow batches — the sanctioned
vectorized-Python path (zlib is a byte-level codec no SQL engine
exposes; per-batch loop over a pandas column, NOT per-row UDF
rows).  zlib output at a fixed level/strategy is deterministic
bytes, so the ratio is exact and reproducible; level 6 (the zlib
default) is declared.  floor-1e6 on the emitted ratio.

Oracle strategy (declared): the compression step itself is
non-SQL, so ``zlib_compressibility`` is a rows-only registry entry
whose full byte-exactness is gated in pytest (python-zlib
recompute per doc — EXACT equality of compressed lengths); the
DuckDB-oracled twin ``zlib_input_check`` pins the entire input
plumbing (per-doc UTF-8 byte length + md5 of the text Spark hands
the codec), so a hash mismatch anywhere upstream of zlib is still
driver-visible.

Honest (gated) reading — measured, and the draft's guess was
inverted by a mechanism the ratio's definition hides: these
documents are 48–553 chars, far below DEFLATE's dictionary
steady-state, so the per-doc ratio is dominated by the codec
WARM-UP transient — corr(ratio, log n_chars) = −0.978 — spanning
[0.398, 1.019] (median 0.508, short docs ABOVE 1.0 from header
overhead) while the corpus's true asymptotic redundancy is 0.192
(whole-corpus concatenation, the 50-word vocabulary compressing
5×).  Consequence, gated: a Gopher-style "too-compressible"
boilerplate screen at ratio < 0.30 rejects ZERO of these 500
templated docs — on short documents the screen silently measures
length, not redundancy, the second length-trap in a row after
T91's segmentation trap and a different mechanism.  A pipeline
applying compression filters to short texts must either
length-stratify the thresholds or pool documents first.  Gates:
exact zlib recompute per doc; the constructed triple ordering
(constant text ≪ English sentence < LCG bytes ≈ 1); level-6
determinism (identical bytes on identical input); the corpus band
+ log-length correlation < −0.95 + whole-corpus 0.19 + zero-reject
screen reads.

Scale shape: one mapInPandas projection — embarrassingly parallel,
no shuffle; ratios flow into ordinary relational filters.
"""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_LEVEL = 6

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _compress_batches(batches):
    for pdf in batches:
        texts = pdf["text"].astype(str)
        raw = texts.str.encode("utf-8")
        n_bytes = raw.str.len()
        z_bytes = raw.map(
            lambda b: len(zlib.compress(b, _LEVEL))
        )
        out = pdf[["doc_id"]].copy()
        out["n_bytes"] = n_bytes.astype("int64")
        out["z_bytes"] = z_bytes.astype("int64")
        out["ratio"] = [
            math.floor(z / n * 1e6 + 0.5) / 1e6 if n else None
            for z, n in zip(out.z_bytes, out.n_bytes)
        ]
        yield out


@register("zlib_compressibility")
def zlib_compressibility(spark, sf_dir):
    """T92: zlib(level 6) compression ratio per document (module
    header) — Arrow-batched mapInPandas, exact deterministic
    bytes, floor-1e6; rows-only with the oracled input twin
    ``zlib_input_check`` and exact pytest recompute."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        _compress_batches,
        schema="doc_id long, n_bytes long, z_bytes long, ratio double",
    )


@register(
    "zlib_input_check",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS text_md5
    FROM documents
    """,
)
def zlib_input_check(spark, sf_dir):
    """T92 twin: DuckDB-oracled pin of the exact bytes the codec
    receives — UTF-8 length + md5 per doc (module header)."""
    return T(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("CAST(octet_length(text) AS BIGINT)").alias("n_bytes"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )
