"""IO17 — CSV source-format roundtrip (the JSONL/IO16 companion):
CSV is still the most common interchange format for tabular corpus
metadata, and it is MORE treacherous than JSON-lines — quoting,
embedded delimiters, and newline handling all silently corrupt text
if either side's dialect drifts.  Same contract as IO16: write the
documents table as CSV, read it back with an explicit DDL schema
(schema-on-read, no inference — inference samples and can mistype at
scale, declared), and emit per-source roundtrip checksums that the
ORACLE computes from the ORIGINAL parquet — count, Σ n_chars,
Σ doc_id, and the order-free DECIMAL(38,0)/HUGEINT sum of 60-bit
text md5s (byte-sensitive: any quoting or escaping corruption breaks
the hash-match).  The md5-sum overflow lesson and the .crc-sidecar
defense layer are IO16's, inherited.

Plan: one write + one line-splittable scan per side, ONE
map-side-combined aggregate — CSV costs parallelism nothing at
100 TB when (as here) fields are quoted so records stay one line
(multiline=false, declared; a corpus with raw newlines in text must
either escape them or pay the non-splittable multiline price — the
tradeoff this op documents).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.qutil import detach

_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

_HASH_SPARK = "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
_HASH_DUCK = "('0x' || substr(md5(text), 1, 15))::BIGINT"


@register(
    "csv_roundtrip_check",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS sum_ids,
           CAST(sum(CAST({_HASH_DUCK} AS HUGEINT)) AS VARCHAR)
             AS text_checksum
    FROM documents GROUP BY source
    """,
)
def csv_roundtrip_check(spark, sf_dir):
    """IO17: CSV write → explicit-schema read → per-source roundtrip
    checksums equal the parquet original (module header) — a
    hash-match proves byte-exact text preservation through the CSV
    quoting/escaping hop."""
    root = tempfile.mkdtemp(prefix="csv_rt_")
    try:
        (
            T(spark, sf_dir, "documents")
            .write.mode("overwrite")
            .option("header", "true")
            .csv(root)
        )
        back = (
            spark.read.schema(_SCHEMA)
            .option("header", "true")
            .csv(root)
        )
        out = back.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("doc_id").cast("long").alias("sum_ids"),
            F.expr(
                f"CAST(sum(CAST({_HASH_SPARK} AS DECIMAL(38,0)))"
                " AS STRING)"
            ).alias("text_checksum"),
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
