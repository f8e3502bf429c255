"""IO16 — JSONL source-format roundtrip (the ubiquitous training-data
interchange format: every public corpus pipeline — C4, The Pile,
RedPajama, Dolma — ships documents as gzipped JSON-lines): prove the
engine can WRITE the documents table as JSONL and READ it back with
an explicit schema, byte-preserving every field.

The query writes the documents table to a temp JSONL directory
(Spark's native json sink), reads it back with the explicit DDL
schema (schema-on-read, no inference — inference samples and can
mistype at scale, declared), and emits per-source ROUNDTRIP
CHECKSUMS: row count, Σ n_chars, Σ doc_id, and the order-free text
checksum Σ md5₆₀(text) (the portable-hash twin convention; the sum of
60-bit hashes exceeds int64, so it rides DECIMAL(38,0)/HUGEINT and is
emitted as an exact digit string — found live by the first sweep's
ANSI overflow).  The
ORACLE computes the identical checksums from the ORIGINAL parquet —
so a hash-match PROVES the JSONL hop preserved every doc_id, every
character of text (md5 is byte-sensitive: any mojibake, escaping, or
truncation breaks it), and every count.

Scale shape: one write + one scan per side, ONE map-side-combined
aggregate to |sources| rows; the JSONL read is line-splittable, so at
100 TB the format costs parallelism nothing (unlike multiline JSON).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.qutil import detach
from dtaidistance_spark.operators.queries import T, register

_SCHEMA = (
    "doc_id bigint, text string, lang string, source string,"
    " n_chars bigint"
)

_HASH_SPARK = (
    "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"
)
_HASH_DUCK = "('0x' || substr(md5(text), 1, 15))::BIGINT"


@register(
    "jsonl_roundtrip_check",
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
def jsonl_roundtrip_check(spark, sf_dir):
    """IO16: JSONL write → schema-on-read → per-source roundtrip
    checksums equal the parquet original (module header) — a
    hash-match proves byte-exact text preservation through the JSON
    hop."""
    root = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        T(spark, sf_dir, "documents").write.mode("overwrite").json(root)
        back = spark.read.schema(_SCHEMA).json(root)
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
