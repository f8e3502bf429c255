"""Z-order (Morton) clustering for multi-dimensional file skipping —
the Delta ``OPTIMIZE ZORDER BY`` / Iceberg ``rewrite_data_files``
sort-order idea expressed over TableIO.

Min/max column stats prune well only when a file's value range is
narrow, and a table laid out by ingest order is narrow in NOTHING
except ingest time. Interleaving the bits of two (quantized) columns
into one Morton key and bucketing by it makes every bucket a rectangle
in (col1, col2) space, so range predicates on EITHER or BOTH columns
prune entries — the layout rewrite a 100 TB table runs once so that
every later 2-D slice reads a handful of files.

Everything here is row-local integer arithmetic (quantize, bit
interleave, bucket = fixed z-range split — no global sort, no skew
point), so the rewrite is one deterministic shuffle onto the bucket
key and DuckDB re-derives the exact same assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # quantization bits per dimension -> 16-bit Morton key


def quantize(col: str, lo: int, span: int) -> Column:
    """Map an integer column in [lo, lo+span-1] onto 0..2^BITS-1 with
    exact integer arithmetic: ((v - lo) * 2^BITS) div span."""
    return F.expr(f"(({col} - {lo}) * {1 << BITS}) div {span}")


def zvalue(q1: str, q2: str) -> Column:
    """Morton interleave of two BITS-bit quantized columns (q1 takes
    the odd bit positions): pure JVM SQL, exact int64."""
    return F.expr(
        f"aggregate(sequence(0, {BITS - 1}), 0L, (a, b) -> "
        f"a + shiftleft(cast((shiftright({q1}, b) & 1) AS BIGINT), 2 * b + 1)"
        f" + shiftleft(cast((shiftright({q2}, b) & 1) AS BIGINT), 2 * b))"
    )


def zbucket(z: str, n_buckets: int) -> Column:
    """Fixed even split of the 2*BITS-bit z-range into ``n_buckets`` —
    row-local (no global sort / no skew point); empty buckets simply
    produce no files."""
    return F.expr(f"({z} * {n_buckets}) div {1 << (2 * BITS)}")


def with_zorder(
    df: DataFrame,
    col1: str,
    lo1: int,
    span1: int,
    col2: str,
    lo2: int,
    span2: int,
    n_buckets: int = 16,
) -> DataFrame:
    """Attach ``zbucket`` (and the intermediate z value) for clustering
    ``df`` by the Morton order of (col1, col2)."""
    out = (
        df.withColumn("__q1", quantize(col1, lo1, span1))
        .withColumn("__q2", quantize(col2, lo2, span2))
        .withColumn("__z", zvalue("__q1", "__q2"))
        .withColumn("zbucket", zbucket("__z", n_buckets))
    )
    return out.drop("__q1", "__q2", "__z")
