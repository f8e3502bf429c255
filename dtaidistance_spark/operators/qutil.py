"""Driver-harness-proof helpers for registry queries.

The correctness driver runs every registry query in a BARE SparkSession
(no Arrow config) and canonicalizes results by pandas-sorting every
output column. Two things break under that contract even when the
algorithms are right (round-1 postmortem, VERDICT.md "What's wrong"):

1. ``spark.createDataFrame(pdf)`` where a pandas column holds numpy
   arrays — the non-Arrow type inferencer raises
   ``CANNOT_INFER_TYPE_FOR_FIELD``. Fix: pure-Python lists + an
   explicit schema string, never inference (:func:`paa_series_df`).
2. Raw ``array<...>`` output columns — pandas sort_values factorizes
   cells and lists are unhashable. Fix: :func:`jsonify_complex` every
   complex column at the registry boundary (the pytest parity gates on
   the underlying operators keep the bit-exact array checks).

Every registry query must return only atomic-typed columns; the gate in
tests/test_driver_harness.py enforces it for the whole registry.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from dtaidistance_spark import kernels as K
from dtaidistance_spark import synth


def paa_series_df(
    spark,
    n: int,
    length: int = 64,
    with_source: bool = False,
) -> DataFrame:
    """The synthetic PAA-reduced series table used by the kernel-surface
    registry queries, built bare-session-safe: pure-Python float lists +
    explicit schema (no pandas/ndarray inference anywhere)."""
    pdf = synth.sequences_local(n)
    rows = [
        (
            str(d),
            [float(x) for x in K.paa(np.asarray(t, dtype=np.float64), length)],
            str(s),
        )
        for d, t, s in zip(pdf["doc_id"], pdf["tokens"], pdf["source"])
    ]
    schema = "doc_id string, tokens array<double>, source string"
    if not with_source:
        rows = [r[:2] for r in rows]
        schema = "doc_id string, tokens array<double>"
    return spark.createDataFrame(rows, schema)


def jsonify_complex(df: DataFrame) -> DataFrame:
    """``to_json`` every array/map/struct output column (same name, now
    a deterministic JSON string) so the driver's pandas column-sort
    canonicalization never sees an unhashable cell."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType)):
            out = out.withColumn(f.name, F.to_json(f.name))
    return out


def global_topk(df: DataFrame, keys, k: int, rank_col: str = "rank") -> DataFrame:
    """Global top-k with a 1..k rank column, planned WITHOUT any
    partition-less WindowExec (the round-2 scale-killer: a window spec
    with no partition columns funnels EVERY input row through one partition —
    Spark itself warns ``No Partition Defined for Window operation``).

    Plan shape (asserted in tests/test_plans.py):

    - ``orderBy(...).limit(k)`` plans as **TakeOrderedAndProject** — a
      bounded per-partition heap of k rows + a k-row-per-partition merge,
      the 100 TB-safe global top-k; no full sort ever materializes.
    - the rank is then derived on the <=k survivors by ONE single-row
      ``sort_array(collect_list(struct))`` aggregate + ``posexplode`` —
      zero Window nodes anywhere in the plan.

    ``keys`` is a list of ``(Column, descending: bool)``. Descending keys
    must be numeric: inside the tie-break struct they are negated, and
    IEEE negation is order-reversing (including -0.0 <-> 0.0), so the
    struct sort replays the TakeOrderedAndProject order exactly. The key
    list must be a total order (include a unique tie-breaker) so the rank
    matches the oracle's ``row_number()`` deterministically.
    """
    payload = df.columns
    sort_cols = [c.desc() if d else c.asc() for (c, d) in keys]
    top = df.orderBy(*sort_cols).limit(int(k))
    keyed = top.select(
        F.struct(
            *[((-c) if d else c).alias(f"_k{i}") for i, (c, d) in enumerate(keys)],
            F.struct(*[F.col(c) for c in payload]).alias("_p"),
        ).alias("_s")
    )
    arr = keyed.agg(F.sort_array(F.collect_list("_s")).alias("_a"))
    return arr.select(F.posexplode("_a").alias("_i", "_s")).select(
        F.col("_s._p.*"),
        (F.col("_i") + F.lit(1)).cast("int").alias(rank_col),
    )


def detach(spark, df: DataFrame) -> DataFrame:
    """Re-create a small result as a local DataFrame (collected Rows +
    the explicit original schema — no pandas round-trip, no inference)
    so it survives deletion of the temp files it was computed from.
    Complex columns are jsonified first, which also makes the collected
    payload plain strings."""
    flat = jsonify_complex(df)
    return spark.createDataFrame(flat.collect(), flat.schema)
