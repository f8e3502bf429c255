"""Registry queries that oracle the SYNTHETIC token table itself.

The north-rule input (FIXTURES.md §1) is generated from md5 + sin —
both available in DuckDB — so the oracle can re-derive the entire
input table independently, in SQL, from nothing but the row index.
That closes the biggest oracle gap of round 1: every synthetic-series
query's *input contract* (ids, lengths, sources, timestamps, and the
md5 of every token array) is now driver-checkable, and the flagship
DBA rollup's grouping over the north-rule table gets the same
SQL-recomputable count projection that ``events_profile_counts``
gives it over the shared events table.

DuckDB `%` keeps the dividend's sign while numpy's keeps the
divisor's, hence the ``((x % V) + V) % V`` normalization around the
(possibly negative) smooth term.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators import rollup as R
from dtaidistance_spark.operators.queries import register

_N = 512


def synth_sql(n: int) -> str:
    """DuckDB CTE re-deriving the first ``n`` rows of the synthetic
    token table independently (md5 + sin are portable — see module
    docstring for the %-sign normalization)."""
    return f"""
WITH ids AS (SELECT unnest(range({n})) AS i),
base AS (SELECT i, 'doc' || lpad(i::VARCHAR, 12, '0') AS doc_id FROM ids),
h AS (SELECT i, doc_id, ('0x' || substr(md5(doc_id), 1, 15))::BIGINT AS h FROM base),
p AS (
  SELECT i, doc_id, h,
    CASE WHEN h % 97 < 8 THEN least((64 + h % 1985) * 4, 8192)
         ELSE 64 + h % 1985 END AS n,
    h % 50257 AS hm, h % 7 AS ph, h % 100 AS m
  FROM h
),
synth AS (
  SELECT doc_id, n::INT AS n_tok,
    CASE WHEN m < 80 THEN 'web' WHEN m < 95 THEN 'code' ELSE 'books' END AS source,
    (TIMESTAMP '2026-01-01 00:00:00' + (i % 86400) * INTERVAL 1 SECOND) AS ts,
    list_transform(range(n::INT), j ->
      ((((hm * (j + 1)) % 50257
         + floor(1000 * sin(2 * pi() * j / 64.0 + ph))::BIGINT) % 50257)
        + 50257) % 50257
    ) AS tokens
  FROM p
)
"""


_SYNTH_SQL = synth_sql(_N)


@register(
    "seq_table_check",
    oracle=_SYNTH_SQL
    + """
    SELECT doc_id, n_tok, source, ts,
           md5(array_to_string(tokens, ',')) AS tok_md5
    FROM synth
    """,
)
def seq_table_check(spark, sf_dir):
    """Input-contract oracle: the distributed mapInPandas generator and
    an independent DuckDB SQL derivation must agree on every row — id,
    length, source, timestamp, and the md5 over the full token array
    (bit-exact token equality, the north rule's per-row invariant)."""
    seq = synth.sequences_df(spark, _N)
    return seq.select(
        "doc_id",
        "n_tok",
        "source",
        "ts",
        F.md5(F.array_join(F.col("tokens").cast("array<string>"), ",")).alias(
            "tok_md5"
        ),
    )


@register(
    "seq_rollup_counts",
    oracle=_SYNTH_SQL
    + """
    SELECT source AS key, date_trunc('minute', ts)::TIMESTAMP AS window_start,
           count(*) AS n_series, sum(n_tok)::BIGINT AS n_points
    FROM synth GROUP BY 1, 2
    """,
)
def seq_rollup_counts(spark, sf_dir):
    """Flagship rollup projection on the NORTH-RULE table: the 1-minute
    DBA rollup's group cardinalities must equal plain SQL over the
    independently re-derived synthetic table — the events_profile_counts
    pattern, now on the input the north rule actually names."""
    seq = synth.sequences_df(spark, _N)
    out = R.dba_rollup(seq, tier="1 minute")
    return out.select("key", "window_start", "n_series", "n_points")


@register(
    "seq_cascade_counts",
    oracle=_SYNTH_SQL
    + """
    , t1m AS (
        SELECT source, date_trunc('minute', ts) AS w1 FROM synth GROUP BY 1, 2
    )
    SELECT source AS key, date_trunc('hour', w1)::TIMESTAMP AS window_start,
           count(*) AS n_series, (128 * count(*))::BIGINT AS n_points
    FROM t1m GROUP BY 1, 2
    """,
)
def seq_cascade_counts(spark, sf_dir):
    """Oracles the cascade's TIER CHAINING: the 1-hour tier's members
    are exactly the 1-minute tier's windows (one series per (source,
    minute), each a 128-point barycenter), so its group cardinalities
    are fully derivable from the re-derived synthetic table — a broken
    tier hand-off (missing windows, wrong doc_id/ts mapping, dropped
    barycenters) breaks counts the driver hashes."""
    seq = synth.sequences_df(spark, _N)
    tiers = R.cascade(seq, tiers=("1 minute", "1 hour"), persist=True)
    out = tiers["1 hour"].select("key", "window_start", "n_series", "n_points")
    out = out.persist()
    out.count()
    for df in tiers.values():
        df.unpersist()
    return out


@register(
    "sequence_packing",
    oracle=_SYNTH_SQL
    + """
    , c AS (
        SELECT source, doc_id, n_tok::BIGINT AS n_tok,
               sum(n_tok::BIGINT) OVER (
                   PARTITION BY source ORDER BY doc_id
               )::BIGINT AS cum
        FROM synth
    )
    SELECT source, doc_id, t.chunk_id,
           greatest(cum - n_tok, t.chunk_id * 2048) - (cum - n_tok)
               AS tok_start,
           least(cum, (t.chunk_id + 1) * 2048) - (cum - n_tok) AS tok_end,
           least(cum, (t.chunk_id + 1) * 2048)
               - greatest(cum - n_tok, t.chunk_id * 2048) AS n_span
    FROM c, unnest(generate_series((cum - n_tok) // 2048,
                                   (cum - 1) // 2048)) AS t(chunk_id)
    """,
)
def sequence_packing(spark, sf_dir):
    """GPT-style concat-and-chop sequence packing — the op that turns a
    curated corpus into fixed-width training rows: docs are laid
    end-to-end in a deterministic order per source stream and chopped
    into 2048-token context windows; a doc straddling a boundary is
    split, so the output is one row per (doc, window) span with the
    in-doc token range. Pure window SQL: one cumsum per source stream,
    then an explode over each doc's touched windows — zero waste by
    construction (every window except each stream's last is exactly
    full). Scale: the window is partitioned by source, so streams pack
    in parallel; a single hot source is packed two-level at corpus
    scale (shard cumsums, then re-base each shard by the exclusive
    prefix total of the shards before it — same arithmetic, one extra
    tiny aggregate) rather than forcing one task through 10^12 rows."""
    from pyspark.sql import Window

    B = 2048
    seq = synth.sequences_df(spark, _N).select(
        "source", "doc_id", F.col("n_tok").cast("long").alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    c = seq.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "start", F.col("cum") - F.col("n_tok")
    )
    spans = c.select(
        "source",
        "doc_id",
        "cum",
        "start",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / B), F.floor((F.col("cum") - 1) / B)
            )
        ).alias("chunk_id"),
    )
    lo = F.greatest(F.col("start"), F.col("chunk_id") * B)
    hi = F.least(F.col("cum"), (F.col("chunk_id") + 1) * B)
    return spans.select(
        "source",
        "doc_id",
        "chunk_id",
        (lo - F.col("start")).alias("tok_start"),
        (hi - F.col("start")).alias("tok_end"),
        (hi - lo).alias("n_span"),
    )
