"""Table-layout operator queries: z-order clustering effectiveness,
driver-oracled end-to-end.

The oracle does NOT trust the engine's bucket assignment or pruning —
DuckDB re-derives the quantization, the Morton bit interleave, the
bucket split, every bucket's min/max stats, and every keep/skip
decision from the synth-table arithmetic alone, then both layouts'
entry counts and the exact matching row count must hash-match.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql
from dtaidistance_spark.sources.tableio import TableIO
from dtaidistance_spark.sources.zorder import with_zorder

# dimensions: n_tok in [64, 8192] (span 8129), tokens[0] in [0, 50256]
_N = 256
_B = 16
_PRED = {"n_tok": (100, 1000), "tok0": (10000, 20000)}

_ZORDER_ORACLE = (
    synth_sql(_N)
    + f"""
    , zd AS (
      SELECT doc_id, n_tok, tokens[1] AS tok0,
             CAST(substr(doc_id, 4, 12) AS INT) AS i
      FROM synth
    ),
    zq AS (
      SELECT *, ((n_tok - 64) * 256) // 8129 AS q1,
                (tok0 * 256) // 50257 AS q2
      FROM zd
    ),
    zz AS (
      SELECT *, list_sum(list_transform(range(8), b ->
          (((q1 >> b) & 1)::BIGINT << (2 * b + 1))
          + (((q2 >> b) & 1)::BIGINT << (2 * b))))::BIGINT AS z
      FROM zq
    ),
    bk AS (
      SELECT *, (z * {_B}) // 65536 AS zb, i // {_N // _B} AS lb FROM zz
    ),
    zs AS (
      SELECT zb, min(n_tok) AS mn1, max(n_tok) AS mx1,
             min(tok0) AS mn2, max(tok0) AS mx2
      FROM bk GROUP BY 1
    ),
    ls AS (
      SELECT lb, min(n_tok) AS mn1, max(n_tok) AS mx1,
             min(tok0) AS mn2, max(tok0) AS mx2
      FROM bk GROUP BY 1
    ),
    zdec AS (
      SELECT zb, NOT (mx1 < 100 OR mn1 > 1000
                      OR mx2 < 10000 OR mn2 > 20000) AS keep
      FROM zs
    ),
    ldec AS (
      SELECT lb, NOT (mx1 < 100 OR mn1 > 1000
                      OR mx2 < 10000 OR mn2 > 20000) AS keep
      FROM ls
    ),
    mt AS (
      SELECT count(*) AS n_rows FROM bk
      WHERE n_tok BETWEEN 100 AND 1000 AND tok0 BETWEEN 10000 AND 20000
    ),
    eff AS (
      SELECT (SELECT count(*) FROM zdec WHERE keep)
             <= (SELECT count(*) FROM ldec WHERE keep) AS zorder_no_worse
    )
    SELECT 'zorder' AS layout,
           (SELECT count(*) FROM zdec) AS n_entries,
           (SELECT count(*) FROM zdec WHERE keep) AS n_selected,
           (SELECT count(*) FROM zdec WHERE NOT keep) AS n_skipped,
           (SELECT n_rows FROM mt) AS n_rows,
           (SELECT zorder_no_worse FROM eff) AS zorder_no_worse
    UNION ALL
    SELECT 'linear',
           (SELECT count(*) FROM ldec),
           (SELECT count(*) FROM ldec WHERE keep),
           (SELECT count(*) FROM ldec WHERE NOT keep),
           (SELECT n_rows FROM mt),
           (SELECT zorder_no_worse FROM eff)
    """
)


@register("zorder_skip_check", oracle=_ZORDER_ORACLE)
def zorder_skip_check(spark, sf_dir):
    """Z-order clustering (IO11, the Delta OPTIMIZE ZORDER shape) vs a
    linear (ingest-order) layout, driver-oracled: the synth table is
    written twice into TableIO with stats on (n_tok, tok0) — once
    bucketed by the Morton interleave of the two columns, once by doc
    index — and a 2-D range read plans against both manifests. DuckDB
    re-derives the quantization, interleave, bucket split, per-bucket
    stats, and every keep/skip decision, so the pruning counts
    themselves are hash-verified (z-order selects a strict subset at
    this shape: rectangles in value space vs full-range stripes).
    Zero-collect, one deterministic shuffle per layout."""
    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, _N).select(
        "doc_id",
        "n_tok",
        F.expr("tokens[0]").alias("tok0"),
        F.substring("doc_id", 4, 12).cast("int").alias("i"),
    )
    zdf = with_zorder(
        df, "n_tok", 64, 8129, "tok0", 0, 50257, n_buckets=_B
    ).withColumn("zbucket", F.col("zbucket").cast("string"))
    ldf = df.withColumn(
        "lbucket", F.expr(f"i div {_N // _B}").cast("string")
    )
    root = tempfile.mkdtemp(prefix="zorder_q_")
    try:
        rows = []
        for layout, d, bcol in (("zorder", zdf, "zbucket"), ("linear", ldf, "lbucket")):
            t = TableIO(
                root,
                layout,
                partition_by=[bcol],
                stats_cols=["n_tok", "tok0"],
            )
            t.write(d.select("doc_id", "n_tok", "tok0", bcol), mode="overwrite")
            sel, skip = t.scan_entries(stats_filter=_PRED)
            n = (
                t.read(spark, stats_filter=_PRED)
                .where(
                    F.col("n_tok").between(*_PRED["n_tok"])
                    & F.col("tok0").between(*_PRED["tok0"])
                )
                .count()
            )
            rows.append((layout, len(sel) + len(skip), len(sel), len(skip), n))
        z_sel, l_sel = rows[0][2], rows[1][2]
        out = [r + (z_sel <= l_sel,) for r in rows]
        return spark.createDataFrame(
            out,
            "layout string, n_entries long, n_selected long, "
            "n_skipped long, n_rows long, zorder_no_worse boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
