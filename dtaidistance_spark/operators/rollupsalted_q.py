"""A1-scale — salted giant-group DBA rollup (round-4 verdict item #4;
SURVEY §4.3's declared limit closed).  The exact flagship tier
(``rollup.dba_rollup``) funnels each (key, window) group through one
window sort + one Arrow group; a pathological hot key at 10^12-row
scale makes that a single task.  ``rollup.dba_rollup_salted`` splits
groups above a threshold by a deterministic member salt, runs the
VERBATIM exact machinery per subgroup, and re-merges the partial
barycenters with one weighted DBA pass
(``kernels.dba_batch_weighted`` — weights = subgroup member counts,
largest partial anchors the init).  Full contract + measured
approximation numbers in the ``dba_rollup_salted`` docstring; gates
in tests/test_rollup_salted.py (balanced-path bit-equality, salted
replicated-identity to the ulp, 5.9 %-measured / 8 %-pinned delta on
the adversarial heterogeneous control, weighted-kernel laws).

Registry surface:

* ``rollup_salted_identity`` — FULLY ORACLED (the band-degeneration
  discipline of ``rollup_diag_identity``): every series replicated 24
  times into one (key, window) group, ``salt_threshold=8`` /
  ``salt_buckets=4`` forcing the salted path end-to-end (routing
  counts join → per-salt window-rank stride sample → partial DBA →
  weighted re-merge).  Identical members make every partial equal the
  series and the weighted merge return it (ulp-tight; exact after the
  integer round), so the barycenter's rounded-integer CSV md5 must
  equal DuckDB's md5 over the re-derived tokens, and the counts are
  the exact 24 / 24·64.
* ``rollup_dba_salted`` — the operator over the heterogeneous corpus
  (rows-only: real DBA is not ANSI SQL; twin = the identity oracle +
  the pytest delta gate): synthetic hot-key construction — every
  series assigned to ONE source so each 1-minute window is a giant
  group — with threshold 8 / buckets 4, emitting counts + the
  rounded-barycenter md5 (deterministic: fixed member order, fixed
  iteration counts, no RNG anywhere).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators import rollup as R
from dtaidistance_spark.operators.diag_q import _L, _sliced
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_REP = 24  # replicas per series — must exceed the salt threshold
_TH = 8
_S = 4


def _replicated(spark, n: int):
    """Each sliced series replicated _REP times into one (doc_id-keyed,
    single-window) giant group — the diag_q identity construction
    scaled past the salt threshold."""
    base = _sliced(spark, n)
    return base.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(_REP)])
        ).alias("r"),
        F.col("doc_id").alias("orig"),
        "tokens",
        "ts",
    ).select(
        F.concat("orig", F.lit("#"), F.col("r").cast("string")).alias(
            "doc_id"
        ),
        "tokens",
        F.col("orig").alias("source"),
        "ts",
    )


@register(
    "rollup_salted_identity",
    oracle=synth_sql(48)
    + f"""
    SELECT doc_id AS key,
           date_trunc('minute', ts)::TIMESTAMP AS window_start,
           {_REP}::BIGINT AS n_series, {_REP * _L}::BIGINT AS n_points,
           md5(array_to_string(tokens[1:{_L}], ',')) AS bary_md5
    FROM synth
    """,
)
def rollup_salted_identity(spark, sf_dir):
    """A1-scale identity oracle through the FULL salted pipeline
    (module header): 24 identical copies of each series, forced
    through routing → salting → partial DBA → weighted re-merge, must
    roll up to that series exactly — counts exact, rounded-integer
    barycenter md5 == DuckDB's md5 of the re-derived tokens."""
    df = _replicated(spark, 48)
    out = R.dba_rollup_salted(
        df,
        tier="1 minute",
        barycenter_len=_L,
        dba_window=4,
        salt_threshold=_TH,
        salt_buckets=_S,
    )
    return out.select(
        "key",
        "window_start",
        "n_series",
        "n_points",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    "barycenter",
                    lambda x: F.round(x).cast("bigint").cast("string"),
                ),
            )
        ).alias("bary_md5"),
    )


@register("rollup_dba_salted")
def rollup_dba_salted(spark, sf_dir):
    """A1-scale over the heterogeneous corpus (module header): all 64
    series on one hot source key so every 1-minute window is a giant
    group; threshold 8 / 4 salt buckets exercise routing, per-salt
    stride sampling, partial DBA and the weighted merge on REAL
    non-identical members.  Rows-only; the identity twin above plus
    the pytest delta gate carry the correctness story."""
    df = synth.sequences_df(spark, 64).select(
        "doc_id", "tokens", F.lit("hot").alias("source"), "ts"
    )
    out = R.dba_rollup_salted(
        df,
        tier="1 minute",
        salt_threshold=_TH,
        salt_buckets=_S,
    )
    return out.select(
        "key",
        "window_start",
        "n_series",
        "n_points",
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    "barycenter",
                    lambda x: F.round(x).cast("bigint").cast("string"),
                ),
            )
        ).alias("bary_md5"),
    )
