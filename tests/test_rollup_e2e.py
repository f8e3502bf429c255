"""End-to-end gates: tier parity (SURVEY §5.2 #4), token row invariant
(G11), TableIO round-trip + time travel, salted repartition determinism."""

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators import rollup as R
from dtaidistance_spark.sources.tableio import TableIO

N = 240  # spans 4 one-minute windows x 3 sources


@pytest.fixture(scope="module")
def seq_pdf():
    return synth.sequences_local(N)


@pytest.fixture(scope="module")
def seq_df(spark):
    return synth.sequences_df(spark, N, partitions=7).cache()


def _rolled_to_pdf(df):
    p = df.toPandas()
    p["barycenter"] = p["barycenter"].map(np.asarray)
    return p.sort_values(["key", "window_start"]).reset_index(drop=True)


def _assert_rollup_equal(got: pd.DataFrame, want: pd.DataFrame):
    want = want.sort_values(["key", "window_start"]).reset_index(drop=True)
    assert list(got["key"]) == list(want["key"])
    assert list(got["window_start"]) == list(want["window_start"])
    assert list(got["n_series"]) == list(want["n_series"])
    assert list(got["n_points"]) == list(want["n_points"])
    for a, b in zip(got["barycenter"], want["barycenter"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_invariant_g11(spark, seq_pdf):
    """tokens bit-exact per doc_id at any partitioning (input_hint)."""
    for parts in (3, 11):
        got = (
            synth.sequences_df(spark, N, partitions=parts)
            .orderBy("doc_id")
            .toPandas()
        )
        assert list(got["doc_id"]) == list(seq_pdf["doc_id"])
        for a, b in zip(got["tokens"], seq_pdf["tokens"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert list(got["n_tok"]) == list(seq_pdf["n_tok"])
        assert list(got["source"]) == list(seq_pdf["source"])


def test_tier_parity_1m(spark, seq_df, seq_pdf):
    got = _rolled_to_pdf(R.dba_rollup(seq_df, tier="1 minute"))
    want = R.rollup_local(seq_pdf, 60)
    _assert_rollup_equal(got, want)


def test_tier_parity_cascade(spark, seq_df, seq_pdf):
    spark_tiers = R.cascade(seq_df, tiers=("1 minute", "1 hour", "1 day"))
    local_tiers = R.cascade_local(seq_pdf, tiers=(60, 3600, 86400))
    for tier, sec in (("1 minute", 60), ("1 hour", 3600), ("1 day", 86400)):
        got = _rolled_to_pdf(spark_tiers[tier])
        _assert_rollup_equal(got, local_tiers[sec])


def test_rollup_partitioning_invariant(spark, seq_df):
    """DBA rollup result identical under different shuffle layouts —
    required for resume-safety and the N vs 4N scaling claim."""
    base = _rolled_to_pdf(R.dba_rollup(seq_df, tier="1 minute"))
    salted = _rolled_to_pdf(
        R.dba_rollup(R.salted_repartition(seq_df, 13, "source"), tier="1 minute")
    )
    _assert_rollup_equal(salted, base)


def test_tableio_roundtrip(spark, seq_df, tmp_path):
    io = TableIO(str(tmp_path), "sequences", partition_by=["source"])
    io.write(seq_df, mode="overwrite")
    back = io.read(spark).orderBy("doc_id").toPandas()
    orig = seq_df.orderBy("doc_id").toPandas()
    assert list(back["doc_id"]) == list(orig["doc_id"])
    for a, b in zip(back["tokens"], orig["tokens"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert set(back["source"]) == set(orig["source"])
    assert io.total_rows() == N


def test_tableio_dynamic_overwrite_and_time_travel(spark, tmp_path):
    io = TableIO(str(tmp_path), "t", partition_by=["source"])
    df1 = spark.createDataFrame(
        [("a", "web", 1), ("b", "code", 2)], "id string, source string, v int"
    )
    s1 = io.write(df1, mode="overwrite")
    df2 = spark.createDataFrame([("c", "web", 99)], "id string, source string, v int")
    io.write(df2, mode="dynamic")  # replaces only source=web
    cur = {r["id"]: r["v"] for r in io.read(spark).collect()}
    assert cur == {"c": 99, "b": 2}
    old = {r["id"]: r["v"] for r in io.read(spark, snapshot=s1).collect()}
    assert old == {"a": 1, "b": 2}
    # manifest-side partition pruning reads only the matching partition
    web_only = io.read(spark, partition_filter=lambda p: p["source"] == "web")
    assert {r["id"] for r in web_only.collect()} == {"c"}


def test_no_per_row_python_in_plan(spark, seq_df):
    """North rule: plan shows only Arrow-vectorized Python nodes."""
    plan = R.dba_rollup(seq_df, tier="1 hour")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # Arrow-vectorized kernel stage
    assert "BatchEvalPython" not in plan  # zero per-row Python


def test_iceberg_backend_guard(spark):
    """The real-Iceberg backend exists with the same interface and
    fails fast with guidance when the runtime jar is absent (this
    sandbox); on a cluster with iceberg-spark-runtime it activates."""
    import pytest

    from dtaidistance_spark.sources.tableio import (
        IcebergTableIO,
        iceberg_available,
    )

    assert iceberg_available(spark) is False  # sandbox: no jar
    io = IcebergTableIO("lake", "tiers", "tier_1m", partition_by=["key"])
    assert io.identifier == "lake.tiers.tier_1m"
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        io.read(spark)


def test_salted_repartition_balances_skew(spark):
    """The deterministic salt actually spreads a skewed key: with 80%
    of rows on one source, plain repartition(source) concentrates them
    in one partition; the salted version caps the largest partition
    near uniform. Also: same salt on a rerun (determinism)."""
    from pyspark.sql import functions as F

    seq = synth.sequences_df(spark, 2000)  # source: ~80% 'web'

    def sizes(df):
        return (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().toPandas()["count"]
        )

    plain = sizes(seq.repartition(8, F.col("source")))
    salted = sizes(R.salted_repartition(seq, 8, "source"))
    assert plain.max() >= 0.75 * 2000  # skewed key concentrates
    assert salted.max() <= 0.30 * 2000, salted.tolist()  # salt spreads it
    # deterministic: identical partition assignment across runs
    a = R.salted_repartition(seq, 8, "source").withColumn(
        "pid", F.spark_partition_id()).select("doc_id", "pid").toPandas()
    b = R.salted_repartition(seq, 8, "source").withColumn(
        "pid", F.spark_partition_id()).select("doc_id", "pid").toPandas()
    pa = a.sort_values("doc_id").reset_index(drop=True)
    pb = b.sort_values("doc_id").reset_index(drop=True)
    assert (pa["pid"].values == pb["pid"].values).all()


def test_degenerate_rows_filtered(spark):
    """Null/empty token arrays (inevitable in a 10^12-row corpus) are
    dropped by policy before the kernel — Spark and the local twin
    agree, valid rows roll up unchanged."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d"],
            "tokens": [[1, 2, 3, 4], [], None, [5, 6]],
            "n_tok": [4, 0, 0, 2],
            "source": ["web"] * 4,
            "ts": [pd.Timestamp("2026-01-01 00:00:10")] * 4,
        }
    )
    out = R.dba_rollup(spark.createDataFrame(pdf), tier="1 minute").collect()
    assert len(out) == 1
    assert out[0]["n_series"] == 2 and out[0]["n_points"] == 6
    loc = R.rollup_local(pdf, 60)
    assert len(loc) == 1
    assert int(loc["n_series"].iloc[0]) == 2
    assert np.array_equal(
        np.asarray(out[0]["barycenter"]), np.asarray(loc["barycenter"].iloc[0])
    )


def test_hot_group_bounded_memory_50k_members(spark):
    """Round-1 hazard: a (key, window) owning 50k member series must not
    materialize an unbounded collect_list buffer. The stride sample now
    runs as a pre-aggregation filter, so only max_members arrays enter
    the agg; this gate checks (a) Spark == local twin bit-exactly on the
    degenerate one-hot-group input, (b) the plan filters BEFORE the
    collect_list aggregate (the bounded shape), (c) one shuffle total."""
    import pandas as pd

    n = 50_000
    df = spark.range(n).selectExpr(
        "concat('d', lpad(cast(id AS string), 6, '0')) AS doc_id",
        "transform(sequence(0, 7), j -> cast((id * 7 + j) % 101 AS double)) AS tokens",
        "'hot' AS source",
        "timestamp'2026-01-01 00:00:10' AS ts",
    )
    out = R.dba_rollup(
        df, tier="1 minute", max_members=256, barycenter_len=16, dba_window=4
    )
    rows = out.collect()  # finalize the adaptive plan before inspecting
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # final adaptive plan only
    # one shuffle total (the constant hot key folds it to SinglePartition)
    assert plan.count("+- Exchange ") == 1
    cl = plan.index("collect_list")
    assert "Filter" in plan[cl:], "stride filter must sit below the aggregate"

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:06d}" for i in range(n)],
            "tokens": [
                np.asarray([(i * 7 + j) % 101 for j in range(8)], dtype=float)
                for i in range(n)
            ],
            "source": ["hot"] * n,
            "ts": [pd.Timestamp("2026-01-01 00:00:10")] * n,
        }
    )
    loc = R.rollup_local(
        pdf, 60, max_members=256, barycenter_len=16, dba_window=4
    )
    assert len(rows) == 1 and len(loc) == 1
    assert rows[0]["n_series"] == n == int(loc["n_series"].iloc[0])
    assert rows[0]["n_points"] == 8 * n
    assert np.array_equal(
        np.asarray(rows[0]["barycenter"]), np.asarray(loc["barycenter"].iloc[0])
    )


def test_event_series_point_cap(spark, sf_dir):
    """The flagship's per-(user, day) series assembly supports the same
    bounded-buffer stride cap as the rollup: capped sizes <= m, same
    groups, strict subset of the uncapped points, default unchanged."""
    from dtaidistance_spark.operators.flagship import _event_series

    full = {
        r["doc_id"]: list(r["tokens"])
        for r in _event_series(spark, sf_dir).collect()
    }
    capped = {
        r["doc_id"]: list(r["tokens"])
        for r in _event_series(spark, sf_dir, max_points_per_series=4).collect()
    }
    assert set(full) == set(capped)
    assert any(len(v) > 4 for v in full.values())  # non-vacuous cap
    for k, v in capped.items():
        assert len(v) <= 4
        if len(full[k]) <= 4:
            assert v == full[k]
        else:
            assert len(v) == 4


def test_paa_map_side_bit_identical(spark, seq_df):
    """Map-side PAA (pre-shuffle Arrow resample) must produce the exact
    same rollup as the kernel-side path — same K.paa, reduce-side call
    degenerates to a copy. Covers ragged lengths incl. the long tail."""
    a = _rolled_to_pdf(R.dba_rollup(seq_df, tier="1 minute", paa_map_side=False))
    b = _rolled_to_pdf(R.dba_rollup(seq_df, tier="1 minute", paa_map_side=True))
    _assert_rollup_equal(a, b)
