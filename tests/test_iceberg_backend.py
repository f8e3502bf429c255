"""The SURVEY §1.4 backend-switch gates (round-3 verdict item #3):
``open_table`` picks the real Iceberg catalog exactly when one is
configured AND the runtime jar is present, and the write/read/
time-travel contract is exercised through ONE shared driver function
against whichever backend is active — always against TableIO (so the
contract function itself is proven), and against a real Iceberg
catalog when ``iceberg-spark-runtime`` is on the classpath (skipped in
this sandbox, runnable unchanged on a cluster)."""

import pytest
from pyspark.sql import functions as F

from dtaidistance_spark.sources.tableio import (
    IcebergTableIO,
    TableIO,
    iceberg_available,
    open_table,
)


def _mk(spark, src, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.lit(src).alias("src"),
        (F.col("id") * 3).alias("v"),
    )


def _exercise_backend_contract(io, spark):
    """The backend-agnostic contract: overwrite / append / dynamic
    partition overwrite / snapshot history / time travel, driven only
    through the shared surface (write, read, snapshot_ids, exists).
    Runs IDENTICALLY against TableIO and IcebergTableIO."""
    a0 = _mk(spark, "a", 0, 10)
    b0 = _mk(spark, "b", 100, 105)
    io.write(a0.unionByName(b0), mode="overwrite")
    assert io.read(spark).count() == 15
    snaps1 = io.snapshot_ids(spark)
    assert len(snaps1) == 1

    io.write(_mk(spark, "c", 200, 203), mode="append")
    assert io.read(spark).count() == 18

    # dynamic overwrite replaces ONLY the partitions present in df
    io.write(_mk(spark, "a", 50, 52), mode="dynamic")
    cur = io.read(spark)
    assert cur.count() == 2 + 5 + 3
    assert cur.where("src = 'a'").count() == 2
    assert cur.where("src = 'b'").count() == 5  # untouched

    # time travel back to the first snapshot
    snaps = io.snapshot_ids(spark)
    assert len(snaps) == 3
    assert io.read(spark, snapshot=snaps[0]).count() == 15
    return True


def test_contract_on_tableio(spark, tmp_path):
    io = TableIO(str(tmp_path), "contract_t", partition_by=["src"])
    assert _exercise_backend_contract(io, spark)


def test_open_table_auto_falls_back_without_jar(spark, tmp_path):
    """In this sandbox the jar is absent, so auto mode must return the
    contract layer even when a catalog conf is present."""
    assert iceberg_available(spark) is False
    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    try:
        io = open_table(
            spark, str(tmp_path), "auto_t", partition_by=["src"],
            catalog="lake",
        )
        assert isinstance(io, TableIO)
    finally:
        spark.conf.unset("spark.sql.catalog.lake")
    # and with no catalog at all
    io2 = open_table(spark, str(tmp_path), "auto_t2")
    assert isinstance(io2, TableIO)


def test_open_table_forced_iceberg_fails_fast_without_jar(spark, tmp_path):
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        open_table(
            spark, str(tmp_path), "t", backend="iceberg", catalog="lake"
        )
    with pytest.raises(ValueError, match="catalog name"):
        open_table(spark, str(tmp_path), "t", backend="iceberg")


def test_contract_on_real_iceberg(spark, tmp_path):
    """INTEGRATION: runs only where iceberg-spark-runtime is on the
    classpath — builds a hadoop-catalog session rooted in tmp_path and
    drives the SAME contract function through IcebergTableIO +
    open_table's auto switch. Skipped in this sandbox (no jar)."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on the classpath")
    from pyspark.sql import SparkSession

    s2 = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-contract")
        .config(
            "spark.sql.catalog.lake",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config(
            "spark.sql.catalog.lake.warehouse",
            str(tmp_path / "warehouse"),
        )
        .getOrCreate()
    )
    try:
        s2.sql("CREATE NAMESPACE IF NOT EXISTS lake.itest")
        io = open_table(
            s2, str(tmp_path), "contract_t", partition_by=["src"],
            catalog="lake", namespace="itest",
        )
        assert isinstance(io, IcebergTableIO)  # the switch activated
        assert _exercise_backend_contract(io, s2)
    finally:
        s2.stop()
