"""Bucketed (co-located) tables — the shuffle-elimination strategy for
repeated joins on a stable key (SURVEY §4 scale checklist).

A table written with ``bucketBy(n, key)`` + ``sortBy(key)`` is stored
pre-hash-partitioned and pre-sorted: every subsequent equi-join or
aggregation on ``key`` between co-bucketed tables runs WITHOUT any
Exchange (verified by plan gate in tests/test_plans.py — zero Exchange
nodes, ``Bucketed: true`` scans, sort-merge join straight off disk).

At 100 TB this is the difference between shuffling the fact table once
per join and never shuffling it at all: pay one bucketed write, then
candidate pairing, feature attach, dedup-verify, … all co-locate free.
Spark implements bucketing only for catalog tables (``saveAsTable``),
so this helper manages them through the session catalog; the warehouse
dir is ``spark.sql.warehouse.dir`` (local default ./spark-warehouse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key: str | list[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, optionally sorted, catalog table."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
