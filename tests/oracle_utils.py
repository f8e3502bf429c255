"""Local replica of the driver's DuckDB-oracle comparison: row count +
column-name schema + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, (float, np.floating)):
                vals.append(f"{float(v):.6f}")
            elif isinstance(v, (pd.Timestamp,)):
                vals.append(v.strftime("%Y-%m-%d %H:%M:%S.%f"))
            elif hasattr(v, "strftime"):
                vals.append(v.strftime("%Y-%m-%d %H:%M:%S.%f"))
            elif isinstance(v, (int, np.integer)):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


def compare(spark_df, con, sql: str, name: str = "?"):
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: {g[mism[0]]} != {w[mism[0]]}"
    )
