#!/usr/bin/env python
"""Targeted driver-replica check: `python scripts/sweep_some.py q1 q2 ...`
Same bare session + DuckDB compare as driver_sweep.py, but only for the
named registry queries (fast iteration while adding operators)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.driver_sweep import TABLES, _hash_rows  # noqa: E402


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("/")]
    sf_dir = next((a for a in sys.argv[1:] if a.startswith("/")), "/root/testdata/sf0.01")

    import duckdb

    from dtaidistance_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark(app="sweep-some").newSession()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    reg = queries()
    oracles = oracle_sql()
    fails = []
    for name in names:
        t0 = time.time()
        try:
            df = reg[name](spark, sf_dir)
            cols = df.columns
            rows = df.collect()
            import pandas as pd

            pdf = pd.DataFrame([r.asDict() for r in rows], columns=cols)
            if len(pdf):
                pdf.sort_values(by=list(cols))
        except Exception as e:
            print(f"{name}: FAIL (spark) {type(e).__name__}: {str(e)[:300]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only OK rows={len(rows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name}: FAIL (duckdb) {type(e).__name__}: {str(e)[:300]}")
            fails.append(name)
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if sorted(cols) != sorted(ocols):
            problems.append(f"schema {sorted(cols)} != {sorted(ocols)}")
        if not problems:
            h_s = _hash_rows(cols, rows)
            h_o = _hash_rows(ocols, orows)
            if h_s != h_o:
                problems.append(f"value hash {h_s} != {h_o}")
        if problems:
            print(f"{name}: FAIL {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            fails.append(name)
        else:
            print(f"{name}: PASS rows={len(rows)} ({time.time()-t0:.1f}s)")
    print(f"--- {len(names) - len(fails)}/{len(names)} ok")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
