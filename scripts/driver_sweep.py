#!/usr/bin/env python
"""Replica of the driver's correctness gate: run EVERY entry of
``__spark_entry__.queries()`` at sf0.01 and, where an ``oracle_sql()``
entry exists, run the oracle in DuckDB over the same parquet tables and
compare row count + schema (column names) + a value hash computed over
columns sorted by name (mirrors the driver's compare). Queries without
an oracle get a rows-only check (runs, returns >= 0 rows).

Usage: python scripts/driver_sweep.py [sf_dir]
Exit code 0 iff every query passes its applicable check.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Normalize a cell for hashing across Spark/DuckDB type systems."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        return _norm(float(v))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _hash_rows(cols: list[str], rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    # usage: driver_sweep.py [sf_dir] [--json OUT.json]
    # positional parse: only the token immediately following --json is
    # the output path, so a '.json'-suffixed sf_dir is never swallowed
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        ix = args.index("--json")
        rest = args[ix + 1 : ix + 2]
        json_out = rest[0] if rest else "SWEEP.json"
        del args[ix : ix + 1 + len(rest)]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import duckdb

    from dtaidistance_spark.session import get_spark
    from __spark_entry__ import entry, oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    # Replicate the driver's session faithfully: it sets NO Arrow config,
    # and Spark's default is off — round 1's 11 CANNOT_INFER_TYPE errors
    # only reproduced under this setting.
    spark = get_spark(app="driver-sweep").newSession()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    reg = queries()
    oracles = oracle_sql()

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    records: dict[str, dict] = {}
    t_start = time.time()

    # entry() smoke check
    try:
        n = entry(spark).count()
        print(f"entry(): OK rows={n}")
    except Exception as e:
        print(f"entry(): FAIL {e}")
        failures.append("entry")

    for name, fn in reg.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
            # the driver's canonicalization: pandas-sort every column
            # (unhashable list cells raise here, as they did round 1)
            import pandas as pd

            pdf = pd.DataFrame([r.asDict() for r in rows], columns=cols)
            if len(pdf):
                pdf.sort_values(by=list(cols))
        except Exception as e:
            print(f"{name}: FAIL (spark) {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            n_fail += 1
            records[name] = {"status": "FAIL_SPARK", "err": str(e)[:200]}
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"{name}: rows-only OK rows={len(rows)} ({time.time()-t0:.1f}s)")
            records[name] = {"status": "ROWS_ONLY_OK", "rows": len(rows),
                             "secs": round(time.time() - t0, 1)}
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"{name}: FAIL (duckdb) {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            n_fail += 1
            records[name] = {"status": "FAIL_DUCKDB", "err": str(e)[:200]}
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
            print(f"{name}: FAIL {'; '.join(problems)}")
            failures.append(name)
            n_fail += 1
            records[name] = {"status": "FAIL_COMPARE",
                             "err": "; ".join(problems)}
        else:
            n_pass += 1
            print(f"{name}: oracle OK rows={len(rows)} ({time.time()-t0:.1f}s)")
            records[name] = {"status": "ORACLE_OK", "rows": len(rows),
                             "secs": round(time.time() - t0, 1)}

    total = len(reg)
    print(
        f"\n== {total} queries: {n_pass} oracle-pass, {n_rows_only} rows-only,"
        f" {n_fail} FAIL ({time.time()-t_start:.0f}s)"
    )
    if failures:
        print("failures:", ", ".join(failures))
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total": total,
                    "oracle_pass": n_pass,
                    "rows_only": n_rows_only,
                    "fail": n_fail,
                    "wall_secs": round(time.time() - t_start, 0),
                    "queries": records,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
