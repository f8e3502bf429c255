#!/usr/bin/env python
"""spark-submit entrypoint for the production rollup job (north rule:
"runs via spark-submit --py-files on multi-executor clusters").

Packaging + launch (see scripts/make_pyfiles.sh):

    scripts/make_pyfiles.sh                       # -> build/engine.zip
    spark-submit --master local[8]  --py-files build/engine.zip \
        scripts/submit_rollup.py --input /root/testdata/sf0.001 \
        --output /tmp/tiers --seq-n 2000
    spark-submit --master local[32] --py-files build/engine.zip ...   # 4N

On a real cluster only ``--master`` (yarn/k8s) and executor configs
change; the job body is identical — everything below is DataFrame API +
Arrow UDFs, no driver-side data paths.

The job: load (or synthesize) the pre-tokenized sequence table, run the
retention cascade raw->1m->1h->1d with the DBA downsampling kernel,
write every tier as an Iceberg-contract table (manifest + lineage +
metrics), and print one JSON status line with row/point counts and
throughput — the same shape ``bench.py`` reports.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="parquet dir with a sequences table (doc_id,tokens,n_tok,source,ts); omit to synthesize")
    ap.add_argument("--seq-n", type=int, default=2000, help="synthetic sequence count when --input is omitted")
    ap.add_argument("--output", required=True, help="warehouse dir for the tier tables")
    ap.add_argument("--tiers", default="1 minute,1 hour,1 day")
    args = ap.parse_args()

    # inside spark-submit the session already exists; getOrCreate joins it
    from pyspark.sql import SparkSession, functions as F

    from dtaidistance_spark import synth
    from dtaidistance_spark.operators import rollup as R
    from dtaidistance_spark.sources.tableio import TableIO

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.input:
        seq = spark.read.parquet(os.path.join(args.input, "sequences.parquet"))
    else:
        seq = synth.sequences_df(spark, args.seq_n)
    seq = seq.persist()
    stats = seq.selectExpr("count(*) n", "sum(n_tok) p").collect()[0]

    t0 = time.time()
    tiers = R.cascade(seq, tiers=tuple(t.strip() for t in args.tiers.split(",")), persist=True)
    out_counts = {}
    for tier, df in tiers.items():
        name = "tier_" + tier.replace(" ", "_")
        io = TableIO(args.output, name, partition_by=["key"])
        io.write(df)
        out_counts[name] = io.read(spark).count()
    wall = time.time() - t0

    print(json.dumps({
        "job": "rollup-cascade",
        "sequences": int(stats["n"]),
        "points": int(stats["p"]),
        "tiers": out_counts,
        "wall_sec": round(wall, 2),
        "points_per_sec": round(stats["p"] / wall, 1),
        "master": spark.sparkContext.master,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
