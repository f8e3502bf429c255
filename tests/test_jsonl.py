"""Semantic gates for jsonl_q (IO16): the roundtrip checksums equal a
pandas recompute from the parquet, and a corruption canary — mutating
one character in the JSONL must break exactly that source's text
checksum while counts survive."""

import glob
import hashlib

import pandas as pd

from dtaidistance_spark.operators.jsonl_q import (
    _SCHEMA,
    jsonl_roundtrip_check,
)


def _h60(t):
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)


def test_matches_pandas(spark, sf_dir):
    out = jsonl_roundtrip_check(spark, sf_dir).toPandas().set_index(
        "source"
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = docs.groupby("source").agg(
        n_docs=("doc_id", "size"),
        sum_chars=("n_chars", "sum"),
        sum_ids=("doc_id", "sum"),
    )
    cks = docs.groupby("source").text.apply(
        lambda s: sum(_h60(t) for t in s)
    )
    assert len(out) == len(want) >= 2
    for src, w in want.iterrows():
        g = out.loc[src]
        assert (g.n_docs, g.sum_chars, g.sum_ids) == (
            w.n_docs,
            w.sum_chars,
            w.sum_ids,
        )
        assert int(g.text_checksum) == int(cks.loc[src])


def test_corruption_canary(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    root = str(tmp_path / "jsonl")
    docs.write.json(root)
    # flip one character of one text payload in one part file
    part = sorted(glob.glob(f"{root}/part-*.json"))[0]
    raw = open(part, "r", encoding="utf-8").read()
    i = raw.index('"text":"') + len('"text":"')
    while not raw[i].isalpha():  # skip escapes/punctuation safely
        i += 1
    repl = "x" if raw[i] != "x" else "y"
    open(part, "w", encoding="utf-8").write(
        raw[:i] + repl + raw[i + 1 :]
    )
    # defense in depth, observed live: Hadoop's local-FS .crc sidecar
    # catches the flipped byte FIRST (ChecksumException) — remove it
    # so the content-level md5 canary below is the detector under test
    import os

    crc = f"{os.path.dirname(part)}/.{os.path.basename(part)}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    back = spark.read.schema(_SCHEMA).json(root)
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(sum(CAST(CAST(conv(substring(md5(text), 1, 15),"
            " 16, 10) AS BIGINT) AS DECIMAL(38,0))) AS STRING)"
        ).alias("ck"),
    )
    mut = back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST(sum(CAST(CAST(conv(substring(md5(text), 1, 15),"
            " 16, 10) AS BIGINT) AS DECIMAL(38,0))) AS STRING)"
        ).alias("ck"),
    )
    b = {r.source: r for r in base.collect()}
    m = {r.source: r for r in mut.collect()}
    assert set(b) == set(m)
    diff = [s for s in b if b[s].ck != m[s].ck]
    assert len(diff) == 1  # exactly the corrupted doc's source
    assert all(b[s].n == m[s].n for s in b)  # counts survive
