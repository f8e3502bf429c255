"""Semantic gates for csvio_q (IO17): pandas recompute of every
checksum from the original parquet, the quoting-dialect corruption
canary (a text with embedded commas/quotes survives the hop), and
schema-on-read type fidelity."""

import hashlib

import pandas as pd

from dtaidistance_spark.operators.csvio_q import csv_roundtrip_check


def _h60(text):
    return int(hashlib.md5(text.encode()).hexdigest()[:15], 16)


def test_matches_pandas(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = csv_roundtrip_check(spark, sf_dir).toPandas().set_index("source")
    want = docs.groupby("source").agg(
        n_docs=("doc_id", "size"),
        sum_chars=("n_chars", "sum"),
        sum_ids=("doc_id", "sum"),
    )
    assert len(out) == len(want)
    for src, w in want.iterrows():
        r = out.loc[src]
        assert r.n_docs == w.n_docs
        assert r.sum_chars == w.sum_chars
        assert r.sum_ids == w.sum_ids
        cs = sum(_h60(t) for t in docs[docs.source == src].text)
        assert int(r.text_checksum) == cs


def test_quoting_dialect_canary(spark, tmp_path):
    # embedded delimiters, quotes, and unicode must survive the hop
    rows = [
        (1, 'a,b,"c" d', "en", "s0", 9),
        (2, "plain text", "en", "s0", 10),
        (3, "quote \" comma , semi ;", "de", "s1", 22),
        (4, "unicode ü é 中", "xx", "s1", 13),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "csv_canary")
    df.write.mode("overwrite").option("header", "true").csv(p)
    back = (
        spark.read.schema(
            "doc_id BIGINT, text STRING, lang STRING, source STRING,"
            " n_chars BIGINT"
        )
        .option("header", "true")
        .csv(p)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for doc_id, text, lang, src, nc in rows:
        r = back.loc[doc_id]
        assert r.text == text, (doc_id, r.text)
        assert r.lang == lang and r.source == src and r.n_chars == nc
    # schema-on-read type fidelity
    assert str(back.n_chars.dtype) == "int64"
