"""Semantic gates for pii_q (T86): Python-re recompute of counts and
redaction per doc (canaries included), the canary arithmetic
(nonzero counts are EXACTLY the declared progressions — zero
organic PII), surgical redaction (text unchanged off-canary), and
adversarial detector cases vs Python's re."""

import hashlib
import re

import pandas as pd

from dtaidistance_spark.operators.pii_q import (
    _EMAIL,
    _IPV4,
    _SSN,
    pii_redaction,
)


def _canary_py(doc_id, text):
    t = text
    if doc_id % 7 == 0:
        t += f" contact u{doc_id}@example.com now"
    if doc_id % 11 == 0:
        t += f" from 10.0.{doc_id % 256}.7"
    if doc_id % 13 == 0:
        t += " id 123-45-6789 ok"
    return t


def _redact_py(t):
    t = re.sub(_EMAIL, "<EMAIL>", t)
    t = re.sub(_IPV4, "<IP>", t)
    t = re.sub(_SSN, "<SSN>", t)
    return t


def test_matches_python_re(spark, sf_dir):
    out = pii_redaction(spark, sf_dir).toPandas().set_index("doc_id")
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, r in raw.iterrows():
        t = _canary_py(r.doc_id, r.text)
        row = out.loc[r.doc_id]
        assert row.n_emails == len(re.findall(_EMAIL, t))
        assert row.n_ips == len(re.findall(_IPV4, t))
        assert row.n_ssns == len(re.findall(_SSN, t))
        assert row.has_pii == int(
            row.n_emails + row.n_ips + row.n_ssns > 0
        )
        want = hashlib.md5(_redact_py(t).encode()).hexdigest()
        assert row.redacted_md5 == want


def test_zero_organic_pii_canary_arithmetic(spark, sf_dir):
    out = pii_redaction(spark, sf_dir).toPandas()
    # every nonzero count is a canary: the sets are EXACTLY the
    # arithmetic progressions — the corpus itself is clean
    assert set(out[out.n_emails > 0].doc_id) == {
        d for d in out.doc_id if d % 7 == 0
    }
    assert set(out[out.n_ips > 0].doc_id) == {
        d for d in out.doc_id if d % 11 == 0
    }
    assert set(out[out.n_ssns > 0].doc_id) == {
        d for d in out.doc_id if d % 13 == 0
    }
    assert (out[out.n_emails > 0].n_emails == 1).all()


def test_redaction_is_surgical(spark, sf_dir):
    out = pii_redaction(spark, sf_dir).toPandas().set_index("doc_id")
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for _, r in raw.iterrows():
        clean = r.doc_id % 7 and r.doc_id % 11 and r.doc_id % 13
        md5_orig = hashlib.md5(r.text.encode()).hexdigest()
        if clean:
            # no canary, no PII → redacted text IS the original
            assert out.loc[r.doc_id].redacted_md5 == md5_orig
        else:
            assert out.loc[r.doc_id].redacted_md5 != md5_orig


def test_adversarial_detector_cases():
    # multiple per line, string edges, and near-misses that must NOT
    # fire — the detector contract, pinned against Python's re
    t = "a@b.co starts x 1.2.3.4 mid 999-99-9999 end c.d@e.org"
    assert len(re.findall(_EMAIL, t)) == 2
    assert len(re.findall(_IPV4, t)) == 1
    assert len(re.findall(_SSN, t)) == 1
    # near-misses
    assert not re.findall(_EMAIL, "a@b and user@host (no tld dot)")
    assert not re.findall(_IPV4, "1.2.3 and 1.2..4")
    assert not re.findall(_SSN, "123-456-789 and 12-34-5678")
    # redaction order: an email containing digits is masked before
    # the SSN pass can see its digits
    assert _redact_py("u123-45-6789@x.com") == "<EMAIL>"