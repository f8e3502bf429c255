"""T86 — PII detection and redaction per document (the C4/CCNet/
RefinedWeb curation stage: Raffel'20 §2.2 removes pages by
blocklist, production pipelines regex-scrub emails/IPs/IDs before
release): find personally-identifiable substrings, count them by
class, and emit the REDACTED text fingerprint — the privacy gate
every released corpus passes through, here as one codegen pass.

Three detector classes, written in the BOUNDARY-FREE dialect
subset that Java regex (Spark) and RE2 (DuckDB) match identically
— no \\b (RE2-incompatible lookaround territory), no \\d
(escaping-dialect hazard), only character classes and counted
quantifiers (declared; the cross-engine-regex contract is itself
part of what the oracle certifies):

    email  [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+
    ipv4   ([0-9]{1,3}[.]){3}[0-9]{1,3}
    ssn    [0-9]{3}-[0-9]{2}-[0-9]{4}

masked (in that order) to <EMAIL>/<IP>/<SSN>.

The synthetic corpus contains no PII — an all-zero oracle would
certify nothing — so the query DECLARES deterministic canaries
(the csv_roundtrip quoting-canary posture): docs with doc_id ≡ 0
(mod 7 / 11 / 13) get an email / IP / SSN canary appended inside
the query, identically in both engines, so extraction counts,
masking, and the md5 fingerprint of the redacted text are
exercised on real matches and hash-compared end to end.  Counts
are exact INT64; the redacted text crosses the compare as md5
(the portable-hash twin convention).

Honest (gated) reading — the corpus-side truth is itself the
reading: ZERO organic PII in all 500 docs (every nonzero count is
a canary, and the canary sets are exactly the arithmetic
progressions — gated), so the redaction pass is a no-op on the
clean corpus and provably surgical on the planted one: redacted
text differs from the original EXACTLY on canary docs.  The
detector semantics live in pytest against Python's re on
constructed adversarial strings (multiple PII per line, PII at
string edges, near-misses like 1.2.3 and a@b that must NOT fire,
plus the doubled-@ and 5-digit-run cases).

Scale shape: ZERO exchanges — per-row regexp in whole-stage
codegen, a pure map job at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_IPV4 = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
_SSN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


def _canary(eng: str) -> str:
    """Deterministic canary injection, identical both engines
    (STRING is Spark's unsized varchar; DuckDB accepts VARCHAR)."""
    did = "doc_id"
    st = "VARCHAR" if eng == "duck" else "STRING"
    return (
        f"text || CASE WHEN {did} % 7 = 0 THEN"
        f" ' contact u' || CAST({did} AS {st})"
        f" || '@example.com now' ELSE '' END"
        f" || CASE WHEN {did} % 11 = 0 THEN"
        f" ' from 10.0.' || CAST({did} % 256 AS {st})"
        f" || '.7' ELSE '' END"
        f" || CASE WHEN {did} % 13 = 0 THEN"
        f" ' id 123-45-6789 ok' ELSE '' END"
    )


@register(
    "pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, {_canary("duck")} AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_IPV4}')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(t, '{_SSN}')) AS BIGINT)
             AS n_ssns,
           CAST(CASE WHEN regexp_matches(t, '{_EMAIL}')
                      OR regexp_matches(t, '{_IPV4}')
                      OR regexp_matches(t, '{_SSN}')
                THEN 1 ELSE 0 END AS BIGINT) AS has_pii,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL}', '<EMAIL>', 'g'),
               '{_IPV4}', '<IP>', 'g'),
               '{_SSN}', '<SSN>', 'g')) AS redacted_md5
    FROM aug
    """,
)
def pii_redaction(spark, sf_dir):
    """T86: email/IPv4/SSN detection + redaction per doc with
    declared canary injection (module header) — boundary-free
    cross-engine regex, int64 counts, md5 fingerprint of the
    redacted text."""
    d = T(spark, sf_dir, "documents").selectExpr(
        "doc_id", _canary("spark") + " AS t"
    )
    return d.selectExpr(
        "doc_id",
        f"CAST(size(regexp_extract_all(t, '{_EMAIL}', 0)) AS BIGINT)"
        " AS n_emails",
        f"CAST(size(regexp_extract_all(t, '{_IPV4}', 0)) AS BIGINT)"
        " AS n_ips",
        f"CAST(size(regexp_extract_all(t, '{_SSN}', 0)) AS BIGINT)"
        " AS n_ssns",
        f"CAST(CASE WHEN t RLIKE '{_EMAIL}' OR t RLIKE '{_IPV4}'"
        f" OR t RLIKE '{_SSN}' THEN 1 ELSE 0 END AS BIGINT)"
        " AS has_pii",
        f"md5(regexp_replace(regexp_replace(regexp_replace(t,"
        f" '{_EMAIL}', '<EMAIL>'),"
        f" '{_IPV4}', '<IP>'),"
        f" '{_SSN}', '<SSN>')) AS redacted_md5",
    )
