"""PII detection/redaction vs a pure-Python ``re`` oracle (Java and RE2
must agree on the restricted pattern syntax the module commits to)."""

import re

import pytest
from pyspark.sql import functions as F

from kgce.operators import pii

DOCS = [
    (1, "reach me at alice.smith+spam@sub.example.co.uk or bob@x.io today"),
    (2, "server 192.168.0.1 talked to 10.255.3.77; port not an ip 1234.5"),
    (3, "call 212-555-123-4567 or 44-207-946-0958 now"),
    (4, "no pii here at all, just words"),
    (5, "mixed: eve@corp.com from 172.16.4.2 phone 99-888-777-6666"),
    (6, ""),
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_counts(text):
    return {
        f"n_{name}": len(re.findall(pat, text))
        for name, (pat, _) in pii.PII_PATTERNS.items()
    }


def _py_redact(text):
    for pat, placeholder in pii.PII_PATTERNS.values():
        text = re.sub(pat, placeholder, text)
    return text


def test_counts_match_python_re(spark, df):
    got = {r.doc_id: r.asDict() for r in pii.pii_counts(df).collect()}
    for doc_id, text in DOCS:
        want = _py_counts(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k, text)
    # sanity: the fixture actually exercises every pattern
    assert sum(r["n_email"] for r in got.values()) >= 3
    assert sum(r["n_ipv4"] for r in got.values()) >= 3
    assert sum(r["n_phone"] for r in got.values()) >= 3


def test_redaction_matches_python_re(spark, df):
    got = {r.doc_id: r.text for r in pii.redact_pii(df).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_redact(text), doc_id
    assert "[EMAIL]" in got[1] and "@" not in got[1]
    assert "[IP]" in got[2] and "192.168" not in got[2]
    assert "[PHONE]" in got[3]
    assert got[4] == DOCS[3][1]  # untouched


def test_redact_to_new_column_keeps_original(spark, df):
    out = pii.redact_pii(df, out_col="clean").filter(F.col("doc_id") == 5).first()
    assert "eve@corp.com" in out.text
    assert "[EMAIL]" in out.clean and "[IP]" in out.clean and "[PHONE]" in out.clean


def test_placeholders_not_rematched(spark):
    """Redaction must be idempotent: placeholders survive a second pass."""
    df = spark.createDataFrame(
        [(1, "a@b.co 1.2.3.4 12-345-678-9012")], "doc_id long, text string"
    )
    once = pii.redact_pii(df).collect()[0].text
    twice = pii.redact_pii(pii.redact_pii(df)).collect()[0].text
    assert once == twice == "[EMAIL] [IP] [PHONE]"
