"""PII detection + redaction for training-data pipelines.

Emails, IPv4 addresses and dashed phone numbers are matched with
patterns deliberately restricted to syntax BOTH regex engines here (Java
in Spark, RE2 in DuckDB) implement identically: character classes,
bounded repetition, ``\\b`` word boundaries — no lookaround (RE2 has
none), no Unicode classes.  That keeps every operator value-checkable by
the DuckDB oracle.

Scale shape: pure per-row JVM column expressions (regexp_count /
chained regexp_replace) — narrow, no shuffle, whole-stage codegen; the
standard pre-training scrub (C4/Dolma pipelines) is exactly this shape.

Redaction order is fixed (email -> ip -> phone) and part of the
contract: placeholders must not be re-matched by later patterns
(``[EMAIL]`` contains no digits or ``@``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pattern registry: name -> (regex, placeholder).  Order matters.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    "phone": (r"\b[0-9]{2,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
}


def pii_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document match counts for every registered PII pattern."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
            for name, (pat, _) in PII_PATTERNS.items()
        ],
    )


def redact_text(col: Column) -> Column:
    """Chained redaction of one text column (registry order)."""
    out = col
    for pat, placeholder in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, placeholder)
    return out


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """All input columns, with ``text_col`` redacted (in place unless
    ``out_col`` names a new column)."""
    return docs.withColumn(out_col or text_col, redact_text(F.col(text_col)))
