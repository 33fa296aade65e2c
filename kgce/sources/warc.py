"""WARC crawl-archive source: raw Common-Crawl-style WARC files ->
the canonical ``pages(url, warc_ts, html, text, lang)`` table.

The pipeline's input_hint is an Iceberg pages table; this source is the
INGEST step that builds it from what crawlers actually emit.  Spark
reads WARC natively once you treat the record header as a line
separator: ``spark.read.option("lineSep", "WARC/1.0").text(path)``
yields one row per WARC record with NO custom input format and no RDD —
header fields, the HTTP payload split and the text extraction are all
JVM column expressions, so ingest is a narrow scan-shaped projection
that parallelizes by file split like any other read.

Text extraction (``html_to_text``) is a deterministic baseline —
script/style removal, tag strip, the common entities, whitespace
squeeze.  Production pipelines plug a real extractor (trafilatura /
resiliparse) in its place; those libraries are not in this sandbox, so
the baseline is the honest default (same stance as multimodal's
codec-gated decode).  Java-regex-only constructs ((?is), backrefs) are
fine here: ingest has no DuckDB oracle — parity is pinned by pytest on
synthesized WARC bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def html_to_text(col) -> Column:
    """Baseline HTML -> text: drop script/style blocks, strip tags,
    decode the common entities, squeeze whitespace."""
    out = F.regexp_replace(col, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        out = F.regexp_replace(out, ent, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def read_warc(
    spark: SparkSession, path: str, default_lang: str = "en"
) -> DataFrame:
    """WARC file(s) -> pages DataFrame (url, warc_ts, html, text, lang).

    Only ``WARC-Type: response`` records with a target URI survive
    (warcinfo/request/metadata records are filtered).  ``html`` is the
    HTTP response body (bytes after the SECOND blank line: record
    headers, then HTTP headers, then body); ``lang`` comes from the
    html tag's lang attribute when present, else ``default_lang``.
    """
    raw = spark.read.option("lineSep", "WARC/1.0").text(path)
    rec = F.col("value")
    rtype = F.regexp_extract(rec, r"WARC-Type:\s*(\S+)", 1)
    url = F.regexp_extract(rec, r"WARC-Target-URI:\s*(\S+)", 1)
    ts = F.to_timestamp(F.regexp_extract(rec, r"WARC-Date:\s*(\S+)", 1))
    # payload = after the first blank line; body = after the next one
    payload = F.regexp_replace(rec, r"(?s)\A.*?\r\n\r\n", "")
    body = F.regexp_replace(payload, r"(?s)\A.*?\r\n\r\n", "")
    # trailing record separator (blank lines before the next record)
    body = F.regexp_replace(body, r"(?s)\r?\n+\Z", "")
    lang = F.regexp_extract(body, r"(?i)<html[^>]*\blang=[\"']?([A-Za-z]{2})", 1)
    return (
        raw.filter((rtype == "response") & (url != ""))
        .select(
            url.alias("url"),
            ts.alias("warc_ts"),
            body.cast("binary").alias("html"),
            html_to_text(body).alias("text"),
            F.when(lang != "", F.lower(lang)).otherwise(default_lang).alias("lang"),
        )
    )
