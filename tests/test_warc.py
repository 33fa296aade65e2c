"""WARC ingest source: synthesized WARC bytes -> pages table.

Covers the documented lineSep-baseline semantics: version-anchored
record split, loud failure on wrong-version archives, byte-exact body
preservation (incl. an inner blank line), single-pass entity decode
(``&amp;`` last), and a DuckDB oracle twin of the full projection.
"""

from datetime import datetime

import pytest

from kgce.sources import warc


def _warc_record(rtype, uri, date, body, version="1.0"):
    headers = [f"WARC-Type: {rtype}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers += [f"WARC-Date: {date}", f"Content-Length: {len(body)}"]
    http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
    return (
        f"WARC/{version}\r\n" + "\r\n".join(headers) + "\r\n\r\n" + http + "\r\n" + body
    )


HTML1 = (
    '<html lang="de"><head><style>p {color: red}</style>'
    "<script>var x = 1 < 2;</script></head>"
    "<body><h1>Siemens &amp; Bosch</h1><p>Bericht aus München.</p></body></html>"
)
HTML2 = "<html><body>Alice met Bob &lt;in&gt; Geneva.</body></html>"
# nested escape (&amp;lt; must decode to &lt;, not <) and an inner
# \r\n\r\n blank line that must survive byte-exact in `html`
HTML3 = (
    "<html><body><p>escaped: &amp;lt;tag&amp;gt; and &amp;amp;</p>"
    "<pre>first\r\n\r\nsecond</pre></body></html>"
)


def _write_warc(path, version="1.0"):
    records = [
        _warc_record("warcinfo", None, "2024-01-01T00:00:00Z", "software: test",
                     version=version),
        _warc_record("response", "http://a.example/x", "2024-01-02T03:04:05Z", HTML1,
                     version=version),
        _warc_record("request", "http://a.example/x", "2024-01-02T03:04:05Z", "GET /x",
                     version=version),
        _warc_record("response", "http://b.example/y", "2024-02-03T04:05:06Z", HTML2,
                     version=version),
        _warc_record("response", "http://c.example/z", "2024-03-04T05:06:07Z", HTML3,
                     version=version),
    ]
    with open(path, "w", encoding="utf-8", newline="") as f:
        f.write("\r\n\r\n".join(records) + "\r\n\r\n")


def test_read_warc_builds_pages_table(spark, tmp_path):
    p = str(tmp_path / "crawl.warc")
    _write_warc(p)
    rows = {r.url: r for r in warc.read_warc(spark, p).collect()}
    # only the three response records survive
    assert set(rows) == {"http://a.example/x", "http://b.example/y", "http://c.example/z"}
    a = rows["http://a.example/x"]
    assert a.warc_ts == datetime(2024, 1, 2, 3, 4, 5)
    assert a.lang == "de"
    assert a.text == "Siemens & Bosch Bericht aus München."
    assert b"<h1>" in bytes(a.html)          # raw body preserved
    assert b"HTTP/1.1" not in bytes(a.html)  # HTTP headers stripped
    b = rows["http://b.example/y"]
    assert b.lang == "en"                    # no lang attr -> default
    assert b.text == "Alice met Bob <in> Geneva."
    # the ingested table feeds the pipeline directly (schema-compatible).
    # Tagger semantics: edge punctuation is stripped ("Geneva." tags as
    # "Geneva") and ADJACENT capitalized tokens sessionize into ONE
    # mention ("Bosch Bericht"), mirroring the reference's tag2entity
    # merge of B-/I- runs; "München" stays untagged (the capitalized-
    # token rule is ASCII-alphabetic by design).
    from kgce import tagging

    m = tagging.extract_mentions(warc.read_warc(spark, p))
    texts = {r.text for r in m.collect()}
    assert {"Siemens", "Bosch Bericht", "Alice", "Bob", "Geneva"} <= texts
    assert "Bosch" not in texts  # merged, not split
    assert "Geneva." not in texts  # edge punctuation stripped


def test_read_warc_nested_escapes_and_inner_blank_line(spark, tmp_path):
    p = str(tmp_path / "crawl.warc")
    _write_warc(p)
    c = {r.url: r for r in warc.read_warc(spark, p).collect()}["http://c.example/z"]
    # single-pass decode, &amp; LAST: &amp;lt; -> &lt; (NOT <)
    assert c.text == "escaped: &lt;tag&gt; and &amp; first second"
    # body bytes exact, including the inner \r\n\r\n blank line
    assert bytes(c.html) == HTML3.encode("utf-8")


def test_read_warc_wrong_version_fails_loudly(spark, tmp_path):
    """A WARC/1.1 archive read with the default separator must raise,
    not silently merge all records into one half-parsed row."""
    from pyspark.errors import PySparkException

    p = str(tmp_path / "crawl11.warc")
    _write_warc(p, version="1.1")
    with pytest.raises(PySparkException, match="WARC"):
        warc.read_warc(spark, p).collect()
    # and reading with the matching version parses all records
    rows = warc.read_warc(spark, p, version="1.1").collect()
    assert len(rows) == 3


def test_read_warc_matches_duckdb_oracle(spark, tmp_path):
    """Full-projection oracle twin: the same WARC bytes parsed by DuckDB
    (RE2) must agree with the Spark scan on every column — record split,
    header extraction, double blank-line body split, text extraction and
    lang sniff are all cross-engine-pinned."""
    import duckdb

    p = str(tmp_path / "crawl.warc")
    _write_warc(p)
    sep = "'WARC/1.0' || chr(13) || chr(10)"
    strip = (
        "regexp_replace(regexp_replace(regexp_replace(rec, "
        "'\\A.*?\\r\\n\\r\\n', '', 's'), '\\A.*?\\r\\n\\r\\n', '', 's'), "
        "'[\\r\\n]+$', '', 's')"
    )
    text_expr = (
        "trim(regexp_replace("
        "replace(replace(replace(replace(replace(replace("
        "regexp_replace(regexp_replace(regexp_replace(body, "
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), "
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), "
        "'(?s)<[^>]+>', ' ', 'g'), "
        "'&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), "
        "'&quot;', '\"'), '&#39;', ''''), '&amp;', '&'), "
        "'\\s+', ' ', 'g'))"
    )
    got = duckdb.connect().execute(
        f"""
        WITH recs AS (
          SELECT unnest(string_split(content, {sep})) AS rec
          FROM read_text('{p}')
        ), parsed AS (
          SELECT regexp_extract(rec, 'WARC-Type:\\s*(\\S+)', 1) AS rtype,
                 regexp_extract(rec, 'WARC-Target-URI:\\s*(\\S+)', 1) AS url,
                 strptime(regexp_extract(rec, 'WARC-Date:\\s*(\\S+)', 1),
                          '%Y-%m-%dT%H:%M:%SZ') AS warc_ts,
                 {strip} AS body
          FROM recs
        )
        SELECT url, warc_ts, body, {text_expr} AS text,
               coalesce(nullif(lower(regexp_extract(body,
                 '(?i)<html[^>]*\\blang=["'']?([A-Za-z]{{2}})', 1)), ''), 'en') AS lang
        FROM parsed WHERE rtype = 'response' AND url <> ''
        ORDER BY url
        """
    ).fetchall()
    want = sorted(
        (r.url, r.warc_ts, bytes(r.html).decode("utf-8"), r.text, r.lang)
        for r in warc.read_warc(spark, str(p)).collect()
    )
    assert [tuple(r) for r in got] == want
