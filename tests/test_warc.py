"""WARC ingest source: synthesized WARC bytes -> pages table."""

from datetime import datetime, timezone

from kgce.sources import warc


def _warc_record(rtype, uri, date, body):
    headers = [f"WARC-Type: {rtype}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers += [f"WARC-Date: {date}", f"Content-Length: {len(body)}"]
    http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
    return (
        "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n" + http + "\r\n" + body
    )


def _write_warc(path):
    html1 = (
        '<html lang="de"><head><style>p {color: red}</style>'
        "<script>var x = 1 < 2;</script></head>"
        "<body><h1>Siemens &amp; Bosch</h1><p>Bericht aus München.</p></body></html>"
    )
    html2 = "<html><body>Alice met Bob &lt;in&gt; Geneva.</body></html>"
    records = [
        _warc_record("warcinfo", None, "2024-01-01T00:00:00Z", "software: test"),
        _warc_record("response", "http://a.example/x", "2024-01-02T03:04:05Z", html1),
        _warc_record("request", "http://a.example/x", "2024-01-02T03:04:05Z", "GET /x"),
        _warc_record("response", "http://b.example/y", "2024-02-03T04:05:06Z", html2),
    ]
    with open(path, "w", encoding="utf-8", newline="") as f:
        f.write("\r\n\r\n".join(records) + "\r\n\r\n")


def test_read_warc_builds_pages_table(spark, tmp_path):
    p = str(tmp_path / "crawl.warc")
    _write_warc(p)
    rows = {r.url: r for r in warc.read_warc(spark, p).collect()}
    # only the two response records survive
    assert set(rows) == {"http://a.example/x", "http://b.example/y"}
    a = rows["http://a.example/x"]
    assert a.warc_ts == datetime(2024, 1, 2, 3, 4, 5)
    assert a.lang == "de"
    assert a.text == "Siemens & Bosch Bericht aus München."
    assert b"<h1>" in bytes(a.html)          # raw body preserved
    assert b"HTTP/1.1" not in bytes(a.html)  # HTTP headers stripped
    b = rows["http://b.example/y"]
    assert b.lang == "en"                    # no lang attr -> default
    assert b.text == "Alice met Bob <in> Geneva."
    # the ingested table feeds the pipeline directly (schema-compatible)
    from kgce import tagging

    m = tagging.extract_mentions(warc.read_warc(spark, p))
    texts = {r.text for r in m.collect()}
    assert {"Siemens", "Bosch", "Alice", "Bob", "Geneva"} <= texts
