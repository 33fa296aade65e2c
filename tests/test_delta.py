"""Recrawl delta + incremental KG maintenance: the maintained aggregate
must equal a full recompute on the new snapshot for every change mix
(add / content-change / remove), and the tagger must only run on the
delta."""

import hashlib

from pyspark.sql import functions as F

from kgce import schemas, synth
from kgce.operators import delta
from kgce.operators.triples import aggregate_triples


def _snapshots():
    old_rows = synth.gen_pages(40, seed=31)
    new_rows = []
    for i, r in enumerate(old_rows):
        if i % 10 == 3:
            continue  # removed
        r2 = dict(r)
        if i % 10 == 5:  # changed: gains an Alice->Geneva triple
            r2["text"] = r2["text"] + " Alice visits Geneva."
            r2["html"] = ("<html><body>" + r2["text"] + "</body></html>").encode()
        new_rows.append(r2)
    for r in synth.gen_pages(8, seed=77):
        r2 = dict(r)
        r2["url"] = r2["url"].replace("/page/", "/new/")  # added
        new_rows.append(r2)
    return old_rows, new_rows


def test_snapshot_delta_classification(spark):
    old_rows, new_rows = _snapshots()
    old = spark.createDataFrame(old_rows, schema=schemas.PAGES)
    new = spark.createDataFrame(new_rows, schema=schemas.PAGES)
    got = {r.url: r.change for r in delta.snapshot_delta(old, new).collect()}
    old_by = {r["url"]: r["text"] for r in old_rows}
    new_by = {r["url"]: r["text"] for r in new_rows}
    for url in set(old_by) | set(new_by):
        if url not in old_by:
            want = "added"
        elif url not in new_by:
            want = "removed"
        elif old_by[url] != new_by[url]:
            want = "changed"
        else:
            want = "unchanged"
        assert got[url] == want, url
    assert sorted(set(got.values())) == ["added", "changed", "removed", "unchanged"]
    # md5 digest (not equality on text) is what's compared — same bytes,
    # same digest, so the classification is equivalent and DuckDB-twinned
    assert hashlib.md5(b"x").hexdigest() == "9dd4e461268c8034f5c8564e155c67a6"


def test_select_recrawl_is_exactly_the_delta(spark):
    old_rows, new_rows = _snapshots()
    old = spark.createDataFrame(old_rows, schema=schemas.PAGES)
    new = spark.createDataFrame(new_rows, schema=schemas.PAGES)
    d = delta.snapshot_delta(old, new)
    got = sorted(r.url for r in delta.select_recrawl(new, d).select("url").collect())
    old_by = {r["url"]: r["text"] for r in old_rows}
    want = sorted(
        r["url"]
        for r in new_rows
        if r["url"] not in old_by or old_by[r["url"]] != r["text"]
    )
    assert got == want
    assert 0 < len(want) < len(new_rows)  # the tagger runs on a strict subset


def test_incremental_equals_full_recompute(spark):
    old_rows, new_rows = _snapshots()
    old = spark.createDataFrame(old_rows, schema=schemas.PAGES)
    new = spark.createDataFrame(new_rows, schema=schemas.PAGES)
    prev_contribs = delta.scored_contributions(old)
    prev_agg = aggregate_triples(prev_contribs)
    agg, contribs = delta.maintain_snapshot(prev_agg, prev_contribs, old, new)

    full_contribs = delta.scored_contributions(new)
    full_agg = aggregate_triples(full_contribs)

    cols = sorted(full_agg.columns)
    assert sorted(map(tuple, agg.select(*cols).collect())) == sorted(
        map(tuple, full_agg.select(*cols).collect())
    )
    ccols = sorted(full_contribs.columns)
    assert sorted(map(tuple, contribs.select(*ccols).collect())) == sorted(
        map(tuple, full_contribs.select(*ccols).collect())
    )
    # the changed page's new triple arrived
    assert (
        agg.filter(
            (F.col("subj_text") == "Alice") & (F.col("obj_text") == "Geneva")
        ).count()
        > 0
    )


def test_incremental_noop_on_identical_snapshots(spark):
    old_rows, _ = _snapshots()
    old = spark.createDataFrame(old_rows, schema=schemas.PAGES)
    prev_contribs = delta.scored_contributions(old)
    prev_agg = aggregate_triples(prev_contribs)
    agg, contribs = delta.maintain_snapshot(prev_agg, prev_contribs, old, old)
    cols = sorted(prev_agg.columns)
    assert sorted(map(tuple, agg.select(*cols).collect())) == sorted(
        map(tuple, prev_agg.select(*cols).collect())
    )
    # and nothing was selected for re-extraction
    d = delta.snapshot_delta(old, old)
    assert delta.select_recrawl(old, d).count() == 0


def test_shared_key_keeps_other_urls_evidence(spark):
    """A triple key supported by TWO urls keeps the surviving url's
    evidence when the other url is removed — the case an additive
    merge cannot express."""
    rows = []
    for i, extra in [(0, ""), (1, "")]:
        text = "Alice visits Geneva." + extra
        rows.append(
            {
                "url": f"https://k.example/p/{i}",
                "warc_ts": synth.EPOCH,
                "html": b"<html></html>",
                "text": text,
                "lang": "en",
            }
        )
    old = spark.createDataFrame(rows, schema=schemas.PAGES)
    new = spark.createDataFrame(rows[:1], schema=schemas.PAGES)
    prev_contribs = delta.scored_contributions(old)
    prev_agg = aggregate_triples(prev_contribs)
    agg, _ = delta.maintain_snapshot(prev_agg, prev_contribs, old, new)
    row = agg.filter(
        (F.col("subj_text") == "Alice") & (F.col("obj_text") == "Geneva")
    ).collect()
    assert len(row) == 1 and row[0].n_evidence == 1
