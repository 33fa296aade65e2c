"""Sequence packing + deterministic sampling operators.

Packing invariants are checked against a pure-Python oracle (sort, running
sum) and structurally (slices partition each doc; every chunk except the
last holds exactly ``budget`` tokens).  Sampling is checked for
determinism, engine parity (DuckDB twin), and the train/eval disjointness
guarantee.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from kgce.operators import packing, sampling

SF = "/root/testdata/sf0.001"
BUDGET = 128


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _py_offsets(rows):
    """Brute-force oracle: exclusive prefix sum in doc_id order."""
    out, acc = {}, 0
    for doc_id, n in sorted(rows):
        out[doc_id] = (n, acc)
        acc += n
    return out


def test_token_offsets_match_python_oracle(spark, docs):
    got = {r.doc_id: (r.n_tokens, r.start_off) for r in packing.token_offsets(docs).collect()}
    from kgce.operators.textstats import _words

    base = [
        (r.doc_id, r.n)
        for r in docs.select("doc_id", F.size(_words(F.col("text"))).alias("n")).collect()
    ]
    assert got == _py_offsets(base)


def test_token_offsets_bucket_count_invariance(spark, docs):
    """The two-level prefix sum is a pure function of the data — the
    bucket count (cluster-size analogue) must not change ANY offset."""
    a = {r.doc_id: r.start_off for r in packing.token_offsets(docs, n_buckets=2).collect()}
    b = {r.doc_id: r.start_off for r in packing.token_offsets(docs, n_buckets=64).collect()}
    assert a == b


def test_pack_sequences_chunk_arithmetic(spark, docs):
    packed = packing.pack_sequences(docs, budget=BUDGET).collect()
    for r in packed:
        assert r.chunk_first == r.start_off // BUDGET
        assert r.chunk_last == (r.start_off + r.n_tokens - 1) // BUDGET
        assert r.n_chunks == r.chunk_last - r.chunk_first + 1 >= 1


def test_chunk_slices_partition_docs_and_fill_chunks(spark, docs):
    packed = packing.pack_sequences(docs, budget=BUDGET)
    slices = packing.chunk_slices(packed, budget=BUDGET)
    # 1. per doc: slices are contiguous, start at 0, end at n_tokens
    per_doc = (
        slices.groupBy("doc_id")
        .agg(
            F.min("doc_tok_start").alias("lo"),
            F.max("doc_tok_end").alias("hi"),
            F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("tot"),
        )
        .join(packed.select("doc_id", "n_tokens"), "doc_id")
        .collect()
    )
    for r in per_doc:
        assert r.lo == 0 and r.hi == r.n_tokens and r.tot == r.n_tokens
    # 2. per chunk: exactly budget tokens except the final chunk
    per_chunk = sorted(
        slices.groupBy("chunk_id")
        .agg(F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("tok"))
        .collect()
    )
    assert all(r.tok == BUDGET for r in per_chunk[:-1])
    assert 0 < per_chunk[-1].tok <= BUDGET
    # 3. chunk ids are dense 0..n-1
    assert [r.chunk_id for r in per_chunk] == list(range(len(per_chunk)))


def test_weight_col_override(spark):
    df = spark.createDataFrame(
        [(10, "ignored", 5), (20, "ignored", 7), (30, "ignored", 1)],
        "doc_id long, text string, w long",
    )
    got = {
        r.doc_id: r.start_off
        for r in packing.token_offsets(df, weight_col="w").collect()
    }
    assert got == {10: 0, 20: 5, 30: 12}


def test_token_offsets_empty_input(spark):
    """Empty input: min/max agg yields nulls — must return an empty frame
    with the output schema, not TypeError inside bucket arithmetic."""
    df = spark.createDataFrame([], "doc_id long, text string")
    out = packing.token_offsets(df)
    assert out.columns == ["doc_id", "n_tokens", "start_off"]
    assert out.count() == 0


def test_chunk_slices_zero_token_doc_emits_no_work(spark):
    """A zero-weight doc whose start_off lands on a chunk boundary has
    chunk_last < chunk_first; sequence() would emit a descending 2-element
    array = two spurious empty slices.  It must yield NO loader rows
    (matching the oracle's generate_series)."""
    df = spark.createDataFrame(
        [(1, "x", 128), (2, "x", 0), (3, "x", 5)], "doc_id long, text string, w long"
    )
    packed = packing.pack_sequences(df, budget=128, weight_col="w")
    slices = packing.chunk_slices(packed, budget=128).collect()
    assert all(r.doc_id != 2 for r in slices)
    assert all(r.doc_tok_end > r.doc_tok_start for r in slices)
    # the non-empty docs still partition correctly
    got = {(r.chunk_id, r.doc_id): (r.doc_tok_start, r.doc_tok_end) for r in slices}
    assert got == {(0, 1): (0, 128), (1, 3): (0, 5)}


def test_packing_cache_bounded(spark, docs):
    """Repeated token_offsets calls keep AT MOST one persisted base; an
    explicit release drops it (the r2 session-lifetime leak)."""
    jsc = spark.sparkContext._jsc.sc()
    packing.release_cache()
    before = jsc.getPersistentRDDs().size()
    packing.token_offsets(docs).count()
    packing.token_offsets(docs).count()
    assert jsc.getPersistentRDDs().size() <= before + 1
    packing.release_cache()
    assert jsc.getPersistentRDDs().size() == before


def test_hash_sample_fraction_rounding(spark):
    """0.3 * 1e6 = 299999.9999...: int() truncation would silently drop
    bucket 299999.  The threshold must round to the documented 1e-6
    granularity."""
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    kept = sampling.hash_sample(df, 0.3).count()
    want = duckdb.sql(
        """SELECT count(*) FROM range(4000) t(doc_id)
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 15))::BIGINT
                 % 1000000 < 300000"""
    ).fetchone()[0]
    assert kept == want


def test_mixing_weights_realize_target(spark):
    """The binding stratum keeps 1.0; kept token counts realize the
    target proportions exactly; unlisted strata keep 0."""
    from kgce.operators import mixing

    rows = []
    did = 0
    for lang, n_docs, words in (("en", 50, 40), ("de", 10, 20), ("xx", 5, 30)):
        for _ in range(n_docs):
            rows.append((did, lang, " ".join(["w"] * words)))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.stratum: r for r in mixing.mixing_weights(df, {"en": 0.5, "de": 0.5}).collect()}
    assert out["xx"].keep_frac == 0.0
    # en: 2000 tokens, de: 200 tokens -> de binds (200/0.5 < 2000/0.5)
    assert out["de"].keep_frac == 1.0
    # kept en tokens = keep * 2000 must equal de's 200 (50/50 target)
    assert abs(out["en"].keep_frac * 2000 - 200) < 1e-3
    assert out["en"].n_tokens == 2000 and out["de"].n_docs == 10


def test_hash_sample_determinism_and_rate(spark, docs):
    a = sorted(r.doc_id for r in sampling.hash_sample(docs, 0.3).select("doc_id").collect())
    b = sorted(r.doc_id for r in sampling.hash_sample(docs, 0.3).select("doc_id").collect())
    assert a == b and len(a) > 0
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # loose binomial band
    # consistency under growth: a smaller fraction is a SUBSET
    c = {r.doc_id for r in sampling.hash_sample(docs, 0.1).select("doc_id").collect()}
    assert c <= set(a)


def test_hash_bucket_duckdb_parity(spark, docs):
    got = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
    }
    want = {
        d: b
        for d, b in duckdb.sql(
            f"""SELECT doc_id,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 15))::BIGINT
                    % 1000000
                FROM '{SF}/documents.parquet'"""
        ).fetchall()
    }
    assert got == want


def test_stratified_fractions_applied(spark, docs):
    out = sampling.stratified_hash_sample(
        docs, {"en": 1.0}, strata_col="lang", default_fraction=0.0
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # fraction 1.0 keeps every English doc


def test_quality_hash_sample_bands(spark):
    """Higher-quality bands keep (strictly) more; full-keep band keeps
    everything; membership is deterministic and a pure narrow filter."""
    rows = [
        (i, "the quick brown fox is that with for was and of to in " * 3)
        for i in range(200)
    ] + [(1000 + i, "zxq") for i in range(200)]  # short, low-quality docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.quality_hash_sample(
        df, bands=((0.5, 1.0), (0.0, 0.1)), key_col="doc_id"
    )
    got = {r.doc_id for r in out.select("doc_id").collect()}
    assert {i for i in range(200)} <= got          # high band keeps all
    low_kept = {d for d in got if d >= 1000}
    assert 0 < len(low_kept) < 80                  # ~10% of the low band
    got2 = {r.doc_id for r in sampling.quality_hash_sample(
        df, bands=((0.5, 1.0), (0.0, 0.1))).select("doc_id").collect()}
    assert got == got2                             # deterministic
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan                  # pure narrow filter


def test_split_train_eval_disjoint_exhaustive(spark, docs):
    train, ev = sampling.split_train_eval(docs, 0.2)
    t = {r.doc_id for r in train.select("doc_id").collect()}
    e = {r.doc_id for r in ev.select("doc_id").collect()}
    assert t.isdisjoint(e)
    assert len(t) + len(e) == docs.count()
    # plan sanity: both are pure filters (no shuffle)
    assert "Exchange" not in train._jdf.queryExecution().executedPlan().toString()
