"""Biaffine path: W4 decode parity with the BIO path, J3 offset join,
J8 set-based eval; plus skew-handling behavior (plans.skew)."""

from pyspark.sql import functions as F

from kgce import schemas, synth, tagging
from kgce.operators import biaffine
from kgce.plans import skew


def test_biaffine_decode_matches_bio_path(spark):
    pages = spark.createDataFrame(synth.gen_pages(30, seed=61), schema=schemas.PAGES)
    sents = tagging.extract_sentences(pages).cache()
    spans = biaffine.decode_biaffine_spans(sents)
    mentions = biaffine.spans_to_mentions(spans, sents)
    got = {
        (r.url, r.sent_id, r.text, r.start, r.end, r.type) for r in mentions.collect()
    }
    want = {
        (r.url, r.sent_id, r.text, r.start, r.end, r.type)
        for r in tagging.extract_mentions(pages).collect()
    }
    assert got == want  # the two heads decode identical mentions


def test_biaffine_eval_set_semantics(spark):
    sch = "url string, sent_id long, type string, tok_s int, tok_e int"
    gold = spark.createDataFrame(
        [("d", 0, "per", 0, 2), ("d", 0, "loc", 3, 4), ("d", 1, "per", 0, 1)], sch
    )
    pred = spark.createDataFrame(
        [("d", 0, "per", 0, 2), ("d", 0, "loc", 3, 5), ("d", 2, "org", 0, 1)], sch
    )
    m = biaffine.evaluate_biaffine(gold, pred)
    assert m == {"tp": 1, "fp": 2, "fn": 2}


def test_salted_repartition_spreads_hot_domain(spark):
    # one domain owns 90% of pages; after salting its rows span many
    # partitions instead of hashing into one
    rows = [(f"https://hot.example/p{i}", None, None, "x", "en") for i in range(900)]
    rows += [(f"https://cold{i}.example/p", None, None, "x", "en") for i in range(100)]
    pages = spark.createDataFrame(rows, schema=schemas.PAGES)
    plain = pages.repartition(16, skew.domain_of(F.col("url")))
    salted = skew.salted_repartition(pages, skew.domain_of(F.col("url")), n_salt=16, n_partitions=16)

    def spread(df):
        return (
            df.filter(F.col("url").startswith("https://hot"))
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )

    assert spread(plain) == 1  # all hot pages hash to one partition
    assert spread(salted) >= 8  # salt spreads them

    hot = skew.hot_keys(pages, skew.domain_of(F.col("url")), top_n=1).collect()
    assert hot[0].key == "hot.example" and hot[0].n == 900


def test_biaffine_scores_matches_loop_contraction():
    """numpy einsum twin == the explicit loop form of the reference layer
    (model.py:52-75 einsum and :80+ loop variant are the same math)."""
    import numpy as np

    from kgce.operators.biaffine import biaffine_scores

    rng = np.random.default_rng(42)
    L, d, o = 5, 4, 3
    x, y = rng.normal(size=(L, d)), rng.normal(size=(L, d))
    U = rng.normal(size=(d + 1, o, d + 1))
    got = biaffine_scores(x, y, U)
    xb = np.concatenate([x, np.ones((L, 1))], -1)
    yb = np.concatenate([y, np.ones((L, 1))], -1)
    want = np.zeros((L, L, o))
    for i in range(L):
        for j in range(L):
            for t in range(o):
                want[i, j, t] = xb[i] @ U[:, t, :] @ yb[j]
    assert np.allclose(got, want)
    assert got.shape == (L, L, o)


def test_span_matrix_argwhere_decode():
    import numpy as np

    from kgce.operators.biaffine import span_matrix_to_triples

    m = np.zeros((4, 4), dtype=int)
    m[0, 1] = 2
    m[3, 3] = 1
    assert sorted(span_matrix_to_triples(m)) == [(1, 3, 3), (2, 0, 1)]


def test_biaffine_featurize_label_matrix():
    """data_utils.py:210-271 parity: piece remap +1 for CLS, inclusive
    word-end -> last piece, banded mask matrix."""
    import numpy as np

    from kgce.featurize import build_label2idx
    from kgce.operators.biaffine import featurize_biaffine_sentence

    l2i = {"O": 0, "per": 1, "loc": 2}
    toks = ["Intercontinental", "met", "Bob"]  # 16 chars -> 4 mock pieces
    ents = [("Intercontinental", "per", (0, 0)), ("Bob", "loc", (2, 2))]
    f = featurize_biaffine_sentence(toks, ents, l2i, max_seq_len=16)
    assert f["input_tokens"][0] == "[CLS]"
    # word 0 spans pieces 1..4 (CLS shift); its entity cell is (1, 4)
    assert f["labels"][1, 4] == 1
    # 'Bob' is one piece: mapping start == end
    bob_first = f["sub_index"].index(3)
    assert f["labels"][bob_first, bob_first] == 2
    assert f["labels"].sum() == 3
    n_live = sum(f["attention_mask"])
    assert (f["masks"][:n_live] == np.array(f["attention_mask"])).all()
    assert f["masks"][n_live:].sum() == 0
    # too-long sentence raises like the reference assert
    import pytest as _pytest

    with _pytest.raises(ValueError):
        featurize_biaffine_sentence(["x" * 50] * 10, [], l2i, max_seq_len=8)
