"""The Spark eval query must reproduce the oracle (= reference) counts
exactly on adversarial BIO corruptions — every branch of strict/relax/
one-credit logic."""

from kgce import evaluation, oracle, synth


def _token_rows(fixture):
    rows = []
    for r in fixture:
        for pos, (g, p) in enumerate(zip(r["gold_labels"], r["pred_labels"])):
            rows.append((r["doc_id"], r["sent_id"], pos, g, p))
    return rows


def test_eval_matches_oracle_counts(spark):
    fixture = synth.gen_bio_fixture(400, seed=31)
    tokens = spark.createDataFrame(
        _token_rows(fixture),
        "url string, sent_id long, pos int, gold_label string, pred_label string",
    )
    got = {
        r.cate: (r.gold_n, r.strict_tp, r.strict_fp, r.relax_tp, r.relax_fp)
        for r in evaluation.evaluate_tokens(tokens).collect()
    }

    c = oracle.evaluate_bio(
        [r["gold_labels"] for r in fixture], [r["pred_labels"] for r in fixture]
    )
    cates = set(c.gold_cat) | set(c.strict_tp) | set(c.strict_fp) | set(c.relax_fp)
    want = {
        k: (c.gold_cat[k], c.strict_tp[k], c.strict_fp[k], c.relax_tp[k], c.relax_fp[k])
        for k in cates
    }
    want["overall"] = (
        c.gold_total,
        c.overall(c.strict_tp),
        c.overall(c.strict_fp),
        c.overall(c.relax_tp),
        c.overall(c.relax_fp),
    )
    assert got == want


def test_eval_golden_example(spark):
    gold = ["O", "O", "B-misc", "O", "O", "B-misc", "I-misc", "I-misc", "I-misc", "I-misc", "O"]
    pred = ["O", "O", "B-misc", "O", "O", "B-misc", "I-misc", "O", "O", "B-misc", "O"]
    tokens = spark.createDataFrame(
        [("d", 0, i, g, p) for i, (g, p) in enumerate(zip(gold, pred))],
        "url string, sent_id long, pos int, gold_label string, pred_label string",
    )
    res = {r.cate: r for r in evaluation.evaluate_tokens(tokens).collect()}
    o = res["overall"]
    assert (o.gold_n, o.strict_tp, o.strict_fp, o.relax_tp, o.relax_fp) == (2, 1, 1, 2, 0)
    acc = evaluation.token_accuracy(tokens).collect()[0]
    assert acc.n_tokens == 11 and abs(acc.acc - 8 / 11) < 1e-9


def test_prf_formula(spark):
    tokens = spark.createDataFrame(
        [("d", 0, 0, "B-x", "B-x"), ("d", 0, 2, "B-y", "O"), ("d", 1, 0, "O", "B-x")],
        "url string, sent_id long, pos int, gold_label string, pred_label string",
    )
    res = {r.cate: r for r in evaluation.evaluate_tokens(tokens).collect()}
    o = res["overall"]
    # gold: x,y ; pred: x strict TP, one FP (no gold overlap)
    assert (o.gold_n, o.strict_tp, o.strict_fp) == (2, 1, 1)
    assert abs(o.strict_precision - 0.5) < 1e-9
    assert abs(o.strict_recall - 0.5) < 1e-9
    assert abs(o.strict_f1 - 0.5) < 1e-9
