"""J7/A6: document-level strict/lenient mention eval, micro + macro."""

from pyspark.sql import functions as F

from kgce import evaluation

M = "url string, start int, end int, type string"


def test_strict_and_lenient_micro(spark):
    gold = spark.createDataFrame(
        [("d1", 0, 5, "per"), ("d1", 10, 15, "loc"), ("d2", 0, 3, "per")], M
    )
    pred = spark.createDataFrame(
        [
            ("d1", 0, 5, "per"),    # strict TP
            ("d1", 11, 14, "loc"),  # lenient-only TP (overlap)
            ("d2", 5, 8, "per"),    # FP (no overlap)
        ],
        M,
    )
    res = {(r.level, r.scope): r for r in evaluation.evaluate_mentions(gold, pred).collect()}
    sm = res[("strict", "micro")]
    assert (sm.tp, sm.fp, sm.fn) == (1, 2, 2)
    lm = res[("lenient", "micro")]
    assert (lm.tp, lm.fp, lm.fn) == (2, 1, 1)
    assert abs(lm.precision - 2 / 3) < 1e-9 and abs(lm.recall - 2 / 3) < 1e-9


def test_one_credit_per_gold_lenient(spark):
    gold = spark.createDataFrame([("d1", 0, 10, "per")], M)
    pred = spark.createDataFrame([("d1", 0, 4, "per"), ("d1", 5, 9, "per")], M)
    res = {(r.level, r.scope): r for r in evaluation.evaluate_mentions(gold, pred).collect()}
    lm = res[("lenient", "micro")]
    # only ONE prediction credits the gold; the other is an FP
    assert (lm.tp, lm.fp, lm.fn) == (1, 1, 0)


def test_macro_averages_per_doc(spark):
    gold = spark.createDataFrame([("d1", 0, 5, "per"), ("d2", 0, 5, "per")], M)
    pred = spark.createDataFrame([("d1", 0, 5, "per"), ("d2", 20, 25, "per")], M)
    res = {(r.level, r.scope): r for r in evaluation.evaluate_mentions(gold, pred).collect()}
    # micro: P=R=0.5 ; macro: doc1 perfect (1.0), doc2 zero -> 0.5 as well,
    # but f1 macro = mean(1.0, 0.0) = 0.5 while micro f1 = 0.5 too; use a
    # skewed case to tell them apart:
    gold2 = spark.createDataFrame(
        [("d1", 0, 5, "per")] + [("d2", i * 10, i * 10 + 5, "per") for i in range(4)], M
    )
    pred2 = spark.createDataFrame(
        [("d1", 0, 5, "per"), ("d2", 0, 5, "per")], M
    )
    r2 = {(r.level, r.scope): r for r in evaluation.evaluate_mentions(gold2, pred2).collect()}
    micro = r2[("strict", "micro")]
    macro = r2[("strict", "macro")]
    assert abs(micro.recall - 2 / 5) < 1e-9
    assert abs(macro.recall - (1.0 + 0.25) / 2) < 1e-9
    assert micro.recall != macro.recall
