"""Strict/relax span-level P/R/F evaluation as ONE Spark query.

Relational re-expression of the reference's BioEval
(/root/reference/src/common_utils/bio_prf_eval.py:192-283):

* J4 strict match  — equi-join on (url, sent_id, cate, tok_s, tok_e);
  with spans extracted by the eval scan, boundary equality + both sides
  starting with ``b-`` is exactly token-for-token strict equality, and the
  "gold continues past end" clause is absorbed by gold-boundary equality.
* J5 relax match   — interval-overlap theta-join per (url, sent_id, cate).
* J6 one-credit    — the reference walks predictions left-to-right and
  charges the FIRST gold span (in gold left-to-right order) of the same
  cate whose interval TOUCHES the prediction (its overlap test compares
  an exclusive end with ``<``, so touching counts); each gold has one
  credit; strict matches do NOT consume credit; an uncredited
  relax-matching prediction is skipped entirely (neither TP nor FP).
  Relationally: assign each non-strict prediction to its first touching
  gold, then ``row_number`` per gold ordered by prediction position.

The whole thing is joins + windows + one rollup — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .operators.spans import eval_spans


def _spans(tokens: DataFrame, label_col: str) -> DataFrame:
    t = tokens.select("url", "sent_id", "pos", F.col(label_col).alias("label"))
    return eval_spans(t)


def evaluate_tokens(tokens: DataFrame) -> DataFrame:
    """Input: (url, sent_id, pos, gold_label, pred_label) token rows.

    Output: one row per category plus an ``overall`` rollup row with
    columns (cate, gold_n, strict_tp, strict_fp, relax_tp, relax_fp,
    strict_precision/recall/f1, relax_precision/recall/f1).
    """
    gold = _spans(tokens, "gold_label").withColumnRenamed("starts_b", "g_starts_b")
    pred = _spans(tokens, "pred_label").withColumnRenamed("starts_b", "p_starts_b")

    g = gold.select(
        "url", "sent_id", "cate",
        F.col("tok_s").alias("g_s"), F.col("tok_e").alias("g_e"), "g_starts_b",
    )
    p = pred.select(
        "url", "sent_id", "cate",
        F.col("tok_s").alias("p_s"), F.col("tok_e").alias("p_e"), "p_starts_b",
    )

    # J4 strict: exact boundary + cate equality, both sides begin with b-.
    # Explicit aliases + qualified refs: p and g share lineage, and bare
    # p.url == g.url self-join predicates resolve only via dataset-id
    # disambiguation ("trivially true equals" analyzer warning) — fragile
    # across Spark versions, so both sides are aliased like the J5/J6 join.
    p, g = p.alias("p"), g.alias("g")
    strict_cond = F.expr(
        "p.url = g.url AND p.sent_id = g.sent_id AND p.cate = g.cate "
        "AND p.p_s = g.g_s AND p.p_e = g.g_e AND p.p_starts_b AND g.g_starts_b"
    )
    strict = p.join(g, strict_cond, "left_semi").withColumn("outcome", F.lit("strict"))

    non_strict = p.join(g, strict_cond, "left_anti")

    # J5/J6: for non-strict preds, first TOUCHING gold (credit target) and
    # whether any gold TRULY overlaps (relax match).
    joined = non_strict.alias("p").join(
        g.alias("g"),
        F.expr(
            "p.url = g.url AND p.sent_id = g.sent_id AND p.cate = g.cate "
            "AND g.g_e >= p.p_s AND g.g_s <= p.p_e"  # touching counts (reference quirk)
        ),
        "left",
    )
    per_pred = (
        joined.groupBy("p.url", "p.sent_id", "p.cate", "p.p_s", "p.p_e")
        .agg(
            F.max(
                (F.col("g.g_s") < F.col("p.p_e")) & (F.col("p.p_s") < F.col("g.g_e"))
            ).alias("relax_match"),
            F.min_by(F.struct("g.g_s", "g.g_e"), F.struct("g.g_s", "g.g_e")).alias("credit_gold"),
        )
    )
    per_pred = per_pred.withColumn(
        "relax_match", F.coalesce(F.col("relax_match"), F.lit(False))
    )
    misses = per_pred.filter(~F.col("relax_match")).withColumn("outcome", F.lit("miss"))
    # only relax-matching preds compete for a gold's single credit
    # (a miss never consults the credit table in the reference)
    w_credit = Window.partitionBy("url", "sent_id", "cate", "credit_gold").orderBy("p_s", "p_e")
    relaxed = per_pred.filter(F.col("relax_match")).withColumn(
        "outcome",
        F.when(F.row_number().over(w_credit) == 1, F.lit("relax")).otherwise(F.lit("skip")),
    )

    outcomes = (
        strict.select("cate", "outcome")
        .unionByName(relaxed.select("cate", "outcome"))
        .unionByName(misses.select("cate", "outcome"))
    )
    pred_counts = outcomes.groupBy("cate").agg(
        F.sum((F.col("outcome") == "strict").cast("long")).alias("strict_tp"),
        F.sum(F.col("outcome").isin("relax", "miss").cast("long")).alias("strict_fp"),
        F.sum(F.col("outcome").isin("strict", "relax").cast("long")).alias("relax_tp"),
        F.sum((F.col("outcome") == "miss").cast("long")).alias("relax_fp"),
    )
    gold_counts = g.groupBy("cate").agg(F.count("*").alias("gold_n"))

    per_cat = gold_counts.join(pred_counts, "cate", "full_outer").na.fill(0)
    rolled = (
        per_cat.withColumn("cate", F.lit("overall"))
        .groupBy("cate")
        .agg(*[F.sum(c).alias(c) for c in ("gold_n", "strict_tp", "strict_fp", "relax_tp", "relax_fp")])
    )
    counts = per_cat.unionByName(rolled)
    return add_prf(counts)


def add_prf(counts: DataFrame, beta: float = 1.0) -> DataFrame:
    """A4: P/R/F-beta column expressions (bio_prf_eval.py:105-115)."""
    b2 = F.lit(beta * beta)
    out = counts
    for mode in ("strict", "relax"):
        tp, fp = F.col(f"{mode}_tp"), F.col(f"{mode}_fp")
        pre = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
        rec = F.when(F.col("gold_n") > 0, tp / F.col("gold_n")).otherwise(F.lit(0.0))
        out = (
            out.withColumn(f"{mode}_precision", pre)
            .withColumn(f"{mode}_recall", rec)
            .withColumn(
                f"{mode}_f1",
                F.when(
                    (F.col(f"{mode}_precision") + F.col(f"{mode}_recall")) > 0,
                    (1 + b2)
                    * F.col(f"{mode}_precision")
                    * F.col(f"{mode}_recall")
                    / (b2 * F.col(f"{mode}_precision") + F.col(f"{mode}_recall")),
                ).otherwise(F.lit(0.0)),
            )
        )
    return out


def token_accuracy(tokens: DataFrame) -> DataFrame:
    """A1: token-level label accuracy."""
    return tokens.agg(
        F.avg((F.lower("gold_label") == F.lower("pred_label")).cast("double")).alias("acc"),
        F.count("*").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# J7 + A6: brat-level (document-keyed, mention-level) evaluation
# --------------------------------------------------------------------------


def evaluate_mentions(
    gold: DataFrame, pred: DataFrame, tags_to_exclude: tuple[str, ...] = ()
) -> DataFrame:
    """Document-level strict/lenient span eval with micro AND macro P/R/F.

    Relational re-expression of brat_eval.py (SingleEvaluator :211-301,
    MultipleEvaluator.track2 :304-367): strict = exact (doc, type, start,
    end) equality; lenient = same-type interval overlap with one credit
    per gold span (each gold matches at most one prediction, dedup
    :233-245).  micro = global TP/FP/FN sums; macro = mean of per-doc
    P/R/F — Spark's two-level partial+final aggregation does both in one
    pass over the match table.  ``tags_to_exclude`` filters both sides by
    lowercased type before scoring (the reference drops them at .ann load,
    brat_eval.py:120-122).

    Inputs: mention DataFrames (url, start, end, type).
    Output: (level, scope, tp, fp, fn, precision, recall, f1) where
    level ∈ {strict, lenient}, scope ∈ {micro, macro}.
    """
    if tags_to_exclude:
        excl = [t.lower() for t in tags_to_exclude]
        gold = gold.filter(~F.lower("type").isin(excl))
        pred = pred.filter(~F.lower("type").isin(excl))
    g = gold.select("url", F.col("start").alias("g_s"), F.col("end").alias("g_e"), "type")
    p = pred.select("url", F.col("start").alias("p_s"), F.col("end").alias("p_e"), "type")

    strict_hit = p.join(
        g,
        (p.url == g.url) & (p.type == g.type) & (p.p_s == g.g_s) & (p.p_e == g.g_e),
        "left_semi",
    )

    # lenient: overlap join, then one credit per gold and per pred
    ov = p.alias("p").join(
        g.alias("g"),
        F.expr("p.url = g.url AND p.type = g.type AND g.g_s < p.p_e AND p.p_s < g.g_e"),
    )
    w_pred = Window.partitionBy("p.url", "p.type", "p.p_s", "p.p_e").orderBy("g.g_s", "g.g_e")
    best_gold = ov.withColumn("rn", F.row_number().over(w_pred)).filter("rn = 1")
    w_gold = Window.partitionBy("url", "type", "g_s", "g_e").orderBy("p_s", "p_e")
    lenient_hit = (
        best_gold.select("p.url", "p.type", "p.p_s", "p.p_e", "g.g_s", "g.g_e")
        .withColumn("rn", F.row_number().over(w_gold))
        .filter("rn = 1")
        .select("url", "type", F.col("p_s"), F.col("p_e"))
    )
    return _doc_prf_report(p, g, strict_hit.select("url"), lenient_hit.select("url"))


def evaluate_relations(
    gold: DataFrame, pred: DataFrame, tags_to_exclude: tuple[str, ...] = ()
) -> DataFrame:
    """Relation-level strict/lenient eval (brat_eval.py Relation.equals
    :66-73 + SingleEvaluator relations block :263-301): a predicted
    relation matches a gold one when rtype is equal AND arg1 matches
    gold's arg1 AND arg2 matches gold's arg2 — exact spans for strict,
    same-type interval overlap for lenient — with one credit per gold
    (pare-down :273-285).  For a triple-extraction engine this is the
    acceptance metric: (subj, pred, obj) IS a relation.

    Inputs: relation DataFrames
    (url, rtype, a1_s, a1_e, a1_type, a2_s, a2_e, a2_type).
    Output: same report shape as evaluate_mentions.
    """
    if tags_to_exclude:
        excl = [t.lower() for t in tags_to_exclude]
        # the reference drops excluded TAGS at load; relations referencing
        # them are unresolvable there — here: filtered out
        cond = ~F.lower("a1_type").isin(excl) & ~F.lower("a2_type").isin(excl)
        gold = gold.filter(cond)
        pred = pred.filter(cond)
    cols = ["rtype", "a1_s", "a1_e", "a1_type", "a2_s", "a2_e", "a2_type"]
    g = gold.select("url", *[F.col(c).alias(f"g_{c}") for c in cols])
    p = pred.select("url", *[F.col(c).alias(f"p_{c}") for c in cols])

    strict_cond = (p.url == g.url)
    for c in cols:
        strict_cond = strict_cond & (p[f"p_{c}"] == g[f"g_{c}"])
    strict_hit = p.join(g, strict_cond, "left_semi")

    ov = p.alias("p").join(
        g.alias("g"),
        F.expr(
            "p.url = g.url AND p.p_rtype = g.g_rtype "
            "AND p.p_a1_type = g.g_a1_type AND g.g_a1_s < p.p_a1_e AND p.p_a1_s < g.g_a1_e "
            "AND p.p_a2_type = g.g_a2_type AND g.g_a2_s < p.p_a2_e AND p.p_a2_s < g.g_a2_e"
        ),
    )
    pk = [f"p.p_{c}" for c in cols]
    gk = [f"g_{c}" for c in cols]
    w_pred = Window.partitionBy("p.url", *pk).orderBy(*[f"g.{k}" for k in gk])
    best_gold = ov.withColumn("rn", F.row_number().over(w_pred)).filter("rn = 1")
    w_gold = Window.partitionBy("url", *gk).orderBy(*[f"p_{c}" for c in cols])
    lenient_hit = (
        best_gold.select("p.url", *[f"p.p_{c}" for c in cols], *[f"g.{k}" for k in gk])
        .withColumn("rn", F.row_number().over(w_gold))
        .filter("rn = 1")
    )
    return _doc_prf_report(p, g, strict_hit.select("url"), lenient_hit.select("url"))


def _doc_prf_report(
    p: DataFrame, g: DataFrame, strict_hits: DataFrame, lenient_hits: DataFrame
) -> DataFrame:
    """Shared micro/macro P/R/F report over per-doc TP/FP/FN counts; every
    input only needs a ``url`` column (one row per pred / gold / hit)."""

    def _counts(hits: DataFrame) -> DataFrame:
        per_doc_p = p.groupBy("url").agg(F.count("*").alias("n_pred"))
        per_doc_g = g.groupBy("url").agg(F.count("*").alias("n_gold"))
        per_doc_tp = hits.groupBy("url").agg(F.count("*").alias("tp"))
        return (
            per_doc_g.join(per_doc_p, "url", "full_outer")
            .join(per_doc_tp, "url", "full_outer")
            .na.fill(0)
            .withColumn("fp", F.col("n_pred") - F.col("tp"))
            .withColumn("fn", F.col("n_gold") - F.col("tp"))
        )

    out = []
    for level, hits in (("strict", strict_hits), ("lenient", lenient_hits)):
        per_doc = _counts(hits)
        prf = per_doc.select(
            "url", "tp", "fp", "fn",
            F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0).alias("pre"),
            F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0).alias("rec"),
        ).withColumn(
            "f1",
            F.when((F.col("pre") + F.col("rec")) > 0, 2 * F.col("pre") * F.col("rec") / (F.col("pre") + F.col("rec"))).otherwise(0.0),
        )
        micro = prf.agg(
            F.lit(level).alias("level"), F.lit("micro").alias("scope"),
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
        ).withColumn(
            "precision", F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
        ).withColumn(
            "recall", F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
        ).withColumn(
            "f1",
            F.when((F.col("precision") + F.col("recall")) > 0,
                   2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall"))).otherwise(0.0),
        )
        macro = prf.agg(
            F.lit(level).alias("level"), F.lit("macro").alias("scope"),
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
            F.avg("pre").alias("precision"), F.avg("rec").alias("recall"), F.avg("f1").alias("f1"),
        )
        out.append(micro.select("level", "scope", "tp", "fp", "fn", "precision", "recall", "f1"))
        out.append(macro.select("level", "scope", "tp", "fp", "fn", "precision", "recall", "f1"))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
