"""KG consistency validation: type-signature mining and functional-
predicate conflict detection.

Real KG-construction systems promote candidate triples through
CONSTRAINT gates before they enter the graph: NELL's coupled learning
enforces category/relation type signatures, Knowledge Vault scores
candidates against prior type distributions, YAGO checks functional
predicates (a person has at most one birth date).  The reference engine
(ClinicalTransformerNER) stops at span extraction — this is
beyond-reference KG tooling per the task brief, same stance as
links/delta/structured.

Operators, all exact relational computations:

* :func:`predicate_signatures` — mine each predicate's dominant
  (subj_type, obj_type) signature and its purity from the aggregated
  triples.  Scale shape: one partial-aggregated groupBy on
  (pred, types) — the output is PREDICATE-scale (tiny), the input scan
  is the only corpus-sized pass.
* :func:`signature_violations` — triples whose types contradict a
  sufficiently-pure signature (candidate extraction errors, the
  curation queue).  One unhinted join against the predicate-scale
  signature table (AQE broadcasts it at runtime — a few hundred
  predicates even at web scale).
* :func:`functional_conflicts` — for declared functional predicates,
  subjects asserting more than one object, with the strongest and
  runner-up object by (confidence, n_evidence) — the contradiction
  queue.  One groupBy on (pred, subj); deterministic struct-max picks,
  no window, no sort of the triple table.

Semantics pinned by pure-Python oracles in tests/test_constraints.py;
determinism pinned by explicit tie-break ordering everywhere (count
desc, then lexicographic) so re-runs and engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_signatures(triples: DataFrame) -> DataFrame:
    """Aggregated triples -> (pred, sig_subj_type, sig_obj_type,
    n_triples, n_signature, purity).

    The signature is the modal (subj_type, obj_type) pair weighted by
    n_evidence (an assertion seen on many pages votes more than a
    one-off), ties broken lexicographically; purity = its share of the
    predicate's total evidence.  Two partial-aggregated groupBys whose
    keys nest, so the second runs on the (pred, types) rollup — never a
    second corpus pass.
    """
    by_sig = triples.groupBy("pred", "subj_type", "obj_type").agg(
        F.sum("n_evidence").cast("long").alias("_w"),
        F.count("*").cast("long").alias("_n"),
    )
    # modal pick = max weight, then lexicographically smallest types
    # among ties.  "max weight then MIN string" cannot ride one
    # max(struct) (struct order is ascending on every field), so it is
    # two nested aggs over the already-tiny (pred, types) rollup —
    # never a second corpus pass.
    per_pred = by_sig.groupBy("pred").agg(
        F.sum("_w").cast("long").alias("_total_w"),
        F.sum("_n").cast("long").alias("n_triples"),
        F.max("_w").alias("_max_w"),
    )
    best = (
        by_sig.join(per_pred, "pred")
        .filter(F.col("_w") == F.col("_max_w"))
        .groupBy("pred")
        .agg(
            # ties at max weight: lexicographically smallest (subj, obj)
            F.min(F.struct("subj_type", "obj_type")).alias("_sig"),
            F.first("_max_w").alias("_w"),
            F.first("_total_w").alias("_total_w"),
            F.first("n_triples").alias("n_triples"),
        )
    )
    return best.select(
        "pred",
        F.col("_sig.subj_type").alias("sig_subj_type"),
        F.col("_sig.obj_type").alias("sig_obj_type"),
        "n_triples",
        F.col("_w").alias("n_signature"),
        (F.col("_w") / F.col("_total_w")).alias("purity"),
    )


def signature_violations(
    triples: DataFrame, signatures: DataFrame, min_purity: float = 0.8
) -> DataFrame:
    """Triples whose (subj_type, obj_type) contradicts their predicate's
    dominant signature, when that signature is pure enough to trust
    (``purity >= min_purity``).  Returns the offending triples plus the
    expected signature columns — the extraction-error curation queue.

    The join is UNHINTED: the signature table is predicate-scale and
    AQE broadcasts it at runtime (a forced hint would override the
    broadcast threshold if a caller passes a huge signature frame —
    the CLAUDE.md regime).
    """
    sig = signatures.filter(F.col("purity") >= F.lit(min_purity)).select(
        "pred", "sig_subj_type", "sig_obj_type", "purity"
    )
    return triples.join(sig, "pred").filter(
        (F.col("subj_type") != F.col("sig_subj_type"))
        | (F.col("obj_type") != F.col("sig_obj_type"))
    )


def functional_conflicts(
    triples: DataFrame, functional_preds: list[str]
) -> DataFrame:
    """For declared FUNCTIONAL predicates (at most one true object per
    subject), find subjects asserting more than one distinct object:
    (pred, subj_text, n_objects, total_evidence, best_obj,
    best_confidence, runner_up_obj, runner_up_confidence).

    The strongest object is the max of (confidence, n_evidence,
    obj_text) — deterministic under ties; the runner-up is the max over
    the remainder, computed in the SAME single groupBy via a two-slot
    struct fold (max and conditional-max), so the triple table is
    scanned once and shuffled once on (pred, subj).  At 10^12 pages the
    conflict queue is what a curation pipeline pages through — bounded
    output per key by construction (two slots), never a collect_list of
    all objects.
    """
    t = triples.filter(F.col("pred").isin(list(functional_preds)))
    rank = F.struct(
        F.col("confidence").alias("c"),
        F.col("n_evidence").alias("n"),
        F.col("obj_text").alias("o"),
    )
    g = t.groupBy("pred", "subj_text").agg(
        F.countDistinct("obj_text").cast("long").alias("n_objects"),
        F.sum("n_evidence").cast("long").alias("total_evidence"),
        F.max(rank).alias("_best"),
    )
    # the runner-up needs "max over objects != best_obj", which a single
    # agg cannot see (best is only known after the fold) — one more
    # partial-aggregated pass over the SAME shuffled key, joined back on
    # (pred, subj): both aggs share the (pred, subj_text) partitioning,
    # so the join is co-partitioned.
    best = g.select(
        "pred",
        "subj_text",
        "n_objects",
        "total_evidence",
        F.col("_best.o").alias("best_obj"),
        F.col("_best.c").alias("best_confidence"),
    )
    runner = (
        t.join(
            best.select("pred", "subj_text", "best_obj"),
            ["pred", "subj_text"],
        )
        .filter(F.col("obj_text") != F.col("best_obj"))
        .groupBy("pred", "subj_text")
        .agg(F.max(rank).alias("_ru"))
        .select(
            "pred",
            "subj_text",
            F.col("_ru.o").alias("runner_up_obj"),
            F.col("_ru.c").alias("runner_up_confidence"),
        )
    )
    return (
        best.join(runner, ["pred", "subj_text"], "left")
        .filter(F.col("n_objects") > 1)
        .select(
            "pred",
            "subj_text",
            "n_objects",
            "total_evidence",
            "best_obj",
            "best_confidence",
            "runner_up_obj",
            "runner_up_confidence",
        )
    )


def predicate_profile(
    triples: DataFrame,
    subj: str = "subj_text",
    pred: str = "pred",
    obj: str = "obj_text",
    functional_threshold: float = 0.95,
) -> DataFrame:
    """Per-predicate cardinality profile — the statistics that DECIDE
    which predicates :func:`functional_conflicts` should police (the
    caller currently has to declare them; at open-extraction scale the
    declaration must come from the data):

    * ``n_triples``, ``n_subjects``, ``n_objects`` — distinct counts;
    * ``functionality = n_subjects / n_triples`` (YAGO/PARIS: 1.0 means
      every subject has exactly one object — birth_date-like);
    * ``inv_functionality = n_objects / n_triples`` (1.0 means every
      object has one subject — identifier-like);
    * ``is_functional`` — functionality >= ``functional_threshold``.

    ONE count-distinct aggregate over the distinct fact projection
    (HashAggregate, map-side partials); output is predicate-vocabulary
    sized.  All ratios are single IEEE divisions of exact longs —
    cross-engine exact.  Defaults profile the text columns (present on
    both the aggregated-triples and edges tables); pass
    ``subj="subj_id", obj="obj_id"`` to profile canonical entity ids
    instead (note count_distinct skips the null obj_id of declared-
    knowledge literals).
    """
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    ).distinct()
    prof = t.groupBy(F.col("p").alias("pred")).agg(
        F.count("*").alias("n_triples"),
        F.count_distinct("s").alias("n_subjects"),
        F.count_distinct("o").alias("n_objects"),
    )
    return prof.select(
        "pred",
        "n_triples",
        "n_subjects",
        "n_objects",
        (F.col("n_subjects") / F.col("n_triples")).alias("functionality"),
        (F.col("n_objects") / F.col("n_triples")).alias("inv_functionality"),
        (
            F.col("n_subjects") / F.col("n_triples") >= F.lit(functional_threshold)
        ).alias("is_functional"),
    )


def mined_functional_conflicts(
    triples: DataFrame, functional_threshold: float = 0.95, min_triples: int = 2
) -> DataFrame:
    """functional_conflicts with the functional-predicate list MINED from
    the profile instead of declared: predicates whose functionality
    clears the threshold (and have at least ``min_triples`` distinct
    facts — a 1-triple predicate is trivially functional) feed the
    conflict queue.  The mined predicate list is vocabulary-sized; the
    bounded ``first()`` collect that materializes it is the same
    driver-side discipline as the pagerank dangling mass."""
    prof = predicate_profile(triples, functional_threshold=functional_threshold)
    preds = [
        r.pred
        for r in prof.filter(
            F.col("is_functional") & (F.col("n_triples") >= min_triples)
        )
        .select("pred")
        .collect()
    ]
    if not preds:
        return functional_conflicts(triples, ["__none__"]).limit(0)
    return functional_conflicts(triples, preds)
