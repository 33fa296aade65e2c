"""Relational (window-function) implementations of the sequential
reference logic — W1 BIO repair, W2/W3 span sessionization (SURVEY.md §2.5).

These operate on token-level DataFrames
``(doc, sent_id, pos, token, start, end, label)`` and are exactly
equivalent to the in-UDF array implementations in kgce.tagging /
kgce.oracle (property-tested against them).  The fused UDF path is the
production plan (no token explode, no shuffle); the window path is the
SQL-expressible form used by the DuckDB-oracle-checked queries and by
callers that already hold token-level rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import core_surface, label_type


def fix_bio_relational(
    tokens: DataFrame,
    keys: list[str] = ("url", "sent_id"),
    pos: str = "pos",
    label: str = "label",
    out: str = "fixed_label",
) -> DataFrame:
    """W1 BIO repair as a pure ``lag`` expression.

    The reference scans with the *repaired* previous label
    (task.py:467-491), but repair preserves both the O-ness and the type
    of every label, so the decision is identical on the RAW previous
    label — which makes plain ``lag`` sufficient (no recursion).
    """
    w = Window.partitionBy(*keys).orderBy(pos)
    prev = F.lag(F.col(label)).over(w)
    lab = F.col(label)
    needs_b = lab.startswith("I-") & (
        prev.isNull() | (prev == "O") | (label_type(prev) != label_type(lab))
    )
    return tokens.withColumn(out, F.when(needs_b, F.concat(F.lit("B-"), label_type(lab))).otherwise(lab))


def sessionize_spans(
    tokens: DataFrame,
    keys: list[str] = ("url", "sent_id"),
    pos: str = "pos",
    label: str = "label",
) -> DataFrame:
    """W2 span decode (tag2entity semantics) via session windows.

    ``B-`` always opens; ``I-`` opens when the previous label is absent,
    ``O`` or differently typed (the reference opens a NEW span there,
    output_format_converter.py:156-191); ``I-`` of the running type
    extends.  span_id = running sum of open-flags; then one groupBy per
    span.  Output: (keys..., span_id, type, tok_s, tok_e, start, end, text).

    Mention surfaces/offsets use the EDGE_PUNCT-stripped token core
    (oracle.core_token_offsets twin), matching the fused UDF decode.
    """
    tok_c, s_c, e_c = core_surface(F.col("token"), F.col("start"), F.col("end"))
    tokens = tokens.withColumns({"token": tok_c, "start": s_c, "end": e_c})
    w = Window.partitionBy(*keys).orderBy(pos)
    lab = F.col(label)
    prev = F.lag(lab).over(w)
    is_ent = lab != "O"
    opens = is_ent & (
        lab.startswith("B-")
        | prev.isNull()
        | (prev == "O")
        | (label_type(prev) != label_type(lab))
    )
    with_span = (
        tokens.withColumn("_open", opens.cast("int"))
        .withColumn(
            "span_id",
            F.sum("_open").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .filter(is_ent)
    )
    return (
        with_span.groupBy(*keys, "span_id")
        .agg(
            F.min_by(label_type(lab), F.col(pos)).alias("type"),
            F.min(pos).alias("tok_s"),
            (F.max(pos) + 1).alias("tok_e"),
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(pos).alias("p"), F.col("token").alias("t")))),
                    lambda x: x["t"],
                ),
                " ",
            ).alias("text"),
        )
    )


def eval_spans(
    tokens: DataFrame,
    keys: list[str] = ("url", "sent_id"),
    pos: str = "pos",
    label: str = "label",
) -> DataFrame:
    """W3 eval-side span scan (bio_prf_eval.py:237-263) on lowercased labels.

    ANY non-O label opens a span; it extends only while the next label is
    exactly ``i-{cate}``.  Differs from W2 only in the open condition for
    ``b-``: two adjacent ``b-x`` are separate spans in both; but here a
    ``b-x`` after ``i-x`` also opens (same as W2) — the real difference is
    that extension requires an exact ``i-{cate}`` continuation, which the
    open-flag below encodes identically.  Adds ``starts_b`` for strict
    matching.
    """
    w = Window.partitionBy(*keys).orderBy(pos)
    lab = F.lower(F.col(label))
    prev = F.lag(lab).over(w)
    is_ent = lab != "o"
    # a token opens a span unless it is exactly i-{cate of prev span-extendable}
    extends = lab.startswith("i-") & prev.isNotNull() & (prev != "o") & (
        label_type(prev) == label_type(lab)
    )
    opens = is_ent & ~extends
    with_span = (
        tokens.withColumn("_lab", lab)
        .withColumn("_open", opens.cast("int"))
        .withColumn(
            "span_id",
            F.sum("_open").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .filter(is_ent)
    )
    return with_span.groupBy(*keys, "span_id").agg(
        F.min_by(label_type(F.col("_lab")), F.col(pos)).alias("cate"),
        F.min(pos).alias("tok_s"),
        (F.max(pos) + 1).alias("tok_e"),
        F.min_by(F.col("_lab").startswith("b-"), F.col(pos)).alias("starts_b"),
    )
