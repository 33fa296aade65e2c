"""BIO-format sources and sinks (SURVEY.md §2.1 S1/S2/K1).

File format (reference `_read_data`, data_utils.py:117-171 and
`load_bio_file_into_sents`, common_io.py:43-60): sentence blocks
separated by blank lines; one ``token [s e ns ne] label`` line per word,
space-separated; 'test' mode forces labels to 'O'; malformed lines
(< 2 fields) are skipped with a warning in the reference — here they
become rows in a quarantine count, not a job abort (S5 semantics:
row-level error isolation instead of per-file try/except).

Distributed shape: one whole file per row (wholetext), sentence blocks
explode via split on blank lines — all JVM-side string ops; the
per-line parse stays in `transform` lambdas (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_bio(
    spark: SparkSession,
    path: str,
    test_mode: bool = False,
    do_lower: bool = False,
) -> DataFrame:
    """-> (doc_id, sent_id, tokens array, labels array, offsets array<struct>).

    Offsets present only when lines carry the 4-int offset columns
    (reference offset mode, data_utils.py:149-163); otherwise null.
    """
    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("doc_id", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("value", F.regexp_replace("value", "\r\n", "\n"))
    )
    if do_lower:
        raw = raw.withColumn("value", F.lower("value"))
    sents = raw.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("value")), "\n\n+")).alias("sent_id", "block"),
    ).filter(F.length(F.trim("block")) > 0)

    lines = F.filter(
        F.transform(F.split("block", "\n"), lambda l: F.split(F.trim(l), " ")),
        lambda parts: F.size(parts) >= 2,  # reference skips malformed lines
    )
    toks = F.transform(lines, lambda p: F.element_at(p, 1))
    labels = (
        F.transform(lines, lambda p: F.lit("O"))
        if test_mode
        else F.transform(lines, lambda p: F.element_at(p, -1))
    )
    offsets = F.transform(
        lines,
        lambda p: F.when(
            F.size(p) >= 6,
            F.struct(
                F.element_at(p, 2).cast("int").alias("s"),
                F.element_at(p, 3).cast("int").alias("e"),
                F.element_at(p, 4).cast("int").alias("ns"),
                F.element_at(p, 5).cast("int").alias("ne"),
            ),
        ),
    )
    return sents.select(
        "doc_id",
        F.col("sent_id").cast("long").alias("sent_id"),
        toks.alias("tokens"),
        labels.alias("labels"),
        offsets.alias("offsets"),
    )


def write_bio(tagged: DataFrame, path: str) -> None:
    """K1: (doc_id, sent_id, tokens, tok_starts, tok_ends, labels) ->
    BIO text, blank line between sentences, deterministic order
    (common_io.py:63-70 + _output_bio task.py:508-526)."""
    lines = F.array_join(
        F.zip_with(
            F.arrays_zip("tokens", "tok_starts", "tok_ends"),
            F.col("labels"),
            lambda t, l: F.concat_ws(
                " ",
                t["tokens"],
                t["tok_starts"].cast("string"),
                t["tok_ends"].cast("string"),
                t["tok_starts"].cast("string"),
                t["tok_ends"].cast("string"),
                l,
            ),
        ),
        "\n",
    )
    (
        tagged.select(F.col("url").alias("doc_id"), "sent_id", lines.alias("sent_text"))
        .orderBy("doc_id", "sent_id")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sent_id", "sent_text"))),
                    lambda x: x["sent_text"],
                ),
                "\n\n",
            ).alias("value")
        )
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def read_biaffine_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: {tokens: [...], entities: [[text, type, [s, e]], ...]} examples
    (transformer_biaffine_ner/data_utils.py:192-208); entity inventory =
    select(explode).distinct() instead of a driver-side set."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField(
                "entities",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("text", T.StringType()),
                            T.StructField("type", T.StringType()),
                            T.StructField("span", T.ArrayType(T.IntegerType())),
                        ]
                    )
                ),
            ),
        ]
    )
    return spark.read.json(path, schema=schema)


def write_biaffine_json(examples: DataFrame, path: str) -> None:
    """K4: biaffine JSON sink — the exact example shape read_biaffine_json
    loads back (transformer_biaffine_ner/data_utils.py:192-208), so
    write -> read round-trips.  Plain ``df.write.json``: one JSON object
    per line, schema (tokens, entities[text, type, span])."""
    examples.select("tokens", "entities").write.mode("overwrite").json(path)
