"""Annotation sinks: brat ``.ann`` (K2) and BioC XML (K3).

Reference templates (output_format_converter.py:18-41):
  brat:  ``T{n}\t{type} {s} {e}\t{text}``
  BioC:  annotation block with id/text/offset(+length)/type

Semantics re-expressed relationally (bio2output, :194-246):
* entity text is the RAW substring of the original document — a
  broadcast-join back to pages + ``substring`` (J2); when the page text
  is already a pipeline column there is no join at all.
* per-document entity renumbering in (start, end) order — W7
  ``row_number`` window.
* a newline inside the raw span splits the brat offsets into
  ``s i;i+1 e`` (discontinuous-span quirk, :219-222) and the newline in
  the text is replaced by a space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BIOC_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n<collection><source>kgce</source>'
    "<document><id>{}</id>"
)
BIOC_END = "</document></collection>"


def mentions_with_raw_text(mentions: DataFrame, pages: DataFrame) -> DataFrame:
    """J2: re-read the raw span text from the page (offsets are absolute)."""
    p = pages.select(F.col("url").alias("m_url"), F.col("text").alias("doc_text"))
    return (
        mentions.join(F.broadcast(p), mentions.url == p.m_url)
        .withColumn("raw_text", F.substring("doc_text", F.col("start") + 1, F.col("end") - F.col("start")))
        .drop("m_url", "doc_text")
    )


def brat_lines(mentions_raw: DataFrame) -> DataFrame:
    """-> (url, line) brat rows, T-numbering per doc in (start, end) order."""
    w = Window.partitionBy("url").orderBy("start", "end")
    nl = F.instr("raw_text", "\n")  # 1-based; 0 if absent
    offsets = F.when(
        nl > 0,
        F.format_string(
            "%d %d;%d %d",
            F.col("start"),
            F.col("start") + nl - 1,
            F.col("start") + nl,
            F.col("end"),
        ),
    ).otherwise(F.format_string("%d %d", F.col("start"), F.col("end")))
    return mentions_raw.select(
        "url",
        F.format_string(
            "T%d\t%s %s\t%s",
            F.row_number().over(w),
            F.col("type"),
            offsets,
            F.regexp_replace("raw_text", "\n", " "),
        ).alias("line"),
        F.col("start"),
        F.col("end"),
    )


def write_brat(mentions_raw: DataFrame, out_dir: str) -> None:
    """One .ann-shaped text blob per document, partitioned by doc."""
    per_doc = (
        brat_lines(mentions_raw)
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("start", "end", "line"))),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("value")
        )
    )
    per_doc.select(F.sha2("url", 256).alias("doc"), "value").write.mode(
        "overwrite"
    ).partitionBy("doc").text(out_dir)


def bioc_documents(mentions_raw: DataFrame) -> DataFrame:
    """-> (url, xml) one BioC XML document per page (K3)."""
    w = Window.partitionBy("url").orderBy("start", "end")
    ann = F.format_string(
        '<annotation id="%d"><text>%s</text>'
        '<infon key="type">%s</infon>'
        '<location length="%d" offset="%d"/></annotation>',
        F.row_number().over(w),
        F.regexp_replace("raw_text", "\n", " "),
        F.col("type"),
        F.col("end") - F.col("start"),
        F.col("start"),
    )
    per_doc = (
        mentions_raw.select("url", "start", "end", ann.alias("a"))
        .groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("start", "end", "a"))),
                    lambda x: x["a"],
                ),
                "",
            ).alias("body")
        )
    )
    return per_doc.select(
        "url",
        F.concat(
            F.format_string(BIOC_HEADER.replace("{}", "%s"), F.col("url")),
            F.col("body"),
            F.lit(BIOC_END),
        ).alias("xml"),
    )


def merge_brat_outputs(*mention_dfs: DataFrame) -> DataFrame:
    """T4: union of multiple annotation sets, unique entities only
    (output_format_converter.py:4-6 'concatenating all unique entities')."""
    out = mention_dfs[0]
    for df in mention_dfs[1:]:
        out = out.unionByName(df)
    return out.dropDuplicates(["url", "type", "start", "end"])
