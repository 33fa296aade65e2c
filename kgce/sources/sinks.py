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

# exact reference templates (output_format_converter.py:19-41), including
# the leading newlines and the empty source/date/key/passage wrapper; the
# reference's xml branch crashes on entities containing '\n' (its offset
# becomes a "s i;i+1 e" string before the length subtraction) — we keep
# numeric offsets there instead of reproducing the crash.
BIOC_HEADER = (
    "\n<?xml version='1.0' encoding='utf-8' standalone='yes'?>\n"
    "<collection>\n  <source></source>\n  <date></date>\n  <key></key>\n"
    "  <document>\n    <id>%s</id>\n    <passage>\n      <offset>0</offset>\n"
)
BIOC_END = "\n    </passage>\n  </document>\n</collection>\n"
BIOC_ANNOTATION = (
    '\n      <annotation id="%d">\n'
    '        <infon key="type">%s</infon>\n'
    '        <location length="%d" offset="%d"/>\n'
    "        <text>%s</text>\n"
    "      </annotation>\n\n"  # template carries '\n' + closing-quote newline
)


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
    """-> (url, xml) one BioC XML document per page (K3).

    Byte-faithful to the reference assembly (bio2output,
    output_format_converter.py:226-242): annotation blocks rendered from
    BIOC_TEMPLATE in entity order, joined with '\\n', wrapped in
    BIOC_HEADER.format(doc_id) + ... + BIOC_END, one trailing newline.
    """
    w = Window.partitionBy("url").orderBy("start", "end")
    ann = F.format_string(
        BIOC_ANNOTATION,
        F.row_number().over(w),
        F.col("type"),
        F.col("end") - F.col("start"),
        F.col("start"),
        F.regexp_replace("raw_text", "\n", " "),
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
                "\n",
            ).alias("body")
        )
    )
    return per_doc.select(
        "url",
        F.concat(
            F.format_string(BIOC_HEADER, F.col("url")),
            F.col("body"),
            F.lit(BIOC_END),
            F.lit("\n"),
        ).alias("xml"),
    )


def parse_brat(ann_lines: DataFrame, tags_to_exclude: tuple[str, ...] = ()) -> tuple[DataFrame, DataFrame]:
    """(url, line) brat rows -> (tags, relations) DataFrames — the .ann
    loader the reference evaluator uses (brat_eval.py:99-133), relational:

    * T lines: ``T<i>\\t<type> <start>[ <gap-offsets>] <end>\\t<text>`` —
      discontinuous spans keep first start + last end (the 3/4/5-field
      cases, :110-116); ``tags_to_exclude`` drops types at load (:120-122).
    * R lines: ``R<i>\\t<rtype> Arg1:T<a> Arg2:T<b>`` — resolved against
      the tag table by (url, tid); relations referencing excluded tags
      disappear via the inner join (the reference would KeyError there).

    Output tags: (url, type, start, end, text); relations:
    (url, rtype, a1_s, a1_e, a1_type, a2_s, a2_e, a2_type) — directly
    consumable by evaluate_mentions / evaluate_relations.
    """
    parts = F.split("line", "\t")
    t = (
        ann_lines.filter(F.col("line").startswith("T"))
        .select(
            "url",
            parts.getItem(0).alias("tid"),
            F.split(parts.getItem(1), " ").alias("m"),
            parts.getItem(2).alias("text"),
        )
        .select(
            "url",
            "tid",
            F.col("m").getItem(0).alias("type"),
            F.regexp_extract(F.col("m").getItem(1), r"^\d+", 0).cast("long").alias("start"),
            F.element_at("m", -1).cast("long").alias("end"),
            "text",
        )
    )
    if tags_to_exclude:
        t = t.filter(~F.lower("type").isin([x.lower() for x in tags_to_exclude]))
    r = ann_lines.filter(F.col("line").startswith("R")).select(
        "url",
        F.split(parts.getItem(1), " ").alias("m"),
    ).select(
        "url",
        F.col("m").getItem(0).alias("rtype"),
        F.substring_index(F.col("m").getItem(1), ":", -1).alias("tid1"),
        F.substring_index(F.col("m").getItem(2), ":", -1).alias("tid2"),
    )
    t1 = t.select(
        "url", F.col("tid").alias("tid1"), F.col("start").alias("a1_s"),
        F.col("end").alias("a1_e"), F.col("type").alias("a1_type"),
    )
    t2 = t.select(
        "url", F.col("tid").alias("tid2"), F.col("start").alias("a2_s"),
        F.col("end").alias("a2_e"), F.col("type").alias("a2_type"),
    )
    rels = (
        r.join(t1, ["url", "tid1"]).join(t2, ["url", "tid2"])
        .select("url", "rtype", "a1_s", "a1_e", "a1_type", "a2_s", "a2_e", "a2_type")
    )
    return t.drop("tid"), rels


def merge_brat_outputs(*mention_dfs: DataFrame) -> DataFrame:
    """T4: union of multiple annotation sets, unique entities only
    (output_format_converter.py:4-6 'concatenating all unique entities')."""
    out = mention_dfs[0]
    for df in mention_dfs[1:]:
        out = out.unionByName(df)
    return out.dropDuplicates(["url", "type", "start", "end"])


# --- N-Triples export (KG interchange) -------------------------------------
#
# The graph a downstream consumer loads into a triplestore: one
# `<s> <p> <o> .` line per edge, W3C N-Triples escaping.  Beyond-reference
# interchange tooling (the reference stops at brat/BioC); scale shape is a
# pure narrow projection -> text sink, no shuffle.

_NT_BASE = "http://kg.local/"


def _nt_escape(col) -> "F.Column":
    """W3C N-Triples literal escaping: backslash FIRST, then quote and
    the control characters (\\n, \\r, \\t) — the same order any
    serializer uses so unescaping is unambiguous."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", "\\\\n")
    out = F.regexp_replace(out, "\r", "\\\\r")
    return F.regexp_replace(out, "\t", "\\\\t")


def ntriples_lines(edges: DataFrame, base_iri: str = _NT_BASE) -> DataFrame:
    """Edges-table rows -> one N-Triples line per edge: (line string).

    Subjects always have a canonical id (`<base>entity/<id>`); objects
    are entity IRIs when linked (``obj_id`` non-null) and escaped plain
    literals otherwise (the declared-knowledge rows, whose objects are
    literals by design).  Predicates become `<base>pred/<pred>` —
    ``rel:``/``sdo:`` prefixes are legal IRI path characters, no
    re-encoding needed.  Narrow projection only; write order carries no
    meaning in N-Triples, so the sink needs no sort.
    """
    subj = F.concat(F.lit(f"<{base_iri}entity/"), F.col("subj_id").cast("string"), F.lit(">"))
    pred = F.concat(F.lit(f"<{base_iri}pred/"), F.col("pred"), F.lit(">"))
    obj = F.when(
        F.col("obj_id").isNotNull(),
        F.concat(F.lit(f"<{base_iri}entity/"), F.col("obj_id").cast("string"), F.lit(">")),
    ).otherwise(F.concat(F.lit('"'), _nt_escape(F.col("obj_text")), F.lit('"')))
    return edges.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("line")
    )


def write_ntriples(edges: DataFrame, out_dir: str, base_iri: str = _NT_BASE) -> None:
    """Materialize the edges table as N-Triples text part-files."""
    ntriples_lines(edges, base_iri).write.mode("overwrite").text(out_dir)


def _nt_unescape(col) -> "F.Column":
    """Inverse of _nt_escape.  Escape sequences are processed via a
    placeholder round-trip so an unescaped ``\\\\n`` does NOT turn into a
    newline: ``\\\\`` is parked on a \\x00 sentinel first (never present
    in N-Triples source — the grammar forbids raw control characters),
    the single-char escapes decode, then the sentinel restores the
    literal backslash."""
    out = F.regexp_replace(col, r"\\\\", "\x00")
    out = F.regexp_replace(out, r'\\"', '"')
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\t", "\t")
    return F.regexp_replace(out, "\x00", r"\\")


def read_ntriples(spark, path: str, base_iri: str = _NT_BASE) -> DataFrame:
    """Load N-Triples text back into edge rows: (subj_id, pred, obj_id,
    obj_text) — the inverse of :func:`write_ntriples` for lines written
    with the same ``base_iri`` (entity/pred IRIs under it parse back to
    ids; literal objects unescape into ``obj_text`` with ``obj_id``
    null).  One narrow regexp projection over a text scan — the same
    scale shape as any line-format ingest; lines that do not match the
    writer's shape (comments, blank lines, foreign IRIs) are dropped."""
    ent = F.lit(f"<{base_iri}entity/")
    pred_p = f"^<{base_iri}entity/(-?\\d+)> <{base_iri}pred/([^>]+)> (.+) \\.$"
    df = spark.read.text(path)
    m = df.select(
        F.regexp_extract("value", pred_p, 1).alias("s"),
        F.regexp_extract("value", pred_p, 2).alias("pred"),
        F.regexp_extract("value", pred_p, 3).alias("obj"),
    ).filter(F.col("s") != "")
    is_iri = F.col("obj").startswith(f"<{base_iri}entity/") & F.col("obj").endswith(">")
    obj_id = F.when(
        is_iri,
        F.regexp_extract("obj", f"^<{base_iri}entity/(-?\\d+)>$", 1).cast("long"),
    )
    is_lit = F.col("obj").startswith('"') & F.col("obj").endswith('"')
    obj_text = F.when(
        is_lit,
        _nt_unescape(F.expr("substring(obj, 2, length(obj) - 2)")),
    )
    return m.select(
        F.col("s").cast("long").alias("subj_id"),
        "pred",
        obj_id.alias("obj_id"),
        obj_text.alias("obj_text"),
    ).filter(F.col("obj_id").isNotNull() | F.col("obj_text").isNotNull())
