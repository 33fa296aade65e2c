"""Relational (window-based) mention decode over whole documents.

The deterministic rule tagger (kgce.oracle.rule_tag_sentence) is
SQL-expressible by construction, so the full decode — tokenize →
entity-type per token → maximal-run sessionization (W2) → one mention per
run typed by its first token — can run as pure DataFrame ops AND as ANSI
SQL in DuckDB.  This is the oracle-checked twin of the fused
mapInPandas path in kgce.tagging (equivalence tested in pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import core_token, rule_type

# DuckDB (RE2) twin of functions.EDGE_PUNCT_CLASS; SQL-quoted ('' = ').
_EDGE_SQL = "[.,;:!?\"''()\\[\\]{}<>]"

def core_tok_sql(tok: str) -> str:
    """DuckDB expression: EDGE_PUNCT-stripped core of ``tok``, falling
    back to the raw token when the core is empty (pure punctuation —
    never an entity either way, but the fallback keeps the surface
    column aligned with the Spark side)."""
    return (
        f"coalesce(nullif(regexp_replace(regexp_replace({tok}, "
        f"'^{_EDGE_SQL}+', '', 'g'), '{_EDGE_SQL}+$', '', 'g'), ''), {tok})"
    )


def tokens_with_pos(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens with 1-based split positions; the emitted ``tok``
    is the EDGE_PUNCT-stripped core (raw token when the core is empty),
    so downstream typing, length guards and mention surfaces all see
    "Geneva" for "Geneva." — matching oracle.core_token_offsets."""
    toks = F.split(F.col(text_col), r"\s+")
    raw = (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "tok"))
        .withColumn("pos", F.col("pos") + 1)  # 1-based, matching SQL generate_subscripts
        .filter(F.col("tok") != "")
    )
    core = core_token(F.col("tok"))
    return raw.withColumn("tok", F.when(core == "", F.col("tok")).otherwise(core))


def document_mentions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_len: int = 0,
) -> DataFrame:
    """Maximal capitalized-token runs -> (doc_id, tok_s, n_toks,
    mention_text, mtype).  ``min_token_len`` > 0 gives the stricter
    variant tagger used as the 'prediction' side in eval-join queries.
    """
    t = tokens_with_pos(docs, id_col, text_col)
    ent = rule_type(F.col("tok"))
    if min_token_len:
        ent = F.when(F.length("tok") > min_token_len, ent)
    t = t.withColumn("ent", ent)
    w = Window.partitionBy("doc_id").orderBy("pos")
    opens = F.col("ent").isNotNull() & F.lag("ent").over(w).isNull()
    runs = t.withColumn("_open", opens.cast("int")).withColumn(
        "run_id",
        F.sum("_open").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        runs.filter(F.col("ent").isNotNull())
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("pos").alias("tok_s"),
            F.count("*").alias("n_toks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x["tok"]
                ),
                " ",
            ).alias("mention_text"),
            F.min_by("ent", "pos").alias("mtype"),
        )
        .drop("run_id")
    )


# The matching DuckDB CTE, parameterized by the same min-token-len knob.
# (lag(ent) is NULL ⟺ previous token absent or not an entity — the open
# condition — identical to the Spark window above.)
def mentions_sql(min_token_len: int = 0, table: str = "documents") -> str:
    from ..oracle import RULE_LEXICON

    lex = ", ".join(f"'{w}'" for w in sorted(RULE_LEXICON))
    guard = f"AND length(tok) > {min_token_len}" if min_token_len else ""
    core = core_tok_sql("tok")
    return f"""
    WITH raw_toks AS (
      SELECT doc_id,
             unnest(string_split_regex(text, '\\s+')) AS tok,
             generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
      FROM {table}
    ), toks AS (
      SELECT doc_id, pos, {core} AS tok FROM raw_toks WHERE tok <> ''
    ), typed AS (
      SELECT doc_id, pos, tok,
        CASE WHEN (regexp_full_match(tok, '[A-Z][a-zA-Z]*') OR tok IN ({lex})) {guard} THEN
          CASE WHEN lower(substr(tok,1,1)) <= 'f' THEN 'per'
               WHEN lower(substr(tok,1,1)) <= 'm' THEN 'loc'
               WHEN lower(substr(tok,1,1)) <= 's' THEN 'org'
               ELSE 'misc' END
        END AS ent
      FROM toks WHERE tok <> ''
    ), flagged AS (
      SELECT *, CASE WHEN ent IS NOT NULL
                      AND lag(ent) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                     THEN 1 ELSE 0 END AS opens
      FROM typed
    ), runs AS (
      SELECT *, sum(opens) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS run_id
      FROM flagged
    )
    SELECT doc_id, min(pos) AS tok_s, count(*) AS n_toks,
           string_agg(tok, ' ' ORDER BY pos) AS mention_text,
           min_by(ent, pos) AS mtype
    FROM runs WHERE ent IS NOT NULL
    GROUP BY doc_id, run_id
    """
