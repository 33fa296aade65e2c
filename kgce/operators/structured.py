"""Structured-data triple extraction: schema.org JSON-LD blocks -> KG
triples.

Real web pages carry DECLARED knowledge next to their prose: schema.org
JSON-LD islands (`<script type="application/ld+json">`) annotate ~40%
of the crawlable web (products, people, orgs, articles).  A web-scale
KG pipeline that only reads body text throws that away; this module
extracts it as first-class triples that union with the text-derived
ones.  The reference engine (ClinicalTransformerNER) has no counterpart
— beyond-reference web tooling per the task brief, same stance as
urlnorm/links/domains.

Scale shape — the whole path is a NARROW scan-shaped projection until
the optional final aggregation:

* ``jsonld_blocks`` is regexp_extract_all over ``html`` + one
  posexplode: per-split parallel, no shuffle, no Python.
* ``jsonld_triples`` is pure JVM column algebra: bounded item expansion
  (top-level arrays / ``@graph``), ``get_json_object`` per (item,
  predicate) with literal paths, one explode of the per-item predicate
  array.  A page's html is dropped before the explode so the fat
  column never rides through it.
* ``aggregate_structured_triples`` is one partial-agg groupBy on the
  triple key — the same exchange shape as triples.aggregate_triples,
  so its output MERGES into the edges table via
  plans.materialize.merge_aggregated_triples unchanged.

Cross-engine contract (pinned by the DuckDB twin in
tests/test_structured.py): extraction emits only SCALAR leaves —
string/number/bool values decode identically in Spark's
``get_json_object`` and DuckDB's ``json_extract_string``, while
object/array leaves re-serialize with engine-specific formatting, so
any value still starting with ``{``/``[`` after the coalesce fallbacks
is dropped on BOTH sides.  Invalid JSON yields NULL on the Spark side
and is pre-filtered with ``json_valid`` on the DuckDB side — same
surviving rows.

Honest limits (documented, not hidden): item expansion is bounded at
``max_items`` per block (top-level array or ``@graph`` — crawl JSON-LD
beyond 8 entities per island is rare; raise the bound if your corpus
differs); predicate vocabulary is CLOSED (``DEFAULT_PREDICATES`` — the
schema.org core; pass your own).  Open-vocabulary extraction needs
per-key JSON walking (Spark VARIANT + a key explode), which gives up
the literal-path twin; the closed form is the oracle-reproducible
baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the schema.org core predicate set: flat-or-nested coalesce handles
# `"author": "Ada"`, `"author": {"name": "Ada"}` and
# `"author": [{"name": "Ada"}, ...]` uniformly.
DEFAULT_PREDICATES = (
    "url",
    "sameAs",
    "author",
    "publisher",
    "worksFor",
    "jobTitle",
    "headline",
    "datePublished",
    "telephone",
    "email",
    "address",
    "brand",
    "location",
)

_BLOCK_RE = r"(?is)<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script>"


def jsonld_blocks(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """pages -> (url, block_idx, block): one row per JSON-LD script
    island, trimmed.  Narrow: regexp_extract_all + posexplode, html
    dropped before the explode."""
    blocks = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(_BLOCK_RE), F.lit(1)
    )
    # build the (url, blocks-array) projection FIRST so the fat html
    # column never enters the generator.  posexplode_OUTER: the inner
    # form makes Catalyst synthesize a `size(_blocks) > 0` guard and
    # push it below any upstream exchange — re-running the whole html
    # regexp once per row on the PRE-repartition split (the filter-
    # pushdown re-substitution trap, CLAUDE.md).  Outer generation
    # emits a null block for block-less pages instead; the downstream
    # null-subject filter drops them with no extra scan work.
    slim = pages.select(F.col(url_col).alias("url"), blocks.alias("_blocks"))
    return (
        slim.select("url", F.posexplode_outer("_blocks").alias("block_idx", "block"))
        .withColumn("block", F.trim("block"))
    )


def _gjo(col: Column, path: str) -> Column:
    return F.get_json_object(col, path)


def _obj_expr(item: Column, pred: str) -> Column:
    """Scalar leaf for ``pred``: nested name -> first-element name ->
    first element -> flat value; structured leftovers are filtered by
    the caller (cross-engine contract in the module docstring)."""
    return F.coalesce(
        _gjo(item, f"$.{pred}.name"),
        _gjo(item, f"$.{pred}[0].name"),
        _gjo(item, f"$.{pred}[0]"),
        _gjo(item, f"$.{pred}"),
    )


def jsonld_triples(
    blocks: DataFrame,
    predicates: tuple[str, ...] = DEFAULT_PREDICATES,
    max_items: int = 8,
) -> DataFrame:
    """(url, block_idx, block) -> (url, subj_text, subj_type, pred,
    obj_text): one row per declared scalar property.

    Subject = ``$.name`` (fallback ``$.@id``); subject type =
    lowercased ``$.@type`` (fallback ``thing``).  Blocks that are
    top-level arrays or carry ``@graph`` expand to their first
    ``max_items`` entities (bounded by design; see module docstring).
    Predicates are namespaced ``sdo:<key>``.
    """
    b = F.col("block")
    graph = _gjo(b, "$['@graph']")
    # pre-project the @graph-or-block base into a real column: generator
    # arguments are not alias-substituted (unlike pushed filters), so
    # this computes the @graph extraction ONCE per row instead of once
    # per expanded index
    based = blocks.withColumn(
        "_base", F.when(graph.isNotNull(), F.trim(graph)).otherwise(b)
    )
    base = F.col("_base")
    items = F.when(
        base.startswith("["),
        F.array(*[_gjo(base, f"$[{i}]") for i in range(max_items)]),
    ).otherwise(F.array(base))
    it = (
        based.select("url", "block_idx", F.posexplode(items).alias("item_idx", "item"))
        .filter(F.col("item").isNotNull())
    )
    item = F.col("item")
    subj = F.coalesce(_gjo(item, "$.name"), _gjo(item, "$['@id']"))
    styp = F.lower(F.coalesce(_gjo(item, "$['@type']"), F.lit("thing")))
    preds = F.array(
        *[
            F.struct(
                F.lit(f"sdo:{p}").alias("pred"),
                _obj_expr(item, p).alias("obj_text"),
            )
            for p in predicates
        ]
    )
    out = (
        it.select(
            "url",
            subj.alias("subj_text"),
            styp.alias("subj_type"),
            F.explode(preds).alias("_po"),
        )
        .select("url", "subj_text", "subj_type", "_po.pred", "_po.obj_text")
        .filter(
            F.col("subj_text").isNotNull()
            & F.col("obj_text").isNotNull()
            & ~F.col("subj_text").startswith("{")
            & ~F.col("subj_text").startswith("[")
            & ~F.col("obj_text").startswith("{")
            & ~F.col("obj_text").startswith("[")
        )
    )
    return out


def extract_structured_triples(
    pages: DataFrame,
    predicates: tuple[str, ...] = DEFAULT_PREDICATES,
    max_items: int = 8,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """pages -> per-page declared triples (composition of
    :func:`jsonld_blocks` + :func:`jsonld_triples`)."""
    return jsonld_triples(
        jsonld_blocks(pages, html_col=html_col, url_col=url_col),
        predicates=predicates,
        max_items=max_items,
    )


def aggregate_structured_triples_with_evidence(st: DataFrame, k: int) -> DataFrame:
    """:func:`aggregate_structured_triples` + bounded top-``k``
    ``evidence`` (url, confidence) structs — the schema the streaming
    merge's provenance rollup consumes
    (plans.materialize._rollup_with_evidence).  Declared confidence is
    constant 1.0, so the text path's (confidence desc, url asc) rank
    reduces to url asc; ``array_sort`` over the structs sorts by url
    first, preserving that contract."""
    from pyspark.sql import Window

    keys = ["subj_text", "pred", "obj_text", "subj_type"]
    w = Window.partitionBy(*keys).orderBy("url")
    return (
        st.withColumn("_rk", F.row_number().over(w))
        .groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("n_evidence"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_rk") <= k,
                        F.struct(
                            F.col("url").alias("url"),
                            F.lit(1.0).alias("confidence"),
                        ),
                    )
                )
            ).alias("evidence"),
        )
        .select(
            *keys,
            F.lit("literal").alias("obj_type"),
            "n_evidence",
            F.lit(1.0).alias("confidence"),
            "evidence",
        )
    )


def aggregate_structured_triples(st: DataFrame) -> DataFrame:
    """Per-page declared triples -> the edges-source aggregate schema
    (subj_text, pred, obj_text, subj_type, obj_type, n_evidence,
    confidence), union- and merge-compatible with the text-triple
    aggregates (triples.aggregate_triples /
    plans.materialize.merge_aggregated_triples).

    ``obj_type`` is ``literal`` (declared values are strings, not
    linked mentions) and ``confidence`` is 1.0 — the page AUTHOR
    asserted the triple; there is no extraction uncertainty to score.
    ``n_evidence`` counts asserting pages, same as the text path.
    """
    return st.groupBy("subj_text", "pred", "obj_text", "subj_type").agg(
        F.count("*").cast("long").alias("n_evidence"),
    ).select(
        "subj_text",
        "pred",
        "obj_text",
        "subj_type",
        F.lit("literal").alias("obj_type"),
        "n_evidence",
        F.lit(1.0).alias("confidence"),
    )
