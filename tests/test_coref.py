"""Intra-document alias resolution (kgce/operators/coref.py) vs exact
pure-Python oracles, plus the composed canonicalization merge."""

from __future__ import annotations

import re
from collections import defaultdict

from pyspark.sql import functions as F

from kgce.operators import coref, linking


def _norm(s):
    return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()


# ---------------------------------------------------------------- acronyms


def _acronym_oracle(rows):
    out = []
    for url, text in rows:
        for long_form, acro in re.findall(coref.ACRONYM_PATTERN, text):
            words = long_form.split(" ")
            k = len(acro)
            if len(words) < k:
                continue
            tail = words[-k:]
            if "".join(w[0] for w in tail) == acro:
                out.append((url, " ".join(tail), acro))
    return sorted(out)


def test_acronym_definitions_match_re_oracle(spark):
    rows = [
        ("u1", "The World Health Organization (WHO) said that the United "
               "Nations (UN) and New York (USA) disagree."),
        ("u2", "European Space Agency (ESA) launches; also see Inter "
               "Continental Ballistic Missile (ICBM) and plain (AB) text."),
        ("u3", "No definitions here, just (LOUD) noise and One (O) char."),
        ("u4", "Nested Deep Learning Model (DLM) then Deep Learning (DL)."),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = sorted(
        (r.url, r.long_form, r.acronym)
        for r in coref.acronym_definitions(df).collect()
    )
    want = _acronym_oracle(rows)
    assert got == want
    assert ("u1", "World Health Organization", "WHO") in got
    assert all(a != "USA" for _, _, a in got)  # initials mismatch rejected


# ----------------------------------------------------------- suffix aliases


def _mentions(spark, rows):
    # rows: (url, text, type)
    return spark.createDataFrame(
        [(u, i, i, t, 0, len(t), ty) for i, (u, t, ty) in enumerate(rows)],
        "url string, sent_id long, mention_id long, text string, "
        "start long, end long, type string",
    )


def _suffix_oracle(rows, min_len=4, match_type=True):
    per_doc = defaultdict(set)
    for u, t, ty in rows:
        per_doc[u].add((_norm(t), ty))
    out = set()
    for u, surfaces in per_doc.items():
        for full, fty in surfaces:
            toks = full.split(" ")
            if len(toks) < 2:
                continue
            for alias, aty in surfaces:
                if " " in alias or len(alias) < min_len:
                    continue
                if match_type and aty != fty:
                    continue
                if toks[-1] == alias:
                    out.add((u, fty, alias, full))
    return out


def test_suffix_alias_pairs_both_type_modes(spark):
    rows = [
        ("d1", "Barack Obama", "per"), ("d1", "Obama", "per"),
        ("d1", "Obama", "org"),                  # cross-type single
        ("d1", "Michelle Obama", "per"),         # second full form, same alias
        ("d2", "Barack Obama", "per"),           # alias absent in this doc
        ("d2", "Kofi Annan", "per"), ("d2", "Annan", "per"),
        ("d3", "Deep Blue", "misc"), ("d3", "Blue", "misc"),
        ("d3", "Ann", "per"), ("d3", "Mary Ann", "per"),  # too short
    ]
    for match_type in (True, False):
        got = {
            (r.url, r.type, r.alias_norm, r.full_norm)
            for r in coref.suffix_alias_pairs(
                _mentions(spark, rows), match_type=match_type
            ).collect()
        }
        assert got == _suffix_oracle(rows, match_type=match_type), match_type
    typed = _suffix_oracle(rows, match_type=True)
    assert ("d1", "per", "obama", "barack obama") in typed
    assert ("d2", "per", "obama", "barack obama") not in typed


# ------------------------------------------------- composed canonicalization


def test_alias_edges_min_docs_gate(spark):
    rows = [
        ("d1", "Barack Obama", "per"), ("d1", "Obama", "per"),
        ("d2", "Barack Obama", "per"), ("d2", "Obama", "per"),
        ("d3", "Deep Blue", "misc"), ("d3", "Blue", "misc"),
    ]
    m = _mentions(spark, rows)
    e1 = {
        (r.a, r.b): r.n_docs for r in coref.alias_edges(m, min_docs=2).collect()
    }
    # only the 2-doc pair survives; keys are the linking key space
    obama = (
        m.sparkSession.createDataFrame([("obama",), ("barack obama",)], "n string")
        .select(F.xxhash64("n").alias("k")).collect()
    )
    assert e1 == {(obama[0].k, obama[1].k): 2}
    assert len(coref.alias_edges(m, min_docs=1).collect()) == 2


def test_canonicalize_with_aliases_merges_structural_and_fuzzy(spark):
    # pages give the acronym definition; mentions give the suffix pair;
    # LSH alone merges NONE of these surfaces (zero shingle overlap
    # between 'un' and 'united nations')
    pages = spark.createDataFrame(
        [("p1", "The United Nations (UN) met."), ("p2", "The UN met again.")],
        "url string, text string",
    )
    rows = [
        ("p1", "United Nations", "org"), ("p1", "UN", "org"),
        ("p2", "UN", "org"),
        ("p1", "Barack Obama", "per"), ("p1", "Obama", "per"),
        ("p2", "Angela Merkel", "per"),  # untouched singleton
    ]
    m = _mentions(spark, rows)
    base = {
        r.norm: r.canonical_id
        for r in linking.canonicalize(m, threshold=0.6).collect()
    }
    assert base["un"] != base["united nations"]  # LSH alone cannot merge
    got = {
        r.norm: r.canonical_id
        for r in coref.canonicalize_with_aliases(m, pages, min_docs=1).collect()
    }
    assert got["un"] == got["united nations"]
    assert got["obama"] == got["barack obama"]
    assert got["angela merkel"] not in (got["un"], got["obama"])
    # same output contract as linking.canonicalize
    assert set(got) == set(base)


def test_pipeline_composes_alias_canonicalization(spark):
    from kgce import pipeline, schemas

    # note the tagger sessionizes adjacent capitalized tokens, so the
    # definition site itself yields the glued surface "united nations un"
    # — the alias merge needs the bare long form mentioned elsewhere,
    # which is how the idiom appears in real prose anyway
    texts = [
        "Barack Obama visited Geneva and later Obama spoke.",
        "United Nations (UN) met. People praised the United Nations"
        " today and the UN agreed.",
    ]
    pages = spark.createDataFrame(
        [(f"http://a{i}.example/", None, None, t, "en") for i, t in enumerate(texts)],
        schema=schemas.PAGES,
    )
    out = pipeline.run(pages, aliases={"min_docs": 1, "match_type": False})
    nodes = {
        r.canonical_text: set(r.aliases) for r in out["nodes"].collect()
    }
    # suffix alias and acronym alias each fold into one node
    assert {"barack obama", "obama"} <= nodes["barack obama"]
    assert {"un", "united nations"} <= nodes["un"]
    # and the baseline (no aliases) keeps them apart
    base = pipeline.run(pages)
    base_nodes = {r.canonical_text for r in base["nodes"].collect()}
    assert {"barack obama", "obama"} <= base_nodes


def _sense_oracle(rows):
    """One-sense-per-shared-collocate partition per surface: docs of a
    surface grouped by transitive shared-collocate connectivity."""
    per_doc = defaultdict(set)
    for u, t, _ty in rows:
        per_doc[u].add(_norm(t))
    surfaces = set().union(*per_doc.values()) if per_doc else set()
    out = {}
    for s in surfaces:
        docs = [u for u, ns in per_doc.items() if s in ns]
        parent = {u: u for u in docs}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        by_ctx = defaultdict(list)
        for u in docs:
            for ctx in per_doc[u] - {s}:
                by_ctx[ctx].append(u)
        for us in by_ctx.values():
            for u in us[1:]:
                ra, rb = find(us[0]), find(u)
                if ra != rb:
                    parent[rb] = ra
        groups = defaultdict(set)
        for u in docs:
            groups[find(u)].add(u)
        out[s] = {frozenset(g) for g in groups.values()}
    return out


def test_sense_split_partitions_match_union_find(spark):
    rows = [
        # 'paris' sense 1: travel docs (shared collocate 'france')
        ("t1", "Paris", "loc"), ("t1", "France", "loc"),
        ("t2", "Paris", "loc"), ("t2", "France", "loc"), ("t2", "Lyon", "loc"),
        # transitive: t3 shares 'lyon' with t2 only
        ("t3", "Paris", "loc"), ("t3", "Lyon", "loc"),
        # 'paris' sense 2: celebrity docs
        ("c1", "Paris", "per"), ("c1", "Hilton", "per"),
        ("c2", "Paris", "per"), ("c2", "Hilton", "per"),
        # isolated: a doc where paris has no collocates at all
        ("i1", "Paris", "loc"),
        # unambiguous surface: 'france' docs all share 'paris'
    ]
    df = _mentions(spark, rows)
    got_rows = coref.sense_split(df).collect()
    got = defaultdict(lambda: defaultdict(set))
    for r in got_rows:
        got[r.norm][r.sense_id].add(r.url)
    got_partitions = {s: {frozenset(g) for g in m.values()} for s, m in got.items()}
    assert got_partitions == _sense_oracle(rows)
    paris = got_partitions["paris"]
    assert frozenset({"t1", "t2", "t3"}) in paris   # transitive merge
    assert frozenset({"c1", "c2"}) in paris         # separate sense
    assert frozenset({"i1"}) in paris               # isolated own sense
    assert len(paris) == 3


def test_run_checkpointed_alias_and_infer_options(spark, tmp_path):
    from kgce import pipeline, schemas

    texts = [
        "Barack Obama visited Geneva and later Obama spoke.",
        "United Nations (UN) met. People praised the United Nations"
        " today and the UN agreed.",
    ]
    pages = spark.createDataFrame(
        [(f"http://a{i}.example/", None, None, t, "en") for i, t in enumerate(texts)],
        schema=schemas.PAGES,
    )
    wd = str(tmp_path / "ck")
    out = pipeline.run_checkpointed(
        pages,
        wd,
        n_buckets=2,
        aliases={"min_docs": 1, "match_type": False},
        infer={"min_support": 1, "min_pca_confidence": 0.5},
    )
    nodes = {r.canonical_text: set(r.aliases) for r in out["nodes"].collect()}
    assert {"barack obama", "obama"} <= nodes["barack obama"]
    assert {"un", "united nations"} <= nodes["un"]
    assert "inferred" in out and "rules" in out
    inferred1 = {
        (r.subj_id, r.pred, r.obj_id) for r in out["inferred"].collect()
    }
    # resume: a second run reuses the cached alias-aware canon stage and
    # reproduces the same outputs byte-for-byte
    out2 = pipeline.run_checkpointed(
        pages,
        wd,
        n_buckets=2,
        aliases={"min_docs": 1, "match_type": False},
        infer={"min_support": 1, "min_pca_confidence": 0.5},
    )
    nodes2 = {r.canonical_text: set(r.aliases) for r in out2["nodes"].collect()}
    assert nodes2 == nodes
    assert {
        (r.subj_id, r.pred, r.obj_id) for r in out2["inferred"].collect()
    } == inferred1
