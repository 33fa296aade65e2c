"""KG constraint validation: type-signature mining, violation queue,
functional-predicate conflicts — each pinned against a pure-Python
oracle over the same rows, plus determinism under ties."""

from collections import defaultdict

import pytest

from kgce.operators import constraints

TRIPLES_SCHEMA = (
    "subj_text string, pred string, obj_text string, subj_type string, "
    "obj_type string, n_evidence long, confidence double"
)

ROWS = [
    # works_for: dominated by (per, org); one (loc, org) outlier
    ("Ada", "works_for", "Acme", "per", "org", 5, 0.9),
    ("Bob", "works_for", "Initech", "per", "org", 3, 0.8),
    ("Cara", "works_for", "Acme", "per", "org", 4, 0.7),
    ("Berlin", "works_for", "Acme", "loc", "org", 1, 0.4),
    # located_in: 50/50 split -> impure, never trusted at 0.8
    ("Acme", "located_in", "Berlin", "org", "loc", 2, 0.6),
    ("Ada", "located_in", "Berlin", "per", "loc", 2, 0.5),
    # born_on: functional; Ada asserts TWO dates, Bob one
    ("Ada", "born_on", "1815-12-10", "per", "literal", 4, 0.9),
    ("Ada", "born_on", "1816-01-01", "per", "literal", 2, 0.7),
    ("Bob", "born_on", "1900-01-01", "per", "literal", 1, 0.5),
    # capital_of: three-way object tie on confidence for Carol -> the
    # (confidence, n_evidence, obj_text) struct order must break it
    ("Carol", "capital_of", "X", "per", "loc", 1, 0.5),
    ("Carol", "capital_of", "Y", "per", "loc", 2, 0.5),
    ("Carol", "capital_of", "Z", "per", "loc", 2, 0.5),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(ROWS, TRIPLES_SCHEMA)


def _py_signatures(rows):
    w = defaultdict(lambda: defaultdict(int))
    n = defaultdict(int)
    for s, p, o, st, ot, ev, c in rows:
        w[p][(st, ot)] += ev
        n[p] += 1
    out = {}
    for p, sigs in w.items():
        total = sum(sigs.values())
        best = min(sigs.items(), key=lambda kv: (-kv[1], kv[0]))
        out[p] = (best[0][0], best[0][1], n[p], best[1], best[1] / total)
    return out


def test_predicate_signatures_match_python_oracle(spark, triples):
    got = {
        r.pred: (r.sig_subj_type, r.sig_obj_type, r.n_triples, r.n_signature,
                 r.purity)
        for r in constraints.predicate_signatures(triples).collect()
    }
    want = _py_signatures(ROWS)
    assert set(got) == set(want)
    for p in want:
        assert got[p][:4] == want[p][:4], p
        assert abs(got[p][4] - want[p][4]) < 1e-12, p
    # works_for: 12/13 evidence is (per, org)
    assert got["works_for"][:2] == ("per", "org")
    assert abs(got["works_for"][4] - 12 / 13) < 1e-12
    # located_in is a 50/50 tie: lexicographically smallest types win
    assert got["located_in"][:2] == ("org", "loc")
    assert abs(got["located_in"][4] - 0.5) < 1e-12


def test_signature_violations_gate_on_purity(spark, triples):
    sigs = constraints.predicate_signatures(triples)
    v = constraints.signature_violations(triples, sigs, min_purity=0.8)
    rows = {(r.subj_text, r.pred) for r in v.collect()}
    # the (loc, org) works_for outlier is flagged (purity 12/13 >= .8)
    assert ("Berlin", "works_for") in rows
    # located_in (purity .5) is never trusted -> neither row flagged
    assert not any(p == "located_in" for _, p in rows)
    # conforming triples are not flagged
    assert ("Ada", "works_for") not in rows
    # born_on is 100% pure -> no violations
    assert not any(p == "born_on" for _, p in rows)


def test_functional_conflicts_rank_and_tiebreak(spark, triples):
    out = {
        (r.pred, r.subj_text): r
        for r in constraints.functional_conflicts(
            triples, ["born_on", "capital_of"]
        ).collect()
    }
    # Bob asserts one date -> not a conflict
    assert ("born_on", "Bob") not in out
    ada = out[("born_on", "Ada")]
    assert ada.n_objects == 2 and ada.total_evidence == 6
    assert (ada.best_obj, ada.best_confidence) == ("1815-12-10", 0.9)
    assert (ada.runner_up_obj, ada.runner_up_confidence) == ("1816-01-01", 0.7)
    # Carol: all confidences tie at 0.5 -> n_evidence breaks (Y,Z over X),
    # then obj_text desc within (2, 0.5): Z wins, Y is runner-up
    carol = out[("capital_of", "Carol")]
    assert carol.n_objects == 3 and carol.best_obj == "Z"
    assert carol.runner_up_obj == "Y"
    # works_for was not declared functional -> absent even though Ada/Bob
    # have single objects and Acme has two subjects
    assert not any(p == "works_for" for p, _ in out)


def test_constraints_on_pipeline_output(spark):
    """The operators compose with the real pipeline's aggregate schema
    (canonical_triples column superset)."""
    from kgce import pipeline, schemas, synth

    pages = spark.createDataFrame(synth.gen_pages(30, seed=91), schema=schemas.PAGES)
    trips = pipeline.run(pages)["triples"]
    sigs = constraints.predicate_signatures(trips)
    assert sigs.count() > 0
    # the rule tagger's predicates are typed by construction
    # (pred = rel:<subj_type>_<obj_type>), so every signature is 100% pure
    # and the violation queue is empty — a real invariant of the tagger
    assert all(abs(r.purity - 1.0) < 1e-12 for r in sigs.collect())
    assert constraints.signature_violations(trips, sigs, 0.99).count() == 0


def _py_profile(rows, thresh=0.95):
    facts = {(r[0], r[1], r[2]) for r in rows}
    per = defaultdict(lambda: (set(), set(), 0))
    agg = defaultdict(set)
    for s, p, o in facts:
        agg[p].add((s, o))
    out = {}
    for p, pairs in agg.items():
        n = len(pairs)
        ns = len({s for s, _ in pairs})
        no = len({o for _, o in pairs})
        out[p] = (n, ns, no, ns / n, no / n, ns / n >= thresh)
    return out


def test_predicate_profile_matches_oracle(spark, triples):
    got = {
        r.pred: (
            r.n_triples, r.n_subjects, r.n_objects,
            r.functionality, r.inv_functionality, r.is_functional,
        )
        for r in constraints.predicate_profile(triples).collect()
    }
    assert got == _py_profile([tuple(r) for r in triples.collect()])
    # born_on: Ada has two dates -> functionality 2/3 < 0.95
    assert got["born_on"][5] is False
    # works_for: 4 subjects, 4 distinct facts -> functional
    assert got["works_for"][3] == 1.0 and got["works_for"][5] is True


def test_mined_functional_conflicts_need_no_declaration(spark, triples):
    # lower the threshold so born_on (2/3 functionality) qualifies and
    # its Ada conflict surfaces WITHOUT a declared predicate list
    mined = constraints.mined_functional_conflicts(
        triples, functional_threshold=0.6, min_triples=2
    ).collect()
    declared = constraints.functional_conflicts(
        triples,
        [
            r.pred
            for r in constraints.predicate_profile(
                triples, functional_threshold=0.6
            ).filter("is_functional and n_triples >= 2").collect()
        ],
    ).collect()
    key = lambda r: (r.pred, r.subj_text, r.best_obj, r.runner_up_obj)  # noqa: E731
    assert sorted(map(key, mined)) == sorted(map(key, declared))
    assert any(r.pred == "born_on" and r.subj_text == "Ada" for r in mined)
    # at the default 0.95 threshold born_on is NOT functional -> empty
    # conflict queue (and the empty-list branch returns a typed empty DF)
    assert constraints.mined_functional_conflicts(triples).count() == 0
