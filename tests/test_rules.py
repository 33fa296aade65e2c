"""AMIE-style rule mining (kgce/operators/rules.py) and label-propagation
communities (kgce/operators/graph.py) vs exact pure-Python oracles."""

from __future__ import annotations

import itertools
import random
from collections import Counter, defaultdict

import pytest

from kgce.operators import graph, rules

# ---------------------------------------------------------------- oracles


def _chain_rules_oracle(
    facts, min_support, min_confidence, cap, pca_direction="subject"
):
    """Nested-loop AMIE chain mining with the (z, pred) degree cap."""
    facts = sorted(set(facts))
    in_fan = Counter((o, p) for s, p, o in facts)
    out_fan = Counter((s, p) for s, p, o in facts)
    left = [(s, p, o) for s, p, o in facts if in_fan[(o, p)] <= cap]
    right = [(s, p, o) for s, p, o in facts if out_fan[(s, p)] <= cap]
    body = set()
    for x, p1, z in left:
        for z2, p2, y in right:
            if z == z2:
                body.add((p1, p2, x, y))
    body_count = Counter((p1, p2) for p1, p2, _, _ in body)
    head_pairs = defaultdict(set)
    head_subjects = defaultdict(set)
    head_objects = defaultdict(set)
    for s, p, o in facts:
        head_pairs[p].add((s, o))
        head_subjects[p].add(s)
        head_objects[p].add(o)
    subj_side = {
        p: len(head_subjects[p]) >= len(head_objects[p]) for p in head_pairs
    }
    out = {}
    for (p1, p2, x, y), head in itertools.product(body, head_pairs):
        key = (p1, p2, head)
        sup, pca = out.get(key, (0, 0))
        if (x, y) in head_pairs[head]:
            sup += 1
        covered = (
            x in head_subjects[head]
            if (pca_direction == "subject" or subj_side[head])
            else y in head_objects[head]
        )
        if covered:
            pca += 1
        out[key] = (sup, pca)
    result = {}
    for (p1, p2, head), (sup, pca) in out.items():
        if sup < min_support:
            continue
        conf = sup / body_count[(p1, p2)]
        if conf < min_confidence:
            continue
        result[(p1, p2, head)] = (
            sup,
            body_count[(p1, p2)],
            len(head_pairs[head]),
            pca,
            conf,
            sup / len(head_pairs[head]),
            sup / pca,
        )
    return result


def _implication_oracle(facts, min_support, min_confidence):
    facts = sorted(set(facts))
    by_pair = defaultdict(set)
    sizes = Counter(p for _, p, _ in facts)
    for s, p, o in facts:
        by_pair[(s, o)].add(p)
    sup = Counter()
    for s, p1, o in facts:
        for head in by_pair[(s, o)]:
            if head != p1:
                sup[(p1, head, "fwd")] += 1
        for head in by_pair[(o, s)]:
            if head != p1:
                sup[(p1, head, "inv")] += 1
    result = {}
    for (p1, head, d), n in sup.items():
        if n < min_support:
            continue
        conf = n / sizes[p1]
        if conf < min_confidence:
            continue
        result[(p1, head, d)] = (n, sizes[p1], sizes[head], conf, n / sizes[head])
    return result


def _lpa_oracle(edges, iterations):
    """Synchronous LPA, plurality label, ties -> smallest label."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        new = {}
        for n in labels:
            counts = Counter(labels[m] for m in nbrs[n])
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        labels = new
    return labels


# ----------------------------------------------------------------- tests


def _kg(spark, facts):
    return spark.createDataFrame(
        [(s, p, o) for s, p, o in facts], "subj_id long, pred string, obj_id long"
    )


def _random_facts(seed, n_nodes=14, n_preds=4, n_facts=120):
    rng = random.Random(seed)
    return {
        (
            rng.randrange(n_nodes),
            f"p{rng.randrange(n_preds)}",
            rng.randrange(n_nodes),
        )
        for _ in range(n_facts)
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chain_rules_match_oracle(spark, seed):
    facts = _random_facts(seed)
    got = {
        (r.p1, r.p2, r.head): (
            r.support,
            r.body_count,
            r.head_size,
            r.pca_body_count,
            r.confidence,
            r.head_coverage,
            r.pca_confidence,
        )
        for r in rules.mine_chain_rules(
            _kg(spark, facts), min_support=2, max_mid_degree=1000
        ).collect()
    }
    want = _chain_rules_oracle(facts, 2, 0.0, 1000)
    assert got == want  # exact: integer counts, single IEEE divisions


def test_chain_rules_degree_cap_is_exact_group_drop(spark):
    # hub node 99: 5 in-edges via pa and 5 out-edges via pb -> with cap 4
    # BOTH groups drop and no rule survives through the hub; the
    # non-hub chain (1-2-3) is unaffected
    facts = (
        [(i, "pa", 99) for i in range(5)]
        + [(99, "pb", 10 + i) for i in range(5)]
        + [(1, "pc", 2), (2, "pd", 3), (1, "pe", 3), (4, "pc", 2)]
    )
    got = {
        (r.p1, r.p2, r.head): (r.support, r.body_count)
        for r in rules.mine_chain_rules(
            _kg(spark, facts), min_support=1, max_mid_degree=4
        ).collect()
    }
    want = {
        k: (v[0], v[1]) for k, v in _chain_rules_oracle(facts, 1, 0.0, 4).items()
    }
    assert got == want
    assert all(p1 != "pa" or p2 != "pb" for p1, p2, _ in got)
    assert ("pc", "pd", "pe") in got  # 1-[pc]->2-[pd]->3 with head 1-[pe]->3


def _infer_oracle(facts, min_pca, cap):
    mined = _chain_rules_oracle(facts, 1, 0.0, cap)
    rules = {
        k: v[6] for k, v in mined.items() if v[6] >= min_pca
    }  # (p1,p2,head) -> pca_confidence
    facts = sorted(set(facts))
    in_fan = Counter((o, p) for s, p, o in facts)
    out_fan = Counter((s, p) for s, p, o in facts)
    left = [(s, p, o) for s, p, o in facts if in_fan[(o, p)] <= cap]
    right = [(s, p, o) for s, p, o in facts if out_fan[(s, p)] <= cap]
    fact_set = set(facts)
    derived = defaultdict(set)  # (x, head, y) -> {(p1, p2)}
    conf = {}
    for x, p1, z in left:
        for z2, p2, y in right:
            if z != z2:
                continue
            for (rp1, rp2, head), pca in rules.items():
                if (rp1, rp2) != (p1, p2) or (x, head, y) in fact_set:
                    continue
                key = (x, head, y)
                derived[key].add((p1, p2))
                conf[key] = max(conf.get(key, 0.0), pca)
    return {k: (conf[k], len(v)) for k, v in derived.items()}


@pytest.mark.parametrize("seed", [0, 2])
def test_infer_chain_facts_match_oracle(spark, seed):
    facts = _random_facts(seed, n_nodes=10, n_preds=3, n_facts=70)
    df = _kg(spark, facts)
    mined = rules.mine_chain_rules(df, min_support=1, max_mid_degree=1000)
    got = {
        (r.subj_id, r.pred, r.obj_id): (r.confidence, r.n_rules)
        for r in rules.infer_chain_facts(
            df, mined, min_pca_confidence=0.5, max_mid_degree=1000
        ).collect()
    }
    assert got == _infer_oracle(facts, 0.5, 1000)
    # inferred facts are NEW by construction
    assert not {(s, p, o) for (s, p, o) in got} & facts


def test_infer_chain_facts_planted_completion(spark):
    # lives_in(x, city) ^ city_in(city, country) => citizen_of(x, country)
    # holds for 4/5 people; the 5th person's citizen_of edge is MISSING
    # and must be inferred with the rule's pca confidence
    facts = []
    for i in range(5):
        facts += [(i, "lives_in", 100), (100, "city_in", 200)]
        if i != 4:
            facts.append((i, "citizen_of", 200))
    df = _kg(spark, facts)
    mined = rules.mine_chain_rules(df, min_support=2)
    inferred = rules.infer_chain_facts(df, mined, min_pca_confidence=0.7).collect()
    assert [(r.subj_id, r.pred, r.obj_id) for r in inferred] == [(4, "citizen_of", 200)]
    # pca denominator counts only covered subjects (0..3), so pca = 4/4
    assert inferred[0].confidence == 1.0


@pytest.mark.parametrize("seed", [3, 4])
def test_implication_rules_match_oracle(spark, seed):
    facts = _random_facts(seed, n_nodes=10, n_preds=3, n_facts=90)
    got = {
        (r.p1, r.head, r.direction): (
            r.support,
            r.body_count,
            r.head_size,
            r.confidence,
            r.head_coverage,
        )
        for r in rules.mine_implication_rules(
            _kg(spark, facts), min_support=1
        ).collect()
    }
    assert got == _implication_oracle(facts, 1, 0.0)


def test_implication_detects_planted_synonym_and_inverse(spark):
    base = [(i, "born_in", 100 + i) for i in range(10)]
    syn = [(i, "birth_place", 100 + i) for i in range(8)]  # 8/10 overlap
    inv = [(100 + i, "birthplace_of", i) for i in range(6)]
    df = _kg(spark, base + syn + inv)
    got = {
        (r.p1, r.head, r.direction): r.confidence
        for r in rules.mine_implication_rules(df, min_support=2).collect()
    }
    assert got[("birth_place", "born_in", "fwd")] == 1.0
    assert got[("born_in", "birth_place", "fwd")] == 0.8
    assert got[("birthplace_of", "born_in", "inv")] == 1.0


@pytest.mark.parametrize("seed,iters", [(0, 1), (1, 3), (2, 5)])
def test_label_propagation_matches_sync_oracle(spark, seed, iters):
    rng = random.Random(seed)
    edges = {(rng.randrange(20), rng.randrange(20)) for _ in range(60)}
    df = spark.createDataFrame(list(edges), "a long, b long")
    got = {
        r.node: r.label
        for r in graph.label_propagation(df, iterations=iters).collect()
    }
    assert got == _lpa_oracle(edges, iters)


def test_label_propagation_two_cliques_separate(spark):
    # two 4-cliques joined by one bridge edge -> two communities
    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    df = spark.createDataFrame(cl1 + cl2 + [(3, 10)], "a long, b long")
    labels = {
        r.node: r.label for r in graph.label_propagation(df, iterations=5).collect()
    }
    assert len({labels[n] for n in range(4)}) == 1
    assert len({labels[n] for n in range(10, 14)}) == 1
    assert labels[0] != labels[10]


def _synonym_oracle(facts, min_support, min_confidence):
    """Bidirectional fwd implication pairs + union-find closure."""
    impl = _implication_oracle(facts, min_support, min_confidence)
    fwd = {(p1, h) for (p1, h, d) in impl if d == "fwd"}
    pairs = {(a, b) for (a, b) in fwd if (b, a) in fwd and a < b}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    mapping = {}
    for n in list(parent):
        r = find(n)
        if r != n:
            mapping[n] = r
    return pairs, mapping


def test_predicate_canonicalization_planted_chain(spark):
    # three surface forms of the same relation, plus an unrelated pred;
    # syn_a<->syn_b and syn_b<->syn_c are bidirectional at conf 1.0 but
    # syn_a<->syn_c only meet through the transitive closure
    pairs10 = [(i, 100 + i) for i in range(10)]
    facts = (
        [(s, "syn_a", o) for s, o in pairs10]
        + [(s, "syn_b", o) for s, o in pairs10]
        + [(s, "syn_c", o) for s, o in pairs10[:9] + [(50, 60)]]
        + [(s, "other", o + 1) for s, o in pairs10]
    )
    df = _kg(spark, facts)
    sp = {
        (r.a, r.b): r.min_confidence
        for r in rules.predicate_synonym_pairs(df, min_confidence=0.9).collect()
    }
    assert ("syn_a", "syn_b") in sp and sp[("syn_a", "syn_b")] == 1.0
    assert ("syn_b", "syn_c") in sp and sp[("syn_b", "syn_c")] == 0.9
    assert ("syn_a", "syn_c") in sp  # 9/10 both ways
    assert not any("other" in p for p in sp)
    cmap = {
        r.pred: r.canonical_pred
        for r in rules.predicate_canonical_map(
            rules.predicate_synonym_pairs(df, min_confidence=0.9)
        ).collect()
    }
    assert cmap == {"syn_b": "syn_a", "syn_c": "syn_a"}
    rewritten = rules.canonicalize_predicates(
        df, rules.predicate_canonical_map(rules.predicate_synonym_pairs(df, min_confidence=0.9))
    )
    got_preds = {r.pred for r in rewritten.select("pred").distinct().collect()}
    assert got_preds == {"syn_a", "other"}
    # row count preserved (rewrite only; caller re-aggregates)
    assert rewritten.count() == df.count()


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_predicate_canonical_map_matches_union_find(spark, seed):
    facts = _random_facts(seed, n_nodes=8, n_preds=6, n_facts=80)
    sp_df = rules.predicate_synonym_pairs(
        _kg(spark, facts), min_support=1, min_confidence=0.6
    )
    want_pairs, want_map = _synonym_oracle(facts, 1, 0.6)
    got_pairs = {(r.a, r.b) for r in sp_df.collect()}
    assert got_pairs == want_pairs
    got_map = {
        r.pred: r.canonical_pred
        for r in rules.predicate_canonical_map(sp_df).collect()
    }
    assert got_map == want_map


def _k_core_oracle(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg = Counter()
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        nxt = {(a, b) for a, b in und if deg[a] >= k and deg[b] >= k}
        if nxt == und:
            return und
        und = nxt


@pytest.mark.parametrize("seed,k", [(0, 2), (1, 3), (2, 2)])
def test_k_core_matches_peel_oracle(spark, seed, k):
    rng = random.Random(seed)
    edges = {(rng.randrange(15), rng.randrange(15)) for _ in range(40)}
    df = spark.createDataFrame(list(edges), "a long, b long")
    got = {(r.lo, r.hi) for r in graph.k_core(df, k).collect()}
    assert got == _k_core_oracle(edges, k)


def test_k_core_peels_cascading_chain(spark):
    # triangle core + a pendant chain that peels over SEVERAL rounds
    tri = [(0, 1), (1, 2), (0, 2)]
    chain = [(2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(tri + chain, "a long, b long")
    got = {(r.lo, r.hi) for r in graph.k_core(df, 2).collect()}
    assert got == {(0, 1), (1, 2), (0, 2)}
    assert graph.k_core(df, 3).count() == 0  # triangle is 2-core max


def test_new_operators_empty_inputs(spark):
    """Every round-5 operator degrades to an empty (or default) result on
    empty input instead of raising."""
    from kgce.operators import coref, linking, robots

    empty_kg = spark.createDataFrame([], "subj_id long, pred string, obj_id long")
    assert rules.mine_chain_rules(empty_kg).count() == 0
    assert rules.mine_implication_rules(empty_kg).count() == 0
    assert rules.predicate_synonym_pairs(empty_kg).count() == 0

    empty_edges = spark.createDataFrame([], "a long, b long")
    assert graph.label_propagation(empty_edges, iterations=2).count() == 0
    assert graph.k_core(empty_edges, 2).count() == 0

    empty_mentions = spark.createDataFrame(
        [],
        "url string, sent_id long, mention_id long, text string, "
        "start long, end long, type string",
    )
    assert coref.suffix_alias_pairs(empty_mentions).count() == 0
    assert coref.sense_split(empty_mentions).count() == 0
    bq = linking.blocking_quality(empty_mentions).collect()[0]
    assert bq.n_sampled == 0 and bq.pair_completeness == 1.0

    empty_robots = spark.createDataFrame([], "host string, text string")
    assert robots.parse_robots(empty_robots).count() == 0
    urls = spark.createDataFrame([("http://x.example/a",)], "url string")
    gated = robots.frontier_allowed_packed(
        urls, robots.pack_rules(robots.parse_robots(empty_robots))
    ).collect()
    assert [r.allowed for r in gated] == [True]


def test_pipeline_composes_rule_inference(spark):
    from kgce import pipeline, schemas, synth

    pages = spark.createDataFrame(synth.gen_pages(40, seed=77), schema=schemas.PAGES)
    out = pipeline.run(
        pages, infer={"min_support": 2, "min_pca_confidence": 0.5}
    )
    assert "rules" in out and "inferred" in out
    # composition parity: same result as calling the operators directly
    edges = out["edges"]
    mined = rules.mine_chain_rules(edges, min_support=2)
    want = {
        (r.subj_id, r.pred, r.obj_id): (r.confidence, r.n_rules)
        for r in rules.infer_chain_facts(
            edges, mined, min_pca_confidence=0.5
        ).collect()
    }
    got = {
        (r.subj_id, r.pred, r.obj_id): (r.confidence, r.n_rules)
        for r in out["inferred"].collect()
    }
    assert got == want
    # inferred facts are NEW: none exist in the edge set
    existing = {
        (r.subj_id, r.pred, r.obj_id)
        for r in edges.select("subj_id", "pred", "obj_id").collect()
    }
    assert not set(got) & existing


@pytest.mark.parametrize("seed", [0, 1])
def test_chain_rules_auto_pca_direction(spark, seed):
    facts = _random_facts(seed)
    got = {
        (r.p1, r.p2, r.head): (r.pca_body_count, r.pca_confidence)
        for r in rules.mine_chain_rules(
            _kg(spark, facts), min_support=2, pca_direction="auto"
        ).collect()
    }
    want = {
        k: (v[3], v[6])
        for k, v in _chain_rules_oracle(facts, 2, 0.0, 1000, "auto").items()
    }
    assert got == want


def test_auto_pca_picks_object_side_for_inverse_functional_head(spark):
    # head 'tag': ONE subject (1) fans out to six objects — functionality
    # 1/6 << inverse functionality 1.0, so auto-PCA must count OBJECT
    # coverage.  Body pairs are (1,21), (2,22), (3,23); tag covers
    # objects {21, 22, ...} -> object-side pca = 2, while subject-side
    # pca = 1 (only x=1 has a tag edge) — the two directions provably
    # differ on this fixture.
    facts = (
        [(i, "a", 10 + i) for i in (1, 2, 3)]          # body left: x-a->z
        + [(10 + i, "b", 20 + i) for i in (1, 2, 3)]   # body right: z-b->y
        + [(1, "tag", 21), (1, "tag", 22)]             # support pair + extra obj
        + [(1, "tag", 40 + i) for i in range(4)]       # more objects, same subj
    )
    df = _kg(spark, facts)
    subj = {
        (r.p1, r.p2, r.head): r.pca_body_count
        for r in rules.mine_chain_rules(df, min_support=1).collect()
    }
    auto = {
        (r.p1, r.p2, r.head): r.pca_body_count
        for r in rules.mine_chain_rules(
            df, min_support=1, pca_direction="auto"
        ).collect()
    }
    assert subj[("a", "b", "tag")] == 1   # only x=1 is tag-covered
    assert auto[("a", "b", "tag")] == 2   # y in {21, 22} are tag-covered
    assert auto == {
        k: v[3]
        for k, v in _chain_rules_oracle(facts, 1, 0.0, 1000, "auto").items()
    }


def _weighted_lpa_oracle(wedges, iterations):
    """Synchronous weighted LPA: weight-sum plurality, smallest label ties;
    parallel (and both-orientation) edges sum."""
    w = defaultdict(int)
    for a, b, wt in wedges:
        if a != b:
            w[(min(a, b), max(a, b))] += wt
    nbrs = defaultdict(dict)
    for (a, b), wt in w.items():
        nbrs[a][b] = wt
        nbrs[b][a] = wt
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        new = {}
        for n in labels:
            acc = defaultdict(int)
            for m, wt in nbrs[n].items():
                acc[labels[m]] += wt
            new[n] = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    return labels


@pytest.mark.parametrize("seed,iters", [(0, 2), (1, 4)])
def test_weighted_label_propagation_matches_oracle(spark, seed, iters):
    rng = random.Random(seed)
    wedges = [
        (rng.randrange(12), rng.randrange(12), rng.randint(1, 5))
        for _ in range(50)
    ]
    df = spark.createDataFrame(wedges, "a long, b long, w long")
    got = {
        r.node: r.label
        for r in graph.label_propagation(df, iterations=iters, weight="w").collect()
    }
    assert got == _weighted_lpa_oracle(wedges, iters)


def test_weighted_lpa_weight_decides_plurality(spark):
    # node 0 has two light edges into community A and one heavy edge to B
    df = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 1), (0, 3, 5), (1, 2, 5)], "a long, b long, w long"
    )
    got = {
        r.node: r.label
        for r in graph.label_propagation(df, iterations=1, weight="w").collect()
    }
    assert got[0] == 3  # weight 5 beats 1+1... per-label: {1:1, 2:1, 3:5}
    unweighted = {
        r.node: r.label
        for r in graph.label_propagation(df, iterations=1).collect()
    }
    assert unweighted[0] == 1  # counts tie 1/1/1 -> smallest label


def _modularity_oracle(wedges, labels):
    w = defaultdict(int)
    for a, b, wt in wedges:
        if a != b:
            w[(min(a, b), max(a, b))] += wt
    m = sum(w.values())
    deg = defaultdict(int)
    intra = defaultdict(int)
    dc = defaultdict(int)
    for (a, b), wt in w.items():
        deg[a] += wt
        deg[b] += wt
        if labels[a] == labels[b]:
            intra[labels[a]] += wt
    for n, d in deg.items():
        dc[labels[n]] += d
    return sum(intra[c] / m - (dc[c] / (2 * m)) ** 2 for c in dc)


@pytest.mark.parametrize("seed", [0, 3])
def test_modularity_matches_formula(spark, seed):
    rng = random.Random(seed)
    wedges = [
        (rng.randrange(10), rng.randrange(10), rng.randint(1, 4))
        for _ in range(40)
    ]
    df = spark.createDataFrame(wedges, "a long, b long, w long")
    labels = graph.label_propagation(df, iterations=3, weight="w")
    row = graph.modularity(df, labels, weight="w").collect()[0]
    lab = {r.node: r.label for r in labels.collect()}
    want = _modularity_oracle(wedges, lab)
    assert abs(row.modularity - want) < 1e-12
    assert row.n_communities == len(set(lab.values()))


def test_modularity_two_cliques(spark):
    cl1 = [(a, b, 1) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b, 1) for a in range(10, 14) for b in range(10, 14) if a < b]
    df = spark.createDataFrame(cl1 + cl2 + [(3, 10, 1)], "a long, b long, w long")
    labels = graph.label_propagation(df, iterations=5)
    row = graph.modularity(df, labels).collect()[0]
    assert row.n_communities == 2 and row.modularity > 0.4
    # degenerate: everyone in one community -> Q == 0 exactly
    from pyspark.sql import functions as F

    one = labels.withColumn("label", F.lit(0))
    assert abs(graph.modularity(df, one).collect()[0].modularity) < 1e-12
