"""Entity linking: connected components vs a union-find oracle;
MinHash-LSH clustering behavior on near-duplicate surface forms."""

import random

import pytest

from pyspark.sql import functions as F

from kgce.operators import linking


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize("threshold", [1_000_000, 0])  # driver path / star loop
def test_connected_components_random_graphs(spark, threshold):
    rng = random.Random(17)
    for trial in range(2):
        n = 200
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(120 + 60 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            r.node: r.component
            for r in linking.connected_components(
                df, small_graph_threshold=threshold
            ).collect()
        }
        nodes = {x for e in edges for x in e}
        want = _union_find(edges, nodes)
        # every node in an edge gets the min-id of its component
        comp_min = {}
        for nd, root in want.items():
            comp_min.setdefault(root, nd)
            comp_min[root] = min(comp_min[root], nd)
        want_min = {nd: comp_min[want[nd]] for nd in nodes}
        assert got == want_min


def test_connected_components_chain_converges(spark):
    # a long path is the worst case for naive min-propagation;
    # large-star/small-star must converge in O(log n) rounds
    edges = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.node: r.component
        for r in linking.connected_components(
            df, max_iter=12, small_graph_threshold=0  # force the star loop
        ).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 301


def test_connected_components_empty(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert linking.connected_components(df).count() == 0


@pytest.mark.parametrize("seed", [3, 11])
def test_triangle_stats_match_brute_force(spark, seed):
    """Degree-ordered triangle counting == O(n^3) brute force on random
    graphs; degrees match; each triangle counted exactly once."""
    import itertools
    import random

    from kgce.operators import graph

    rng = random.Random(seed)
    n = 24
    edges = sorted(
        {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.25}
    )
    df = spark.createDataFrame(
        [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges] + [(0, 0)],
        "a long, b long",
    )  # mixed orientation + a self-loop that must be dropped
    row = graph.triangle_stats(df).first()
    es = set(edges)
    tri = sum(
        1
        for x, y, z in itertools.combinations(range(n), 3)
        if (x, y) in es and (y, z) in es and (x, z) in es
    )
    assert row.n_triangles == tri
    assert row.n_edges == len(edges)
    assert row.n_nodes == len({v for e in edges for v in e})
    deg = {r.node: r.degree for r in graph.degrees(df).collect()}
    for v in deg:
        assert deg[v] == sum(1 for e in edges if v in e)


def test_canonicalize_clusters_near_duplicates(spark):
    mentions = spark.createDataFrame(
        [
            ("International Business Machines",),
            ("International Business Machine",),  # near-dup
            ("Internatioal Business Machines",),  # typo near-dup
            ("Qualcomm Incorporated",),
            ("Qualcomm Incorporatedd",),  # near-dup
            ("Zebra",),  # unrelated
        ],
        "text string",
    ).select(F.lit("u").alias("url"), F.lit(0).alias("sent_id"), F.col("text"))
    canon = linking.canonicalize(mentions, threshold=0.6)
    rows = canon.collect()
    by_norm = {r.norm: r.canonical_id for r in rows}
    ibm = {v for k, v in by_norm.items() if "business" in k}
    q = {v for k, v in by_norm.items() if "qualcomm" in k}
    assert len(ibm) == 1, by_norm
    assert len(q) == 1, by_norm
    assert by_norm["zebra"] not in ibm | q
    # deterministic across runs
    rows2 = {r.norm: r.canonical_id for r in linking.canonicalize(mentions, threshold=0.6).collect()}
    assert rows2 == by_norm
