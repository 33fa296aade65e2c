"""Entity-graph analytics: degrees and degree-ordered triangle counting.

After linking, the engine owns a large co-occurrence/similarity graph;
triangle density is the standard signal for cluster quality (near-dup
clusters are triangle-rich, hub spam is wedge-rich but triangle-poor)
and degree statistics size the skew guards.  The reference engine has no
counterpart — beyond-reference operators per the task brief.

Triangle counting uses the classic DEGREE ORDERING (node-iterator++ /
Schank-Wagner): every edge is oriented from its lower-(degree, id)
endpoint to the higher one, wedges are enumerated only from each node's
out-neighbors, and a triangle is counted exactly once — at its
lowest-ranked vertex.  This is THE scalable form: out-degree is bounded
by O(sqrt(m)) for any graph, so a hub with millions of neighbors
produces no quadratic wedge blowup (its edges all point INTO it).  All
arithmetic is integer joins/counts — bit-identical across engines, so
the DuckDB oracle grades exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linking import _checkpoint


def canonical_edges(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Distinct undirected edges as (lo, hi), self-loops dropped."""
    return (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )


def degrees(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """(node, degree) over the undirected distinct edge set."""
    e = canonical_edges(edges, a, b)
    sym = e.select(F.col("lo").alias("node")).unionAll(
        e.select(F.col("hi").alias("node"))
    )
    return sym.groupBy("node").agg(F.count("*").alias("degree"))


def triangle_stats(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """One row: (n_nodes, n_edges, n_wedges, n_triangles).

    n_wedges counts ordered out-wedges under the degree orientation (the
    candidate set the closure join probes); n_triangles counts each
    triangle exactly once.
    """
    # the edge set feeds FIVE consumers (degree count, two rank joins,
    # edge count, closure probe); when it derives from an upstream UDF /
    # join pipeline an unmaterialized fork re-runs that pipeline per
    # consumer (the CLAUDE.md multi-consumer trap) — checkpoint once
    e = _checkpoint(canonical_edges(edges, a, b))
    sym = e.select(F.col("lo").alias("node")).unionAll(
        e.select(F.col("hi").alias("node"))
    )
    deg = sym.groupBy("node").agg(F.count("*").alias("degree"))
    dl = deg.select(F.col("node").alias("lo"), F.col("degree").alias("_dl"))
    dh = deg.select(F.col("node").alias("hi"), F.col("degree").alias("_dh"))
    ranked = e.join(dl, "lo").join(dh, "hi")
    # orient u -> v by (degree, node) rank; carry v's rank for wedge order
    lo_first = F.struct(F.col("_dl").alias("d"), F.col("lo").alias("n")) < F.struct(
        F.col("_dh").alias("d"), F.col("hi").alias("n")
    )
    o = _checkpoint(
        ranked.select(
            F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u"),
            F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("v"),
            F.when(
                lo_first, F.struct(F.col("_dh").alias("d"), F.col("hi").alias("n"))
            ).otherwise(
                F.struct(F.col("_dl").alias("d"), F.col("lo").alias("n"))
            ).alias("rv"),
        )
    )
    x, y = o.alias("x"), o.alias("y")
    # ONE wedge pass: closure becomes a left join + flag so wedge and
    # triangle counts come out of the same aggregation
    wedges = x.join(
        y, (F.col("x.u") == F.col("y.u")) & (F.col("x.rv") < F.col("y.rv"))
    ).select(F.col("x.v").alias("wv"), F.col("y.v").alias("ww"))
    probe = o.select(
        F.col("u").alias("wv"), F.col("v").alias("ww"), F.lit(1).alias("_hit")
    )
    wcounts = (
        wedges.join(probe, ["wv", "ww"], "left")
        .agg(
            F.count("*").alias("n_wedges"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_triangles"),
        )
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(wcounts)
