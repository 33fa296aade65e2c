#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

``value`` is total wall seconds over the headline set; ``queries`` has
per-query seconds; ``derived`` adds throughput figures (triples/sec for
the flagship pipeline — the BASELINE.json headline metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from kgce.session import get_spark

    spark = get_spark("kgce-bench", cores=cores, shuffle_partitions=max(cores, 8))

    headline = [
        "pipeline_triples_hybrid",  # flagship: Python tags, JVM pairs
        "pipeline_triples",       # fused UDF form (round-over-round diff)
        "mentions_decode",        # window-based decode
        "triples_agg",            # self-join + aggregation
        "q1_pricing_summary",     # scan-heavy aggregation
        "lsh_pairs",              # MinHash LSH blocking join
        "user_sessions",          # sessionization windows
        "connected_components",   # iterative CC
        "cosine_topk",            # embedding brute-force top-k
    ]
    qs = entrymod.queries()
    # session warmup: JVM JIT, FS listing, python worker spin-up — none of
    # it belongs to the first measured query
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop(batches):
        for b in batches:
            yield b

    # spin up the Arrow worker pool (one python worker per core) so the
    # first mapInPandas query measures the operator, not process forks
    spark.range(cores * 4).repartition(cores).mapInPandas(
        _noop, "id long"
    ).count()
    # min-of-N per query: the host is SHARED, so a single timing can
    # measure a neighbor's burst instead of the engine (observed 30x
    # swings at load>8 with the container's own CPUs 96% idle)
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    n_triples = 0
    for name in headline:
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            n = df.count()  # forces full execution
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)
        if name == "pipeline_triples_hybrid":
            n_triples = n

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "derived": {
            "triples": n_triples,
            "triples_per_sec": round(n_triples / timings["pipeline_triples_hybrid"], 1)
            if timings.get("pipeline_triples_hybrid")
            else None,
            "cores": cores,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
