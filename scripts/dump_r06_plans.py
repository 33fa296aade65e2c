#!/usr/bin/env python
"""Dump explain('formatted') for the queries touched in optimization
round 6 to plans/r06/<query>_<tag>.txt (tag = before|after).

Usage: python scripts/dump_r06_plans.py before [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "decontam_hits",
    "ngram_jaccard",
    "minhash_bands",
    "lsh_pairs",
    "near_dup_groups",
    "fingerprints",
    "repetition_signals",
    "connected_components",
    "pipeline_full",
    "pipeline_full_prov",
    "communities",
    "link_pagerank",
    "triangle_stats",
    "lm_perplexity",
    "recrawl_maintain",
    "kg_embed",
    "rule_mining",
    "strip_repeated_ngrams",
    "ivf_topk",
    "sequence_packing",
    "token_quality",
    "simhash_pairs",
]


def main() -> None:
    import __spark_entry__ as em
    from kgce.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    spark = get_spark("plans-r06", cores=4, shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    qs = dict(em.queries())
    qs["pipeline_full"] = em.pipeline_full
    qs["pipeline_full_prov"] = em.pipeline_full_prov
    qs["strip_repeated_ngrams"] = em.bench_strip_repeated_ngrams
    qs["domain_stats"] = em.bench_domain_stats
    qs["link_pagerank"] = em.bench_link_pagerank
    qs["lm_perplexity"] = em.bench_lm_perplexity
    qs["kg_embed"] = em.bench_kg_embed
    qs["rule_mining"] = em.bench_rule_mining
    qs["communities"] = em.bench_communities
    qs["recrawl_maintain"] = em.bench_recrawl_maintain
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip {name}: not found")
            continue
        try:
            df = qs[name](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR generating plan: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
