#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.md target: >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so the two-cluster-size criterion
is evidenced by running the SAME job at two parallelism levels —
local[8] vs local[32] — on the SAME input, in separate JVMs, and
reporting throughput at both plus efficiency = (T_8 / T_32) / 4.

The measured job is the flagship fused pipeline (documents-as-pages ->
mentions -> scored pairs -> aggregated triples), timed inside the process
AFTER session warm-up so JVM startup is excluded.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from kgce.session import get_spark
from kgce import tagging
from kgce.operators import triples as triples_ops
from pyspark.sql import functions as F

cores = int(os.environ["KGCE_CORES"])
replicas = int(os.environ.get("KGCE_REPLICAS", "64"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("kgce-scaling", cores=cores, shuffle_partitions=max(cores, 8))
docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet")
# deterministic corpus amplification: the measured job must be large
# enough that per-task fixed overheads are negligible at BOTH levels
pages = (
    docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep"))
    .select(F.concat(F.lit("doc://"), F.col("doc_id").cast("string"),
                     F.lit("#"), F.col("rep").cast("string")).alias("url"), "text")
)
pages = pages.repartition(cores * 3).cache()
pages.count()  # warm: materialize input, JIT, python workers
job = triples_ops.extract_triples(tagging.extract_mentions(pages))
n = job.count()  # warm-up pass compiles codegen + spins python workers
walls = []
for _ in range(2):
    t0 = time.monotonic()
    job.count()
    walls.append(time.monotonic() - t0)
wall = min(walls)
print(json.dumps({{"cores": cores, "wall_sec": wall, "triples": n,
                   "triples_per_sec": n / wall}}))
"""


def run_at(cores: int, sf_dir: str) -> dict:
    env = dict(os.environ, KGCE_CORES=str(cores), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", RUN_SNIPPET.format(repo=str(REPO))],
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_at(8, sf_dir)
    hi = run_at(32, sf_dir)
    eff = (lo["wall_sec"] / hi["wall_sec"]) / (32 / 8)
    result = {
        "sf_dir": sf_dir,
        "local8": {k: round(v, 2) for k, v in lo.items()},
        "local32": {k: round(v, 2) for k, v in hi.items()},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(result))
    md = f"""# BENCH/BASELINE — measured scaling evidence

Job: fused KG pipeline (documents-as-pages → mention detection via
mapInPandas → sentence-scoped mention pairing → triple aggregation) on
`{sf_dir}` amplified ×16 deterministically ({lo['triples']} triples from
~80k pages), same input at two parallelism levels, separate JVMs,
session warm-up and input materialization excluded from timing.

| parallelism | wall (s) | triples/sec |
|---|---|---|
| local[8]  (N)  | {lo['wall_sec']:.2f} | {lo['triples_per_sec']:.1f} |
| local[32] (4N) | {hi['wall_sec']:.2f} | {hi['triples_per_sec']:.1f} |

**Scaling efficiency (N → 4N) = (T_N / T_4N) / 4 = {eff:.3f}**
(target ≥ 0.8 — {"MET" if eff >= 0.8 else "NOT MET"})

Sandbox proxy for the BASELINE.json two-cluster-size criterion: no real
cluster is available, so parallelism levels stand in for executor counts;
the job's only serial sections are the AQE-coalesced shuffle of the
pair self-join and triple aggregation.
"""
    (REPO / "BENCH" / "BASELINE.md").write_text(md)


if __name__ == "__main__":
    main()
