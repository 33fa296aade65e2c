#!/usr/bin/env python
"""Skew-stress evidence (BASELINE.json:6,14: salted repartitioning for
hot domains; r3 VERDICT #5).

A Zipf-skewed crawl delivered domain-clustered (the realistic layout:
crawl archives are host-sorted, so a plain ``repartition(P, domain)`` —
or simply reading per-host files — concentrates a hot domain's pages in
a handful of tasks) is compared against the deterministic salted
repartition ``kgce.plans.skew.salted_repartition`` on the SAME input:

* per-task WORKLOAD distribution: the max/median of per-partition token
  sums (task time of the narrow tagging UDF is proportional to tokens
  processed, and the token sum is deterministic — immune to shared-host
  noise, unlike sampled task durations);
* measured WALL TIME of the mention-extraction stage on both layouts
  (min-of-N, alternating order inside ONE pinned process so both
  layouts see the same neighbor-noise windows).

Writes BENCH/SKEW.md and prints one JSON line.  The whole measurement
runs in a subprocess pinned with ``taskset`` (CLAUDE.md: unpinned
local[N] overlaps Python workers with JVM threads and understates any
parallelism effect).
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
from kgce import synth, tagging
from kgce.plans.skew import domain_of, salted_repartition
from pyspark.sql import functions as F

cores = int(os.environ.get("KGCE_CORES", "8"))
n_pages = int(os.environ.get("KGCE_SKEW_PAGES", "30000"))
zipf_a = float(os.environ.get("KGCE_SKEW_ZIPF", "2.0"))
n_parts = cores * 4
spark = get_spark("kgce-skew", cores=cores, shuffle_partitions=n_parts)
rows = synth.gen_pages(n_pages, seed=99, zipf_a=zipf_a)
for r in rows:
    r["html"] = None  # tagging never reads it; keep the driver frame slim
pages = spark.createDataFrame(rows, schema="url string, warc_ts timestamp, html binary, text string, lang string").cache()
pages.count()  # materialize + warm python workers

layouts = {{
    "domain_clustered": lambda df: df.repartition(n_parts, domain_of(F.col("url"))),
    "salted": lambda df: salted_repartition(df, domain_of(F.col("url")), n_salt=16, n_partitions=n_parts),
}}

out = {{"n_pages": n_pages, "zipf_a": zipf_a, "cores": cores, "n_partitions": n_parts}}
# deterministic per-task workload distribution (token sums per partition)
for name, fn in layouts.items():
    dist = (
        fn(pages)
        .select(F.spark_partition_id().alias("pid"),
                F.size(F.split("text", " ")).alias("toks"))
        .groupBy("pid").agg(F.sum("toks").alias("toks"))
        .collect()
    )
    toks = sorted(r.toks for r in dist)
    median = toks[len(toks) // 2] if toks else 0
    out[name] = {{
        "tasks": len(toks),
        "max_tokens": max(toks),
        "median_tokens": median,
        "max_over_median": round(max(toks) / max(median, 1), 2),
    }}

# wall time of the protected stage (mention extraction), alternating
runs = int(os.environ.get("KGCE_SKEW_RUNS", "3"))
walls = {{k: [] for k in layouts}}
for k, fn in layouts.items():  # warm both plans once (codegen, workers)
    tagging.extract_mentions(fn(pages)).count()
for _ in range(runs):
    for k, fn in layouts.items():
        t0 = time.monotonic()
        tagging.extract_mentions(fn(pages)).count()
        walls[k].append(time.monotonic() - t0)
for k in layouts:
    out[k]["wall_sec"] = round(min(walls[k]), 2)
out["speedup_salted"] = round(
    out["domain_clustered"]["wall_sec"] / out["salted"]["wall_sec"], 2
)

# full run_checkpointed A/B on the clustered input (salt_hot_domains
# on vs off).  Expected to be near-null: StageRunner buckets pages by
# xxhash64(url) % n_buckets, which already flattens domain clustering
# for the checkpointed stages — the salt's protection is for the
# narrow pre-bucket path measured above (and for writes).  Reported
# anyway so the null result is on record, not assumed.
import shutil, tempfile
from kgce import pipeline
rc_walls = {{}}
for salt in (False, True):
    wd = tempfile.mkdtemp(prefix="kgce_skew_rc_")
    t0 = time.monotonic()
    outp = pipeline.run_checkpointed(
        layouts["domain_clustered"](pages), wd, n_buckets=8,
        salt_hot_domains=salt,
    )
    outp["triples"].count()
    rc_walls["salted" if salt else "unsalted"] = round(time.monotonic() - t0, 2)
    shutil.rmtree(wd, ignore_errors=True)
out["run_checkpointed"] = rc_walls
print(json.dumps(out))
"""


def main() -> None:
    cores = int(os.environ.get("KGCE_CORES", "8"))
    cpu_base = int(os.environ.get("KGCE_CPU_BASE", "16"))
    cpus = ",".join(str(cpu_base + i) for i in range(cores))
    load1 = os.getloadavg()[0]
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", RUN_SNIPPET.format(repo=str(REPO))],
        capture_output=True,
        text=True,
        timeout=3000,
        env=dict(os.environ, KGCE_CORES=str(cores)),
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    res = {**json.loads(line), "load1_at_launch": round(load1, 2)}
    print(json.dumps(res))
    dc, sa = res["domain_clustered"], res["salted"]
    md = f"""# BENCH/SKEW — hot-domain salting evidence

Input: {res['n_pages']} synthetic pages, Zipf domain skew a={res['zipf_a']}
(the hottest domain owns ~60% of all pages), delivered
domain-clustered — the realistic crawl layout (host-sorted archives) —
vs the same input through `kgce.plans.skew.salted_repartition`
(deterministic xxhash64(url) % 16 sub-keys).  {res['n_partitions']}
partitions at local[{res['cores']}], whole process tree pinned with
`taskset`, min-of-3 alternating timed runs, 1-min load at launch
{res['load1_at_launch']}.

| layout | tasks | max tokens/task | median tokens/task | max/median | tagging wall (s) |
|---|---|---|---|---|---|
| domain-clustered | {dc['tasks']} | {dc['max_tokens']} | {dc['median_tokens']} | {dc['max_over_median']} | {dc['wall_sec']} |
| salted (n_salt=16) | {sa['tasks']} | {sa['max_tokens']} | {sa['median_tokens']} | {sa['max_over_median']} | {sa['wall_sec']} |

**Salting flattens per-task workload from {dc['max_over_median']}x to
{sa['max_over_median']}x max/median and speeds the narrow tagging stage
{res['speedup_salted']}x wall-clock.**

Per-task workload is reported as the PER-PARTITION TOKEN SUM — the
narrow tagging UDF's cost is proportional to tokens processed, and the
token distribution is a pure function of the layout (deterministic,
immune to the shared host's noise), while the wall-time ratio shows the
straggler effect end-to-end.  `run_checkpointed(salt_hot_domains=True)`
applies exactly this repartition before its UDF stages; the salt is a
pure function of the url, so bucket manifests stay resume-valid.

Full `run_checkpointed` A/B on the same clustered input
(salt off {res['run_checkpointed']['unsalted']} s vs salt on
{res['run_checkpointed']['salted']} s): near-parity is the EXPECTED
result, not a failure of the salt — StageRunner buckets pages by
xxhash64(url) % n_buckets, so the checkpointed stages never see the
domain clustering; the salt protects the paths that DO run on the
delivered layout (the uncheckpointed `pipeline.run`/hygiene prefix
measured above, and partitioned writes).  Recorded so the null result
is evidence, not an untested assumption.
"""
    (REPO / "BENCH" / "SKEW.md").write_text(md)


if __name__ == "__main__":
    main()
