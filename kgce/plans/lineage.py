"""Per-partition checkpointed lineage + resume (BASELINE.json:6,14).

Every stage run is split into ``n_buckets`` deterministic buckets
(``pmod(xxhash64(key), n_buckets)``).  Each bucket's output is written to
``<work_dir>/<stage>/data/bucket=<b>/`` and acknowledged by a manifest row
``(stage, bucket, input_hash, row_count, wall_ms, status)`` appended to
``<work_dir>/<stage>/_manifest/``.  A re-run anti-joins the plan against
the manifest: completed buckets are skipped, so a job killed mid-stage
resumes where it stopped and produces byte-identical output.

A config fingerprint is stored alongside; resuming with a different stage
configuration aborts — mirroring the reference's label2idx compatibility
check on resume (/root/reference/src/transformer_ner/task.py:561-571).

The wall-clock used for ``wall_ms`` is metrics-only; it never influences
data content (determinism invariant).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageConfigMismatch(RuntimeError):
    pass


class StageRunner:
    def __init__(self, spark: SparkSession, work_dir: str, n_buckets: int = 8):
        self.spark = spark
        self.work_dir = Path(work_dir)
        self.n_buckets = n_buckets

    def _paths(self, stage: str) -> tuple[Path, Path, Path]:
        root = self.work_dir / stage
        return root, root / "data", root / "_manifest"

    def completed_buckets(self, stage: str) -> set[int]:
        _, _, mdir = self._paths(stage)
        if not mdir.exists() or not any(mdir.iterdir()):
            return set()
        m = self.spark.read.parquet(str(mdir))
        return {r.bucket for r in m.filter(F.col("status") == "done").select("bucket").collect()}

    def run(
        self,
        stage: str,
        input_df: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        key: str = "url",
        config: dict | None = None,
        max_buckets_per_job: int | None = None,
    ) -> DataFrame:
        """Run (or resume) a stage; returns the stage's full output DataFrame.

        Missing buckets are processed in WAVES of ``max_buckets_per_job``
        (default: all missing buckets in one wave).  Each wave is ONE
        Spark job — the wave's output is written with
        ``partitionBy('bucket')`` under dynamic partition overwrite, so
        the raw input is scanned once per wave instead of once per bucket
        (the round-1 plan was ~3 scans x n_buckets).  Two cheap auxiliary
        passes per wave remain: a key-column-pruned groupBy for the
        per-bucket input hash, and a parquet-footer count of the written
        output.  Failure granularity = wave: a killed run resumes at its
        last completed wave's manifest.  Pass ``max_buckets_per_job=1``
        to recover per-bucket granularity when transform cost dominates
        scan cost.

        Requires ``key`` to survive ``transform`` (true for every kgce
        stage — mentions/pairs keep ``url``); when it does not, the wave
        falls back to bucket-at-a-time filtered writes.
        """
        root, ddir, mdir = self._paths(stage)
        root.mkdir(parents=True, exist_ok=True)

        cfg_file = root / "config.json"
        cfg_json = json.dumps(
            {"n_buckets": self.n_buckets, "key": key, **(config or {})}, sort_keys=True
        )
        if cfg_file.exists():
            if cfg_file.read_text() != cfg_json:
                raise StageConfigMismatch(
                    f"stage '{stage}' resume config mismatch; clear {root} or fix config"
                )
        else:
            cfg_file.write_text(cfg_json)

        done = self.completed_buckets(stage)
        missing = [b for b in range(self.n_buckets) if b not in done]
        wave_size = max_buckets_per_job or max(len(missing), 1)
        bucket_col = F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_buckets)).cast("int")
        bucketed = input_df.withColumn("_bucket", bucket_col)

        manifest_schema = (
            "stage string, bucket int, input_hash string, row_count long, "
            "wall_ms long, status string"
        )
        for w in range(0, len(missing), wave_size):
            wave = missing[w : w + wave_size]
            t0 = time.monotonic()
            part = bucketed.filter(F.col("_bucket").isin(wave))
            out = transform(part.drop("_bucket"))
            if key in out.columns:
                # single-scan path: one job writes every wave bucket
                (
                    out.withColumn("bucket", bucket_col)
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("bucket")
                    .parquet(str(ddir))
                )
            else:  # pragma: no cover - no kgce stage drops its key
                for b in wave:
                    transform(
                        bucketed.filter(F.col("_bucket") == b).drop("_bucket")
                    ).write.mode("overwrite").parquet(str(ddir / f"bucket={b}"))
            # per-bucket input hash: ONE key-column-pruned scan per wave
            hashes = {
                r._bucket: r.h
                for r in part.groupBy("_bucket")
                .agg(F.coalesce(F.bit_xor(F.xxhash64(F.col(key))), F.lit(0)).alias("h"))
                .collect()
            }
            # per-bucket output rows: parquet footers only (metadata count)
            counts: dict[int, int] = {}
            existing = [b for b in wave if (ddir / f"bucket={b}").exists()]
            if existing:
                paths = [str(ddir / f"bucket={b}") for b in existing]
                counts = {
                    r.bucket: r.n
                    for r in self.spark.read.option("basePath", str(ddir))
                    .parquet(*paths)
                    .groupBy("bucket")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
            wall_ms = int((time.monotonic() - t0) * 1000)  # wave wall, per bucket
            rows = [
                (
                    stage,
                    b,
                    format(hashes.get(b, 0) & (2**64 - 1), "016x"),
                    counts.get(b, 0),
                    wall_ms,
                    "done",
                )
                for b in wave
            ]
            self.spark.createDataFrame(rows, manifest_schema).write.mode("append").parquet(
                str(mdir)
            )
        return self.spark.read.option("basePath", str(ddir)).parquet(str(ddir / "bucket=*"))

    def run_global(
        self,
        stage: str,
        build: Callable[[], DataFrame],
        config: dict | None = None,
    ) -> DataFrame:
        """Cache a GLOBAL (non-bucketable) stage: compute once, land the
        result as parquet, skip on resume — the reference's feature-cache
        pattern (S7, transformer_biaffine_ner/data_utils.py:332-344)
        applied to stages whose shuffle crosses any bucketing (e.g.
        entity canonicalization: LSH pairs span buckets, so per-bucket
        checkpointing would silently drop cross-bucket links).  Resume
        granularity is all-or-nothing for such stages by construction.
        """
        root, ddir, mdir = self._paths(stage)
        root.mkdir(parents=True, exist_ok=True)
        cfg_file = root / "config.json"
        cfg_json = json.dumps({"global": True, **(config or {})}, sort_keys=True)
        if cfg_file.exists():
            if cfg_file.read_text() != cfg_json:
                raise StageConfigMismatch(
                    f"stage '{stage}' resume config mismatch; clear {root} or fix config"
                )
        else:
            cfg_file.write_text(cfg_json)
        if (ddir / "_SUCCESS").exists():
            return self.spark.read.parquet(str(ddir))
        t0 = time.monotonic()
        build().write.mode("overwrite").parquet(str(ddir))
        out = self.spark.read.parquet(str(ddir))
        n = out.count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self.spark.createDataFrame(
            [(stage, -1, "", n, wall_ms, "done")],
            "stage string, bucket int, input_hash string, row_count long, "
            "wall_ms long, status string",
        ).write.mode("append").parquet(str(mdir))
        return out

    def manifest(self, stage: str) -> DataFrame:
        _, _, mdir = self._paths(stage)
        return self.spark.read.parquet(str(mdir))


def keep_latest_n(manifest_df: DataFrame, n: int, order_col: str = "wall_ms") -> DataFrame:
    """K5/W6 retention pattern (reference checkpoint GC, task.py:146-151):
    newest N by a monotonic column; the complement is the GC set.
    Manifests are one row per bucket per attempt — bounded, so the
    global window is safe (tiny_global_window docstring)."""
    from .partitioning import tiny_global_window

    w = tiny_global_window(F.desc(order_col))
    return (
        manifest_df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )
