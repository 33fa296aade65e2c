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
    ) -> DataFrame:
        """Run (or resume) a stage; returns the stage's full output DataFrame."""
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
        bucketed = input_df.withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(self.n_buckets)).cast("int")
        )
        for b in range(self.n_buckets):
            if b in done:
                continue
            t0 = time.monotonic()
            part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
            out = transform(part)
            out.write.mode("overwrite").parquet(str(ddir / f"bucket={b}"))
            n = self.spark.read.parquet(str(ddir / f"bucket={b}")).count()
            ih = part.agg(
                F.coalesce(F.bit_xor(F.xxhash64(F.col(key))), F.lit(0)).alias("h")
            ).collect()[0].h
            wall_ms = int((time.monotonic() - t0) * 1000)
            self.spark.createDataFrame(
                [(stage, b, format(ih & (2**64 - 1), "016x"), n, wall_ms, "done")],
                "stage string, bucket int, input_hash string, row_count long, wall_ms long, status string",
            ).write.mode("append").parquet(str(mdir))
        return self.spark.read.option("basePath", str(ddir)).parquet(str(ddir / "bucket=*"))

    def manifest(self, stage: str) -> DataFrame:
        _, _, mdir = self._paths(stage)
        return self.spark.read.parquet(str(mdir))


def keep_latest_n(manifest_df: DataFrame, n: int, order_col: str = "wall_ms") -> DataFrame:
    """K5/W6 retention pattern (reference checkpoint GC, task.py:146-151):
    newest N by a monotonic column; the complement is the GC set."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(order_col))
    return (
        manifest_df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )
