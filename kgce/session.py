"""SparkSession factory tuned for the KG-construction workload.

Local-mode knobs mirror what a 1000-executor cluster deployment would set:
AQE on (adaptive coalescing + skew-join splitting supplies the
"adaptive shuffle partitioning at the entity-linking join" requirement),
Arrow enabled for every pandas-UDF stage, shuffle partitions sized to the
core count rather than the 200 default.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Make ``kgce`` importable on executors regardless of launch cwd.

    Local mode inherits the driver's sys.path only when the launch cwd
    happens to contain the package; a cluster never does.  Zipping the
    package and ``addPyFile``-ing it covers both (the spark-submit
    ``--py-files`` path in kgce/submit.py does the same thing up front).
    """
    pkg_dir = Path(__file__).resolve().parent
    py_files = list(pkg_dir.rglob("*.py"))
    if not py_files:
        # imported from a zip (spark-submit --py-files already shipped us)
        return
    # content-addressed name: code edits get a fresh archive, re-adding the
    # same content to the same context is a no-op
    stamp = max(p.stat().st_mtime_ns for p in py_files)
    zip_base = Path(tempfile.gettempdir()) / f"kgce_pkg_{stamp:x}"
    if not zip_base.with_suffix(".zip").exists():
        shutil.make_archive(str(zip_base), "zip", root_dir=pkg_dir.parent, base_dir="kgce")
    try:
        spark.sparkContext.addPyFile(str(zip_base.with_suffix(".zip")))
    except Exception:
        pass  # already added in this context


def get_spark(
    app_name: str = "kgce",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the same configs apply; only ``master`` changes (spark-submit
    sets it, so we honor a pre-set master).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # one shuffle partition per core locally; a cluster run would use
        # 2-3x total cores — callers override via extra_conf.
        shuffle_partitions = max(int(cores), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches bound the in-flight row volume of fan-out
        # UDFs (1 page -> ~350 pair rows): 1024 measured ~2x faster than
        # 4096 at 32 cores by cutting JVM GC pressure
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: driver heap IS the cluster memory; undersizing it
        # turns high-concurrency UDF stages GC-bound (measured 5x slowdown
        # at 16g with 32 concurrent Arrow streams)
        .config("spark.driver.memory", os.environ.get("KGCE_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    elif not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark
