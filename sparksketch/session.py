"""SparkSession factory with the engine's canonical local-mode settings.

Local mode (``local[N]``) is the sandbox stand-in for a multi-executor
cluster; the same code ships to a real cluster via ``spark-submit
--py-files`` (see sparksketch/jobs/build_filter.py) where these settings
come from spark-defaults / the submit command instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "sparksketch", cores: int | str | None = None,
              shuffle_partitions: int | None = None, extra: dict | None = None) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cores) if str(cores).isdigit() else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k-row Arrow batches measured ~2× faster JVM→Python than
        # 64k on wide text rows (see BENCH notes); don't raise it
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        # local mode: shuffle through tmpfs and skip compression — measured
        # ~20% off the shuffle floor on this box (real clusters set
        # spark.local.dir to fast local disks instead)
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = (builder.config("spark.local.dir", shm)
                   .config("spark.shuffle.compress", "false")
                   .config("spark.shuffle.spill.compress", "false"))
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def estimated_row_count(df) -> int | None:
    """The optimizer's row-count estimate, or None when unavailable.

    Free when catalog/CBO stats exist (ANALYZE TABLE at scale) — callers
    use it to avoid an extra count() job where only the magnitude matters.
    The private `_jdf` seam is classic-mode PySpark only (Spark Connect
    DataFrames have no `_jdf`) and version-fragile by nature; its sanctioned
    uses in the library are this function (broad fallback to None — must
    never gate correctness) and the diagnostics in `plans.plan_digest`
    (guarded, raises NotImplementedError off classic mode).
    """
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        pass
    return None
