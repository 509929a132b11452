"""SparkSession factory with the engine's tuned defaults.

Tuning rationale (100 TB design, local[N] testing):
  * AQE on: runtime coalescing of the dedup/vote shuffles, skew-join
    splitting for hot-domain joins, dynamic broadcast selection for
    the records-join-back.
  * Arrow batches capped so each UDF call holds a bounded number of
    (prompt, chunk) rows -> bounded NumPy activation memory.
  * OpenBLAS/OMP pinned to 1 thread per Python worker — Spark already
    runs one worker per core; nested BLAS threading oversubscribes
    and destroys throughput.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "uie_pytorch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # thread pins + deterministic OpenBLAS kernel family, set BEFORE
    # the JVM launches so python worker daemons inherit them (the
    # engine additionally injects the same vars into sc.environment
    # for sessions built elsewhere).
    from .core import blas_env_vars

    for var, val in blas_env_vars().items():
        os.environ.setdefault(var, val)

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow the planner to pick shuffled-hash over sort-merge when
        # its size conditions hold (guide §9/§3.1): skips both sort
        # passes; the planner still falls back to SMJ for build sides
        # that cannot hash locally, and AQE skew-splitting covers SHJ.
        # Measured on the join battery at sf0.1: ~8-10% faster
        # (double_dim_join 1.09 -> 0.99 s), no result change.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
