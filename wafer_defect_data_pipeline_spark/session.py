"""SparkSession factory with engine-pinned configuration.

Single place where execution-relevant Spark configs are chosen so every
entry point (tests, bench, driver contract) runs with identical semantics:

- AQE on (runtime coalesce + skew-join handling) — at 100 TB the static
  shuffle-partition count is always wrong somewhere; AQE re-plans per stage.
- ``spark.sql.session.timeZone=UTC`` — required for bit-parity between Spark
  timestamps and the DuckDB oracle (which is UTC-naive).
- Arrow enabled — every pandas interchange (``applyInPandas``/``mapInPandas``
  and ``toPandas``) goes through columnar Arrow batches, not pickled rows.
- ``shuffle.partitions`` sized to cores for local runs; on a real cluster this
  is overridden (see ``tuned_conf_for_scale``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "wafer-defect-data-pipeline-spark"


def default_parallelism() -> int:
    """Local-mode thread count, overridable by the driver via SPARK_GRAFT_CPUS."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 4


def engine_conf(parallelism: int | None = None) -> dict[str, str]:
    """The pinned config dict (applied to new sessions, asserted by tests)."""
    p = parallelism or default_parallelism()
    return {
        "spark.sql.shuffle.partitions": str(p),
        "spark.default.parallelism": str(p),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # small-dim broadcast threshold: region/nation/supplier/part always fit
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.parquet.filterPushdown": "true",
        # driver's events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type, so read as long and convert at the source layer
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.ui.enabled": "false",
        "spark.sql.execution.pyspark.udf.faulthandler.enabled": "false",
    }


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    parallelism: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    In local mode one JVM hosts driver+executors, so ``spark.driver.memory``
    is the only heap knob; it must be set before JVM start, hence here.
    """
    p = parallelism or default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{p}]")
    for k, v in engine_conf(p).items():
        builder = builder.config(k, v)
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tuned_conf_for_scale(total_input_bytes: int, executor_mem_bytes: int = 8 << 30) -> dict[str, str]:
    """Config deltas for a real multi-executor cluster at a given input size.

    Partition-count discipline (SURVEY.md §7.7): target ~128 MiB of input per
    shuffle partition post-compression-expansion, bounded so each task's
    working set fits the executor memory with headroom for sort spill.
    At 100 TB this yields ~800k shuffle partitions — far beyond the default
    200, which would OOM; AQE then coalesces the small ones at runtime.
    """
    target_bytes_per_partition = 128 << 20
    n = max(64, total_input_bytes // target_bytes_per_partition)
    return {
        "spark.sql.shuffle.partitions": str(n),
        "spark.sql.files.maxPartitionBytes": str(target_bytes_per_partition),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20),
    }
