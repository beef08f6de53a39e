"""SparkSession builder with scale-appropriate defaults.

Defaults chosen for the 100 TB design point, scaled to local[k] for
tests: AQE on (runtime re-plan + skew-join splitting), Arrow transport
for pandas UDFs, shuffle partitions proportional to parallelism so the
two-parallelism scaling benchmark is honest (SURVEY.md §7 step 7).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def raise_fd_limit(target: int = 8192) -> tuple[int, int]:
    """SURVEY §2 A32: raise the process's soft RLIMIT_NOFILE toward
    `target` (capped at the hard limit) — the reference does exactly
    this at startup because a wide async dispatch plus cache shards
    exhausts the default 1024 descriptors
    (reference: request_processor/base_request_processor.py fd-limit
    raise). Spark-side the same pressure comes from shuffle spill
    files + parquet part handles on a wide local[k] driver. Returns
    (old_soft, new_soft); a refusal (e.g. sandboxed hard cap) is not
    an error — the achievable maximum is set instead."""
    import resource
    soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
    want = min(int(target), hard if hard != resource.RLIM_INFINITY
               else int(target))
    if want > soft:
        try:
            resource.setrlimit(resource.RLIMIT_NOFILE, (want, hard))
            return soft, want
        except (ValueError, OSError):
            return soft, soft
    return soft, soft


def get_spark(app_name: str = "curator-spark", parallelism: int | None = None,
              shuffle_partitions: int | None = None, **extra_conf: str) -> SparkSession:
    raise_fd_limit()
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # proportional to cores so scaling runs don't under/over-partition
        shuffle_partitions = max(parallelism, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
        # INT96 chunks carry NO footer min/max, which would blind the
        # commit manifests' ts statistics (checkpoint.file_column_stats)
        # and every engine's row-group skipping on time predicates
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # conv-aggregate tables are ~1/avg_turns of the input; let joins
        # against them broadcast well past the 10MB default so the wide
        # turn table never shuffles for the agg join (AQE still decides)
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # the curator_table Python data source implements pushFilters
        # (manifest-stats file skipping + bucket pruning); Spark 4
        # refuses a pushdown-capable source unless this is on
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    for k, v in extra_conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
