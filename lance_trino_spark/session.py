"""SparkSession construction and per-session configuration.

Local testing runs on ``local[N]`` but every conf here is chosen to hold on a
multi-executor cluster: AQE for runtime re-planning (skew joins, coalescing),
shuffle partitions sized to cores (overridable for real clusters), Arrow for
any Python-boundary crossing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe (and desirable) to apply to an externally provided
# session at runtime — e.g. the verification driver's session.
RUNTIME_CONFS: dict[str, str] = {
    # The synthetic `events` table stores timestamp[ns]; Spark's parquet
    # reader has no ns type — read as long and convert (tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Fragments written by the format layer must round-trip through Arrow
    # readers type-exactly: INT96 (the legacy default) reads back as ns.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # format("lance") pushes predicates into the pyarrow fragment scan.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Adaptive execution: runtime shuffle-partition coalescing + skew joins.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (driver contract:
    `entry(spark)` receives a session we did not build)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable in this session; proceed with defaults
    return spark


def get_spark(
    app_name: str = "lance_trino_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # getOrCreate may have returned a pre-existing session: re-apply.
    return apply_runtime_confs(spark)
