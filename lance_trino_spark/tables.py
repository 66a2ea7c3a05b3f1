"""Loading the driver testdata tables (TESTDATA.md) with normalized types.

The only normalization applied: `events.ts` is parquet timestamp[ns], which
Spark reads (via ``spark.sql.legacy.parquet.nanosAsLong``) as a long of
nanoseconds; we expose both the raw nanos (``ts_ns``) and a microsecond
TIMESTAMP column (``ts``), matching what DuckDB produces when it truncates
ns → us. All other tables are read as-is so filters/projections push down to
the parquet scan untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        # ts div 1000 == floor division: identical to DuckDB's ns→us truncation
        # for post-epoch data. Keep nanos for exact arithmetic.
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register temp views so suite queries can be written in Spark SQL."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
