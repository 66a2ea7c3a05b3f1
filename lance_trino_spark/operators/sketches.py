"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark's approx_count_distinct (HLL++) and DuckDB's approx functions use
different sketch internals, so their estimates can never be compared across
engines. KMV gives the same statistical service — a bounded-memory distinct
estimate whose error shrinks as k grows — from *engine-portable* arithmetic:
the k smallest md5-derived 32-bit hashes of the value set determine the
estimate exactly, so two engines computing KMV over the same data agree
bit-for-bit (see Bar-Yossef et al. 2002, the classic KMV bottom-k paper).

estimate = (k-1) * 2^32 / h_k     (h_k = k-th smallest distinct hash)
exact    = |values|               when the group has fewer than k distincts

Scale shape: distinct-(group, hash) is one shuffle; ranking the k smallest
per group is a per-group sort that spills via Spark's window machinery. At
100 TB with bounded k the surviving state per group is k rows — the same
memory contract as any bottom-k sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import h32

HASH_SPACE = 1 << 32  # h32 range


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate: (group, n_kept, kth_hash,
    kmv_estimate). ``n_kept`` < k means the group had fewer than k distinct
    values and the estimate is exact."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = df.select(
        F.col(group_col), h32(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    w = W.partitionBy(group_col).orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        kept.groupBy(group_col)
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
        .select(
            group_col,
            "n_kept",
            "kth_hash",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / F.col("kth_hash").cast("double")
            )
            .alias("kmv_estimate"),
        )
    )
