"""Deterministic sketching: KMV distinct counts + count-min frequencies.

Spark's approx_count_distinct (HLL++) and DuckDB's approx functions use
different sketch internals, so their estimates can never be compared across
engines. KMV gives the same statistical service — a bounded-memory distinct
estimate whose error shrinks as k grows — from *engine-portable* arithmetic:
the k smallest md5-derived 32-bit hashes of the value set determine the
estimate exactly, so two engines computing KMV over the same data agree
bit-for-bit (see Bar-Yossef et al. 2002, the classic KMV bottom-k paper).

estimate = (k-1) * 2^32 / h_k     (h_k = k-th smallest distinct hash)
exact    = |values|               when the group has fewer than k distincts

Scale shape — a two-level bottom-k aggregate, not a sort:

1. level 1, keyed (group, spark_partition_id): collect the task-local
   distinct hash set and truncate it to its k smallest
   (`slice(array_sort(collect_set))`). Each key lives in exactly one map
   task, so level-1 state is the task-local distinct count — the same
   dedup work a plain DISTINCT's map side does, with the same partial-set
   exchange bytes — but the OUTPUT of level 1 is at most k hashes per
   (group, partition).
2. level 2, keyed group: merge the truncated arrays (flatten →
   array_distinct → array_sort → slice k). Union of per-partition
   bottom-ks always contains the global bottom-k, so the merge is exact,
   and — the point of the two levels — the per-group reduce buffer is
   bounded by (#partitions holding the group) × k, never the group's full
   distinct set, and no per-group global sort ever runs (the old
   row_number() window shape this replaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import h32

HASH_SPACE = 1 << 32  # h32 range


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_counts(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of a value column: (row, bucket, cnt) counters.

    The frequency-estimation companion to the KMV distinct sketch — the
    bounded-memory answer to "how often does each value occur" over a
    stream/corpus too large to count exactly. Engine-portable: bucket =
    md5-derived 32-bit hash of 'cms<row>:<value>' mod width, all integer
    arithmetic, so DuckDB builds the identical sketch.

    Scale shape: one explode(depth) projection, then ONE aggregation whose
    map-side combine collapses every partition to at most depth x width
    counter rows before the exchange — the sketch never exceeds
    depth x width rows no matter the input size.
    """
    rows = F.array(*[F.lit(i) for i in range(depth)])
    # NULL values are excluded from the sketch (a NULL hashes to a NULL
    # bucket in every engine — meaningless counter). Stated BEFORE the
    # explode so the predicate reaches the scan.
    bucketed = df.filter(F.col(value_col).isNotNull()).select(
        F.explode(rows).alias("row"),
        F.col(value_col).cast("string").alias("_v"),
    ).select(
        "row",
        (
            h32(F.concat(F.lit("cms"), F.col("row"), F.lit(":"), F.col("_v")))
            % F.lit(width)
        ).alias("bucket"),
    )
    return bucketed.groupBy("row", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate frequencies for `values` from a cms_counts sketch:
    min over rows of the value's bucket counter (the CMS upper bound —
    estimate >= true count always; collisions only inflate). The sketch is
    depth x width rows, broadcast to the (usually small) candidate set."""
    probes = values.select(
        F.col(value_col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row"),
    ).select(
        value_col,
        "row",
        (
            h32(
                F.concat(
                    F.lit("cms"), F.col("row"), F.lit(":"),
                    F.col(value_col).cast("string"),
                )
            )
            % F.lit(width)
        ).alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    return joined.groupBy(value_col).agg(F.min("cnt").alias("cms_estimate"))


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
    )
    # Level 1: local bottom-k per (group, input partition). spark_partition_id
    # makes every group key unique to its map task, so the hash aggregate
    # finishes map-side and the exchange carries <= k hashes per group per
    # partition — never the distinct value set.
    local = (
        hashed.withColumn("_pid", F.spark_partition_id())
        .groupBy(group_col, "_pid")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("_lo"))
    )
    # Level 2: exact merge of the truncated sets.
    kept = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_lo")))), 1, k
    )
    merged = local.groupBy(group_col).agg(kept.alias("_kept"))
    n_kept = F.size("_kept")
    return merged.select(
        group_col,
        n_kept.cast("bigint").alias("n_kept"),
        F.element_at("_kept", n_kept).alias("kth_hash"),
        F.when(n_kept < k, n_kept.cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(float(HASH_SPACE))
            / F.element_at("_kept", F.lit(k)).cast("double")
        )
        .alias("kmv_estimate"),
    )


HLL_P = 8  # 2^8 = 256 buckets, ~6.5% standard error


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """Engine-portable HyperLogLog distinct estimate per group.

    The classic HLL (Flajolet et al. 2007) from the same md5-derived 32-bit
    hash as the KMV sketch, all-integer until the final estimate division:
    bucket = top p bits, rank = leading-zero count of the remaining
    (32-p)-bit word + 1, registers = per-bucket MAX(rank). The denominator
    sum 2^-M_j is carried as the exact integer sum(1 << (maxrank - M_j))
    (empty buckets contribute 1 << maxrank), so two engines agree
    bit-for-bit — no logarithms anywhere (the small-range linear-counting
    branch is deliberately omitted for that reason; `empty_buckets` is
    emitted so a consumer can apply it).

    Scale shape — the reason HLL beats KMV at 100 TB: register state is a
    FIXED 2^p integers per group. Stage 1 (group, bucket) MAX(rank) is a
    map-side partial max — each partition contributes at most 2^p rows per
    group to the exchange regardless of its distinct count (KMV's level-1
    state is the task-local distinct set). Stage 2 merges 2^p rows per
    group. Registers are also trivially mergeable across datasets/time
    windows (MAX is associative), which bottom-k union is not without
    re-truncation.

    Output: group_cols, empty_buckets, rank_checksum (the exact integer
    denominator — a strong cross-engine validation value), hll_estimate
    (BIGINT floor of alpha_m * m^2 / sum 2^-M_j).
    """
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """The register table alone: (group_cols, _bucket, _mr). Registers are
    the MERGEABLE representation — MAX over buckets combines sketches built
    on disjoint (or overlapping!) slices of the data with no loss, the
    property that lets per-day/per-shard sketches roll up to any window
    without touching raw data (see hll_merge)."""
    m = 1 << p
    wbits = 32 - p
    maxrank = wbits + 1
    h = h32(F.col(value_col).cast("string"))
    w = h % F.lit(1 << wbits)
    rank = (
        F.when(w == 0, F.lit(maxrank))
        .otherwise(F.lit(wbits) - (F.length(F.bin(w)) - 1))
    )
    keyed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        (h / F.lit(1 << wbits)).cast("int").alias("_bucket"),
        rank.alias("_rank"),
    )
    return keyed.groupBy(*group_cols, "_bucket").agg(
        F.max("_rank").alias("_mr")
    )


def hll_merge(
    registers: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    """Merge register tables down to coarser groups (drop key columns from
    group_cols) and estimate: MAX per bucket, then the estimate formula.
    Exactly equal to sketching the union directly — asserted by suite e13."""
    merged = registers.groupBy(*group_cols, "_bucket").agg(
        F.max("_mr").alias("_mr")
    )
    return hll_estimate_from_registers(merged, group_cols, p)


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: list[str], p: int = HLL_P
) -> DataFrame:
    m = 1 << p
    maxrank = (32 - p) + 1
    per_group = registers.groupBy(*group_cols).agg(
        F.count("*").alias("_nonempty"),
        F.sum(F.expr(f"shiftleft(1L, {maxrank} - _mr)")).alias("_isum"),
    )
    alpha = 0.7213 / (1 + 1.079 / m)  # standard HLL bias constant, m >= 128
    isum_full = F.col("_isum") + (F.lit(m) - F.col("_nonempty")) * F.lit(
        1 << maxrank
    )
    return per_group.select(
        *group_cols,
        (F.lit(m) - F.col("_nonempty")).alias("empty_buckets"),
        isum_full.alias("rank_checksum"),
        F.floor(
            F.lit(alpha * m * m * (1 << maxrank)) / isum_full
        ).cast("bigint").alias("hll_estimate"),
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    bucket_width_cents: int = 10_000,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Engine-portable quantile sketch: a fixed-width integer histogram
    over exact cents. Completes the sketch family (HLL/KMV = distinct,
    count-min = frequency, this = rank): per group, values are floored to
    cents, bucketed by `bucket_width_cents`, and each requested quantile is
    answered with the LOWER BOUND (in cents) of the first bucket whose
    cumulative count reaches ceil(q * n) — all-integer arithmetic, so two
    engines agree bit-for-bit, unlike t-digest/KLL whose float centroids
    cannot be replayed across engines.

    Error bound: one bucket width. Scale shape: one groupBy(group, bucket)
    with map-side combine (state = occupied buckets per group, bounded by
    value range / width), then a per-group sorted fold over that SMALL
    bucket array — never a sort or window over the raw rows. Histograms
    merge across shards/windows by adding counts (associative), the same
    rollup property as the HLL registers.

    Output: group_cols, n_rows, then q<NN>_cents (BIGINT lower bound) per
    requested quantile."""
    bucketed = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        (
            F.floor(F.col(value_col).cast("decimal(38,2)") * 100)
            .cast("bigint") / F.lit(bucket_width_cents)
        ).cast("bigint").alias("_bucket"),
    )
    hist = bucketed.groupBy(*group_cols, "_bucket").agg(
        F.count("*").alias("_cnt")
    )
    per_group = hist.groupBy(*group_cols).agg(
        F.sum("_cnt").alias("n_rows"),
        F.array_sort(
            F.collect_list(F.struct("_bucket", "_cnt"))
        ).alias("_h"),
    )
    out_cols = [*group_cols, "n_rows"]
    for q in quantiles:
        name = f"q{str(q)[2:].ljust(2, '0')}_cents"
        target = F.ceil(F.col("n_rows") * F.lit(q)).cast("bigint")
        # fold the (tiny) sorted bucket array: first bucket whose cumulative
        # count reaches the target rank
        expr = F.aggregate(
            "_h",
            F.struct(
                F.lit(0).cast("bigint").alias("cum"),
                F.lit(None).cast("bigint").alias("ans"),
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["_cnt"]).alias("cum"),
                F.when(
                    acc["ans"].isNull()
                    & ((acc["cum"] + x["_cnt"]) >= target),
                    x["_bucket"] * F.lit(bucket_width_cents),
                ).otherwise(acc["ans"]).alias("ans"),
            ),
            lambda acc: acc["ans"],
        )
        per_group = per_group.withColumn(name, expr)
        out_cols.append(name)
    return per_group.select(*out_cols)
