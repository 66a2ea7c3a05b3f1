"""As-of (time-travel) join: for each left row, the most recent right row at
or before the left row's timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do; the reference connector
inherits nothing like it from Trino either — this is a beyond-reference
pipeline operator). The scalable composition used here is the union-window
form:

  1. union left and right rows on (key, ts), tagging the side;
  2. one window per key ordered by (ts, side) carries the right payload
     forward with last(..., ignorenulls=True) over a SINGLE struct of all
     payload columns — the match is atomic, so a matched right row's NULL
     payload fields stay NULL and multiple payload columns can never mix
     values from different right rows (true ASOF semantics);
  3. keep only left rows — each now holds the latest right payload with
     right_ts <= left_ts.

Cost shape at 100 TB: ONE shuffle of left+right keyed by the join key (the
same exchange a plain join would pay), then a linear in-partition sort —
no per-row subqueries, no range cross-products, no Python. Skewed keys are
handled by AQE the same way any window op is.

Determinism contract: callers must ensure at most one right row per
(key, ts) (pre-aggregate otherwise) — among equal timestamps "the" most
recent row is undefined in every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right row
    with ``right_ts <= left_ts`` (``< left_ts`` when ``strict``) on the same
    key, or nulls when no prior right row exists.

    ``key_cols`` must exist under the same names on both sides;
    ``payload_cols`` are the right-side columns to carry (they must not
    collide with left column names). Every left column is preserved.
    """
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {overlap}")
    missing = [k for k in key_cols if k not in right.columns]
    if missing:
        raise ValueError(f"key columns missing on right side: {missing}")
    from pyspark.sql.types import StructField, StructType

    # side ordering at equal ts: inclusive (<=) wants right rows sorted
    # BEFORE left rows so a same-ts right payload is visible; strict (<)
    # wants them after.
    right_side, left_side = (0, 1) if not strict else (1, 0)
    # ONE nullable struct holds the whole right payload: the carried value is
    # then atomically from a single right row, and its NULL *fields* survive
    # (a per-column last(ignorenulls) would skip back to an older non-null
    # value and could mix payloads from different right rows).
    payload_struct = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(payload_struct).alias("_r"),
    )
    r_tagged = right.select(
        *[
            (F.col(c) if c in key_cols else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(right_side).alias("_side"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_r"),
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy("_asof_ts", "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        F.col("_side"),
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return carried.filter(F.col("_side") == left_side).select(
        *left.columns,
        *[F.col(f"_r.{c}").alias(c) for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval range join without a nested-loop plan: every left
    row joins the right intervals containing its point, per key.

    Spark plans `l.ts BETWEEN r.start AND r.end` (plus an equi-key) as a
    hash join on the key with the range as a post-join filter — fine until
    one key holds many intervals. This composition buckets TIME as well:
    intervals are exploded to the fixed-width buckets they overlap, points
    map to exactly one bucket, and the join becomes a pure equi-join on
    (key, bucket) with the precise range check as a residual filter. Join
    fan-in per (key, bucket) is bounded by interval density per bucket —
    the standard interval-bucketing recipe. A left point falls in exactly
    one bucket, so no dedup pass is needed.

    ``bucket_width`` should be on the order of typical interval length:
    much smaller explodes intervals into many buckets; much larger degrades
    toward the per-key hash join.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{right_start} div {bucket_width}"),
                F.expr(f"{right_end} div {bucket_width}"),
            )
        ),
    )
    l_b = left.withColumn("_bucket", F.expr(f"{left_point} div {bucket_width}"))
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in key_cols] + [
        F.col("l._bucket") == F.col("r._bucket"),
        F.col(f"l.{left_point}") >= F.col(f"r.{right_start}"),
        F.col(f"l.{left_point}") <= F.col(f"r.{right_end}"),
    ]
    joined = l_b.alias("l").join(r.alias("r"), cond)
    keep_r = [c for c in right.columns if c not in set(left.columns)]
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in keep_r],
    )
