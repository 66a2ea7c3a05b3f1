"""As-of (time-travel) join: for each left row, the most recent right row at
or before the left row's timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do; the reference connector
inherits nothing like it from Trino either — this is a beyond-reference
pipeline operator). The scalable composition used here is the union-window
form:

  1. union left and right rows on (key, ts), tagging the side;
  2. one window per key ordered by (ts, side) carries the right payload
     forward with last(..., ignorenulls=True);
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
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left columns: {overlap}")
    missing = [k for k in key_cols if k not in right.columns]
    if missing:
        raise ValueError(f"key columns missing on right side: {missing}")
    # side ordering at equal ts: inclusive (<=) wants right rows sorted
    # BEFORE left rows so a same-ts right payload is visible; strict (<)
    # wants them after.
    right_side, left_side = (0, 1) if not strict else (1, 0)
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(left_side).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in payload_cols
        ],
    )
    r_tagged = right.select(
        *[
            (F.col(c) if c in key_cols else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(right_side).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy("_asof_ts", "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        F.col("_side"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("_side") == left_side).drop("_side")
