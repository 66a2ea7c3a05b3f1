"""Ordered-funnel sequence matching: the MATCH_RECOGNIZE-style "A then B
then C" milestone analysis over an event stream, per user.

Semantics (the standard product-analytics definition): milestone i is the
EARLIEST event of step i's type occurring strictly after milestone i-1;
the funnel completes when every step has a milestone (optionally within
``max_span`` of the first milestone). First-occurrence semantics make the
result deterministic and order-independent.

Scale shape: one per-user MIN aggregate per step (map-side combinable) and
one equi-join per step on the user key — each intermediate is one row per
user-that-reached-the-step, monotonically shrinking down the funnel. No
window over raw events, no per-user event sorting, no Python. At 100 TB
the dominant cost is the first aggregate over the full stream; every later
stage touches only funnel survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_milestones(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    max_span: int | None = None,
) -> DataFrame:
    """Per-user milestone timestamps t_0..t_{n-1} for the ordered ``steps``
    (null from the first missed step onward) plus ``completed`` — true when
    all steps happened in order (and within ``max_span`` of t_0 if set).
    Returns one row per user that reached at least step 0.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(cur.select(user_col, f"t_{i-1}"), user_col)
            .filter(F.col("_ts") > F.col(f"t_{i-1}"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t_{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    completed = F.col(f"t_{len(steps)-1}").isNotNull()
    if max_span is not None:
        completed = completed & (
            F.col(f"t_{len(steps)-1}") - F.col("t_0") <= F.lit(max_span)
        )
    return cur.withColumn("completed", completed)
