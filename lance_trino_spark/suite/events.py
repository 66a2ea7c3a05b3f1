"""Event-stream analytics over the `events` table (batch shapes; the
streaming variants live in lance_trino_spark/streaming/).

Every time computation here works in *microseconds* (`ts_ns div 1000` on the
Spark side — tables._normalize_events guarantees `ts_ns` exists for every
physical timestamp encoding the driver generates — and `epoch_us(ts)` on the
DuckDB side) and uses integer floor-division, so both engines agree exactly.
Outputs are epoch integers, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import load_table
from . import register
from .relational import dsum


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )


# ---------------------------------------------------------------------------
# e01 — time-bucketed aggregation (the batch form of a streaming windowed agg).
# ---------------------------------------------------------------------------
@register(
    "e01_hourly_event_stats",
    oracle="""
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, hour_epoch
    """,
    doc="hourly tumbling-window aggregation over events",
    tags=("events", "agg", "time"),
)
def e01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    # hour bucket = floor(us / 3600e6) * 3600 seconds — identical to
    # date_trunc('hour') for post-epoch data.
    hour_epoch = (F.expr("ts_us div 3600000000") * 3600).cast("bigint")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", hour_epoch.alias("hour_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 6, "total_value"),
        )
        .orderBy("event_type", "hour_epoch")
    )


# ---------------------------------------------------------------------------
# e02 — sessionization: gap > 30 min starts a new session (lag window +
# cumulative sum). The classic stateful-stream op expressed relationally.
# ---------------------------------------------------------------------------
# Shared by e02 (batch sessionization) and st02 (streaming session_window) —
# one source of truth so the two oracles cannot drift apart.
SESSIONIZATION_ORACLE = """
    WITH ts_t AS (
      SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
    marked AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ts_t
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked)
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           CAST(SUM(session_len) AS BIGINT) AS n_events,
           CAST(MAX(session_len) AS BIGINT) AS max_session_events
    FROM (SELECT user_id, session_id, COUNT(*) AS session_len
          FROM sessions GROUP BY user_id, session_id) s
    GROUP BY user_id
    ORDER BY user_id
    """


@register(
    "e02_sessionization",
    oracle=SESSIONIZATION_ORACLE,
    doc="sessionization via lag + cumulative window (30 min gap)",
    tags=("events", "window", "session"),
)
def e02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select("user_id", "event_id", "ts_us").withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    w_cum = (
        W.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w_cum))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("session_len")
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.sum("session_len").alias("n_events"),
            F.max("session_len").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# e03 — funnel: signup → first purchase conversion lag per user.
# ---------------------------------------------------------------------------
@register(
    "e03_funnel_conversion",
    oracle="""
    WITH first_signup AS (
      SELECT user_id, MIN(CAST(epoch_us(ts) AS BIGINT)) AS signup_us
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    first_purchase AS (
      SELECT user_id, MIN(CAST(epoch_us(ts) AS BIGINT)) AS purchase_us
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT s.user_id AS user_id,
           (p.purchase_us - s.signup_us) // 1000000 AS lag_seconds
    FROM first_signup s JOIN first_purchase p ON s.user_id = p.user_id
    WHERE p.purchase_us > s.signup_us
    ORDER BY user_id
    """,
    doc="signup→purchase funnel conversion lag",
    tags=("events", "join"),
)
def e03(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    return (
        signup.join(purchase, F.col("user_id") == F.col("p_user"))
        .filter(F.col("purchase_us") > F.col("signup_us"))
        .select(
            "user_id",
            F.expr("(purchase_us - signup_us) div 1000000").alias("lag_seconds"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# e04 — top users by exact purchase value.
# ---------------------------------------------------------------------------
@register(
    "e04_top_purchasers",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 25
    """,
    doc="top-k users by exact purchase value",
    tags=("events", "topk"),
)
def e04(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            dsum("value", 6, "total_value"),
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
        )
        .orderBy(F.col("total_value").desc(), "user_id")
        .limit(25)
    )

# ---------------------------------------------------------------------------
# e05 — semi-structured JSON property extraction + aggregation. The events
# `props` column is a JSON document; extraction stays JVM-side
# (get_json_object) so the scan never leaves codegen.
# ---------------------------------------------------------------------------
@register(
    "e05_json_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(MIN(k) AS INT) AS k_min,
           CAST(MAX(k) AS INT) AS k_max,
           COUNT(DISTINCT k) AS k_distinct
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events) t
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON property extraction (props->k) + per-type aggregation",
    tags=("events", "json"),
)
def e05(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.countDistinct("k").alias("k_distinct"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# e06 — cohort retention: users grouped by first-seen week (cohort), counted
# in each later activity week. Weeks are integer floor-divisions of epoch
# microseconds, so both engines bucket identically with no calendar logic.
# ---------------------------------------------------------------------------
@register(
    "e06_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS week
      FROM events),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id)
    SELECT c.cohort_week,
           w.week - c.cohort_week AS week_offset,
           COUNT(DISTINCT w.user_id) AS n_users
    FROM wk w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY c.cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    doc="weekly cohort retention matrix (first-seen week x activity week)",
    tags=("events", "retention", "window"),
)
def e06(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    wk = ev.select(
        "user_id", F.expr("ts_us div 604800000000").alias("week")
    ).distinct()
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# e07 — as-of join (union-window composition, operators/asof.py): each error
# event picks up the user's most recent purchase value at-or-before it. The
# DuckDB oracle uses its native ASOF JOIN — two independent implementations
# of the same semantics.
# ---------------------------------------------------------------------------
@register(
    "e07_asof_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, value,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events),
    err AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error'),
    purch AS (
      SELECT user_id, ts_us, MAX(value) AS last_purchase_value
      FROM ev WHERE event_type = 'purchase'
      GROUP BY user_id, ts_us)
    SELECT e.event_id, e.user_id, e.ts_us, p.last_purchase_value
    FROM err e ASOF LEFT JOIN purch p
      ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
    ORDER BY e.event_id
    """,
    doc="as-of join: latest prior purchase value per error event",
    tags=("events", "asof", "join"),
)
def e07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = _ev(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_us"
    )
    # one right row per (key, ts): the asof determinism contract
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("last_purchase_value"))
    )
    return asof_join(
        errors,
        purchases,
        key_cols=["user_id"],
        left_ts="ts_us",
        right_ts="ts_us",
        payload_cols=["last_purchase_value"],
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# e08 — KMV distinct-count sketch (operators/sketches.py): engine-portable
# bottom-k estimate, exact DuckDB replica of the same arithmetic — unlike
# HLL-based approx_count_distinct, which can never be oracle-compared.
# ---------------------------------------------------------------------------
@register(
    "e08_kmv_distinct_sketch",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashed),
    kept AS (SELECT * FROM ranked WHERE rn <= 64),
    sk AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS kth_hash
      FROM kept GROUP BY event_type)
    SELECT s.event_type, s.n_kept, s.kth_hash,
           CASE WHEN s.n_kept < 64 THEN CAST(s.n_kept AS DOUBLE)
                ELSE 63.0 * 4294967296.0 / CAST(s.kth_hash AS DOUBLE)
           END AS kmv_estimate,
           x.n_exact
    FROM sk s JOIN (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type) x
      ON s.event_type = x.event_type
    ORDER BY s.event_type
    """,
    doc="KMV bottom-k distinct sketch vs exact count, bit-identical engines",
    tags=("events", "sketch", "approx"),
)
def e08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_distinct

    # Explicit null-key filter BELOW kmv_distinct's spark_partition_id
    # projection: the inner join would infer isnotnull(event_type) anyway,
    # but an inferred filter cannot be pushed through a nondeterministic
    # projection — stated here it reaches the parquet scan (plan audit).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    sk = kmv_distinct(ev, "event_type", "user_id", k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return sk.join(exact, "event_type").orderBy("event_type")


# ---------------------------------------------------------------------------
# e09 — bucketed range join (operators/asof.py:range_join): error events
# landing inside the 1-hour window after each purchase by the same user.
# The oracle is the plain BETWEEN join — same semantics, independent plan.
# ---------------------------------------------------------------------------
@register(
    "e09_range_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events),
    purch AS (
      SELECT event_id AS purchase_id, user_id, ts_us AS start_us,
             ts_us + 3600000000 AS end_us
      FROM ev WHERE event_type = 'purchase'),
    err AS (SELECT event_id AS error_id, user_id, ts_us FROM ev
            WHERE event_type = 'error')
    SELECT p.purchase_id, COUNT(*) AS n_errors,
           CAST(MIN(e.error_id) AS BIGINT) AS first_error_id
    FROM err e JOIN purch p
      ON e.user_id = p.user_id
     AND e.ts_us >= p.start_us AND e.ts_us <= p.end_us
    GROUP BY p.purchase_id
    ORDER BY p.purchase_id
    """,
    doc="bucketed interval join: errors within 1h after each purchase",
    tags=("events", "range-join"),
)
def e09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import range_join

    ev = _ev(spark, sf_dir)
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + 3_600_000_000).alias("end_us"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts_us"
    )
    joined = range_join(
        err,
        purch,
        key_cols=["user_id"],
        left_point="ts_us",
        right_start="start_us",
        right_end="end_us",
        bucket_width=3_600_000_000,
    )
    return (
        joined.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_errors"),
            F.min("error_id").alias("first_error_id"),
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# e10 — ordered-funnel sequence matching (operators/funnel.py): earliest
# signup → first view after it → first purchase after that, completion
# within 7 days. First-occurrence milestone semantics are replicated by the
# oracle as a chain of min-aggregate CTEs.
# ---------------------------------------------------------------------------
@register(
    "e10_funnel_sequence",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      FROM events),
    s0 AS (SELECT user_id, MIN(ts_us) AS t_0 FROM ev
           WHERE event_type = 'signup' GROUP BY user_id),
    s1 AS (SELECT e.user_id, MIN(e.ts_us) AS t_1
           FROM ev e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'view' AND e.ts_us > s0.t_0
           GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t_2
           FROM ev e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts_us > s1.t_1
           GROUP BY e.user_id)
    SELECT s0.user_id, s0.t_0, s1.t_1, s2.t_2,
           (s2.t_2 IS NOT NULL AND s2.t_2 - s0.t_0 <= 604800000000)
             AS completed
    FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
            LEFT JOIN s2 ON s0.user_id = s2.user_id
    ORDER BY s0.user_id
    """,
    doc="ordered funnel: signup -> view -> purchase within 7 days",
    tags=("events", "funnel", "sequence"),
)
def e10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import funnel_milestones

    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts_us")
    return funnel_milestones(
        ev,
        steps=["signup", "view", "purchase"],
        max_span=7 * 24 * 3600 * 1_000_000,
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# e11 — count-min sketch heavy hitters (operators/sketches.py cms_counts /
# cms_estimate): bounded-memory frequency estimation with engine-portable
# integer arithmetic — DuckDB builds the identical 4x256 sketch, so
# estimates hash-compare exactly. The no_undercount column asserts the CMS
# invariant (estimate >= true count) in-query.
# ---------------------------------------------------------------------------
@register(
    "e11_cms_heavy_hitters",
    oracle="""
    WITH rows_ AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(r)),
    bucketed AS (
      SELECT r.r AS row_,
             (('0x' || substr(md5('cms' || r.r || ':' ||
               CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT % 256) AS bucket
      FROM events e CROSS JOIN rows_ r
      WHERE e.user_id IS NOT NULL),
    sk AS (SELECT row_, bucket, COUNT(*) AS cnt
           FROM bucketed GROUP BY row_, bucket),
    cand AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
    probes AS (
      SELECT c.user_id, r.r AS row_,
             (('0x' || substr(md5('cms' || r.r || ':' ||
               CAST(c.user_id AS VARCHAR)), 1, 8))::BIGINT % 256) AS bucket
      FROM cand c CROSS JOIN rows_ r),
    est AS (
      SELECT p.user_id, MIN(COALESCE(s.cnt, 0)) AS cms_estimate
      FROM probes p LEFT JOIN sk s ON s.row_ = p.row_ AND s.bucket = p.bucket
      GROUP BY p.user_id),
    exact AS (SELECT user_id, COUNT(*) AS n_exact FROM events
              WHERE user_id < 20 GROUP BY user_id)
    SELECT e.user_id, est.cms_estimate, e.n_exact,
           est.cms_estimate >= e.n_exact AS no_undercount
    FROM est JOIN exact e ON est.user_id = e.user_id
    ORDER BY e.user_id
    """,
    doc="count-min sketch frequency estimates vs exact counts, CMS "
        "invariant asserted in-query",
    tags=("events", "sketch", "approx"),
)
def e11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import cms_counts, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    sk = cms_counts(ev, "user_id")
    cand = ev.filter(F.col("user_id") < 20).select("user_id").distinct()
    est = cms_estimate(sk, cand, "user_id")
    exact = (
        ev.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "cms_estimate",
            "n_exact",
            (F.col("cms_estimate") >= F.col("n_exact")).alias("no_undercount"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# e12 — HyperLogLog distinct sketch (operators/sketches.hll_distinct): the
# fixed-register companion to e08's KMV. Registers are 2^8 integers per
# group — map-side partial MAX bounds the exchange at 256 rows per group
# per partition regardless of distinct count, and registers merge across
# windows/datasets with plain MAX. All-integer until the final division
# (no logarithms), so DuckDB replays it bit-for-bit; the numerator
# constant alpha*m^2*2^25 is inlined as the identical double literal in
# both engines.
# ---------------------------------------------------------------------------
@register(
    "e12_hll_distinct_sketch",
    oracle="""
    WITH hashed AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL),
    keyed AS (
      SELECT event_type,
             CAST(h // 16777216 AS INT) AS bucket,
             CASE WHEN h % 16777216 = 0 THEN 25
                  ELSE 24 - (length(printf('%b', h % 16777216)) - 1)
             END AS rank
      FROM hashed),
    regs AS (
      SELECT event_type, bucket, MAX(rank) AS mr
      FROM keyed GROUP BY event_type, bucket),
    agg AS (
      SELECT event_type, COUNT(*) AS nonempty,
             SUM(1 << (25 - mr)) AS isum
      FROM regs GROUP BY event_type),
    sk AS (
      SELECT event_type,
             CAST(256 - nonempty AS BIGINT) AS empty_buckets,
             CAST(isum + (256 - nonempty) * 33554432 AS BIGINT)
               AS rank_checksum
      FROM agg)
    SELECT s.event_type, s.empty_buckets, s.rank_checksum,
           CAST(FLOOR(1579498136381.3938 / s.rank_checksum) AS BIGINT)
             AS hll_estimate,
           x.n_exact
    FROM sk s JOIN (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type) x
      ON s.event_type = x.event_type
    ORDER BY s.event_type
    """,
    doc="HyperLogLog distinct sketch per event_type vs exact count, "
        "bit-identical across engines (fixed 256-register state)",
    tags=("events", "sketch", "hll"),
)
def e12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_distinct

    ev = load_table(spark, sf_dir, "events")
    sk = hll_distinct(ev, ["event_type"], "user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return sk.join(exact, "event_type").orderBy("event_type")


# ---------------------------------------------------------------------------
# e13 — HLL register MERGE: per-day register tables rolled up to the full
# window with plain MAX, versus sketching the union directly. Merge is
# lossless by construction (MAX is associative), so merged == direct
# EXACTLY — asserted in-query as merge_exact and value-checked by the
# oracle, which computes the direct estimate once and emits it for both
# columns. This is the property that makes fixed-register sketches the
# 100 TB answer: per-day/per-shard sketches roll up to any window without
# touching raw data again.
# ---------------------------------------------------------------------------
@register(
    "e13_hll_register_merge",
    oracle="""
    WITH hashed AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL),
    keyed AS (
      SELECT event_type,
             CAST(h // 16777216 AS INT) AS bucket,
             CASE WHEN h % 16777216 = 0 THEN 25
                  ELSE 24 - (length(printf('%b', h % 16777216)) - 1)
             END AS rank
      FROM hashed),
    regs AS (
      SELECT event_type, bucket, MAX(rank) AS mr
      FROM keyed GROUP BY event_type, bucket),
    agg AS (
      SELECT event_type, COUNT(*) AS nonempty, SUM(1 << (25 - mr)) AS isum
      FROM regs GROUP BY event_type),
    est AS (
      SELECT event_type,
             CAST(FLOOR(1579498136381.3938 /
                  (isum + (256 - nonempty) * 33554432)) AS BIGINT) AS e
      FROM agg)
    SELECT event_type, e AS merged_estimate, e AS direct_estimate,
           TRUE AS merge_exact
    FROM est
    ORDER BY event_type
    """,
    doc="HLL register merge: per-day sketches rolled up with MAX equal the "
        "direct sketch exactly (lossless mergeability)",
    tags=("events", "sketch", "hll", "merge"),
)
def e13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_distinct, hll_merge, hll_registers

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_registers(ev, ["event_type", "day"], "user_id")
    merged = hll_merge(daily, ["event_type"]).select(
        "event_type", F.col("hll_estimate").alias("merged_estimate")
    )
    direct = hll_distinct(ev, ["event_type"], "user_id").select(
        "event_type", F.col("hll_estimate").alias("direct_estimate")
    )
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "merged_estimate",
            "direct_estimate",
            (F.col("merged_estimate") == F.col("direct_estimate")).alias(
                "merge_exact"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# e14 — ROLLING distinct users via HLL register merge: per-(event_type,
# day) register tables, then each day's trailing-7-day window is a MAX-
# merge of its days' registers — the production pattern for rolling
# uniques at scale (no day's raw data is ever re-read; the sliding join
# moves only 2^8-integer sketches). The oracle recomputes each window's
# registers directly from the raw events — merge losslessness makes the
# two byte-identical.
# ---------------------------------------------------------------------------
@register(
    "e14_rolling_hll_uniques",
    oracle="""
    WITH hashed AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL),
    days AS (SELECT DISTINCT event_type, day FROM hashed),
    win AS (
      SELECT d.event_type, d.day, h.h
      FROM days d JOIN hashed h
        ON h.event_type = d.event_type
       AND h.day BETWEEN d.day - INTERVAL 6 DAY AND d.day),
    keyed AS (
      SELECT event_type, day,
             CAST(h // 16777216 AS INT) AS bucket,
             CASE WHEN h % 16777216 = 0 THEN 25
                  ELSE 24 - (length(printf('%b', h % 16777216)) - 1)
             END AS rank
      FROM win),
    regs AS (
      SELECT event_type, day, bucket, MAX(rank) AS mr
      FROM keyed GROUP BY event_type, day, bucket),
    agg AS (
      SELECT event_type, day, COUNT(*) AS nonempty,
             SUM(1 << (25 - mr)) AS isum
      FROM regs GROUP BY event_type, day)
    SELECT event_type, CAST(day AS DATE) AS day,
           CAST(isum + (256 - nonempty) * 33554432 AS BIGINT)
             AS rank_checksum,
           CAST(FLOOR(1579498136381.3938 /
                (isum + (256 - nonempty) * 33554432)) AS BIGINT)
             AS rolling_uniques
    FROM agg
    ORDER BY event_type, day
    """,
    doc="rolling 7-day distinct users per event_type from MAX-merged daily "
        "HLL registers (sketch slide, raw data read once)",
    tags=("events", "sketch", "hll", "window"),
)
def e14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate_from_registers

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    from ..operators.sketches import hll_registers

    daily = hll_registers(ev, ["event_type", "day"], "user_id").alias("d")
    days = (
        daily.select("event_type", "day").distinct()
        .select(
            F.col("event_type").alias("w_event_type"),
            F.col("day").alias("win_day"),
        )
        .alias("w")
    )
    # sketch slide: each window day MAX-merges its trailing 7 days' tiny
    # register tables — the only join input is (groups x 256) sketch rows
    slid = daily.join(
        days,
        (F.col("d.event_type") == F.col("w.w_event_type"))
        & F.col("d.day").between(
            F.date_sub(F.col("w.win_day"), 6), F.col("w.win_day")
        ),
    ).select(
        F.col("w.w_event_type").alias("event_type"),
        "win_day", "_bucket", "_mr",
    )
    merged = slid.groupBy("event_type", "win_day", "_bucket").agg(
        F.max("_mr").alias("_mr")
    )
    est = hll_estimate_from_registers(merged, ["event_type", "win_day"])
    return est.select(
        "event_type",
        F.col("win_day").alias("day"),
        "rank_checksum",
        F.col("hll_estimate").alias("rolling_uniques"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# e15 — integer-histogram quantile sketch (operators/sketches
# .quantile_sketch): the rank-query member of the sketch family (HLL/KMV =
# distinct, count-min = frequency). Fixed-width buckets over exact cents,
# quantile = lower bound of the first bucket reaching ceil(q*n) cumulative
# count — all-integer, so DuckDB replays it bit-for-bit where
# t-digest/KLL float centroids never could. Histograms merge by adding
# counts (same rollup property as HLL registers).
# ---------------------------------------------------------------------------
@register(
    "e15_quantile_sketch",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS pri,
             CAST(FLOOR(CAST(o_totalprice AS DECIMAL(38,2)) * 100) AS BIGINT)
               // 10000 AS bucket
      FROM orders WHERE o_totalprice IS NOT NULL),
    h AS (SELECT pri, bucket, COUNT(*) AS cnt FROM b GROUP BY pri, bucket),
    c AS (SELECT pri, bucket, cnt,
                 SUM(cnt) OVER (PARTITION BY pri ORDER BY bucket) AS cum,
                 SUM(cnt) OVER (PARTITION BY pri) AS n_rows
          FROM h)
    SELECT pri AS o_orderpriority,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MIN(CASE WHEN cum >= CEIL(n_rows * 0.5)
                    THEN bucket * 10000 END) AS BIGINT) AS q50_cents,
           CAST(MIN(CASE WHEN cum >= CEIL(n_rows * 0.95)
                    THEN bucket * 10000 END) AS BIGINT) AS q95_cents,
           CAST(MIN(CASE WHEN cum >= CEIL(n_rows * 0.99)
                    THEN bucket * 10000 END) AS BIGINT) AS q99_cents
    FROM c
    GROUP BY pri
    ORDER BY pri
    """,
    doc="integer-histogram quantile sketch per order priority: bucketed "
        "exact cents, rank via cumulative counts, engine-exact",
    tags=("events", "sketch", "quantile"),
)
def e15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import quantile_sketch

    orders = load_table(spark, sf_dir, "orders")
    return quantile_sketch(
        orders, ["o_orderpriority"], "o_totalprice",
        bucket_width_cents=10_000,
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# e16 — last-touch attribution: each purchase is credited to the user's
# most recent preceding view/click (or 'direct' when none). The classic
# marketing-attribution window shape: one IGNORE-NULLS last() over a
# (user, time)-ordered frame ending 1 row before current — single shuffle
# on user_id, no self-join (the naive formulation is an inequality
# self-join that explodes quadratically in events-per-user).
# ---------------------------------------------------------------------------
@register(
    "e16_last_touch_attribution",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events)
    SELECT COALESCE(touch, 'direct') AS touch,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS value_c
    FROM e
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="events: last-touch purchase attribution (IGNORE NULLS window, "
        "no self-join)",
    tags=("events", "window", "attribution"),
)
def e16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("direct")).alias("touch"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast(
                    "decimal(28,0)"
                )
            ).cast("long").alias("value_c"),
        )
        .orderBy("touch")
    )
