"""Structured Streaming analytics over the driver testdata tables.

Each operator reads the table as a *file-source stream* (``readStream``), so
the identical plan would run against a directory that keeps receiving new
parquet files on a real cluster. Results are drained with
``Trigger.AvailableNow`` into a named memory sink and returned as a batch
DataFrame so the suite can compare them against DuckDB oracles.

Determinism contract (matches suite/__init__.py):
  - double sums go through DECIMAL(38,6) (exact, order-independent) or are
    converted to integer cents *before* any Python boundary;
  - event time is microseconds (``ts_ns div 1000``), identical to DuckDB's
    ns→us truncation;
  - the single-parquet-file source (``stream_table``) yields exactly ONE
    data microbatch under AvailableNow, so update-mode emissions are final
    values there; ``stream_table_multibatch`` stages several slices with
    maxFilesPerTrigger to run the same plans across REAL microbatch
    boundaries (cross-trigger state), with monotone post-hoc reduction of
    the update-mode emissions.
"""

from __future__ import annotations

import itertools
import os
import re
import shutil
import tempfile
from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from ..functions import normalize_text
from ..session import apply_runtime_confs

if TYPE_CHECKING:  # pragma: no cover
    from collections.abc import Iterable

_SINK_IDS = itertools.count()


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source stream over one driver parquet table.

    Schema is taken from a metadata-only batch read of the same file. For
    ``events``, the timestamp column is normalized to ``ts_ns`` (exact
    BIGINT nanos) plus ``ts`` (microsecond TIMESTAMP — the event-time column
    for watermarks), exactly like ``tables.load_table``, for every physical
    encoding the driver has generated (timestamp[ns] or timestamp[us]).
    """
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    # The file stream source requires a *directory* it can keep listing for
    # new files; the testdata tables are single files, so stage a symlink
    # directory (a real deployment would point this at the ingest directory).
    stream_dir = os.path.join(
        tempfile.gettempdir(), "lts_stream", sf_dir.strip("/").replace("/", "_"), name
    )
    os.makedirs(stream_dir, exist_ok=True)
    def _ensure_link(link: str, target: str) -> None:
        # lexists (not exists) so a dangling symlink is repaired, and the
        # create races benignly under concurrent runs (e.g. pytest-xdist).
        if os.path.lexists(link) and (
                os.path.realpath(link) != os.path.realpath(target)):
            os.unlink(link)
        if not os.path.lexists(link):
            try:
                os.symlink(target, link)
            except FileExistsError:
                pass  # concurrent creator won the race — same target

    if os.path.isdir(path):
        # Spark-written tables (e.g. .scratch/sf1) are DIRECTORIES of
        # part files; the file stream source does not recurse, so link
        # each part file into the listing dir — which also yields real
        # multi-file microbatch schedules at scale
        parts = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        live = {f"{name}-{i}.parquet" for i in range(len(parts))}
        # Reconcile against the CURRENT part census: a regenerated source
        # with fewer/renamed parts (or a single-file-era plain link) would
        # otherwise leave stale-target or dangling links behind, replaying
        # old rows into the stream.
        # Strict `<name>-<index>.parquet` match — a prefix test would let
        # table `x` reap table `x-y`'s links (`x-y-0.parquet` starts
        # with `x-`).
        _pat = re.compile(re.escape(name) + r"-\d+\.parquet\Z")
        for f in os.listdir(stream_dir):
            stale = (_pat.fullmatch(f) and f not in live
                     ) or f == f"{name}.parquet"
            if stale:
                try:
                    os.unlink(os.path.join(stream_dir, f))
                except FileNotFoundError:
                    pass  # concurrent reconciler won the race
        for i, f in enumerate(parts):
            _ensure_link(os.path.join(stream_dir,
                                      f"{name}-{i}.parquet"),
                         os.path.join(path, f))
    else:
        # Table shape flipped dir -> single file: reap the old part links.
        _pat = re.compile(re.escape(name) + r"-\d+\.parquet\Z")
        for f in os.listdir(stream_dir):
            if _pat.fullmatch(f):
                try:
                    os.unlink(os.path.join(stream_dir, f))
                except FileNotFoundError:
                    pass
        _ensure_link(os.path.join(stream_dir, f"{name}.parquet"), path)
    sdf = spark.readStream.schema(schema).parquet(stream_dir)
    if name == "events":
        from ..tables import _normalize_events

        sdf = _normalize_events(sdf)
    return sdf


def run_to_memory(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Drain a streaming DataFrame with AvailableNow into a memory sink and
    return the collected result as a batch DataFrame.

    The memory sink is the *test harness* endpoint: the streaming plan and
    its state management are identical to what a production writeStream to a
    durable sink would run; only the final (small) result lands driver-side.
    """
    name = f"lts_sink_{os.getpid()}_{next(_SINK_IDS)}"
    ckpt = tempfile.mkdtemp(prefix="lts_ckpt_")
    spark = sdf.sparkSession
    # State-store partition count is fixed at checkpoint creation (streaming
    # has no AQE coalescing), so size it to the stream's key cardinality
    # instead of inheriting the batch-oriented session default: each state
    # partition costs checkpoint files + store open/commit per microbatch,
    # which dominates wall-clock when volumes are small. Production streams
    # tune the same knob to their volume — this is the per-query override.
    n_parts = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n_parts)
    try:
        query = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # Materialize the (small) sink result, then release the per-run
    # resources: the checkpoint dir and the memory-sink registration would
    # otherwise accumulate for the life of a long driver. localCheckpoint
    # copies the sink rows to JVM block storage in one job — the old
    # collect() + createDataFrame(rows) round-tripped every row through
    # Python pickling twice for nothing (guide §5: the driver should do
    # almost no data work).
    result = spark.table(name).localCheckpoint()
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    shutil.rmtree(ckpt, ignore_errors=True)
    return result


# ---------------------------------------------------------------------------
# Watermarked tumbling-window aggregation (streaming form of e01).
# ---------------------------------------------------------------------------
def hourly_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, hour) counts/users/value over a watermarked stream.

    Complete output mode: the windowed aggregate state is emitted in full at
    each trigger, so the result is batch-equivalent regardless of how many
    microbatches the source produced. The DECIMAL(38,6) accumulator keeps the
    incremental state-store additions exact (order-independent), so the final
    double matches DuckDB bit-for-bit.
    """
    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value_dec"),
        )
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        "event_type",
        F.unix_timestamp(F.col("w.start")).cast("bigint").alias("hour_epoch"),
        "n_events",
        F.col("total_value_dec").cast("double").alias("total_value"),
    ).orderBy("event_type", "hour_epoch")


# ---------------------------------------------------------------------------
# Built-in session windows (streaming form of e02, same 30-min gap).
# ---------------------------------------------------------------------------
def session_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats via Spark's native ``session_window``.

    The streaming plan groups by (session_window(ts, 30 min), user_id) —
    the state store merges overlapping windows per key, the classic
    streaming-sessionization operator. Complete output mode (Spark rejects
    update mode for session windows) emits the merged state each trigger;
    the small per-session result is then rolled up to per-user stats
    batch-side, matching the e02 oracle.
    """
    ev = stream_table(spark, sf_dir, "events")
    sess = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("session_len"))
    )
    per_session = run_to_memory(sess, "complete")
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.sum("session_len").alias("n_events"),
            F.max("session_len").alias("max_session_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState (SURVEY.md §2B notes the
# reference has no streaming surface; this is the Spark-native extension
# point for arbitrary per-key state machines).
# ---------------------------------------------------------------------------
_USER_STATE_SCHEMA = (
    "n_events bigint, value_cents bigint, first_us bigint, last_us bigint, "
    "max_value double"
)
_USER_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, value_cents bigint, first_us bigint, "
    "last_us bigint, max_value double"
)


def _user_stats_fn(
    key: tuple, pdfs: "Iterable[pd.DataFrame]", state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running stats. State carries (count, exact integer cents sum,
    first/last event micros, max value) across microbatches; each batch emits
    the updated cumulative row (update semantics)."""
    if state.exists:
        n, cents, first_us, last_us, max_v = state.get
    else:
        n, cents, first_us, last_us, max_v = 0, 0, None, None, None
    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        cents += int(pdf["cents"].sum())
        lo = int(pdf["ts_us"].min())
        hi = int(pdf["ts_us"].max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
        mv = float(pdf["value"].max())
        max_v = mv if max_v is None else max(max_v, mv)
    state.update((n, cents, first_us, last_us, max_v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_cents": [cents],
            "first_us": [first_us],
            "last_us": [last_us],
            "max_value": [max_v],
        }
    )


def stateful_user_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-key state machine over the event stream.

    The double→cents conversion happens in a JVM-side expression *before*
    the Arrow boundary, so the Python state function only ever adds int64 —
    exact and order-independent, matching the integer-cents oracle.
    """
    ev = stream_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "value",
    )
    out_schema = StructType.fromDDL(_USER_OUTPUT_SCHEMA)
    state_schema = StructType.fromDDL(_USER_STATE_SCHEMA)
    stats = ev.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    out = run_to_memory(stats, "update")
    # Defensive: a multi-batch source leaves one update-mode emission per
    # (key, batch) in the sink; the cumulative row with the highest n_events
    # is the final state, so keep exactly that one per user.
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join (view→purchase attribution).
# ---------------------------------------------------------------------------
def attribution_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each purchase is attributed to every view by
    the same user in the preceding 30 minutes.

    Canonical Spark stream-stream join: BOTH sides watermarked and the join
    condition contains the event-time interval, so the state store can evict
    rows once the watermark passes `v_ts + 30 min` — bounded state at any
    scale. The pair stream is appended to the sink; the per-user rollup runs
    batch-side on the (small) result.
    """
    ev = stream_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    purchases = stream_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    pairs = (
        views.withWatermark("v_ts", "1 hour")
        .join(
            purchases.withWatermark("p_ts", "1 hour"),
            F.expr(
                "v_user = p_user AND p_ts > v_ts "
                "AND p_ts <= v_ts + INTERVAL 30 MINUTES"
            ),
            "inner",
        )
    )
    out = run_to_memory(pairs, "append")
    return (
        out.groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count("*").cast("bigint").alias("n_attributed"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Streaming deduplication (training-pipeline op: exact dedup on a stream).
# ---------------------------------------------------------------------------
def dedup_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: md5 fingerprint of normalized text, first
    occurrence per (source, fingerprint) survives (``dropDuplicates`` keeps
    per-key state partitioned across executors). Rolled up batch-side to
    unique-document counts per source.
    """
    docs = stream_table(spark, sf_dir, "documents").select(
        "source", F.md5(normalize_text("text")).alias("fingerprint")
    )
    deduped = docs.dropDuplicates(["source", "fingerprint"])
    out = run_to_memory(deduped, "append")
    return (
        out.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_unique"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# CDC upsert sink: foreachBatch + conditional MERGE into the versioned format.
# ---------------------------------------------------------------------------
def cdc_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert (the CDC-ingest shape every lakehouse needs): each
    microbatch is reduced to its latest row per key, then MERGEd into a
    versioned dataset with a newer-wins condition — `WHEN MATCHED AND
    source.event_id > target.event_id THEN UPDATE, WHEN NOT MATCHED INSERT`.

    The conditional merge makes the result independent of microbatch
    boundaries AND of replay: re-processing an old batch can never regress a
    key (idempotent upsert on top of at-least-once delivery). One merge
    commit per microbatch; per-batch work is a keyed reduction plus the MoR
    merge join — both bounded by batch size, not table size, with the
    target-side join pruned by the merge's key join."""
    from pyspark.sql.window import Window as W

    from ..format.dataset import LanceDataset
    from ..operators import dml
    from ..tables import load_table

    purchases = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id", "value")

    scratch = tempfile.mkdtemp(prefix="lts_cdc_")
    src_dir = os.path.join(scratch, "src")
    ckpt = os.path.join(scratch, "ckpt")
    target = os.path.join(scratch, "target.lance")
    purchases.repartition(3).write.parquet(src_dir)

    LanceDataset.create_empty(
        target,
        StructType.fromDDL("user_id long, last_event_id long, last_value double"),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "user_id",
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
        )
        ds = LanceDataset.open(target)  # re-open: version advances per batch
        dml.merge_multi(
            ds,
            spark,
            latest,
            on="user_id",
            matched_clauses=[
                (
                    "_src_last_event_id > last_event_id",  # newer-wins: replay-safe
                    {
                        "last_event_id": "_src_last_event_id",
                        "last_value": "_src_last_value",
                    },
                )
            ],
            not_matched_insert=True,
        )

    n_parts = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n_parts)
    try:
        query = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1)  # several batches → several merges
            .parquet(src_dir)
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    out = LanceDataset.open(target).to_df(spark).orderBy("user_id")
    out = out.localCheckpoint()  # detach from scratch, JVM-side (§5)
    shutil.rmtree(scratch, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Multi-microbatch source: the single-file testdata stream yields one batch
# under AvailableNow, which exercises the operators but not cross-batch
# state. This variant stages the table as several parquet slices and caps
# files-per-trigger so the SAME streaming plans run across real microbatch
# boundaries (state save/restore between triggers).
# ---------------------------------------------------------------------------
def stream_table_multibatch(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_slices: int = 4,
    files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over ``n_slices`` staged slices of one driver
    table, ``files_per_trigger`` files per microbatch. Slices are written
    once per (sf_dir, table) from a deterministic row split (id mod) and
    reused across runs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Key the staged copy by the source file's identity (size + mtime): the
    # driver regenerates testdata between rounds, and serving stale slices
    # from a previous generation would silently diverge from the oracle.
    st = os.stat(path)
    stage_dir = os.path.join(
        tempfile.gettempdir(),
        "lts_stream_mb",
        sf_dir.strip("/").replace("/", "_"),
        f"{name}_{n_slices}_{st.st_size}_{st.st_mtime_ns}",
    )
    done = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(done):
        os.makedirs(stage_dir, exist_ok=True)
        table = pq.read_table(path)
        ids = table.column(0).to_numpy()  # first column is the id column
        for i in range(n_slices):
            mask = pa.array(ids % n_slices == i)
            pq.write_table(
                table.filter(mask), os.path.join(stage_dir, f"part-{i:04d}.parquet")
            )
        with open(done, "w") as fh:
            fh.write("ok")
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(stage_dir)
    )
    if name == "events":
        from ..tables import _normalize_events

        sdf = _normalize_events(sdf)
    return sdf


def multibatch_user_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats accumulated across FOUR microbatches in update
    mode, proving state survives trigger boundaries.

    The memory sink holds one emission per (user, batch-it-changed-in);
    count/min/max are monotone across updates, so the final state per user
    is max(n_events), min(first_us), max(last_us) over its emissions — a
    deterministic reduction regardless of how the source batched the files.
    """
    ev = stream_table_multibatch(spark, sf_dir, "events", n_slices=4)
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min(F.expr("ts_ns div 1000")).alias("first_us"),
        F.max(F.expr("ts_ns div 1000")).alias("last_us"),
    )
    out, n_batches = run_to_memory_counted(agg, "update")
    if n_batches < 2:
        raise AssertionError(
            f"multibatch source produced {n_batches} microbatch(es); "
            "cross-batch state was not exercised"
        )
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_us").alias("first_us"),
            F.max("last_us").alias("last_us"),
        )
        .orderBy("user_id")
    )


def run_to_memory_counted(sdf: DataFrame, output_mode: str):
    """run_to_memory variant that also reports how many data microbatches
    the AvailableNow drain executed (for multi-batch assertions)."""
    name = f"lts_sink_{os.getpid()}_{next(_SINK_IDS)}"
    ckpt = tempfile.mkdtemp(prefix="lts_ckpt_")
    spark = sdf.sparkSession
    n_parts = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n_parts)
    try:
        query = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        n_batches = sum(
            1 for p in query.recentProgress if p["numInputRows"] > 0
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # JVM-side materialization — same rationale as run_to_memory.
    result = spark.table(name).localCheckpoint()
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    shutil.rmtree(ckpt, ignore_errors=True)
    return result, n_batches



def stream_table_out_of_order(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """File-source stream staged as THREE deterministic microbatches with
    the timeline deliberately out of order:

      batch 0 — the bulk: everything from ``min(ts) + 2h`` on (drives the
                watermark up to ``max(ts) - delay``);
      batch 1 — the second hour of the timeline (below the event-time
                high-water mark, but still ACCEPTED: Spark filters batch N
                with the watermark as of the END of batch N-1, and batch 0
                STARTED at watermark 0 — the documented one-batch lag);
      batch 2 — the first hour (now filtered with the post-batch-0
                watermark, far past these events' times → DROPPED).

    This is the watermark-semantics harness: it makes both halves of the
    late-data contract observable in one run — bounded acceptance of
    slightly-late data, guaranteed drop once the (lagged) watermark passes.
    File order is pinned with mtimes (Spark's file source orders by
    modification time)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    st = os.stat(path)
    stage_dir = os.path.join(
        tempfile.gettempdir(),
        "lts_stream_ooo",
        sf_dir.strip("/").replace("/", "_"),
        f"{name}_{st.st_size}_{st.st_mtime_ns}",
    )
    done = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(done):
        os.makedirs(stage_dir, exist_ok=True)
        table = pq.read_table(path)
        ts = table.column("ts").cast(pa.int64())
        unit = table.column("ts").type.unit  # 'us' or 'ns'
        hour = 3600 * (1_000_000_000 if unit == "ns" else 1_000_000)
        t0 = pc.min(ts).as_py()
        slices = [
            table.filter(pc.greater_equal(ts, pa.scalar(t0 + 2 * hour))),
            table.filter(
                pc.and_(
                    pc.greater_equal(ts, pa.scalar(t0 + hour)),
                    pc.less(ts, pa.scalar(t0 + 2 * hour)),
                )
            ),
            table.filter(pc.less(ts, pa.scalar(t0 + hour))),
        ]
        if any(s.num_rows == 0 for s in slices):
            raise AssertionError(
                f"out-of-order split produced an empty phase "
                f"({[s.num_rows for s in slices]}) — timeline too short "
                "for the late-data harness"
            )
        paths = []
        for i, s in enumerate(slices):
            p = os.path.join(stage_dir, f"part-{i:04d}.parquet")
            pq.write_table(s, p)
            paths.append(p)
        now = os.stat(paths[-1]).st_mtime
        for i, p in enumerate(paths[:-1]):
            os.utime(p, (now - 100 * (len(paths) - 1 - i),) * 2)
        with open(done, "w") as fh:
            fh.write("ok")
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    if name == "events":
        from ..tables import _normalize_events

        sdf = _normalize_events(sdf)
    return sdf


def late_data_drop_stream(
    spark: SparkSession, sf_dir: str, delay: str = "10 minutes"
) -> DataFrame:
    """Watermark late-data semantics over the out-of-order stream: a
    watermarked streaming dedup (append mode) accepts batches 0 and 1 and
    DROPS every batch-2 event (their event times sit a full timeline below
    the lagged filtering watermark). The accepted rows are rolled up
    batch-side to per-(event_type, hour) stats; the oracle replays the
    contract by excluding the first timeline hour — if the watermark failed
    to drop the late batch (or dropped the accepted mid batch), counts and
    sums diverge and the hash compare flunks.

    Scale shape: dropDuplicates state is keyed (event_id, ts) and evicted
    by the same watermark that drops late rows — state stays bounded by the
    delay window on a real out-of-order firehose, which is the entire point
    of watermarks at 100 TB/day ingest rates."""
    ev = stream_table_out_of_order(spark, sf_dir, "events")
    deduped = ev.withWatermark("ts", delay).dropDuplicates(["event_id", "ts"])
    out, n_batches = run_to_memory_counted(deduped, "append")
    if n_batches < 3:
        raise AssertionError(
            f"out-of-order source produced {n_batches} microbatch(es); the "
            "late batch never ran as its own trigger"
        )
    return (
        out.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            .cast("bigint")
            .alias("hour_epoch"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type", "hour_epoch")
    )


def streaming_hll_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL registers maintained INCREMENTALLY over a multi-microbatch
    stream: groupBy(group, bucket) MAX(rank) in update mode — register
    state is a fixed 2^p integers per group in the state store, updated by
    the same associative MAX that merges batch sketches, so the stream's
    final registers equal the batch sketch's exactly. Emissions are
    monotone (MAX only grows), so the post-hoc reduction per (group,
    bucket) is MAX over update-mode emissions. This is the streaming
    production shape for rolling uniques: per-trigger cost is bounded by
    occupied registers, never by the user-id cardinality."""
    from pyspark.sql import functions as F

    from ..operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    ev = stream_table_multibatch(spark, sf_dir, "events", n_slices=4)
    regs = hll_registers(
        ev.filter(F.col("user_id").isNotNull()), ["event_type"], "user_id"
    )
    out, n_batches = run_to_memory_counted(regs, "update")
    if n_batches < 2:
        raise AssertionError(
            f"multibatch source produced {n_batches} microbatch(es); "
            "cross-batch register state was not exercised"
        )
    final = out.groupBy("event_type", "_bucket").agg(
        F.max("_mr").alias("_mr")
    )
    return hll_estimate_from_registers(final, ["event_type"]).orderBy(
        "event_type"
    )


def vector_ingest_stream(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Streaming vector ingestion with LIVE index maintenance — the vector-
    database pipeline: embeddings arrive as microbatches, each batch lands
    as an atomic append commit, and the registered vector index's missing
    per-fragment sidecars are built at the end of every batch
    (`ensure_vector_index_files` — incremental by construction: only NEW
    fragments lack sidecars, so per-trigger index work is proportional to
    the batch, never the corpus). Searches between batches see a complete
    index; searches racing a batch fall back to consult-if-present for the
    newest fragments.

    Exactly-once: foreachBatch is at-least-once (Spark re-delivers a batch
    whose foreachBatch raised after a partial effect), so the ingest is
    made idempotent per batch_id — every commit records its stream_batch
    in commit_metadata, and a redelivered batch whose id is already
    committed is a no-op. append() itself never raises after its commit
    is durable (index-maintenance errors degrade to warnings), so the
    only replay source left is a crash between commit and checkpoint —
    which this check absorbs."""
    from ..format.dataset import LanceDataset
    from ..format.manifest import latest_version, read_manifest

    sdf = stream_table_multibatch(spark, sf_dir, "embeddings", n_slices=4)

    def _already_committed(batch_id: int) -> bool:
        # Walk back from the newest manifest to the most recent commit that
        # carries a stream_batch marker; stream batch ids are monotonic, so
        # one marker decides (no full-history scan at steady state).
        v = latest_version(path)
        while v >= 1:
            m = read_manifest(path, v)
            sb = (m.commit_metadata or {}).get("stream_batch")
            if sb is not None:
                return int(sb) >= batch_id
            v -= 1
        return False

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(int(batch_id)):
            return
        LanceDataset.open(path).append(
            batch_df.select("vec_id", "label", "embedding"),
            commit_metadata={"stream_batch": int(batch_id)},
            maintain_indexes=True,
        )

    import tempfile

    ckpt = tempfile.mkdtemp(prefix="lts_vec_ckpt_")
    q = (
        sdf.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
