"""Streaming suite entries (st01-st04): Structured Streaming operators from
streaming/events.py, drained with Trigger.AvailableNow and compared against
batch DuckDB oracles.

The reference is batch-only (SURVEY.md §2B "Streaming — Absent"); these are
the Spark-native extension surface: watermarked windowed aggregation, native
session windows, applyInPandasWithState custom state machines, and streaming
dedup. Oracles are exact because every accumulation is either integral,
exact-decimal, or min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    attribution_join_stream,
    dedup_documents_stream,
    hourly_stats_stream,
    session_stats_stream,
    stateful_user_stats_stream,
)
from . import register
from .events import SESSIONIZATION_ORACLE


@register(
    "st01_stream_hourly_stats",
    oracle="""
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, hour_epoch
    """,
    doc="streaming watermarked tumbling-window aggregation (complete mode)",
    tags=("streaming", "window", "agg"),
)
def st01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_stats_stream(spark, sf_dir)


@register(
    "st02_stream_session_window",
    # identical semantics to batch e02 — shared oracle text by construction
    oracle=SESSIONIZATION_ORACLE,
    doc="streaming native session_window (30-min gap), per-user rollup",
    tags=("streaming", "session", "state"),
)
def st02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats_stream(spark, sf_dir)


@register(
    "st03_stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="applyInPandasWithState per-user state machine (exact integer cents)",
    tags=("streaming", "state", "pandas"),
)
def st03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stateful_user_stats_stream(spark, sf_dir)


@register(
    "st04_stream_dedup",
    oracle="""
    SELECT source,
           CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                AS BIGINT) AS n_unique
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    doc="streaming exact dedup by normalized-text fingerprint, per source",
    tags=("streaming", "dedup"),
)
def st04(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_documents_stream(spark, sf_dir)


@register(
    "st05_stream_stream_join",
    oracle="""
    SELECT v.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_attributed
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND epoch_us(p.ts) > epoch_us(v.ts)
     AND epoch_us(p.ts) <= epoch_us(v.ts) + 1800000000
    GROUP BY v.user_id
    ORDER BY v.user_id
    """,
    doc="stream-stream interval join (purchase attributed to 30-min view window)",
    tags=("streaming", "join", "state"),
)
def st05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attribution_join_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# st06 — CDC upsert sink: per-microbatch conditional MERGE (newer-wins on
# event_id) into the versioned format; final table = latest purchase per
# user regardless of how the stream was batched.
# ---------------------------------------------------------------------------
@register(
    "st06_stream_cdc_upsert",
    oracle="""
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM events
    WHERE event_type = 'purchase'
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
    ORDER BY user_id
    """,
    doc="streaming: foreachBatch CDC upsert via conditional MERGE commits",
    tags=("streaming", "cdc", "merge"),
)
def st06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import cdc_upsert_stream

    return cdc_upsert_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# st07 — cross-microbatch state: the same update-mode aggregation run over a
# FOUR-microbatch source (maxFilesPerTrigger=1 over staged slices). The
# operator itself asserts >= 2 data batches executed, so this entry fails
# loudly if the source ever degenerates to one batch.
# ---------------------------------------------------------------------------
@register(
    "st07_stream_multibatch_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="streaming: per-user state accumulated across 4 real microbatches",
    tags=("streaming", "state", "multibatch"),
)
def st07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import multibatch_user_stats_stream

    return multibatch_user_stats_stream(spark, sf_dir)


@register(
    "st08_watermark_late_drop",
    oracle="""
    WITH m AS (SELECT MIN(ts) AS t0 FROM events)
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events, m
    WHERE ts >= t0 + INTERVAL 1 HOUR
    GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, hour_epoch
    """,
    doc="streaming watermark late-data contract: out-of-order 3-batch "
        "replay — slightly-late batch accepted (one-batch watermark lag), "
        "very-late batch dropped; oracle excludes exactly the dropped hour",
    tags=("streaming", "watermark", "late-data"),
)
def st08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import late_data_drop_stream

    return late_data_drop_stream(spark, sf_dir)


@register(
    "st09_stream_hll_registers",
    # identical final state to the batch sketch — e12's oracle shape
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
      FROM regs GROUP BY event_type)
    SELECT event_type,
           CAST(256 - nonempty AS BIGINT) AS empty_buckets,
           CAST(isum + (256 - nonempty) * 33554432 AS BIGINT)
             AS rank_checksum,
           CAST(FLOOR(1579498136381.3938 /
                (isum + (256 - nonempty) * 33554432)) AS BIGINT)
             AS hll_estimate
    FROM agg
    ORDER BY event_type
    """,
    doc="streaming HLL: registers maintained incrementally across real "
        "microbatches equal the batch sketch exactly (associative MAX "
        "state, bounded per-trigger cost)",
    tags=("streaming", "sketch", "hll", "state"),
)
def st09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import streaming_hll_stream

    return streaming_hll_stream(spark, sf_dir)


@register(
    "st10_stream_vector_ingest",
    oracle="""
    SELECT vec_id AS query_id, vec_id AS neighbor_id,
           (SELECT COUNT(*) FROM embeddings) AS n_indexed
    FROM embeddings WHERE vec_id < 15
    ORDER BY query_id
    """,
    doc="streaming vector ingestion with live index maintenance: per-batch "
        "append commits + incremental sidecar builds, then index-backed "
        "top-1 self-match over the fully-streamed corpus",
    tags=("streaming", "ann", "index", "pipeline"),
)
def st10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..format.dataset import LanceDataset
    from ..streaming.events import vector_ingest_stream
    from ..tables import load_table
    from .lance_format import _fresh_path

    emb = load_table(spark, sf_dir, "embeddings")
    path = _fresh_path(sf_dir, "st10")
    # empty table + registered index BEFORE the stream starts: every
    # arriving fragment gets its sidecar built by its own microbatch
    ds = LanceDataset.create_empty(
        path, emb.select("vec_id", "label", "embedding").schema
    )
    # HNSW because the index must register on an EMPTY table (IVF needs
    # data to train centroids; per-fragment graphs need none) — that is
    # the live-maintenance design. Build quality matters on corpora with
    # tight near-duplicate clusters (the sf1 replicas): m=16/efc=96
    # keeps exact twins reachable where m=8/efc=48 graphs strand them.
    ds = ds.create_vector_index(
        spark, "embedding", index_type="HNSW", hnsw_m=16,
        hnsw_ef_construction=96,
    )
    vector_ingest_stream(spark, sf_dir, path)
    final = LanceDataset.open(path)
    # post-drain maintenance: per-batch index builds degrade to warnings
    # by design (ingest availability beats index freshness), so a
    # fragment can land shard-less; searches are consult-if-present and
    # would silently miss its vectors. ensure_* rebuilds exactly the
    # missing shard sets — the table-service step every real ingest
    # pipeline runs before serving.
    final.ensure_vector_index_files(spark)
    final = LanceDataset.open(path)
    if final.version < 4:  # create + index + >= 2 microbatch appends
        raise AssertionError(
            f"vector ingest produced v{final.version}; the stream never "
            "split into multiple microbatches"
        )
    queries = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = final.vector_search(
        spark, "embedding", queries, k=16, id_columns=["vec_id"],
        # k > 1 + the exact-cosine re-rank below: retrieve-then-rerank
        # makes self-match depend on exact arithmetic, not on the
        # beam's first pick
        ef_search=256,
    )
    rk = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    n_indexed = final.count_rows()
    return (
        hits.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.lit(n_indexed).cast("bigint").alias("n_indexed"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# st11 — streaming from a REAL `.lance` dataset: the native version log is
# the stream (offset = manifest version, microbatch = newly appeared
# fragments, LanceNativeStreamReader). The harness writes a 3-version
# native dataset with the fixture-validated v1 writer, drains it with
# availableNow, appends one more version, and drains again from the SAME
# checkpoint — proving delta-only delivery over the binary format.
# ---------------------------------------------------------------------------
@register(
    "st11_native_stream_tail",
    oracle="""
    SELECT n_regionkey AS region, COUNT(*) AS n,
           CAST(SUM(n_nationkey) AS BIGINT) AS sk
    FROM nation
    GROUP BY n_regionkey
    ORDER BY region
    """,
    doc="streaming: readStream over a REAL .lance dataset (native version "
        "log as offsets, checkpoint-resumed delta delivery)",
    tags=("streaming", "interop", "lance-native"),
)
def st11(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..format.lance_native import create_native_dataset
    from ..sources.lance_datasource import register_lance_datasource
    from ..tables import load_table

    register_lance_datasource(spark)
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".scratch")
    tag = os.path.basename(sf_dir.rstrip("/"))
    p = os.path.join(scratch, f"{tag}-st11-native.lance")
    shutil.rmtree(p, ignore_errors=True)
    # fixture lands DISTRIBUTED (r14 — grandfather entry retired):
    # nation keys are DENSE 0..24, so the old index-half splits map to
    # exact key cuts (< 12, 12..16, >= 17)
    src = (
        load_table(spark, sf_dir, "nation")
        .selectExpr("n_regionkey AS region", "n_nationkey AS nationkey")
        .orderBy("nationkey")
    )
    half = src.count() // 2

    def appendw(cond):
        src.where(cond).coalesce(1).write.format("lance") \
            .mode("append").save(p)

    create_native_dataset(
        src.where(f"nationkey < {half}").coalesce(1), p)
    appendw(f"nationkey >= {half} AND nationkey < {half + 5}")
    ckpt = tempfile.mkdtemp(prefix="st11_ckpt_")
    out_dir = tempfile.mkdtemp(prefix="st11_out_")

    def drain():
        q = (
            spark.readStream.format("lance").load(p)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(out_dir).count()
    appendw(f"nationkey >= {half + 5}")  # late arrivals
    drain()
    out = spark.read.parquet(out_dir)
    if n_first >= out.count():
        raise AssertionError("checkpoint resume did not deliver the delta")
    return (
        out.groupBy("region")
        .agg(
            F.count("*").alias("n"),
            F.sum("nationkey").cast("bigint").alias("sk"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# st12 — EXACTLY-ONCE streaming ingest INTO a real `.lance` dataset: a
# file-source stream drains through foreachBatch into
# native_stream_commit_batch — each micro-batch stages its data files
# from the executors and commits ONE manifest version carrying the
# "appId:batchId" transaction marker (manifest proto field 99, a
# documented repo extension), so a re-delivered batch is detected
# atomically with the commit. The query re-delivers the LAST batch by
# hand after the stream drains (the crash-replay case) and proves no
# duplicate rows; result equals a batch query over the source.
# ---------------------------------------------------------------------------
@register(
    "st12_native_stream_sink",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           COUNT(DISTINCT c_nationkey) AS nations,
           TRUE AS replay_was_skipped,
           TRUE AS one_version_per_batch
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="streaming: exactly-once micro-batch ingest into a native .lance "
        "dataset (manifest-embedded txn markers, replay-safe)",
    tags=("streaming", "format", "lance-native", "sink", "exactly-once"),
)
def st12(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..format.lance_native import (
        LanceNativeDataset,
        create_native_dataset,
        list_native_versions,
        native_stream_commit_batch,
    )
    from ..sources.lance_datasource import register_lance_datasource
    from ..tables import load_table
    from .lance_format import _fresh_path

    out = _fresh_path(sf_dir, "st12-native-sink")
    src, ckpt = out + ".src", out + ".ckpt"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    cust.repartition(4).write.parquet(src)
    create_native_dataset(cust.limit(0), out)

    seen: list[tuple] = []

    def commit(bdf, bid):
        v = native_stream_commit_batch(bdf, bid, out, app_id="st12")
        seen.append((int(bid), v))

    (
        spark.readStream
        .schema("c_custkey long, c_nationkey long, c_mktsegment string")
        .option("maxFilesPerTrigger", 1)  # several batches, several commits
        .parquet(src)
        .writeStream.foreachBatch(commit)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    ds = LanceNativeDataset(out)
    n_before = ds.count_rows()
    # crash-replay: re-deliver the last batch out of band — the manifest
    # txn marker must swallow it (no rows, no version)
    last_bid = max(b for b, _ in seen)
    replay_v = native_stream_commit_batch(
        cust.limit(7), last_bid, out, app_id="st12")
    replay_skipped = (
        LanceNativeDataset(out).count_rows() == n_before
        and replay_v == dict(seen)[last_bid]
    )
    committed = [v for _, v in seen if v is not None]
    one_each = (
        len(set(committed)) == len(committed)
        and len(committed) >= 2
        and max(list_native_versions(out)) == max(committed)
    )

    register_lance_datasource(spark)
    return (
        spark.read.format("lance").load(out)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("c_nationkey").alias("nations"),
        )
        .withColumn("replay_was_skipped", F.lit(bool(replay_skipped)))
        .withColumn("one_version_per_batch", F.lit(bool(one_each)))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# st13 — continuous ingest WITH in-line maintenance: the exactly-once
# native sink compacts its own small fragments every N batches (clustered
# on the key, so the stats sidecars prune range probes) and vacuums
# history down — retaining at least back to its newest txn marker, so a
# crash-redelivery of the final batch is still swallowed AFTER
# maintenance. This is the 100 TB steady-state shape: a streaming writer
# that never lets the small-file problem accrete and never loses its
# exactly-once ledger to its own vacuum.
# ---------------------------------------------------------------------------
@register(
    "st13_stream_sink_maintenance",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
           TRUE AS compaction_bounded_fragments,
           TRUE AS vacuum_bounded_history,
           TRUE AS replay_swallowed_after_maintenance,
           TRUE AS clustered_stats_prune
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
    doc="streaming: exactly-once native sink with in-line maintenance — "
        "compacts its own small fragments (clustered), vacuums history "
        "with the txn-marker retention floor, replay still swallowed",
    tags=("streaming", "format", "lance-native", "sink", "exactly-once",
          "maintenance"),
)
def st13(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from ..format.lance_native import (
        LanceNativeDataset,
        create_native_dataset,
        foreach_batch_native_sink,
        list_native_versions,
        native_stream_commit_batch,
    )
    from ..sources.lance_datasource import register_lance_datasource
    from ..tables import load_table
    from .lance_format import _fresh_path, _native_planned_fragments

    out = _fresh_path(sf_dir, "st13-sink-maint")
    src, ckpt = out + ".src", out + ".ckpt"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment")
    cust.repartition(6).write.parquet(src)
    create_native_dataset(cust.limit(0), out)

    # fragment budget scaled to the table so the clustered rewrite
    # yields MULTIPLE range-disjoint fragments at every sf (a single
    # consolidated fragment can never demonstrate pruning)
    n_total = cust.count()
    sink = foreach_batch_native_sink(
        out, app_id="st13", compact_every=2, keep_versions=2,
        compact_sort_by="c_custkey",
        # every accreted fragment is a victim (smaller than the whole
        # table), and the rewrite cuts ~4 range-disjoint fragments
        small_fragment_rows=n_total + 1,
        rows_per_fragment=max(25, n_total // 4))
    n_batches = 0

    def body(bdf, bid):
        nonlocal n_batches
        n_batches += 1
        sink(bdf, bid)

    (
        spark.readStream
        .schema("c_custkey long, c_nationkey long, c_mktsegment string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(body)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    ds = LanceNativeDataset(out)
    n_rows = ds.count_rows()
    frags_bounded = len(ds.manifest.fragments) < n_batches
    history_bounded = len(list_native_versions(out)) < 2 * n_batches

    # crash-redelivery of the final batch AFTER compaction+vacuum ran
    native_stream_commit_batch(
        cust.limit(5), n_batches - 1, out, app_id="st13")
    replay_ok = LanceNativeDataset(out).count_rows() == n_rows

    # clustered rewrite: a key-range probe plans a strict fragment subset
    m = LanceNativeDataset(out).manifest
    hi = max(r.c_custkey for r in cust.agg(
        F.max("c_custkey").alias("c_custkey")).collect())
    planned = _native_planned_fragments(out, [
        GreaterThanOrEqual(("c_custkey",), 1),
        LessThanOrEqual(("c_custkey",), max(1, hi // 20)),
    ])
    prunes = bool(0 < planned < len(m.fragments))

    register_lance_datasource(spark)
    return (
        spark.read.format("lance").load(out)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"), F.sum("c_custkey").alias("key_sum"))
        .withColumn("compaction_bounded_fragments",
                    F.lit(bool(frags_bounded)))
        .withColumn("vacuum_bounded_history", F.lit(bool(history_bounded)))
        .withColumn("replay_swallowed_after_maintenance",
                    F.lit(bool(replay_ok)))
        .withColumn("clustered_stats_prune", F.lit(prunes))
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# st14 — the exactly-once native sink as a FIRST-CLASS writeStream sink:
# `writeStream.format("lance").option("appId", ...).start(path)` plans the
# sink through Spark (no foreachBatch), executors stage native data files
# per micro-batch, and the driver commits one txn-marked manifest version
# per batch (the st12 protocol behind the DSv2 streaming face). The query
# proves: per-batch markers in the app's namespace, an out-of-band
# crash-redelivery of the newest committed batch id is swallowed (shared
# marker namespace with the foreachBatch twin), and the swallowed
# delivery's staged files were reaped (manifest-referenced files == files
# on disk). Result equals a batch query over the source.
# ---------------------------------------------------------------------------
@register(
    "st14_native_writestream_sink",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS bal_sum,
           TRUE AS one_marker_per_batch,
           TRUE AS replay_was_skipped,
           TRUE AS no_staged_orphans
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
    doc="streaming: writeStream.format('lance') native sink — per-batch "
        "txn-marked commits, replay-safe, orphan-free",
    tags=("streaming", "format", "lance-native", "sink", "exactly-once"),
)
def st14(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..format.lance_native import (
        LanceNativeDataset,
        create_native_dataset,
        list_native_versions,
        native_stream_commit_batch,
        read_native_manifest,
    )
    from ..sources.lance_datasource import register_lance_datasource
    from ..tables import load_table
    from .lance_format import _fresh_path

    out = _fresh_path(sf_dir, "st14-native-writestream")
    src, ckpt = out + ".src", out + ".ckpt"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    cust.repartition(4).write.parquet(src)
    create_native_dataset(cust.limit(0), out)

    register_lance_datasource(spark)
    (
        spark.readStream
        .schema("c_custkey long, c_mktsegment string, c_acctbal double")
        .option("maxFilesPerTrigger", 1)  # several batches, several commits
        .parquet(src)
        .writeStream.format("lance")
        .option("appId", "st14")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
        .awaitTermination(300)
    )
    ds = LanceNativeDataset(out)
    n_before = ds.count_rows()
    marked = {
        v: t
        for v in list_native_versions(out)
        if (t := read_native_manifest(out, v).txn)
    }
    one_each = (
        len(marked) >= 2
        and all(t.startswith("st14:") for t in marked.values())
        and len(set(marked.values())) == len(marked)
    )

    # crash-redelivery of the newest committed batch id, delivered through
    # the foreachBatch twin — the manifest marker namespace is SHARED, so
    # it must be swallowed without rows or a new version
    last_bid = max(int(t.split(":")[1]) for t in marked.values())
    replay_v = native_stream_commit_batch(
        cust.limit(7), last_bid, out, app_id="st14")
    replay_skipped = (
        LanceNativeDataset(out).count_rows() == n_before
        and replay_v == max(marked)
    )

    # the swallowed delivery staged files then reaped them: everything in
    # data/ is manifest-referenced
    m = read_native_manifest(out)
    referenced = {df_.path for f in m.fragments for df_ in f.files}
    no_orphans = set(os.listdir(os.path.join(out, "data"))) == referenced

    return (
        spark.read.format("lance").load(out)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
            .cast("double").alias("bal_sum"),
        )
        .withColumn("one_marker_per_batch", F.lit(bool(one_each)))
        .withColumn("replay_was_skipped", F.lit(bool(replay_skipped)))
        .withColumn("no_staged_orphans", F.lit(bool(no_orphans)))
        .orderBy("segment")
    )
