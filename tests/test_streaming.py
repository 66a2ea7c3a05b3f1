"""Streaming operators (streaming/events.py) vs their batch equivalents.

Each streaming result must equal the same analytics computed with plain
batch DataFrame ops over the same table — the strongest available local
check (the driver additionally compares against DuckDB oracles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_hourly_stats_matches_batch(spark):
    from lance_trino_spark.streaming import hourly_stats_stream
    from lance_trino_spark.tables import load_table

    got = hourly_stats_stream(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    hour_epoch = (F.expr("ts_us div 3600000000") * 3600).cast("bigint")
    want = (
        ev.groupBy("event_type", hour_epoch.alias("hour_epoch"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type", "hour_epoch")
    )
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_stream_session_window_matches_batch_sessionization(spark):
    from lance_trino_spark.streaming import session_stats_stream
    from lance_trino_spark.suite import all_queries

    got = session_stats_stream(spark, SF_DIR)
    want = all_queries()["e02_sessionization"].build(spark, SF_DIR)
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_stream_stateful_user_stats_matches_batch(spark):
    from lance_trino_spark.streaming import stateful_user_stats_stream
    from lance_trino_spark.tables import load_table

    got = stateful_user_stats_stream(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    want = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_cents"),
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
            F.max("value").alias("max_value"),
        )
        .orderBy("user_id")
    )
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_stream_dedup_matches_batch_distinct(spark):
    from lance_trino_spark.functions import normalize_text
    from lance_trino_spark.streaming import dedup_documents_stream
    from lance_trino_spark.tables import load_table

    got = dedup_documents_stream(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    want = (
        docs.select("source", F.md5(normalize_text("text")).alias("fp"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_unique"))
        .orderBy("source")
    )
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_watermark_drops_late_batch_with_one_batch_lag(spark, tmp_path):
    """Pins the Spark behavior st08 relies on: batch N is filtered with the
    watermark as of the END of batch N-1, so a very-late THIRD batch is
    dropped while a slightly-late SECOND batch is accepted."""
    import os
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    us = lambda s: int(datetime.fromisoformat(s).timestamp() * 1_000_000)

    def mk(vals):
        return pa.table({
            "ts": pa.array([us(v) for v, _ in vals], pa.timestamp("us")),
            "v": [x for _, x in vals],
        })

    d = tmp_path / "src"
    d.mkdir()
    pq.write_table(mk([("2024-01-10T10:05", 1), ("2024-01-10T12:05", 2)]),
                   str(d / "part-0000.parquet"))
    pq.write_table(mk([("2024-01-10T08:05", 3)]), str(d / "part-0001.parquet"))
    pq.write_table(mk([("2024-01-10T07:05", 4)]), str(d / "part-0002.parquet"))
    now = os.path.getmtime(str(d / "part-0002.parquet"))
    for i, off in ((0, -200), (1, -100)):
        os.utime(str(d / f"part-000{i}.parquet"), (now + off, now + off))
    sdf = (
        spark.readStream.schema("ts timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    dd = sdf.withWatermark("ts", "10 minutes").dropDuplicates(["v", "ts"])
    ckpt = tmp_path / "ckpt"
    q = (
        dd.writeStream.format("memory")
        .queryName("wm_lag_test")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = [
        op.get("numRowsDroppedByWatermark")
        for p in q.recentProgress
        for op in (p.get("stateOperators") or [])
    ]
    got = sorted(r["v"] for r in spark.table("wm_lag_test").collect())
    spark.catalog.dropTempView("wm_lag_test")
    # slightly-late v=3 accepted (lagged watermark was still 0), very-late
    # v=4 dropped (filtered with the post-bulk watermark)
    assert got == [1, 2, 3]
    assert dropped[-1] == 1


def test_native_stream_cdc(tmp_path, spark):
    """Streaming mode=cdc over the native version log: MoR delete/update
    histories stream as insert/delete events with their commit version
    (the append-only tail st11 refuses these rewrites by contract)."""
    from pyspark.sql import functions as F

    from lance_trino_spark.format.lance_native import (
        append_native_rows,
        native_delete_where,
        native_update_where,
        write_native_dataset,
    )
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )
    from lance_trino_spark.streaming.events import run_to_memory

    root = str(tmp_path / "ncdc")
    write_native_dataset(
        root, {"k": list(range(10)), "v": [f"a{i}" for i in range(10)]})
    append_native_rows(root, {"k": [10, 11], "v": ["b10", "b11"]})
    register_lance_datasource(spark)
    native_delete_where(spark, root, F.col("k").isin([3, 10]))
    native_update_where(spark, root, F.col("k") == 5, {"v": F.lit("UPD")})

    sdf = spark.readStream.format("lance").option("mode", "cdc").load(root)
    out = run_to_memory(sdf, "append")
    rows = sorted(
        tuple(r)
        for r in out.select(
            "_commit_version", "_change_type", "k", "v").collect()
    )
    exp = sorted(
        [(1, "insert", i, f"a{i}") for i in range(10)]
        + [
            (2, "insert", 10, "b10"), (2, "insert", 11, "b11"),
            (3, "delete", 3, "a3"), (3, "delete", 10, "b10"),
            (4, "delete", 5, "a5"), (4, "insert", 5, "UPD"),
        ]
    )
    assert rows == exp


def test_stream_dir_reconcile_no_prefix_collision(spark, tmp_path):
    """Stale-link reconciliation (ADVICE r10): table `x`'s reconciler must
    not reap table `x-y`'s links — part links match the strict
    `<name>-<digits>.parquet` pattern, never a bare prefix test."""
    import os

    from lance_trino_spark.streaming.events import stream_table

    sf = tmp_path / "sf"
    sf.mkdir()
    # `x` as a DIRECTORY table (2 parts), `x-y` as a directory table too
    for name, rows in (("x", [(1,), (2,)]), ("x-y", [(3,), (4,)])):
        d = sf / f"{name}.parquet"
        spark.createDataFrame(rows, "v long").repartition(2) \
            .write.mode("overwrite").parquet(str(d))
    df_long = stream_table(spark, str(sf), "x-y")
    df_short = stream_table(spark, str(sf), "x")   # reconciler for `x` runs
    df_long2 = stream_table(spark, str(sf), "x-y")  # must still see links
    assert df_long.schema == df_long2.schema == df_short.schema
    import tempfile

    stream_dir = os.path.join(
        tempfile.gettempdir(), "lts_stream",
        str(sf).strip("/").replace("/", "_"))
    longs = [f for f in os.listdir(os.path.join(stream_dir, "x-y"))
             if f.endswith(".parquet")]
    assert sorted(longs) == ["x-y-0.parquet", "x-y-1.parquet"]


def test_native_writestream_exactly_once(spark, tmp_path):
    """writeStream.format('lance') straight into a native dataset: one
    txn-marked manifest version per micro-batch, an out-of-band replay
    of a committed batch id is swallowed (shared marker namespace with
    native_stream_commit_batch), and the staged files of the swallowed
    delivery are reaped — no duplicate rows, no orphans."""
    import os

    from lance_trino_spark.format.lance_native import (
        LanceNativeDataset,
        LanceNativeError,
        create_native_dataset,
        list_native_versions,
        native_stream_commit_batch,
        read_native_manifest,
    )
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    register_lance_datasource(spark)
    out = str(tmp_path / "t.lance")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    df = spark.range(60).selectExpr("id", "id * 2 AS v")
    df.repartition(3).write.parquet(src)
    create_native_dataset(df.limit(0), out)

    (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("lance")
        .option("appId", "pytest-q1")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
        .awaitTermination(240)
    )
    assert LanceNativeDataset(out).count_rows() == 60
    txns = {
        v: read_native_manifest(out, v).txn
        for v in list_native_versions(out)
    }
    marked = {v: t for v, t in txns.items() if t}
    # one version per non-empty micro-batch, all in this app's namespace
    assert len(marked) >= 2
    assert all(t.startswith("pytest-q1:") for t in marked.values())
    assert len(set(marked.values())) == len(marked)

    # crash-replay of the newest committed batch id via the foreachBatch
    # twin — same marker namespace, must be swallowed
    last_bid = max(int(t.split(":")[1]) for t in marked.values())
    rv = native_stream_commit_batch(
        df.limit(7), last_bid, out, app_id="pytest-q1")
    assert rv == max(marked)
    assert LanceNativeDataset(out).count_rows() == 60

    # readback through the scan equals the source
    got = sorted(
        tuple(r)
        for r in spark.read.format("lance").load(out).collect()
    )
    assert got == [(i, 2 * i) for i in range(60)]

    # no staged orphans beyond the files the manifest references
    m = read_native_manifest(out)
    referenced = {df_.path for f in m.fragments for df_ in f.files}
    on_disk = set(os.listdir(os.path.join(out, "data")))
    assert on_disk == referenced


def test_native_writestream_refusals(spark, tmp_path):
    """appId is required (txn-marker namespace), and non-append output
    modes refuse loudly."""
    import pyspark.errors

    import pytest

    from lance_trino_spark.format.lance_native import create_native_dataset
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    register_lance_datasource(spark)
    out = str(tmp_path / "t.lance")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    df.write.parquet(src)
    create_native_dataset(df.limit(0), out)

    q = (
        spark.readStream.schema("id long, v long")
        .parquet(src)
        .writeStream.format("lance")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    with pytest.raises(
        pyspark.errors.exceptions.base.PySparkException,
        match="appId",
    ):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_native_writestream_on_object_store(spark, tmp_path):
    """The writeStream native sink composes with the object-store IO
    seam: executors stage through the shared pyarrow filesystem, the
    driver's txn-marked commits land via conditional-put — exactly-once
    holds on a remote root."""
    import warnings

    import pyarrow.fs as pafs

    from lance_trino_spark.format import native_io as nio
    from lance_trino_spark.format.backend import PyArrowFsObjectStore
    from lance_trino_spark.format.lance_native import (
        LanceNativeDataset,
        create_native_dataset,
        list_native_versions,
        read_native_manifest,
    )
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource,
    )

    register_lance_datasource(spark)
    base = str(tmp_path / "bucket")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        store = PyArrowFsObjectStore(
            pafs.LocalFileSystem(), "pafs://stbkt", base)
    out = "pafs://stbkt/warehouse/t.lance"
    nio.register_object_store_root("pafs://stbkt", store)
    try:
        src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
        df = spark.range(40).selectExpr("id", "id * 2 AS v")
        df.repartition(2).write.parquet(src)
        create_native_dataset(df.limit(0), out)
        popts = nio.spark_options(out)
        (
            spark.readStream.schema("id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("lance")
            .options(**popts)
            .option("appId", "os-q1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(out)
            .awaitTermination(240)
        )
        assert LanceNativeDataset(out).count_rows() == 40
        marked = [
            read_native_manifest(out, vv).txn
            for vv in list_native_versions(out)
        ]
        assert sum(1 for t in marked if t and t.startswith("os-q1:")) >= 2
        got = sorted(
            tuple(r)
            for r in spark.read.format("lance").options(**popts)
            .load(out).collect()
        )
        assert got == [(i, 2 * i) for i in range(40)]
    finally:
        nio.unregister_object_store_root("pafs://stbkt")
