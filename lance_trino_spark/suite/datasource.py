"""Suite entries for the format('lance') Python DataSource — the connector
surface itself (SURVEY §2A A1/A4/A10/A11, and the streaming sink extension),
gated by the same DuckDB oracles as everything else: each entry round-trips
driver testdata through the DataSource and the oracle runs on the ORIGINAL
parquet, so a pushdown or commit bug shows up as a value mismatch."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..format.dataset import LanceDataset
from ..sources.lance_datasource import register_lance_datasource
from ..tables import load_table
from . import register
from .lance_format import _fresh_path
from .relational import _dsum_sql, dsum


# ---------------------------------------------------------------------------
# ds01 — DataSource scan with filter pushdown: the pushed predicates (=, >=,
# IN, IS NOT NULL, and — beyond the reference, which wires LIKE but disables
# it — the string matchers) are evaluated by pyarrow inside the fragment
# scan; LIKE '%URGENT' pushes as StringEndsWith since r11.
# ---------------------------------------------------------------------------
@register(
    "ds01_datasource_scan_pushdown",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {_dsum_sql('o_totalprice', 2)} AS total_price
    FROM orders
    WHERE o_totalprice >= 50000 AND o_orderstatus IN ('F', 'O')
      AND o_custkey IS NOT NULL AND o_orderpriority LIKE '%URGENT'
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    doc="connector: format('lance') scan, pushed >=/IN/IS-NOT-NULL + "
        "pushed ends-with LIKE (r11)",
    tags=("connector", "pushdown"),
)
def ds01(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds01")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    LanceDataset.create(path, orders, max_rows_per_file=25_000)
    scan = spark.read.format("lance").load(path).filter(
        (F.col("o_totalprice") >= 50000)
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").like("%URGENT")  # pushes as ends-with (r11)
    )
    return (
        scan.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", 2, "total_price"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# ds02 — two-phase distributed write: append + append + overwrite-read-back
# through df.write.format('lance'); every version stays readable (A10/A11).
# ---------------------------------------------------------------------------
@register(
    "ds02_datasource_write_commit",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           COUNT(DISTINCT o_custkey) AS customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="connector: df.write.format('lance') two-phase append commits",
    tags=("connector", "write"),
)
def ds02(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds02")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    # two appends from disjoint halves — the union must equal the source
    orders.filter(F.col("o_orderkey") % 2 == 0).write.format("lance").mode(
        "append"
    ).save(path)
    orders.filter(F.col("o_orderkey") % 2 == 1).write.format("lance").mode(
        "append"
    ).save(path)
    return (
        spark.read.format("lance")
        .load(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("o_custkey").alias("customers"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# ds03 — Structured Streaming ingest: file source → writeStream.format(
# 'lance') with availableNow; per-microbatch atomic append commits with
# epoch dedup. Result equals a batch query over the original table.
# ---------------------------------------------------------------------------
@register(
    "ds03_streaming_ingest",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           COUNT(DISTINCT c_nationkey) AS nations
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="streaming: microbatch ingest into the format via writeStream.format('lance')",
    tags=("streaming", "connector"),
)
def ds03(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    out = _fresh_path(sf_dir, "ds03")
    src = out + ".src"
    ckpt = out + ".ckpt"
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    cust.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema("c_custkey long, c_nationkey long, c_mktsegment string")
        .option("maxFilesPerTrigger", 1)  # several microbatches, several commits
        .parquet(src)
        .writeStream.format("lance")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(300)
    return (
        spark.read.format("lance")
        .load(out)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("c_nationkey").alias("nations"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# ds04 — limit-aware fragment coalescing (A6/A7): with a limit hint and no
# filter, the scan plans only the leading fragments whose deletion-aware row
# counts cover the limit (`LanceSplitManager.java:56-112`). The count result
# is deterministic even though the row subset is not.
# ---------------------------------------------------------------------------
@register(
    "ds04_limit_coalesced_scan",
    oracle="""
    SELECT (SELECT COUNT(*) FROM (SELECT * FROM lineitem LIMIT 2000) t)
             AS n_limited,
           (SELECT COUNT(*) FROM lineitem) AS n_total
    """,
    doc="connector: limit hint coalesces the scan to leading fragments",
    tags=("connector", "limit"),
)
def ds04(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds04")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    # fragment size scales WITH the table (~30 fragments at any sf): the
    # proof needs several fragments, not thousands of tiny files — a fixed
    # 1000-row size made the setup write 6000 fragments at sf1 (63 s of
    # harness, zero extra coverage)
    ds = LanceDataset.create(
        path, li, max_rows_per_file=max(1000, li.count() // 30)
    )
    limited = spark.read.format("lance").option("limit", 2000).load(path)
    # the limit hint bounds the *planned fragments*; Spark re-applies the
    # exact limit above the scan (same non-guaranteed contract as A6)
    n_planned = limited.rdd.getNumPartitions()
    if n_planned >= len(ds.manifest.fragments):
        raise AssertionError(
            f"limit hint did not coalesce: {n_planned} partitions "
            f"for {len(ds.manifest.fragments)} fragments"
        )
    n_limited = limited.limit(2000).count()
    n_total = spark.read.format("lance").load(path).count()
    return spark.createDataFrame(
        [(n_limited, n_total)], "n_limited long, n_total long"
    )


# ---------------------------------------------------------------------------
# ds05 — projection pushdown with nested dereference (A5): a struct column is
# pruned to two referenced subfields via the `columns` read option
# (`LanceMetadata.java:463-551` applyProjection, `LanceFieldPath.java:21-68`);
# the scan reads only those parquet leaves. Values must match the oracle
# computed on the original flat table.
# ---------------------------------------------------------------------------
@register(
    "ds05_nested_projection",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n,
           CAST(SUM(LENGTH(c_name)) AS BIGINT) AS name_chars
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY segment
    """,
    doc="connector: columns option prunes nested struct dereferences into the scan",
    tags=("connector", "projection"),
)
def ds05(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds05")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
            F.struct(
                F.col("c_acctbal").alias("bal"), F.col("c_nationkey").alias("nation")
            ).alias("contact"),
        ).alias("info"),
    )
    LanceDataset.create(path, cust, max_rows_per_file=25_000)
    pruned = (
        spark.read.format("lance")
        .option("columns", "info.segment,info.name")
        .load(path)
    )
    return (
        pruned.groupBy(F.col("info.segment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("info.name")).alias("name_chars"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# ds06 — zone-map fragment pruning: lineitem written CLUSTERED BY l_orderkey
# (range sort before write — the standard layout optimization zone maps
# reward), so fragments carry disjoint key ranges; a pushed range filter
# must plan only the covering fragments (asserted) and still produce
# oracle-exact values.
# ---------------------------------------------------------------------------
@register(
    "ds06_zonemap_pruned_scan",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_orderkey >= 1000 AND l_orderkey <= 2000
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="connector: fragment zone maps prune non-matching fragments at planning",
    tags=("connector", "zonemap", "pruning"),
)
def ds06(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds06")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
        .orderBy("l_orderkey")  # cluster on the filter key: disjoint ranges
    )
    ds = LanceDataset.create(path, li, max_rows_per_file=5000)
    scan = (
        spark.read.format("lance")
        .load(path)
        .filter((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") <= 2000))
    )
    # exact mechanism check: planned fragments == fragments whose zone-map
    # range intersects [1000, 2000] (at tiny scales that may be all of them)
    covering = sum(
        1
        for f in ds.manifest.fragments
        if f.stats and not (
            f.stats["l_orderkey"]["max"] < 1000 or f.stats["l_orderkey"]["min"] > 2000
        )
    )
    n_planned = scan.rdd.getNumPartitions()
    if n_planned != covering:
        raise AssertionError(
            f"zone-map pruning planned {n_planned} fragments, expected "
            f"{covering} of {len(ds.manifest.fragments)}"
        )
    return (
        scan.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").cast("bigint").alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# ds07 — version-tailing STREAMING SOURCE: spark.readStream.format("lance")
# replays a dataset's append history as microbatches (offset = version,
# checkpoint-durable). The entry tails a create + append and must see
# exactly the full table — the oracle is the same data batch-side.
# ---------------------------------------------------------------------------
@register(
    "ds07_stream_source_tail",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(38,2))) AS DOUBLE) AS total
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="streaming SOURCE: readStream.format('lance') tails version log",
    tags=("datasource", "streaming", "source"),
)
def ds07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import run_to_memory

    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds07")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    ds = LanceDataset.create(path, part.filter(F.col("p_partkey") % 2 == 0))
    ds.append(part.filter(F.col("p_partkey") % 2 == 1))
    rows = run_to_memory(
        spark.readStream.format("lance").load(path), "append"
    )
    return (
        rows.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("p_retailprice").cast("decimal(38,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# ds08 — scalar-index point lookup (SURVEY §1.1 "Scalar index";
# `LanceFragmentPageSource.java:126` useScalarIndex): a selective equality/IN
# probe on a HIGH-CARDINALITY UNCLUSTERED column (o_custkey — the table is
# laid out by o_orderkey, so every fragment's zone map admits every custkey)
# goes through per-fragment sorted sidecars and decodes only the row groups
# holding matching rows. Values must equal the plain-parquet oracle exactly;
# the bounded-IO property itself is asserted in tests/test_datasource.py.
# ---------------------------------------------------------------------------
@register(
    "ds08_scalar_index_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_custkey IN (7, 11)
    ORDER BY o_orderkey
    """,
    doc="connector: scalar-index point lookup on an unclustered column",
    tags=("connector", "index", "pushdown"),
)
def ds08(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds08")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    ds = LanceDataset.create(path, orders, max_rows_per_file=5000)
    ds.create_scalar_index(spark, "o_custkey")
    return (
        spark.read.format("lance")
        .load(path)
        .filter(F.col("o_custkey").isin(7, 11))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# ds09 — streaming CDC source (`mode=cdc`): tails the version log emitting
# insert/delete EVENTS per version (table_changes' streaming form — per-
# version, not net: a row appended then deleted appears as both). The
# oracle replays the event history: every created+appended row as insert,
# every MoR-deleted row as delete.
# ---------------------------------------------------------------------------
@register(
    "ds09_stream_cdc_source",
    oracle="""
    WITH added AS (
      SELECT k AS n_nationkey, k % 5 AS n_regionkey
      FROM (SELECT unnest(generate_series(100, 104)) AS k)),
    events AS (
      SELECT CAST(n_nationkey AS INT) AS n_nationkey,
             CAST(n_regionkey AS INT) AS n_regionkey,
             'insert' AS _change_type
      FROM (SELECT n_nationkey, n_regionkey FROM nation
            UNION ALL SELECT * FROM added)
      UNION ALL
      SELECT CAST(n_nationkey AS INT), CAST(n_regionkey AS INT), 'delete'
      FROM (SELECT n_nationkey, n_regionkey FROM nation
            UNION ALL SELECT * FROM added)
      WHERE n_regionkey = 3)
    SELECT _change_type, n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM events
    GROUP BY _change_type, n_regionkey
    ORDER BY _change_type, n_regionkey
    """,
    doc="connector: streaming CDC source tails the version log as "
        "insert/delete events (per-version table_changes)",
    tags=("connector", "streaming", "cdc"),
)
def ds09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dml
    from ..streaming.events import run_to_memory

    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds09")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    ds = LanceDataset.create(path, nation, max_rows_per_file=8)      # v1
    ds = ds.append(
        spark.range(100, 105).selectExpr(
            "CAST(id AS INT) AS n_nationkey",
            "CAST(id % 5 AS INT) AS n_regionkey",
        )
    )                                                                # v2
    dml.delete(ds, spark, "n_regionkey = 3")                         # v3
    sdf = spark.readStream.format("lance").option("mode", "cdc").load(path)
    out = run_to_memory(sdf, "append")
    return (
        out.groupBy("_change_type", "n_regionkey")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("_change_type", "n_regionkey")
    )


# ---------------------------------------------------------------------------
# ds10 — streaming CDC over a REAL `.lance` dataset's version log
# (`.option("mode", "cdc")` on format("lance") readStream): the native
# twin of ds09 — but here the underlying DML is the round-8 NATIVE MoR
# path (deletion-vector files + delta fragments written without the
# SDK), so the stream must represent rewriting versions as
# delete+insert events instead of refusing them like the append-only
# tail (st11). Scenario: create, append, MoR DELETE, MoR UPDATE — the
# oracle reproduces the full event log.
# ---------------------------------------------------------------------------
@register(
    "ds10_native_stream_cdc",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               o_orderpriority,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders WHERE o_orderkey <= 600
    ),
    ev AS (
        SELECT 'insert' AS _change_type, o_orderkey, price_c FROM base
        UNION ALL
        SELECT 'delete', o_orderkey, price_c
        FROM base WHERE o_orderpriority = '5-LOW'
        UNION ALL
        SELECT 'delete', o_orderkey, price_c
        FROM base WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'insert', o_orderkey, price_c * 2
        FROM base WHERE o_orderpriority = '1-URGENT'
    )
    SELECT _change_type,
           COUNT(*) AS n_rows,
           CAST(SUM(price_c) AS BIGINT) AS price_sum,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM ev
    GROUP BY _change_type
    ORDER BY _change_type
    """,
    doc="connector: streaming CDC over the native .lance version log — "
        "MoR delete/update histories stream as insert/delete events",
    tags=("connector", "streaming", "cdc", "lance-native"),
)
def ds10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..format.lance_native import (
        create_native_dataset,
        native_delete_where,
        native_update_where,
    )
    from ..streaming.events import run_to_memory

    register_lance_datasource(spark)
    path = _fresh_path(sf_dir, "ds10-native-cdc")
    # fixture lands DISTRIBUTED (r14 — grandfather entry retired):
    # create_native_dataset(df) for v1, the DSv2 append for v2; the
    # CDC oracle is split-point-invariant (inserts counted across
    # versions), so a percentile cut replaces the index-half split
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 600)
        .selectExpr(
            "o_orderkey", "o_orderpriority",
            "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c")
        .orderBy("o_orderkey")
    )
    cut = int(src.selectExpr(
        "percentile_approx(o_orderkey, 0.5) AS c").first()["c"])
    create_native_dataset(
        src.where(f"o_orderkey < {cut}").coalesce(1), path)     # v1
    src.where(f"o_orderkey >= {cut}").coalesce(1) \
        .write.format("lance").mode("append").save(path)        # v2
    native_delete_where(                                        # v3
        spark, path, F.col("o_orderpriority") == "5-LOW")
    native_update_where(                                        # v4
        spark, path,
        F.col("o_orderpriority") == "1-URGENT",
        {"price_c": F.col("price_c") * 2},
    )
    sdf = spark.readStream.format("lance").option("mode", "cdc").load(path)
    out = run_to_memory(sdf, "append")
    return (
        out.groupBy("_change_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("price_c").alias("price_sum"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .orderBy("_change_type")
    )


# ---------------------------------------------------------------------------
# ds11 — df.write.format("lance") into a REAL `.lance` dataset: the DSv2
# writer face of the native commit path (A11 on the interop side) —
# executors stage native data files (leaf-validity NULLs, the dataset's
# file flavor), the driver commits ONE manifest version per save();
# mode("overwrite") truncates-and-replaces keeping schema and history.
# Scenario: create from customers, append a doubled-balance slice with
# an injected NULL segment, overwrite with the final mix, aggregate.
# ---------------------------------------------------------------------------
@register(
    "ds11_native_dsv2_write",
    oracle="""
    WITH base AS (
        SELECT c_custkey AS k,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
               c_mktsegment AS seg
        FROM customer WHERE c_custkey <= 400
    ),
    appended AS (
        SELECT k + 100000 AS k, bal_c * 2 AS bal_c,
               CASE WHEN k % 3 = 0 THEN NULL ELSE seg END AS seg
        FROM base WHERE k <= 150
    ),
    final AS (
        SELECT * FROM base UNION ALL SELECT * FROM appended
    )
    SELECT COALESCE(seg, 'NONE') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(bal_c) AS BIGINT) AS bal_sum,
           TRUE AS one_commit_per_save,
           TRUE AS history_survives_overwrite
    FROM final
    GROUP BY COALESCE(seg, 'NONE')
    ORDER BY segment
    """,
    doc="datasource: df.write.format('lance') append + overwrite into a "
        "native .lance dataset — executor-staged files, one manifest "
        "version per save, NULLs via leaf validity, history kept",
    tags=("datasource", "interop", "lance-native", "write", "nulls"),
)
def ds11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..format.lance_native import create_native_dataset, read_native_manifest
    from ..sources.lance_datasource import register_lance_datasource
    from ..tables import load_table

    path = _fresh_path(sf_dir, "ds11-native-write")
    base = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .selectExpr(
            "c_custkey AS k",
            "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c",
            "c_mktsegment AS seg",
        )
    )
    create_native_dataset(base.repartition(2), path, rows_per_fragment=150)
    register_lance_datasource(spark)

    appended = (
        base.filter(F.col("k") <= 150)
        .selectExpr(
            "k + 100000 AS k", "bal_c * 2 AS bal_c",
            "CASE WHEN k % 3 = 0 THEN NULL ELSE seg END AS seg",
        )
        .repartition(2)
    )
    v0 = read_native_manifest(path).version
    appended.write.format("lance").mode("append").save(path)
    v1 = read_native_manifest(path).version
    one_commit = v1 == v0 + 1

    # overwrite with the full final mix, then prove history survived
    final = spark.read.format("lance").load(path).localCheckpoint()
    final.write.format("lance").mode("overwrite").save(path)
    history_ok = (
        spark.read.format("lance").option("version", str(v1)).load(path)
        .count() == final.count()
    )
    return (
        spark.read.format("lance").load(path)
        .groupBy(F.coalesce(F.col("seg"), F.lit("NONE")).alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.sum("bal_c").alias("bal_sum"),
        )
        .withColumn("one_commit_per_save", F.lit(bool(one_commit)))
        .withColumn(
            "history_survives_overwrite", F.lit(bool(history_ok)))
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# ds12 — NESTED projection pushdown on a native `.lance` scan: dotted
# `columns` paths (the reference's escaped-dotted-path dereference
# pruning, `LanceMetadata.java:463-551` / `LanceFieldPath.java:21-68`)
# prune both the Spark schema AND the page decode — only the kept
# subtree's pages are read; sibling struct children (here a wide payload
# string) are never touched, proven by counting column-page accesses on
# the same decode path the executors run (lf19's probe pattern).
# ---------------------------------------------------------------------------
@register(
    "ds12_native_nested_projection",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN o_orderkey % 11 <> 0
                         THEN o_custkey END) AS BIGINT) AS a_sum,
           TRUE AS siblings_never_decoded,
           TRUE AS schema_pruned
    FROM orders
    WHERE o_orderkey <= 3000
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    doc="connector: nested dereference projection on a native .lance "
        "scan — dotted columns paths prune schema and page decode; "
        "sibling subtree pages provably untouched",
    tags=("connector", "projection", "nested", "lance-native"),
)
def ds12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..format import lance_native as ln
    from ..suite.lance_format import _fresh_path

    path = _fresh_path(sf_dir, "ds12-nproj")
    k = F.col("o_orderkey")
    src = (
        load_table(spark, sf_dir, "orders")
        .filter(k <= 3000)
        .select(
            k.alias("k"),
            F.col("o_orderpriority").alias("priority"),
            F.when(k % 11 != 0, F.struct(
                F.col("o_custkey").cast("long").alias("a"),
                F.repeat(F.col("o_orderstatus"), 40).alias("payload"),
                F.struct((k * 3).cast("long").alias("x")).alias("inner"),
            )).alias("meta"),
        )
    )
    ln.create_native_dataset(src, path, file_version=2)

    # driver-side decode proof on the exact executor path: project only
    # meta.a — the wide 'payload' and 'inner.x' pages must never load
    m = ln.read_native_manifest(path)
    calls: list[int] = []
    orig = ln._v2_pages
    ln._v2_pages = lambda raw, ci: calls.append(ci) or orig(raw, ci)
    try:
        ln.read_native_fragment(path, m.fragments[0], m,
                                columns=["meta.a"])
    finally:
        ln._v2_pages = orig
    fidx = m.fragments[0].files[0].field_ids
    names = {f.id: f.name for f in m.fields}
    touched = {names[fidx[c]] for c in set(calls)}
    siblings_skipped = touched == {"meta", "a"}

    from ..sources.lance_datasource import register_lance_datasource

    register_lance_datasource(spark)
    pr = (spark.read.format("lance")
          .option("columns", "priority,meta.a").load(path))
    schema_pruned = pr.schema.simpleString() == (
        "struct<priority:string,meta:struct<a:bigint>>")
    return (
        pr.groupBy("priority")
        .agg(F.count("*").alias("n"), F.sum("meta.a").alias("a_sum"))
        .withColumn(
            "siblings_never_decoded", F.lit(bool(siblings_skipped)))
        .withColumn("schema_pruned", F.lit(bool(schema_pruned)))
        .orderBy("priority")
    )
