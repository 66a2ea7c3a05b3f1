"""Smoke-drive the JVM TableCatalog plugin in a fresh Spark session.

Run directly (or via tests/test_jvm_catalog.py, which subprocesses this so
the jar + catalog confs are set before the JVM starts):

    python3 tools/jvm_catalog_smoke.py [warehouse_dir]

Exercises: SHOW NAMESPACES / SHOW TABLES, SELECT through Catalyst with
pushdown, VERSION AS OF / TIMESTAMP AS OF time travel, CREATE/DROP TABLE,
native SQL DELETE (SupportsDeleteV2: deletion vectors, DV union, fragment
drop, metadata-only truncate), native SQL INSERT / INSERT OVERWRITE
(V1Write fallback), Python<->JVM committer interop both ways, and the
deletion-vector scan refusal.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
JAR = os.path.join(REPO, "jvm", "lance-jvm-catalog.jar")


def main() -> None:
    warehouse = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lancejvm_")
    os.makedirs(os.path.join(warehouse, "main"), exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jvm-catalog-smoke")
        .config("spark.jars", JAR)
        .config("spark.sql.catalog.lance", "io.lancespark.LanceJvmCatalog")
        .config("spark.sql.catalog.lance.root", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from lance_trino_spark.format.dataset import LanceDataset

    failures: list[str] = []

    def check(label: str, ok: bool, detail: str = "") -> None:
        print(("PASS " if ok else "FAIL ") + label + (f" ({detail})" if detail else ""))
        if not ok:
            failures.append(label)

    # v1: 5 rows via the Python committer; v2: 3 more appended.
    tbl = os.path.join(warehouse, "main", "people.lance")
    df1 = spark.createDataFrame(
        [(1, "ann", 10.5), (2, "bob", 20.0), (3, "cy", 30.25), (4, "dee", 40.0), (5, "eve", 50.75)],
        "id int, name string, score double",
    )
    ds = LanceDataset.create(tbl, df1)
    ts_v1_ms = ds.manifest.timestamp_ms
    df2 = spark.createDataFrame([(6, "fay", 60.0), (7, "gus", 70.5), (8, "hal", 80.0)],
                                "id int, name string, score double")
    ds = ds.append(df2)

    ns = [r[0] for r in spark.sql("SHOW NAMESPACES IN lance").collect()]
    check("show-namespaces", "main" in ns, str(ns))
    tables = [r.tableName for r in spark.sql("SHOW TABLES IN lance.main").collect()]
    check("show-tables", tables == ["people"], str(tables))

    got = spark.sql(
        "SELECT name FROM lance.main.people WHERE id >= 6 ORDER BY id"
    ).collect()
    check("select-latest", [r.name for r in got] == ["fay", "gus", "hal"], str(got))

    # The delegated parquet scan must carry the pushed predicate and the
    # pruned read schema — proof the stock Catalyst pushdown drivers engage.
    plan = (
        spark.sql("SELECT name FROM lance.main.people WHERE id >= 6")
        ._jdf.queryExecution().executedPlan().toString()
    )
    flat = plan.replace(" ", "")
    check("pushdown", "GreaterThanOrEqual(id,6)" in flat and "PushedFilters" in plan,
          "parquet PushedFilters present")
    check("column-pruning", "ReadSchema:struct<id:int,name:string>" in flat, "scan reads 2 of 3 cols")

    n_v1 = spark.sql("SELECT count(*) AS c FROM lance.main.people VERSION AS OF 1").collect()[0].c
    check("version-as-of", n_v1 == 5, str(n_v1))
    n_ts = spark.sql(
        f"SELECT count(*) AS c FROM lance.main.people "
        f"TIMESTAMP AS OF to_timestamp({ts_v1_ms} / 1000.0)"
    ).collect()[0].c
    check("timestamp-as-of", n_ts == 5, str(n_ts))

    desc = {r.col_name: r.data_type for r in spark.sql("DESCRIBE lance.main.people").collect()}
    check("describe", desc.get("score") == "double", str(desc))

    spark.sql("CREATE NAMESPACE lance.scratch")
    spark.sql("CREATE TABLE lance.scratch.t2 (i INT, s STRING)")
    check("create-empty", spark.sql("SELECT * FROM lance.scratch.t2").count() == 0)
    # The Python side must see the JVM-created manifest as a valid dataset.
    py_ds = LanceDataset.open(os.path.join(warehouse, "scratch", "t2.lance"))
    check("python-reads-jvm-create", py_ds.count_rows() == 0 and py_ds.version == 1)
    spark.sql("DROP TABLE lance.scratch.t2")
    check("drop-table", [r.tableName for r in
                         spark.sql("SHOW TABLES IN lance.scratch").collect()] == [])

    # ---- native SQL DELETE through the JVM catalog (SupportsDeleteV2) ----
    # Plain spark.sql() DML: MoR deletion vectors written by the JVM with
    # the same layout + hard-link commit protocol as the Python committer.
    dtbl = os.path.join(warehouse, "main", "deltest.lance")
    d1 = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 6)], "id int, name string"
    )
    dds = LanceDataset.create(dtbl, d1)
    dds = dds.append(
        spark.createDataFrame([(i, f"n{i}") for i in range(6, 9)],
                              "id int, name string")
    )
    spark.sql("DELETE FROM lance.main.deltest WHERE id % 2 = 0")
    after = LanceDataset.open(dtbl)
    check("jvm-delete-commit", after.version == dds.version + 1
          and after.manifest.operation == "update",
          f"v{after.version} {after.manifest.operation}")
    check("jvm-delete-count", after.count_rows() == 4, str(after.count_rows()))
    # Python reads the JVM-written deletion vectors (committer interop)
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource as _reg,
    )

    _reg(spark)
    left = sorted(r.id for r in spark.read.format("lance").load(dtbl).collect())
    check("python-reads-jvm-dv", left == [1, 3, 5, 7], str(left))
    # JVM scans APPLY the deletion vectors (merge-on-read reads natively:
    # row-counted readers over whole-file partitions, LanceDvScan)
    jvm_left = sorted(
        r.id for r in spark.sql("SELECT id FROM lance.main.deltest").collect()
    )
    check("jvm-dv-scan-values", jvm_left == [1, 3, 5, 7], str(jvm_left))
    jvm_n = spark.sql("SELECT count(*) c FROM lance.main.deltest").collect()[0].c
    check("jvm-dv-scan-count", jvm_n == 4, str(jvm_n))
    # deleting every remaining row of a fragment drops the fragment;
    # a second JVM delete must union with the existing vectors
    spark.sql("DELETE FROM lance.main.deltest WHERE id >= 5")
    after2 = LanceDataset.open(dtbl)
    left2 = sorted(r.id for r in spark.read.format("lance").load(dtbl).collect())
    check("jvm-delete-union", left2 == [1, 3], str(left2))
    check("jvm-delete-drops-fragment",
          len(after2.manifest.fragments) < len(after.manifest.fragments),
          f"{len(after.manifest.fragments)} -> {len(after2.manifest.fragments)}")
    # subquery DELETE: no V2-predicate rendering exists, so the metadata
    # path refuses — the statement falls through to the SupportsDelta MoR
    # plan (delete-only WriteDelta) instead of erroring out
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("_kill")
    spark.sql(
        "DELETE FROM lance.main.deltest WHERE id IN (SELECT id FROM _kill)"
    )
    left3 = sorted(r.id for r in spark.read.format("lance").load(dtbl).collect())
    check("jvm-delete-subquery-mor", left3 == [3], str(left3))
    # unconditional DELETE = metadata-only truncate (zero data IO)
    spark.sql("DELETE FROM lance.main.deltest")
    after3 = LanceDataset.open(dtbl)
    check("jvm-truncate-metadata-only",
          after3.count_rows() == 0 and after3.manifest.fragments == [],
          f"v{after3.version}")

    # ---- native SQL INSERT through the JVM catalog (V1Write fallback) ----
    v_people = LanceDataset.open(os.path.join(warehouse, "main", "people.lance")).version
    spark.sql("INSERT INTO lance.main.people VALUES (9, 'ivy', 90.0), (10, 'jax', 15.5)")
    ppl = LanceDataset.open(os.path.join(warehouse, "main", "people.lance"))
    check("jvm-insert-commit", ppl.version == v_people + 1
          and ppl.manifest.operation == "append",
          f"v{ppl.version} {ppl.manifest.operation}")
    got9 = spark.sql(
        "SELECT name FROM lance.main.people WHERE id >= 9 ORDER BY id"
    ).collect()
    check("jvm-insert-readback", [r.name for r in got9] == ["ivy", "jax"], str(got9))
    check("python-reads-jvm-insert", ppl.count_rows() == 10, str(ppl.count_rows()))
    # JVM-written fragments carry sound footer zone-map stats (int cols);
    # the insert may split across parts, so aggregate over the new frags
    old_max_id = max(f.id for f in ds.manifest.fragments)
    new_frags = [f for f in ppl.manifest.fragments if f.id > old_max_id]
    id_mins = [f.stats["id"]["min"] for f in new_frags if f.stats and "id" in f.stats]
    id_maxs = [f.stats["id"]["max"] for f in new_frags if f.stats and "id" in f.stats]
    check("jvm-insert-zonemap-stats",
          new_frags and len(id_mins) == len(new_frags)
          and min(id_mins) == 9 and max(id_maxs) == 10
          and all("score" not in (f.stats or {}) for f in new_frags),
          str([f.stats for f in new_frags]))
    # INSERT OVERWRITE commits an Overwrite manifest
    spark.sql("CREATE TABLE lance.main.ow (i INT, s STRING)")
    spark.sql("INSERT INTO lance.main.ow VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE lance.main.ow VALUES (7, 'z')")
    ow = LanceDataset.open(os.path.join(warehouse, "main", "ow.lance"))
    check("jvm-insert-overwrite", ow.count_rows() == 1
          and ow.manifest.operation == "overwrite",
          f"{ow.count_rows()} {ow.manifest.operation}")
    got_ow = spark.sql("SELECT i, s FROM lance.main.ow").collect()
    check("jvm-overwrite-readback", [(r.i, r.s) for r in got_ow] == [(7, "z")],
          str(got_ow))

    # MoR deletion vectors: JVM path must refuse, Python path must serve.
    # id=4 sits in a 2-row fragment, so the delete leaves a real deletion
    # vector (a fully-deleted fragment would just be dropped from the
    # manifest, which the JVM path handles fine).
    from lance_trino_spark.operators.dml import delete as lance_delete

    # fresh handle: the JVM INSERT above advanced the table version
    ds = lance_delete(LanceDataset.open(tbl), spark, "id = 4")
    # Python-committed DV, JVM merge-on-read scan: both committers' vectors
    # are served natively now
    jvm_ppl = sorted(
        r.id for r in spark.sql("SELECT id FROM lance.main.people").collect()
    )
    check("jvm-serves-python-dv", 4 not in jvm_ppl and len(jvm_ppl) == 9,
          str(jvm_ppl))
    from lance_trino_spark.sources.lance_datasource import register_lance_datasource

    register_lance_datasource(spark)
    n_py = spark.read.format("lance").load(tbl).count()
    check("python-path-serves-dv", n_py == 9, str(n_py))  # 10 rows - id=4

    # native SQL UPDATE / MERGE (SupportsRowLevelOperations, copy-on-write)
    spark.sql("CREATE TABLE lance.main.cow (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO lance.main.cow VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    spark.sql("UPDATE lance.main.cow SET v = v * 10 WHERE id >= 2")
    got = sorted(
        (r.id, r.v)
        for r in spark.sql("SELECT id, v FROM lance.main.cow").collect()
    )
    check("jvm-update", got == [(1, 1.0), (2, 20.0), (3, 30.0)], str(got))
    spark.createDataFrame(
        [(3, 99.0), (4, 4.0)], "id long, v double"
    ).createOrReplaceTempView("_cow_src")
    spark.sql(
        "MERGE INTO lance.main.cow t USING _cow_src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = sorted(
        (r.id, r.v)
        for r in spark.sql("SELECT id, v FROM lance.main.cow").collect()
    )
    check("jvm-merge",
          got == [(1, 1.0), (2, 20.0), (3, 99.0), (4, 4.0)], str(got))
    # UPDATE over a DV-bearing table merges the DV into the rewrite
    spark.sql("DELETE FROM lance.main.cow WHERE id = 1")
    spark.sql("UPDATE lance.main.cow SET v = 0.0 WHERE id = 4")
    got = sorted(
        (r.id, r.v)
        for r in spark.sql("SELECT id, v FROM lance.main.cow").collect()
    )
    check("jvm-update-over-dv",
          got == [(2, 20.0), (3, 99.0), (4, 0.0)], str(got))
    cow_ds = LanceDataset.open(os.path.join(warehouse, "main", "cow.lance"))
    check("jvm-mor-python-readback",
          cow_ds.to_df(spark).count() == 3
          and cow_ds.manifest.operation == "update",
          f"{cow_ds.manifest.operation} v{cow_ds.manifest.version}")

    # MoR write amplification (SupportsDelta, DELETE_ROW_AND_INSERT_ROW):
    # a selective UPDATE must NOT rewrite any fragment — every original
    # data file carries over untouched; touched rows become deletion-vector
    # entries on their fragment plus ONE new fragment of replacement rows
    from lance_trino_spark.format.manifest import latest_version, read_manifest

    prune_tbl = os.path.join(warehouse, "main", "prune.lance")
    LanceDataset.create(
        prune_tbl,
        spark.range(1000).selectExpr(
            "id", "concat('r', id) as tag"
        ).coalesce(1),
        max_rows_per_file=200,
    )
    before = {
        f.id: f.path
        for f in read_manifest(prune_tbl, latest_version(prune_tbl)).fragments
    }
    spark.sql("UPDATE lance.main.prune SET tag = 'hit' WHERE id < 150")
    after = read_manifest(prune_tbl, latest_version(prune_tbl)).fragments
    kept = sorted(f.id for f in after if f.path == before.get(f.id))
    dv = {f.id: f.deletion.num_deleted for f in after if f.deletion}
    new_frags = [f for f in after if f.id not in before]
    n_hit = spark.sql(
        "SELECT count(*) FROM lance.main.prune WHERE tag = 'hit'"
    ).collect()[0][0]
    n_all = spark.sql("SELECT count(*) FROM lance.main.prune").collect()[0][0]
    check("jvm-mor-update-no-rewrite",
          kept == [0, 1, 2, 3, 4] and dv == {0: 150}
          and len(new_frags) == 1 and new_frags[0].physical_rows == 150
          and n_hit == 150 and n_all == 1000,
          f"kept={kept} dv={dv} new={[(f.id, f.physical_rows) for f in new_frags]}"
          f" hits={n_hit} total={n_all}")

    # write amplification, sharpest form: a 1-row UPDATE on a 5-fragment
    # table commits exactly one DV entry + a 1-row fragment
    spark.sql("UPDATE lance.main.prune SET tag = 'one' WHERE id = 777")
    after2 = read_manifest(prune_tbl, latest_version(prune_tbl)).fragments
    dv2 = {f.id: f.deletion.num_deleted for f in after2 if f.deletion}
    new2 = [f for f in after2 if f.id not in {g.id for g in after}]
    check("jvm-mor-1row-update-amplification",
          dv2 == {0: 150, 3: 1} and len(new2) == 1
          and new2[0].physical_rows == 1,
          f"dv={dv2} new={[(f.id, f.physical_rows) for f in new2]}")

    # $row_address metadata column: fragment_id << 32 | row_index,
    # selectable in plain SQL, stable across merge-on-read deletes
    addr_tbl = os.path.join(warehouse, "main", "addr.lance")
    LanceDataset.create(
        addr_tbl,
        spark.range(500).selectExpr("id").coalesce(1),
        max_rows_per_file=100,
    )
    rows = spark.sql(
        "SELECT id, `$row_address` AS a FROM lance.main.addr ORDER BY id"
    ).collect()
    ok_addr = all(r.a == ((r.id // 100) << 32 | (r.id % 100)) for r in rows)
    check("jvm-row-address", ok_addr and len(rows) == 500,
          f"n={len(rows)} first={rows[0].a} frag1={rows[100].a}")
    spark.sql("DELETE FROM lance.main.addr WHERE id % 3 = 0")
    rows = spark.sql(
        "SELECT id, `$row_address` AS a FROM lance.main.addr ORDER BY id"
    ).collect()
    ok_stable = all(
        r.a == ((r.id // 100) << 32 | (r.id % 100)) for r in rows
    )
    check("jvm-row-address-stable-across-mor",
          ok_stable and len(rows) == 333, f"n={len(rows)}")

    # A8 COUNT(*) pushdown: unfiltered ungrouped COUNT answered from the
    # manifest as a LocalScan — zero data files scanned, deletion-aware;
    # filtered counts still scan and stay exact
    n0 = spark.sql("SELECT COUNT(*) FROM lance.main.addr").collect()[0][0]
    plan = spark.sql(
        "EXPLAIN FORMATTED SELECT COUNT(*) FROM lance.main.addr"
    ).collect()[0][0]
    check("jvm-count-star-manifest",
          n0 == 333 and "LocalTableScan" in plan and "BatchScan" not in plan,
          f"n={n0} local={'LocalTableScan' in plan}")
    nf = spark.sql(
        "SELECT COUNT(*) FROM lance.main.addr WHERE id < 30"
    ).collect()[0][0]
    check("jvm-count-filtered-scans", nf == 20, f"n={nf}")

    # MANIFEST AGGREGATES (beyond the reference's COUNT(*)-only rule):
    # unfiltered ungrouped MIN/MAX/COUNT(col) answered from zone-map
    # bounds as a LocalScan on DV-free tables; a table with deletion
    # vectors refuses (a deleted row may hold the extremum) and scans
    agg_tbl = os.path.join(warehouse, "main", "aggzm.lance")
    LanceDataset.create(
        agg_tbl,
        spark.range(400).selectExpr(
            "id",
            "CASE WHEN id % 10 = 0 THEN NULL "
            "ELSE cast(id as double) / 4 END AS v",
            "concat('k-', lpad(cast(id as string), 4, '0')) AS k"),
        max_rows_per_file=100,
    )
    q = ("SELECT COUNT(*), MIN(id), MAX(id), MIN(v), MAX(v), COUNT(v), "
         "MIN(k), MAX(k) FROM lance.main.aggzm")
    r = spark.sql(q).collect()[0]
    plan = spark.sql("EXPLAIN FORMATTED " + q).collect()[0][0]
    check("jvm-manifest-agg-minmax",
          tuple(r) == (400, 0, 399, 0.25, 99.75, 360, "k-0000", "k-0399")
          and "LocalTableScan" in plan and "BatchScan" not in plan,
          f"r={tuple(r)} local={'LocalTableScan' in plan}")
    plan_dv = spark.sql(
        "EXPLAIN FORMATTED SELECT MIN(id), MAX(id) FROM lance.main.addr"
    ).collect()[0][0]
    r_dv = spark.sql(
        "SELECT MIN(id), MAX(id) FROM lance.main.addr").collect()[0]
    check("jvm-manifest-agg-dv-refuses",
          "LocalTableScan" not in plan_dv and tuple(r_dv) == (1, 499),
          f"r={tuple(r_dv)} local={'LocalTableScan' in plan_dv}")

    # ALTER TABLE ADD/DROP COLUMN: Catalyst-planned metadata-only schema
    # evolution (beyond the reference, which rejects evolution) — old
    # fragment files read the added column as NULL, dropped names retire
    # forever, RENAME refuses (by-name parquet resolution)
    alt_tbl = os.path.join(warehouse, "main", "alt.lance")
    LanceDataset.create(
        alt_tbl, spark.range(60).selectExpr("id", "id * 2 AS v"),
        max_rows_per_file=30)
    spark.sql("ALTER TABLE lance.main.alt ADD COLUMNS (w STRING)")
    got_alt = spark.sql(
        "SELECT * FROM lance.main.alt WHERE id = 5").collect()[0]
    spark.sql("INSERT INTO lance.main.alt VALUES (999, 0, 'x')")
    spark.sql("ALTER TABLE lance.main.alt DROP COLUMN v")
    cols_alt = spark.table("lance.main.alt").columns
    check("jvm-alter-add-drop",
          tuple(got_alt) == (5, 10, None) and cols_alt == ["id", "w"],
          f"row={tuple(got_alt)} cols={cols_alt}")
    readd_refused = rename_refused = False
    try:
        spark.sql("ALTER TABLE lance.main.alt ADD COLUMNS (v BIGINT)")
    except Exception as e:
        readd_refused = "previously dropped" in str(e)
    try:
        spark.sql("ALTER TABLE lance.main.alt RENAME COLUMN w TO w2")
    except Exception as e:
        rename_refused = "by NAME" in str(e)
    check("jvm-alter-guards", readd_refused and rename_refused,
          f"readd={readd_refused} rename={rename_refused}")
    # SET/UNSET TBLPROPERTIES: user properties commit as manifest
    # versions; engine-owned keys refuse
    spark.sql("ALTER TABLE lance.main.alt SET TBLPROPERTIES "
              "('owner.team' = 'data-eng', 'pii' = 'false')")
    spark.sql("ALTER TABLE lance.main.alt UNSET TBLPROPERTIES ('pii')")
    got_props = {
        r.key: r.value
        for r in spark.sql("SHOW TBLPROPERTIES lance.main.alt").collect()
    }
    reserved_refused = False
    try:
        spark.sql("ALTER TABLE lance.main.alt SET TBLPROPERTIES "
                  "('retired_columns' = 'x')")
    except Exception as e:
        reserved_refused = "engine-owned" in str(e)
    check("jvm-tblproperties",
          got_props.get("owner.team") == "data-eng"
          and "pii" not in got_props and reserved_refused,
          f"props={got_props} reserved={reserved_refused}")

    # CALL procedures (Spark 4.1 ProcedureCatalog): vanilla-SQL
    # maintenance — restore + tags, metadata-only, Python-interoperable
    spark.sql("CALL lance.system.create_tag('main.alt', 'pin1', 1)")
    r_res = spark.sql("CALL lance.system.restore('main.alt', 1)").collect()
    n_res = spark.sql("SELECT COUNT(*) FROM lance.main.alt").collect()[0][0]
    from lance_trino_spark.format.refs import resolve_tag as _rt
    tag_v = _rt(alt_tbl, "pin1")
    spark.sql("CALL lance.system.drop_tag('main.alt', 'pin1')")
    proc_refused = False
    try:
        spark.sql("CALL lance.system.drop_tag('main.alt', 'pin1')").collect()
    except Exception as e:
        proc_refused = "no such tag" in str(e)
    check("jvm-call-procedures",
          r_res[0].restored_to == 1 and n_res == 60 and tag_v == 1
          and proc_refused,
          f"restore={tuple(r_res[0])} n={n_res} tag_v={tag_v}")

    # NATIVE `.lance` tables through plain spark.sql: the catalog
    # detects binary manifests and delegates the Table to the Python
    # "lance" data source (LancePyNativeTable) — SELECT, VERSION AS OF
    # n/'tag', TIMESTAMP AS OF, and INSERT INTO all plan in Catalyst
    from lance_trino_spark.format import lance_native as ln
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource)

    register_lance_datasource(spark)
    nat = os.path.join(warehouse, "main", "nat.lance")
    ln.write_native_dataset(
        nat, {"k": list(range(60)), "g": [i % 3 for i in range(60)]})
    ln.append_native_rows(nat, {"k": list(range(60, 90)), "g": [9] * 30})
    ln.native_create_tag(nat, "first", 1)
    n_all = spark.sql("SELECT COUNT(*) FROM lance.main.nat").collect()[0][0]
    n_v1 = spark.sql(
        "SELECT COUNT(*) FROM lance.main.nat VERSION AS OF 1"
    ).collect()[0][0]
    n_tag = spark.sql(
        "SELECT COUNT(*) FROM lance.main.nat VERSION AS OF 'first'"
    ).collect()[0][0]
    n_ts = spark.sql(
        "SELECT COUNT(*) FROM lance.main.nat "
        "TIMESTAMP AS OF current_timestamp()"
    ).collect()[0][0]
    check("jvm-native-sql-select-traveled",
          (n_all, n_v1, n_tag, n_ts) == (90, 60, 60, 90),
          f"{(n_all, n_v1, n_tag, n_ts)}")
    spark.sql("INSERT INTO lance.main.nat VALUES (900, 9), (901, 9)")
    check("jvm-native-sql-insert-commits",
          ln.read_native_manifest(nat).version == 3
          and spark.sql("SELECT COUNT(*) FROM lance.main.nat")
          .collect()[0][0] == 92)
    nj = spark.sql(
        "SELECT COUNT(*) FROM lance.main.nat n JOIN lance.main.addr a "
        "ON n.k = a.id"
    ).collect()[0][0]
    check("jvm-native-joins-own-format", nj > 0, f"n={nj}")

    # CBO column statistics (r10): with spark.sql.cbo.enabled the scan
    # reports per-column NDV (zone-map HLL registers) + null counts to
    # Catalyst — the join-reordering input beyond the reference's
    # rowCount floor. Default confs stay byte-identical (the wrapper is
    # conf-gated), which every earlier plan check in this smoke pins.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        df = spark.sql("SELECT id FROM lance.main.addr")
        st = df._jdf.queryExecution().optimizedPlan().stats()
        got_rows = st.rowCount().isDefined()
        ndvs = {}
        it = st.attributeStats().iterator()
        while it.hasNext():
            kv = it.next()
            cs = kv._2()
            if cs.distinctCount().isDefined():
                ndvs[kv._1().name()] = int(str(cs.distinctCount().get()))
        check("jvm-cbo-column-ndv",
              got_rows and "id" in ndvs and ndvs["id"] > 0,
              f"ndvs={ndvs}")
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")

    spark.stop()
    if failures:
        print(f"== SMOKE FAILED: {failures} ==")
        sys.exit(1)
    print("== JVM CATALOG SMOKE OK ==")


if __name__ == "__main__":
    main()
