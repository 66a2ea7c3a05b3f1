"""JVM TableCatalog plugin (SURVEY §2A.A14 — the real `spark.sql.catalog.*`
half the regex SQL router cannot provide from pure Python).

The plugin must be configured before the JVM starts (spark.jars), so the
full exercise runs in a subprocess with its own SparkSession; the in-process
test covers the runtime ADD JAR load path the suite's cat10 query uses.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "jvm", "lance-jvm-catalog.jar")


def _ensure_jar() -> None:
    newest_src = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(os.path.join(REPO, "jvm", "src"))
        for f in files
    )
    if not os.path.exists(JAR) or os.path.getmtime(JAR) < newest_src:
        subprocess.run(
            [os.path.join(REPO, "tools", "build_jvm_catalog.sh")],
            check=True,
            capture_output=True,
        )


def test_jvm_catalog_end_to_end(tmp_path):
    """Full lifecycle in a dedicated session: namespaces, SELECT with parquet
    pushdown, VERSION/TIMESTAMP AS OF, CREATE/DROP TABLE, Python<->JVM
    manifest interop, write refusal, and the deletion-vector refusal."""
    _ensure_jar()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "jvm_catalog_smoke.py"),
         str(tmp_path / "warehouse")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"smoke failed:\n{proc.stdout}\n{proc.stderr[-2000:]}"
    assert "== JVM CATALOG SMOKE OK ==" in proc.stdout


def test_jvm_catalog_via_add_jar(spark, tmp_path):
    """The runtime load path (no pre-set spark.jars): ADD JAR + conf, then
    catalog SQL against a Python-committed dataset — what suite cat10 does
    under the driver's session."""
    _ensure_jar()
    from lance_trino_spark.format.dataset import LanceDataset

    root = str(tmp_path / "wh")
    os.makedirs(os.path.join(root, "geo"))
    df = spark.createDataFrame([(i, f"n{i}") for i in range(10)], "k int, s string")
    LanceDataset.create(os.path.join(root, "geo", "t.lance"), df)

    spark.sql(f"ADD JAR {JAR}")
    spark.conf.set("spark.sql.catalog.lance_jvm_t", "io.lancespark.LanceJvmCatalog")
    spark.conf.set("spark.sql.catalog.lance_jvm_t.root", root)
    try:
        rows = spark.sql(
            "SELECT s FROM lance_jvm_t.geo.t WHERE k >= 8 ORDER BY k"
        ).collect()
        assert [r.s for r in rows] == ["n8", "n9"]
        assert [r[0] for r in spark.sql(
            "SHOW NAMESPACES IN lance_jvm_t").collect()] == ["geo"]
    finally:
        spark.conf.unset("spark.sql.catalog.lance_jvm_t")
        spark.conf.unset("spark.sql.catalog.lance_jvm_t.root")


def test_jvm_catalog_reads_evolved_schema(spark, tmp_path):
    """Metadata-only ADD COLUMN through the Python API must be visible via
    the JVM catalog's delegated parquet scan: the table schema comes from
    the manifest, so old fragments null-fill natively in Spark's reader."""
    _ensure_jar()
    from lance_trino_spark.format.dataset import LanceDataset

    root = str(tmp_path / "wh2")
    os.makedirs(os.path.join(root, "evo"))
    path = os.path.join(root, "evo", "t.lance")
    ds = LanceDataset.create(
        path, spark.range(6).selectExpr("id AS k")
    )
    ds = ds.add_column("score", "double")
    ds.append(spark.range(6, 9).selectExpr("id AS k", "CAST(id AS DOUBLE) AS score"))

    spark.sql(f"ADD JAR {JAR}")
    spark.conf.set("spark.sql.catalog.lance_jvm_e", "io.lancespark.LanceJvmCatalog")
    spark.conf.set("spark.sql.catalog.lance_jvm_e.root", root)
    try:
        rows = spark.sql(
            "SELECT k, score FROM lance_jvm_e.evo.t ORDER BY k"
        ).collect()
        assert len(rows) == 9
        assert all(r.score is None for r in rows[:6])
        assert [r.score for r in rows[6:]] == [6.0, 7.0, 8.0]
    finally:
        spark.conf.unset("spark.sql.catalog.lance_jvm_e")
        spark.conf.unset("spark.sql.catalog.lance_jvm_e.root")


def test_dv_reader_factory_serialized_form_is_metadata_only(spark):
    """Scale pin (VERDICT r6 #1): DvReaderFactory — the object serialized
    into EVERY task closure of a DV-bearing scan — must carry only
    {data-file -> DV file path} strings, never deleted row indexes. Row
    sets are loaded executor-side per partition (LanceDvScan.deadFor ->
    loadDvBitmap), so a 100 TB table with heavy delete churn ships
    O(#fragments) metadata per task, not O(#deleted rows)."""
    _ensure_jar()
    spark.sql(f"ADD JAR {JAR}")
    jvm = spark._jvm
    loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
    cls = loader.loadClass("io.lancespark.LanceDvScan$DvReaderFactory")
    # .toString() not .getTypeName(): py4j cannot reflect methods on the
    # package-private ParameterizedTypeImpl the JDK returns here
    fields = {
        f.getName(): f.getGenericType().toString()
        for f in cls.getDeclaredFields()
    }
    assert "dvFiles" in fields, fields
    assert fields["dvFiles"] == "java.util.HashMap<java.lang.String, java.lang.String>"
    banned = ("HashSet", "Set<", "long[]", "Long[]", "Roaring", "BitSet")
    for name, typ in fields.items():
        assert not any(b in typ for b in banned), (name, typ, fields)


def test_jvm_native_row_level_update_merge(spark, tmp_path):
    """Catalyst-planned UPDATE / MERGE INTO / subquery DELETE on NATIVE
    (binary-manifest) tables: LancePyNativeTable exposes SupportsDelta
    (rowId = _row_address, representUpdateAsDeleteAndInsert — the
    reference's DELETE_ROW_AND_INSERT_ROW paradigm,
    LanceMergeSink.java:49-204); executors stage the delta and the
    driver bridges it into ONE Python-committed MoR version per
    statement. Write amplification is pinned: an UPDATE touching k rows
    keeps every pre-existing data file and adds exactly one fragment."""
    _ensure_jar()
    from lance_trino_spark.format.lance_native import (
        read_native_manifest, write_native_dataset)
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource)

    root = str(tmp_path / "wh")
    os.makedirs(os.path.join(root, "db"))
    loc = os.path.join(root, "db", "t.lance")
    write_native_dataset(loc, {
        "k": list(range(20)),
        "v": [i * 10 for i in range(20)],
    })
    register_lance_datasource(spark)
    spark.sql(f"ADD JAR {JAR}")
    spark.conf.set("spark.sql.catalog.lance_jvm_rl", "io.lancespark.LanceJvmCatalog")
    spark.conf.set("spark.sql.catalog.lance_jvm_rl.root", root)
    try:
        m0 = read_native_manifest(loc)
        files0 = sorted(df.path for f in m0.fragments for df in f.files)

        # UPDATE: one MoR version, old files kept, one new fragment
        spark.sql("UPDATE lance_jvm_rl.db.t SET v = v + 1 WHERE k >= 15")
        m1 = read_native_manifest(loc)
        files1 = sorted(df.path for f in m1.fragments for df in f.files)
        assert m1.version == m0.version + 1
        assert set(files0) <= set(files1)
        assert len(files1) == len(files0) + 1
        rows = spark.sql(
            "SELECT k, v FROM lance_jvm_rl.db.t ORDER BY k").collect()
        assert [r.v for r in rows] == [
            i * 10 + (1 if i >= 15 else 0) for i in range(20)]

        # MERGE with all three WHEN branches, one version
        spark.createDataFrame(
            [(0, 999), (15, 999), (100, 999)], "k long, v long"
        ).createOrReplaceTempView("rl_src")
        spark.sql("""
          MERGE INTO lance_jvm_rl.db.t AS t USING rl_src AS s ON t.k = s.k
          WHEN MATCHED AND s.k < 10 THEN UPDATE SET v = s.v
          WHEN MATCHED THEN DELETE
          WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        """)
        m2 = read_native_manifest(loc)
        assert m2.version == m1.version + 1
        got = {r.k: r.v for r in spark.sql(
            "SELECT k, v FROM lance_jvm_rl.db.t").collect()}
        assert got[0] == 999 and got[100] == 999 and 15 not in got
        assert len(got) == 20  # 20 - deleted 15 + inserted 100

        # complex-predicate DELETE takes the row-level path (delete-only
        # delta: empty write schema) — simple DELETE stays metadata-only
        spark.sql("DELETE FROM lance_jvm_rl.db.t "
                  "WHERE k IN (SELECT k FROM rl_src WHERE v = 999 AND k = 0)")
        assert spark.sql(
            "SELECT count(*) c FROM lance_jvm_rl.db.t").collect()[0].c == 19

        # no-match UPDATE commits NOTHING (no version churn)
        v_before = read_native_manifest(loc).version
        spark.sql("UPDATE lance_jvm_rl.db.t SET v = 0 WHERE k = 424242")
        assert read_native_manifest(loc).version == v_before

        # pre-statement history intact; staging dirs cleaned up
        assert spark.sql(
            "SELECT count(*) c FROM lance_jvm_rl.db.t "
            f"VERSION AS OF {m0.version}").collect()[0].c == 20
        assert not [n for n in os.listdir(loc) if n.startswith(".stage-delta")]
    finally:
        spark.conf.unset("spark.sql.catalog.lance_jvm_rl")
        spark.conf.unset("spark.sql.catalog.lance_jvm_rl.root")


def test_jvm_native_truncate_is_metadata_only(spark, tmp_path):
    """SQL TRUNCATE TABLE on a native table commits ONE zero-fragment
    manifest version (the empty-overwrite shape) instead of
    SupportsDeleteV2's default full-address-stream delete — no data is
    read, schema and history survive."""
    _ensure_jar()
    from lance_trino_spark.format.lance_native import (
        read_native_manifest, write_native_dataset)
    from lance_trino_spark.sources.lance_datasource import (
        register_lance_datasource)

    root = str(tmp_path / "wh")
    os.makedirs(os.path.join(root, "db"))
    loc = os.path.join(root, "db", "t.lance")
    write_native_dataset(loc, {"k": list(range(1000))})
    register_lance_datasource(spark)
    spark.sql(f"ADD JAR {JAR}")
    spark.conf.set("spark.sql.catalog.lance_jvm_tr", "io.lancespark.LanceJvmCatalog")
    spark.conf.set("spark.sql.catalog.lance_jvm_tr.root", root)
    try:
        v0 = read_native_manifest(loc).version
        spark.sql("TRUNCATE TABLE lance_jvm_tr.db.t")
        m1 = read_native_manifest(loc)
        assert m1.version == v0 + 1          # ONE commit
        assert not m1.fragments              # zero fragments, no DV files
        assert spark.sql(
            "SELECT count(*) c FROM lance_jvm_tr.db.t").collect()[0].c == 0
        # schema survives; the pre-truncate snapshot stays readable
        assert spark.sql(
            f"SELECT count(*) c FROM lance_jvm_tr.db.t VERSION AS OF {v0}"
        ).collect()[0].c == 1000
        spark.sql("INSERT INTO lance_jvm_tr.db.t VALUES (7)")
        assert spark.sql(
            "SELECT k FROM lance_jvm_tr.db.t").collect()[0].k == 7
    finally:
        spark.conf.unset("spark.sql.catalog.lance_jvm_tr")
        spark.conf.unset("spark.sql.catalog.lance_jvm_tr.root")
