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
