"""LanceCatalog tests: namespace DDL, SQL routing, time travel, the COUNT(*)
manifest fast path (zero data scanned — proven by removing the data files),
and the restrict-only drop semantics the reference enforces
(`LanceMetadata.java:162-245`)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_trino_spark.catalog import CatalogError, LanceCatalog


@pytest.fixture
def cat(spark, tmp_path):
    return LanceCatalog(spark, str(tmp_path / "cat"))


def _src(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )


def test_namespace_ddl(cat):
    cat.sql("CREATE SCHEMA a")
    cat.sql("CREATE SCHEMA b")
    assert cat.list_namespaces() == ["a", "b"]
    with pytest.raises(CatalogError):
        cat.create_namespace("a")
    cat.sql("CREATE SCHEMA IF NOT EXISTS a")  # no error
    cat.sql("DROP SCHEMA b")
    assert cat.list_namespaces() == ["a"]
    with pytest.raises(CatalogError):
        cat.drop_namespace("zz")
    cat.sql("DROP SCHEMA IF EXISTS zz")  # no error


def test_table_lifecycle_and_show(cat, spark):
    _src(spark).createOrReplaceTempView("_cat_src")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_src")
    assert [r["table"] for r in cat.sql("SHOW TABLES IN db").collect()] == ["t"]
    desc = {r["col_name"]: r["data_type"] for r in cat.sql("DESCRIBE db.t").collect()}
    assert desc == {"k": "bigint", "g": "bigint"}
    # restrict-only schema drop while a table exists
    with pytest.raises(CatalogError):
        cat.sql("DROP SCHEMA db")
    cat.sql("DROP TABLE db.t")
    cat.sql("DROP SCHEMA db")


def test_select_routing_and_join(cat, spark):
    _src(spark).createOrReplaceTempView("_cat_src")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_src")
    out = cat.sql(
        "SELECT g, COUNT(*) AS n FROM db.t WHERE k >= 50 GROUP BY g ORDER BY g"
    ).collect()
    assert [(r["g"], r["n"]) for r in out] == [(i, 10) for i in range(5)]
    # self-join through the router — both refs rewritten to pinned views
    both = cat.sql(
        "SELECT a.g, COUNT(*) AS n FROM db.t a JOIN db.t b ON a.k = b.k "
        "GROUP BY a.g ORDER BY a.g"
    ).collect()
    assert [(r["g"], r["n"]) for r in both] == [(i, 20) for i in range(5)]


def test_version_as_of_sql(cat, spark):
    _src(spark, 10).createOrReplaceTempView("_cat_v1")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_v1")
    cat.sql("INSERT INTO db.t SELECT k + 10 AS k, g FROM _cat_v1")
    assert cat.sql("SELECT COUNT(*) AS n FROM db.t").collect()[0]["n"] == 20
    old = cat.sql("SELECT COUNT(*) AS n FROM (SELECT * FROM db.t VERSION AS OF 1) s")
    assert old.collect()[0]["n"] == 10


def test_string_literal_never_rewritten(cat, spark):
    """A string literal that happens to contain `FROM <existing schema.table>`
    must survive the table-ref rewrite verbatim (literal masking)."""
    _src(spark, 5).createOrReplaceTempView("_cat_lit")
    cat.sql("CREATE SCHEMA s")
    cat.sql("CREATE TABLE s.t AS SELECT * FROM _cat_lit")
    out = cat.sql("SELECT 'comes FROM s.t here' AS note, COUNT(*) AS n FROM s.t")
    row = out.collect()[0]
    assert row["note"] == "comes FROM s.t here" and row["n"] == 5
    # escaped-quote form ('' inside a literal) also survives
    row2 = cat.sql("SELECT 'it''s FROM s.t' AS note FROM s.t LIMIT 1").collect()[0]
    assert row2["note"] == "it's FROM s.t"


def test_quoted_identifiers_resolve(cat, spark):
    _src(spark, 7).createOrReplaceTempView("_cat_q")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_q")
    assert cat.sql("SELECT COUNT(*) AS n FROM `db`.`t`").collect()[0]["n"] == 7


def test_time_travel_in_subquery_with_literals(cat, spark):
    """Masking must not break the quoted TIMESTAMP AS OF value, including
    inside a subquery alongside unrelated literals."""
    import time

    _src(spark, 10).createOrReplaceTempView("_cat_tt")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_tt")
    t1 = cat.load("db", "t").manifest.timestamp_ms
    time.sleep(0.01)
    cat.sql("INSERT INTO db.t SELECT k + 10 AS k, g FROM _cat_tt")
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(t1 / 1000, tz=timezone.utc).isoformat()
    out = cat.sql(
        f"SELECT 'x FROM db.t y' AS lit, COUNT(*) AS n "
        f"FROM (SELECT * FROM db.t FOR TIMESTAMP AS OF '{ts}') sub"
    ).collect()[0]
    assert out["n"] == 10 and out["lit"] == "x FROM db.t y"
    # version time travel inside a subquery still rewrites too
    v = cat.sql(
        "SELECT COUNT(*) AS n FROM (SELECT * FROM db.t VERSION AS OF 2) s"
    ).collect()[0]["n"]
    assert v == 20


def test_insert_values_positional(cat, spark):
    _src(spark, 3).createOrReplaceTempView("_cat_vals")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_vals")
    cat.sql("INSERT INTO db.t VALUES (100, 9), (101, 9)")
    got = cat.sql("SELECT k, g FROM db.t WHERE g = 9 ORDER BY k").collect()
    assert [(r["k"], r["g"]) for r in got] == [(100, 9), (101, 9)]
    with pytest.raises(CatalogError, match="arity"):
        cat.sql("INSERT INTO db.t VALUES (1, 2, 3)")


def test_sql_update_delete(cat, spark):
    _src(spark, 20).createOrReplaceTempView("_cat_dml")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_dml")
    cat.sql("DELETE FROM db.t WHERE g = 0")
    assert cat.sql("SELECT COUNT(*) AS n FROM db.t").collect()[0]["n"] == 16
    cat.sql("UPDATE db.t SET k = k + 100 WHERE g = 1")
    got = sorted(
        r["k"] for r in cat.sql("SELECT k FROM db.t WHERE g = 1").collect()
    )
    assert got == [101, 106, 111, 116]


def test_stats_feed_broadcast_join_planning(cat, spark):
    """A9: the format layer's native-parquet scan path reports file-size
    statistics to Catalyst, so a small catalog table is automatically chosen
    as the broadcast side — no hint needed (the reference feeds rowCount to
    Trino's CBO for the same decision, `LanceMetadata.java:561-588`)."""
    _src(spark, 5000).createOrReplaceTempView("_cat_big")
    _src(spark, 10).createOrReplaceTempView("_cat_small")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.big AS SELECT k, g FROM _cat_big")
    cat.sql("CREATE TABLE db.small AS SELECT k, g FROM _cat_small")
    q = cat.sql(
        "SELECT b.g, COUNT(*) AS n FROM db.big b JOIN db.small s ON b.k = s.k "
        "GROUP BY b.g"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert q.count() == 5


def test_sql_merge_into(cat, spark):
    _src(spark, 10).createOrReplaceTempView("_cat_m_t")
    spark.createDataFrame(
        [(0, 100), (1, -1), (2, 100), (50, 7)], ["k", "g"]
    ).createOrReplaceTempView("_cat_m_s")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_m_t")
    cat.sql(
        "MERGE INTO db.t AS t USING _cat_m_s AS s ON t.k = s.k "
        "WHEN MATCHED AND s.g < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET g = s.g "
        "WHEN NOT MATCHED THEN INSERT"
    )
    got = {r["k"]: r["g"] for r in cat.sql("SELECT k, g FROM db.t").collect()}
    assert 1 not in got            # deleted (s.g < 0)
    assert got[0] == 100 and got[2] == 100  # updated
    assert got[50] == 7            # inserted
    assert got[3] == 3 % 5         # untouched


def test_create_table_with_columns_then_insert(cat, spark):
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.e (a BIGINT, b STRING)")
    desc = {r["col_name"]: r["data_type"] for r in cat.sql("DESCRIBE db.e").collect()}
    assert desc == {"a": "bigint", "b": "string"}
    assert cat.sql("SELECT COUNT(*) AS n FROM db.e").collect()[0]["n"] == 0
    cat.sql("INSERT INTO db.e VALUES (1, 'x'), (2, 'y')")
    assert cat.sql("SELECT COUNT(*) AS n FROM db.e").collect()[0]["n"] == 2


def test_count_star_reads_zero_fragments(cat, spark):
    """The A8 proof: answer COUNT(*) with every data file deleted from disk —
    only the manifest can have produced the number."""
    _src(spark, 57).createOrReplaceTempView("_cat_cnt")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_cnt")
    data_dir = os.path.join(cat.table_path("db", "t"), "data")
    for f in os.listdir(data_dir):
        os.unlink(os.path.join(data_dir, f))
    assert cat.sql("SELECT COUNT(*) AS n FROM db.t").collect()[0]["n"] == 57
    # a filtered count is NOT eligible for the fast path (reference guard,
    # LanceMetadata.java:614-641) — it must scan, and now fails loudly
    with pytest.raises(Exception):
        cat.sql("SELECT COUNT(*) AS n FROM db.t WHERE k > 5").collect()


def test_sql_optimize_and_vacuum(cat, spark):
    cat.sql("CREATE SCHEMA db")
    _src(spark, 500).createOrReplaceTempView("_cat_opt")
    cat.sql("CREATE TABLE db.o AS SELECT * FROM _cat_opt")
    # fragment the table: many small appends
    for i in range(3):
        cat.sql("INSERT INTO db.o SELECT k + 1000 * (1 + " + str(i) + "), g FROM _cat_opt")
    cat.sql("DELETE FROM db.o WHERE k % 2 = 0")
    before_frags = len(cat.load("db", "o").manifest.fragments)
    cat.sql("OPTIMIZE db.o")
    ds = cat.load("db", "o")
    assert len(ds.manifest.fragments) < before_frags
    assert not any(f.deletion for f in ds.manifest.fragments)
    n = cat.sql("SELECT COUNT(*) AS n FROM db.o").collect()[0]["n"]
    assert n == 4 * 500 / 2
    n_versions = len(ds.versions())
    assert n_versions > 1
    cat.sql("VACUUM db.o RETAIN 1 VERSIONS")
    ds2 = cat.load("db", "o")
    assert len(ds2.versions()) == 1
    assert cat.sql("SELECT COUNT(*) AS n FROM db.o").collect()[0]["n"] == n


def test_optimize_sort_by_clusters_for_zone_maps(cat, spark):
    from lance_trino_spark.sources.lance_datasource import register_lance_datasource

    register_lance_datasource(spark)
    cat.sql("CREATE SCHEMA db")
    _src(spark, 2000).createOrReplaceTempView("_cat_zs")
    # unsorted-by-k source: hash-scramble the order, write small fragments
    spark.sql(
        "SELECT k, g FROM _cat_zs ORDER BY md5(CAST(k AS STRING))"
    ).createOrReplaceTempView("_cat_zs_scrambled")
    cat.sql("CREATE TABLE db.z AS SELECT * FROM _cat_zs_scrambled")
    ds0 = cat.load("db", "z")
    # scrambled: every fragment spans ~the full k range → no pruning possible
    cat.sql("OPTIMIZE db.z TARGET 500 ROWS SORT BY k")
    ds1 = cat.load("db", "z")
    ranges = sorted(
        (f.stats["k"]["min"], f.stats["k"]["max"]) for f in ds1.manifest.fragments
    )
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, sorted fragment ranges
    # pruned planned-partition count through the DataSource
    scan = (
        spark.read.format("lance")
        .load(cat.table_path("db", "z"))
        .filter("k >= 0 AND k < 400")
    )
    assert scan.rdd.getNumPartitions() < len(ds1.manifest.fragments)
    assert scan.count() == 400
    assert ds1.count_rows() == ds0.count_rows()


def test_describe_history(cat, spark):
    cat.sql("CREATE SCHEMA db")
    _src(spark, 100).createOrReplaceTempView("_cat_h")
    cat.sql("CREATE TABLE db.h AS SELECT * FROM _cat_h")
    cat.sql("INSERT INTO db.h SELECT k + 100, g FROM _cat_h")
    cat.sql("DELETE FROM db.h WHERE k < 10")
    hist = {r["version"]: r for r in cat.sql("DESCRIBE HISTORY db.h").collect()}
    assert [hist[v]["operation"] for v in sorted(hist)] == [
        "create", "append", "update",
    ]
    assert hist[2]["total_rows"] == 200 and hist[3]["total_rows"] == 190
    assert hist[3]["read_version"] == 2


def test_stats_broadcast_join_planning(cat, spark):
    cat.sql("CREATE SCHEMA db")
    _src(spark, 2000).createOrReplaceTempView("_cat_fact")
    _src(spark, 10).createOrReplaceTempView("_cat_dim")
    cat.sql("CREATE TABLE db.fact AS SELECT k, g FROM _cat_fact")
    cat.sql("CREATE TABLE db.dim AS SELECT g AS g2, g * 10 AS label FROM _cat_dim")
    q = (
        "SELECT f.g, COUNT(*) AS n FROM db.fact f "
        "JOIN db.dim d ON f.g = d.g2 GROUP BY f.g"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # Manifest estimate of dim (10 rows) is under the threshold; only
        # the A9 stats feed can introduce a broadcast here.
        cat.broadcast_threshold_bytes = 10_000
        plan = cat.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        cat.stats_broadcast = False
        plan_off = cat.sql(q)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_off
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_single_level_namespace_mode(spark, tmp_path):
    """Single-level mode: one virtual 'default' schema at the root; schema
    DDL is refused (`LanceConfig.java:73-105` single-level resolution)."""
    cat = LanceCatalog(spark, str(tmp_path / "single"), schema_mode="single")
    assert cat.list_namespaces() == ["default"]
    with pytest.raises(CatalogError):
        cat.sql("CREATE SCHEMA other")
    with pytest.raises(CatalogError):
        cat.drop_namespace("default")
    cat.create_namespace("default", if_not_exists=True)  # always exists
    _src(spark, 10).createOrReplaceTempView("_cat_sl")
    cat.sql("CREATE TABLE default.t AS SELECT * FROM _cat_sl")
    # table lives directly at the root
    assert os.path.isdir(os.path.join(cat.root, "t.lance"))
    assert cat.list_tables("default") == ["t"]
    assert cat.sql("SELECT COUNT(*) AS n FROM default.t").collect()[0]["n"] == 10


def test_parent_prefix_namespace_mode(spark, tmp_path):
    """Parent-prefix mode: multi-level namespaces flatten to $-joined schema
    names mapping to nested directories (`LanceRuntime.java:224-260`)."""
    cat = LanceCatalog(spark, str(tmp_path / "parent"), schema_mode="parent")
    cat.sql("CREATE SCHEMA a")
    cat.sql("CREATE SCHEMA a$b")
    cat.sql("CREATE SCHEMA a$b$c")
    assert cat.list_namespaces() == ["a", "a$b", "a$b$c"]
    assert os.path.isdir(os.path.join(cat.root, "a", "b", "c"))
    _src(spark, 6).createOrReplaceTempView("_cat_pp")
    cat.sql("CREATE TABLE a$b.t AS SELECT * FROM _cat_pp")
    assert cat.list_tables("a$b") == ["t"]
    assert cat.sql("SELECT COUNT(*) AS n FROM a$b.t").collect()[0]["n"] == 6
    # RESTRICT: a$b holds a table AND a child namespace; a$b$c is empty
    with pytest.raises(CatalogError):
        cat.sql("DROP SCHEMA a$b")
    cat.sql("DROP SCHEMA a$b$c")
    assert cat.list_namespaces() == ["a", "a$b"]


def test_sql_create_index_route(cat, spark):
    _src(spark, 1000).createOrReplaceTempView("_cat_idx")
    cat.sql("CREATE SCHEMA db")
    cat.sql("CREATE TABLE db.t AS SELECT * FROM _cat_idx")
    out = cat.sql("CREATE INDEX ON db.t (g)").collect()[0]["status"]
    assert "indexed db.t(g)" in out
    ds = cat.load("db", "t")
    assert ds.manifest.properties["scalar_indexes"] == ["g"]
    assert ds.manifest.operation == "create_index"
    # values unchanged through the indexed read path
    n = cat.sql("SELECT COUNT(*) AS n FROM db.t WHERE g = 2").collect()[0]["n"]
    assert n == 200


def test_estimated_size_bytes_tracks_rows(cat, spark):
    cat.sql("CREATE SCHEMA db")
    _src(spark, 500).createOrReplaceTempView("_cat_sz")
    cat.sql("CREATE TABLE db.s AS SELECT k, g FROM _cat_sz")
    ds = cat.load("db", "s")
    assert ds.estimated_size_bytes() == 500 * 16  # two long columns


def test_estimated_size_unbounded_columns_never_hint(cat, spark, tmp_path):
    """An array column of unknown length makes the size estimate unknown
    (-1): the stats feed must never broadcast-hint what it cannot bound.
    Declaring the column as a FixedSizeList vector restores a finite
    (element x dim) estimate; strings use the heavy var-len default."""
    from lance_trino_spark.format.dataset import LanceDataset

    df = spark.range(10).selectExpr(
        "id AS k", "array(cast(id AS float), cast(id AS float)) AS embedding"
    )
    plain = LanceDataset.create(str(tmp_path / "plain.lance"), df)
    assert plain.estimated_size_bytes() == -1
    vec = LanceDataset.create(
        str(tmp_path / "vec.lance"), df,
        properties={"vector_columns": "embedding:2"},
    )
    # long (8) + declared vector (4 x 2 + 8 overhead)
    assert vec.estimated_size_bytes() == 10 * (8 + 4 * 2 + 8)
    s = LanceDataset.create(
        str(tmp_path / "s.lance"), spark.range(4).selectExpr("CAST(id AS STRING) AS t")
    )
    assert s.estimated_size_bytes() == 4 * 64


def test_show_stats_zero_scan(spark, tmp_path):
    from lance_trino_spark.catalog import LanceCatalog

    cat = LanceCatalog(spark, str(tmp_path / "statcat"))
    cat.sql("CREATE SCHEMA st")
    spark.range(100).selectExpr(
        "id AS k", "CAST(id % 10 AS INT) AS b",
        "CASE WHEN id % 4 = 0 THEN NULL ELSE CONCAT('s', id) END AS s",
    ).createOrReplaceTempView("_stats_src")
    cat.sql("CREATE TABLE st.t AS SELECT * FROM _stats_src")
    rows = {r["column"]: r for r in cat.sql("SHOW STATS FOR st.t").collect()}
    assert rows["k"]["row_count"] == 100
    assert rows["k"]["min_value"] == "0" and rows["k"]["max_value"] == "99"
    assert rows["b"]["max_value"] == "9"
    assert rows["s"]["null_count"] == 25


def test_show_stats_all_null_column(spark, tmp_path):
    """Regression: an entirely-NULL column records {'nulls': n} with no
    min/max in the fragment stats; SHOW STATS must emit NULL bounds while
    still summing null counts — not KeyError. Also covers the post-ADD
    COLUMN shape (old fragments all-null on the new column)."""
    from lance_trino_spark.catalog import LanceCatalog

    cat = LanceCatalog(spark, str(tmp_path / "statnull"))
    cat.sql("CREATE SCHEMA sn")
    spark.range(50).selectExpr(
        "id AS k", "CAST(NULL AS STRING) AS dead"
    ).createOrReplaceTempView("_allnull_src")
    cat.sql("CREATE TABLE sn.t AS SELECT * FROM _allnull_src")
    rows = {r["column"]: r for r in cat.sql("SHOW STATS FOR sn.t").collect()}
    assert rows["dead"]["min_value"] is None
    assert rows["dead"]["max_value"] is None
    assert rows["dead"]["null_count"] == 50
    assert rows["k"]["min_value"] == "0" and rows["k"]["max_value"] == "49"


def test_metastore_namespace_lifecycle(spark, tmp_path):
    from lance_trino_spark.catalog import CatalogError, LanceCatalog

    spark.sql("DROP DATABASE IF EXISTS lance_ms_test CASCADE")
    cat = LanceCatalog(spark, str(tmp_path / "ms"), schema_mode="metastore")
    cat.sql("CREATE SCHEMA lance_ms_test")
    assert "lance_ms_test" in [
        r[0] for r in cat.sql("SHOW SCHEMAS").collect()
    ]
    spark.range(5).selectExpr("id AS k").createOrReplaceTempView("_ms_t_src")
    cat.sql("CREATE TABLE lance_ms_test.a AS SELECT * FROM _ms_t_src")
    cat.sql("CREATE TABLE lance_ms_test.b AS SELECT * FROM _ms_t_src")
    assert [r["table"] for r in
            cat.sql("SHOW TABLES IN lance_ms_test").collect()] == ["a", "b"]
    assert cat.sql(
        "SELECT COUNT(*) AS n FROM lance_ms_test.a"
    ).collect()[0]["n"] == 5
    # schema with live tables refuses to drop
    import pytest as _pt
    with _pt.raises((CatalogError, Exception)):
        cat.sql("DROP SCHEMA lance_ms_test")
    cat.sql("DROP TABLE lance_ms_test.a")
    cat.sql("DROP TABLE lance_ms_test.b")
    assert cat.sql("SHOW TABLES IN lance_ms_test").collect() == []
    cat.sql("DROP SCHEMA lance_ms_test")
    assert "lance_ms_test" not in [
        r[0] for r in cat.sql("SHOW SCHEMAS").collect()
    ]


def test_show_create_table(spark, tmp_path):
    from lance_trino_spark.catalog import LanceCatalog

    cat = LanceCatalog(spark, str(tmp_path / "sct"))
    cat.sql("CREATE SCHEMA sc")
    spark.range(20).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v",
        "array(CAST(id AS FLOAT), CAST(id+1 AS FLOAT)) AS emb",
    ).createOrReplaceTempView("_sct_src")
    cat.sql("CREATE TABLE sc.t AS SELECT * FROM _sct_src")
    cat.sql("CREATE INDEX ON sc.t (k)")
    ddl = cat.sql("SHOW CREATE TABLE sc.t").collect()[0][0]
    assert "CREATE TABLE sc.t" in ddl
    assert "k BIGINT" in ddl and "v DOUBLE" in ddl
    assert "emb ARRAY<FLOAT>" in ddl
    assert "scalar_indexes = 'k'" in ddl


def test_router_case_and_whitespace_invariance(spark, tmp_path):
    """Every routed statement must tolerate arbitrary case and interior
    whitespace — regex routers rot exactly here."""
    import re

    from lance_trino_spark.catalog import LanceCatalog

    cat = LanceCatalog(spark, str(tmp_path / "fuzzcat"))
    spark.range(10).selectExpr("id AS k", "id * 2 AS v").createOrReplaceTempView(
        "_fuzz_src"
    )
    statements = [
        "CREATE SCHEMA fz",
        "CREATE TABLE fz.t AS SELECT * FROM _fuzz_src",
        "INSERT INTO fz.t SELECT 100 AS k, 200 AS v",
        "UPDATE fz.t SET v = v + 1 WHERE k = 0",
        "DELETE FROM fz.t WHERE k = 1",
        "CREATE INDEX ON fz.t (k)",
        "CREATE TAG snap ON fz.t",
        "SHOW TAGS fz.t",
        "SHOW STATS FOR fz.t",
        "SHOW CREATE TABLE fz.t",
        "DESCRIBE HISTORY fz.t",
        "ALTER TABLE fz.t ADD COLUMN note STRING",
        "ALTER TABLE fz.t DROP COLUMN note",
        "OPTIMIZE fz.t",
        "VACUUM fz.t RETAIN 2 VERSIONS",
        "SELECT COUNT(*) AS n FROM fz.t",
    ]

    def mangle(stmt: str, mode: int) -> str:
        # identifiers are case-sensitive by design (only KEYWORDS are
        # case-insensitive) — all identifiers here are lowercase, so
        # full lower() exercises keyword folding without renaming them
        if mode == 0:
            return stmt.lower()
        if mode == 1:
            return re.sub(r"\s+", "   ", stmt)
        return stmt

    for i, stmt in enumerate(statements):
        out = cat.sql(mangle(stmt, i % 3))
        assert out is not None, stmt
    # identifiers keep their case even when keywords are mangled
    assert cat.sql("select count(*) as n from fz.t").collect()[0]["n"] >= 9


def test_explain_route(spark, tmp_path):
    from lance_trino_spark.catalog import LanceCatalog

    cat = LanceCatalog(spark, str(tmp_path / "explcat"))
    cat.sql("CREATE SCHEMA ex")
    spark.range(50).selectExpr("id AS k").createOrReplaceTempView("_expl_src")
    cat.sql("CREATE TABLE ex.t AS SELECT * FROM _expl_src")
    plan = cat.sql("EXPLAIN SELECT k FROM ex.t WHERE k > 10").collect()[0][0]
    assert "Physical Plan" in plan and "FileScan parquet" in plan
    # pushed filter visible in the plan — the EXPLAIN sees the same pinned
    # snapshot resolution as a real run
    assert "k#" in plan and "10" in plan
    fm = cat.sql(
        "EXPLAIN FORMATTED SELECT COUNT(*) AS n FROM ex.t"
    ).collect()[0][0]
    assert "Physical Plan" in fm


def test_sql_router_native_tables(spark, tmp_path):
    """The SQL router drives REAL `.lance` tables: SELECT (incl. tag
    time travel), O(1) COUNT(*), DELETE/UPDATE/INSERT as native MoR
    commits, OPTIMIZE SORT BY as the clustered native compaction, VACUUM
    via native cleanup with tag immortality."""
    from lance_trino_spark.catalog import LanceCatalog
    from lance_trino_spark.format.lance_native import (
        create_native_dataset, read_native_manifest)

    cat = LanceCatalog(spark, str(tmp_path / "cat"))
    cat.sql("CREATE SCHEMA s")
    loc = cat.namespace.declare_table("s", "t")
    create_native_dataset(
        spark.createDataFrame(
            [(i, f"p{i % 3}", i * 10) for i in range(100)],
            "k long, p string, v long"), loc)

    assert cat.sql("SELECT count(*) FROM s.t").collect()[0][0] == 100
    cat.sql("CREATE TAG base ON s.t")
    cat.sql("DELETE FROM s.t WHERE k % 10 = 0")
    cat.sql("UPDATE s.t SET v = v + 1 WHERE k = 1")
    cat.sql("INSERT INTO s.t SELECT 1000 AS k, 'p9' AS p, 5 AS v")
    assert cat.sql("SELECT count(*) FROM s.t").collect()[0][0] == 91
    assert cat.sql(
        "SELECT v FROM s.t WHERE k = 1").collect()[0][0] == 11
    # the tag still reads the pre-DML snapshot...
    assert cat.sql(
        "SELECT count(*) FROM s.t VERSION AS OF 'base'"
    ).collect()[0][0] == 100
    cat.sql("OPTIMIZE s.t SORT BY k")
    cat.sql("VACUUM s.t RETAIN 1 VERSIONS")
    # ...even through OPTIMIZE and a keep-1 VACUUM (vacuum-immortal)
    assert cat.sql(
        "SELECT count(*) FROM s.t VERSION AS OF 'base'"
    ).collect()[0][0] == 100
    assert cat.sql("SELECT count(*) FROM s.t").collect()[0][0] == 91
    assert {r.tag: r.version
            for r in cat.sql("SHOW TAGS s.t").collect()} == {"base": 1}
    # the commits were native MoR versions, not own-format manifests
    assert read_native_manifest(loc).version >= 5

    # CREATE NATIVE TABLE AS SELECT / DESCRIBE / DESCRIBE HISTORY
    spark.createDataFrame([(1, "a")], "k long, s string") \
        .createOrReplaceTempView("cat22_src")
    cat.sql("CREATE NATIVE TABLE s.nt AS SELECT * FROM cat22_src")
    assert cat.sql("SELECT count(*) FROM s.nt").collect()[0][0] == 1
    assert [(r.col_name, r.data_type)
            for r in cat.sql("DESCRIBE s.nt").collect()] == [
        ("k", "bigint"), ("s", "string")]
    hist = cat.sql("DESCRIBE HISTORY s.nt").collect()
    assert [r.version for r in hist] == [1]
    assert hist[0].operation == "native-commit"
    with pytest.raises(Exception, match="already exists"):
        cat.sql("CREATE NATIVE TABLE s.nt AS SELECT * FROM cat22_src")
    cat.sql("CREATE OR REPLACE NATIVE TABLE s.nt AS "
            "SELECT k FROM cat22_src")
    assert cat.sql("DESCRIBE s.nt").collect()[0].col_name == "k"

    # native MERGE routes the wholesale-upsert SQL shape only
    spark.createDataFrame([(5, "p9", 555), (1000, "pX", 1)],
                          "k long, p string, v long") \
        .createOrReplaceTempView("cat22_delta")
    cat.sql("MERGE INTO s.t t USING cat22_delta s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET p = s.p, v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k, p, v) "
            "VALUES (s.k, s.p, s.v)")
    got = {r.k: (r.p, r.v) for r in cat.sql(
        "SELECT k, p, v FROM s.t WHERE k IN (5, 1000)").collect()}
    assert got[5] == ("p9", 555) and got[1000] == ("pX", 1)
    # partial-SET merge is no longer a refusal: it routes through the
    # conditional native MERGE (r10) — v updates, p is PRESERVED
    spark.createDataFrame([(5, "zz", 777)], "k long, p string, v long") \
        .createOrReplaceTempView("cat22_delta2")
    cat.sql("MERGE INTO s.t t USING cat22_delta2 s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT (k, p, v) "
            "VALUES (s.k, s.p, s.v)")
    got2 = {r.k: (r.p, r.v) for r in cat.sql(
        "SELECT k, p, v FROM s.t WHERE k IN (5, 1000)").collect()}
    assert got2[5] == ("p9", 777)  # v updated, p kept (NOT wholesale)
    assert got2[1000] == ("pX", 1)  # untouched


def test_create_table_format_cross_guards(cat, spark):
    """CREATE [NATIVE] TABLE must see a table of the OTHER storage format
    as 'already exists' — a binary manifest written next to .manifest.json
    files (or vice versa) is invisible to the format sniffers and every
    later read silently serves the OLD data (ADVICE r9)."""
    cat.sql("CREATE SCHEMA s")
    spark.createDataFrame([(1, "a")], "k long, s string") \
        .createOrReplaceTempView("xsrc")

    # NATIVE CTAS over an existing OWN-FORMAT table
    cat.sql("CREATE TABLE s.own AS SELECT * FROM xsrc")
    with pytest.raises(CatalogError, match="already exists"):
        cat.sql("CREATE NATIVE TABLE s.own AS SELECT * FROM xsrc")
    cat.sql("CREATE OR REPLACE NATIVE TABLE s.own AS SELECT k FROM xsrc")
    assert cat._native("s", "own") is not None  # really replaced
    assert [r.col_name for r in cat.sql("DESCRIBE s.own").collect()] == ["k"]

    # plain CTAS over an existing NATIVE table (mirror guard)
    cat.sql("CREATE NATIVE TABLE s.nat AS SELECT * FROM xsrc")
    with pytest.raises(CatalogError, match="already exists"):
        cat.sql("CREATE TABLE s.nat AS SELECT * FROM xsrc")
    cat.sql("CREATE OR REPLACE TABLE s.nat AS SELECT s FROM xsrc")
    assert cat._native("s", "nat") is None  # native layout fully replaced
    assert [r.col_name for r in cat.sql("DESCRIBE s.nat").collect()] == ["s"]


def test_native_drop_vector_index_targets_vector_sidecars(cat, spark):
    """DROP VECTOR INDEX on a native table with BOTH index kinds on one
    column must reap only the vector sidecars (ADVICE r9: it used to
    rmtree the scalar set — a destructive wrong-target delete)."""
    from lance_trino_spark.format.lance_native import (
        list_native_scalar_indices, list_native_vector_indices,
        write_native_dataset, write_native_scalar_index,
        write_native_vector_index)

    cat.sql("CREATE SCHEMA vs")
    loc = cat.namespace.declare_table("vs", "t")
    n, dim = 256, 8
    write_native_dataset(loc, {
        "id": list(range(n)),
        "emb": [[float(i % 7), *([0.0] * (dim - 1))] for i in range(n)],
    })
    write_native_scalar_index(loc, "id")
    write_native_vector_index(loc, "emb", n_cells=4)
    assert [i.column for i in list_native_scalar_indices(loc)] == ["id"]
    assert [i.column for i in list_native_vector_indices(loc)] == ["emb"]

    # vector drop on a column with no vector index: loud, nothing deleted
    with pytest.raises(CatalogError, match="no native vector index"):
        cat.sql("DROP VECTOR INDEX ON vs.t (id)")
    assert len(list_native_scalar_indices(loc)) == 1

    cat.sql("DROP VECTOR INDEX ON vs.t (emb)")
    assert list_native_vector_indices(loc) == []
    assert len(list_native_scalar_indices(loc)) == 1  # scalar untouched
    cat.sql("DROP INDEX ON vs.t (id)")
    assert list_native_scalar_indices(loc) == []


def test_show_stats_ndv_from_sidecars(cat, spark):
    """NDV estimates come from the sidecars' HLL registers — lossless
    elementwise-max union across files, zero data scanned; a sidecar
    predating the register layout makes NDV unknown rather than wrong."""
    import json

    from lance_trino_spark.format.lance_native import (
        FRAGSTATS_DIR, append_native_rows, hll_ndv_from_hex,
        write_native_dataset)

    cat.sql("CREATE SCHEMA nd")
    loc = cat.namespace.declare_table("nd", "t")
    write_native_dataset(loc, {
        "k": list(range(1000)),
        "tag": [f"t{i % 7}" for i in range(1000)],
    })
    # second file overlaps half the key range: union must count the
    # overlap once (distinct = 1500, not 2000)
    append_native_rows(loc, {
        "k": list(range(500, 1500)),
        "tag": [f"t{i % 7}" for i in range(1000)],
    })
    got = {r["column"]: r for r in cat.sql("SHOW STATS nd.t").collect()}
    assert got["k"]["row_count"] == 2000
    assert abs(got["k"]["ndv"] - 1500) <= max(2, 1500 // 10)
    assert got["tag"]["ndv"] == 7  # low cardinality: linear counting
    # registers merged losslessly: union estimate == one-pass estimate
    sdir = os.path.join(loc, FRAGSTATS_DIR)
    hexes = []
    for f in sorted(os.listdir(sdir)):
        ent = json.load(open(os.path.join(sdir, f)))["fields"]["0"]
        hexes.append(ent["hll"])
    from lance_trino_spark.format.lance_native import _hll_hex

    assert hll_ndv_from_hex(hexes) == hll_ndv_from_hex(
        [_hll_hex("int64", list(range(1500)))])

    # strip the registers from one sidecar (pre-layout file): NDV for
    # that column must report unknown, min/max stay served
    f0 = sorted(os.listdir(sdir))[0]
    p = os.path.join(sdir, f0)
    d = json.load(open(p))
    d["fields"]["0"].pop("hll")
    json.dump(d, open(p, "w"))
    got2 = {r["column"]: r for r in cat.sql("SHOW STATS nd.t").collect()}
    assert got2["k"]["ndv"] is None
    assert got2["k"]["min_value"] == "0"
    assert got2["tag"]["ndv"] == 7  # other column unaffected


def test_show_stats_ndv_own_format(cat, spark):
    """Own-format zone maps carry HLL registers for EVERY stats-typed
    column — numerics, bools and (r11) strings, the join-key-shaped
    columns CBO wants most: SHOW STATS answers NDV from the manifest
    alone and unions losslessly across fragments."""
    cat.sql("CREATE SCHEMA nv")
    spark.range(2000).selectExpr(
        "id % 400 AS k", "id % 2 = 0 AS flag",
        "CAST(id % 25 AS DOUBLE) / 4.0 AS x",
        "concat('t', id % 9) AS tag",
    ).createOrReplaceTempView("_nv_src")
    cat.sql("CREATE TABLE nv.t AS SELECT * FROM _nv_src")
    # overlapping second fragment: union counts the overlap once
    cat.sql("INSERT INTO nv.t SELECT * FROM _nv_src")
    got = {r["column"]: r for r in cat.sql("SHOW STATS nv.t").collect()}
    assert got["k"]["row_count"] == 4000
    assert abs(got["k"]["ndv"] - 400) <= 40   # ~6.5% stderr at p=8
    assert got["flag"]["ndv"] == 2
    assert abs(got["x"]["ndv"] - 25) <= 3
    assert got["tag"]["ndv"] == 9             # strings: registers (r11)
    assert got["tag"]["min_value"] == "t0"    # bounds still served


def test_sql_vector_search_native_prefilter(cat, spark):
    """`VECTOR SEARCH ... WHERE col IN (...)` on a NATIVE table is
    TRUE-prefilter through the live-snapshot search — only matching rows
    compete, including appended-after-build ones."""
    import numpy as np

    from lance_trino_spark.format.lance_native import (
        append_native_rows, ensure_native_vector_index,
        write_native_dataset)

    cat.sql("CREATE SCHEMA pf")
    loc = cat.namespace.declare_table("pf", "t")
    rng = np.random.default_rng(41)
    n, dim = 200, 8
    vecs = rng.normal(size=(n + 10, dim)).astype(np.float32)
    write_native_dataset(loc, {
        "vid": list(range(n)),
        "lab": [f"g{i % 2}" for i in range(n)],
        "emb": [[float(x) for x in r] for r in vecs[:n]],
    })
    ensure_native_vector_index(loc, "emb", n_cells=4, nsub=4)
    append_native_rows(loc, {  # post-build, labelled g1
        "vid": list(range(n, n + 10)),
        "lab": ["g1"] * 10,
        "emb": [[float(x) for x in r] for r in vecs[n:]]})
    spark.createDataFrame(
        [(0, [float(x) for x in vecs[n + 3]])],  # an appended g1 row
        "query_id long, emb array<float>").createOrReplaceTempView("_pfq")
    cat.sql("CREATE TABLE pf.q AS SELECT * FROM _pfq")
    hits = cat.sql(
        "VECTOR SEARCH pf.t (emb) USING pf.q TOP 3 NPROBE 4 "
        "WHERE lab IN ('g1')").collect()
    assert [r["vid"] for r in hits][0] == n + 3  # fresh self-match
    assert all(r["lab"] == "g1" for r in hits)


def test_sql_native_hnsw_index_route(spark, tmp_path):
    """r14: CREATE VECTOR INDEX ... USING HNSW on a NATIVE table builds
    the flat-HNSW sidecar via the ensure hook (no-op when covered), and
    VECTOR SEARCH routes to the newest family on the column — an HNSW
    index serves cosine (not l2_distance), exact at ef-bounded top-1
    self-match."""
    import shutil

    import numpy as np

    from lance_trino_spark.catalog import LanceCatalog

    shutil.rmtree(str(tmp_path / "wh"), ignore_errors=True)
    cat = LanceCatalog(spark, root=str(tmp_path / "wh"))
    cat.sql("CREATE SCHEMA s")
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(200, 8)).astype(np.float32)
    spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    ).createOrReplaceTempView("_hnsw_src")
    cat.sql("CREATE NATIVE TABLE s.t AS SELECT * FROM _hnsw_src")
    st = cat.sql(
        "CREATE VECTOR INDEX ON s.t (embedding) USING HNSW").collect()
    assert "HNSW" in st[0]["status"]
    st2 = cat.sql(
        "CREATE VECTOR INDEX ON s.t (embedding) USING HNSW").collect()
    assert "already covered" in st2[0]["status"]
    spark.createDataFrame(
        [(7, [float(x) for x in vecs[7]])],
        "query_id long, embedding array<float>",
    ).createOrReplaceTempView("_hnsw_q")
    cat.sql("CREATE NATIVE TABLE s.q AS SELECT * FROM _hnsw_q")
    r = cat.sql("VECTOR SEARCH s.t (embedding) USING s.q TOP 3").collect()
    assert r[0]["vec_id"] == 7 and r[0]["cosine"] >= 0.999
    assert "cosine" in r[0].asDict()
    # DROP VECTOR INDEX reaps the HNSW sidecar too (both families)
    st3 = cat.sql("DROP VECTOR INDEX ON s.t (embedding)").collect()
    assert "dropped 1" in st3[0]["status"]
    from lance_trino_spark.catalog import CatalogError
    import pytest as _pytest

    with _pytest.raises(CatalogError, match="no native vector index"):
        cat.sql("DROP VECTOR INDEX ON s.t (embedding)")
