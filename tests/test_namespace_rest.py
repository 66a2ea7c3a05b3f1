"""Namespace backends (SURVEY §1.1 "Namespace", `LanceRuntime.java:224-260`;
VERDICT r3 "What's missing" #3): the REST namespace client/server pair and
the LanceCatalog-over-REST integration, mirroring the reference's embedded
RestAdapter test harness (`LanceQueryRunner.java:135-165`)."""

from __future__ import annotations

import os

import pytest

from lance_trino_spark.catalog import CatalogError, LanceCatalog
from lance_trino_spark.format.namespace import (
    DirectoryNamespace,
    NamespaceError,
    RestNamespace,
    RestNamespaceServer,
)


def test_rest_namespace_crud(tmp_path):
    with RestNamespaceServer(str(tmp_path)) as server:
        ns = RestNamespace(server.url)
        assert ns.list_namespaces() == []
        ns.create_namespace("sales")
        ns.create_namespace("crm")
        assert ns.list_namespaces() == ["crm", "sales"]
        with pytest.raises(NamespaceError, match="already exists"):
            ns.create_namespace("sales")
        ns.create_namespace("sales", if_not_exists=True)

        loc = ns.declare_table("sales", "orders")
        assert loc == str(tmp_path / "sales" / "orders.lance")
        os.makedirs(loc)  # simulate a committed dataset at the location
        assert ns.list_tables("sales") == ["orders"]
        assert ns.table_location("sales", "orders") == loc

        with pytest.raises(NamespaceError, match="not empty"):
            ns.drop_namespace("sales")  # RESTRICT, like the reference
        ns.drop_table("sales", "orders")
        assert ns.list_tables("sales") == []
        ns.drop_namespace("sales")
        assert ns.list_namespaces() == ["crm"]

        with pytest.raises(NamespaceError, match="does not exist"):
            ns.list_tables("nope")
        with pytest.raises(NamespaceError, match="invalid"):
            ns.declare_table("crm", "bad-name!")


def test_rest_namespace_unreachable():
    ns = RestNamespace("http://127.0.0.1:1", timeout_s=0.5)
    with pytest.raises(NamespaceError, match="unreachable"):
        ns.list_namespaces()


def test_catalog_over_rest_namespace(spark, tmp_path):
    """The full SQL router (DDL/CTAS/time-travel/DML) with every
    schema/table resolution served over HTTP — the catalog behaves
    identically to the directory backend."""
    with RestNamespaceServer(str(tmp_path)) as server:
        cat = LanceCatalog(spark, namespace=RestNamespace(server.url))
        cat.sql("CREATE SCHEMA sales")
        assert cat.list_namespaces() == ["sales"]

        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k int, s string, v double",
        ).createOrReplaceTempView("_rest_src")
        cat.sql("CREATE TABLE sales.t AS SELECT * FROM _rest_src")
        assert cat.list_tables("sales") == ["t"]
        # data landed at the REST-resolved location
        assert os.path.isdir(tmp_path / "sales" / "t.lance")

        cat.sql("INSERT INTO sales.t SELECT k + 10, s, v FROM _rest_src")
        assert cat.sql("SELECT COUNT(*) AS n FROM sales.t").collect()[0].n == 6
        v1 = cat.sql(
            "SELECT COUNT(*) AS n FROM sales.t VERSION AS OF 1"
        ).collect()[0].n
        assert v1 == 3

        cat.sql("DELETE FROM sales.t WHERE k > 11")
        assert cat.sql("SELECT COUNT(*) AS n FROM sales.t").collect()[0].n == 4

        with pytest.raises(CatalogError, match="not empty"):
            cat.drop_namespace("sales")
        cat.sql("DROP TABLE sales.t")
        cat.sql("DROP SCHEMA sales")
        assert cat.list_namespaces() == []


def test_directory_namespace_parity(tmp_path):
    """REST over a directory backend must resolve exactly like the direct
    directory backend (same warehouse → same locations/listings)."""
    direct = DirectoryNamespace(str(tmp_path))
    with RestNamespaceServer(str(tmp_path)) as server:
        rest = RestNamespace(server.url)
        direct.create_namespace("a")
        assert rest.list_namespaces() == direct.list_namespaces() == ["a"]
        assert rest.declare_table("a", "t") == direct.declare_table("a", "t")
