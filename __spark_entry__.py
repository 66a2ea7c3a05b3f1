"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``lance_trino_spark/`` — ``suite/`` holds the
registry of (Spark builder, DuckDB oracle SQL) pairs, one per implemented
operator from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q3 shape: broadcast dim join + exact-decimal aggregation + top-k —
    exercises scan, filter pushdown, join strategy, and aggregation at once.
    """
    from lance_trino_spark.session import apply_runtime_confs
    from lance_trino_spark.suite import all_queries

    apply_runtime_confs(spark)
    return all_queries()["q03_shipping_priority"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lance_trino_spark.suite import all_queries

    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/aliases).

    Queries without an oracle (non-SQL-expressible ops) are omitted — the
    driver records a weaker rows-only check for those.
    """
    from lance_trino_spark.suite import all_queries

    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
