"""Query registry: the judge-facing correctness surface.

Every implemented operator (SURVEY.md §2) registers a `Query` here:
  - ``build(spark, sf_dir) -> DataFrame``: the Spark-first implementation.
  - ``oracle``: equivalent ANSI SQL runnable by DuckDB over the same parquet
    tables (views: region nation customer supplier part orders lineitem
    events documents embeddings), or None for non-SQL-expressible ops
    (driver then records a weaker rows-only check).

Determinism contract (the driver hash-compares values order-insensitively):
  - Sums/avgs over doubles go through DECIMAL(38,s) with s >= the true
    decimal precision of the data, then cast back to DOUBLE — the sum is
    exact, so Spark and DuckDB produce bit-identical doubles regardless of
    partition/iteration order.
  - Every LIMIT follows an ORDER BY that includes a unique tie-break key.
  - Timestamps leave the query as DATE/BIGINT-epoch/strings when engine
    representations could diverge.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate REGISTRY.
    from . import relational  # noqa: F401
    from . import events as _events  # noqa: F401
    from . import text as _text  # noqa: F401
    from . import dedup as _dedup  # noqa: F401
    from . import similarity as _similarity  # noqa: F401
    from . import multimodal as _multimodal  # noqa: F401
    from . import lance_format as _lance_format  # noqa: F401
    from . import datasource as _datasource  # noqa: F401
    from . import streaming as _streaming  # noqa: F401
    from . import catalog as _catalog  # noqa: F401

    return dict(REGISTRY)
