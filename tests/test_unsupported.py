"""Supports-matrix / negative-surface suite: unsupported or invalid
operations must fail loudly with clear errors, mirroring the reference's
behavior matrix (`BaseLanceConnectorTest.java:88-118` asserts unsupported
features fail correctly rather than silently corrupt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lance_trino_spark.catalog import CatalogError, LanceCatalog
from lance_trino_spark.format.dataset import LanceDataset
from lance_trino_spark.format.manifest import (
    CommitConflictError,
    VersionNotFoundError,
)
from lance_trino_spark.format.vector import (
    parse_vector_columns,
    validate_vector_schema,
)
from lance_trino_spark.operators import dml


@pytest.fixture
def ds(spark, tmp_path):
    df = spark.range(20).select(F.col("id").alias("x"), (F.col("id") % 3).alias("y"))
    return LanceDataset.create(str(tmp_path / "t.lance"), df)


def test_create_over_existing_fails(ds, spark):
    with pytest.raises(FileExistsError):
        LanceDataset.create(ds.path, ds.to_df(spark))


def test_unknown_version_fails(ds):
    with pytest.raises(VersionNotFoundError):
        LanceDataset.open(ds.path, version=99)
    with pytest.raises(ValueError):
        LanceDataset.open(ds.path, version=0)  # versions are 1-based, >0
    with pytest.raises(ValueError):
        # at most one of version / timestamp (reference rejects combined
        # specs, LanceMetadata.java:249-370)
        LanceDataset.open(ds.path, version=1, asof_timestamp_ms=1)


def test_timestamp_before_first_commit_fails(ds):
    with pytest.raises(VersionNotFoundError):
        LanceDataset.open(ds.path, asof_timestamp_ms=0)


def test_stale_update_commit_conflicts(ds, spark):
    stale = LanceDataset.open(ds.path)
    dml.delete(ds, spark, "x = 1")  # advances the table
    with pytest.raises(CommitConflictError):
        stale.commit_update({0: [0]})
    with pytest.raises(CommitConflictError):
        stale.commit_overwrite([])


def test_schema_evolution_rejected(ds, spark):
    """Reference behavior: add/drop/retype columns unsupported
    (`TestLanceConnectorTest.java:139-146`) — mismatched appends fail loudly
    instead of committing mixed-schema fragments."""
    extra = ds.to_df(spark).withColumn("z", F.lit(1))
    with pytest.raises(ValueError, match="schema evolution"):
        ds.append(extra)
    retyped = ds.to_df(spark).select(
        F.col("x").cast("int").alias("x"), "y"
    )
    with pytest.raises(ValueError, match="schema evolution"):
        ds.append(retyped)
    # nullability differences alone are fine
    ds.append(ds.to_df(spark).limit(1))


def test_datasource_append_schema_evolution_rejected(ds, spark):
    from lance_trino_spark.sources.lance_datasource import register_lance_datasource

    register_lance_datasource(spark)
    bad = ds.to_df(spark).withColumn("z", F.lit(1))
    with pytest.raises(Exception, match="schema evolution"):
        bad.write.format("lance").mode("append").save(ds.path)


def test_update_unknown_column_fails(ds, spark):
    with pytest.raises(ValueError, match="unknown column"):
        dml.update(ds, spark, {"zz": "1"})


def test_merge_requires_insert_columns(ds, spark):
    src = spark.createDataFrame([(1,)], ["x"])  # missing column y
    with pytest.raises(dml.MergeError, match="source columns"):
        dml.merge(ds, spark, src, on="x", insert_not_matched=True)


def test_blob_dataset_rejects_rewrite_ops(spark, tmp_path):
    df = spark.range(5).select(
        F.col("id").alias("k"), F.encode(F.lit("abc"), "UTF-8").alias("payload")
    )
    ds = LanceDataset.create(
        str(tmp_path / "b.lance"), df, blob_columns=["payload"]
    )
    with pytest.raises(dml.MergeError, match="write-once"):
        dml.update(ds, spark, {"k": "k + 1"})
    with pytest.raises(dml.MergeError, match="write-once"):
        dml.merge(ds, spark, ds.to_df(spark), on="k")


def test_vector_spec_validation():
    with pytest.raises(ValueError):
        parse_vector_columns("emb")  # no dimension
    with pytest.raises(ValueError):
        parse_vector_columns("")
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("emb", ArrayType(FloatType())),
            StructField("s", StringType()),
        ]
    )
    validate_vector_schema(schema, {"emb": 4})  # ok
    with pytest.raises(ValueError, match="not in schema"):
        validate_vector_schema(schema, {"zz": 4})
    with pytest.raises(ValueError):
        validate_vector_schema(schema, {"s": 4})  # not an array type


def test_vector_dimension_enforced_at_write(spark, tmp_path):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([([1.0, 2.0],), ([1.0],)], ["emb"])
    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        LanceDataset.create(
            str(tmp_path / "v.lance"),
            df,
            properties={"vector_columns": "emb:2"},
        )


def test_catalog_invalid_identifiers(spark, tmp_path):
    cat = LanceCatalog(spark, str(tmp_path / "cat"))
    with pytest.raises(CatalogError, match="invalid"):
        cat.create_namespace("bad-name!")
    with pytest.raises(CatalogError):
        cat.sql("SHOW TABLES IN missing_schema")
    cat.sql("CREATE SCHEMA db")
    with pytest.raises(CatalogError, match="does not exist"):
        cat.sql("SELECT COUNT(*) AS n FROM db.missing")
    with pytest.raises(CatalogError, match="already exists"):
        cat.sql("CREATE SCHEMA db")


def test_asof_join_rejects_payload_collision(spark):
    import pytest as _pytest

    from lance_trino_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, 1.0)], ["k", "ts", "val"])
    right = spark.createDataFrame([(1, 3, 2.0)], ["k", "ts", "val"])
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", "ts", ["val"])


def test_range_join_rejects_bad_bucket_width(spark):
    import pytest as _pytest

    from lance_trino_spark.operators.asof import range_join

    left = spark.createDataFrame([(1, 1)], ["k", "t"])
    right = spark.createDataFrame([(1, 0, 2)], ["k", "s", "e"])
    with _pytest.raises(ValueError, match="positive"):
        range_join(left, right, ["k"], "t", "s", "e", 0)


def test_kmv_rejects_tiny_k(spark):
    import pytest as _pytest

    from lance_trino_spark.operators.sketches import kmv_distinct

    df = spark.createDataFrame([("a", "x")], ["g", "v"])
    with _pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "g", "v", k=1)


def test_funnel_rejects_empty_steps(spark):
    import pytest as _pytest

    from lance_trino_spark.operators.funnel import funnel_milestones

    df = spark.createDataFrame([(1, "a", 1)], ["user_id", "event_type", "ts_us"])
    with _pytest.raises(ValueError, match="non-empty"):
        funnel_milestones(df, [])
