"""Vector column table property: FixedSizeList dimension enforcement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_trino_spark.format.dataset import LanceDataset
from lance_trino_spark.format.vector import parse_vector_columns


@pytest.fixture(scope="module")
def scratch_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("vector"))


def _vec_df(spark, dim=4, n=50):
    return spark.range(0, n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.col("id") + i).cast("float"),
        ).alias("embedding"),
    )


def test_parse_spec():
    assert parse_vector_columns("embedding:64") == {"embedding": 64}
    assert parse_vector_columns("a:8, b:16") == {"a": 8, "b": 16}
    with pytest.raises(ValueError):
        parse_vector_columns("embedding:-1")
    with pytest.raises(ValueError):
        parse_vector_columns("embedding")


def test_vector_roundtrip(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_ok.lance")
    ds = LanceDataset.create(
        path, _vec_df(spark), properties={"vector_columns": "embedding:4"}
    )
    assert ds.manifest.properties["vector_columns"] == "embedding:4"
    rows = ds.to_df(spark).collect()
    assert len(rows) == 50
    assert all(len(r["embedding"]) == 4 for r in rows)


def test_vector_wrong_dim_fails_write(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_bad.lance")
    with pytest.raises(Exception, match="dimension 8"):
        LanceDataset.create(
            path, _vec_df(spark, dim=4),
            properties={"vector_columns": "embedding:8"},
        )


def test_vector_wrong_type_rejected(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_type.lance")
    df = spark.range(0, 5).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1), F.lit(2)).alias("embedding"),  # array<int>
    )
    with pytest.raises(ValueError, match="array<float>"):
        LanceDataset.create(
            path, df, properties={"vector_columns": "embedding:2"}
        )


def test_vector_append_enforced(spark, scratch_dir):
    path = os.path.join(scratch_dir, "vec_append.lance")
    ds = LanceDataset.create(
        path, _vec_df(spark), properties={"vector_columns": "embedding:4"}
    )
    ds = ds.append(_vec_df(spark, n=10))
    assert ds.count_rows() == 60
    with pytest.raises(Exception, match="dimension 4"):
        ds.append(_vec_df(spark, dim=3, n=5))
