"""Blob columns (A15): out-of-line storage, virtual columns, fetch path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lance_trino_spark.format.blob import BLOBS_DIR
from lance_trino_spark.format.dataset import LanceDataset
from lance_trino_spark.operators.dml import MergeError, delete, update
from lance_trino_spark.operators.multimodal import attach_payloads, synth_payload


@pytest.fixture(scope="module")
def scratch_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("blob"))


@pytest.fixture(scope="module")
def blob_ds(spark, scratch_dir):
    path = os.path.join(scratch_dir, "blob_ds.lance")
    docs = attach_payloads(spark.range(0, 100).withColumnRenamed("id", "doc_id"))
    ds = LanceDataset.create(
        path, docs, max_rows_per_file=30, blob_columns=["payload"]
    )
    return ds


def test_blob_scan_returns_empty_bytes(spark, blob_ds):
    rows = blob_ds.to_df(spark).collect()
    assert len(rows) == 100
    assert all(bytes(r["payload"]) == b"" for r in rows)
    # virtual columns hidden from the default projection
    assert set(blob_ds.to_df(spark).columns) == {"doc_id", "payload"}


def test_blob_virtual_columns(spark, blob_ds):
    rows = blob_ds.to_df(
        spark, columns=["doc_id", "payload__blob_pos", "payload__blob_size"]
    ).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["payload__blob_size"] == len(synth_payload(int(r["doc_id"])))
        assert r["payload__blob_pos"] >= 0


def test_blob_sidecar_files_exist(blob_ds):
    blob_dir = os.path.join(blob_ds.path, BLOBS_DIR)
    files = [f for f in os.listdir(blob_dir) if f.endswith(".bin")]
    assert files
    total = sum(os.path.getsize(os.path.join(blob_dir, f)) for f in files)
    assert total == sum(len(synth_payload(i)) for i in range(100))


def test_blob_fetch_roundtrip(spark, blob_ds):
    fetched = blob_ds.blobs_df(spark, "payload").collect()
    assert len(fetched) == 100
    for r in fetched:
        assert bytes(r["payload"]) == synth_payload(int(r["doc_id"]))


def test_blob_fetch_with_filter(spark, blob_ds):
    fetched = blob_ds.blobs_df(spark, "payload", filter="doc_id < 10").collect()
    assert len(fetched) == 10


def test_blob_append_and_delete(spark, scratch_dir):
    path = os.path.join(scratch_dir, "blob_dml.lance")
    docs = attach_payloads(spark.range(0, 40).withColumnRenamed("id", "doc_id"))
    ds = LanceDataset.create(path, docs, blob_columns=["payload"])
    more = attach_payloads(
        spark.range(40, 60).withColumnRenamed("id", "doc_id")
    )
    ds = ds.append(more)
    assert ds.count_rows() == 60
    ds = delete(ds, spark, "doc_id % 2 = 0")
    assert ds.count_rows() == 30
    fetched = ds.blobs_df(spark, "payload").collect()
    assert len(fetched) == 30
    assert all(int(r["doc_id"]) % 2 == 1 for r in fetched)
    assert all(
        bytes(r["payload"]) == synth_payload(int(r["doc_id"])) for r in fetched
    )


def test_blob_update_rejected(spark, blob_ds):
    with pytest.raises(MergeError, match="blob"):
        update(blob_ds, spark, {"doc_id": "doc_id + 1"})


def test_blob_requires_binary_column(spark, scratch_dir):
    path = os.path.join(scratch_dir, "blob_bad.lance")
    df = spark.range(0, 5).withColumn("x", F.lit(1))
    with pytest.raises(ValueError, match="BINARY"):
        LanceDataset.create(path, df, blob_columns=["x"])
