"""Storage-backend seam tests: the metadata plane routes through the
installed StorageBackend, so a non-filesystem backend (here: in-memory)
drives version listing, manifest reads, time travel, and conflict detection
without touching `_versions/` on disk — the drop-in point for a real
`lance`-SDK adapter."""

from __future__ import annotations

import os

import pytest

from lance_trino_spark.format import backend as be
from lance_trino_spark.format.dataset import LanceDataset
from lance_trino_spark.format.manifest import (
    CommitConflictError,
    Manifest,
    commit_manifest,
    list_versions,
    read_manifest,
)


class InMemoryBackend:
    def __init__(self):
        self.store: dict[tuple[str, int], dict] = {}

    def list_versions(self, root):
        return sorted(v for (r, v) in self.store if r == root)

    def read_manifest_json(self, root, version):
        try:
            return self.store[(root, version)]
        except KeyError:
            raise be.VersionNotFoundError(f"{version} at {root}")

    def commit_manifest_json(self, root, version, payload):
        if (root, version) in self.store:
            raise be.CommitConflictError(f"{version} at {root}")
        self.store[(root, version)] = payload


@pytest.fixture
def mem_backend():
    b = InMemoryBackend()
    prev = be.set_backend(b)
    yield b
    be.set_backend(prev)


def test_metadata_plane_routes_through_backend(mem_backend, tmp_path, spark):
    from pyspark.sql.types import LongType, StructField, StructType

    root = str(tmp_path / "t.lance")
    schema = StructType([StructField("a", LongType())])
    ds = LanceDataset.create_empty(root, schema)
    assert ds.version == 1 and ds.count_rows() == 0
    # the manifest lives in the backend, not on disk
    assert (root, 1) in mem_backend.store
    assert not os.path.isdir(os.path.join(root, "_versions"))
    # conflict detection comes from the backend too
    with pytest.raises(CommitConflictError):
        mem_backend.commit_manifest_json(root, 1, {})


def test_backend_version_resolution(mem_backend):
    root = "/virtual/t.lance"
    for v, ts in [(1, 100), (2, 200), (3, 300)]:
        m = Manifest(version=v, schema_json={"type": "struct", "fields": []})
        commit_manifest(root, m)
        mem_backend.store[(root, v)]["timestamp_ms"] = ts  # pin for the test
    assert list_versions(root) == [1, 2, 3]
    assert read_manifest(root, 2).version == 2
    from lance_trino_spark.format.manifest import version_at_timestamp

    assert version_at_timestamp(root, 250) == 2
    assert version_at_timestamp(root, 99999) == 3
    with pytest.raises(be.VersionNotFoundError):
        version_at_timestamp(root, 50)


def test_manifest_cache_hit_and_recreate_invalidation(spark, tmp_path):
    """A18: repeated opens of one (path, version) reuse the parsed manifest;
    DROP + re-CREATE at the same path (reusing version 1) must NOT serve the
    dropped table's manifest — the storage fingerprint changes."""
    import shutil

    from pyspark.sql import functions as F

    from lance_trino_spark.format import manifest as M
    from lance_trino_spark.format.dataset import LanceDataset

    path = str(tmp_path / "cache.lance")
    LanceDataset.create(path, spark.range(5).select(F.col("id").alias("x")))
    m1 = M.read_manifest(path, 1)
    assert M.read_manifest(path, 1) is m1  # cache hit: same parsed object

    shutil.rmtree(path)
    LanceDataset.create(path, spark.range(3).select(F.col("id").alias("y")))
    m2 = M.read_manifest(path, 1)
    assert m2 is not m1
    assert m2.schema_json != m1.schema_json
