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

    def delete_manifest(self, root, version):
        self.store.pop((root, version), None)


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


@pytest.fixture(params=["directory", "memory", "objectstore"])
def any_backend(request, tmp_path):
    """Every registered backend implementation, paired with a root it owns."""
    if request.param == "directory":
        yield be.DirectoryBackend(), str(tmp_path / "conformance.lance")
    elif request.param == "objectstore":
        # the PRODUCT object-store backend over a conditional-put store —
        # the seam beyond posix (no filesystem, keys only); an fsspec
        # binding exists behind an import-try (FsspecObjectStore)
        yield (
            be.ObjectStoreBackend(be.MemoryObjectStore()),
            "mem://bucket/conformance.lance",
        )
    else:
        yield InMemoryBackend(), "/virtual/conformance.lance"


class TestBackendConformance:
    """The StorageBackend contract, stated without reference to any layout.

    A real `lance`-SDK adapter (metadata plane over `lance.dataset(uri)` /
    `LanceDataset.commit`, see `format/backend.py` module docstring) must pass
    this suite unchanged — parametrize `any_backend` with it when the SDK is
    installed. Mirrors the reference's commit semantics
    (`LanceMetadata.java:1489-1513` optimistic version commit)."""

    # A manifest-shaped payload exercising what real manifests carry:
    # nested fragment entries, a deletion-file pointer, unicode, and null.
    PAYLOAD_V1 = {
        "version": 1,
        "schema_json": {"type": "struct", "fields": [{"name": "α", "type": "long"}]},
        "fragments": [
            {"path": "data/f-0001.parquet", "rows": 1024, "deletion": None},
            {
                "path": "data/f-0002.parquet",
                "rows": 512,
                "deletion": {"path": "_deletions/d-1.json", "count": 7},
            },
        ],
        "timestamp_ms": 1700000000000,
    }
    PAYLOAD_V2 = {"version": 2, "schema_json": {}, "fragments": [], "timestamp_ms": 1700000001000}

    def test_fresh_root_has_no_versions(self, any_backend):
        b, root = any_backend
        assert b.list_versions(root) == []

    def test_missing_version_raises(self, any_backend):
        b, root = any_backend
        with pytest.raises(be.VersionNotFoundError):
            b.read_manifest_json(root, 1)

    def test_commit_read_roundtrip_exact(self, any_backend):
        """Version immutability: what was committed is what every later read
        returns, structure-exact (incl. deletion-file pointers and unicode)."""
        b, root = any_backend
        b.commit_manifest_json(root, 1, self.PAYLOAD_V1)
        assert b.read_manifest_json(root, 1) == self.PAYLOAD_V1
        assert b.list_versions(root) == [1]

    def test_versions_listed_sorted_and_complete(self, any_backend):
        b, root = any_backend
        for v in (3, 1, 2):
            payload = dict(self.PAYLOAD_V1, version=v)
            b.commit_manifest_json(root, v, payload)
        assert b.list_versions(root) == [1, 2, 3]

    def test_concurrent_commit_conflicts_and_keeps_winner(self, any_backend):
        """Optimistic concurrency: the second committer of a version gets
        CommitConflictError and the FIRST payload stays visible untouched."""
        b, root = any_backend
        b.commit_manifest_json(root, 1, self.PAYLOAD_V1)
        with pytest.raises(be.CommitConflictError):
            b.commit_manifest_json(root, 1, self.PAYLOAD_V2)
        assert b.read_manifest_json(root, 1) == self.PAYLOAD_V1
        assert b.list_versions(root) == [1]

    def test_delete_manifest_removes_and_is_idempotent(self, any_backend):
        b, root = any_backend
        b.commit_manifest_json(root, 1, self.PAYLOAD_V1)
        b.commit_manifest_json(root, 2, self.PAYLOAD_V2)
        b.delete_manifest(root, 1)
        assert b.list_versions(root) == [2]
        with pytest.raises(be.VersionNotFoundError):
            b.read_manifest_json(root, 1)
        b.delete_manifest(root, 1)  # missing version: no-op, no raise
        b.delete_manifest(root, 99)

    def test_commit_after_delete_is_allowed(self, any_backend):
        """Vacuumed version numbers may be reused (the format layer never
        does, but the backend contract is commit-if-absent, not
        commit-once-ever)."""
        b, root = any_backend
        b.commit_manifest_json(root, 1, self.PAYLOAD_V1)
        b.delete_manifest(root, 1)
        b.commit_manifest_json(root, 1, self.PAYLOAD_V2)
        assert b.read_manifest_json(root, 1) == self.PAYLOAD_V2


class TestStorageOptions:
    """Credential-vending seam (`LanceTableHandle.java:153-173`,
    `LancePageSourceProvider.java:123-156`): refresh-on-expiry semantics,
    independent of any real object store."""

    def test_refresh_on_expiry_only(self):
        from lance_trino_spark.format.storage_options import (
            RefreshingOptions,
            StorageOptions,
        )

        vends = []

        class Vendor:
            def __init__(self):
                self.n = 0

            def vend(self, root):
                self.n += 1
                vends.append(root)
                return StorageOptions(
                    {"token": f"t{self.n}"}, expires_at_ms=1000 * self.n
                )

        v = Vendor()
        ro = RefreshingOptions(v)
        assert ro.fresh("s3://b/t", now_ms=0) == {"token": "t1"}
        # unexpired: cached, no second vend
        assert ro.fresh("s3://b/t", now_ms=999) == {"token": "t1"}
        assert v.n == 1
        # expired: re-vended
        assert ro.fresh("s3://b/t", now_ms=1000) == {"token": "t2"}
        assert v.n == 2
        # a different root vends independently
        ro.fresh("s3://b/u", now_ms=0)
        assert vends == ["s3://b/t", "s3://b/t", "s3://b/u"]

    def test_static_provider_never_expires(self):
        from lance_trino_spark.format.storage_options import (
            RefreshingOptions,
            StaticProvider,
        )

        ro = RefreshingOptions(StaticProvider({"region": "us-east-1"}))
        assert ro.fresh("r", now_ms=0) == {"region": "us-east-1"}
        assert ro.fresh("r", now_ms=10**15) == {"region": "us-east-1"}

    def test_filesystem_for_posix_and_loud_object_store(self):
        from lance_trino_spark.format.storage_options import filesystem_for

        assert filesystem_for("/data/t.lance") is None
        assert filesystem_for("file:///data/t.lance") is None
        with pytest.raises(NotImplementedError, match="s3"):
            filesystem_for("s3://bucket/t.lance")


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


class _VendingStore(be.MemoryObjectStore):
    """MemoryObjectStore that authenticates every operation against the
    vendor's currently-valid token — stale credentials are rejected the
    way an object store 403s an expired STS session."""

    def __init__(self, valid_token_ref):
        super().__init__()
        self._valid_ref = valid_token_ref
        self._applied = None
        self.denied = 0

    def apply_options(self, options):
        self._applied = options.get("token")

    def _auth(self):
        if self._applied != self._valid_ref[0]:
            self.denied += 1
            raise PermissionError("expired storage credentials")

    def get(self, key):
        self._auth()
        return super().get(key)

    def put(self, key, data):
        self._auth()
        super().put(key, data)

    def put_if_absent(self, key, data):
        self._auth()
        return super().put_if_absent(key, data)

    def list_prefix(self, prefix):
        self._auth()
        return super().list_prefix(prefix)

    def get_range(self, key, start, length):
        self._auth()
        return super().get_range(key, start, length)

    def size(self, key):
        self._auth()
        return super().size(key)

    def delete(self, key):
        self._auth()
        super().delete(key)


def test_native_scan_credential_vending_refresh_on_expiry():
    """Credential vending on the native path (reference:
    LancePageSourceProvider.java:123-156 refresh-on-expiry): a vendor
    whose credentials EXPIRE MID-SCAN is re-consulted before every
    storage open — reads/writes under the registered root keep working
    across a token rotation, with exactly one extra vend per expiry and
    zero PermissionErrors reaching the caller."""
    from lance_trino_spark.format import lance_native as ln
    from lance_trino_spark.format import native_io as nio
    from lance_trino_spark.format.storage_options import StorageOptions

    valid = ["tok-0"]
    vends = []

    class RotatingVendor:
        """Vends the currently-valid token; each set expires instantly
        after ROTATE_AFTER vends so every subsequent open must re-vend
        (the worst-case expiry cadence)."""

        def vend(self, root):
            vends.append(valid[0])
            # pre-rotation tokens expire immediately (worst-case mid-scan
            # expiry cadence: every open must re-vend); the rotated token
            # never expires
            if valid[0] == "tok-0":
                return StorageOptions({"token": valid[0]}, expires_at_ms=0)
            return StorageOptions({"token": valid[0]})

    store = _VendingStore(valid)
    root = "memory://vend/t.lance"
    nio.register_object_store_root(
        "memory://vend", store, options_provider=RotatingVendor())
    try:
        ln.write_native_dataset(root, {"k": list(range(20))})
        # token rotates MID-SCAN: the old one is now invalid at the store
        valid[0] = "tok-1"
        m = ln.read_native_manifest(root)  # must re-vend, not 403
        t = ln.read_native_fragment(root, m.fragments[0], m)
        assert t.column("k").to_pylist() == list(range(20))
        # staged write under the new token
        ln.append_native_rows(root, {"k": [100, 101]})
        assert ln.LanceNativeDataset(root).count_rows() == 22
    finally:
        nio.unregister_object_store_root("memory://vend")
    assert store.denied == 0  # no operation ever ran on stale creds
    assert len(vends) >= 2  # expiry forced at least one re-vend
    assert vends[-1] == "tok-1"


def test_vending_unexpired_set_is_cached():
    """A never-expiring option set costs exactly ONE vend no matter how
    many storage opens follow (the RefreshingOptions cache contract)."""
    from lance_trino_spark.format import lance_native as ln
    from lance_trino_spark.format import native_io as nio
    from lance_trino_spark.format.storage_options import StorageOptions

    valid = ["static"]
    vends = []

    class StaticVendor:
        def vend(self, root):
            vends.append(1)
            return StorageOptions({"token": "static"})

    store = _VendingStore(valid)
    nio.register_object_store_root(
        "memory://vendc", store, options_provider=StaticVendor())
    try:
        root = "memory://vendc/t.lance"
        ln.write_native_dataset(root, {"k": [1, 2, 3]})
        m = ln.read_native_manifest(root)
        ln.read_native_fragment(root, m.fragments[0], m)
    finally:
        nio.unregister_object_store_root("memory://vendc")
    assert len(vends) == 1


def test_object_store_mtime_backs_debris_grace(tmp_path):
    """ADVICE r14: nio.mtime treats None as 'unknown age: keep', so a
    store without mtime support makes vacuum's debris reaper leak
    orphaned shard files FOREVER on object-store datasets. The
    production-shaped adapters must report real epoch-second mtimes."""
    import time
    import warnings

    import pyarrow.fs as pafs

    from lance_trino_spark.format import native_io as nio
    from lance_trino_spark.format.backend import PyArrowFsObjectStore

    base = str(tmp_path / "bucket")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        store = PyArrowFsObjectStore(
            pafs.LocalFileSystem(), "pafs://mt", base)
    nio.register_object_store_root("pafs://mt", store)
    try:
        before = time.time() - 2
        store.put("pafs://mt/a/file.idx", b"shard-bytes")
        got = nio.mtime("pafs://mt/a/file.idx")
        assert got is not None and before <= got <= time.time() + 2
        assert store.mtime("pafs://mt/a/missing.idx") is None
    finally:
        nio.unregister_object_store_root("pafs://mt")

    # fsspec adapter: same contract, gated on the optional dependency
    try:
        import fsspec  # noqa: F401
    except ImportError:
        return
    from lance_trino_spark.format.backend import FsspecObjectStore

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        fstore = FsspecObjectStore("file")
    key = str(tmp_path / "fsspec-file.idx")
    with fstore.fs.open(key, "wb") as f:
        f.write(b"x")
    got = fstore.mtime(key)
    assert got is None or got > 0  # modified() may be unimplemented
