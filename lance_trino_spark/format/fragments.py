"""Executor-side fragment file writing, shared by the format layer and the
``format("lance")`` DataSource.

Two-phase write, phase 1: each task streams its Arrow batches into fragment
parquet files directly under ``data/`` (rolling at ``max_rows_per_file``) and
reports ``(relative_path, num_rows)`` back to the driver. The driver's only
job is phase 2 — committing ONE manifest from those reports. This mirrors the
reference's worker-side fragment writes + coordinator commit
(`LancePageSink.java:144-198` workers serialize FragmentMetadata into commit
messages; `LanceMetadata.java:1078-1112` finishInsert commits once) and keeps
all per-file I/O off the driver: no listdir, no footer reads, no renames —
which on object storage would each be a full copy.
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING, Iterator

from .manifest import DATA_DIR

if TYPE_CHECKING:
    import pyarrow as pa
    from pyspark.sql import DataFrame

MAX_ROWS_PER_FILE = 1_000_000  # reference default, LanceConfig.java:128

# Stat value types that survive JSON and compare unambiguously across
# engines. Dates/timestamps/decimals/bytes are skipped (conservative: a
# fragment with no stats for a column is never pruned on that column).
_STAT_TYPES = (int, float, str, bool)


_STAT_STRING_BOUND = 256  # stored string bounds are capped at this length


def _bounded_str_max(s: str) -> str | None:
    """Sound truncated UPPER bound for a long string: prefix with the last
    code point incremented (every string starting with the prefix compares
    below it). None = cannot bound soundly → poison. NOTE: parquet footer
    string stats are NOT sound for this (pyarrow drops values longer than
    its truncation limit from min/max entirely — a file whose true max is a
    long string gets a too-small footer max), which is why fragment stats
    are computed from the actual data below, never from the footer."""
    prefix = s[:_STAT_STRING_BOUND]
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < 0x10FFFF:
            return prefix[:i] + chr(cp + 1)
    return None


def _hll_numeric_update(regs, col, t):
    """Fold one Arrow numeric/bool column into 256 HLL registers —
    fully vectorized (shared `ndv` module: splitmix64 over the values'
    64-bit canonical patterns; bit-length via a per-byte LUT), so the
    per-batch cost stays a handful of numpy passes, never a Python
    loop. Identical registers to the pre-refactor r10 fold
    (parity-pinned in tests/test_fragment_stats.py)."""
    import numpy as np
    import pyarrow as pa

    from . import ndv

    vals = col.drop_null()
    if len(vals) == 0:
        return
    if pa.types.is_boolean(t):
        x = vals.to_numpy(zero_copy_only=False).astype(np.uint64)
    elif pa.types.is_integer(t):
        x = vals.to_numpy(zero_copy_only=False).astype(
            np.int64).astype(np.uint64)
    else:  # floating
        x = vals.to_numpy(zero_copy_only=False).astype(
            np.float64).view(np.uint64)
    ndv.fold_registers(regs, ndv.splitmix64(x))


def _hll_string_update(regs, col):
    """Fold one Arrow string column into the registers — vectorized over
    the UTF-8 value buffer (`ndv.hash64_strings`: position-weighted
    polynomial + length salt + splitmix64 finish). Closes the r10 gap
    where own-format string columns — exactly the join-key-shaped
    columns CBO wants most — reported NDV unknown."""
    from . import ndv

    vals = col.drop_null()
    if len(vals):
        ndv.fold_registers(regs, ndv.hash64_strings(vals))


class StatsAccumulator:
    """Exact per-column min/max/null-count over the record batches a
    fragment file is written from — vectorized (`pyarrow.compute.min_max`)
    per batch, constant memory. Only top-level int/float/string/bool
    columns participate; NaN-bearing floats and unboundable strings poison
    their column (conservative: a fragment without stats for a column is
    never pruned on it). Every stats-typed column — numerics, bools AND
    strings (r11) — additionally folds into 256 HLL registers
    (vectorized, `format/ndv.py`) so SHOW STATS can answer NDV estimates
    from the manifest zone maps with zero data scanned — own-format twin
    of the native stats sidecars' registers."""

    def __init__(self) -> None:
        self._agg: dict = {}
        self._poisoned: set = set()
        self._hll: dict = {}

    def update(self, batch: "pa.RecordBatch") -> None:
        import math

        import pyarrow as pa
        import pyarrow.compute as pc

        for name, col in zip(batch.schema.names, batch.columns):
            if name in self._poisoned:
                continue
            t = col.type
            ok_type = (
                pa.types.is_integer(t)
                or pa.types.is_floating(t)
                or pa.types.is_string(t)
                or pa.types.is_large_string(t)
                or pa.types.is_boolean(t)
            )
            if not ok_type:
                self._poison(name)
                continue
            nulls = col.null_count
            cur = self._agg.setdefault(name, {"min": None, "max": None, "nulls": 0})
            cur["nulls"] += nulls
            import numpy as _np

            regs = self._hll.setdefault(name, _np.zeros(256, _np.uint8))
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                _hll_string_update(regs, col)
            else:
                _hll_numeric_update(regs, col, t)
            if nulls == len(col):
                continue  # all-null batch: bounds unchanged
            mm = pc.min_max(col)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            if isinstance(mn, float) and (math.isnan(mn) or math.isnan(mx)):
                self._poison(name)
                continue
            if isinstance(mn, str):
                mn = mn[:_STAT_STRING_BOUND]  # prefix: still a lower bound
                if len(mx) > _STAT_STRING_BOUND:
                    bounded = _bounded_str_max(mx)
                    if bounded is None:
                        self._poison(name)
                        continue
                    mx = bounded
            cur["min"] = mn if cur["min"] is None else min(cur["min"], mn)
            cur["max"] = mx if cur["max"] is None else max(cur["max"], mx)

    def _poison(self, name: str) -> None:
        self._poisoned.add(name)
        self._agg.pop(name, None)

    def finish(self) -> dict:
        # all-null columns keep {"nulls": n} with no bounds — IS NULL pruning
        # still works; comparison filters see no min and admit.
        out = {}
        for name, cur in self._agg.items():
            entry = {"nulls": cur["nulls"]}
            if cur["min"] is not None:
                entry["min"] = cur["min"]
                entry["max"] = cur["max"]
            if name in self._hll and self._hll[name].any():
                entry["hll"] = self._hll[name].tobytes().hex()
            out[name] = entry
        return out


class FragmentFileWriter:
    """Streams record batches into parquet fragment files under ``data/``,
    rolling at ``max_rows_per_file`` — no whole-partition buffering (the
    reference buffers pages then writes once, `LancePageSink.java:91-215`;
    streaming is strictly better for memory)."""

    def __init__(self, root: str, max_rows_per_file: int = MAX_ROWS_PER_FILE):
        self.root = root
        self.max_rows = max_rows_per_file

    @staticmethod
    def _task_prefix() -> str:
        """Sortable `partitionid-` prefix so fragment order (paths sorted at
        commit) follows DataFrame partition order — scans then preserve the
        writer's row order, like the reference's sequential fragment ids."""
        try:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            if ctx is not None:
                return f"{ctx.partitionId():06d}-"
        except Exception:
            pass
        return ""

    def write(
        self, batches: Iterator["pa.RecordBatch"]
    ) -> list[tuple[str, int, dict]]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(os.path.join(self.root, DATA_DIR), exist_ok=True)
        prefix = self._task_prefix()
        files: list[tuple[str, int, dict]] = []

        def _close(writer, rel, rows, acc):
            writer.close()
            files.append((rel, rows, acc.finish()))

        writer = None
        rel, rows, acc = None, 0, None
        try:
            for batch in batches:
                # Slice so no file ever exceeds max_rows — exact rolling even
                # when incoming Arrow batches are larger than the file cap.
                while batch.num_rows > 0:
                    if writer is None:
                        rel = os.path.join(
                            DATA_DIR,
                            f"{prefix}{len(files):04d}-{uuid.uuid4().hex}.parquet",
                        )
                        writer = pq.ParquetWriter(
                            os.path.join(self.root, rel),
                            pa.schema(batch.schema),
                            compression="snappy",
                        )
                        rows = 0
                        acc = StatsAccumulator()  # zone map, exact, per file
                    take = min(batch.num_rows, self.max_rows - rows)
                    piece = batch.slice(0, take)
                    writer.write_batch(piece)
                    acc.update(piece)
                    rows += take
                    batch = batch.slice(take)
                    if rows >= self.max_rows:
                        _close(writer, rel, rows, acc)
                        writer = None
        finally:
            if writer is not None:
                _close(writer, rel, rows, acc)
        return files


def stage_via_tasks(
    df: "DataFrame", root: str, max_rows_per_file: int = MAX_ROWS_PER_FILE
) -> list[tuple[str, int, dict]]:
    """Distributed stage: executors write fragment files and report
    ``(path, rows, zone-map stats)``; the driver collects only that metadata
    (O(fragments) tiny rows). A failed job may leave orphan files in
    ``data/`` — they are unreferenced by any manifest and therefore
    invisible (same garbage model as every log-structured table format)."""
    import json

    writer = FragmentFileWriter(root, max_rows_per_file)

    def _write(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        files = writer.write(batches)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([p for p, _, _ in files], pa.string()),
                pa.array([n for _, n, _ in files], pa.int64()),
                pa.array([json.dumps(s) for _, _, s in files], pa.string()),
            ],
            names=["path", "num_rows", "stats"],
        )

    reports = df.mapInArrow(
        _write, "path string, num_rows long, stats string"
    ).collect()
    return sorted(
        (r["path"], int(r["num_rows"]), json.loads(r["stats"])) for r in reports
    )


def as_fragments(staged, start_id: int = 0) -> list:
    """Build Fragment metadata from staged file reports. Accepts
    ``(path, rows)``, ``(path, rows, stats)``, and existing-fragment
    carry-over tuples interchangeably so rewrite paths (compaction,
    copy-on-write) can mix kept files with fresh ones."""
    from .manifest import Fragment

    out = []
    for i, item in enumerate(staged):
        rel, n = item[0], item[1]
        stats = item[2] if len(item) > 2 else None
        out.append(Fragment(start_id + i, rel, n, stats=stats or None))
    return out
