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

    def write(self, batches: Iterator["pa.RecordBatch"]) -> list[tuple[str, int]]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(os.path.join(self.root, DATA_DIR), exist_ok=True)
        prefix = self._task_prefix()
        files: list[tuple[str, int]] = []
        writer = None
        rel, rows = None, 0
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
                    take = min(batch.num_rows, self.max_rows - rows)
                    writer.write_batch(batch.slice(0, take))
                    rows += take
                    batch = batch.slice(take)
                    if rows >= self.max_rows:
                        writer.close()
                        files.append((rel, rows))
                        writer = None
        finally:
            if writer is not None:
                writer.close()
                files.append((rel, rows))
        return files


def stage_via_tasks(
    df: "DataFrame", root: str, max_rows_per_file: int = MAX_ROWS_PER_FILE
) -> list[tuple[str, int]]:
    """Distributed stage: executors write fragment files and report
    ``(path, rows)``; the driver collects only that metadata (O(fragments)
    tiny rows). A failed job may leave orphan files in ``data/`` — they are
    unreferenced by any manifest and therefore invisible (same garbage model
    as every log-structured table format)."""
    writer = FragmentFileWriter(root, max_rows_per_file)

    def _write(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        files = writer.write(batches)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([p for p, _ in files], pa.string()),
                pa.array([n for _, n in files], pa.int64()),
            ],
            names=["path", "num_rows"],
        )

    reports = df.mapInArrow(_write, "path string, num_rows long").collect()
    return sorted((r["path"], int(r["num_rows"])) for r in reports)
