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


def footer_stats(path: str) -> dict:
    """Aggregate per-column min/max/null-count over a parquet file's row
    groups from the footer — one metadata read, no data pages touched.
    Returns {column: {"min", "max", "nulls"}} for top-level scalar columns
    with usable statistics."""
    import math

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict = {}
    poisoned: set = set()
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name or name in poisoned:
                continue  # nested leaf — zone maps key top-level columns only
            st = col.statistics
            ok = (
                st is not None
                and st.has_min_max
                and isinstance(st.min, _STAT_TYPES)
                and isinstance(st.max, _STAT_TYPES)
                and not (isinstance(st.min, float) and math.isnan(st.min))
                and not (isinstance(st.max, float) and math.isnan(st.max))
            )
            if not ok:
                poisoned.add(name)
                agg.pop(name, None)
                continue
            nulls = st.null_count if st.has_null_count else None
            cur = agg.get(name)
            if cur is None:
                agg[name] = {"min": st.min, "max": st.max, "nulls": nulls}
            else:
                cur["min"] = min(cur["min"], st.min)
                cur["max"] = max(cur["max"], st.max)
                cur["nulls"] = (
                    None
                    if cur["nulls"] is None or nulls is None
                    else cur["nulls"] + nulls
                )
    return agg


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

        def _close(writer, rel, rows):
            writer.close()
            # zone map from the just-written footer (still executor-side)
            files.append((rel, rows, footer_stats(os.path.join(self.root, rel))))

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
                        _close(writer, rel, rows)
                        writer = None
        finally:
            if writer is not None:
                _close(writer, rel, rows)
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
