"""Blob columns: out-of-line BINARY storage with virtual position/size
columns (SURVEY §1.1 "Blob column" / §2A.A15).

Reference semantics re-expressed for Spark:
- A column declared as a blob column is stored OUT-OF-LINE: the parquet
  fragment keeps only a descriptor struct `{file, position, size}` while the
  bytes live in sidecar files under `_blobs/` (the reference's field metadata
  `lance-encoding:blob=true` + `{position,size}` struct, `BlobUtils.java:23-111`).
- Scans return EMPTY bytes for the blob column itself and expose two hidden
  selectable virtual columns `<col>__blob_pos` / `<col>__blob_size` (BIGINT)
  derived from the struct (`LanceRuntime.java:427-461`,
  `LanceArrowToPageScanner.java:344-392,571-581`). They are hidden from the
  default projection — exactly the reference's hidden-from-DESCRIBE flag
  (`LanceColumnHandle.java:393-402`).
- `LanceDataset.blobs_df` is the fetch path: ranged reads of (file, position,
  size) on executors — one sidecar file is written per (task, column), so at
  cluster scale both the write and the fetch stay fully distributed, and on
  object storage the seek+read maps to a ranged GET.

Write path: Arrow-batched `mapInPandas` — each task appends its rows' bytes
to a task-local sidecar file and emits descriptor structs; the parquet stage
then commits descriptors like any other column. Two-phase commit semantics
are unchanged: sidecar files are orphaned (never referenced) if the manifest
commit fails, same as staged data files.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOBS_DIR = "_blobs"
BLOB_PROP = "blob_columns"

_DESCRIPTOR_TYPE = StructType(
    [
        StructField("file", StringType()),
        StructField("position", LongType()),
        StructField("size", LongType()),
    ]
)


def descriptor_schema(schema: StructType, blob_cols: list[str]) -> StructType:
    """Physical schema: blob BINARY fields replaced by descriptor structs."""
    fields = []
    for f in schema.fields:
        if f.name in blob_cols:
            if not isinstance(f.dataType, BinaryType):
                raise ValueError(
                    f"blob column {f.name!r} must be BINARY, got {f.dataType}"
                )
            fields.append(StructField(f.name, _DESCRIPTOR_TYPE, f.nullable))
        else:
            fields.append(f)
    return StructType(fields)


def stage_blob_columns(
    df: DataFrame, blob_cols: list[str], root: str
) -> DataFrame:
    """Replace each blob column's bytes with `{file, position, size}`
    descriptors, appending the bytes to one sidecar file per (task, column).
    Distributed: no shuffle, no driver involvement."""
    missing = [c for c in blob_cols if c not in df.columns]
    if missing:
        raise ValueError(f"blob columns not in dataframe: {missing}")
    out_schema = descriptor_schema(df.schema, blob_cols)
    blob_dir = os.path.join(root, BLOBS_DIR)
    os.makedirs(blob_dir, exist_ok=True)

    def write_task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One sidecar per column for this task, opened lazily so empty
        # partitions create no files.
        handles: dict[str, tuple[str, object]] = {}
        try:
            for pdf in batches:
                pdf = pdf.copy()
                for c in blob_cols:
                    if c not in handles:
                        rel = f"{uuid.uuid4().hex}-{c}.bin"
                        handles[c] = (rel, open(os.path.join(blob_dir, rel), "wb"))
                    rel, fh = handles[c]
                    descs = []
                    for payload in pdf[c]:
                        if payload is None:
                            descs.append(None)
                            continue
                        b = bytes(payload)
                        pos = fh.tell()
                        fh.write(b)
                        descs.append(
                            {"file": rel, "position": pos, "size": len(b)}
                        )
                    pdf[c] = descs
                yield pdf
        finally:
            for _, fh in handles.values():
                fh.close()

    return df.mapInPandas(write_task, schema=out_schema)


def apply_blob_read_semantics(df: DataFrame, blob_cols: list[str]) -> DataFrame:
    """Reference read behavior: blob column → empty bytes; virtual
    `<col>__blob_pos` / `<col>__blob_size` BIGINT columns from the struct."""
    for c in blob_cols:
        if c not in df.columns:
            continue
        df = (
            df.withColumn(f"{c}__blob_pos", F.col(f"{c}.position"))
            .withColumn(f"{c}__blob_size", F.col(f"{c}.size"))
            .withColumn(c, F.lit(b"").cast("binary"))
        )
    return df


def virtual_columns(blob_cols: list[str]) -> list[str]:
    return [f"{c}__blob_{k}" for c in blob_cols for k in ("pos", "size")]


def fetch_blobs(
    df: DataFrame, root: str, col: str, out_col: str | None = None
) -> DataFrame:
    """Fetch path: resolve a descriptor-struct column back to its bytes with
    executor-side ranged reads (seek+read per row, grouped by sidecar file
    within each Arrow batch). `df` must carry the PHYSICAL `{file, position,
    size}` struct for `col` (use `to_df(..., with_blobs=True)`)."""
    out_col = out_col or col
    blob_dir = os.path.join(root, BLOBS_DIR)
    fields = [
        StructField(out_col if f.name == col else f.name, BinaryType(), True)
        if f.name == col
        else f
        for f in df.schema.fields
    ]
    out_schema = StructType(fields)

    def read_task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                pdf = pdf.copy()
                payloads = []
                for desc in pdf[col]:
                    if desc is None:
                        payloads.append(None)
                        continue
                    rel, pos, size = desc["file"], desc["position"], desc["size"]
                    fh = handles.get(rel)
                    if fh is None:
                        fh = handles[rel] = open(os.path.join(blob_dir, rel), "rb")
                    fh.seek(pos)
                    payloads.append(fh.read(size))
                pdf[col] = payloads
                if out_col != col:
                    pdf = pdf.rename(columns={col: out_col})
                yield pdf
        finally:
            for fh in handles.values():
                fh.close()

    return df.mapInPandas(read_task, schema=out_schema)


__all__ = [
    "BLOBS_DIR",
    "BLOB_PROP",
    "apply_blob_read_semantics",
    "descriptor_schema",
    "fetch_blobs",
    "stage_blob_columns",
    "virtual_columns",
]
