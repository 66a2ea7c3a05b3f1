"""Multimodal (image/audio/video) column operators.

Model (mirrors the reference's blob-column story, SURVEY §1.1 "Blob column" /
§2A.A15): media lives in opaque BINARY columns with typed metadata alongside.
Decode / feature-extraction runs as Arrow-batched `mapInPandas` operators —
the Spark-side plumbing (schema, batch iteration, partition preservation) is
real and tested; the actual codecs (PIL/libav) are not in this container, so
`decode_image` falls back to a deterministic fake codec behind an
import-guard, and real decoding raises NotImplementedError until the codec
libs are installed.

Payload layout of the fake format ("FIMG"): 4-byte magic + 3×uint16 LE
(width, height, channels) + width*height*channels pixel bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_MAGIC = b"FIMG"


def synth_payload(doc_id: int) -> bytes:
    """Deterministic fake image payload for a document id."""
    w = 16 + doc_id % 32
    h = 16 + (doc_id * 3) % 32
    c = 1 + doc_id % 3
    n = w * h * c
    pixels = bytes((doc_id * i + 7) % 256 for i in range(n))
    return _MAGIC + struct.pack("<HHH", w, h, c) + pixels


def attach_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Ingest step: attach a BINARY media column (here synthesized; in a real
    pipeline this is the raw bytes read from object storage)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [synth_payload(int(i)) for i in pdf[id_col]]
            yield pdf

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["payload binary"]
    )
    return df.mapInPandas(gen, schema=schema)


def _decode_real(payload: bytes) -> tuple[int, int, int, float]:
    """Real image decode — requires an imaging library not present in this
    environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "real image decoding requires Pillow; install it or use the "
            "deterministic fake codec (decode_images(fake=True))"
        ) from e
    raise NotImplementedError("real codec wiring lands with the imaging libs")


def _decode_fake(payload: bytes) -> tuple[int, int, int, float]:
    if payload[:4] != _MAGIC:
        raise ValueError("bad magic")
    w, h, c = struct.unpack("<HHH", payload[4:10])
    pixels = payload[10 : 10 + w * h * c]
    mean = float(sum(pixels)) / (w * h * c)
    return w, h, c, mean


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Decode the BINARY column into (width, height, channels, mean_px).

    Arrow-batched mapInPandas: each task decodes its partition's batches —
    no shuffle, scales with input splits. `fake=False` switches to the real
    codec (NotImplementedError without imaging libs)."""
    decode = _decode_fake if fake else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                rows, columns=["width", "height", "channels", "mean_px"]
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(
        run,
        schema=f"{id_col} long, width int, height int, channels int, mean_px double",
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing demo: treat each pixel row of the fake image
    as a 'frame' and keep every `every`-th, emitting (id, frame_idx,
    frame_mean). One output row per sampled frame — the explode-shaped
    mapInPandas pattern video pipelines need."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                w, h, c = struct.unpack("<HHH", p[4:10])
                row_len = w * c
                for f in range(0, h, every):
                    frame = p[10 + f * row_len : 10 + (f + 1) * row_len]
                    ids.append(int(i))
                    idxs.append(f)
                    means.append(float(sum(frame)) / row_len)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_mean": means}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, frame_idx int, frame_mean double"
    )
