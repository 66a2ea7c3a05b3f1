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


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Nearest-neighbor resize of the decoded image to (out_w, out_h),
    channel 0 — the thumbnail/feature-prep step of an image pipeline.

    numpy-vectorized inside Arrow-batched mapInPandas: decode, reshape to
    (h, w, c), gather rows/cols by precomputed nearest indexes. No shuffle;
    output is one fixed-size row per image regardless of input size."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, payloads = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                w, h, c = struct.unpack("<HHH", p[4:10])
                arr = np.frombuffer(p[10 : 10 + w * h * c], dtype=np.uint8)
                arr = arr.reshape(h, w, c)
                rr = (np.arange(out_h) * h) // out_h
                cc = (np.arange(out_w) * w) // out_w
                small = arr[rr][:, cc, 0]  # channel 0, nearest-neighbor
                ids.append(int(i))
                means.append(float(small.sum()) / (out_w * out_h))
                payloads.append(small.tobytes())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "resized": payloads,
                    "mean_resized": means,
                }
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, resized binary, mean_resized double"
    )


# Fake audio: deterministic 16-bit-ish waveform per document.
# sample[t] = ((doc_id + 1) * t) % 97 - 48, length = 800 + (doc_id % 5) * 160.
AUDIO_FRAME = 160  # samples per frame (10 ms at 16 kHz)


def synth_waveform(doc_id: int) -> list[int]:
    n = 800 + (doc_id % 5) * AUDIO_FRAME
    return [((doc_id + 1) * t) % 97 - 48 for t in range(n)]


def audio_frame_energy(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Audio feature extraction plumbing: per-frame energy (mean of squared
    samples over non-overlapping 160-sample frames) of a synthesized
    waveform — the VAD/loudness front-end shape. Real decoders (libav)
    would replace `synth_waveform` behind the same mapInPandas contract."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for i in pdf[id_col]:
                wav = np.array(synth_waveform(int(i)), dtype=np.int64)
                frames = wav.reshape(-1, AUDIO_FRAME)
                e = (frames * frames).sum(axis=1) / float(AUDIO_FRAME)
                ids.extend([int(i)] * len(e))
                idxs.extend(range(len(e)))
                energies.extend(float(x) for x in e)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "energy": energies}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, frame_idx int, energy double"
    )


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bins: int = 16,
) -> DataFrame:
    """Feature extraction for multimodal retrieval: a deterministic
    pixel-intensity histogram (`n_bins` float32s, L1-normalized) per image
    payload — the stand-in for a real vision-embedding model (the model
    call would replace the histogram inside the SAME mapInPandas batch
    loop; schema, batching, and downstream indexing are identical).

    Arrow-batched mapInPandas, no shuffle; feeds straight into
    `LanceDataset.create_vector_index` / `vector_search` (suite m06)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                b = bytes(p)
                if b[:4] != _MAGIC:
                    raise ValueError("bad magic")
                px = np.frombuffer(b, dtype=np.uint8, offset=10).astype(
                    np.float64
                )
                hist, _ = np.histogram(px, bins=n_bins, range=(0, 256))
                hist = hist / max(1, int(hist.sum()))
                # two spatial-moment dims: order-sensitive, so payloads with
                # identical histograms but different pixel layouts still get
                # distinct features (self-match stays exact)
                n = len(px)
                i = np.arange(n)
                m1 = float((i * px).sum()) / (n * n * 255)
                m2 = float(((i % 7) * px).sum()) / (n * 255 * 7)
                feats.append(
                    np.concatenate([hist, [m1, m2]]).astype("float32").tolist()
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "feature": feats}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, feature array<float>"
    )
