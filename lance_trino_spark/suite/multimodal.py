"""Multimodal suite entries: binary-column decode / frame-sample plumbing.

The payloads are synthesized deterministically from doc_id (the container has
no codec libs — SURVEY's "stub the decode, make the plumbing real" rule), so
the oracle can state the expected metadata arithmetically: decode output for
doc d must be width=16+d%32, height=16+(3d)%32, channels=1+d%3, and mean_px
the mean of (d*i+7)%256 over the pixel index range. The Spark side really
packs and re-parses the bytes through Arrow-batched mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_payloads, decode_images, sample_frames
from ..tables import load_table
from . import register


def _docs_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cap the decoded subset so the oracle's pixel-unnest stays cheap.
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
    )


@register(
    "m01_image_decode",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    dims AS (SELECT doc_id,
                    16 + doc_id % 32 AS width,
                    16 + (doc_id * 3) % 32 AS height,
                    1 + doc_id % 3 AS channels
             FROM d),
    px AS (SELECT doc_id, width, height, channels,
                  unnest(generate_series(0, width * height * channels - 1)) AS i
           FROM dims)
    SELECT doc_id,
           CAST(MIN(width) AS INT) AS width,
           CAST(MIN(height) AS INT) AS height,
           CAST(MIN(channels) AS INT) AS channels,
           CAST(SUM((doc_id * i + 7) % 256) AS DOUBLE)
             / (MIN(width) * MIN(height) * MIN(channels)) AS mean_px
    FROM px
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="binary image column decode via Arrow-batched mapInPandas",
    tags=("multimodal", "binary"),
)
def m01(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_subset(spark, sf_dir)
    return decode_images(attach_payloads(docs)).orderBy("doc_id")


@register(
    "m02_frame_sampling",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 50),
    dims AS (SELECT doc_id,
                    16 + doc_id % 32 AS width,
                    16 + (doc_id * 3) % 32 AS height,
                    1 + doc_id % 3 AS channels
             FROM d),
    frames AS (SELECT doc_id, width, height, channels,
                      unnest(generate_series(0, height - 1, 4)) AS frame_idx
               FROM dims),
    px AS (SELECT doc_id, width, channels, frame_idx,
                  unnest(generate_series(frame_idx * width * channels,
                                         (frame_idx + 1) * width * channels - 1)) AS i
           FROM frames)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(SUM((doc_id * i + 7) % 256) AS DOUBLE)
             / (MIN(width) * MIN(channels)) AS frame_mean
    FROM px
    GROUP BY doc_id, frame_idx
    ORDER BY doc_id, frame_idx
    """,
    doc="video-style frame sampling (every 4th row-frame) via mapInPandas",
    tags=("multimodal", "binary"),
)
def m02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 50
    )
    return sample_frames(attach_payloads(docs), every=4).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# m03 — blob columns (A15): out-of-line storage round-trip. Payload bytes go
# out-of-line at CTAS; the scan's virtual `payload__blob_size` column and a
# ranged-read fetch + decode must reproduce the m01 arithmetic exactly.
# ---------------------------------------------------------------------------
@register(
    "m03_blob_columns",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    dims AS (SELECT doc_id,
                    16 + doc_id % 32 AS width,
                    16 + (doc_id * 3) % 32 AS height,
                    1 + doc_id % 3 AS channels
             FROM d),
    px AS (SELECT doc_id, width, height, channels,
                  unnest(generate_series(0, width * height * channels - 1)) AS i
           FROM dims)
    SELECT doc_id,
           CAST(MIN(10 + width * height * channels) AS BIGINT) AS blob_size,
           CAST(SUM((doc_id * i + 7) % 256) AS DOUBLE)
             / (MIN(width) * MIN(height) * MIN(channels)) AS mean_px
    FROM px
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="format: blob column out-of-line storage, virtual size + fetch-decode",
    tags=("multimodal", "format", "blob"),
)
def m03(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..format.dataset import LanceDataset
    from .lance_format import _fresh_path

    path = _fresh_path(sf_dir, "m03")
    docs = attach_payloads(_docs_subset(spark, sf_dir))
    ds = LanceDataset.create(
        path, docs, max_rows_per_file=64, blob_columns=["payload"]
    )
    sizes = ds.to_df(spark, columns=["doc_id", "payload__blob_size"])
    decoded = decode_images(ds.blobs_df(spark, "payload")).select(
        "doc_id", "mean_px"
    )
    return (
        sizes.join(decoded, "doc_id")
        .select("doc_id", F.col("payload__blob_size").alias("blob_size"), "mean_px")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m04 — nearest-neighbor resize to 8×8 (channel 0): thumbnail/feature prep.
# The oracle replays the gather arithmetic: out(r,c) reads source pixel
# ((r*h)//8, (c*w)//8, 0) of the synthetic payload.
# ---------------------------------------------------------------------------
@register(
    "m04_image_resize",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    dims AS (SELECT doc_id,
                    16 + doc_id % 32 AS w,
                    16 + (doc_id * 3) % 32 AS h,
                    1 + doc_id % 3 AS c
             FROM d),
    px AS (SELECT doc_id, w, h, c,
                  unnest(generate_series(0, 63)) AS o
           FROM dims),
    v AS (SELECT doc_id,
                 (doc_id * (((((o // 8) * h) // 8) * w
                             + (((o % 8) * w) // 8)) * c) + 7) % 256 AS val
          FROM px)
    SELECT doc_id, CAST(SUM(val) AS DOUBLE) / 64 AS mean_resized
    FROM v GROUP BY doc_id ORDER BY doc_id
    """,
    doc="multimodal: numpy nearest-neighbor resize inside mapInPandas",
    tags=("multimodal", "binary", "resize"),
)
def m04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_images

    docs = _docs_subset(spark, sf_dir)
    return (
        resize_images(attach_payloads(docs))
        .select("doc_id", "mean_resized")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# m05 — audio front-end plumbing: per-frame energy of a deterministic
# synthetic waveform (160-sample frames — the VAD/loudness shape).
# ---------------------------------------------------------------------------
@register(
    "m05_audio_frame_energy",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    fr AS (SELECT doc_id,
                  unnest(generate_series(0, 4 + doc_id % 5)) AS frame_idx
           FROM d),
    s AS (SELECT doc_id, frame_idx,
                 unnest(generate_series(0, 159)) AS j
          FROM fr),
    v AS (SELECT doc_id, frame_idx,
                 ((doc_id + 1) * (frame_idx * 160 + j)) % 97 - 48 AS sample
          FROM s)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(SUM(sample * sample) AS DOUBLE) / 160 AS energy
    FROM v GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
    """,
    doc="multimodal: audio per-frame energy via mapInPandas (synth waveform)",
    tags=("multimodal", "audio"),
)
def m05(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_frame_energy

    docs = _docs_subset(spark, sf_dir)
    return audio_frame_energy(docs).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# m06 — multimodal retrieval end-to-end: payload → deterministic feature
# extraction (histogram embedding; a vision model drops into the same
# mapInPandas loop) → Lance dataset with a PERSISTED IVF index → index-
# backed top-1 search. Query vectors come from the corpus itself, so top-1
# is the identity (cosine with itself is maximal) — an exact oracle with
# no recall floors.
# ---------------------------------------------------------------------------
@register(
    "m06_multimodal_ann",
    oracle="""
    SELECT doc_id AS query_id, doc_id AS neighbor_id
    FROM documents WHERE doc_id < 20
    ORDER BY query_id
    """,
    doc="multimodal: feature-extract -> persisted IVF index -> top-1 "
        "self-match retrieval",
    tags=("multimodal", "ann", "index", "pipeline"),
)
def m06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ..format.dataset import LanceDataset
    from ..operators.multimodal import attach_payloads, extract_features
    from .lance_format import _fresh_path

    feats = extract_features(attach_payloads(_docs_subset(spark, sf_dir)))
    path = _fresh_path(sf_dir, "m06")
    ds = LanceDataset.create(
        path, feats.orderBy("doc_id").coalesce(1), max_rows_per_file=64
    )
    ds = ds.create_vector_index(spark, "feature", n_cells=8, sample=512)
    queries = feats.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("query_id"), "feature"
    )
    hits = ds.vector_search(
        spark, "feature", queries, k=1, nprobe=2, id_columns=["doc_id"]
    )
    rk = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") == 1)
        .select("query_id", F.col("doc_id").alias("neighbor_id"))
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# m07 — the full native BLOB lifecycle: document payload bytes stream
# through the distributed native CTAS as blob columns (in-file payload
# regions + synthesized {position, size} descriptors — the write half of
# the `lance-encoding:blob` surface lf20 reads), scan back as empty
# VARBINARY + virtual position/size columns, and a bounded ranged fetch
# (read_blob_payload, the object-store GET-range shape) round-trips the
# bytes — proven per fragment and surfaced as a proof column.
# ---------------------------------------------------------------------------
@register(
    "m07_native_blob_lifecycle",
    oracle="""
    SELECT (doc_id % 7) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
               AS payload_bytes,
           CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null_payloads,
           TRUE AS fetch_roundtrip
    FROM documents
    WHERE doc_id < 400
    GROUP BY doc_id % 7
    ORDER BY bucket
    """,
    doc="multimodal: native blob lifecycle — payload bytes write as "
        "in-file blob regions via the distributed CTAS, read back as "
        "virtual pos/size columns, ranged fetch round-trips the bytes",
    tags=("multimodal", "format", "blob", "lance-native", "write"),
)
def m07(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..format import lance_native as ln
    from ..sources.lance_datasource import register_lance_datasource
    from ..suite.lance_format import _fresh_path

    path = _fresh_path(sf_dir, "m07-blob")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(
            "doc_id",
            # every 5th payload NULL — the descriptor must go NULL too
            F.when(F.col("doc_id") % 5 != 0,
                   F.encode(F.col("text"), "UTF-8")).alias("payload"),
            F.length(F.encode(F.col("text"), "UTF-8")).alias("true_len"),
        )
    )
    ln.create_native_dataset(docs, path, file_version=2,
                             blob_columns={"payload"})

    # fetch proof: re-read ONE fragment's descriptors and compare a
    # ranged fetch of every non-null payload against its stored length
    m = ln.read_native_manifest(path)
    frag = m.fragments[0]
    t = ln.read_native_fragment(path, frag, m)
    import pyarrow as pa

    col = t.column("payload")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = t.column("true_len").to_pylist()
    ok = True
    for i in range(len(col)):
        d = col[i].as_py()
        if d is None:
            continue
        b = ln.read_blob_payload(
            path, frag.files[0].path, d["position"], d["size"])
        ok = ok and len(b) == lens[i] == d["size"]
    register_lance_datasource(spark)
    back = spark.read.format("lance").load(path)
    return (
        back.groupBy((F.col("doc_id") % 7).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("payload__blob_size"),
                             F.col("true_len"))).alias("payload_bytes"),
            F.sum(F.when(F.col("payload__blob_pos").isNull(), 1)
                  .otherwise(0)).alias("n_null_payloads"),
        )
        .withColumn("fetch_roundtrip", F.lit(bool(ok)))
        .orderBy("bucket")
    )
