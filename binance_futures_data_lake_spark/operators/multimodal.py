"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The container has no image/audio libraries, so the DECODE step is a
deterministic stub (`_fake_decode`, clearly marked) — but every piece of
Spark-side plumbing is real and tested: the schema (binary payload +
metadata struct), the Arrow-batched `mapInPandas` signature, batch-shape
handling, partitioning, and the feature-extraction dataflow. Swapping the
stub for PIL/libav is a one-function change inside the UDF.

Scale design:
- payloads stay opaque `binary` end-to-end — Spark never interprets them,
  so Tungsten just moves pointers; only the UDF touches bytes;
- `mapInPandas` streams Arrow record batches — per-batch memory is bounded
  by `spark.sql.execution.arrow.maxRecordsPerBatch` regardless of media
  size distribution;
- feature extraction emits SMALL fixed-width rows (stats, not pixels), so
  the expensive binary column is dropped before any shuffle — project the
  payload away as early as possible and never groupBy while carrying it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),           # image | audio | video
    T.StructField("payload", T.BinaryType()),        # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),     # png/jpeg/wav/mp4/...
        T.StructField("width", T.IntegerType()),     # images/video
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("duration_ms", T.LongType()),     # audio/video
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_intensity", T.DoubleType()),
    T.StructField("std_intensity", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_ts_ms", T.LongType()),
    T.StructField("frame_payload", T.BinaryType()),
])


def synthetic_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic media table derived from `documents` (payload = utf-8
    text bytes; metadata derived from doc stats) so the pipeline has real
    binary data to move without bundled assets."""
    meta = F.struct(
        F.lit("png" if kind == "image" else "wav").alias("format"),
        (F.pmod(F.col("doc_id"), F.lit(64)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(48)) + 24).cast("int").alias("height"),
        F.lit(3).alias("n_channels"),
        F.lit(16000).alias("sample_rate"),
        (F.length("text").cast("long") * 10).alias("duration_ms"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int):
    """STUB — stands in for PIL.Image.open(...).

    Deterministic pseudo-decode: expands md5(payload) into `width*height`
    pseudo-intensity bytes. Replace with a real decoder where image libs
    exist; raise for formats a real decoder wouldn't handle.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for null payloads")
    n = width * height
    out = bytearray()
    seed = payload if len(payload) < 1024 else payload[:1024]
    block = hashlib.md5(seed).digest()
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n])


def image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode → per-image intensity stats + 64-bit pHash-style
    fingerprint. The binary column is consumed inside the UDF and never
    emitted — output rows are fixed-width."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h = int(r["meta"]["width"]), int(r["meta"]["height"])
                px = np.frombuffer(_fake_decode(r["payload"], w, h), dtype=np.uint8)
                mean = float(px.mean())
                # 8x8 mean-threshold fingerprint (classic aHash), bit i set
                # where block-mean > global mean
                blocks = np.array_split(px.astype(np.float64), 64)
                bits = np.array([b.mean() > mean for b in blocks], dtype=np.uint64)
                phash = int((bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
                rows.append((
                    int(r["media_id"]), len(r["payload"]), w, h,
                    round(mean, 6), round(float(px.std()), 6),
                    phash - 2**63,  # store as signed long
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.select("media_id", "payload", "meta").mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize plumbing: decode → (stub) nearest-neighbor downsample →
    re-emit binary payload with updated metadata. Shows the
    binary-in/binary-out UDF shape used by a real thumbnailing job."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h = int(r["meta"]["width"]), int(r["meta"]["height"])
                px = np.frombuffer(_fake_decode(r["payload"], w, h), dtype=np.uint8)
                img = px.reshape(h, w)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = img[np.ix_(yi, xi)]
                rows.append((int(r["media_id"]), small.tobytes(), out_w, out_h))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "width", "height"])

    return media.select("media_id", "payload", "meta").mapInPandas(resize, out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to N frame
    rows (timestamps from metadata duration; frame payload stub = sliced
    source bytes). Real decoders drop in at the payload-slicing line."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["meta"]["duration_ms"] or 0)
                n = min(max_frames, max(1, dur // every_ms))
                payload = r["payload"] or b""
                step = max(1, len(payload) // max(n, 1))
                for i in range(n):
                    rows.append((
                        int(r["media_id"]), i, i * every_ms,
                        payload[i * step: i * step + step],
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.select("media_id", "payload", "meta").mapInPandas(sample, FRAME_SCHEMA)
