"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
partition sizing, and the ``mapInPandas`` feature-extraction skeleton. The
actual codec work is stubbed — this container ships no image/audio libraries
— behind ``decode_image_stub``: a deterministic fake decoder (header parse +
seeded pixels) with the exact signature a Pillow/ffmpeg-backed decoder would
have. Swap the stub, keep the plumbing.

Design rules encoded here (what matters at 100 TB):
* payload stays ``BinaryType``; metadata is a narrow struct column so scans
  that only need (kind, width, height, n_bytes) never deserialize the blob
  (column pruning at the Parquet reader);
* decode happens inside ``mapInPandas`` on Arrow batches — one Python worker
  round-trip per batch, bounded memory via ``maxRecordsPerBatch``;
* frame sampling is planned JVM-side (a ``sequence`` of timestamps) so the
  expensive decode touches only sampled frames.
"""

from __future__ import annotations

import struct
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

# deterministic fake container format for tests: magic | w | h | seed
_FAKE_MAGIC = b"FIMG"


def pack_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic stand-in payload (tests + fixtures)."""
    return _FAKE_MAGIC + struct.pack("<iiq", width, height, seed)


def media_meta_col(payload_col: str | Column, kind: str = "image") -> Column:
    """Cheap metadata struct without decoding: header fields + length.

    JVM-side only: substring/length/conv — the blob is read but not parsed in
    Python. For real formats this is where a magic-number dispatch would go.
    """
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    header_ok = F.substring(c, 1, 4) == F.lit(_FAKE_MAGIC)
    width = _le_int32(c, 5)
    height = _le_int32(c, 9)
    return F.struct(
        F.lit(kind).alias("kind"),
        F.when(header_ok, F.lit("fake-v1")).otherwise(F.lit("unknown")).alias("codec"),
        F.when(header_ok, width).otherwise(F.lit(None)).alias("width"),
        F.when(header_ok, height).otherwise(F.lit(None)).alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(c).cast("long").alias("n_bytes"),
    )


def _le_int32(bin_col: Column, pos: int) -> Column:
    """Little-endian int32 at 1-based byte offset, via JVM byte ops."""
    b = [F.conv(F.hex(F.substring(bin_col, pos + i, 1)), 16, 10).cast("long")
         for i in range(4)]
    return (b[0] + b[1] * 256 + b[2] * 65536 + b[3] * 16777216).cast("int")


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder: deterministic fake pixels from the header seed.

    A production build replaces this body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``; the signature,
    batch shape, and error contract (ValueError on bad magic) are final.
    """
    if payload[:4] != _FAKE_MAGIC:
        raise ValueError("unknown image codec")
    width, height, seed = struct.unpack_from("<iiq", payload, 4)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_media_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id",
                           resize_to: tuple[int, int] | None = (8, 8)) -> DataFrame:
    """Batch decode -> (optional) resize -> channel-mean features.

    Output: (id, width, height, mean_rgb array<double>, phash bigint).
    The pipeline shape (decode inside mapInPandas, features as narrow
    columns) is the real deliverable; decode is the stub above.
    """
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("phash", T.LongType()),
    ])

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image_stub(bytes(payload))
                except ValueError:
                    rows.append((mid, None, None, None, None))
                    continue
                h, w = img.shape[:2]
                if resize_to:
                    ys = np.linspace(0, h - 1, resize_to[1]).astype(int)
                    xs = np.linspace(0, w - 1, resize_to[0]).astype(int)
                    small = img[np.ix_(ys, xs)]
                else:
                    small = img
                mean_rgb = small.reshape(-1, 3).mean(axis=0)
                gray = small.mean(axis=2)
                bits = (gray > gray.mean()).reshape(-1)[:64]
                phash_u = (int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
                           if bits.shape[0] == 64 else 0)
                phash = phash_u - (1 << 64) if phash_u >= (1 << 63) else phash_u
                rows.append((mid, int(w), int(h), mean_rgb.tolist(), phash))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


def frame_sample_plan(duration_ms_col: Column, every_ms: int = 1000) -> Column:
    """JVM-side frame-sampling plan: array of timestamps to decode. The
    decode stage then touches only these offsets."""
    return F.sequence(F.lit(0), duration_ms_col.cast("long"), F.lit(every_ms))


# deterministic fake video container: magic | w | h | duration_ms | seed
_FAKE_VMAGIC = b"FVID"


def pack_fake_video(width: int, height: int, duration_ms: int,
                    seed: int) -> bytes:
    """Deterministic stand-in video payload (tests + fixtures)."""
    return _FAKE_VMAGIC + struct.pack("<iiqq", width, height, duration_ms,
                                      seed)


def _le_int64(bin_col: Column, pos: int) -> Column:
    b = [F.conv(F.hex(F.substring(bin_col, pos + i, 1)), 16, 10).cast("long")
         for i in range(8)]
    out = b[0]
    for i in range(1, 8):
        out = out + b[i] * F.lit(1 << (8 * i)).cast("long")
    return out.cast("long")


def video_meta_col(payload_col: str | Column) -> Column:
    """Metadata struct for the fake video container — JVM byte ops only."""
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    header_ok = F.substring(c, 1, 4) == F.lit(_FAKE_VMAGIC)
    return F.struct(
        F.lit("video").alias("kind"),
        F.when(header_ok, F.lit("fake-v1")).otherwise(F.lit("unknown")).alias("codec"),
        F.when(header_ok, _le_int32(c, 5)).alias("width"),
        F.when(header_ok, _le_int32(c, 9)).alias("height"),
        F.when(header_ok, _le_int64(c, 13)).alias("duration_ms"),
        F.length(c).cast("long").alias("n_bytes"),
    )


def decode_frame_stub(payload: bytes, ts_ms: int) -> np.ndarray:
    """STUB frame decoder: deterministic fake pixels from (seed, ts_ms).

    A production build seeks the container to ``ts_ms`` and decodes one
    frame (e.g. via PyAV); signature and error contract are final."""
    if payload[:4] != _FAKE_VMAGIC:
        raise ValueError("unknown video codec")
    width, height, duration_ms, seed = struct.unpack_from("<iiqq", payload, 4)
    if not 0 <= ts_ms <= duration_ms:
        raise ValueError("timestamp beyond duration")
    rng = np.random.default_rng((seed << 20) ^ ts_ms)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "media_id",
                  every_ms: int = 1000) -> DataFrame:
    """Frame sampling end-to-end: one output row per sampled frame —
    ``(id, ts_ms, width, height, mean_luma)``.

    Scale shape: the timestamp plan is computed JVM-side
    (:func:`frame_sample_plan` over the header duration — no decode), and
    the video payload enters Python ONCE per video (the plan rides along as
    an array column; exploding timestamps before the decode stage would
    copy the payload once per frame row).  The decode stub touches only the
    planned offsets — exactly how a seek-based real decoder behaves."""
    out_schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ])
    meta = video_meta_col(payload_col)
    planned = df.select(
        id_col, payload_col,
        frame_sample_plan(meta["duration_ms"], every_ms).alias("__plan"))

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            rows = []
            for mid, payload, plan in zip(pdf[id_col], pdf[payload_col],
                                          pdf["__plan"]):
                if plan is None:  # bad header -> no duration -> skip video
                    continue
                payload = bytes(payload)
                for ts in plan:
                    try:
                        frame = decode_frame_stub(payload, int(ts))
                    except ValueError:
                        continue
                    h, w = frame.shape[:2]
                    rows.append((mid, int(ts), int(w), int(h),
                                 float(frame.mean())))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return planned.mapInPandas(run, out_schema)
