"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio codecs, so the *decode kernels* are
stubbed (clearly-marked deterministic fakes / NotImplementedError), while
everything Spark-side — schema, batch shape, Arrow transfer, partitioning —
is real and tested. Swapping in PIL/torchaudio/ffmpeg touches only the
`_decode_*_kernel` functions.

Design rules for 100 TB media:
* media stays an opaque `binary` column with typed metadata alongside
  (media_type, width, height, duration_s, sample_rate) — decode late,
  decode once, never collect;
* per-batch processing via mapInPandas so one Arrow batch = one python
  call (batch size bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  to cap executor memory per media batch);
* derived features (embeddings, thumbnails, frames) are new columns /
  exploded rows, not driver-side objects.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

_FAKE_MODE = True  # flip to False when real codecs are installed


def _decode_image_kernel(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: real impl = PIL.Image.open(BytesIO(payload)). The fake is a
    deterministic arithmetic pixel field derived from the payload length
    and dimensions — chosen over an RNG so the whole decode->pool path has
    an exact SQL twin (the `multimodal_features` DuckDB oracle replays
    pixel = (seed + 31r + 7c + 13ch) mod 256 and the band means)."""
    if not _FAKE_MODE:
        raise NotImplementedError("install PIL and decode payload here")
    h, w = (height or 4), (width or 4)
    seed = (len(payload) * 2654435761 + w * 97 + h * 31) % 2147483647
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    return ((seed + 31 * r + 7 * c + 13 * ch) % 256).astype(np.uint8)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_dim: int = 8,
) -> DataFrame:
    """Decode -> pooled feature vector, batched via mapInPandas.

    Output schema: input columns (minus payload, which is pruned as early
    as possible) + feature array<float>."""
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        out_fields + [T.StructField("feature", T.ArrayType(T.FloatType()))]
    )
    names = [f.name for f in out_fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(
                pdf[payload_col], pdf.get("width"), pdf.get("height")
            ):
                if payload is None:
                    feats.append(None)
                    continue
                img = _decode_image_kernel(bytes(payload), int(w or 0), int(h or 0))
                # mean-pool rows into out_dim horizontal bands (stand-in for
                # a real embedding model; deterministic). Integer sums are
                # exact in float64 regardless of summation order, so the
                # band mean is bit-identical to the SQL oracle's
                # sum/count/255 before the float32 narrowing.
                bands = np.array_split(img, out_dim, axis=0)
                feats.append(
                    np.array(
                        [float(b.mean(dtype=np.float64)) / 255.0 for b in bands],
                        dtype=np.float32,
                    )
                )
            out = pdf[names].copy()
            out["feature"] = feats
            yield out

    return df.mapInPandas(gen, schema=schema)


def frame_sample(
    df: DataFrame,
    every_s: float = 1.0,
    payload_col: str = "payload",
    duration_col: str = "duration_s",
) -> DataFrame:
    """Video -> one row per sampled frame timestamp (explode is JVM-side;
    actual frame decode is the stubbed kernel's job downstream)."""
    n_frames = F.greatest(
        (F.col(duration_col) / F.lit(float(every_s))).cast("int"), F.lit(1)
    )
    ts = F.transform(
        F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(float(every_s))
    )
    return df.withColumn("frame_ts", F.explode(ts))


def resize_spec(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Compute target (width, height) preserving aspect ratio — pure expr;
    the actual resample happens in the decode kernel."""
    scale = F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height"))
    clamped = F.least(scale, F.lit(1.0))
    return df.withColumn(
        "target_width", F.ceil(F.col("width") * clamped).cast("int")
    ).withColumn("target_height", F.ceil(F.col("height") * clamped).cast("int"))


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                mt = ("image", "audio", "video")[int(i) % 3]
                rows.append(
                    {
                        "media_id": int(i),
                        "media_type": mt,
                        "payload": rng.bytes(64),
                        "width": int(rng.integers(16, 64)) if mt != "audio" else None,
                        "height": int(rng.integers(16, 64)) if mt != "audio" else None,
                        "duration_s": float(rng.uniform(1, 10)) if mt != "image" else None,
                        "sample_rate": 16000 if mt == "audio" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=max(4, n // 10_000)).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )
