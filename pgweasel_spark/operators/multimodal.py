"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/feature-extract kernels require codec libraries that are not in
this container, so the *decode step* is stubbed behind a deterministic fake
(or NotImplementedError for the real-codec path), while everything Spark —
schema, Arrow batch shape, mapInPandas partitioning, metadata extraction —
is real and tested (tests/test_textops.py).

At scale: binary payloads ride in their own column so Parquet column
pruning skips them unless a stage touches them; the decode stage is
``mapInPandas`` (Arrow batches of bytes → feature rows), sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of images fits
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("magic", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": ("jpeg", "image"),
    b"\x89PNG": ("png", "image"),
    b"RIFF": ("riff", "audio"),
    b"\x00\x00\x00": ("mp4ish", "video"),
}


def media_metadata(df: DataFrame, bin_col: str, id_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — pure JVM expressions
    (no decode): byte length, digest, magic-byte sniff."""
    b = F.col(bin_col)
    magic = F.hex(F.substring(b, 1, 4))
    kind = (
        F.when(F.substring(b, 1, 3) == F.lit(b"\xff\xd8\xff"), "image")
        .when(F.substring(b, 1, 4) == F.lit(b"\x89PNG"), "image")
        .when(F.substring(b, 1, 4) == F.lit(b"RIFF"), "audio")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("digest"),
        magic.alias("magic"),
        kind.alias("kind"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for the codec: digest bytes → unit floats.
    Replace with PIL/ffmpeg decode on a cluster with media libs."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def real_decode(payload: bytes) -> list[float]:
    """The real-codec path — intentionally unimplemented here (no image/
    audio libraries in this container)."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; use decode_features(..., decoder='fake') for the "
        "deterministic stand-in"
    )


def decode_features(
    df: DataFrame, bin_col: str, id_col: str, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched decode → fixed-dim feature vector. The Spark plumbing
    (column pruning to (id, bytes), batch iteration, typed output schema)
    is the production shape; only the kernel is swapped."""
    fn = _fake_decode if decoder == "fake" else real_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "feature": [fn(x) for x in pdf[bin_col]],
                    "decoder": decoder,
                }
            )

    slim = df.select(F.col(id_col), F.col(bin_col))
    return slim.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), False),
    ]
)


def resize_image(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    width: int = 224,
    height: int = 224,
    decoder: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize. The fake kernel emits a deterministic
    payload (digest-seeded, sized width*height bytes capped at 4 KiB) so
    the 1-row→1-row binary-out plumbing — pruned (id, bytes) input, typed
    binary output column, batch sizing — is fully exercised without
    codecs; swap the kernel for PIL on a real cluster."""
    if decoder != "fake":
        real_decode(b"")  # raises NotImplementedError

    n_out = min(width * height, 4096)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for x in pdf[bin_col]:
                h = hashlib.sha256(x or b"").digest()
                out.append((h * (n_out // len(h) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    n_frames: int = 4,
    frame_interval_ms: int = 1000,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling: one input row → n_frames output rows (the
    cardinality-changing mapInPandas shape). The fake kernel derives each
    frame deterministically from (payload digest, frame_no); a real
    cluster swaps in an ffmpeg seek+decode at ts_ms."""
    if decoder != "fake":
        real_decode(b"")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, tss, frames = [], [], [], []
            for mid, x in zip(pdf[id_col], pdf[bin_col]):
                base = hashlib.sha256(x or b"").digest()
                for j in range(n_frames):
                    ids.append(int(mid))
                    nos.append(j)
                    tss.append(j * frame_interval_ms)
                    frames.append(
                        hashlib.sha256(base + j.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        batches, schema=FRAME_SCHEMA
    )
