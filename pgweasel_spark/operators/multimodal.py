"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

Codec-FREE formats have fully real decode kernels: binary PPM/PGM images
(``parse_pnm`` — numpy header+raster parse → pixel features /
nearest-neighbor resize) and PCM WAV audio (``parse_wav`` — stdlib wave →
sample features). Compressed formats (JPEG/PNG/mp3/video) require codec
libraries this container lacks, so their decode stays an honest
NotImplementedError beside a deterministic fake, while everything Spark —
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
        .when(F.substring(b, 1, 2).isin(F.lit(b"P5"), F.lit(b"P6")), "image")
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
    """The real-codec path for COMPRESSED formats (JPEG/PNG/mp3/video)
    — intentionally unimplemented here (no codec libraries in this
    container). Codec-free formats have real kernels: 'pnm' for binary
    PPM/PGM pixels, 'wav' for PCM audio samples."""
    raise NotImplementedError(
        "compressed-media decode requires codec libraries not present "
        "in this environment; use decoder='pnm' (real pixels), "
        "decoder='wav' (real PCM audio) or decoder='fake' (deterministic "
        "stand-in)"
    )


def decode_features(
    df: DataFrame, bin_col: str, id_col: str, decoder: str = "fake"
) -> DataFrame:
    """Arrow-batched decode → fixed-dim feature vector. The Spark plumbing
    (column pruning to (id, bytes), batch iteration, typed output schema)
    is the production shape; only the kernel is swapped. ``decoder``:
    'fake' (deterministic digest stand-in), 'pnm' (REAL pixel decode for
    binary PPM/PGM — numpy-only), 'wav' (REAL PCM audio decode —
    stdlib wave + numpy), anything else raises the honest real_decode
    stub."""
    if decoder == "fake":
        fn = _fake_decode
    elif decoder == "pnm":
        fn = pnm_decode
    elif decoder == "wav":
        fn = wav_decode
    else:
        fn = real_decode

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
    codecs; ``decoder='pnm'`` runs a REAL numpy nearest-neighbor resize
    on binary PPM/PGM payloads; swap in PIL for JPEG/PNG on a real
    cluster."""
    if decoder not in ("fake", "pnm"):
        real_decode(b"")  # raises NotImplementedError

    n_out = min(width * height, 4096)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for x in pdf[bin_col]:
                if decoder == "pnm":
                    out.append(pnm_resize(x, width, height))
                else:
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


# --- real decode path for codec-free formats (PNM: binary PPM/PGM) --------
#
# JPEG/PNG/audio/video genuinely need codec libraries this container lacks
# (real_decode above stays the honest stub), but the netpbm binary formats
# are plain header + raw samples — decodable with numpy alone. This gives
# the multimodal pipeline one fully REAL end-to-end path: sniff → parse →
# pixel features / nearest-neighbor resize, exercised on actual pixels.


def parse_pnm(payload: bytes):
    """Parse binary PPM (P6, RGB) / PGM (P5, gray) into a numpy
    (h, w, c) uint8 array. Header grammar per netpbm: magic, then three
    ASCII ints (width, height, maxval) separated by whitespace, with
    ``#`` comments allowed, then ONE whitespace byte before the raster.
    Only 8-bit (maxval <= 255) rasters are supported."""
    import numpy as np

    if not payload or payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    pos = 2
    tokens: list[int] = []
    n = len(payload)
    while len(tokens) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    w, h, maxval = tokens
    if w < 1 or h < 1 or maxval < 1:
        # a zero/negative dimension would otherwise surface as an opaque
        # numpy IndexError in pnm_resize / NaN means in pnm_decode
        raise ValueError("bad PNM dimensions")
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    c = 3 if payload[:2] == b"P6" else 1
    need = w * h * c
    if n - pos < need:
        raise ValueError("truncated PNM raster")
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, c)


def pnm_decode(payload: bytes) -> list[float]:
    """Real pixel-feature kernel (FEATURE_DIM floats): geometry, global
    intensity stats, and a 3x3 grid of mean intensities — all computed
    from decoded pixels, unit-scaled."""
    import numpy as np

    img = parse_pnm(payload)
    h, w, c = img.shape
    gray = img.mean(axis=2, dtype=np.float64)
    grid = []
    for i in range(3):
        for j in range(3):
            cell = gray[
                (i * h) // 3 : max((i + 1) * h // 3, (i * h) // 3 + 1),
                (j * w) // 3 : max((j + 1) * w // 3, (j * w) // 3 + 1),
            ]
            grid.append(float(cell.mean()) / 255.0)
    feats = [
        min(w, 4096) / 4096.0,
        min(h, 4096) / 4096.0,
        c / 3.0,
        float(gray.mean()) / 255.0,
        float(gray.std()) / 255.0,
        float(gray.min()) / 255.0,
        float(gray.max()) / 255.0,
        *grid,
    ]
    return [float(x) for x in feats[:FEATURE_DIM]]


# --- real decode path for codec-free audio (PCM WAV) ----------------------
#
# Compressed audio (mp3/aac/ogg) needs codec libs this container lacks,
# but PCM WAV is RIFF header + raw samples and the stdlib `wave` module
# parses it — a second fully REAL modality path: sniff → parse → sample
# features, exercised on actual audio samples.


def parse_wav(payload: bytes):
    """Parse 8/16-bit PCM WAV into (samples, framerate): samples is a
    float64 numpy array shaped (n_frames, channels) scaled to [-1, 1).
    Stdlib ``wave`` handles the RIFF/fmt/data chunking; compressed WAV
    (non-PCM) raises ``wave.Error`` — quarantine upstream, same policy
    as malformed PNM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload or b""), "rb") as wf:
        nch = wf.getnchannels()
        sw = wf.getsampwidth()
        fr = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if fr < 1 or nch < 1:
        raise ValueError("bad WAV geometry")
    if sw == 1:
        data = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise ValueError("only 8/16-bit PCM WAV supported")
    if data.size == 0:
        raise ValueError("empty WAV raster")
    return data[: (data.size // nch) * nch].reshape(-1, nch), fr


def wav_decode(payload: bytes) -> list[float]:
    """Real audio-feature kernel (FEATURE_DIM floats): duration, sample
    rate, channel count, RMS, peak, zero-crossing rate, and a
    10-segment RMS envelope — all computed from decoded PCM samples,
    unit-scaled."""
    import numpy as np

    samples, fr = parse_wav(payload)
    mono = samples.mean(axis=1)
    n = mono.size
    zcr = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / max(n - 1, 1)
    env = []
    for i in range(10):
        seg = mono[(i * n) // 10 : max((i + 1) * n // 10, (i * n) // 10 + 1)]
        env.append(float(np.sqrt(np.mean(seg * seg))))
    feats = [
        min(n / fr, 3600.0) / 3600.0,
        min(fr, 96000) / 96000.0,
        samples.shape[1] / 2.0,
        float(np.sqrt(np.mean(mono * mono))),
        float(np.abs(mono).max()),
        zcr,
        *env,
    ]
    return [float(x) for x in feats[:FEATURE_DIM]]


def pnm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize of a decoded PNM raster; returns raw
    interleaved bytes (h*w*c) — the tensor-shaped payload a training
    pipeline ships to the GPU host."""
    import numpy as np

    img = parse_pnm(payload)
    h, w, _ = img.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return img[yi][:, xi].tobytes()
