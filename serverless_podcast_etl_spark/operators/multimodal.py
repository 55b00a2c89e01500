"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` stages.  Image decode uses REAL Pillow when the
library is importable (``default_image_decoder``); everything else —
and the no-Pillow fallback — is a clearly-marked deterministic STUB
(the image/audio libraries are not in this container).  The Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested on both paths.

Reference parity: the reference treats mp3 audio as opaque bytes and
chunks it at a fixed byte size (src/lambda_3.py:84-114); ``chunk_binary``
reproduces that as a JVM/Arrow pipeline stage.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata contract for multimodal assets.
ASSET_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("format", StringType()),  # jpeg | mp3 | mp4 | ...
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),  # images/video; null otherwise
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # audio/video; null otherwise
    ]
)


def with_asset_meta(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Attach the typed metadata struct (cheap fields computed JVM-side)."""
    return df.withColumn(
        "asset_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.octet_length(F.col(binary_col)).cast("long").alias("byte_len"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def chunk_binary(
    df: DataFrame,
    binary_col: str,
    chunk_bytes: int = 10_000_000,
    chunk_col: str = "chunk",
    num_col: str = "chunk_num",
) -> DataFrame:
    """Split a binary column into fixed-size chunks, one row per chunk.

    1-based ``chunk_num`` mirrors the reference's chunk_1..chunk_N
    naming (src/lambda_3.py:91-114).  JVM-side: sequence → transform →
    posexplode over ``substring`` slices; no Python in the loop.
    """
    total = F.octet_length(F.col(binary_col))
    n_chunks = F.ceil(total / F.lit(chunk_bytes)).cast("int")
    # sequence(0, -1) descends in Spark — empty payloads get no chunks
    pieces = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.col(binary_col).substr(
                i * chunk_bytes + 1, F.lit(chunk_bytes)
            ),
        ),
    ).otherwise(F.array().cast("array<binary>"))
    exploded = df.select(
        "*", F.posexplode(pieces).alias("_pos", chunk_col)
    )
    return exploded.withColumn(num_col, F.col("_pos") + 1).drop("_pos", binary_col)


# ---------------------------------------------------------------------------
# Decode / feature-extraction seams (STUBBED codecs, real plumbing)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("features", ArrayType(StringType())),
    ]
)


def _stub_decode_image(payload: bytes) -> tuple[int, int]:
    """STUB: a real implementation would call Pillow/libjpeg here.

    Deterministic fake so tests exercise the full Arrow round-trip:
    derives a plausible (width, height) from the payload bytes.
    """
    if not payload:
        raise ValueError("empty image payload")
    w = 64 + (payload[0] % 64)
    h = 64 + (payload[-1] % 64)
    return w, h


def _pillow_decode_image(payload: bytes) -> tuple[int, int]:
    """Real codec path: Pillow header decode → (width, height).

    ``Image.open`` is lazy — it parses only the header, so dimension
    extraction never decompresses pixel data (cheap even for large
    assets).  Raises if Pillow is absent; callers go through
    ``default_image_decoder`` which falls back to the stub.
    """
    import io

    from PIL import Image  # noqa: PLC0415  (worker-side lazy import)

    if not payload:
        raise ValueError("empty image payload")
    with Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height


def pillow_available() -> bool:
    try:
        import PIL  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def default_image_decoder() -> Callable[[bytes], tuple[int, int]]:
    """The real Pillow decoder when the library is importable, else the
    deterministic stub (this container ships without image libs — the
    selection is made once, driver-side, so the chosen path is explicit
    in the plan's serialized closure)."""
    return _pillow_decode_image if pillow_available() else _stub_decode_image


def decode_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    decode: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """Arrow-batched image decode via ``mapInPandas``.

    The codec is pluggable; the default is ``default_image_decoder()``
    — real Pillow header decode when the library is present, the
    deterministic stub otherwise.  Batch shape: one pandas DataFrame
    per Arrow batch, output rows aligned 1:1 with inputs.
    """
    decode_fn = decode or default_image_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs = [], []
            for payload in pdf[binary_col]:
                w, h = decode_fn(bytes(payload))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_pixels": pd.array(
                        [w * h for w, h in zip(ws, hs)], dtype="int64"
                    ),
                    "features": [[] for _ in ws],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    every_n_bytes: int = 1024,
    frame_bytes: int = 64,
) -> DataFrame:
    """Frame sampling stub: slice a pseudo-frame every N bytes.

    A real implementation would demux the container (ffmpeg) — STUBBED
    here; the 1→N row-explosion plumbing is the real contract.  Kept
    JVM-side (sequence + posexplode + substr), so the fan-out never
    touches Python.
    """
    total = F.octet_length(F.col(binary_col))
    n_frames = F.floor(total / F.lit(every_n_bytes)).cast("int")
    # sequence(0, -1) generates a DESCENDING range in Spark — guard
    # assets smaller than one frame stride with an explicit empty array
    frames = F.when(
        n_frames > 0,
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: F.col(binary_col).substr(
                i * every_n_bytes + 1, F.lit(frame_bytes)
            ),
        ),
    ).otherwise(F.array().cast("array<binary>"))
    return (
        df.select(F.col(id_col).alias("asset_id"), F.posexplode(frames).alias("frame_index", "frame"))
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_energy", StringType()),  # stub: hex digest stand-in
        StructField("n_samples", LongType()),
    ]
)


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    bytes_per_ms: int = 16,
) -> DataFrame:
    """Audio feature-extraction seam (STUB codec, real plumbing).

    A real implementation decodes mp3 frames (libmpg123/ffmpeg) and
    computes RMS/spectral features; the deterministic stand-in derives
    duration from byte length and a digest-based pseudo-energy so the
    Arrow batch shape and schema contract are fully exercised.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "duration_ms": pd.array(
                        [len(p) // bytes_per_ms for p in payloads], dtype="int64"
                    ),
                    "rms_energy": [
                        hashlib.md5(p).hexdigest()[:8] for p in payloads
                    ],
                    "n_samples": pd.array(
                        [len(p) // 2 for p in payloads], dtype="int64"
                    ),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Image resize seam (STUB codec, real plumbing).

    A real implementation decodes, resamples (Pillow), and re-encodes;
    the stand-in truncates/pads the payload to a deterministic size so
    the binary-in/binary-out Arrow contract is tested end-to-end.
    """
    target_len = target_w * target_h // 8  # deterministic stub size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(p)[:target_len].ljust(target_len, b"\0")
                for p in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "width": pd.array([target_w] * len(resized), dtype="int32"),
                    "height": pd.array([target_h] * len(resized), dtype="int32"),
                    "payload": resized,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        run,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("width", IntegerType()),
                StructField("height", IntegerType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
