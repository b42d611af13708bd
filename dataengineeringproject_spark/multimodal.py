"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (north star, BASELINE.json). The Spark-side plumbing — schema,
Arrow batch shape, mapInPandas signatures, partitioning — is real and
tested; the actual codec calls are STUBBED because no image/audio
libraries exist in this environment (see `_decode_image_real`).

Design: media rows are (id, media_type, content BINARY, meta MAP).
Feature extraction is a `mapInPandas` operator — per-partition Arrow
batches, no shuffle, output schema declared up front. At 100 TB the
binary column dominates I/O: keep media in its own table keyed by id,
join features back by id, and never `select *` across it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, digest string, "
    "width int, height int, mean_luma double"
)


def _decode_image_real(content: bytes) -> tuple[int, int, float]:
    """Real decode path — requires an image codec library (e.g. Pillow),
    which is NOT available in this environment. The deterministic fake
    below exercises the identical plumbing."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "environment; use fake_decode=True (deterministic fake) or "
        "install a decoder and wire it here"
    )


def _decode_image_fake(content: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: derives (width, height, mean_luma)
    from the content digest. Stable across runs/engines so tests and
    oracles can assert on it."""
    d = hashlib.md5(content or b"").digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    mean_luma = round(d[2] / 255.0, 6)
    return width, height, mean_luma


def extract_image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Batch feature extraction over the binary column via mapInPandas:
    Arrow-batched, per-partition, no shuffle. Output schema is fixed
    (IMAGE_FEATURES_SCHEMA) regardless of decoder."""
    decode = _decode_image_fake if fake_decode else _decode_image_real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = r["content"] if r["content"] is not None else b""
                w, h, luma = decode(bytes(content))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "media_type": r["media_type"],
                        "n_bytes": len(content),
                        "digest": hashlib.md5(bytes(content)).hexdigest(),
                        "width": w,
                        "height": h,
                        "mean_luma": luma,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "image").mapInPandas(
        op, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, digest string, "
    "duration_s int, sample_rate int, rms double"
)


def extract_audio_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Audio feature extraction over the binary column (duration,
    sample rate, RMS loudness) via mapInPandas — same plumbing contract
    as images; the decode is the deterministic md5-derived stub (a real
    build wires soundfile/ffmpeg here)."""
    if not fake_decode:
        raise NotImplementedError("audio decoding requires codec libraries")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                d = hashlib.md5(content).digest()
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(content),
                        "digest": hashlib.md5(content).hexdigest(),
                        "duration_s": 1 + d[4] % 120,
                        "sample_rate": 8000 * (1 + d[5] % 5),
                        "rms": round(d[6] / 255.0, 6),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_bytes", "digest",
                    "duration_s", "sample_rate", "rms",
                ],
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        op, schema=AUDIO_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_digest string"


def sample_video_frames(
    media: DataFrame, every_n: int = 10, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled frame
    (1:N mapInPandas fan-out — the batch shape video pipelines need).
    Frame count/digests are derived deterministically from content in
    the fake path; a real decoder would demux actual frames."""
    if not fake_decode:
        raise NotImplementedError("video demuxing requires codec libraries")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                n_frames = 30 + hashlib.md5(content).digest()[3] % 270
                for idx in range(0, n_frames, every_n):
                    out.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": idx,
                            "frame_digest": hashlib.md5(
                                content + idx.to_bytes(4, "big")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_digest"])

    return media.filter(F.col("media_type") == "video").mapInPandas(
        op, schema=FRAME_SAMPLE_SCHEMA
    )
