"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (north star, BASELINE.json). The Spark-side plumbing — schema,
Arrow batch shape, mapInPandas signatures, partitioning — is identical
for both decode paths:

- fake path (default for registered queries): features derived
  deterministically from the content digest, so tests and the DuckDB
  oracle can assert exact values;
- REAL path (`fake_decode=False`): stdlib-only decoders — a full PNG
  decode (zlib inflate + per-row defilter → true mean luma), BMP
  24/32-bit pixel decode, GIF header parse, and WAV PCM parse
  (sample rate / duration / true RMS). No codec libraries needed.
  Undecodable or unsupported content yields NULL feature columns
  instead of failing the job — at 100 TB one corrupt file must not
  kill the pipeline; count the nulls downstream and route to a
  dead-letter table.

Design: media rows are (id, media_type, content BINARY, meta MAP).
Feature extraction is a `mapInPandas` operator — per-partition Arrow
batches, no shuffle, output schema declared up front. At 100 TB the
binary column dominates I/O: keep media in its own table keyed by id,
join features back by id, and never `select *` across it.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_defilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray | None:
    """Reverse PNG scanline filters (types 0-4, spec §9). Returns the
    flat pixel bytes or None if the stream is malformed."""
    stride = width * bpp
    out = bytearray()
    pos = 0
    prev = bytearray(stride)
    for _ in range(height):
        if pos + 1 + stride > len(raw):
            return None
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            return None
        out += line
        prev = line
    return out


def _png_pixels(
    content: bytes,
) -> tuple[int, int, int | None, bytearray | None] | None:
    """Shared PNG pixel access: returns (width, height, channels, px)
    with px the defiltered raw pixel bytes, or (w, h, None, None) for
    an honest partial decode (palette/16-bit/interlaced/corrupt IDAT),
    or None when the content isn't a PNG at all."""
    if not content.startswith(_PNG_SIG) or len(content) < 33:
        return None
    # IHDR is always the first chunk: length(4) type(4) data(13) crc(4)
    if content[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", content[16:24])
    bit_depth, color_type, _comp, _filt, interlace = content[24:29]
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        return None
    if bit_depth != 8 or color_type == 3 or interlace != 0:
        return width, height, None, None  # dims only; needs full decode
    # walk chunks, concatenating IDAT
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(content):
        (clen,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += content[pos + 8 : pos + 8 + clen]
        if ctype == b"IEND":
            break
        pos += 12 + clen
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return width, height, None, None
    px = _png_defilter(raw, width, height, channels)
    if px is None:
        return width, height, None, None
    return width, height, channels, px


def _px_luma(px: bytearray, i: int, channels: int) -> float:
    """Rec.601 luma (0..255) of pixel index i in defiltered bytes."""
    j = i * channels
    if channels >= 3:
        return 0.299 * px[j] + 0.587 * px[j + 1] + 0.114 * px[j + 2]
    return float(px[j])


def _decode_png(content: bytes) -> tuple[int, int, float | None] | None:
    """Full stdlib PNG decode for 8-bit greyscale/RGB/RGBA/grey+alpha,
    non-interlaced: IHDR for dimensions, concatenated IDAT inflated
    with zlib, scanlines defiltered, mean luma = mean over pixels of
    Rec.601 (0.299R + 0.587G + 0.114B) / 255. Palette/16-bit/interlaced
    images return dimensions with NULL luma (honest partial decode)."""
    got = _png_pixels(content)
    if got is None:
        return None
    width, height, channels, px = got
    if px is None:
        return width, height, None
    n = width * height
    luma = sum(_px_luma(px, i, channels) for i in range(n)) / n / 255.0
    return width, height, round(luma, 6)


def _decode_bmp(content: bytes) -> tuple[int, int, float | None] | None:
    """BMP (BITMAPINFOHEADER) decode: dimensions always; true mean luma
    for uncompressed 24/32-bit images (rows bottom-up, 4-byte padded,
    pixels stored BGR)."""
    if not content.startswith(b"BM") or len(content) < 54:
        return None
    (data_off,) = struct.unpack("<I", content[10:14])
    width, height_raw = struct.unpack("<ii", content[18:26])
    (bpp,) = struct.unpack("<H", content[28:30])
    (compression,) = struct.unpack("<I", content[30:34])
    height = abs(height_raw)
    if width <= 0 or height == 0 or width * height > 64_000_000:
        return None
    if bpp not in (24, 32) or compression != 0:
        return width, height, None
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3
    if data_off + stride * height > len(content):
        return width, height, None
    total = 0.0
    for row in range(height):
        base = data_off + row * stride
        for col in range(width):
            i = base + col * nbytes
            b, g, r = content[i], content[i + 1], content[i + 2]
            total += 0.299 * r + 0.587 * g + 0.114 * b
    return width, height, round(total / (width * height) / 255.0, 6)


def _decode_gif(content: bytes) -> tuple[int, int, float | None] | None:
    """GIF87a/89a logical-screen header: dimensions only (pixel data is
    LZW-compressed; luma stays NULL without an LZW decoder)."""
    if content[:6] not in (b"GIF87a", b"GIF89a") or len(content) < 10:
        return None
    width, height = struct.unpack("<HH", content[6:10])
    if width == 0 or height == 0:
        return None
    return width, height, None


def _decode_image_real(content: bytes) -> tuple[int | None, int | None, float | None]:
    """Real decode path, stdlib only: PNG (full decode incl. mean luma),
    BMP (24/32-bit luma), GIF (header dims). Unknown/corrupt content →
    all-NULL features rather than an exception, so one bad file can't
    fail a 100 TB job."""
    for dec in (_decode_png, _decode_bmp, _decode_gif):
        try:
            got = dec(content)
        except (struct.error, IndexError, ValueError):
            got = None
        if got is not None:
            return got
    return None, None, None


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
    (IMAGE_FEATURES_SCHEMA) regardless of decoder. n_bytes/digest are
    computed vectorized over the content series; only the decode itself
    is per-item (inherently so)."""
    decode = _decode_image_fake if fake_decode else _decode_image_real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"].map(lambda c: bytes(c) if c is not None else b"")
            decoded = content.map(decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len),
                    "digest": content.map(lambda c: hashlib.md5(c).hexdigest()),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "mean_luma": decoded.map(lambda t: t[2]),
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        op, schema=IMAGE_FEATURES_SCHEMA
    )


_AHASH_BITS = 60  # repo-wide Hamming-signature width (matches hex15_to_long)


def image_ahash_real(content: bytes) -> int | None:
    """Average-hash (aHash) of a decodable PNG: 8×8 block-mean luma
    grid, one bit per block (1 = block ≥ grid mean), packed row-major
    into the repo's 60-bit signature convention (the last 4 of the 64
    blocks are dropped so the hash shares simhash's bit width and the
    banded near-dup machinery). Visually similar images differ in few
    bits; None for undecodable or sub-8×8 content."""
    got = _png_pixels(content)
    if got is None or got[3] is None:
        return None
    width, height, channels, px = got
    if width < 8 or height < 8:
        return None
    means = []
    for by in range(8):
        y0, y1 = by * height // 8, (by + 1) * height // 8
        for bx in range(8):
            x0, x1 = bx * width // 8, (bx + 1) * width // 8
            total, cnt = 0.0, 0
            for y in range(y0, y1):
                base = y * width
                for x in range(x0, x1):
                    total += _px_luma(px, base + x, channels)
                    cnt += 1
            means.append(total / cnt)
    grid_mean = sum(means) / 64
    sig = 0
    for bit, m in enumerate(means[:_AHASH_BITS]):
        if m >= grid_mean:
            sig |= 1 << bit
    return sig


def image_ahash_fake(content: bytes) -> int:
    """Deterministic fake aHash: 60-bit integer from the md5 hex of the
    content (first 15 hex chars — the same hex15_to_long convention as
    functions/text.py, so a SQL oracle reproduces it exactly)."""
    hx = hashlib.md5(content or b"").hexdigest()
    return int(hx[:15], 16)


IMAGE_AHASH_SCHEMA = "media_id long, ahash long"


def extract_image_ahash(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Per-image perceptual hash over the binary column (mapInPandas,
    Arrow-batched, no shuffle) — the front half of image near-dup
    detection; feed the result to operators.dedup.signature_neardup
    for the banded Hamming pair join."""
    ahash = image_ahash_fake if fake_decode else image_ahash_real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"].map(
                lambda c: bytes(c) if c is not None else b""
            )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "ahash": content.map(ahash)}
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        op, schema=IMAGE_AHASH_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, digest string, "
    "duration_s int, sample_rate int, rms double"
)


def _decode_wav_real(
    content: bytes,
) -> tuple[int | None, int | None, float | None]:
    """RIFF/WAVE parse, stdlib only: walks the chunk list for `fmt ` and
    `data`; duration = frames / sample_rate; RMS (normalized to [0, 1])
    computed over the raw samples for 8- and 16-bit PCM. Non-PCM or
    malformed content → all-NULL features."""
    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None, None, None
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None, None, None
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format != 1 or n_channels == 0 or sample_rate == 0:
        return None, None, None
    if bits == 16:
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[: n * 2])
        scale = 32768.0
    elif bits == 8:
        samples = tuple(b - 128 for b in data)
        scale = 128.0
    else:
        return None, None, None
    frames = len(samples) // n_channels
    duration_s = int(round(frames / sample_rate))
    if not samples:
        return duration_s, sample_rate, None
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / scale
    return duration_s, sample_rate, round(rms, 6)


def _decode_audio_fake(content: bytes) -> tuple[int, int, float]:
    d = hashlib.md5(content).digest()
    return 1 + d[4] % 120, 8000 * (1 + d[5] % 5), round(d[6] / 255.0, 6)


def extract_audio_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Audio feature extraction over the binary column (duration,
    sample rate, RMS loudness) via mapInPandas — same plumbing contract
    as images. Real path parses RIFF/WAVE PCM with the stdlib; fake
    path derives md5-deterministic values for oracle checks."""
    decode = _decode_audio_fake if fake_decode else _decode_wav_real

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"].map(lambda c: bytes(c) if c is not None else b"")
            decoded = content.map(decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len),
                    "digest": content.map(lambda c: hashlib.md5(c).hexdigest()),
                    "duration_s": decoded.map(lambda t: t[0]),
                    "sample_rate": decoded.map(lambda t: t[1]),
                    "rms": decoded.map(lambda t: t[2]),
                }
            )

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        op, schema=AUDIO_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_digest string"


def _gif_frames(content: bytes) -> list[bytes] | None:
    """Demux an (animated) GIF into its per-frame byte segments by
    walking the block structure (GIF89a spec): logical screen
    descriptor (+ optional global color table), then extension blocks
    (0x21, length-prefixed sub-blocks), image descriptors (0x2C, with
    optional local color table + LZW sub-blocks), trailer (0x3B).
    Pure structure walk — no pixel decode needed for frame sampling.
    Returns None for non-GIF or malformed content."""
    if len(content) < 13 or content[:3] != b"GIF":
        return None
    flags = content[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 bytes × 2^(n+1) entries
        pos += 3 * (2 << (flags & 0x07))
    frames: list[bytes] = []
    try:
        while pos < len(content):
            b0 = content[pos]
            if b0 == 0x3B:  # trailer
                return frames
            if b0 == 0x21:  # extension: introducer + label + sub-blocks
                pos += 2
                while content[pos] != 0:
                    pos += content[pos] + 1
                pos += 1
            elif b0 == 0x2C:  # image descriptor = one frame
                start = pos
                lflags = content[pos + 9]
                pos += 10
                if lflags & 0x80:  # local color table
                    pos += 3 * (2 << (lflags & 0x07))
                pos += 1  # LZW minimum code size
                while content[pos] != 0:
                    pos += content[pos] + 1
                pos += 1
                frames.append(content[start:pos])
            else:
                return None
    except IndexError:
        return None
    return frames if frames else None  # missing trailer: salvage frames


def sample_video_frames(
    media: DataFrame, every_n: int = 10, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled frame
    (1:N mapInPandas fan-out — the batch shape video pipelines need).
    Fake path (registered-query default): frame count/digests derived
    deterministically from the content digest so the oracle can check
    exact values. REAL path (`fake_decode=False`): animated-GIF demux —
    the one video container fully parseable with the stdlib — emitting
    every_n-th frame's segment digest via the identical fan-out; rows
    whose content isn't a parseable GIF yield no frames (count the
    drop-outs upstream and dead-letter them — one corrupt file must
    not kill a 100 TB job). MP4/MKV demux genuinely needs ffmpeg-class
    libraries not present here and stays out of scope."""

    def op_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for media_id, c in zip(pdf["media_id"], pdf["content"]):
                frames = _gif_frames(bytes(c) if c is not None else b"")
                if frames is None:
                    continue
                for idx in range(0, len(frames), every_n):
                    ids.append(media_id)
                    idxs.append(idx)
                    digs.append(hashlib.md5(frames[idx]).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_digest": digs}
            )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for media_id, c in zip(pdf["media_id"], pdf["content"]):
                content = bytes(c) if c is not None else b""
                n_frames = 30 + hashlib.md5(content).digest()[3] % 270
                for idx in range(0, n_frames, every_n):
                    ids.append(media_id)
                    idxs.append(idx)
                    digs.append(
                        hashlib.md5(content + idx.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_digest": digs}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        op if fake_decode else op_real, schema=FRAME_SAMPLE_SCHEMA
    )
