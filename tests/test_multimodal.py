"""Multimodal plumbing: binary columns through mapInPandas — schema,
fan-out shape, determinism — plus the REAL stdlib decode paths (PNG
zlib+defilter, BMP pixel decode, GIF header, WAV PCM), exercised on
hand-constructed fixture bytes (no codec libraries in this env)."""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import pytest


@pytest.fixture(scope="module")
def media(spark):
    from dataengineeringproject_spark.multimodal import MEDIA_SCHEMA

    rows = [
        (1, "image", b"\x89PNG fake bytes 1", {"src": "a"}),
        (2, "image", b"\x89PNG fake bytes 22", {"src": "b"}),
        (3, "video", b"\x00\x00ftyp fake", None),
        (4, "audio", b"RIFF fake", None),
        (5, "image", None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


def test_image_features_schema_and_determinism(spark, media):
    from dataengineeringproject_spark.multimodal import extract_image_features

    feats = extract_image_features(media)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,n_bytes:bigint,"
        "digest:string,width:int,height:int,mean_luma:double>"
    )
    rows = {r.media_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 5}  # images only, null content included
    assert rows[1].digest == hashlib.md5(b"\x89PNG fake bytes 1").hexdigest()
    assert rows[5].n_bytes == 0
    # deterministic fake: same input → same features on re-run
    again = {r.media_id: r for r in extract_image_features(media).collect()}
    assert rows == again


def test_video_frame_sampling_fanout(spark, media):
    from dataengineeringproject_spark.multimodal import sample_video_frames

    frames = sample_video_frames(media, every_n=10)
    got = frames.collect()
    assert all(r.media_id == 3 for r in got)
    assert [r.frame_idx for r in got] == sorted(r.frame_idx for r in got)
    assert all(r.frame_idx % 10 == 0 for r in got)
    assert len(got) >= 3  # ≥30 fake frames / 10


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png_rgb(rows: list[list[tuple[int, int, int]]], filters: list[int] | None = None) -> bytes:
    """Minimal valid 8-bit RGB PNG. `filters` picks the per-row filter
    type (0=None, 2=Up) — the raw bytes are pre-filtered accordingly so
    the decoder's defilter has real work to do."""
    h, w = len(rows), len(rows[0])
    filters = filters or [0] * h
    raw = bytearray()
    prev = [0] * (w * 3)
    for r, ftype in zip(rows, filters):
        flat = [v for px in r for v in px]
        raw.append(ftype)
        if ftype == 0:
            raw += bytes(flat)
        elif ftype == 2:  # Up: store actual - above
            raw += bytes((flat[i] - prev[i]) & 0xFF for i in range(len(flat)))
        else:
            raise ValueError(ftype)
        prev = flat
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _bmp_24(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Minimal 24-bit uncompressed BMP (bottom-up rows, BGR, 4-byte
    row padding)."""
    h, w = len(rows), len(rows[0])
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for r in reversed(rows):  # bottom-up storage
        line = bytearray()
        for red, g, b in r:
            line += bytes((b, g, red))
        line += b"\x00" * (stride - len(line))
        px += line
    header = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    return header + info + bytes(px)


def _luma(rows: list[list[tuple[int, int, int]]]) -> float:
    vals = [0.299 * r + 0.587 * g + 0.114 * b for row in rows for r, g, b in row]
    return round(sum(vals) / len(vals) / 255.0, 6)


_PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (200, 100, 50), (0, 0, 0)],
]


def test_real_png_decode_exact_luma():
    from dataengineeringproject_spark.multimodal import _decode_image_real

    png = _png_rgb(_PIXELS, filters=[0, 2])  # exercise the Up defilter
    assert _decode_image_real(png) == (3, 2, _luma(_PIXELS))


def test_real_bmp_decode_exact_luma():
    from dataengineeringproject_spark.multimodal import _decode_image_real

    assert _decode_image_real(_bmp_24(_PIXELS)) == (3, 2, _luma(_PIXELS))


def test_real_gif_decode_dims_only():
    from dataengineeringproject_spark.multimodal import _decode_image_real

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    assert _decode_image_real(gif) == (320, 200, None)


def test_real_decode_garbage_yields_nulls_not_crash():
    from dataengineeringproject_spark.multimodal import _decode_image_real

    assert _decode_image_real(b"") == (None, None, None)
    assert _decode_image_real(b"\x89PNG\r\n\x1a\nJUNK") == (None, None, None)
    assert _decode_image_real(b"BM" + b"\x01" * 60) == (None, None, None)


def test_real_wav_decode_exact():
    from dataengineeringproject_spark.multimodal import _decode_wav_real

    samples = [0, 16384, -16384, 32767, -32768, 0, 8192, -8192]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8)  # 8 frames at 8 Hz → 1 s
        w.writeframes(struct.pack("<8h", *samples))
    duration_s, sample_rate, rms = _decode_wav_real(buf.getvalue())
    want_rms = round((sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0, 6)
    assert (duration_s, sample_rate, rms) == (1, 8, want_rms)
    # non-PCM / garbage → nulls
    assert _decode_wav_real(b"RIFF fake") == (None, None, None)


def test_real_decode_through_spark_operator(spark):
    """The real path end-to-end through mapInPandas: decodable rows get
    true features, undecodable rows get NULL features, nobody crashes —
    the 100 TB corrupt-file contract."""
    from dataengineeringproject_spark.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        extract_image_features,
    )

    png = _png_rgb(_PIXELS)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<4h", 100, -100, 200, -200))
    rows = [
        (1, "image", png, None),
        (2, "image", b"not an image at all", None),
        (3, "audio", buf.getvalue(), None),
        (4, "audio", b"static noise", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)

    img = {r.media_id: r for r in extract_image_features(media, fake_decode=False).collect()}
    assert (img[1].width, img[1].height, img[1].mean_luma) == (3, 2, _luma(_PIXELS))
    assert (img[2].width, img[2].height, img[2].mean_luma) == (None, None, None)
    assert img[2].digest == hashlib.md5(b"not an image at all").hexdigest()

    aud = {r.media_id: r for r in extract_audio_features(media, fake_decode=False).collect()}
    assert aud[3].sample_rate == 16000
    assert aud[3].rms is not None and aud[3].rms > 0
    assert (aud[4].duration_s, aud[4].sample_rate, aud[4].rms) == (None, None, None)


def _animated_gif(n_frames: int, w: int = 2, h: int = 2) -> bytes:
    """Hand-construct a minimal animated GIF89a: header + logical screen
    descriptor (no global color table), then per frame a graphic-control
    extension and an image descriptor with a 2-entry local color table
    and one opaque LZW data sub-block, then the trailer."""
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", w, h, 0x00, 0, 0)
    for i in range(n_frames):
        # graphic control extension (introducer, label, block size 4,
        # flags, delay, transparent index, terminator)
        out += bytes([0x21, 0xF9, 4, 0, 10, 0, 0, 0])
        # image descriptor: separator, left, top, w, h, flags(LCT, 2 entries)
        out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, 0x80)
        out += bytes([i, i, i, 255 - i, 255 - i, 255 - i])  # 2-entry LCT
        out += bytes([2])  # LZW minimum code size
        out += bytes([3, 0x44, 0x55 + i, 0x66])  # one data sub-block
        out += bytes([0])  # block terminator
    out += bytes([0x3B])
    return bytes(out)


def test_video_real_gif_demux(spark):
    """The real video path: animated-GIF frame demux via the stdlib
    structure walk — exact frame count, per-frame segment digests, and
    non-GIF content dropping out with no rows (not an error)."""
    from dataengineeringproject_spark.multimodal import (
        MEDIA_SCHEMA,
        _gif_frames,
        sample_video_frames,
    )

    gif3 = _animated_gif(3)
    gif7 = _animated_gif(7)
    # pure-python demux agrees with the construction
    segs = _gif_frames(gif3)
    assert segs is not None and len(segs) == 3
    assert all(s[0] == 0x2C for s in segs)
    assert _gif_frames(b"\x00\x00ftyp not a gif") is None

    rows = [
        (1, "video", gif3, None),
        (2, "video", gif7, None),
        (3, "video", b"\x00\x00ftyp fake mp4", None),  # undecodable: no rows
        (4, "image", gif3, None),  # wrong media_type: filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)
    out = sample_video_frames(media, every_n=2, fake_decode=False).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {1, 2}
    assert sorted(r.frame_idx for r in by_id[1]) == [0, 2]
    assert sorted(r.frame_idx for r in by_id[2]) == [0, 2, 4, 6]
    # digests are of the exact frame segments
    assert by_id[1][0].frame_digest in {
        hashlib.md5(s).hexdigest() for s in segs
    }


def test_real_ahash_similar_vs_different():
    """aHash: a 1-block perturbation of an image lands within a few
    bits; an inverted image lands far away; structure is preserved
    (left-dark/right-bright halves → left bits 0, right bits 1)."""
    from dataengineeringproject_spark.multimodal import image_ahash_real

    def img(perturb=False, invert=False):
        rows = []
        for y in range(16):
            row = []
            for x in range(16):
                v = 40 if x < 8 else 215  # dark left, bright right
                if invert:
                    v = 255 - v
                row.append((v, v, v))
            rows.append(row)
        if perturb:  # brighten ONE 2x2 block region on the dark side
            for y in (0, 1):
                for x in (0, 1):
                    rows[y][x] = (250, 250, 250)
        return _png_rgb(rows)

    a = image_ahash_real(img())
    b = image_ahash_real(img(perturb=True))
    c = image_ahash_real(img(invert=True))
    assert a is not None and b is not None and c is not None
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab <= 3, f"perturbed image drifted {ham_ab} bits"
    assert ham_ac >= 40, f"inverted image only {ham_ac} bits away"
    # structural check: row-major 8x8 grid, left half below mean
    for bit in range(60):
        expected = 0 if (bit % 8) < 4 else 1
        assert (a >> bit) & 1 == expected


def test_real_ahash_undecodable_is_none():
    from dataengineeringproject_spark.multimodal import image_ahash_real

    assert image_ahash_real(b"not a png") is None
    assert image_ahash_real(_png_rgb([[(9, 9, 9)] * 4] * 4)) is None  # < 8x8


def test_ahash_neardup_end_to_end_real_decode(spark):
    """Real-decode aHash through the Spark operator + banded Hamming
    join: three visually-near variants of one image cluster together;
    an unrelated image stays unpaired."""
    import pandas as pd

    from dataengineeringproject_spark import multimodal as M
    from dataengineeringproject_spark.operators.dedup import signature_neardup
    from dataengineeringproject_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)

    def gradient(seed_shift):
        rows = []
        for y in range(16):
            row = []
            for x in range(16):
                v = min(255, 16 * x + seed_shift)
                row.append((v, v, v))
            rows.append(row)
        return _png_rgb(rows)

    def noise(k):
        rows = []
        for y in range(16):
            row = []
            for x in range(16):
                v = (x * 37 + y * 101 + k) % 256
                row.append((v, v, v))
            rows.append(row)
        return rows and _png_rgb(rows)

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3, 99],
            "media_type": ["image"] * 4,
            "content": [gradient(0), gradient(2), gradient(4), noise(7)],
        }
    )
    media = spark.createDataFrame(pdf)
    sig = M.extract_image_ahash(media, fake_decode=False)
    pairs = signature_neardup(
        sig, "media_id", "ahash", bits=60, chunks=4, max_hamming=3
    ).toPandas()
    got = {tuple(sorted(p)) for p in pairs[["id_a", "id_b"]].values.tolist()}
    assert {(1, 2), (2, 3), (1, 3)} <= got
    assert not any(99 in p for p in got)
