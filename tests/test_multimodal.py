"""Multimodal plumbing: binary columns through mapInPandas — schema,
fan-out shape, determinism, and the stubbed real-decode path."""

from __future__ import annotations

import hashlib

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


def test_real_decode_path_is_stubbed(spark, media):
    from dataengineeringproject_spark.multimodal import extract_image_features

    with pytest.raises(Exception, match="codec library"):
        extract_image_features(media, fake_decode=False).collect()
