"""Tests for the as-of join operator and the multimodal column plumbing."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from scikit_learn_imputer_spark.operators.asof import asof_join
from scikit_learn_imputer_spark.sources.multimodal import (
    extract_media_features,
    filter_by_meta,
    synthetic_media_df,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left_schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("k", StringType(), False),
            StructField("t", TimestampType(), False),
        ]
    )
    right_schema = StructType(
        [
            StructField("k", StringType(), False),
            StructField("rt", TimestampType(), False),
            StructField("v", LongType(), False),
        ]
    )
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00")),
            (2, "a", _ts("2024-01-01T12:00:00")),
            (3, "a", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "b", _ts("2024-01-01T11:00:00")),
            (5, "c", _ts("2024-01-01T11:00:00")),  # key with no right rows
        ],
        left_schema,
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 10),  # equal ts → inclusive match
            ("a", _ts("2024-01-01T11:00:00"), 11),
            ("b", _ts("2024-01-01T08:00:00"), 20),
        ],
        right_schema,
    )
    out = asof_join(left, right, ["k"], "t", "rt", ["v"])
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 10, 2: 11, 3: None, 4: 20, 5: None}
    assert out.count() == 5  # every left row survives


def test_media_metadata_filter_and_features(spark):
    media = synthetic_media_df(spark, n=32)
    wide = filter_by_meta(media, mime="image/png", min_width=20)
    assert 0 < wide.count() < 32

    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    by_id = {r["media_id"]: r for r in rows}
    assert by_id[0]["n_bytes"] == 32  # sha256 digest × 1
    assert len(by_id[0]["features"]) == 16
    # Deterministic: same id → same digest across runs
    import hashlib, struct

    expected = hashlib.sha256(
        hashlib.sha256(struct.pack("<q", 0)).digest()
    ).hexdigest()
    assert by_id[0]["sha256"] == expected


def test_media_decode_stub_raises_for_unknown_mime(spark):
    from scikit_learn_imputer_spark.sources.multimodal import _decode_image_stub

    with pytest.raises(NotImplementedError):
        _decode_image_stub(b"xx", "video/mp4")


def test_media_resize_and_frame_sampling(spark):
    from scikit_learn_imputer_spark.sources.multimodal import (
        resize_media,
        sample_frames,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=12)

    resized = resize_media(media, width=8, height=4).collect()
    assert len(resized) == 12
    for r in resized:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["payload"]) == 8 * 4

    frames = sample_frames(media, frame_bytes=32, every_nth=2)
    rows = frames.collect()
    assert set(frames.columns) == {"media_id", "frame_no", "frame"}
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_no"])
        assert len(r["frame"]) <= 32
    # payloads are sha256*(1+id%4) = 32*(1+id%4) bytes -> 1..4 frames,
    # sampled every 2nd -> 1..2 rows per media; frame numbers are even
    for mid, nos in by_media.items():
        assert sorted(nos) == list(range(0, 2 * len(nos), 2))
    assert len(by_media) == 12
