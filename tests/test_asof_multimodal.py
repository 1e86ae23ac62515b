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


def test_media_codec_plugin_contract(spark):
    """VERDICT r11 #8: a user with a real codec (PIL/ffmpeg) drops it in
    via register_media_codec without touching any operator — the
    registry snapshot ships to executors in the mapInPandas closure,
    the registered mime decodes through the plug-in, unregistered
    png/jpeg keeps the deterministic fake, and an exotic mime still
    fails loudly."""
    import pytest as _pytest

    from scikit_learn_imputer_spark.sources.multimodal import (
        MEDIA_CODECS,
        MEDIA_SCHEMA,
        extract_media_features,
        register_media_codec,
    )

    def fake_webp_codec(payload: bytes):
        # Stands in for PIL: any picklable bytes -> sequence[float].
        return [float(len(payload)), float(payload[0])]

    rows = [
        (1, bytearray(b"\x10" * 20), ("image/webp", 4, 4, None)),
        (2, bytearray(b"\x20" * 24), ("image/png", 4, 4, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    register_media_codec("image/webp", fake_webp_codec)
    try:
        got = {r["media_id"]: r["features"]
               for r in extract_media_features(media).collect()}
    finally:
        MEDIA_CODECS.pop("image/webp", None)
    assert got[1] == [20.0, 16.0], "registered codec not dispatched"
    assert got[2] == [32.0] * 16, "stub fallback changed for png"

    # Exotic mime with no codec: the task fails loudly, never fabricates.
    bad = spark.createDataFrame(
        [(3, bytearray(b"zz"), ("video/mp4", None, None, 1000))],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception, match="no codec|NotImplementedError"):
        extract_media_features(bad).collect()

    # Explicit decoder argument overrides the registry entirely.
    got2 = extract_media_features(
        bad, decoder=lambda b, m: [1.0, 2.0]
    ).collect()
    assert got2[0]["features"] == [1.0, 2.0]

    register_media_codec("image/webp", fake_webp_codec)
    try:
        with _pytest.raises(TypeError):
            register_media_codec("image/gif", "not-a-callable")
    finally:
        MEDIA_CODECS.pop("image/webp", None)
