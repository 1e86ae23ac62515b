"""VERDICT r12 #6: exercise the media-codec plug-in seam with a REAL
image format — a pure-stdlib uncompressed 24-bit BMP codec
(sources/codecs.py) — so extract_media_features and the pHash near-dup
chain run end-to-end on actual decoded pixels at least once, not only
on the deterministic utf-8 fake."""

from __future__ import annotations

import pytest

from scikit_learn_imputer_spark.sources.codecs import (
    bmp_feature_codec,
    bmp_gray_pixels,
    decode_bmp,
    encode_bmp,
)


def _gradient_image(w=16, h=12, shift=0, tweak=None):
    """Deterministic RGB gradient; ``shift`` adds uniform brightness,
    ``tweak``=(x, y) flips one pixel to noise."""
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            v = min(255, (x * 16 + y * 4 + shift) % 256)
            row.append((v, (v + 30) % 256, (v + 60) % 256))
        rows.append(row)
    if tweak is not None:
        tx, ty = tweak
        rows[ty][tx] = (255, 0, 255)
    return rows


def test_bmp_roundtrip_exact():
    rows = _gradient_image()
    assert decode_bmp(encode_bmp(rows)) == rows


def test_bmp_topdown_and_padding():
    # 3-wide rows need 3 bytes of padding; also exercise top-down h<0.
    rows = _gradient_image(w=3, h=5)
    payload = bytearray(encode_bmp(rows))
    import struct

    # Flip to top-down: negate height and reverse stored row order.
    w, h = 3, 5
    struct.pack_into("<i", payload, 14 + 8, -h)
    row_size = (3 * w + 3) // 4 * 4
    off = 54
    body = payload[off:]
    flipped = b"".join(
        bytes(body[(h - 1 - i) * row_size : (h - i) * row_size])
        for i in range(h)
    )
    payload[off:] = flipped
    assert decode_bmp(bytes(payload)) == rows


def test_bmp_rejects_unsupported_variants():
    rows = _gradient_image(w=2, h=2)
    good = bytearray(encode_bmp(rows))
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + bytes(good[2:]))
    bad_bpp = bytearray(good)
    import struct

    struct.pack_into("<H", bad_bpp, 14 + 14, 8)  # 8bpp unsupported
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(good[:-4]))


def test_real_codec_flows_through_extract_media_features(spark):
    """A registered REAL codec (not the stub, not a monkeypatched fake)
    decodes executor-side through the Arrow mapInPandas path."""
    from scikit_learn_imputer_spark.sources.multimodal import (
        MEDIA_CODECS,
        MEDIA_SCHEMA,
        extract_media_features,
        register_media_codec,
    )

    register_media_codec("image/bmp", bmp_feature_codec)
    try:
        payloads = [encode_bmp(_gradient_image(shift=s)) for s in (0, 5)]
        df = spark.createDataFrame(
            [
                (i, p, {"mime": "image/bmp", "width": 16, "height": 12,
                        "duration_ms": None})
                for i, p in enumerate(payloads)
            ],
            MEDIA_SCHEMA,
        )
        rows = {r["media_id"]: r for r in extract_media_features(df).collect()}
        assert len(rows) == 2
        for i, p in enumerate(payloads):
            feats = rows[i]["features"]
            assert feats[0] == 16.0 and feats[1] == 12.0  # real dimensions
            assert feats[2:] == [float(x) for x in bmp_gray_pixels(p)[:14]]
            assert rows[i]["n_bytes"] == len(p)
    finally:
        MEDIA_CODECS.pop("image/bmp", None)


def test_phash_on_real_bmp_finds_near_dup_and_ignores_distinct(spark):
    """The VERDICT r12 #6 'done' check: fixture images decoded by the
    REAL BMP codec flow through the pHash signature + banded Hamming
    chain; a one-pixel tweak lands within Hamming<=3 of the original, a
    uniform brightness shift gives the IDENTICAL dHash (the gradient
    fingerprint's invariance), and an unrelated image pairs with
    neither."""
    from scikit_learn_imputer_spark.dedup.phash import (
        BITS,
        banded_hamming_pairs,
        phash_signatures_decoded,
    )

    orig = encode_bmp(_gradient_image())
    tweaked = encode_bmp(_gradient_image(tweak=(7, 5)))
    brighter = encode_bmp(
        [[(min(r + 10, 255), min(g + 10, 255), min(b + 10, 255))
          for (r, g, b) in row]
         for row in _gradient_image()]
    )
    other = encode_bmp(
        [[((x * 37 + y * 91) % 256,) * 3 for x in range(16)]
         for y in range(12)]
    )
    df = spark.createDataFrame(
        [(0, orig), (1, tweaked), (2, brighter), (3, other)],
        "media_id long, payload binary",
    )
    sigs = phash_signatures_decoded(df, bmp_gray_pixels)
    by_id = {r["media_id"]: r["phash"] for r in sigs.collect()}
    assert len(by_id) == 4
    assert by_id[0] == by_id[2], "uniform brightness shift must not move dHash"
    assert bin(by_id[0] ^ by_id[1]).count("1") <= 3

    pairs = banded_hamming_pairs(
        sigs.persist(), id_col="media_id", sig_col="phash",
        max_hamming=3, bits=BITS, chunks=4,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got or (1, 0) in got
    assert (0, 2) in got or (2, 0) in got  # identical sigs pair at d=0
    assert not any(3 in p for p in got), "unrelated image must not pair"


def test_encode_bmp_rejects_zero_width():
    with pytest.raises(ValueError, match="non-empty"):
        encode_bmp([[], []])


def test_phash_decoded_survives_null_payload_in_batch(spark):
    """r13 review: pandas promotes a mixed int/None sigs list to
    float64, silently rounding every 60-bit hash above 2^53 — one NULL
    payload used to corrupt its whole Arrow batch. The nullable-Int64
    column must keep neighbours bit-exact."""
    from scikit_learn_imputer_spark.dedup.phash import (
        phash_signatures_decoded,
    )

    img = encode_bmp(_gradient_image())
    df_with_null = spark.createDataFrame(
        [(0, img), (1, None), (2, img)],
        "media_id long, payload binary",
    ).coalesce(1)  # one partition -> one Arrow batch holds the NULL
    df_clean = spark.createDataFrame(
        [(0, img)], "media_id long, payload binary"
    )
    got = {
        r["media_id"]: r["phash"]
        for r in phash_signatures_decoded(df_with_null, bmp_gray_pixels).collect()
    }
    (want,) = [
        r["phash"]
        for r in phash_signatures_decoded(df_clean, bmp_gray_pixels).collect()
    ]
    assert set(got) == {0, 2}  # NULL row dropped
    assert got[0] == want and got[2] == want, "batch neighbours corrupted"
