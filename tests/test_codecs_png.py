"""VERDICT r13 #5: the SECOND real image format on the proven codec
seam — a pure-stdlib non-interlaced 8-bit PNG codec (sources/codecs.py,
zlib inflate + all four scanline filters), registered through
``register_media_codec`` and flowed through the pHash near-dup chain.
The cross-format test pins the property that makes two real codecs
worth having: identical pixel content fingerprints identically whether
it arrived as BMP or PNG, so image dedup catches format-converted
duplicates."""

from __future__ import annotations

import struct
import zlib

import pytest

from scikit_learn_imputer_spark.sources.codecs import (
    bmp_gray_pixels,
    decode_png,
    encode_bmp,
    encode_png,
    png_feature_codec,
    png_gray_pixels,
)
from tests.test_codecs_bmp import _gradient_image


def test_png_roundtrip_exact():
    rows = _gradient_image()
    assert decode_png(encode_png(rows)) == rows


def test_png_all_four_filters_reconstruct():
    """Hand-build a PNG whose scanlines use filters 1-4 (Sub, Up,
    Average, Paeth) and check the reconstruction equals the filter-0
    image — the decoder must implement the spec, not just the easy
    path our encoder emits."""
    rows = _gradient_image(w=5, h=4)
    plain = encode_png(rows)
    want = decode_png(plain)
    # Re-filter each scanline by inverting the reconstruction rules.
    ch = 3
    stride = 5 * ch
    flat = [bytes(v for px in row for v in px) for row in rows]
    filtered = bytearray()
    prev = bytes(stride)
    for i, line in enumerate(flat):
        ft = (i % 4) + 1
        filtered.append(ft)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filtered.append((line[x] - pred) & 0xFF)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    assert decode_png(payload) == want


def test_png_grayscale_and_rgba_variants():
    """Color type 0 expands to r=g=b; color type 6 drops alpha."""

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # 3x2 grayscale ramp
    gray = bytes([0, 10, 20, 30, 0, 40, 50, 60])  # filter byte + 3 px, x2
    p_gray = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(gray))
        + chunk(b"IEND", b"")
    )
    assert decode_png(p_gray) == [
        [(10, 10, 10), (20, 20, 20), (30, 30, 30)],
        [(40, 40, 40), (50, 50, 50), (60, 60, 60)],
    ]
    # 2x1 RGBA
    rgba = bytes([0, 1, 2, 3, 255, 4, 5, 6, 128])
    p_rgba = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(rgba))
        + chunk(b"IEND", b"")
    )
    assert decode_png(p_rgba) == [[(1, 2, 3), (4, 5, 6)]]


def test_png_rejects_corruption_and_unsupported():
    rows = _gradient_image(w=2, h=2)
    good = bytearray(encode_png(rows))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"XX" + bytes(good[2:]))
    flipped = bytearray(good)
    flipped[-6] ^= 0xFF  # corrupt a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC|truncated"):
        decode_png(bytes(flipped))
    bad_depth = bytearray(good)
    bad_depth[8 + 8 + 8] = 16  # IHDR bit depth
    with pytest.raises(ValueError, match="CRC"):
        # CRC now fails first — also loud; rebuild with a valid CRC to
        # reach the depth check.
        decode_png(bytes(bad_depth))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 13))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(deep)


def test_png_codec_flows_through_extract_media_features(spark):
    """The registered REAL PNG codec decodes executor-side through the
    Arrow mapInPandas path — the second format on the seam."""
    from scikit_learn_imputer_spark.sources.multimodal import (
        MEDIA_CODECS,
        MEDIA_SCHEMA,
        extract_media_features,
        register_media_codec,
    )

    register_media_codec("image/png", png_feature_codec)
    try:
        payloads = [encode_png(_gradient_image(shift=s)) for s in (0, 5)]
        df = spark.createDataFrame(
            [
                (i, p, {"mime": "image/png", "width": 16, "height": 12,
                        "duration_ms": None})
                for i, p in enumerate(payloads)
            ],
            MEDIA_SCHEMA,
        )
        rows = {r["media_id"]: r for r in extract_media_features(df).collect()}
        assert len(rows) == 2
        for i, p in enumerate(payloads):
            feats = rows[i]["features"]
            assert feats[0] == 16.0 and feats[1] == 12.0
            assert feats[2:] == [float(x) for x in png_gray_pixels(p)[:14]]
    finally:
        MEDIA_CODECS.pop("image/png", None)


def test_image_dedup_manifest_flow_across_two_real_formats(spark):
    """VERDICT r13 #5 'done' check: the image_dedup_manifest keeper
    flow (pHash fingerprint -> min-id keeper -> per-source action
    counts) over a frame whose payloads mix REAL BMP and REAL PNG: the
    same pixel content fingerprints identically across formats (a
    format-converted duplicate IS caught), and the manifest counts the
    cross-format dup exactly once."""
    from pyspark.sql import functions as F

    from scikit_learn_imputer_spark.dedup.phash import (
        phash_signatures_decoded,
    )

    img = _gradient_image()
    other = [
        [((x * 37 + y * 91) % 256,) * 3 for x in range(16)]
        for y in range(12)
    ]
    df = spark.createDataFrame(
        [
            (0, "web", encode_bmp(img)),
            (1, "web", encode_png(img)),     # format-converted duplicate
            (2, "books", encode_png(other)),  # distinct content
        ],
        "media_id long, source string, payload binary",
    )
    from scikit_learn_imputer_spark.sources.codecs import (
        media_gray_pixels,
    )

    sigs = phash_signatures_decoded(df, media_gray_pixels)
    by_id = {r["media_id"]: r["phash"] for r in sigs.collect()}
    assert by_id[0] == by_id[1], "same pixels must hash equal across formats"
    assert by_id[2] != by_id[0]
    keepers = sigs.groupBy("phash").agg(F.min("media_id").alias("__keeper"))
    manifest = {
        r["source"]: r
        for r in sigs.join(df.select("media_id", "source"), "media_id")
        .join(keepers, "phash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.sum(
                F.when(F.col("media_id") != F.col("__keeper"), 1).otherwise(0)
            ).cast("bigint").alias("n_dup_images"),
            F.countDistinct("phash").cast("bigint").alias("n_fingerprints"),
        )
        .collect()
    }
    assert manifest["web"]["n_images"] == 2
    assert manifest["web"]["n_dup_images"] == 1  # the PNG copy of the BMP
    assert manifest["web"]["n_fingerprints"] == 1
    assert manifest["books"]["n_dup_images"] == 0
