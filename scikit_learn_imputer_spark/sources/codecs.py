"""Real, dependency-free media codecs for the plug-in seam (VERDICT r12
#6): an uncompressed 24-bit BMP decoder/encoder in pure stdlib Python,
so the multimodal operators (``register_media_codec`` →
``extract_media_features``, pHash near-dup) exercise an ACTUAL image
format end-to-end even in environments without PIL/libvips. Production
still registers PIL/ffmpeg for png/jpeg/mp4; this module proves the
seam with a format simple enough to own.

BMP subset supported (the universal baseline every writer emits):
BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, 24 bits/pixel, BI_RGB (no
compression), bottom-up or top-down row order, 4-byte row padding.
"""

from __future__ import annotations

import struct

_FILE_HDR = "<2sIHHI"          # magic, file size, res1, res2, pixel offset
_INFO_HDR = "<IiiHHIIiiII"     # size, w, h, planes, bpp, comp, img size, ...


def encode_bmp(rows_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Serialize rows of (r, g, b) pixels (row 0 = TOP row) into a
    standard bottom-up 24-bit uncompressed BMP."""
    h = len(rows_rgb)
    if h == 0 or len({len(r) for r in rows_rgb}) != 1:
        raise ValueError("rows_rgb must be non-empty and rectangular")
    w = len(rows_rgb[0])
    if w == 0:
        # decode_bmp rejects w=0; refuse to emit what we cannot read back
        raise ValueError("rows_rgb rows must be non-empty")
    pad = (-3 * w) % 4
    row_size = 3 * w + pad
    img_size = row_size * h
    off = struct.calcsize(_FILE_HDR) + struct.calcsize(_INFO_HDR)
    out = bytearray()
    out += struct.pack(_FILE_HDR, b"BM", off + img_size, 0, 0, off)
    out += struct.pack(_INFO_HDR, 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    for row in reversed(rows_rgb):  # bottom-up storage
        for r, g, b in row:
            out += bytes((b & 0xFF, g & 0xFF, r & 0xFF))  # BGR on disk
        out += b"\x00" * pad
    return bytes(out)


def decode_bmp(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Parse an uncompressed 24-bit BMP into rows of (r, g, b) tuples
    (row 0 = TOP row, regardless of on-disk row order). Raises
    ``ValueError`` on anything outside the supported subset — a loud
    task failure beats fabricated pixels."""
    fh_size = struct.calcsize(_FILE_HDR)
    ih_size = struct.calcsize(_INFO_HDR)
    if len(payload) < fh_size + ih_size:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, off = struct.unpack_from(_FILE_HDR, payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (hdr, w, h, planes, bpp, comp, *_rest) = struct.unpack_from(
        _INFO_HDR, payload, fh_size
    )
    if hdr < 40:
        raise ValueError(f"unsupported BMP header size {hdr}")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes} bpp={bpp} comp={comp})"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_size = (3 * w + 3) // 4 * 4
    if len(payload) < off + row_size * h:
        raise ValueError("truncated BMP pixel data")
    rows: list[list[tuple[int, int, int]]] = []
    for i in range(h):
        src = i if top_down else (h - 1 - i)
        base = off + src * row_size
        row = []
        for j in range(w):
            b, g, r = payload[base + 3 * j : base + 3 * j + 3]
            row.append((r, g, b))
        rows.append(row)
    return rows


def bmp_gray_pixels(payload: bytes) -> list[int]:
    """Flattened integer-luma grid (BT.601 weights in exact integer
    arithmetic: (299r + 587g + 114b) // 1000) in row-major TOP-first
    order — the pixel stage pHash consumes."""
    return [
        (299 * r + 587 * g + 114 * b) // 1000
        for row in decode_bmp(payload)
        for (r, g, b) in row
    ]


def bmp_feature_codec(payload: bytes) -> list[float]:
    """``register_media_codec``-shaped decoder (bytes -> sequence of
    floats): width, height, then the first 14 luma values — a real
    decode standing where a CLIP preprocessor would."""
    rows = decode_bmp(payload)
    gray = [
        (299 * r + 587 * g + 114 * b) // 1000 for row in rows for (r, g, b) in row
    ]
    return [float(len(rows[0])), float(len(rows))] + [
        float(x) for x in gray[:14]
    ]
