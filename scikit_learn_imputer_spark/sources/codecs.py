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
    if off < fh_size + hdr:
        # ADVICE r13: a pixel-data offset pointing inside (or before)
        # the headers would silently decode header bytes as pixels.
        raise ValueError(
            f"BMP pixel offset {off} overlaps headers (< {fh_size + hdr})"
        )
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


# --- PNG (non-interlaced, 8-bit RGB / RGBA / grayscale) ---------------
# VERDICT r13 #5: the second REAL format on the proven seam. Pure
# stdlib: zlib inflate + the four PNG scanline filters (Sub/Up/Average/
# Paeth) reconstructed per the spec; chunk CRCs verified so a corrupt
# payload fails loudly instead of decoding garbage pixels.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(rows_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Serialize rows of (r, g, b) pixels (row 0 = TOP row) into a
    standard non-interlaced 8-bit truecolor PNG (filter 0 scanlines,
    one IDAT)."""
    import zlib

    h = len(rows_rgb)
    if h == 0 or len({len(r) for r in rows_rgb}) != 1:
        raise ValueError("rows_rgb must be non-empty and rectangular")
    w = len(rows_rgb[0])
    if w == 0:
        raise ValueError("rows_rgb rows must be non-empty")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    for row in rows_rgb:
        raw.append(0)  # filter type None
        for r, g, b in row:
            raw += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> list[list[tuple[int, int, int]]]:
    """Parse a non-interlaced 8-bit PNG (color type 2 RGB, 6 RGBA —
    alpha dropped, 0 grayscale — expanded to r=g=b) into rows of
    (r, g, b) tuples, TOP row first. All four scanline filters
    reconstructed; chunk CRCs checked. Raises ``ValueError`` on
    anything outside the supported subset — a loud task failure beats
    fabricated pixels."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} comp={comp} "
            f"filter={filt} interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(ctype_i)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype_i}")
    if w == 0 or h == 0:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {h * (stride + 1)}"
        )
    prev = bytearray(stride)
    rows: list[list[tuple[int, int, int]]] = []
    off = 0
    for _ in range(h):
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        off += 1 + stride
        if ft == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                c = prev[x - channels] if x >= channels else 0
                b = prev[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"unsupported PNG filter type {ft}")
        prev = line
        if channels == 1:
            rows.append([(v, v, v) for v in line])
        else:
            rows.append(
                [
                    (
                        line[i * channels],
                        line[i * channels + 1],
                        line[i * channels + 2],
                    )
                    for i in range(w)
                ]
            )
    return rows


def png_gray_pixels(payload: bytes) -> list[int]:
    """Flattened integer-luma grid (same exact-integer BT.601 weights
    as ``bmp_gray_pixels``) in row-major TOP-first order — the pixel
    stage pHash consumes."""
    return [
        (299 * r + 587 * g + 114 * b) // 1000
        for row in decode_png(payload)
        for (r, g, b) in row
    ]


def png_feature_codec(payload: bytes) -> list[float]:
    """``register_media_codec``-shaped decoder (bytes -> sequence of
    floats): width, height, then the first 14 luma values — the same
    contract as ``bmp_feature_codec`` on the second real format."""
    rows = decode_png(payload)
    gray = [
        (299 * r + 587 * g + 114 * b) // 1000
        for row in rows
        for (r, g, b) in row
    ]
    return [float(len(rows[0])), float(len(rows))] + [
        float(x) for x in gray[:14]
    ]


def media_gray_pixels(payload: bytes) -> list[int]:
    """Magic-byte-dispatching grayscale decode over the registered real
    codecs (BMP + PNG) — the ``decode_gray`` a production pipeline
    passes to ``phash_signatures_decoded`` when one corpus mixes
    formats. Identical pixel content yields the identical luma grid
    (and therefore the identical pHash) regardless of the container
    format, so format-converted duplicates collapse. Unknown magic
    raises ``ValueError`` — loud, like each codec."""
    if payload[:2] == b"BM":
        return bmp_gray_pixels(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return png_gray_pixels(payload)
    raise ValueError(
        f"unrecognized media payload (leading bytes {payload[:4]!r})"
    )
