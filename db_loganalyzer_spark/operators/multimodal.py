"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas stages.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas, batch shapes. Three decode backends:

* ``pure_python_decode_backend`` — a REAL decoder for actual formats in
  all three modalities, none needing wheels: 24-bit uncompressed BMP,
  binary PPM/PGM, 8-bit PNG (stdlib zlib inflate + all five row
  filters), and BASELINE SEQUENTIAL JPEG (full ITU T.81 path: marker
  walk, canonical huffman entropy decode, dequantize, inverse zigzag,
  IDCT, YCbCr->RGB — the first LOSSY codec here) images, RIFF/WAVE
  PCM-16 audio (chunk walk + full int16 sample decode), and
  uncompressed RIFF/AVI video (chunk tree + per-frame DIB decode). It
  parses the byte stream, validates the full payload, and can return
  the pixel/sample arrays themselves (``decode_image_pixels``,
  ``decode_wav``, ``decode_avi``).
* ``fake_decode_backend`` — deterministic metadata stand-in for
  compressed codecs this container genuinely cannot decode (the IMAGE
  path no longer needs it at all; H.264/MP3/webp still do).
* ``unavailable_decode_backend`` — the honest NotImplementedError slot
  for wiring PIL/av in production.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Callable, Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta map<string,string>"
)

_DECODED_SCHEMA = (
    "media_id long, media_type string, byte_len long, "
    "width int, height int, n_frames int, format string"
)


def media_table_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media stand-in: utf-8 payload bytes from text (real
    pipelines read payloads via spark.read.format('binaryFile'))."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real wheel-free codecs: 24-bit BMP and binary PPM/PGM
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: list[tuple]) -> bytes:
    """Encode RGB pixel rows (top-down list of (r, g, b), row-major) as a
    24-bit uncompressed bottom-up BMP — the standard BITMAPFILEHEADER +
    BITMAPINFOHEADER layout, rows padded to 4 bytes."""
    if len(pixels) != width * height:
        raise ValueError("pixels must hold width*height RGB tuples")
    row_size = (3 * width + 3) // 4 * 4
    image_size = row_size * height
    # vectorized bottom-up padded BGR rows (same bytes as the loops)
    arr = np.asarray(pixels, dtype=np.int64).reshape(height, width, 3)
    if arr.size and (arr.min() < 0 or arr.max() > 255):
        raise ValueError("bytes must be in range(0, 256)")
    rows = np.zeros((height, row_size), dtype=np.uint8)
    rows[:, : 3 * width] = (
        arr.astype(np.uint8)[::-1, :, ::-1].reshape(height, 3 * width)
    )
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size,
        2835, 2835, 0, 0,
    )
    return header + bytes(body)


def _pixels_to_tuples(rgb: "np.ndarray") -> list[tuple]:
    """(n, 3) int array -> the row-major (r, g, b) tuple list of the
    public codec contract."""
    cols = rgb.T.tolist()
    return list(zip(cols[0], cols[1], cols[2]))


def _dib_rows_to_rgb(
    data: bytes, width: int, height: int, offset: int, top_down: bool
) -> "np.ndarray":
    """Vectorized DIB pixel-array decode (the layout BMP bodies and
    uncompressed AVI frames share): 4-byte-padded BGR rows, bottom-up
    unless ``top_down`` — returns (h*w, 3) int64 RGB. Caller validates
    length."""
    row_size = (3 * width + 3) // 4 * 4
    arr = np.frombuffer(
        data, dtype=np.uint8, count=row_size * height, offset=offset
    ).reshape(height, row_size)
    rows = arr[:, : 3 * width].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].reshape(-1, 3).astype(np.int64)


def _decode_bmp_arrays(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """decode_bmp's engine, returning (h*w, 3) int64 RGB."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    if len(payload) < data_offset + row_size * height:
        raise ValueError("truncated BMP pixel array")
    return width, height, _dib_rows_to_rgb(
        payload, width, height, data_offset, top_down
    )


def decode_bmp(payload: bytes) -> tuple[int, int, list[tuple]]:
    """Parse a 24-bit uncompressed BMP: returns (width, height, pixels)
    with pixels as a top-down row-major list of (r, g, b). Raises
    ValueError on anything that is not a well-formed 24-bit BI_RGB BMP —
    truncated pixel arrays included (this decodes the pixel data, not
    just the header)."""
    width, height, rgb = _decode_bmp_arrays(payload)
    return width, height, _pixels_to_tuples(rgb)


def encode_ppm(width: int, height: int, pixels: list[tuple]) -> bytes:
    """Encode RGB pixels (top-down row-major (r, g, b)) as binary PPM
    (P6, maxval 255)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must hold width*height RGB tuples")
    arr = np.asarray(pixels, dtype=np.int64)
    if arr.size and (arr.min() < 0 or arr.max() > 255):
        raise ValueError("bytes must be in range(0, 256)")
    body = arr.astype(np.uint8).tobytes()
    return f"P6\n{width} {height}\n255\n".encode("ascii") + body


def _ppm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a PNM header (magic, width, height, maxval) honouring
    whitespace and # comments; returns (magic, w, h, maxval, body_off)."""
    magic = payload[:2]
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PNM header")
        c = payload[pos: pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos: pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while (
                pos < len(payload)
                and not payload[pos: pos + 1].isspace()
            ):
                pos += 1
            fields.append(int(payload[start:pos]))
    return magic, fields[0], fields[1], fields[2], pos + 1


def _decode_ppm_arrays(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """decode_ppm's engine, returning (h*w, 3) int64 RGB."""
    magic, width, height, maxval, off = _ppm_header(payload)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"unsupported PNM magic {magic!r}")
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    nch = 3 if magic == b"P6" else 1
    need = width * height * nch
    if len(payload) < off + need:
        raise ValueError("truncated PNM pixel data")
    body = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if nch == 3:
        rgb = body.reshape(-1, 3).astype(np.int64)
    else:
        rgb = np.repeat(body.astype(np.int64).reshape(-1, 1), 3, axis=1)
    return width, height, rgb


def decode_ppm(payload: bytes) -> tuple[int, int, list[tuple]]:
    """Parse binary PPM (P6) or PGM (P5): returns (width, height,
    pixels) as top-down row-major (r, g, b) — PGM gray replicated to
    three channels. Validates the full pixel payload length."""
    width, height, rgb = _decode_ppm_arrays(payload)
    return width, height, _pixels_to_tuples(rgb)


# ---------------------------------------------------------------------------
# PNG: the first real COMPRESSED codec, stdlib-only (zlib inflate +
# the five per-row filters). Encoder cycles the filter type per row so
# every filter reversal is exercised on every image; the deflate
# stream defaults to hand-rolled STORED blocks, whose length is a
# closed form of the dimensions (so oracle SQL can restate byte_len —
# a level-9 stream's length depends on the compressor implementation).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """A valid zlib stream using only STORED (uncompressed) deflate
    blocks — byte length is exactly ``2 + 5*n_blocks + len(data) + 4``,
    deterministic by construction (zlib.compress(level=0) happens to
    produce the same shape, but hand-rolling removes the dependency on
    that implementation detail). Any inflate implementation reads it."""
    import zlib

    out = bytearray(b"\x78\x01")  # CMF/FLG: 32K window, check bits ok
    pos = 0
    n = len(data)
    while True:
        block = data[pos: pos + 65535]
        pos += len(block)
        final = 1 if pos >= n else 0
        out += bytes((final,))
        out += struct.pack("<HH", len(block), len(block) ^ 0xFFFF)
        out += block
        if final:
            break
    out += struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF)
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int,
    height: int,
    pixels: list[tuple],
    compress_level: int | None = None,
) -> bytes:
    """Encode RGB pixels (top-down row-major (r, g, b)) as an 8-bit
    truecolor PNG. Row y uses filter type y % 5, so a decoder must
    implement None/Sub/Up/Average/Paeth to read any image taller than
    4 rows. ``compress_level=None`` wraps the filtered scanlines in
    stored deflate blocks (deterministic length: see _zlib_stored);
    pass 1-9 to run real zlib compression (pytest exercises this path;
    the synthetic fixtures use the stored form so the oracle can
    restate byte_len)."""
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must hold width*height RGB tuples")
    bpp = 3
    # vectorized per-row filtering: unlike DECODE, encode-side
    # predictions read only ORIGINAL row/prev samples, so every filter
    # (Sub/Up/Average/Paeth included) is elementwise — identical bytes
    # to the scalar loops
    arr = np.asarray(pixels, dtype=np.int64)
    if arr.size and (arr.min() < 0 or arr.max() > 255):
        raise ValueError("bytes must be in range(0, 256)")
    rows = arr.astype(np.int64).reshape(height, bpp * width)
    raw = bytearray()
    prev = np.zeros(bpp * width, dtype=np.int64)
    for y in range(height):
        row = rows[y]
        left = np.concatenate((np.zeros(bpp, dtype=np.int64), row[:-bpp])) \
            if len(row) > bpp else np.zeros_like(row)
        ftype = y % 5
        raw += bytes((ftype,))
        if ftype == 0:
            enc = row
        elif ftype == 1:  # Sub
            enc = (row - left) & 0xFF
        elif ftype == 2:  # Up
            enc = (row - prev) & 0xFF
        elif ftype == 3:  # Average
            enc = (row - (left + prev) // 2) & 0xFF
        else:  # Paeth
            ul = np.concatenate(
                (np.zeros(bpp, dtype=np.int64), prev[:-bpp])
            ) if len(row) > bpp else np.zeros_like(row)
            p = left + prev - ul
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (row - pred) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prev = row
    idat = (
        _zlib_stored(bytes(raw))
        if compress_level is None
        else zlib.compress(bytes(raw), compress_level)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _decode_png_arrays(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """decode_png's engine, returning (h*w, 3) int64 RGB. The per-row
    filter reversal stays a byte loop (types 1/3/4 carry a left-pixel
    dependency), but pixel materialization is vectorized."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + clen]
        if len(data) < clen:
            raise ValueError("truncated PNG chunk")
        # per-chunk CRC check: a corrupted IHDR/header mis-decodes
        # silently otherwise (zlib's adler32 only guards IDAT payloads).
        # Absent CRC bytes are a failure too — a payload cut inside a
        # trailing CRC must not decode unchecked (fail-closed contract).
        if pos + 12 + clen > len(payload):
            raise ValueError("truncated PNG chunk CRC")
        (stored_crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != stored_crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or color_type not in (0, 2):
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color_type})"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/interlace")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    bpp = 3 if color_type == 2 else 1
    stride = bpp * width
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        base = y * (1 + stride)
        ftype = raw[base]
        row = bytearray(raw[base + 1: base + 1 + stride])
        if ftype == 1:
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = bytes(row)
    flat = np.frombuffer(bytes(out), dtype=np.uint8)
    if bpp == 3:
        rgb = flat.reshape(-1, 3).astype(np.int64)
    else:
        rgb = np.repeat(flat.astype(np.int64).reshape(-1, 1), 3, axis=1)
    return width, height, rgb


def decode_png(payload: bytes) -> tuple[int, int, list[tuple]]:
    """Decode an 8-bit truecolor (color type 2) or grayscale (0) PNG:
    signature + chunk walk, zlib inflate of the concatenated IDATs,
    then reversal of the per-row filter (all five types). Returns
    (width, height, pixels) as top-down row-major (r, g, b) — gray
    replicated to three channels. Interlace, palettes, and other bit
    depths raise ValueError (route to a codec library)."""
    width, height, rgb = _decode_png_arrays(payload)
    return width, height, _pixels_to_tuples(rgb)


# ---------------------------------------------------------------------------
# baseline JPEG (ITU T.81, sequential DCT, huffman) — wheel-free codec
# ---------------------------------------------------------------------------
# Constants below are the PUBLIC tables of ITU T.81 Annex K (the example
# quantization matrices and the "typical" huffman tables virtually every
# encoder ships). The zigzag order is Figure A.6 of the same spec.

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_JPEG_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_JPEG_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_LUMA_VALS = list(range(12))
_JPEG_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JPEG_DC_CHROMA_VALS = list(range(12))
_JPEG_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_JPEG_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_JPEG_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_quality_scale(table: list[int], quality: int) -> list[int]:
    """libjpeg's public quality->scale mapping (quality 50 returns the
    Annex K table verbatim — the property the exact-tile oracle path
    relies on)."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (t * s + 50) // 100)) for t in table]


@lru_cache(maxsize=64)
def _jpeg_quality_tables(
    quality: int,
) -> tuple[list[int], list[int], bytes, bytes]:
    """(luma, chroma, luma-DQT-zigzag-bytes, chroma-DQT-zigzag-bytes)
    quality-scaled quant tables, cached per quality — rebuilding them
    (and re-serializing the DQT segments) per image was pure per-row
    overhead in the encode stage."""
    qly = _jpeg_quality_scale(_JPEG_Q_LUMA, quality)
    qch = _jpeg_quality_scale(_JPEG_Q_CHROMA, quality)
    zly = bytes(qly[_JPEG_ZIGZAG[i]] for i in range(64))
    zch = bytes(qch[_JPEG_ZIGZAG[i]] for i in range(64))
    return qly, qch, zly, zch


def _jpeg_build_codes(bits: list[int], vals: list[int]) -> dict:
    """Canonical huffman codes (T.81 C.2): value -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


@lru_cache(maxsize=256)
def _jpeg_inv_codes(raw: bytes) -> dict:
    """Decoder-side canonical map (code, length) -> value from a DHT
    table body (16 BITS counts + values), cached by the raw bytes —
    every MJPEG frame ships the same tables."""
    bits = list(raw[:16])
    vals = list(raw[16:])
    inv = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            inv[(code, length)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return inv


# the Annex-K typical tables are the only ones the encoder ever emits:
# build their canonical code maps once instead of per image
_JPEG_ENC_CODES = (
    _jpeg_build_codes(_JPEG_DC_LUMA_BITS, _JPEG_DC_LUMA_VALS),
    _jpeg_build_codes(_JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS),
    _jpeg_build_codes(_JPEG_DC_CHROMA_BITS, _JPEG_DC_CHROMA_VALS),
    _jpeg_build_codes(_JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS),
)


_JPEG_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_JPEG_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7

# numpy mirrors of the DCT constants for the batched transforms; the
# per-element products are the same IEEE doubles as the scalar T.81
# loops they replaced, so decoded values are unchanged (the equality is
# additionally pinned by the golden-bitstream tests)
_JPEG_COS_NP = np.array(_JPEG_COS)
_JPEG_C_NP = np.array(_JPEG_C)
_JPEG_FDCT_SCALE = np.array(
    [[0.25 * _JPEG_C[u] * _JPEG_C[v] for v in range(8)] for u in range(8)]
)
_JPEG_ZZ_NP = np.array(_JPEG_ZIGZAG)


def _fdct_blocks(blocks: "np.ndarray") -> "np.ndarray":
    """Forward 8x8 DCT-II (T.81 A.3.3), separable, float — batched over
    (n, 8, 8) blocks: tmp = B @ COS, out = scale * (COSᵀ @ tmp)."""
    tmp = blocks @ _JPEG_COS_NP
    return _JPEG_FDCT_SCALE * np.matmul(_JPEG_COS_NP.T, tmp)


def _idct_blocks(coefs: "np.ndarray") -> "np.ndarray":
    """Inverse 8x8 DCT (T.81 A.3.3), separable, float — batched over
    (n, 8, 8) natural-order coefficient blocks; returns clamped level-
    shifted int64 samples. DC-only blocks must go through
    _idct_dc_only instead (the decoder routes them there, matching the
    short-circuit every real decoder takes)."""
    tmp = (_JPEG_C_NP[None, None, :] * coefs) @ _JPEG_COS_NP.T
    s = np.matmul(_JPEG_COS_NP, _JPEG_C_NP[:, None] * tmp)
    return np.clip(np.rint(s * 0.25 + 128.0), 0, 255).astype(np.int64)


def _idct_dc_only(dc: "np.ndarray") -> "np.ndarray":
    """The DC-only IDCT short-circuit, batched: constant 8x8 blocks at
    round(dc/8 + 128) — the exact path that keeps the even-tile oracle
    payloads bit-for-bit."""
    return np.clip(np.rint(dc / 8.0 + 128.0), 0, 255).astype(np.int64)


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3 fill)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)

    def emit_marker(self, marker: int) -> None:
        self.align()
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    cat = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _jpeg_write_block(
    w: _JpegBitWriter,
    q: list[int],
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one already-quantized block (zigzag order). The
    FDCT + quantization happen batched in encode_jpeg (numpy over every
    block of the plane at once); only the inherently sequential huffman
    bit stream is written per block."""
    cat, bits = _jpeg_magnitude(q[0] - pred)
    code, length = dc_codes[cat]
    w.write(code, length)
    if cat:
        w.write(bits, cat)
    run = 0
    last_nz = max((i for i in range(1, 64) if q[i]), default=0)
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        cat, bits = _jpeg_magnitude(q[i])
        code, length = ac_codes[(run << 4) | cat]
        w.write(code, length)
        w.write(bits, cat)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return q[0]


def encode_jpeg(
    width: int,
    height: int,
    pixels: list[tuple],
    quality: int = 50,
    grayscale: bool = False,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Baseline sequential-DCT JFIF encoder (ITU T.81): level shift,
    float FDCT, Annex-K quantization scaled by ``quality``, canonical
    huffman entropy coding with the Annex-K typical tables, byte
    stuffing. 3 components encode 4:4:4 or — ``subsampling="420"``,
    what most real-world JPEGs are — 4:2:0 (Y at 2x2 per 16x16 MCU,
    chroma downsampled by 2x2 averaging, interleaved per T.81 A.2.3);
    ``grayscale=True`` emits a 1-component scan from the red channel.
    Edges of non-multiple-of-block images pad by edge replication.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (predictor resets included), the resync structure real
    encoders use for error resilience."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    qly, qch, zly, zch = _jpeg_quality_tables(quality)
    dcl, acl, dcc, acc_ = _JPEG_ENC_CODES

    ncomp = 1 if grayscale else 3
    # component planes, level-shifted — vectorized, same per-element
    # arithmetic as the scalar loop it replaced (elementwise IEEE ops
    # and round-half-even are order-independent, so identical values)
    px = np.asarray(pixels, dtype=np.int64).reshape(-1, 3)
    if grayscale:
        planes = [px[:, 0] - 128]
    else:
        r = px[:, 0].astype(np.float64)
        g = px[:, 1].astype(np.float64)
        b = px[:, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [
            np.rint(y).astype(np.int64) - 128,
            np.clip(np.rint(cb), 0, 255).astype(np.int64) - 128,
            np.clip(np.rint(cr), 0, 255).astype(np.int64) - 128,
        ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + zly)
    if ncomp == 3:
        out += seg(0xDB, bytes([1]) + zch)
    sub420 = ncomp == 3 and subsampling == "420"
    samps = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * ncomp
    sof = bytearray(struct.pack(">BHHB", 8, height, width, ncomp))
    for c in range(ncomp):
        sh, sv = samps[c]
        sof += bytes([c + 1, (sh << 4) | sv, 0 if c == 0 else 1])
    out += seg(0xC0, bytes(sof))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _JPEG_DC_LUMA_BITS, _JPEG_DC_LUMA_VALS)
    out += dht(1, 0, _JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS)
    if ncomp == 3:
        out += dht(0, 1, _JPEG_DC_CHROMA_BITS, _JPEG_DC_CHROMA_VALS)
        out += dht(1, 1, _JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))

    # per-component sample planes at the component's resolution; 4:2:0
    # chroma halves by 2x2 AVERAGING (the encoder-side downsample that
    # pairs with the decoder's nearest-neighbor upsample)
    cplanes, cdims = [], []
    for c in range(ncomp):
        sh, sv = samps[c]
        if (sh, sv) == (2, 2) or ncomp == 1 or not sub420 or c == 0:
            cplanes.append(planes[c].reshape(height, width))
            cdims.append((width, height))
        else:
            cw, ch = (width + 1) // 2, (height + 1) // 2
            src = planes[c].reshape(height, width)
            x0 = 2 * np.arange(cw)
            x1 = np.minimum(x0 + 1, width - 1)
            y0 = 2 * np.arange(ch)
            y1 = np.minimum(y0 + 1, height - 1)
            acc = (
                src[np.ix_(y0, x0)] + src[np.ix_(y0, x1)]
                + src[np.ix_(y1, x0)] + src[np.ix_(y1, x1)]
            )
            # round-half-up of the mean of four level-shifted samples
            # (acc may be negative: floor-div of acc+2 — int64 >> is
            # the same arithmetic shift as Python's)
            cplanes.append((acc + 2) >> 2)
            cdims.append((cw, ch))

    hmax = max(sh for sh, _ in samps)
    vmax = max(sv for _, sv in samps)
    n_mcux = (width + 8 * hmax - 1) // (8 * hmax)
    n_mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # every component's blocks FDCT'd + quantized in one batched numpy
    # pass (edge replication == the min() clamp of the scalar walk);
    # the entropy coder below then just reads quantized ints
    cquant: list[list[list[int]]] = []
    cgw: list[int] = []
    for c in range(ncomp):
        sh, sv = samps[c]
        cw, ch = cdims[c]
        gh, gw = n_mcuy * sv, n_mcux * sh
        # manual edge-replicate padding (same cells as np.pad
        # mode="edge", without its per-call overhead on tiny planes)
        pad = np.empty((gh * 8, gw * 8), dtype=np.int64)
        pad[:ch, :cw] = cplanes[c]
        if gh * 8 > ch:
            pad[ch:, :cw] = pad[ch - 1, :cw]
        if gw * 8 > cw:
            pad[:, cw:] = pad[:, cw - 1: cw]
        blocks = (
            pad.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3)
            .reshape(gh * gw, 8, 8).astype(np.float64)
        )
        coefs = _fdct_blocks(blocks).reshape(-1, 64)
        qtab = np.asarray(qly if c == 0 else qch, dtype=np.float64)
        q = np.rint(coefs / qtab[None, :]).astype(np.int64)
        cquant.append(q[:, _JPEG_ZZ_NP].tolist())
        cgw.append(gw)

    w = _JpegBitWriter()
    preds = [0] * ncomp
    mcu = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.emit_marker(0xD0 + ((mcu // restart_interval - 1) % 8))
                preds = [0] * ncomp
            mcu += 1
            for c in range(ncomp):
                sh, sv = samps[c]
                for iby in range(sv):
                    for ibx in range(sh):
                        gidx = (my * sv + iby) * cgw[c] + (mx * sh + ibx)
                        preds[c] = _jpeg_write_block(
                            w,
                            cquant[c][gidx],
                            preds[c],
                            dcl if c == 0 else dcc,
                            acl if c == 0 else acc_,
                        )
    out += w.flush()
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers
    (RSTn handled by the caller via ``sync_restart``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _JpegMarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and realign to a byte."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d):
            # fail-closed: a JPEG truncated at a restart boundary is a
            # corrupt payload (ValueError), not an IndexError escape
            raise ValueError("truncated JPEG at restart marker")
        while d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("expected JPEG restart marker")


class _JpegMarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _jpeg_decode_huff(reader: _JpegBitReader, table: dict) -> int:
    """Canonical huffman decode: (code,length) lookup per T.81 F.2.2.3."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((code, length))
        if v is not None:
            return v
    raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits >> (cat - 1):
        return bits
    return bits - (1 << cat) + 1


def _decode_jpeg_arrays(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """decode_jpeg's engine, returning the pixels as an (h*w, 3) int64
    numpy array — the form the batched stats stages consume without
    materializing per-pixel tuples. Decode a BASELINE sequential-DCT
    JPEG (ITU T.81): marker walk
    (DQT 8/16-bit, DHT, SOF0, DRI, SOS; APPn/COM skipped), canonical
    huffman entropy decode with restart-marker support, dequantize,
    inverse zigzag, float IDCT (DC-only short-circuit), level shift +
    clamp, JFIF YCbCr->RGB for 3-component scans, crop to the SOF
    dimensions. Grayscale, 4:4:4, and SUBSAMPLED scans up to 2x2
    sampling factors (4:2:0 — what most real-world JPEGs are — and
    4:2:2) decode through interleaved-MCU assembly with
    nearest-neighbor chroma upsampling; progressive (SOF2), arithmetic
    coding, 12-bit precision, and sampling factors beyond 2x2 raise
    ValueError — route those to a codec library. Grayscale replicates
    to (r, g, b) like the other image
    decoders here; reference parity anchor: the decode half the
    reference has no image path for at all (brief: multimodal
    columns first-class)."""
    d = bytes(payload)
    if d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict] = {}
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtab id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    restart_interval = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", d, pos + 2)
        if pos + 2 + ln > len(d):
            raise ValueError("truncated JPEG segment")
        body = d[pos + 4: pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                bp += 1
                if bp + (128 if pq else 64) > len(body):
                    raise ValueError("truncated JPEG DQT segment")
                if pq:
                    tab = [
                        struct.unpack_from(">H", body, bp + 2 * i)[0]
                        for i in range(64)
                    ]
                    bp += 128
                else:
                    tab = list(body[bp: bp + 64])
                    bp += 64
                qtabs[tq] = tab
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1: bp + 17])
                n = sum(bits)
                if len(bits) < 16 or bp + 17 + n > len(body):
                    raise ValueError("truncated JPEG DHT segment")
                # the inv map build is cached by the raw table bytes:
                # MJPEG streams repeat the identical Annex-K tables per
                # frame, and real corpora share a handful of tables
                htabs[(tc, th)] = _jpeg_inv_codes(
                    bytes(body[bp + 1: bp + 17 + n])
                )
                bp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF header")
            prec, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF components")
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c: 9 + 3 * c]
                sh, sv = samp >> 4, samp & 0xF
                if sh not in (1, 2) or sv not in (1, 2):
                    raise ValueError(
                        "JPEG sampling factors beyond 2x2 unsupported "
                        "(route to codec lib)"
                    )
                comps.append((cid, samp, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "non-baseline JPEG unsupported (route to codec lib)"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if not body:
                raise ValueError("empty JPEG SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("truncated JPEG SOS header")
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    (i for i, (x, _, _) in enumerate(comps) if x == cid),
                    None,
                )
                if idx is None:
                    raise ValueError("JPEG SOS references unknown component")
                scan.append((idx, tabs >> 4, tabs & 0xF))
            break
        # APPn / COM / others: skipped
    if width is None or not scan:
        raise ValueError("JPEG missing SOF or SOS")

    ncomp = len(scan)
    # corrupted streams must fail closed, not crash or balloon: every
    # table a scan references has to exist, and the padded sample
    # buffers are capped (a flipped dimension byte can claim 65535 x
    # 65535 = 4 GiB of samples; no trace-pipeline asset is near that)
    for ci, dct, act in scan:
        if (0, dct) not in htabs or (1, act) not in htabs:
            raise ValueError("JPEG scan references a missing huffman table")
        if comps[ci][2] not in qtabs:
            raise ValueError("JPEG scan references a missing quant table")
        if any(len(t) < 64 for t in qtabs.values()):
            raise ValueError("short JPEG quantization table")
    if width * height > 100_000_000:
        raise ValueError("implausible JPEG dimensions")
    # sampling geometry: MCU = (8*hmax) x (8*vmax) pixels; component i
    # contributes h_i x v_i blocks per MCU in raster order (T.81 A.2.3)
    samps = [(comps[ci][1] >> 4, comps[ci][1] & 0xF) for ci, _, _ in scan]
    hmax = max(sh for sh, _ in samps)
    vmax = max(sv for _, sv in samps)
    n_mcux = (width + 8 * hmax - 1) // (8 * hmax)
    n_mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    pws = [n_mcux * 8 * sh for sh, _ in samps]
    planes = [
        np.zeros((n_mcuy * 8 * sv, pws[s]), dtype=np.int64)
        for s, (_, sv) in enumerate(samps)
    ]
    reader = _JpegBitReader(d, pos)
    preds = [0] * ncomp
    mcu = 0
    # entropy decode is inherently sequential (huffman bit stream), so
    # it stays a Python loop — but it now only COLLECTS each block's
    # zigzag coefficients + grid position; dequantize / inverse zigzag /
    # IDCT run batched in numpy afterwards (identical per-element
    # arithmetic, and blocks the stream never reached stay zero exactly
    # as the scalar walk left them)
    cblocks: list[list[list[int]]] = [[] for _ in scan]
    cpos: list[list[int]] = [[] for _ in scan]
    try:
        for my in range(n_mcuy):
            for mx in range(n_mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    reader.sync_restart()
                    preds = [0] * ncomp
                mcu += 1
                for s, (ci, dct, act) in enumerate(scan):
                    sh, sv = samps[s]
                    dc_tab = htabs[(0, dct)]
                    ac_tab = htabs[(1, act)]
                    for iby in range(sv):
                        for ibx in range(sh):
                            zz = [0] * 64
                            cat = _jpeg_decode_huff(reader, dc_tab)
                            diff = _jpeg_extend(reader.read_bits(cat), cat)
                            preds[s] += diff
                            zz[0] = preds[s]
                            k = 1
                            while k < 64:
                                rs = _jpeg_decode_huff(reader, ac_tab)
                                r, c = rs >> 4, rs & 0xF
                                if c == 0:
                                    if r == 15:  # ZRL
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("JPEG AC run overflow")
                                zz[k] = _jpeg_extend(reader.read_bits(c), c)
                                k += 1
                            cblocks[s].append(zz)
                            cpos[s].append(
                                (my * sv + iby) * (n_mcux * sh)
                                + (mx * sh + ibx)
                            )
    except _JpegMarkerHit as hit:
        if hit.marker != 0xD9:
            raise ValueError(f"unexpected JPEG marker 0x{hit.marker:02X}")
    for s, (ci, _, _) in enumerate(scan):
        if not cblocks[s]:
            continue
        sh, sv = samps[s]
        qtab = np.asarray(qtabs[comps[ci][2]][:64], dtype=np.int64)
        zzarr = np.asarray(cblocks[s], dtype=np.int64) * qtab[None, :]
        nat = np.zeros((len(zzarr), 64), dtype=np.int64)
        nat[:, _JPEG_ZZ_NP] = zzarr
        vals = np.empty((len(nat), 8, 8), dtype=np.int64)
        dc_only = ~nat[:, 1:].any(axis=1)
        if dc_only.any():
            vals[dc_only] = _idct_dc_only(
                nat[dc_only, 0].astype(np.float64)
            )[:, None, None]
        if (~dc_only).any():
            vals[~dc_only] = _idct_blocks(
                nat[~dc_only].reshape(-1, 8, 8).astype(np.float64)
            )
        plane, gw = planes[s], n_mcux * sh
        for i, gidx in enumerate(cpos[s]):
            gy, gx = divmod(gidx, gw)
            plane[gy * 8: gy * 8 + 8, gx * 8: gx * 8 + 8] = vals[i]

    # nearest-neighbor chroma upsampling (the standard fast path):
    # component sample coordinate = pixel coordinate scaled by the
    # component's sampling factor over the max factor — batched via
    # integer index grids (exact integer math, unchanged values)
    def sample_plane(s: int) -> "np.ndarray":
        sh, sv = samps[s]
        if sh == hmax and sv == vmax:
            # full-resolution component: the crop is a plain view
            return planes[s][:height, :width]
        ys = np.arange(height) * sv // vmax
        xs = np.arange(width) * sh // hmax
        return planes[s][np.ix_(ys, xs)]

    if ncomp == 1:
        gray = sample_plane(0)
        rgb = np.repeat(gray.reshape(-1, 1), 3, axis=1)
    else:
        yv = sample_plane(0).astype(np.float64)
        cb = (sample_plane(1) - 128).astype(np.float64)
        cr = (sample_plane(2) - 128).astype(np.float64)
        r = np.clip(np.rint(yv + 1.402 * cr), 0, 255)
        g = np.clip(np.rint(yv - 0.344136 * cb - 0.714136 * cr), 0, 255)
        b = np.clip(np.rint(yv + 1.772 * cb), 0, 255)
        rgb = np.stack(
            [r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=1
        ).astype(np.int64)
    return width, height, rgb


def decode_jpeg(payload: bytes) -> tuple[int, int, list[tuple]]:
    """Public decode: same pipeline as :func:`_decode_jpeg_arrays`
    (see its docstring for the full T.81 path) with the pixels
    materialized as the row-major (r, g, b) tuple list the image-codec
    contract promises."""
    width, height, rgb = _decode_jpeg_arrays(payload)
    cols = rgb.T.tolist()
    return width, height, list(zip(cols[0], cols[1], cols[2]))


def synth_jpeg_payload(media_id: int) -> bytes:
    """Deterministic REAL baseline-JPEG bytes whose DECODE is exact:
    grayscale images tiled from constant 8x8 blocks whose values sit an
    EVEN offset from 128 — the DC coefficient 8*(v-128) = 16k is then
    divided exactly by the Annex-K luma DC quantum 16 at quality 50,
    every AC is zero, and the DC-only IDCT returns the constant
    2k + 128 = v bit-for-bit. The bitstream, huffman tables, dequant,
    IDCT, and crop paths are all fully real — only the INPUTS are
    chosen inside the codec's fixed point, so the oracle can restate
    the decoded pixel values as a closed form of the id (the same
    trick the PNG/BMP synth uses, adapted to a lossy codec)."""
    w = 6 + media_id % 17
    h = 5 + media_id % 11
    # vectorized tile build: v(x, y) = 128 + 2*(((id + 5*(x div 8)
    # + 11*(y div 8)) % 61) - 30), identical to the scalar tile loops
    bxs = np.arange(w) // 8
    bys = np.arange(h) // 8
    v = 128 + 2 * (((media_id + 5 * bxs[None, :] + 11 * bys[:, None])
                    % 61) - 30)
    pixels = np.repeat(v.reshape(-1, 1), 3, axis=1)
    return encode_jpeg(w, h, pixels, quality=50, grayscale=True)


def _decode_image_pixels_arrays(
    payload: bytes,
) -> tuple[int, int, "np.ndarray"]:
    """Sniff + decode a real image payload down to an (h*w, 3) int64
    RGB array — the form the batched stats stages consume."""
    if payload[:2] == b"BM":
        return _decode_bmp_arrays(payload)
    if payload[:1] == b"P":
        return _decode_ppm_arrays(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png_arrays(payload)
    if payload[:2] == b"\xFF\xD8":
        return _decode_jpeg_arrays(payload)
    if payload[:4] == b"GIF8":
        return _decode_gif_arrays(payload)
    raise ValueError("unknown image magic")


def decode_image_pixels(payload: bytes) -> tuple[int, int, list[tuple]]:
    """Sniff + decode a real image payload (BMP / binary PNM / PNG /
    baseline JPEG) down to its pixel values."""
    w, h, rgb = _decode_image_pixels_arrays(payload)
    return w, h, _pixels_to_tuples(rgb)


def pure_python_decode_backend(payload: bytes, media_type: str) -> dict:
    """A REAL decode backend needing no wheels: parses 24-bit BMP,
    binary PPM/PGM, 8-bit PNG (zlib inflate + all five row filters),
    baseline sequential JPEG (huffman + dequant + IDCT — the first
    LOSSY codec), and GIF87a/89a (full LZW with variable-width codes
    and dictionary resets) image streams plus RIFF/WAVE audio in PCM
    16-bit, IMA ADPCM, and G.711 mu-law — header fields AND the full
    pixel/sample payload (truncation raises).
    Audio maps to the shared metadata schema as width=height=0,
    n_frames=sample count; RIFF/AVI video decodes every frame both
    uncompressed (DIB) and Motion-JPEG ('MJPG' fourcc, each frame
    through the full JPEG codec). Unknown magics (MP4/webp and other
    codecs needing libraries) raise ValueError — route those to a
    codec-library backend."""
    payload = bytes(payload)
    if payload[:2] == b"BM":
        w, h, _ = _decode_bmp_arrays(payload)
        fmt = "bmp"
    elif payload[:8] == _PNG_SIG:
        w, h, _ = _decode_png_arrays(payload)
        fmt = "png"
    elif payload[:2] == b"\xFF\xD8":
        w, h, _ = _decode_jpeg_arrays(payload)
        fmt = "jpeg"
    elif payload[:4] == b"GIF8":
        w, h, _ = _decode_gif_arrays(payload)
        fmt = "gif"
    elif payload[:2] in (b"P6", b"P5"):
        _, w, h, _, _ = _ppm_header(payload)
        # full pixel validation (and gray replication) via the decoder
        w, h, _ = _decode_ppm_arrays(payload)
        fmt = "ppm" if payload[:2] == b"P6" else "pgm"
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _, _, samples = _decode_wav_arrays(payload)
        return {
            "width": 0, "height": 0, "n_frames": len(samples),
            "format": "wav",
        }
    elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        w, h, frames = _decode_avi_arrays(payload)
        return {
            "width": w, "height": h, "n_frames": len(frames),
            "format": "avi",
        }
    else:
        raise ValueError(
            f"pure_python_decode_backend: unknown magic {payload[:2]!r}"
        )
    return {"width": w, "height": h, "n_frames": 1, "format": fmt}


def synth_image_payload(media_id: int) -> bytes:
    """Deterministic REAL image bytes for a media id: ids cycle through
    the three real codecs — id % 3 == 0 encodes as 24-bit BMP, == 1 as
    P6 PPM, == 2 as 8-bit PNG (stored-block zlib framing so byte_len
    stays a closed form of the dimensions, with the per-row filter
    cycle exercising all five PNG filters on decode). Dimensions and
    pixel values are pure functions of the id, so the decoded metadata
    AND pixel sums are restatable in the oracle SQL while the bytes
    themselves exercise the real codecs."""
    w = 4 + media_id % 13
    h = 3 + media_id % 7
    pixels = (
        media_id + 3 * np.arange(w * h)[:, None] + np.arange(3)[None, :]
    ) % 256
    enc = (encode_bmp, encode_ppm, encode_png)[media_id % 3]
    return enc(w, h, pixels)


def media_table_synthetic_images(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL image byte streams
    (synth_image_payload): the plumbing and codec path a binaryFile-
    sourced table would take, with oracle-restatable metadata. Built in
    a mapInPandas stage (narrow, partition-preserving) like any decode
    stage would be."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_image_payload(int(i)) for i in ids],
                    "media_type": "image",
                    "meta": [{"source": "synthetic"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


def media_table_synthetic_jpeg(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL baseline-JPEG byte streams
    (synth_jpeg_payload — grayscale even-offset constant tiles, the
    codec's exact fixed point, so decoded pixel values stay
    oracle-restatable while the huffman/dequant/IDCT/crop path is fully
    exercised). Same mapInPandas shape as the BMP/PPM/PNG table."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_jpeg_payload(int(i)) for i in ids],
                    "media_type": "image",
                    "meta": [{"source": "synthetic-jpeg"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


_PIXEL_STATS_SCHEMA = (
    "media_id long, format string, width int, height int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long"
)


def _sniff_image_format(payload: bytes) -> str:
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"\xFF\xD8":
        return "jpeg"
    if payload[:4] == b"GIF8":
        return "gif"
    return "ppm" if payload[:2] == b"P6" else "pgm"


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """Per-image channel statistics computed FROM THE DECODED PIXELS —
    the stage that proves the codec path end-to-end: the pure-Python
    decoder parses each payload's pixel array inside a mapInPandas
    batch and reduces it to exact integer channel sums (means derive as
    sum/n downstream, an engine-exact division). Narrow, partition-
    preserving; the per-asset work is the decode itself, exactly where
    a real feature-extraction stage spends its time."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "format": [], "width": [], "height": [],
                "n_pixels": [], "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, rgb = _decode_image_pixels_arrays(payload)
                sums = rgb.sum(axis=0)
                out["media_id"].append(int(mid))
                out["format"].append(_sniff_image_format(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=_PIXEL_STATS_SCHEMA)


def fake_decode_backend(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decoder: metadata derived from the bytes.
    A real backend would call PIL.Image.open / av.open here."""
    n = len(payload)
    # image -> 'webp': JPEG graduated to the real decoder in r12 (PNG
    # did in r11), so the stand-in label is again a codec this
    # container genuinely can't read
    return {
        "width": 16 + n % 640,
        "height": 16 + (n * 7) % 480,
        "n_frames": 1 if media_type == "image" else 1 + n % 300,
        "format": {"image": "webp", "audio": "mp3", "video": "mp4"}.get(
            media_type, "bin"
        ),
    }


def unavailable_decode_backend(payload: bytes, media_type: str) -> dict:
    """The honest stub: raises until a codec library is provided."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this container; pass decode_backend=fake_decode_backend for "
        "plumbing tests or a PIL/av-backed callable in production"
    )


def decode_media(
    media: DataFrame,
    decode_backend: Callable[[bytes, str], dict] = unavailable_decode_backend,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow ships each partition
    as pandas batches, the backend runs per row inside the batch, output
    is columnar. Narrow (partition-preserving) — at 100 TB this is the
    pattern for any per-asset CPU work; repartition upstream to balance
    asset sizes, never collect."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decode_backend(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )

    return media.mapInPandas(_decode, schema=_DECODED_SCHEMA)


def resize_plan(
    decoded: DataFrame, max_side: int = 256
) -> DataFrame:
    """Resize planning is plain column math (JVM-side); only the pixel
    work itself needs the pandas stage."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.round(scale, 4).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def patch_plan(decoded: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch tiling plan: one row per (patch_row, patch_col)
    with pixel bounds, edge patches clipped to the image — the 1->N
    fan-out every vision-training pipeline runs between decode and the
    encoder. Pure JVM sequence explodes (no Python in the fan-out);
    the pixel work itself belongs in the pandas decode stage
    (decode_pixel_stats / a real preprocessor)."""
    n_rows = F.ceil(F.col("height") / patch).cast("int")
    n_cols = F.ceil(F.col("width") / patch).cast("int")
    return (
        decoded.select(
            "media_id", "width", "height",
            F.explode(F.sequence(F.lit(0), n_rows - 1)).alias("patch_row"),
            n_cols.alias("__nc"),
        )
        .select(
            "media_id", "width", "height", "patch_row",
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "patch_col"
            ),
        )
        .select(
            "media_id",
            "patch_row",
            "patch_col",
            (F.col("patch_col") * patch).alias("x0"),
            (F.col("patch_row") * patch).alias("y0"),
            F.least(F.col("patch_col") * patch + patch, F.col("width"))
            .alias("x1"),
            F.least(F.col("patch_row") * patch + patch, F.col("height"))
            .alias("y1"),
        )
    )


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled frame
    index (explode of a sequence — the UDTF shape, no Python)."""
    return decoded.filter(F.col("n_frames") > 1).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


# ---------------------------------------------------------------------------
# Real wheel-free audio codec: RIFF/WAVE PCM 16-bit
# ---------------------------------------------------------------------------


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode mono 16-bit PCM samples as a standard RIFF/WAVE byte
    stream (fmt + data chunks, little-endian) — the canonical layout
    every audio tool emits for uncompressed PCM."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size and (arr.min() < -32768 or arr.max() > 32767):
        raise ValueError("samples must fit int16")
    body = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(body),
                    b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(body)) + body
    )


def _decode_wav_arrays(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """decode_wav's engine, returning the samples as an int64 numpy
    array — PCM via one frombuffer, mu-law via a 256-entry LUT gather,
    ADPCM through the scalar recurrence (inherently sequential)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_body, fact_n, data = 12, None, b"", None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + size > len(payload):
            # fail closed on ANY chunk cut short of its declared size
            # (a truncated fmt/fact header must not escape as a
            # struct.error, and unknown truncated chunks are corrupt
            # payloads too)
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", payload, pos)
            fmt_body = payload[pos: pos + size]
        elif cid == b"fact" and size >= 4:
            (fact_n,) = struct.unpack_from("<I", payload, pos)
        elif cid == b"data":
            data = payload[pos: pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if audio_format == 0x11 and bits == 4:
        rate, ch, samples = _decode_ima_adpcm(
            fmt_body, channels, sample_rate, block_align, fact_n, data
        )
        return rate, ch, np.asarray(samples, dtype=np.int64)
    if audio_format == 7 and bits == 8:
        if channels != 1:
            raise ValueError("only mono mu-law supported")
        if fact_n is not None and fact_n != len(data):
            raise ValueError("mu-law fact count disagrees with data size")
        return sample_rate, 1, _MULAW_LUT[
            np.frombuffer(data, dtype=np.uint8)
        ]
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={audio_format} bits={bits})"
        )
    n = len(data) // 2
    return sample_rate, channels, np.frombuffer(
        data, dtype="<i2", count=n
    ).astype(np.int64)


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE byte stream: walks the chunk list (skipping
    unknown chunks, as a real parser must) and decodes the full sample
    array — PCM 16-bit directly, IMA ADPCM (format tag 0x11) through
    the real block decoder, and G.711 mu-law (tag 7) through the exact
    segmented expansion — two COMPRESSED encodings beside the raw one.
    Returns (sample_rate, channels, samples interleaved). Raises
    ValueError on non-WAV magic, missing fmt/data chunks, other
    encodings, or a truncated data chunk — this decodes the audio
    payload, not just the header."""
    rate, channels, samples = _decode_wav_arrays(payload)
    return rate, channels, samples.tolist()


def synth_audio_payload(media_id: int) -> bytes:
    """Deterministic REAL audio bytes for a media id: mono 16-bit PCM
    WAV at 8 kHz whose sample values are a pure function of the id —
    s_i = ((id*31 + i*17) % 2001) - 1000 over i in [0, 40 + id % 113).
    The decoded stats are restatable in oracle SQL while the bytes
    exercise the real RIFF parser (chunk walk, PCM validation, int16
    decode)."""
    n = 40 + media_id % 113
    samples = ((media_id * 31 + np.arange(n) * 17) % 2001) - 1000
    return encode_wav(8000, samples)


def media_table_synthetic_audio(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL WAV byte streams
    (synth_audio_payload) — the audio twin of
    media_table_synthetic_images, built in one narrow mapInPandas
    stage."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_audio_payload(int(i)) for i in ids],
                    "media_type": "audio",
                    "meta": [{"source": "synthetic"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


_AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_us long, "
    "sum_abs long, sum_sq long, zero_crossings long"
)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """Per-clip statistics computed FROM THE DECODED SAMPLES — the audio
    analogue of decode_pixel_stats: the RIFF parser decodes each
    payload's full PCM sample array inside a mapInPandas batch and
    reduces it to exact integer aggregates (abs-sum and square-sum, the
    integer cores of mean amplitude and RMS energy, plus strict
    sign-change zero crossings: s_{i-1}*s_i < 0). duration_us is exact
    integer microseconds. Narrow, partition-preserving; a wrong chunk
    walk, endianness, or int16 decode fails the oracle hash on the
    sample VALUES."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "n_samples": [],
                "duration_us": [], "sum_abs": [], "sum_sq": [],
                "zero_crossings": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, _, s = _decode_wav_arrays(bytes(payload))
                n = len(s)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_us"].append(n * 1_000_000 // rate)
                out["sum_abs"].append(int(np.abs(s).sum()))
                out["sum_sq"].append(int((s * s).sum()))
                out["zero_crossings"].append(
                    int((s[:-1] * s[1:] < 0).sum())
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=_AUDIO_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Real wheel-free video codec: uncompressed RIFF/AVI (DIB '00db' frames)
# ---------------------------------------------------------------------------


def _bgr_rows_decode_arrays(
    data: bytes, width: int, height: int, offset: int = 0
) -> "np.ndarray":
    """Decode a bottom-up, 4-byte-row-padded BGR pixel array (the DIB
    layout BMP bodies and uncompressed AVI frames share) into top-down
    row-major (h*w, 3) int64 RGB. Raises on truncation."""
    row_size = (3 * width + 3) // 4 * 4
    if len(data) < offset + row_size * height:
        raise ValueError("truncated DIB pixel array")
    return _dib_rows_to_rgb(data, width, height, offset, top_down=False)


def encode_avi(
    width: int, height: int, frames: list[list[tuple]], fps: int = 10
) -> bytes:
    """Encode RGB frames (each a top-down row-major (r, g, b) list) as
    a standard uncompressed RIFF/AVI: 'hdrl' LIST (avih main header +
    'strl' with a 'vids'/'DIB ' stream header and a 24-bit
    BITMAPINFOHEADER) followed by a 'movi' LIST of '00db' DIB frames —
    bottom-up padded BGR rows, the same layout as a BMP body."""
    row_size = (3 * width + 3) // 4 * 4
    frame_size = row_size * height

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return struct.pack("<4sI", cid, len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    def frame_bodies(frames) -> list[bytes]:
        # vectorized DIB rows for the WHOLE clip in one numpy pass:
        # flip to bottom-up, RGB->BGR, pad rows (same bytes as the
        # per-pixel loops)
        if any(len(f) != width * height for f in frames):
            raise ValueError("frame must hold width*height RGB tuples")
        if not frames:
            return []
        arr = np.asarray(frames, dtype=np.int64).reshape(
            len(frames), height, width, 3
        )
        if arr.size and (arr.min() < 0 or arr.max() > 255):
            raise ValueError("bytes must be in range(0, 256)")
        rows = np.zeros((len(frames), height, row_size), dtype=np.uint8)
        rows[:, :, : 3 * width] = (
            arr.astype(np.uint8)[:, ::-1, :, ::-1]
            .reshape(len(frames), height, 3 * width)
        )
        return [rows[i].tobytes() for i in range(len(frames))]

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0, len(frames),
        0, 1, frame_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0,
        len(frames), frame_size, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size,
        2835, 2835, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb)
                                 for fb in frame_bodies(frames)))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def _decode_avi_arrays(
    payload: bytes,
) -> tuple[int, int, list["np.ndarray"]]:
    """decode_avi's engine, returning each frame as an (h*w, 3) int64
    RGB array — the form the batched stats stages consume."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")

    def subchunks(data: bytes):
        pos = 0
        while pos + 8 <= len(data):
            cid, size = struct.unpack_from("<4sI", data, pos)
            if pos + 8 + size > len(data):
                # fail closed: a chunk cut short of its declared size
                # is a corrupt payload (ValueError), not a silently
                # truncated slice that struct.errors downstream
                raise ValueError(f"truncated AVI chunk {cid!r}")
            yield cid, data[pos + 8: pos + 8 + size]
            pos += 8 + size + (size & 1)

    avih = strf = None
    frames_raw: list[bytes] = []
    for cid, body in subchunks(payload[12:]):
        if cid != b"LIST":
            continue
        ltype, inner = body[:4], body[4:]
        if ltype == b"hdrl":
            for c2, b2 in subchunks(inner):
                if c2 == b"avih":
                    if len(b2) < 56:
                        raise ValueError("short AVI avih header")
                    avih = struct.unpack_from("<14I", b2)
                elif c2 == b"LIST" and b2[:4] == b"strl":
                    for c3, b3 in subchunks(b2[4:]):
                        if c3 == b"strf":
                            if len(b3) < 24:
                                raise ValueError("short AVI strf header")
                            strf = struct.unpack_from("<IiiHHI", b3)
        elif ltype == b"movi":
            for c2, b2 in subchunks(inner):
                if c2 in (b"00db", b"00dc"):
                    frames_raw.append(b2)
    if avih is None or strf is None:
        raise ValueError("AVI missing avih or strf header")
    n_frames, width, height = avih[4], avih[8], avih[9]
    _, bw, bh, _, bpp, compression = strf
    if bpp != 24 or compression not in (0, _MJPG_FOURCC):
        raise ValueError(
            f"unsupported AVI stream (bpp={bpp} compression={compression})"
        )
    if (bw, abs(bh)) != (width, height):
        raise ValueError("AVI stream dims disagree with main header")
    if len(frames_raw) != n_frames:
        raise ValueError(
            f"AVI frame count mismatch (header {n_frames}, "
            f"movi {len(frames_raw)})"
        )
    if compression == _MJPG_FOURCC:
        # Motion-JPEG: every frame is a complete baseline-JPEG stream
        # through the full codec; a frame whose decoded dims disagree
        # with the container header is corrupt (fail closed)
        out = []
        for f in frames_raw:
            fw, fh, pix = _decode_jpeg_arrays(f)
            if (fw, fh) != (width, height):
                raise ValueError(
                    "MJPEG frame dims disagree with AVI header"
                )
            out.append(pix)
        return width, height, out
    # uncompressed frames all share one DIB layout: validate lengths,
    # then decode the WHOLE clip in one numpy pass over the joined
    # bytes (identical values to the per-frame decode)
    row_size = (3 * width + 3) // 4 * 4
    if any(len(f) < row_size * height for f in frames_raw):
        raise ValueError("truncated DIB pixel array")
    if not frames_raw:
        return width, height, []
    if all(len(f) == row_size * height for f in frames_raw):
        arr = np.frombuffer(
            b"".join(frames_raw), dtype=np.uint8
        ).reshape(len(frames_raw), height, row_size)
        rgb = (
            arr[:, ::-1, : 3 * width]
            .reshape(len(frames_raw), height, width, 3)[:, :, :, ::-1]
            .reshape(len(frames_raw), -1, 3).astype(np.int64)
        )
        return width, height, list(rgb)
    return width, height, [
        _bgr_rows_decode_arrays(f, width, height) for f in frames_raw
    ]


def decode_avi(payload: bytes) -> tuple[int, int, list[list[tuple]]]:
    """Parse an uncompressed RIFF/AVI byte stream: walks the chunk
    tree (skipping unknown chunks), validates the 24-bit BI_RGB stream
    format, decodes EVERY '00db'/'00dc' DIB frame's pixel array, and
    cross-checks the frame count against the avih main header. Returns
    (width, height, frames) with frames as top-down row-major (r, g, b)
    lists. Raises ValueError on non-AVI magic, missing headers,
    compressed streams, truncated frames, or a frame-count mismatch."""
    width, height, arrs = _decode_avi_arrays(payload)
    return width, height, [_pixels_to_tuples(a) for a in arrs]


def synth_video_payload(media_id: int) -> bytes:
    """Deterministic REAL video bytes for a media id: an uncompressed
    RIFF/AVI whose dimensions, frame count, and pixel values are pure
    functions of the id — pixel i of frame f is
    ((id + 7f + 3i) % 256, +1, +2) over w = 4 + id % 9,
    h = 3 + id % 5, n_frames = 1 + id % 90 — so decoded stats are
    restatable in oracle SQL while the bytes exercise the real RIFF
    chunk-tree walk and per-frame DIB decode."""
    w, h, n = 4 + media_id % 9, 3 + media_id % 5, 1 + media_id % 90
    # closed form vectorized: frame f, pixel i, channel c is
    # (id + 7f + 3i + c) % 256 — identical values to the tuple loops
    base = (
        media_id
        + 7 * np.arange(n)[:, None, None]
        + 3 * np.arange(w * h)[None, :, None]
        + np.arange(3)[None, None, :]
    ) % 256
    return encode_avi(w, h, list(base))


def media_table_synthetic_videos(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL uncompressed AVI byte
    streams (synth_video_payload) — the video sibling of the image and
    audio builders, one narrow mapInPandas stage."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_video_payload(int(i)) for i in ids],
                    "media_type": "video",
                    "meta": [{"source": "synthetic"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


_VIDEO_STATS_SCHEMA = (
    "media_id long, width int, height int, n_frames int, n_pixels long, "
    "sum_r long, sum_g long, sum_b long"
)


def decode_video_stats(media: DataFrame) -> DataFrame:
    """Per-video channel statistics computed FROM THE DECODED FRAMES —
    the video analogue of decode_pixel_stats/decode_audio_stats: the
    AVI parser decodes every frame's DIB pixel array inside a
    mapInPandas batch and reduces the whole clip to exact integer
    channel sums. A wrong chunk walk, frame order, row padding, or
    BGR/bottom-up handling fails the oracle hash on the pixel VALUES
    across ALL frames."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [], "n_frames": [],
                "n_pixels": [], "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = _decode_avi_arrays(bytes(payload))
                sums = (
                    np.sum([f.sum(axis=0) for f in frames], axis=0)
                    if frames else np.zeros(3, dtype=np.int64)
                )
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["n_pixels"].append(w * h * len(frames))
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=_VIDEO_STATS_SCHEMA)


_PHASH_SCHEMA = "media_id long, format string, phash long"


def decode_perceptual_hash(
    media: DataFrame, grid_w: int = 4, grid_h: int = 3
) -> DataFrame:
    """MM08 — average-hash perceptual fingerprint FROM THE DECODED
    PIXELS: block-pool the grayscale image onto a ``grid_w x grid_h``
    grid (pixel (x, y) joins block ``(grid_h*y div h, grid_w*x div w)``
    — the standard pooling assignment, every block non-empty whenever
    dims >= grid), then one bit per block: block mean above the global
    mean. All EXACT integers — the comparison is the cross-multiplied
    ``block_sum * n_pixels > total_sum * block_n``, so no division ever
    happens and any engine restates it bit-for-bit. The near-dup-image
    primitive every multimodal corpus dedups with (aHash; pHash swaps
    the pooling for a DCT in the same plumbing). Narrow mapInPandas
    stage over the real codec path, like decode_pixel_stats."""

    def _phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "format": [], "phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                w, h, rgb = _decode_image_pixels_arrays(payload)
                gray = rgb.sum(axis=1)
                total = int(gray.sum())
                npix = w * h
                # vectorized block pooling: pixel (x, y) joins block
                # (grid_h*y div h, grid_w*x div w), exactly as before
                bidx = (
                    (grid_h * np.arange(h) // h)[:, None] * grid_w
                    + (grid_w * np.arange(w) // w)[None, :]
                ).reshape(-1)
                nb = grid_w * grid_h
                bsums = np.bincount(bidx, weights=gray, minlength=nb)
                bns = np.bincount(bidx, minlength=nb)
                bits = 0
                for b in range(nb):
                    if int(bsums[b]) * npix > total * int(bns[b]):
                        bits |= 1 << b
                out["media_id"].append(int(mid))
                out["format"].append(_sniff_image_format(payload))
                out["phash"].append(bits)
            yield pd.DataFrame(out)

    return media.mapInPandas(_phash, schema=_PHASH_SCHEMA)


def _frame_energies(payload: bytes, frame: int) -> "np.ndarray":
    """Per-frame integer energies (sum of squares over ``frame``-sample
    windows, final partial window included) of a WAV payload — the
    shared vectorized core of the VAD stages. Zero-padding the tail
    window is exact: zero samples add zero energy."""
    _, _, s = _decode_wav_arrays(payload)
    n = len(s)
    if not n:
        return np.zeros(0, dtype=np.int64)
    # reduceat handles the partial tail window natively — one pass,
    # no padded copy; integer sums, so values are exact and unchanged
    return np.add.reduceat(s * s, np.arange(0, n, frame))


_ACTIVE_FRAME_SCHEMA = "media_id long, frame_idx long"


def decode_active_frames(media: DataFrame, frame: int = 16) -> DataFrame:
    """MM09 stage 1 — energy-gated frame detection FROM THE DECODED
    SAMPLES (the VAD shape every speech-corpus pipeline fronts): the
    RIFF parser decodes each clip's PCM array, frames of ``frame``
    samples reduce to exact integer energies (sum of squares), and a
    frame is ACTIVE when its energy exceeds the clip average — the
    cross-multiplied comparison ``e * n_frames > total`` (mm08's trick:
    no division, any engine restates it). Emits one row per active
    frame; segmentation into maximal runs belongs to the caller
    (windows.coalesce_intervals over [f, f+1] — see mm09)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                energies = _frame_energies(bytes(payload), frame)
                total, nf = int(energies.sum()), len(energies)
                for f in np.flatnonzero(energies * nf > total).tolist():
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(f)
            yield pd.DataFrame(out)

    return media.mapInPandas(_frames, schema=_ACTIVE_FRAME_SCHEMA)


_SEGMENT_SCHEMA = (
    "media_id long, segment_id long, start_frame long, end_frame long, "
    "n_frames long"
)


def decode_energy_segments(media: DataFrame, frame: int = 16) -> DataFrame:
    """MM09's single-stage form, built for streams: a clip's payload
    arrives WHOLE in one row, so active-frame detection AND the
    maximal-run coalescing happen inside the same stateless pandas
    stage — no state store, no shuffle, segments out per micro-batch.
    Batch mm09 keeps the two-stage form (decode_active_frames +
    windows.coalesce_intervals) because its interval operator is shared
    with the event family; both produce identical segments (st21 pins
    that via the shared oracle)."""

    def _segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "segment_id": [], "start_frame": [],
                "end_frame": [], "n_frames": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                energies = _frame_energies(bytes(payload), frame)
                total, nf = int(energies.sum()), len(energies)
                act = np.flatnonzero(energies * nf > total)
                if not len(act):
                    continue
                # maximal runs of consecutive active frames, vectorized
                # (identical segments to the sequential coalescer)
                cuts = np.flatnonzero(np.diff(act) > 1)
                starts = act[np.concatenate(([0], cuts + 1))]
                ends = act[np.concatenate((cuts, [len(act) - 1]))]
                for seg, (st, en) in enumerate(
                    zip(starts.tolist(), ends.tolist())
                ):
                    out["media_id"].append(int(mid))
                    out["segment_id"].append(seg)
                    out["start_frame"].append(st)
                    out["end_frame"].append(en)
                    out["n_frames"].append(en - st + 1)
            yield pd.DataFrame(out)

    return media.mapInPandas(_segments, schema=_SEGMENT_SCHEMA)


# ---------------------------------------------------------------------------
# Real wheel-free image codec: GIF (LZW entropy coding, GIF87a/89a)
# ---------------------------------------------------------------------------


def _gif_lzw_encode(indices: list[int], mcs: int) -> bytes:
    """GIF-variant LZW compression of a palette-index stream:
    variable-width codes starting at mcs+1 bits, LSB-first packing,
    clear/EOI codes, dictionary growth to 4096 with a mid-stream CLEAR
    reset when full (the table-full path real encoders take)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = mcs + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w: tuple = ()
    for k in indices:
        if not 0 <= k < clear:
            raise ValueError("GIF palette index out of range for LZW root")
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # widen when a future code could reference the just-added
            # entry (decoder mirrors this one entry earlier — the
            # standard off-by-one the two sides must agree on)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = mcs + 1
        w = (k,)
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, n_expected: int) -> list[int]:
    """GIF-variant LZW decode, fail-closed: truncated bit stream,
    reference to an undefined code, missing EOI, or a pixel count that
    disagrees with the image size all raise ValueError."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"invalid GIF LZW min code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    code_size = mcs + 1
    pos_bits = 0
    total_bits = len(data) * 8
    base: list = [(i,) for i in range(clear)] + [None, None]
    table = list(base)
    tlen = len(table)
    out: list[int] = []
    n_out = 0
    prev: tuple | None = None
    extend = out.extend
    append = table.append
    while True:
        if pos_bits + code_size > total_bits:
            raise ValueError("truncated GIF LZW stream (no EOI)")
        byte0 = pos_bits >> 3
        chunk = int.from_bytes(data[byte0: byte0 + 3], "little")
        code = (chunk >> (pos_bits & 7)) & ((1 << code_size) - 1)
        pos_bits += code_size
        if code == clear:
            table = list(base)
            tlen = len(table)
            append = table.append
            code_size = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream must start with a root code")
            entry = table[code]
        elif code < tlen:
            entry = table[code]
            if entry is None:
                raise ValueError("GIF LZW code references clear/EOI slot")
        elif code == tlen:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW code references undefined entry")
        extend(entry)
        n_out += len(entry)
        if n_out > n_expected:
            raise ValueError("GIF pixel data overruns image size")
        if prev is not None and tlen < 4096:
            append(prev + entry[:1])
            tlen += 1
            if tlen == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if n_out != n_expected:
        raise ValueError("GIF pixel data length mismatch")
    return out


def encode_gif(
    width: int, height: int, pixels: list[tuple], palette: list[tuple]
) -> bytes:
    """Encode an indexed-color image as a standard GIF89a byte stream:
    logical screen descriptor, global color table (padded to a power of
    two), image descriptor, and REAL LZW-compressed pixel data in
    255-byte sub-blocks. ``pixels`` are (r, g, b) tuples that must each
    appear in ``palette``."""
    if not 2 <= len(palette) <= 256:
        raise ValueError("GIF palette must hold 2..256 colors")
    if len(pixels) != width * height:
        raise ValueError("pixels must hold width*height entries")
    bits = max(2, (len(palette) - 1).bit_length())
    size = 1 << bits
    pal = list(palette) + [(0, 0, 0)] * (size - len(palette))
    lut = {}
    for i, c in enumerate(palette):
        lut.setdefault(tuple(c), i)
    try:
        indices = [lut[tuple(p)] for p in pixels]
    except KeyError as exc:
        raise ValueError(f"pixel color {exc} not in GIF palette") from exc
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out.append(bits)  # LZW min code size
    lzw = _gif_lzw_encode(indices, bits)
    for i in range(0, len(lzw), 255):
        block = lzw[i: i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _gif_take_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain; ValueError on truncation."""
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(data), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block")
        data += payload[pos: pos + n]
        pos += n


def _decode_gif_arrays(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """decode_gif's engine, returning (h*w, 3) int64 RGB (palette
    mapping vectorized as a LUT gather)."""
    payload = bytes(payload)
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if not packed & 0x80:
        raise ValueError("GIF without a global color table unsupported")
    gct_n = 2 << (packed & 7)
    pos = 13
    if pos + 3 * gct_n > len(payload):
        raise ValueError("truncated GIF global color table")
    pal = [
        (payload[pos + 3 * i], payload[pos + 3 * i + 1],
         payload[pos + 3 * i + 2])
        for i in range(gct_n)
    ]
    pos += 3 * gct_n
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ends before an image descriptor")
        marker = payload[pos]
        pos += 1
        if marker == 0x2C:
            break
        if marker == 0x21:  # extension: label byte + sub-block chain
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _gif_take_subblocks(payload, pos)
            continue
        if marker == 0x3B:
            raise ValueError("GIF trailer before any image data")
        raise ValueError(f"unexpected GIF block 0x{marker:02x}")
    if pos + 9 > len(payload):
        raise ValueError("truncated GIF image descriptor")
    left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if ipacked & 0x80:
        raise ValueError("GIF local color table unsupported")
    if ipacked & 0x40:
        raise ValueError("interlaced GIF unsupported")
    if (left, top, iw, ih) != (0, 0, w, h):
        raise ValueError("GIF sub-frame geometry unsupported")
    if pos >= len(payload):
        raise ValueError("truncated GIF before LZW min code size")
    mcs = payload[pos]
    pos += 1
    data, pos = _gif_take_subblocks(payload, pos)
    indices = np.asarray(_gif_lzw_decode(data, mcs, w * h), dtype=np.int64)
    if indices.size and int(indices.max()) >= gct_n:
        raise ValueError("GIF pixel index outside the color table")
    # trailing extensions are legal; the trailer itself is required
    while pos < len(payload) and payload[pos] == 0x21:
        pos += 1
        if pos >= len(payload):
            raise ValueError("truncated GIF trailing extension")
        pos += 1
        _, pos = _gif_take_subblocks(payload, pos)
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("GIF missing trailer")
    return w, h, np.asarray(pal, dtype=np.int64)[indices]


def decode_gif(payload: bytes) -> tuple[int, int, list[tuple]]:
    """Parse a GIF87a/GIF89a byte stream down to its pixel values:
    global color table, extension skipping (sub-block walk), image
    descriptor, full LZW decode, palette mapping. Supported surface is
    the non-animated single-image core (global palette, no interlace,
    full-frame geometry); animation/interlace/local palettes raise
    ValueError (route to a codec library). Fail-closed throughout:
    truncation anywhere, undefined LZW codes, out-of-palette indices,
    geometry mismatch, or a missing trailer all raise ValueError."""
    w, h, rgb = _decode_gif_arrays(payload)
    return w, h, _pixels_to_tuples(rgb)


def synth_gif_payload(media_id: int) -> bytes:
    """Deterministic REAL GIF bytes for a media id: an 8-color palette
    and pixel indices that are pure functions of the id — palette slot
    j is ((3*id + 11*j) % 256, (5*id + 13*j) % 256, (7*id + 17*j) % 256)
    and pixel i uses slot (id + 7*i) % 8 over w = 5 + id % 14,
    h = 4 + id % 8 — so the decoded pixel sums are restatable in oracle
    SQL while the bytes exercise the full LZW path (variable-width
    codes, dictionary growth, sub-block framing). GIF is lossless, so
    unlike JPEG no fixed-point trick is needed: ANY input is
    oracle-exact."""
    w = 5 + media_id % 14
    h = 4 + media_id % 8
    palette = [
        ((3 * media_id + 11 * j) % 256, (5 * media_id + 13 * j) % 256,
         (7 * media_id + 17 * j) % 256)
        for j in range(8)
    ]
    pixels = [palette[(media_id + 7 * i) % 8] for i in range(w * h)]
    return encode_gif(w, h, pixels, palette)


def media_table_synthetic_gif(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL GIF89a byte streams
    (synth_gif_payload) — same narrow mapInPandas shape as the other
    synthetic media builders."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_gif_payload(int(i)) for i in ids],
                    "media_type": "image",
                    "meta": [{"source": "synthetic-gif"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real wheel-free COMPRESSED audio codec: IMA ADPCM (WAV format tag 0x11)
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step (exact integer arithmetic): apply a
    4-bit nibble to (predictor, step index) per the IMA/DVI spec —
    diff = step/8 + step*(mag bits), sign bit 8, predictor clamped to
    int16, index moved by the adaptation table and clamped to [0, 88].
    The encoder reuses this exact function so both sides share one
    arithmetic truth."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nibble & 7]))
    return pred, idx


def _decode_ima_adpcm(
    fmt_body: bytes,
    channels: int,
    sample_rate: int,
    block_align: int,
    fact_n: int | None,
    data: bytes,
) -> tuple[int, int, list[int]]:
    """Decode the data chunk of a mono IMA-ADPCM WAV, fail-closed:
    each block is a 4-byte header (int16 seed sample, step index,
    reserved) plus low-nibble-first packed 4-bit codes. The fact
    chunk's sample count is REQUIRED (it is how a compressed WAV says
    where the final partial block's padding starts) and must fit the
    blocks present."""
    if channels != 1:
        raise ValueError("only mono IMA ADPCM supported")
    if len(fmt_body) < 20:
        raise ValueError("IMA ADPCM fmt chunk missing samplesPerBlock")
    (samples_per_block,) = struct.unpack_from("<H", fmt_body, 18)
    if block_align < 5 or samples_per_block != (block_align - 4) * 2 + 1:
        raise ValueError(
            f"inconsistent IMA ADPCM framing (block_align={block_align} "
            f"samplesPerBlock={samples_per_block})"
        )
    if fact_n is None:
        raise ValueError("IMA ADPCM WAV missing fact chunk")
    if len(data) % block_align:
        raise ValueError("IMA ADPCM data is not whole blocks")
    n_blocks = len(data) // block_align
    if not n_blocks or fact_n > n_blocks * samples_per_block or (
        fact_n <= (n_blocks - 1) * samples_per_block
    ):
        raise ValueError("IMA ADPCM fact count disagrees with data size")
    samples: list[int] = []
    # the nibble loop below is _ima_step's arithmetic INLINED (same
    # integer ops in the same order — the function-call + tuple-return
    # overhead per 4-bit code was the decode's dominant cost; the
    # encoder and the pytest recurrence pins still exercise _ima_step
    # itself, keeping one shared arithmetic truth)
    step_tab = _IMA_STEP_TABLE
    idx_tab = _IMA_INDEX_TABLE
    append = samples.append
    for b in range(n_blocks):
        block = data[b * block_align: (b + 1) * block_align]
        pred, idx, reserved = struct.unpack_from("<hBB", block, 0)
        if idx > 88 or reserved:
            raise ValueError("corrupt IMA ADPCM block header")
        want = min(samples_per_block, fact_n - len(samples))
        append(pred)
        emitted = 1
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                if emitted == want:
                    break
                step = step_tab[idx]
                diff = step >> 3
                if nibble & 4:
                    diff += step
                if nibble & 2:
                    diff += step >> 1
                if nibble & 1:
                    diff += step >> 2
                pred = pred - diff if nibble & 8 else pred + diff
                if pred > 32767:
                    pred = 32767
                elif pred < -32768:
                    pred = -32768
                idx += idx_tab[nibble & 7]
                if idx > 88:
                    idx = 88
                elif idx < 0:
                    idx = 0
                append(pred)
                emitted += 1
    return sample_rate, 1, samples


def encode_adpcm_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode mono int16 samples as a REAL IMA-ADPCM WAV (format tag
    0x11): one block per run of samplesPerBlock, each seeded with its
    first sample verbatim plus the running step index, then 4-bit
    quantized residuals from the standard IMA encoder — the decoder's
    _ima_step applied to the chosen nibble keeps both sides in exact
    lockstep. Emits fmt (with the samplesPerBlock extension), fact
    (total true samples — how decoders distinguish final-block padding
    from audio), and data chunks. 4.06x smaller than PCM16 at the
    standard quality loss."""
    if any(s < -32768 or s > 32767 for s in samples):
        raise ValueError("samples must fit int16")
    if not samples:
        raise ValueError("cannot encode an empty IMA ADPCM stream")
    block_align = 256
    spb = (block_align - 4) * 2 + 1
    idx = 0
    body = bytearray()
    for start in range(0, len(samples), spb):
        chunk = samples[start: start + spb]
        pred = chunk[0]
        # the step index carries ACROSS blocks (standard encoder
        # practice — it tracks the signal's recent dynamics); any
        # value decodes correctly since it ships in the block header
        body += struct.pack("<hBB", pred, idx, 0)
        nibbles: list[int] = []
        for s in chunk[1:]:
            step = _IMA_STEP_TABLE[idx]
            delta = s - pred
            nib = 8 if delta < 0 else 0
            if delta < 0:
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            pred, idx = _ima_step(pred, idx, nib)
            nibbles.append(nib)
        nibbles += [0] * ((spb - 1) - len(nibbles))  # pad final block
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            body.append(lo | (hi << 4))
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        (sample_rate * block_align + spb - 1) // spb, block_align, 4,
        2, spb,
    )
    fact = struct.pack("<I", len(samples))
    return (
        struct.pack(
            "<4sI4s", b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(body), b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", len(fact)) + fact
        + struct.pack("<4sI", b"data", len(body)) + body
    )


def synth_adpcm_payload(media_id: int) -> bytes:
    """Deterministic REAL IMA-ADPCM WAV bytes whose DECODE is an exact
    closed recurrence: the NIBBLE stream itself is the pure function of
    the id — seed sample ((31*id) % 2001) - 1000, seed step index
    id % 89, nibble i = (7*id + 3*i) % 16 over n = 40 + id % 113 total
    samples (one block) — so the decoded sample values are the IMA
    recurrence over known inputs, restatable in oracle SQL as a
    recursive CTE over the same step tables. This is the JPEG
    fixed-point trick adapted to a stateful codec: the oracle follows
    the decoder's arithmetic instead of needing lossless round-trips."""
    n = 40 + media_id % 113
    pred0 = ((31 * media_id) % 2001) - 1000
    idx0 = media_id % 89
    n_nib = n - 1
    data_bytes = (n_nib + 1) // 2
    block_align = 4 + data_bytes + (data_bytes & 1)  # even data bytes
    spb = (block_align - 4) * 2 + 1
    nibbles = np.zeros(spb - 1, dtype=np.int64)
    nibbles[:n_nib] = (7 * media_id + 3 * np.arange(n_nib)) % 16
    packed = (nibbles[::2] | (nibbles[1::2] << 4)).astype(np.uint8)
    body = bytearray(struct.pack("<hBB", pred0, idx0, 0)) + packed.tobytes()
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, 8000,
        (8000 * block_align + spb - 1) // spb, block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", n)
    return (
        struct.pack(
            "<4sI4s", b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(body), b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", len(fact)) + fact
        + struct.pack("<4sI", b"data", len(body)) + body
    )


def media_table_synthetic_adpcm(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL IMA-ADPCM WAV byte streams
    (synth_adpcm_payload) — the compressed-audio sibling of
    media_table_synthetic_audio, one narrow mapInPandas stage."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_adpcm_payload(int(i)) for i in ids],
                    "media_type": "audio",
                    "meta": [{"source": "synthetic-adpcm"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real wheel-free compressed audio codec #2: G.711 mu-law (WAV tag 7)
# ---------------------------------------------------------------------------


def mulaw_decode_byte(b: int) -> int:
    """Expand one G.711 mu-law byte to a linear sample (exact integer
    closed form — no state, unlike ADPCM): complement, split
    sign/exponent/mantissa, rebuild ((mant<<3)+0x84)<<exp minus the
    bias. Range is +-32124 (the codec's clip)."""
    b = ~b & 0xFF
    mag = (((b & 0x0F) << 3) + 0x84) << ((b >> 4) & 7)
    mag -= 0x84
    return -mag if b & 0x80 else mag


# 256-entry expansion LUT so decode can gather a whole data chunk in
# one vectorized indexing pass (exact same values per byte)
_MULAW_LUT = np.array(
    [mulaw_decode_byte(b) for b in range(256)], dtype=np.int64
)


def mulaw_encode_sample(s: int) -> int:
    """Compress one linear int16 sample to a mu-law byte (G.711
    segmented companding): clip to 32635, bias, locate the exponent
    segment, take the 4 mantissa bits, complement."""
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    if s > 32635:
        s = 32635
    s += 0x84
    exp = 7
    mask = 0x4000
    while exp > 0 and not s & mask:
        exp -= 1
        mask >>= 1
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def encode_mulaw_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode mono int16 samples as a REAL G.711 mu-law WAV (format
    tag 7, 8 bits per sample — half the size of PCM16 at telephony
    quality): fmt with the (empty) cbSize extension, fact with the
    sample count, data = one companded byte per sample."""
    if any(s < -32768 or s > 32767 for s in samples):
        raise ValueError("samples must fit int16")
    body = bytes(mulaw_encode_sample(s) for s in samples)
    fmt = struct.pack(
        "<HHIIHHH", 7, 1, sample_rate, sample_rate, 1, 8, 0
    )
    fact = struct.pack("<I", len(samples))
    return (
        struct.pack(
            "<4sI4s", b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(body), b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", len(fact)) + fact
        + struct.pack("<4sI", b"data", len(body)) + body
    )


def synth_mulaw_payload(media_id: int) -> bytes:
    """Deterministic REAL mu-law WAV bytes: the BYTE stream is the
    closed form (byte i = (13*id + 7*i) % 256 over n = 50 + id % 97
    samples at 8 kHz), so the decoded samples are the stateless G.711
    expansion of known bytes — restatable in oracle SQL as pure column
    math per byte, no recursion (the contrast with ADPCM's recurrence
    is the point: two compressed codecs, two oracle disciplines)."""
    n = 50 + media_id % 97
    body = (
        ((13 * media_id + 7 * np.arange(n)) % 256)
        .astype(np.uint8).tobytes()
    )
    fmt = struct.pack("<HHIIHHH", 7, 1, 8000, 8000, 1, 8, 0)
    fact = struct.pack("<I", n)
    return (
        struct.pack(
            "<4sI4s", b"RIFF",
            4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(body), b"WAVE",
        )
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"fact", len(fact)) + fact
        + struct.pack("<4sI", b"data", len(body)) + body
    )


def media_table_synthetic_mulaw(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL mu-law WAV byte streams
    (synth_mulaw_payload), one narrow mapInPandas stage."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_mulaw_payload(int(i)) for i in ids],
                    "media_type": "audio",
                    "meta": [{"source": "synthetic-mulaw"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Real wheel-free compressed VIDEO codec: Motion-JPEG AVI ('00dc' frames)
# ---------------------------------------------------------------------------

_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list[list[tuple]],
    fps: int = 10,
    quality: int = 50,
    grayscale: bool = True,
) -> bytes:
    """Encode RGB frames as a REAL Motion-JPEG AVI: the same RIFF
    container as :func:`encode_avi` but the stream fourcc/compression
    is 'MJPG' and every '00dc' frame body is a complete baseline-JPEG
    byte stream from :func:`encode_jpeg` — the standard capture-card /
    webcam format, and the first COMPRESSED video here (each frame
    rides the full huffman/DCT codec)."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return struct.pack("<4sI", cid, len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    bodies = [
        encode_jpeg(width, height, f, quality=quality, grayscale=grayscale)
        for f in frames
    ]
    max_size = max(len(b) for b in bodies) if bodies else 0
    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_size * fps, 0, 0, len(frames),
        0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(frames), max_size, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, _MJPG_FOURCC, max_size,
        2835, 2835, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in bodies))
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def synth_mjpeg_payload(media_id: int) -> bytes:
    """Deterministic REAL Motion-JPEG AVI bytes whose decode is exact:
    every frame is the JPEG codec's fixed point (grayscale constant
    8x8 tiles at even offsets from 128 — the mm10 trick) with the
    frame index folded into the tile rule, so decoded pixel values
    across ALL frames stay a closed form of (id, frame):
    v = 128 + 2*(((id + 5*bx + 11*by + 7*f) % 61) - 30) over
    w = 6 + id % 9, h = 5 + id % 7, n_frames = 1 + id % 4."""
    w = 6 + media_id % 9
    h = 5 + media_id % 7
    n = 1 + media_id % 4
    bxs = np.arange(w) // 8
    bys = np.arange(h) // 8
    frames = []
    for f in range(n):
        v = 128 + 2 * (
            ((media_id + 5 * bxs[None, :] + 11 * bys[:, None] + 7 * f)
             % 61) - 30
        )
        frames.append(np.repeat(v.reshape(-1, 1), 3, axis=1))
    return encode_avi_mjpeg(w, h, frames, quality=50, grayscale=True)


def media_table_synthetic_mjpeg(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """A media table whose payloads are REAL Motion-JPEG AVI byte
    streams (synth_mjpeg_payload), one narrow mapInPandas stage."""

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": [synth_mjpeg_payload(int(i)) for i in ids],
                    "media_type": "video",
                    "meta": [{"source": "synthetic-mjpeg"}] * len(ids),
                }
            )

    return docs.select(id_col).mapInPandas(_make, schema=MEDIA_SCHEMA)
