"""Pure-stdlib PNG codec (zlib + struct): the dependency-free real
decode path for the multimodal operators.

The sandbox has no pillow, but PNG's baseline profile (8-bit depth,
gray/RGB/gray+alpha/RGBA, non-interlaced — RFC 2083) is small enough to
implement portably: inflate the IDAT stream, undo the five per-scanline
filters, emit a flat pixel buffer.  ``operators/multimodal.py`` prefers
PIL when importable (C-speed, every format) and falls back here for
PNG payloads, so ``fake_decode=False`` is a working path in this
environment rather than a stub.

Pure-Python filter reconstruction is O(pixels) interpreted bytecode —
fine for the thumbnail/fingerprint sizes the operators feed it, and at
cluster scale the decode runs data-parallel inside ``mapInPandas``
partitions regardless of which codec backs it.

The encoder exists for tests and fixtures (filter 0 on every scanline,
one IDAT chunk) and round-trips through any standards-compliant reader.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (palette intentionally unsupported:
# it needs PLTE indirection and is absent from generated fixtures)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline PNG → ``(width, height, channels, pixels)``
    with ``pixels`` a flat row-major buffer of 8-bit samples.

    Raises ``ValueError`` for non-PNG payloads and
    ``NotImplementedError`` for profiles outside baseline (16-bit,
    palette, interlaced)."""
    if not is_png(data):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    header = None
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + 4  # payload + CRC
        if typ == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if header is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype, _comp, _filt, interlace = header
    if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise NotImplementedError(
            f"only baseline 8-bit non-interlaced PNG supported "
            f"(depth={depth}, color_type={ctype}, interlace={interlace})"
        )
    channels = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode a flat 8-bit pixel buffer as a baseline PNG (filter 0)."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def to_grayscale(pixels: bytes, channels: int) -> bytes:
    """Integer ITU-R 601 luma (the classic 77/151/28 >> 8 weights);
    alpha channels are ignored."""
    if channels == 1:
        return pixels
    if channels == 2:  # gray + alpha
        return pixels[::2]
    out = bytearray(len(pixels) // channels)
    for i in range(len(out)):
        base = i * channels
        out[i] = (
            77 * pixels[base] + 151 * pixels[base + 1] + 28 * pixels[base + 2]
        ) >> 8
    return bytes(out)


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    out_w: int,
    out_h: int,
) -> bytes:
    """Nearest-neighbor resample (floor source-index mapping) — the
    deterministic resize used by both codec backends so thumb
    fingerprints never depend on which decoder produced the pixels."""
    out = bytearray(out_w * out_h * channels)
    for oy in range(out_h):
        sy = oy * height // out_h
        row = sy * width * channels
        orow = oy * out_w * channels
        for ox in range(out_w):
            sx = ox * width // out_w
            for c in range(channels):
                out[orow + ox * channels + c] = pixels[row + sx * channels + c]
    return bytes(out)
