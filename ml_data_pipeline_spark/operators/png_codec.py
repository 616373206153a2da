"""Minimal pure-Python PNG codec (stdlib zlib only).

Vendored so the REAL image-decode path of the multimodal operators
(reference analog: the image reader's eager decode,
ml-data-readers/src/image.rs:160-500) executes even in containers
without pillow: ``multimodal.decode_image_real`` falls back to
:func:`decode_png` for PNG payloads when PIL is not importable, so the
codec path is verifiable everywhere instead of skipping.

Scope (deliberately the PNG core, not a general imaging library):

- critical chunks IHDR / PLTE / IDAT / IEND; ancillary chunks skipped;
- bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); no interlacing (Adam7 raises);
- all five scanline filters (None/Sub/Up/Average/Paeth) per the spec;
- grayscale conversion with pillow's exact ITU-R 601-2 integer
  truncation — L = (R*299 + G*587 + B*114) // 1000 — so the pure path
  and the PIL path agree byte-for-byte on shared inputs.

:func:`encode_png` is the test-side twin: a valid writer for gray/RGB
payloads with a selectable per-row filter type, used to exercise every
unfilter branch without an external encoder.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(payload: bytes):
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    off = 8
    while off + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[off : off + 4])
        ctype = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack(">I", payload[off + 8 + ln : off + 12 + ln])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        off += 12 + ln
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG to ``(height, width, gray_pixels)`` where
    ``gray_pixels`` is ``height*width`` luminance bytes, row-major."""
    width = height = None
    color_type = bit_depth = None
    palette = b""
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
            if bit_depth != 8:
                raise ValueError(f"bit depth {bit_depth} not supported")
            if color_type not in _CHANNELS:
                raise ValueError(f"color type {color_type} not supported")
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and not palette:
        raise ValueError("palette PNG missing PLTE")
    raw = zlib.decompress(bytes(idat))
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")

    # unfilter scanlines (spec §6): prev = reconstructed previous row
    out = bytearray(height * stride)
    prev = bytes(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)

    # channel → luminance (pillow's convert("L"): integer truncation)
    gray = bytearray(height * width)
    if color_type == 0:
        gray[:] = out
    elif color_type == 4:  # gray + alpha: luminance is the gray channel
        gray[:] = out[0::2]
    else:
        if color_type == 3:
            rgb = bytearray(height * width * 3)
            for i, idx in enumerate(out):
                if idx * 3 + 3 > len(palette):
                    # short slice-assignment would silently CONTRACT
                    # the buffer and misalign every later pixel
                    raise ValueError(
                        f"palette index {idx} out of range "
                        f"({len(palette) // 3} PLTE entries)"
                    )
                rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        elif color_type == 6:
            rgb = bytearray(height * width * 3)
            rgb[0::3] = out[0::4]
            rgb[1::3] = out[1::4]
            rgb[2::3] = out[2::4]
        else:  # color_type == 2
            rgb = out
        for i in range(height * width):
            r, g, b = rgb[i * 3], rgb[i * 3 + 1], rgb[i * 3 + 2]
            gray[i] = (r * 299 + g * 587 + b * 114) // 1000
    return height, width, bytes(gray)


def _filter_row(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply filter ``ftype`` to a raw row (encoder side — the inverse
    of the decode unfilter, used to exercise every decode branch)."""
    n = len(line)
    out = bytearray(n)
    for x in range(n):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (gray or RGB, row-major) as a valid PNG,
    filtering every row with ``filter_type`` (0-4)."""
    if color_type not in (0, 2):
        raise ValueError("encoder supports gray (0) and RGB (2)")
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match dimensions")
    body = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        body.append(filter_type)
        body += _filter_row(filter_type, line, prev, bpp)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body)))
        + _chunk(b"IEND", b"")
    )
