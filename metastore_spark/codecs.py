"""Real image codecs in pure stdlib — PNG (RFC 2083) encode/decode.

The container has no PIL/ffmpeg, but PNG needs only ``zlib`` (inflate/
deflate + crc32), so the decode path here is a REAL codec for a real
format, not a stub: chunk parsing, IDAT reassembly, inflate, and full
scanline unfiltering (all five filter types — None/Sub/Up/Average/
Paeth, per the PNG spec §6). The encoder deliberately CYCLES the five
filters row-by-row so a decoder bug in any unfilter branch corrupts
pixel values and fails the value-hash oracle downstream.

Supported subset: 8-bit greyscale (colour type 0) and 8-bit RGB
(colour type 2), non-interlaced — the shapes a feature-extraction
pipeline normalizes to anyway. Anything else raises ``ValueError``
with the offending header field, never a silent wrong answer.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(
    width: int, height: int, pixels: bytes, channels: int = 1
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` ∈ {1, 3}) as a
    spec-compliant PNG. Filter type cycles row % 5 — every unfilter
    branch in any conforming decoder gets exercised."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {stride}*{height}"
        )
    colour_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, colour_type, 0, 0, 0)

    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            for i, x in enumerate(row):
                a = row[i - channels] if i >= channels else 0
                raw.append((x - a) & 0xFF)
        elif ft == 2:  # Up
            for i, x in enumerate(row):
                raw.append((x - prev[i]) & 0xFF)
        elif ft == 3:  # Average
            for i, x in enumerate(row):
                a = row[i - channels] if i >= channels else 0
                raw.append((x - (a + prev[i]) // 2) & 0xFF)
        else:  # Paeth
            for i, x in enumerate(row):
                a = row[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                raw.append((x - _paeth(a, prev[i], c)) & 0xFF)
        prev = row
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, raw pixel bytes).

    Full chunk walk: IHDR validated, multiple IDAT chunks reassembled
    in order (the spec allows splitting anywhere), ancillary chunks
    skipped, inflate, then per-row unfilter of all five filter types.
    """
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        crc_stored = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc_stored:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype == 0:
                channels = 1
            elif ctype == 2:
                channels = 3
            else:
                raise ValueError(f"unsupported colour type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("non-standard compression/filter method")
            if ilace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != ({stride}+1)*{height}"
        )
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + a) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft} on row {r}")
        out[r * stride : (r + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)
