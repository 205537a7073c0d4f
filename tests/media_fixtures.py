"""Real media fixture bytes built with stdlib only — valid enough for
any conformant parser (PNG with correct CRCs and zlib IDAT; JPEG with
JFIF APP0 + SOF0; GIF89a screen descriptor; WAV via the `wave` module)."""

from __future__ import annotations

import io
import struct
import wave
import zlib


# moved to the library so catalog queries can build deterministic
# synthetic corpora without importing tests (r06); re-exported here
# so existing fixtures keep working
from openetl_spark.operators.media_synth import _png_chunk, make_png, make_wav  # noqa: F401,E402


def make_jpeg(width: int, height: int) -> bytes:
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\xf7\x00\x00" + b"\x3b"


def make_animated_gif(
    width: int,
    height: int,
    frames: list[tuple[int, int, int, int, int]],
) -> bytes:
    """GIF89a animation with a global color table and one image
    descriptor per frame: each entry is (left, top, w, h, delay_cs),
    preceded by a Graphic Control Extension carrying the delay. LZW
    payloads are structurally valid sub-blocks (a parser can walk and
    slice them) carrying placeholder data — frame NAVIGATION is what
    these fixtures pin, pixel decode stays codec territory."""
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", width, height)
    out += b"\xf7\x00\x00"  # global color table flag, 256 entries
    out += bytes(3 * 256)  # the table
    # Netscape looping extension (real files carry it; parsers must skip)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for left, top, w, h, delay_cs in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out += b"\x07"  # LZW minimum code size
        payload = bytes((w * h) % 251 for _ in range(min(w * h, 64)))
        out += bytes([len(payload)]) + payload + b"\x00"
    out += b"\x3b"
    return bytes(out)


def _gif_lzw_encode(mcs: int, indices: list[int]) -> bytes:
    """Standard GIF LZW compressor (spec appendix F): dictionary build,
    variable code width with the 12-bit cap and reset-on-full, codes
    packed LSB-first. Exercises every decoder path including KwKwK."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    width = mcs + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    run: tuple[int, ...] = ()
    for v in indices:
        cand = run + (v,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder builds its table ONE entry behind the encoder
            # (it learns entry k only on the code after the one that
            # created k), so the encoder widens when the DECODER's
            # next_code (= ours - 1) hits 2^width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        run = (v,)
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif_with_pixels(
    palette: list[tuple[int, int, int]],
    rows: list[list[int]],
    delay_cs: int = 0,
) -> bytes:
    """GIF89a with one REAL frame: palette padded to a power of two,
    pixel indices LZW-compressed with the real encoder above, data
    split into spec-sized sub-blocks — decodable by any conformant
    reader."""
    height = len(rows)
    width = len(rows[0]) if rows else 0
    size_exp = 1
    while (2 << size_exp) < len(palette) or size_exp < 1:
        size_exp += 1
    n_colors = 2 << size_exp
    table = bytearray()
    for r, g, b in palette:
        table += bytes((r, g, b))
    table += bytes(3 * (n_colors - len(palette)))
    mcs = max(size_exp + 1, 2)
    indices = [v for row in rows for v in row]
    lzw = _gif_lzw_encode(mcs, indices)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", width, height)
    out += bytes([0x80 | size_exp]) + b"\x00\x00" + table
    out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out += bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
