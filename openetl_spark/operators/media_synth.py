"""Deterministic synthetic media corpora — the oracle-side fixture
factory for the multimodal near-dup miners (r06, VERDICT #3).

The reference treats media as opaque buffers end-to-end (S3 adapter,
`/root/reference/adapters/s3/src/index.ts:167-177`); the perceptual
miners here are beyond-reference surface, and their MINING stage is
pure relational algebra over 64-bit fingerprints. These generators
produce byte-identical corpora on every run (all randomness is md5 of
fixed strings), so the real decoders' fingerprints can be persisted
once and a DuckDB oracle can re-derive the whole candidates → hamming
→ pairs pipeline — leaving only the Python decode step test-pinned.

The construction targets the fingerprint algebra directly:

* images: 16×16 grayscale PNGs whose 8×8 aHash equals a chosen 64-bit
  pattern EXACTLY — each hash cell is a uniform 2×2 block at luma 200
  (bit 1) or 50 (bit 0); nearest-neighbor 8×8 resample recovers the
  block value and the 64-cell mean always falls strictly between the
  two levels, so flipping d cells moves the aHash by exactly d bits.
* audio: 16-bit PCM WAVs of 65 constant-amplitude windows (64 samples
  each) — the energy-delta fingerprint's window RMS is the amplitude
  itself, so a ±step amplitude walk realizes any chosen delta-bit
  sequence exactly, and a volume-scaled copy is fingerprint-identical
  by construction.

``make_png`` / ``make_wav`` are the PNG/WAV encoders the test suite
has used since r05 (moved here so library code can build corpora
without importing tests; ``tests/media_fixtures.py`` re-exports them).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def make_png(
    width: int,
    height: int,
    pixels: list | None = None,
    filter_type: int = 0,
) -> bytes:
    """8-bit RGB PNG. ``pixels`` = rows of (r, g, b); default all-black.
    ``filter_type`` applies that PNG scanline filter to every row
    (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) — the encoder side of the
    spec §9 math, so decoder tests can exercise each filter path."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    if pixels is None:
        pixels = [[(0, 0, 0)] * width for _ in range(height)]
    stride = width * 3
    prev = bytes(stride)
    raw = bytearray()
    for row in pixels:
        cur = bytes(v for px in row for v in px)
        filt = bytearray(cur)
        if filter_type == 1:
            for i in range(stride - 1, 2, -1):
                filt[i] = (cur[i] - cur[i - 3]) & 0xFF
        elif filter_type == 2:
            for i in range(stride):
                filt[i] = (cur[i] - prev[i]) & 0xFF
        elif filter_type == 3:
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                filt[i] = (cur[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[i] = (cur[i] - pred) & 0xFF
        raw += bytes([filter_type]) + bytes(filt)
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def make_wav(
    sample_rate: int,
    seconds: float,
    channels: int = 1,
    tone_hz: float | None = None,
    amplitude: float = 0.5,
) -> bytes:
    """16-bit PCM WAV. Default payload is silence; ``tone_hz`` writes a
    sine at ``amplitude`` (of full scale) so sample-decode features
    (rms/peak) have known expected values."""
    import math

    n = int(sample_rate * seconds)
    if tone_hz is None:
        frames = bytes(n * 2 * channels)
    else:
        samples = [
            int(amplitude * 32767 * math.sin(2 * math.pi * tone_hz * i / sample_rate))
            for i in range(n)
        ]
        frames = b"".join(struct.pack("<h", s) * channels for s in samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)  # 16-bit
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def make_bmp(width: int, height: int, pixels: list) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): rows stored
    BOTTOM-UP, BGR order, padded to 4-byte boundaries — the layout
    quirks decode_bmp_pixels must reverse. ``pixels`` = rows of
    (r, g, b), top-down like make_png's."""
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(pixels):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += bytes(stride - len(line))  # row padding
        body += line
    pixel_off = 14 + 40
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    return header + info + bytes(body)


def make_ppm(width: int, height: int, pixels: list, comment: str | None = None) -> bytes:
    """Binary P6 PNM at maxval 255; optional header comment exercises
    the '#'-skip path of the parser."""
    hdr = b"P6\n"
    if comment is not None:
        hdr += b"# " + comment.encode() + b"\n"
    hdr += f"{width} {height}\n255\n".encode()
    return hdr + bytes(v for row in pixels for px in row for v in px)


def make_pgm(width: int, height: int, gray_rows: list) -> bytes:
    """Binary P5 (grayscale) PNM at maxval 255."""
    return f"P5\n{width} {height}\n255\n".encode() + bytes(
        v for row in gray_rows for v in row
    )


def _bits64(seed: str) -> list[int]:
    """64 deterministic bits from md5(seed), MSB-first, guaranteed
    non-degenerate (at least one 0 and one 1)."""
    d = hashlib.md5(seed.encode()).digest()[:8]
    bits = [(byte >> (7 - i)) & 1 for byte in d for i in range(8)]
    if all(b == bits[0] for b in bits):  # 2^-63 event, but deterministic
        bits[-1] ^= 1
    return bits


def _flip_positions(seed: str, d: int) -> list[int]:
    """``d`` distinct cell indices in [0, 64) drawn from md5(seed)."""
    out: list[int] = []
    counter = 0
    while len(out) < d:
        h = hashlib.md5(f"{seed}:{counter}".encode()).digest()
        for byte in h:
            p = byte % 64
            if p not in out:
                out.append(p)
                if len(out) == d:
                    break
        counter += 1
    return out


def _pattern_png(bits: list[int]) -> bytes:
    """16×16 PNG whose aHash is exactly ``bits`` (row-major, bit 63 =
    top-left): hash cell (r, c) = uniform 2×2 block at luma 200/50."""
    px = [
        [
            ((200, 200, 200) if bits[(y // 2) * 8 + (x // 2)] else (50, 50, 50))
            for x in range(16)
        ]
        for y in range(16)
    ]
    return make_png(16, 16, px)


def synthetic_image_corpus() -> list[tuple[str, bytes]]:
    """(path, png_bytes) rows: 10 groups of {base, 1-bit variant, 2-bit
    variant, 9-bit outlier} plus one undecodable JPEG. Within a group
    the aHash hamming distances are exactly the flip counts; across
    groups patterns are independent md5 draws (~32 apart). The 9-bit
    outlier sits beyond the k=6 mining budget by design — the miner
    must NOT pair it with its base."""
    rows: list[tuple[str, bytes]] = []
    for g in range(10):
        base = _bits64(f"img-group-{g}")
        rows.append((f"img/g{g}/base.png", _pattern_png(base)))
        for name, d in (("near1", 1), ("near2", 2), ("far", 9)):
            bits = list(base)
            for p in _flip_positions(f"img-group-{g}-{name}", d):
                bits[p] ^= 1
            rows.append((f"img/g{g}/{name}.png", _pattern_png(bits)))
    # minimal JFIF header+EOI: parseable dims, undecodable pixels — the
    # crash-guard path must drop it (NULL hash), not abort the job
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, 16, 16, 3) + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )
    rows.append(("img/undecodable.jpg", jpeg))
    return rows


def _walk_wav(bits: list[int], scale: float = 1.0) -> bytes:
    """WAV of 65 constant-amplitude windows (64 samples each) whose
    energy-delta fingerprint is exactly ``bits``: amplitude rises 250
    for a 1-bit, falls 250 for a 0-bit, from 16500 (range stays within
    [500, 32500]·scale, strictly monotone per delta at any scale)."""
    amp = 16500.0
    amps = [amp]
    for b in bits:
        amp = amp + 250.0 if b else amp - 250.0
        amps.append(amp)
    frames = b"".join(
        struct.pack("<h", int(a * scale)) * 64 for a in amps
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(frames)
    return buf.getvalue()


def synthetic_audio_corpus() -> list[tuple[str, bytes]]:
    """(path, wav_bytes) rows: 8 groups of {base, half-volume copy
    (fingerprint-identical — the Haitsma–Kalker invariance), 3-bit
    variant, 9-bit outlier} plus one undecodable payload."""
    rows: list[tuple[str, bytes]] = []
    for g in range(8):
        base = _bits64(f"aud-group-{g}")
        rows.append((f"aud/g{g}/base.wav", _walk_wav(base)))
        rows.append((f"aud/g{g}/halfvol.wav", _walk_wav(base, scale=0.5)))
        for name, d in (("near3", 3), ("far", 9)):
            bits = list(base)
            for p in _flip_positions(f"aud-group-{g}-{name}", d):
                bits[p] ^= 1
            rows.append((f"aud/g{g}/{name}.wav", _walk_wav(bits)))
    rows.append(("aud/undecodable.bin", b"RIFFnot-really-a-wav"))
    return rows
