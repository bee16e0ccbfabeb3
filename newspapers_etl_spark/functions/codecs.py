"""Real stdlib-pure media codecs for the multimodal operators.

The reference pipeline streams genuine JP2 page images and verifies the
bytes end-to-end (reference src/01-scrape-images.py:353-385, MD5 audit
:78-83,126-131).  This container ships no codec libraries (no PIL, no
cv2, no ffmpeg), so the multimodal decode path implements two REAL
codecs from the standard library alone:

- PNG (ISO/IEC 15948): a complete encoder/decoder pair.  The decoder
  parses the signature, walks the chunk stream verifying every CRC-32,
  reads IHDR, concatenates + inflates IDAT with ``zlib``, and
  reconstructs scanlines through all five PNG filter types (None / Sub /
  Up / Average / Paeth).  The encoder applies varying filter types per
  scanline so round-trip tests exercise every reconstruction branch.
- WAV (RIFF/WAVE, 16-bit PCM): encoded and decoded with the stdlib
  ``wave`` module + ``struct``; frame windows over the PCM samples model
  the video-frame / audio-window fan-out.

Grayscale (color type 0) and truecolor RGB (color type 2), bit depth 8,
no interlace — the subset the fixtures generate; anything else raises
``PngError`` loudly rather than mis-decoding.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (only the types we emit)
_CHANNELS = {0: 1, 2: 3}


class PngError(ValueError):
    """Raised on any malformed PNG byte stream (bad signature, CRC
    mismatch, unsupported IHDR combination, bad filter byte, short
    pixel data)."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw interleaved 8-bit pixels into a genuine PNG stream.

    ``pixels`` must hold exactly ``width * height * channels`` bytes.
    Each scanline is filtered with type ``y % 5`` so every PNG filter
    appears in the output — the decoder must implement all five to
    round-trip, which is exactly what the tests assert.
    """
    if channels not in (1, 3):
        raise PngError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    bpp = channels
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        raw = pixels[y * stride : (y + 1) * stride]
        ft = y % 5
        out.append(ft)
        if ft == 0:  # None
            out += raw
        elif ft == 1:  # Sub
            out += bytes(
                (raw[i] - (raw[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            out += bytes((raw[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            out += bytes(
                (raw[i] - (((raw[i - bpp] if i >= bpp else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            out += bytes(
                (
                    raw[i]
                    - _paeth(
                        raw[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = raw
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Fully decode a PNG byte stream: returns (width, height, channels,
    raw interleaved pixels).  Verifies the signature and every chunk
    CRC-32, inflates IDAT, and reconstructs all five filter types.
    Raises :class:`PngError` on any structural defect."""
    if payload[:8] != _PNG_SIG:
        raise PngError("bad PNG signature")
    pos = 8
    ihdr: bytes | None = None
    idat = bytearray()
    ended = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise PngError("missing IHDR or IEND")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in _CHANNELS or comp or filt or interlace:
        raise PngError(
            f"unsupported IHDR: depth={depth} color={color_type} "
            f"interlace={interlace}"
        )
    channels = _CHANNELS[color_type]
    stride = width * channels
    bpp = channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # corrupt deflate stream
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"pixel data {len(raw)} != expected {(stride + 1) * height}"
        )
    pixels = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        rec = bytearray(stride)
        if ft == 0:
            rec[:] = line
        elif ft == 1:
            for i in range(stride):
                rec[i] = (line[i] + (rec[i - bpp] if i >= bpp else 0)) & 0xFF
        elif ft == 2:
            for i in range(stride):
                rec[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                rec[i] = (
                    line[i]
                    + (((rec[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)
                ) & 0xFF
        elif ft == 4:
            for i in range(stride):
                rec[i] = (
                    line[i]
                    + _paeth(
                        rec[i - bpp] if i >= bpp else 0,
                        prev[i],
                        prev[i - bpp] if i >= bpp else 0,
                    )
                ) & 0xFF
        else:
            raise PngError(f"bad filter byte {ft} on scanline {y}")
        pixels += rec
        prev = bytes(rec)
    return width, height, channels, bytes(pixels)


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE 16-bit PCM mono) via the stdlib wave module
# ---------------------------------------------------------------------------

WAV_RATE = 8000


def encode_wav(samples: list[int], rate: int = WAV_RATE) -> bytes:
    """Encode signed 16-bit PCM samples into a genuine RIFF/WAVE stream."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse a RIFF/WAVE stream back to (sample_rate, PCM samples).
    Raises ``wave.Error`` on malformed containers."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV layout: {w.getnchannels()}ch "
                f"{w.getsampwidth()}B"
            )
        rate = w.getframerate()
        n = w.getnframes()
        data = w.readframes(n)
    return rate, list(struct.unpack(f"<{n}h", data))
