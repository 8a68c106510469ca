"""Pure-Python multimodal codecs — real PNG and WAV encode/decode with
only stdlib (zlib, struct), so the multimodal pipeline exercises
genuine container formats even though this environment ships no native
image/audio libraries (reference north star: multimodal asset columns;
the Spark-side plumbing lives in operators/multimodal.py).

Scope (deliberately minimal but REAL):
- PNG: 8-bit greyscale (color type 0) and RGB (color type 2),
  non-interlaced; full scanline unfiltering (None/Sub/Up/Average/Paeth)
  and multi-IDAT reassembly. The encoder can emit any fixed filter
  type, which gives the decoder's unfilter paths honest test coverage.
- WAV: PCM 16-bit (format tag 1), any channel count/sample rate; the
  chunk walker skips unknown chunks (LIST, fact, ...) like a real
  RIFF reader.

Anything outside that scope raises ``ValueError`` — corrupt or
unsupported payloads must be *detectably* bad, not silently wrong,
because at 100 TB the decode step runs inside ``mapInPandas`` where a
silent misdecode poisons downstream features invisibly.

This module must stay self-contained (stdlib + numpy only, no
package-relative imports): it is shipped to Python workers by VALUE via
``cloudpickle.register_pickle_by_value`` (see multimodal.py), which
re-pickles every global the functions touch — stdlib/numpy globals are
referenced by name and resolve on any worker.

Hot-loop discipline (this code runs inside ``mapInPandas`` at 100 TB):
encode filters are defined on ORIGINAL pixel values, so all five
vectorise as whole-image numpy expressions. Decode unfilters None/Sub/Up
as whole-scanline numpy ops (Sub is a per-channel byte cumsum — addition
mod 256 distributes over the prefix sum); Average and Paeth are
*spec-sequential* within a scanline (each output pixel feeds the next
pixel's predictor), so those two keep a per-pixel path and cost
~stride·height Python steps per image — acceptable because this
pipeline's own encoder (the only producer here) defaults to filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per supported PNG color type
_PNG_CHANNELS = {0: 1, 2: 3}


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------
def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorised Paeth predictor over int16+ arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    filter_type: int = 0,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` ∈ {1, 3}) as a
    valid PNG. ``filter_type`` picks the per-scanline filter (0-4) —
    real encoders choose per line for compression; a fixed type keeps
    the output deterministic and exercises the decoder's unfilter
    paths."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count: {channels}")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type: {filter_type}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    # All five filters predict from ORIGINAL neighbour values, so the
    # whole image filters as one vectorised expression: a = left pixel
    # (same row, shifted by one pixel), b = up (previous row), c = up-left.
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride).astype(np.int16)
    a = np.zeros_like(px)
    a[:, channels:] = px[:, :-channels]
    b = np.zeros_like(px)
    b[1:, :] = px[:-1, :]
    c = np.zeros_like(px)
    c[1:, channels:] = px[:-1, :-channels]
    if filter_type == 0:
        filt = px
    elif filter_type == 1:
        filt = px - a
    elif filter_type == 2:
        filt = px - b
    elif filter_type == 3:
        filt = px - (a + b) // 2
    else:
        filt = px - _paeth_vec(a, b, c)
    raw = np.empty((height, stride + 1), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = filt.astype(np.uint8)  # wraps mod 256 like the spec
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode a PNG to ``{width, height, bit_depth, channels, pixels}``
    (pixels row-major, unfiltered). Supports 8-bit grey/RGB,
    non-interlaced; multiple IDAT chunks are reassembled per spec
    (one DEFLATE stream split across chunks)."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk body")
        if ctype == b"IHDR":
            # length-check before unpack: struct.error is NOT a
            # ValueError, and the module contract promises ValueError
            # for every corrupt payload (quarantine handlers catch it)
            if len(data) != 13:
                raise ValueError(f"bad IHDR length: {len(data)}")
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth: {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type: {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # zlib.error is not a ValueError either
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size does not match dimensions")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    fts = arr[:, 0]
    bad = fts[fts > 4]
    if bad.size:
        raise ValueError(f"bad scanline filter: {int(bad[0])}")
    lines = arr[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(fts[y])
        line = lines[y]
        if ft == 0:
            cur = line.copy()
        elif ft == 1:
            # Sub: v[x] = (line[x] + v[x-ch]) mod 256 — a per-channel
            # prefix sum; mod 256 distributes over the cumsum.
            cur = np.empty(stride, dtype=np.uint8)
            for ch in range(channels):
                cur[ch::channels] = (
                    np.cumsum(line[ch::channels], dtype=np.uint64) & 0xFF
                )
        elif ft == 2:
            cur = line + prev  # uint8 wraps mod 256
        else:
            # Average/Paeth are sequential within the scanline by spec:
            # each reconstructed pixel is the next pixel's predictor
            # input, so no closed-form vectorisation exists (see module
            # docstring). Per-pixel path, only for rows that use them.
            cur = np.empty(stride, dtype=np.uint8)
            li, pv = line.tolist(), prev.tolist()
            cv = cur.tolist()
            for x in range(stride):
                a = cv[x - channels] if x >= channels else 0
                b = pv[x]
                c = pv[x - channels] if x >= channels else 0
                pred = (a + b) // 2 if ft == 3 else _paeth(a, b, c)
                cv[x] = (li[x] + pred) & 0xFF
            cur = np.asarray(cv, dtype=np.uint8)
        out[y] = cur
        prev = cur
    out = out.reshape(-1).tobytes()
    return {
        "width": width,
        "height": height,
        "bit_depth": 8,
        "channels": channels,
        "pixels": out,
    }


# --------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# --------------------------------------------------------------------------
def encode_wav(
    samples: list[int], sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Encode interleaved PCM-16 samples (ints in [-32768, 32767]) as a
    canonical RIFF/WAVE file."""
    if len(samples) % n_channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE PCM-16 payload to ``{n_channels, sample_rate,
    bits, samples}`` (samples interleaved). Unknown chunks (LIST, fact,
    ...) are skipped per the RIFF spec; odd-length chunks honour the
    pad byte."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + length + (length & 1)  # RIFF pads odd chunks
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt) < 16:  # short fmt would raise struct.error, not ValueError
        raise ValueError(f"fmt chunk too short: {len(fmt)} bytes")
    audio_format, n_channels, sample_rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "samples": samples,
        # raw little-endian PCM bytes so vectorised consumers can
        # np.frombuffer(pcm, "<i2") instead of walking the Python list
        "pcm": data[: n * 2],
    }
