"""Real-codec tests: PNG/WAV roundtrips (all scanline filters, both
color types, multi-IDAT), corrupt-payload detectability, vectorised-vs-
scalar unfilter parity, resize, and the Spark-side mime-switched
pipeline (synthesize → decode features under mapInPandas)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from football_lakehouse_spark.operators import codecs as C
from football_lakehouse_spark.operators.multimodal import (
    SYNTH_UNITS,
    bundle_assets,
    extract_features,
    resize_png,
    synthesize_assets,
)

RNG = np.random.RandomState(42)


@pytest.fixture()
def docs(spark):
    from football_lakehouse_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    return load_table(spark, SF_SMOKE, "documents")


# --------------------------------------------------------------------------
# PNG roundtrips
# --------------------------------------------------------------------------
@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(channels, filter_type):
    w, h = 23, 11
    px = RNG.randint(0, 256, size=w * h * channels, dtype=np.uint8).tobytes()
    dec = C.decode_png(C.encode_png(px, w, h, channels, filter_type))
    assert dec["pixels"] == px
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, channels)
    assert dec["bit_depth"] == 8


def test_png_roundtrip_structured_image():
    """Gradients + hard edges — the worst case for filter arithmetic
    (deltas straddle the mod-256 wrap)."""
    w, h = 32, 32
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    img = ((x * 8 + y * 8) % 256).astype(np.uint8)
    img[8:16, :] = 255
    img[:, 8:16] = 0
    px = img.tobytes()
    for ft in range(5):
        assert C.decode_png(C.encode_png(px, w, h, 1, ft))["pixels"] == px


def test_png_unfilter_matches_scalar_reference():
    """The vectorised unfilter (cumsum Sub, whole-row Up) must agree
    byte-for-byte with a direct per-pixel transcription of the PNG spec."""

    def scalar_unfilter(raw, width, height, channels):
        stride = width * channels
        out = bytearray(stride * height)
        prev = bytes(stride)
        for yy in range(height):
            ft = raw[yy * (stride + 1)]
            line = raw[yy * (stride + 1) + 1 : (yy + 1) * (stride + 1)]
            base = yy * stride
            for xx in range(stride):
                a = out[base + xx - channels] if xx >= channels else 0
                b = prev[xx]
                c = prev[xx - channels] if xx >= channels else 0
                if ft == 0:
                    v = line[xx]
                elif ft == 1:
                    v = line[xx] + a
                elif ft == 2:
                    v = line[xx] + b
                elif ft == 3:
                    v = line[xx] + (a + b) // 2
                else:
                    v = line[xx] + C._paeth(a, b, c)
                out[base + xx] = v & 0xFF
            prev = bytes(out[base : base + stride])
        return bytes(out)

    w, h, ch = 17, 9, 3
    px = RNG.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    for ft in range(5):
        payload = C.encode_png(px, w, h, ch, ft)
        # pull the raw filtered stream back out of the container
        pos, idat = 8, b""
        while pos < len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            if payload[pos + 4 : pos + 8] == b"IDAT":
                idat += payload[pos + 8 : pos + 8 + length]
            pos += 12 + length
        raw = zlib.decompress(idat)
        assert C.decode_png(payload)["pixels"] == scalar_unfilter(raw, w, h, ch)


def test_png_multi_idat_reassembly():
    """One DEFLATE stream split across several IDAT chunks must decode
    identically (per spec, chunk boundaries are arbitrary)."""
    w, h = 16, 8
    px = RNG.randint(0, 256, size=w * h, dtype=np.uint8).tobytes()
    payload = C.encode_png(px, w, h, 1, 0)
    pos, chunks, idat = 8, [], b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IDAT":
            idat += data
        else:
            chunks.append((ctype, data))
        pos += 12 + length
    split = [idat[i : i + 7] for i in range(0, len(idat), 7)]
    rebuilt = C.PNG_MAGIC + C._png_chunk(b"IHDR", dict(chunks)[b"IHDR"])
    for part in split:
        rebuilt += C._png_chunk(b"IDAT", part)
    rebuilt += C._png_chunk(b"IEND", b"")
    assert C.decode_png(rebuilt)["pixels"] == px


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda p: b"JUNK" + p[4:], "signature"),
        (lambda p: p[:20], "truncated"),
        (lambda p: p[:-24], "missing IHDR or IDAT"),  # drop IDAT+IEND
        (lambda p: p[:33] + p[41:], "size does not match"),  # cut into IDAT
    ],
)
def test_png_corrupt_payloads_detected(mutate, msg):
    px = bytes(range(64))
    payload = C.encode_png(px, 8, 8, 1, 0)
    # ValueError ONLY: the module contract says every corrupt payload is
    # detectably bad via ValueError (quarantine handlers catch exactly it)
    with pytest.raises(ValueError):
        C.decode_png(mutate(payload))


def test_codec_error_contract_is_valueerror():
    """struct.error / zlib.error are NOT ValueError subclasses — a
    quarantine handler catching ValueError per the module contract would
    crash the task on these three corruption shapes without the guards."""
    # IHDR whose declared length is 12 (truncated header fields)
    bad_ihdr = (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", struct.pack(">III", 4, 4, 8))  # 12 bytes
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IHDR length"):
        C.decode_png(bad_ihdr)
    # IDAT that is not a DEFLATE stream (zlib.error without the wrap)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad_idat = (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", b"not-deflate")
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt IDAT"):
        C.decode_png(bad_idat)
    # WAV fmt chunk shorter than the 16 PCM header bytes (struct.error
    # without the guard)
    fmt = struct.pack("<HHI", 1, 1, 16000)  # 8 bytes only
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8)
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="fmt chunk too short"):
        C.decode_wav(wav)


def test_png_unsupported_variants_rejected():
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    bad = C.PNG_MAGIC + C._png_chunk(b"IHDR", ihdr) + C._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        C.decode_png(bad)
    # palette color type
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    bad = C.PNG_MAGIC + C._png_chunk(b"IHDR", ihdr) + C._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        C.decode_png(bad)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    bad = C.PNG_MAGIC + C._png_chunk(b"IHDR", ihdr) + C._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        C.decode_png(bad)
    # bad scanline filter byte inside a valid container
    raw = b"\x07" + bytes(4)  # filter 7 does not exist
    body = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 0, 0, 0, 0)
    bad = (
        C.PNG_MAGIC
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", body)
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline filter"):
        C.decode_png(bad)


def test_png_encode_input_validation():
    with pytest.raises(ValueError, match="channel"):
        C.encode_png(b"\0" * 8, 2, 4, channels=2)
    with pytest.raises(ValueError, match="filter"):
        C.encode_png(b"\0" * 8, 2, 4, 1, filter_type=9)
    with pytest.raises(ValueError, match="buffer"):
        C.encode_png(b"\0" * 7, 2, 4, 1)


def test_resize_png_nearest_neighbour():
    w, h = 8, 8
    px = np.arange(64, dtype=np.uint8)
    small = resize_png(C.encode_png(px.tobytes(), w, h, 1), 4, 4)
    d = C.decode_png(small)
    assert (d["width"], d["height"]) == (4, 4)
    grid = px.reshape(8, 8)
    expect = grid[::2, ::2].tobytes()  # nearest with exact 2× uses stride 2
    assert d["pixels"] == expect
    # upscale roundtrip of a constant image stays constant
    flat = resize_png(C.encode_png(b"\x7f" * 16, 4, 4, 1), 9, 9)
    assert C.decode_png(flat)["pixels"] == b"\x7f" * 81


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------
@pytest.mark.parametrize("n_channels,rate", [(1, 16000), (2, 44100)])
def test_wav_roundtrip(n_channels, rate):
    n = 128 * n_channels
    samples = RNG.randint(-32768, 32768, size=n).astype(np.int16).tolist()
    d = C.decode_wav(C.encode_wav(samples, rate, n_channels))
    assert d["samples"] == samples
    assert d["n_channels"] == n_channels
    assert d["sample_rate"] == rate
    assert d["bits"] == 16
    assert np.frombuffer(d["pcm"], "<i2").tolist() == samples


def test_wav_skips_unknown_chunks_and_pads():
    """RIFF readers must skip LIST/fact chunks; odd-length chunks carry
    a pad byte that shifts all following offsets."""
    samples = [0, 100, -100, 32767, -32768]
    payload = C.encode_wav(samples, 8000, 1)
    fmt_start = 12
    (fmt_len,) = struct.unpack("<I", payload[fmt_start + 4 : fmt_start + 8])
    fmt_chunk = payload[fmt_start : fmt_start + 8 + fmt_len]
    data_chunk = payload[fmt_start + 8 + fmt_len :]
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd len + pad
    body = b"WAVE" + fmt_chunk + odd + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    assert C.decode_wav(rebuilt)["samples"] == samples


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"JUNK" + p[4:],
        lambda p: p[:8] + b"XXXX" + p[12:],
        lambda p: p[:-3],  # truncated data chunk
        lambda p: p[:12],  # no chunks at all
    ],
)
def test_wav_corrupt_payloads_detected(mutate):
    payload = C.encode_wav([1, 2, 3, 4], 8000, 1)
    with pytest.raises(ValueError):
        C.decode_wav(mutate(payload))


def test_wav_non_pcm_rejected():
    payload = bytearray(C.encode_wav([1, 2], 8000, 1))
    payload[20] = 3  # format tag → IEEE float
    with pytest.raises(ValueError, match="unsupported WAV"):
        C.decode_wav(bytes(payload))


def test_wav_encode_input_validation():
    with pytest.raises(ValueError, match="multiple"):
        C.encode_wav([1, 2, 3], n_channels=2)


# --------------------------------------------------------------------------
# Spark pipeline: synthesize → mime-switched decode features
# --------------------------------------------------------------------------
def test_synthesize_and_decode_features(spark, docs):
    sample = docs.limit(40)
    assets = synthesize_assets(sample)
    feats = {
        r.doc_id: r.features
        for r in extract_features(assets).collect()
    }
    src = {r.doc_id: r.text for r in sample.collect()}
    assert set(feats) == set(src)
    for doc_id, text in src.items():
        raw = text.encode("utf-8")[:SYNTH_UNITS].ljust(SYNTH_UNITS, b"\x00")
        b = np.frombuffer(raw, dtype=np.uint8)
        f = feats[doc_id]
        assert f is not None
        if doc_id % 2 == 0:  # PNG: decoded pixels ARE the source bytes
            assert f[:5] == [1.0, 16.0, 8.0, 1.0, 128.0]
            assert f[5] == float(b.sum())
            assert f[6] == float(b.min()) and f[7] == float(b.max())
        else:  # WAV: sample[i] = (byte[i] - 128) * 256
            s = (b.astype(np.int32) - 128) * 256
            assert f[:4] == [2.0, 1.0, 16000.0, 128.0]
            assert f[4] == float(s.sum())
            assert f[5] == float(s.min()) and f[6] == float(s.max())
            assert f[7] == 16.0


def test_corrupt_payload_yields_null_features(spark):
    """A poison row must produce NULL features, not a task failure —
    mandatory behaviour for a 100 TB decode stage."""
    rows = [
        (1, b"\x89PNGnot-really-a-png", "image/png"),
        (2, b"RIFFjunkWAVEbroken", "audio/wav"),
        (3, C.encode_png(bytes(range(16)), 4, 4, 1), "image/png"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary, mime string")
    bundled = df.withColumn(
        "asset",
        F.struct(
            F.col("payload").alias("payload"),
            F.col("mime").alias("mime"),
            F.length("payload").cast("bigint").alias("byte_len"),
            F.sha2("payload", 256).alias("sha"),
        ),
    )
    got = {r.doc_id: r.features for r in extract_features(bundled).collect()}
    assert got[1] is None and got[2] is None
    assert got[3] is not None and got[3][5] == float(sum(range(16)))


def test_unknown_mime_keeps_byte_histogram(spark, docs):
    """text/plain payloads must keep the pre-codec histogram behaviour
    (q47's contract)."""
    bundled = bundle_assets(
        docs.limit(10), F.encode(F.col("text"), "utf-8"), "text/plain"
    )
    for r in extract_features(bundled).collect():
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-4


def test_extract_features_null_payload_is_poison_not_fatal(spark):
    """A NULL asset payload must yield NULL features (the documented
    poison-row contract), not a TypeError that kills the whole
    mapInPandas stage — for every mime branch including the byte-
    histogram fallback."""
    df = spark.createDataFrame(
        [(1, None, "image/png"), (2, None, "audio/wav"),
         (3, None, "application/octet-stream"),
         (4, b"not-a-png", "image/png")],
        "doc_id bigint, payload binary, mime string",
    )
    assets = df.select(
        "doc_id",
        F.struct(
            F.col("payload"),
            F.col("mime"),
            F.coalesce(F.length("payload").cast("bigint"), F.lit(0)).alias("byte_len"),
            F.sha2(F.coalesce(F.col("payload"), F.lit(b"")), 256).alias("sha"),
        ).alias("asset"),
    )
    got = {r.doc_id: r.features for r in extract_features(assets).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1] is None and got[2] is None and got[3] is None
    assert got[4] is None  # detectably-corrupt payload stays NULL too
