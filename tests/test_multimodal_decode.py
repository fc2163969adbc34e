"""Pure-numpy BMP/WAV decoders over binary payload columns."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from auncel_spark.operators.multimodal import decode_bmp, decode_wav


def _make_bmp(w, h, rng):
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)  # rows top-down here
    stride = (w * 3 + 3) & ~3
    rows = b""
    for r in range(h - 1, -1, -1):  # bottom-up storage
        line = px[r].tobytes()
        rows += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    size = off + len(rows)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return hdr + dib + rows, px


def _make_wav(n, nch, rate, rng):
    x = rng.integers(-30000, 30000, n * nch, dtype=np.int16)
    data = x.tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body, x


def test_decode_bmp_exact(spark):
    rng = np.random.default_rng(3)
    payloads = []
    want = {}
    for i, (w, h) in enumerate([(5, 4), (8, 3), (1, 1)]):
        raw, px = _make_bmp(w, h, rng)
        payloads.append((i, bytearray(raw)))
        m = px.reshape(-1, 3).mean(axis=0)
        want[i] = (w, h, m)
    df = spark.createDataFrame(payloads, "id bigint, payload binary")
    got = {r["id"]: r for r in decode_bmp(df).collect()}
    for i, (w, h, m) in want.items():
        r = got[i]
        assert r["ok"] and r["width"] == w and r["height"] == h
        assert abs(r["mean_b"] - m[0]) < 1e-9
        assert abs(r["mean_r"] - m[2]) < 1e-9


def test_decode_wav_exact(spark):
    rng = np.random.default_rng(4)
    raw1, x1 = _make_wav(100, 1, 16000, rng)
    raw2, x2 = _make_wav(50, 2, 44100, rng)
    df = spark.createDataFrame(
        [(1, bytearray(raw1)), (2, bytearray(raw2)), (3, bytearray(b"junk"))],
        "id bigint, payload binary",
    )
    got = {r["id"]: r for r in decode_wav(df).collect()}
    assert got[1]["ok"] and got[1]["sample_rate"] == 16000 and got[1]["n_samples"] == 100
    assert abs(got[1]["rms"] - float(np.sqrt(np.mean(x1.astype(np.float64) ** 2)))) < 1e-9
    assert got[2]["n_channels"] == 2 and got[2]["n_samples"] == 50
    assert got[3]["ok"] is False  # corrupt payload -> flagged, not fatal


def test_decode_bmp_rejects_garbage(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 64))], "id bigint, payload binary"
    )
    r = decode_bmp(df).collect()[0]
    assert r["ok"] is False
