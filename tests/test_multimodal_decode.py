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


def test_png_roundtrip_all_filters_byte_exact():
    """Encoder→decoder round-trip must reproduce the pixel array
    byte-exactly for every filter type and channel count."""
    from auncel_spark.operators.multimodal import (
        decode_png_bytes,
        encode_png_bytes,
    )

    rng = np.random.default_rng(11)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, (7, 5, ch), dtype=np.uint8)
        for f in range(5):
            raw = encode_png_bytes(px, filters=[f])
            got = decode_png_bytes(raw)
            assert got.shape == (7, 5, ch)
            assert np.array_equal(got, px), f"filter {f} ch {ch}"
    # mixed filters across scanlines (the shape real encoders emit)
    px = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    raw = encode_png_bytes(px, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png_bytes(raw), px)


def test_png_palette_and_rejects():
    import zlib

    from auncel_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png_bytes,
        encode_png_bytes,
    )

    # palette image: indices 0..3 -> distinct RGB entries
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    plte = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    scan = b"".join(bytes([0]) + bytes(idx[y]) for y in range(2))
    raw = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = decode_png_bytes(raw)
    assert np.array_equal(got, plte[idx])

    with pytest.raises(ValueError):
        decode_png_bytes(b"not a png at all")
    # 16-bit depth must be rejected, not mis-decoded
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    bad = bytearray(encode_png_bytes(px))
    sig = len(_PNG_SIG)
    bad[sig + 8 + 8] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError):
        decode_png_bytes(bytes(bad))


def test_decode_png_dataframe_corrupt_semantics(spark):
    from auncel_spark.operators.multimodal import decode_png, encode_png_bytes

    rng = np.random.default_rng(5)
    px0 = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    px1 = rng.integers(0, 256, (3, 3, 1), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png_bytes(px0, filters=[4]))),
        (1, bytearray(encode_png_bytes(px1, filters=[3]))),
        (2, bytearray(b"\x89PNG\r\n\x1a\n garbage")),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    got = {r["id"]: r.asDict() for r in decode_png(df).collect()}
    assert got[0]["ok"] and (got[0]["width"], got[0]["height"]) == (6, 4)
    assert got[0]["px_sum"] == int(px0.astype(np.int64).sum())
    assert got[1]["ok"] and got[1]["n_channels"] == 1
    assert got[1]["px_sum"] == int(px1.astype(np.int64).sum())
    assert not got[2]["ok"] and got[2]["px_sum"] == 0


def test_documents_fixture_is_pure_ascii():
    """The png_decode_stats and multimodal_byte_features oracles replay
    the engine's BYTE arithmetic via ascii() over CHARACTERS — valid
    only while byte == code point. If the documents fixture ever grows
    non-ASCII text, this fails here with a clear message instead of a
    confusing driver hash mismatch (the oracle also poisons such rows
    to px_sum=-1 as defense in depth)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01"):
        n = duckdb.sql(
            "SELECT count(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet')"
            " WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf}: {n} non-ASCII documents — the ascii()-based oracles "
            "(png_decode_stats, multimodal_byte_features) no longer match "
            "the engine's UTF-8 byte arithmetic; make them byte-based"
        )


# ---- baseline JPEG codec (operators/jpeg.py, r05) -------------------


def _smooth_gray(h=40, w=52, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128 + 60 * np.sin(xx / 9) + 50 * np.cos(yy / 7) + rng.normal(0, 3, (h, w))
    ).clip(0, 255).astype(np.uint8)


def test_jpeg_roundtrip_grayscale():
    from auncel_spark.operators.jpeg import decode_jpeg_bytes, encode_jpeg_bytes

    gray = _smooth_gray()
    dec = decode_jpeg_bytes(encode_jpeg_bytes(gray, quality=92))
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(float) - gray.astype(float)).mean() < 3.0


def test_jpeg_roundtrip_rgb_444_and_420():
    from auncel_spark.operators.jpeg import decode_jpeg_bytes, encode_jpeg_bytes

    gray = _smooth_gray()
    rgb = np.stack([gray, np.roll(gray, 5, 0), 255 - gray], axis=-1)
    d444 = decode_jpeg_bytes(encode_jpeg_bytes(rgb, quality=92))
    assert d444.shape == rgb.shape
    assert np.abs(d444.astype(float) - rgb.astype(float)).mean() < 4.0
    # 4:2:0 exercises the interleaved-MCU path + chroma upsample
    d420 = decode_jpeg_bytes(encode_jpeg_bytes(rgb, quality=92, subsample=True))
    assert d420.shape == rgb.shape
    assert np.abs(d420.astype(float) - rgb.astype(float)).mean() < 8.0


def test_jpeg_odd_sizes_and_extreme_dc():
    from auncel_spark.operators.jpeg import decode_jpeg_bytes, encode_jpeg_bytes

    rng = np.random.default_rng(2)
    odd = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert decode_jpeg_bytes(encode_jpeg_bytes(odd, quality=95)).shape == (17, 23, 3)
    # max DC swings between blocks must stay inside DC size categories
    ext = np.zeros((24, 24), dtype=np.uint8)
    ext[8:16] = 255
    d = decode_jpeg_bytes(encode_jpeg_bytes(ext, quality=50))
    assert np.abs(d.astype(float) - ext.astype(float)).mean() < 2.0


def test_jpeg_ff_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker —
    FF FF ... FF xx is ONE marker xx. Third-party baseline JPEGs padded
    this way must decode identically (ADVICE r05: the header loop read
    FF FF as marker 0xFF + garbage length; _BitReader treated FF-FF in
    the entropy segment as a marker)."""
    from auncel_spark.operators.jpeg import decode_jpeg_bytes, encode_jpeg_bytes

    gray = _smooth_gray()
    raw = encode_jpeg_bytes(gray, quality=92)
    ref = decode_jpeg_bytes(raw)

    # fill bytes before a header segment marker (after SOI, before APP0)
    padded_hdr = raw[:2] + b"\xff\xff\xff" + raw[2:]
    np.testing.assert_array_equal(decode_jpeg_bytes(padded_hdr), ref)

    # fill bytes before EOI — the entropy-segment bit reader must treat
    # FF-FF as padding, not as a marker with id 0xFF
    assert raw[-2:] == b"\xff\xd9"
    padded_eoi = raw[:-2] + b"\xff\xff" + raw[-2:]
    np.testing.assert_array_equal(decode_jpeg_bytes(padded_eoi), ref)

    # fill bytes before every RSTn marker exercise align_to_marker
    rst = encode_jpeg_bytes(gray, quality=92, restart_interval=2)
    ref_rst = decode_jpeg_bytes(rst)
    out = bytearray()
    i = 0
    while i < len(rst):
        if rst[i] == 0xFF and i + 1 < len(rst) and 0xD0 <= rst[i + 1] <= 0xD7:
            out += b"\xff"
        out.append(rst[i])
        i += 1
    np.testing.assert_array_equal(decode_jpeg_bytes(bytes(out)), ref_rst)


def test_jpeg_rejects_non_baseline_and_corrupt():
    import pytest as _pytest

    from auncel_spark.operators.jpeg import decode_jpeg_bytes

    for bad in (b"nope", b"\xff\xd8garbage", b"\xff\xd8\xff\xc2\x00\x04ab"):
        with _pytest.raises(Exception):
            decode_jpeg_bytes(bad)


def test_bound_payload_partitions_splits_big_frames(spark):
    """~1 MB payloads at 64k-row Arrow batches would materialize tens
    of GB per batch (ADVICE r05); the bound must spread them so each
    partition carries ~target_bytes, and must leave small frames'
    partitioning alone."""
    from pyspark.sql import functions as F

    from auncel_spark.operators.multimodal import bound_payload_partitions

    big = spark.range(512).select(
        F.col("id"), F.expr("repeat('x', 100000)").cast("binary").alias("payload")
    )
    # 512 rows x 100 KB = ~51 MB at target 1 MB -> ~52 partitions
    out = bound_payload_partitions(big, "payload", target_bytes=1 << 20)
    nparts = out.rdd.getNumPartitions()
    assert nparts >= 32, nparts
    assert out.count() == 512
    small = spark.range(64).select(
        F.col("id"), F.expr("repeat('y', 16)").cast("binary").alias("payload")
    )
    before = small.rdd.getNumPartitions()
    assert bound_payload_partitions(small, "payload").rdd.getNumPartitions() == before


def test_decode_image_dispatches_by_magic(spark):
    """decode_image routes PNG / JPEG / BMP payloads by magic bytes in
    one frame and flags unknown magics ok=false."""
    from auncel_spark.operators.jpeg import encode_jpeg_bytes
    from auncel_spark.operators.multimodal import decode_image, encode_png_bytes

    rng = np.random.default_rng(3)
    png_px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    jpg_px = _smooth_gray(16, 24)

    def bmp_bytes(px):  # minimal bottom-up 24bpp BMP
        h, w = px.shape[:2]
        stride = (w * 3 + 3) & ~3
        body = bytearray()
        for row in px[::-1]:
            body += bytes(row.reshape(-1)) + b"\x00" * (stride - w * 3)
        head = b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
        head += (54).to_bytes(4, "little")
        head += (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        head += h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        head += (24).to_bytes(2, "little") + b"\x00" * 24
        return bytes(head) + bytes(body)

    bmp_px = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    rows = [
        (0, bytearray(encode_png_bytes(png_px))),
        (1, bytearray(encode_jpeg_bytes(jpg_px, quality=92))),
        (2, bytearray(bmp_bytes(bmp_px))),
        (3, bytearray(b"GIF89a not supported")),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    got = {r["id"]: r.asDict() for r in decode_image(df).collect()}
    assert got[0]["ok"] and (got[0]["width"], got[0]["height"]) == (7, 5)
    assert got[0]["px_sum"] == int(png_px.astype(np.int64).sum())
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"]) == (24, 16)
    # JPEG is lossy: the pixel sum must be close, not exact
    assert abs(got[1]["px_sum"] - int(jpg_px.astype(np.int64).sum())) < 2.0 * jpg_px.size
    assert got[2]["ok"] and got[2]["px_sum"] == int(bmp_px.astype(np.int64).sum())
    assert not got[3]["ok"]


def test_extract_byte_features_n_bytes_matches_payload_length(spark):
    """with_n_bytes=True must emit the exact payload byte length (what
    q_multimodal_features formerly fetched via a join back onto the
    payload frame) and leave the feature column bit-identical to the
    default-schema path."""
    from pyspark.sql import functions as F

    from auncel_spark.operators.multimodal import extract_byte_features

    df = spark.range(8).select(
        F.col("id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("payload"),
    )
    base = {r["id"]: r["feature"] for r in extract_byte_features(df).collect()}
    rows = extract_byte_features(df, with_n_bytes=True).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_bytes"] == len(f"payload-{r['id']}".encode())
        assert r["feature"] == base[r["id"]]
