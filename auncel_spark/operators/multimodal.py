"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): treat image/audio/video as opaque
``BINARY`` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched kernels over
``mapInPandas``. The image/audio codec libraries are not in this
container, so the *decode* step is stubbed (``NotImplementedError`` or
a clearly-marked deterministic fake); the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested.

Scale: payloads never leave executors; feature extraction is one
narrow map (no shuffle); downstream similarity/dedup reuse the
embedding operators on the extracted feature column.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 16


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped table from any source column: payload
    BINARY + metadata struct (mime, n_bytes). Stands in for reading
    real image/audio bytes (e.g. ``spark.read.format('binaryFile')``)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compressed image decode (JPEG/PNG/...) — STUB: the container
    has no PIL/cv2. The plumbing (signature, schema) is what the
    engine contributes; swap the kernel body for a real decoder in
    production. Uncompressed formats decode for real: ``decode_bmp``
    (24bpp BMP) and ``decode_wav`` (PCM16 WAV) below are pure-numpy."""
    raise NotImplementedError(
        "compressed-image codecs are not available in this environment; "
        "use decode_bmp / decode_wav for uncompressed payloads or "
        "extract_byte_features for the deterministic fake path"
    )


def decode_bmp(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """REAL decoder for uncompressed 24bpp BMP payloads (pure numpy —
    no codec library): parses the BITMAPFILEHEADER/BITMAPINFOHEADER,
    strips row padding, and emits per-image shape + per-channel means
    (the typical cheap image statistics a curation filter uses).
    Invalid/unsupported payloads yield ok=false rows rather than
    failing the task — at 100 TB some payloads are always corrupt."""
    schema = (
        "id bigint, ok boolean, width int, height int, "
        "mean_b double, mean_g double, mean_r double"
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                try:
                    if raw[:2] != b"BM":
                        raise ValueError("not BMP")
                    off = int.from_bytes(raw[10:14], "little")
                    w = int.from_bytes(raw[18:22], "little", signed=True)
                    h = int.from_bytes(raw[22:26], "little", signed=True)
                    bpp = int.from_bytes(raw[28:30], "little")
                    comp = int.from_bytes(raw[30:34], "little")
                    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
                        raise ValueError("unsupported BMP variant")
                    flip = h > 0  # positive height = bottom-up rows
                    h = abs(h)
                    stride = (w * 3 + 3) & ~3
                    px = np.frombuffer(
                        raw, dtype=np.uint8, count=stride * h, offset=off
                    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    if flip:
                        px = px[::-1]
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append((int(i), True, w, h, float(m[0]), float(m[1]), float(m[2])))
                except Exception:
                    rows.append((int(i), False, 0, 0, 0.0, 0.0, 0.0))
            yield pd.DataFrame(
                rows,
                columns=["id", "ok", "width", "height", "mean_b", "mean_g", "mean_r"],
            )

    return df.select(id_col, payload_col).mapInPandas(work, schema=schema)


def decode_wav(
    df: DataFrame, payload_col: str = "payload", id_col: str = "id"
) -> DataFrame:
    """REAL decoder for PCM16 WAV payloads (pure numpy): walks the
    RIFF chunk list for fmt/data, emits rate/channels/length plus RMS
    amplitude — the audio analogue of decode_bmp. ok=false on
    non-PCM16 or malformed payloads."""
    schema = (
        "id bigint, ok boolean, sample_rate int, n_channels int, "
        "n_samples bigint, rms double"
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                try:
                    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                        raise ValueError("not WAV")
                    pos, fmt, data = 12, None, None
                    while pos + 8 <= len(raw):
                        cid = raw[pos : pos + 4]
                        sz = int.from_bytes(raw[pos + 4 : pos + 8], "little")
                        body = raw[pos + 8 : pos + 8 + sz]
                        if cid == b"fmt ":
                            fmt = body
                        elif cid == b"data":
                            data = body
                        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
                    if fmt is None or data is None:
                        raise ValueError("missing fmt/data chunk")
                    audio_fmt = int.from_bytes(fmt[0:2], "little")
                    nch = int.from_bytes(fmt[2:4], "little")
                    rate = int.from_bytes(fmt[4:8], "little")
                    bits = int.from_bytes(fmt[14:16], "little")
                    if audio_fmt != 1 or bits != 16 or nch < 1:
                        raise ValueError("not PCM16")
                    x = np.frombuffer(data, dtype="<i2")
                    n = len(x) // nch
                    rms = float(np.sqrt(np.mean(x.astype(np.float64) ** 2))) if n else 0.0
                    rows.append((int(i), True, rate, nch, n, rms))
                except Exception:
                    rows.append((int(i), False, 0, 0, 0, 0.0))
            yield pd.DataFrame(
                rows,
                columns=["id", "ok", "sample_rate", "n_channels", "n_samples", "rms"],
            )

    return df.select(id_col, payload_col).mapInPandas(work, schema=schema)


def extract_byte_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    n_features: int = N_FEATURES,
) -> DataFrame:
    """DETERMINISTIC FAKE feature extractor: L1-normalized histogram of
    payload bytes folded into n_features buckets. Exercises the exact
    batch shape a real embedding model would use (Arrow batches in,
    fixed-width float vectors out)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = []
            for b in pdf[payload_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total else hist).astype(np.float32))
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(work, schema=schema)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "id",
    every_n_bytes: int = 64,
    frame_len: int = 8,
) -> DataFrame:
    """Frame/segment sampler over an opaque payload (the video
    frame-sampling shape): emit one row per sampled window with its
    offset — a 1→N flatMap, the partition-preserving pattern real
    frame extraction uses."""
    schema = "id bigint, frame_no int, offset bigint, frame binary"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, fnos, offs, frames = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                for fno, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(i)
                    fnos.append(fno)
                    offs.append(off)
                    frames.append(raw[off : off + frame_len])
            yield pd.DataFrame(
                {"id": ids, "frame_no": fnos, "offset": offs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(work, schema=schema)
