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
    """Real image decode — STUB: the container has no PIL/cv2. The
    plumbing (signature, schema) is what the engine contributes; swap
    the kernel body for a real decoder in production."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use extract_byte_features for the deterministic fake path"
    )


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
