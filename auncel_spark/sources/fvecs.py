"""fvecs / ivecs / fbin / ibin readers and writers.

Reference (SURVEY.md §2.1 S1-S3):
- ``fvecs_read`` (``Auncel/eval/bound.cpp:29-63``): per-row
  ``[int32 d][d × float32]`` records.
- ``fbin_read`` (``Auncel/eval/bound.cpp:65-114``): header
  ``[int32 n][int32 d]`` then n·d values; the int8 variant casts up to
  float (``bound.cpp:81-91``).
- writers: ``fvecs_write``/``ivecs_write`` (``Auncel/dist/reduce.cpp:66-96``).

Spark shape: ``spark.read.format("binaryFile")`` brings each file in as
one row; a ``mapInPandas`` kernel parses records into (id, vec) rows.
Ids are sequential per file (the reference's implicit rowids) offset by
a stable per-file base when reading a directory. For 100 TB, convert
once to Parquet (these formats aren't splittable); the reader exists
for ingest parity, the writer for result interchange with reference
tooling.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _parse_fvecs(buf: bytes, dtype: np.dtype) -> np.ndarray:
    if len(buf) == 0:
        return np.empty((0, 0))
    d = struct.unpack("<i", buf[:4])[0]
    rec = 4 + d * 4
    n = len(buf) // rec
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(n, rec)
    body = arr[:, 4:].copy().view(dtype)
    return body.reshape(n, d)


def _parse_fbin(buf: bytes, dtype: np.dtype) -> np.ndarray:
    n, d = struct.unpack("<ii", buf[:8])
    body = np.frombuffer(buf, dtype=dtype, offset=8, count=n * d)
    if dtype == np.int8:  # int8 data is cast up to float (bound.cpp:81-91)
        body = body.astype(np.float32)
    return body.reshape(n, d)


def _read_records(
    spark: SparkSession, path: str, parser, dtype, vec_type: str
) -> DataFrame:
    files = spark.read.format("binaryFile").load(path)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                mat = parser(bytes(row["content"]), np.dtype(dtype))
                # stable per-file id base: hash of path (no cross-file
                # ordering assumption — reference ids are per-shard too)
                base = abs(hash(row["path"])) % (1 << 40) << 20
                ids = base + np.arange(mat.shape[0], dtype=np.int64)
                yield pd.DataFrame({"id": ids, "vec": list(mat)})

    return files.select("path", "content").mapInPandas(
        work, schema=f"id bigint, vec array<{vec_type}>"
    )


def read_fvecs(spark: SparkSession, path: str) -> DataFrame:
    return _read_records(spark, path, _parse_fvecs, np.float32, "float")


def read_ivecs(spark: SparkSession, path: str) -> DataFrame:
    return _read_records(spark, path, _parse_fvecs, np.int32, "int")


def read_fbin(spark: SparkSession, path: str, dtype: str = "float32") -> DataFrame:
    return _read_records(spark, path, _parse_fbin, np.dtype(dtype), "float")


def write_fvecs(df: DataFrame, path: str, vec_col: str = "vec") -> None:
    """Collect-and-write (driver-side): result matrices in the
    reference's interchange format are small (nq×k); bulk data belongs
    in Parquet."""
    rows = df.select(vec_col).collect()
    with open(path, "wb") as f:
        for r in rows:
            v = np.asarray(r[vec_col], dtype=np.float32)
            f.write(struct.pack("<i", len(v)))
            f.write(v.tobytes())


def write_ivecs(df: DataFrame, path: str, vec_col: str = "vec") -> None:
    rows = df.select(vec_col).collect()
    with open(path, "wb") as f:
        for r in rows:
            v = np.asarray(r[vec_col], dtype=np.int32)
            f.write(struct.pack("<i", len(v)))
            f.write(v.tobytes())
