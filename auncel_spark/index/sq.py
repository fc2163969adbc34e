"""Scalar quantizer: per-dimension linear codes.

Reference (SURVEY.md §2.2 B8): ``ScalarQuantizer``
(``Auncel/IndexScalarQuantizer.h:32-88``, impl ~1864 LoC of SIMD
codecs). Semantics: train per-dimension (or uniform) range statistics,
then encode each component to 8 bits (QT_8bit; the reference also has
4/6-bit and fp16 variants — 8-bit is the default and what we expose),
code = round((x − vmin) / (vmax − vmin) · 255).

RangeStat options mirrored: minmax (RS_minmax) and meanstd
(RS_meanstd). Training is one distributed ``agg`` over per-dim
min/max/avg/stddev; the trained state (2·d floats) broadcasts.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ScalarQuantizer:
    def __init__(self, vmin: np.ndarray, vdiff: np.ndarray):
        self.vmin = np.asarray(vmin, dtype=np.float64)
        self.vdiff = np.asarray(vdiff, dtype=np.float64)
        self.d = len(self.vmin)

    @classmethod
    def train(
        cls,
        df: DataFrame,
        vec_col: str = "vec",
        rangestat: str = "minmax",
        rs_arg: float = 1.0,
    ) -> "ScalarQuantizer":
        """One aggregation pass: per-dim stats via posexplode →
        groupBy(dim). At 100 TB this is a map-side-combined agg over
        d·n values — no vector ever leaves its executor whole."""
        ex = df.select(F.posexplode(vec_col).alias("dim", "v"))
        if rangestat == "minmax":
            stats = ex.groupBy("dim").agg(
                F.min("v").alias("lo"), F.max("v").alias("hi")
            )
            rows = stats.collect()
            lo = np.empty(len(rows))
            hi = np.empty(len(rows))
            for r in rows:
                lo[r["dim"]] = r["lo"]
                hi[r["dim"]] = r["hi"]
        elif rangestat == "meanstd":
            stats = ex.groupBy("dim").agg(
                F.avg("v").alias("mu"), F.stddev_pop("v").alias("sd")
            )
            rows = stats.collect()
            lo = np.empty(len(rows))
            hi = np.empty(len(rows))
            for r in rows:
                lo[r["dim"]] = r["mu"] - rs_arg * r["sd"]
                hi[r["dim"]] = r["mu"] + rs_arg * r["sd"]
        else:
            raise ValueError(f"unknown rangestat {rangestat!r}")
        diff = hi - lo
        diff[diff == 0] = 1.0
        return cls(lo, diff)

    # numpy kernels (shared by the Spark codecs below)

    def encode_np(self, x: np.ndarray) -> np.ndarray:
        q = (np.asarray(x, dtype=np.float64) - self.vmin) / self.vdiff
        return np.clip(np.round(q * 255.0 - 0.5), 0, 255).astype(np.uint8)

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        return self.vmin + (codes.astype(np.float64) + 0.5) / 255.0 * self.vdiff

    def encode(self, df: DataFrame, vec_col: str = "vec", code_col: str = "code") -> DataFrame:
        from pyspark.sql import types as T

        bc = df.sparkSession.sparkContext.broadcast((self.vmin, self.vdiff))
        schema = T.StructType(
            list(df.schema.fields) + [T.StructField(code_col, T.BinaryType())]
        )
        d = self.d

        def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            vmin, vdiff = bc.value
            sq = ScalarQuantizer(vmin, vdiff)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.array(list(pdf[vec_col]), dtype=np.float64)
                codes = sq.encode_np(mat)
                yield pdf.assign(**{code_col: [bytes(c) for c in codes]})

        return df.mapInPandas(work, schema=schema)

    def decode(self, df: DataFrame, code_col: str = "code", out_col: str = "vec_dec") -> DataFrame:
        from pyspark.sql import types as T

        bc = df.sparkSession.sparkContext.broadcast((self.vmin, self.vdiff))
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
        )

        def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            vmin, vdiff = bc.value
            sq = ScalarQuantizer(vmin, vdiff)
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.array([np.frombuffer(b, dtype=np.uint8) for b in pdf[code_col]])
                dec = sq.decode_np(codes).astype(np.float32)
                yield pdf.assign(**{out_col: list(dec)})

        return df.mapInPandas(work, schema=schema)

    def to_dict(self) -> dict:
        return {"vmin": self.vmin.tolist(), "vdiff": self.vdiff.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "ScalarQuantizer":
        return cls(np.array(d["vmin"]), np.array(d["vdiff"]))
