"""Product quantizer: codebook training, codec, ADC scanning.

Reference (SURVEY.md §2.2 B6-B7, §2.3 O8):
- ``ProductQuantizer`` (``Auncel/ProductQuantizer.h:23-162``, .cpp 876
  LoC): d split into M sub-vectors of dsub dims; per-subspace k-means
  with ksub = 2^nbits centroids (nbits=8 ⇒ 1 byte per subspace);
  ``compute_code(s)`` = per-subspace argmin; asymmetric distance
  computation (ADC) via per-query M×ksub lookup tables
  (``ProductQuantizer.h:106-137``).
- ``IndexIVFPQ`` (``Auncel/IndexIVFPQ.h:34-130``): IVF shell whose
  lists store codes; optional residual encoding (``by_residual``).

Spark shape: codebooks are tiny (M·ksub·dsub floats = d·256 ≈ 64 KB)
→ trained driver-side on a bounded seeded sample (the reference also
trains on ≤ max_train_points sampled rows, ProductQuantizer.cpp) and
broadcast. Encoding and ADC scans are Arrow-batched numpy kernels; the
relational shell (probe join, window top-k) is identical to IVF-Flat,
so Catalyst pruning still applies. Codes cut scan+shuffle bytes by
d·4/M (32× at d=64, M=8) — the 100 TB path (SURVEY §7.3 "Scale").
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from auncel_spark.functions.vector import as_matrix
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.operators.topk import topk_per_query


def _lloyd_np(x: np.ndarray, k: int, n_iter: int, seed: int) -> np.ndarray:
    """In-memory Lloyd's for one subspace codebook (the reference runs
    the same Clustering machinery over the sampled slice). Assignment
    is a GEMM argmin (|c|² − 2·x·cᵀ; |x|² is constant per row) and the
    update a per-dim bincount — the r06 M32 train at ksub=256 spent
    ~9 min in the per-cluster masked-mean loop (256 clusters × 25
    iters × 32 books, single-threaded); this form runs in seconds."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    k_eff = min(k, n)
    cents = x[rng.permutation(n)[:k_eff]].copy()
    if k_eff < k:
        cents = np.vstack([cents, cents[rng.integers(0, k_eff, k - k_eff)] + 1e-6])
    for _ in range(n_iter):
        d = (cents * cents).sum(-1)[None, :] - 2.0 * (x @ cents.T)
        lab = d.argmin(axis=1)
        counts = np.bincount(lab, minlength=k)
        sums = np.stack(
            [
                np.bincount(lab, weights=x[:, j], minlength=k)
                for j in range(x.shape[1])
            ],
            axis=1,
        )
        ne = counts > 0
        cents[ne] = sums[ne] / counts[ne, None]
        for ci in np.nonzero(~ne)[0]:
            # empty-cluster re-seed (km_update_centroids analogue)
            cents[ci] = x[rng.integers(0, n)] + rng.normal(0, 1e-5, x.shape[1])
    return cents


class ProductQuantizer:
    def __init__(self, codebooks: np.ndarray):
        # codebooks: (M, ksub, dsub)
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        self.M, self.ksub, self.dsub = self.codebooks.shape
        self.d = self.M * self.dsub

    @classmethod
    def train(
        cls,
        df: DataFrame,
        M: int = 8,
        nbits: int = 8,
        vec_col: str = "vec",
        sample_size: int = 16384,
        n_iter: int = 25,
        seed: int = 42,
    ) -> "ProductQuantizer":
        n = df.count()
        frac = min(1.0, sample_size * 1.2 / max(n, 1))
        rows = df.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_size).collect()
        x = np.array([r[vec_col] for r in rows], dtype=np.float64)
        d = x.shape[1]
        if d % M != 0:
            raise ValueError(f"d={d} not divisible by M={M}")
        dsub, ksub = d // M, 1 << nbits
        books = np.stack(
            [
                _lloyd_np(x[:, m * dsub : (m + 1) * dsub], ksub, n_iter, seed + m)
                for m in range(M)
            ]
        )
        return cls(books)

    # --- numpy kernels ---------------------------------------------------

    def encode_np(self, x: np.ndarray, gemm: bool = False) -> np.ndarray:
        """Per-subspace argmin encode. ``gemm=False`` (default) uses the
        exact |s − c|² broadcast — bit-matched to the SQL oracles'
        list_distance replay, but it materializes an (n, ksub, dsub)
        block per subspace (~800 MB at 64k-row Arrow batches).
        ``gemm=True`` uses argmin(|c|² − 2·s·cᵀ) — same argmin up to
        float rounding on near-ties, O(n·ksub) memory and BLAS-bound;
        the big-tier build path (10⁸-row encodes) sets it."""
        n = x.shape[0]
        codes = np.empty((n, self.M), dtype=np.uint8)
        for m in range(self.M):
            sub = x[:, m * self.dsub : (m + 1) * self.dsub]
            cb = self.codebooks[m]
            if gemm:
                d = (cb * cb).sum(-1)[None, :] - 2.0 * (sub @ cb.T)
            else:
                d = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            codes[:, m] = d.argmin(axis=1)
        return codes

    def decode_np(self, codes: np.ndarray) -> np.ndarray:
        out = np.empty((codes.shape[0], self.d))
        for m in range(self.M):
            out[:, m * self.dsub : (m + 1) * self.dsub] = self.codebooks[m][codes[:, m]]
        return out

    def lut_np(self, q: np.ndarray, metric: Metric) -> np.ndarray:
        """Per-query ADC tables (ProductQuantizer.h:106-137):
        LUT[m][j] = dist(q_sub_m, codebook[m][j]); candidate distance =
        Σ_m LUT[m][code_m]. For IP the engine's ascending convention
        uses −dot."""
        lut = np.empty((self.M, self.ksub))
        for m in range(self.M):
            qs = q[m * self.dsub : (m + 1) * self.dsub]
            cb = self.codebooks[m]
            if metric == Metric.L2:
                lut[m] = ((cb - qs[None, :]) ** 2).sum(-1)
            else:
                lut[m] = -(cb @ qs)
        return lut

    def adc_np(self, lut: np.ndarray, codes: np.ndarray) -> np.ndarray:
        # gather-sum: dist[i] = Σ_m lut[m, codes[i, m]]
        return lut[np.arange(self.M)[None, :], codes].sum(axis=1)

    # --- Spark codecs ----------------------------------------------------

    def encode(
        self,
        df: DataFrame,
        vec_col: str = "vec",
        code_col: str = "code",
        gemm: bool = False,
    ) -> DataFrame:
        from pyspark.sql import types as T

        bc = df.sparkSession.sparkContext.broadcast(self.codebooks)
        schema = T.StructType(
            list(df.schema.fields) + [T.StructField(code_col, T.BinaryType())]
        )

        def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pq = ProductQuantizer(bc.value)
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = as_matrix(pdf[vec_col])
                codes = pq.encode_np(mat, gemm=gemm)
                yield pdf.assign(**{code_col: [bytes(c) for c in codes]})

        return df.mapInPandas(work, schema=schema)

    def decode(self, df: DataFrame, code_col: str = "code", out_col: str = "vec_dec") -> DataFrame:
        from pyspark.sql import types as T

        bc = df.sparkSession.sparkContext.broadcast(self.codebooks)
        schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
        )

        def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pq = ProductQuantizer(bc.value)
            for pdf in batches:
                if pdf.empty:
                    continue
                codes = np.array(
                    [np.frombuffer(b, dtype=np.uint8) for b in pdf[code_col]]
                )
                yield pdf.assign(**{out_col: list(pq.decode_np(codes).astype(np.float32))})

        return df.mapInPandas(work, schema=schema)

    def to_dict(self) -> dict:
        return {"codebooks": self.codebooks.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "ProductQuantizer":
        return cls(np.array(d["codebooks"]))


def pq_knn(
    queries: DataFrame,
    coded_base: DataFrame,
    pq: ProductQuantizer,
    k: int,
    metric: Metric = Metric.L2,
    code_col: str = "code",
) -> DataFrame:
    """Flat ADC search over a coded table (IndexPQ::search, ST_PQ mode,
    Auncel/IndexPQ.h:74-91): per-query LUT, gather-sum over codes,
    partial top-k per partition, global window top-k.

    Approximation contract: distances are ADC estimates; callers wanting
    exact ranks re-rank with ``knn_by_ids`` (O9 / IndexRefineFlat)."""
    spark = queries.sparkSession
    qrows = queries.select("qid", "vec").collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["vec"] for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((qids, qmat, pq.codebooks))
    b = coded_base.select(F.col("id"), F.col(code_col).alias("code"))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bqids, bq, books = bc.value
        kernel = ProductQuantizer(books)
        luts = np.stack([kernel.lut_np(q, metric) for q in bq])  # (nq, M, ksub)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]])
            # dist (nq, n): batch gather-sum
            gathered = luts[:, np.arange(kernel.M)[None, :], codes]  # (nq, n, M)
            dist = gathered.sum(axis=2)
            kk = min(k, dist.shape[1])
            # (dist, id) tie-break — see operators/knn.py note
            part = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(bqids, kk),
                    "id": ids[part].ravel(),
                    "dist": np.take_along_axis(dist, part, axis=1).ravel(),
                }
            )

    partial = b.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
    return topk_per_query(partial, k).select("qid", "pos", "id", "dist")
