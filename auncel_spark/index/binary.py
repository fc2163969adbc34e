"""Binary vectors: packed bits, Hamming k-NN, binary IVF, LSH sketches.

Reference (SURVEY.md §2.3 O13-O14, §2.2 B14):
- ``IndexBinaryFlat`` (``Auncel/IndexBinaryFlat.h:21``): brute Hamming
  top-k over packed ``uint8`` bits, heap- or counter-based
  (``hammings_knn_hc/_mc``, ``Auncel/hamming.h:55-132``).
- ``IndexBinaryIVF`` (``Auncel/IndexBinaryIVF.h:35``): IVF shell over
  binary codes.
- ``IndexBinaryFromFloat`` (``Auncel/IndexBinaryFromFloat.h:28``):
  float index serving binary vectors.
- LSH sketch (``IndexLSH``, ``Auncel/IndexLSH.h:22``): random-rotation
  sign bits of float vectors → binary codes.

Spark shape: bits live in a ``BINARY`` column (d/8 bytes); Hamming
kernels are numpy popcounts over Arrow batches (the reference's SIMD
popcount path, ``hamming.h:91``); the relational shell (broadcast
queries, partial top-k, window merge) is shared with the float path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from auncel_spark.functions.vector import as_matrix
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auncel_spark.operators.topk import topk_per_query

_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def pack_bits_np(bits: np.ndarray) -> np.ndarray:
    """(n, d) 0/1 → (n, d/8) uint8, MSB-first per byte (np.packbits)."""
    return np.packbits(bits.astype(np.uint8), axis=1)


def float_to_binary(
    df: DataFrame, vec_col: str = "vec", out_col: str = "bits", threshold: float = 0.0
) -> DataFrame:
    """IndexBinaryFromFloat bridge (O14): sign-threshold each component
    and pack. d must be a multiple of 8 (IndexBinary.h:36)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [f for f in df.schema.fields if f.name != out_col]
        + [T.StructField(out_col, T.BinaryType())]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = as_matrix(pdf[vec_col])
            packed = pack_bits_np(mat > threshold)
            yield pdf.assign(**{out_col: [bytes(p) for p in packed]})

    return df.mapInPandas(work, schema=schema)


def lsh_sketch(
    df: DataFrame,
    n_bits: int = 64,
    seed: int = 42,
    vec_col: str = "vec",
    out_col: str = "bits",
) -> DataFrame:
    """IndexLSH (B14): seeded random-hyperplane sign sketch → packed
    binary codes (rotation matrix broadcast, one GEMM per batch)."""
    from pyspark.sql import types as T

    first = df.select(vec_col).first()
    d = len(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, d))
    bc = df.sparkSession.sparkContext.broadcast(planes)
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != out_col]
        + [T.StructField(out_col, T.BinaryType())]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = as_matrix(pdf[vec_col])
            packed = pack_bits_np((mat @ P.T) >= 0)
            yield pdf.assign(**{out_col: [bytes(p) for p in packed]})

    return df.mapInPandas(work, schema=schema)


def _hamming_matrix(qbytes: np.ndarray, bbytes: np.ndarray) -> np.ndarray:
    """(nq, code_size) × (nb, code_size) uint8 → (nq, nb) popcount."""
    xor = qbytes[:, None, :] ^ bbytes[None, :, :]
    return _POP[xor].sum(axis=2)


def hamming_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    qid_col: str = "qid",
    q_bits_col: str = "bits",
    id_col: str = "id",
    bits_col: str = "bits",
) -> DataFrame:
    """Brute Hamming top-k (``hammings_knn_hc``): broadcast packed query
    codes, per-partition popcount + argpartition, global window merge.
    Returns (qid, pos, id, dist) with dist = hamming distance; ties by
    id, as everywhere."""
    spark = queries.sparkSession
    qrows = queries.select(qid_col, q_bits_col).collect()
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    qb = np.array([np.frombuffer(r[q_bits_col], dtype=np.uint8) for r in qrows])
    bc = spark.sparkContext.broadcast((qids, qb))
    b = base.select(F.col(id_col).alias("id"), F.col(bits_col).alias("bits"))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gqids, gqb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            bb = np.array([np.frombuffer(x, dtype=np.uint8) for x in pdf["bits"]])
            dist = _hamming_matrix(gqb, bb)
            kk = min(k, dist.shape[1])
            # integer distances tie constantly: (dist, id) selection is
            # mandatory for a correct distributed partial top-k
            part = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(gqids, kk),
                    "id": ids[part].ravel(),
                    "dist": np.take_along_axis(dist, part, axis=1).ravel().astype(np.float64),
                }
            )

    partial = b.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
    return topk_per_query(partial, k).select("qid", "pos", "id", "dist")


def hamming_range_count(
    queries: DataFrame,
    base: DataFrame,
    threshold: int,
    qid_col: str = "qid",
    q_bits_col: str = "bits",
    id_col: str = "id",
    bits_col: str = "bits",
) -> DataFrame:
    """``hamming_count_thres`` (hamming.h:118): per query, the number
    of base codes within the Hamming threshold. Returns (qid, cnt)."""
    spark = queries.sparkSession
    qrows = queries.select(qid_col, q_bits_col).collect()
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    qb = np.array([np.frombuffer(r[q_bits_col], dtype=np.uint8) for r in qrows])
    bc = spark.sparkContext.broadcast((qids, qb))
    b = base.select(F.col(bits_col).alias("bits"))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gqids, gqb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            bb = np.array([np.frombuffer(x, dtype=np.uint8) for x in pdf["bits"]])
            cnt = (_hamming_matrix(gqb, bb) < threshold).sum(axis=1)
            yield pd.DataFrame({"qid": gqids, "cnt": cnt.astype(np.int64)})

    partial = b.mapInPandas(scan, schema="qid bigint, cnt bigint")
    return partial.groupBy("qid").agg(F.sum("cnt").alias("cnt"))


def _generalized_hamming_matrix(qbytes: np.ndarray, bbytes: np.ndarray) -> np.ndarray:
    """Generalized Hamming (``Auncel/hamming.h:91-132``
    ``generalized_hammings_knn_hc``): distance = number of UNEQUAL
    BYTES, treating each byte as an opaque symbol — the metric for
    codes where bytes are sub-quantizer indices (e.g. PQ codes), where
    bit-level popcount is meaningless."""
    return (qbytes[:, None, :] != bbytes[None, :, :]).sum(axis=2)


def generalized_hamming_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    qid_col: str = "qid",
    q_bits_col: str = "bits",
    id_col: str = "id",
    bits_col: str = "bits",
) -> DataFrame:
    """Top-k by generalized (per-byte) Hamming distance. Same broadcast
    + per-partition partial + window merge shape as ``hamming_knn``.
    Returns (qid, pos, id, dist)."""
    from auncel_spark.operators.topk import topk_per_query

    spark = queries.sparkSession
    qrows = queries.select(qid_col, q_bits_col).collect()
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    qb = np.array([np.frombuffer(r[q_bits_col], dtype=np.uint8) for r in qrows])
    bc = spark.sparkContext.broadcast((qids, qb))
    b = base.select(F.col(id_col).alias("id"), F.col(bits_col).alias("bits"))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gqids, gqb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            bb = np.array([np.frombuffer(x, dtype=np.uint8) for x in pdf["bits"]])
            dist = _generalized_hamming_matrix(gqb, bb).astype(np.float64)
            kk = min(k, dist.shape[1])
            sel = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(gqids, kk),
                    "id": ids[sel].ravel(),
                    "dist": np.take_along_axis(dist, sel, axis=1).ravel(),
                }
            )

    partial = b.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
    return topk_per_query(partial, k).select("qid", "pos", "id", "dist")


class BinaryIVFIndex:
    """IVF shell over binary codes (``IndexBinaryIVF``): coarse
    centroids in bit space (medoids by Hamming), lists partitioned, scan
    kernel = popcount. Reuses the float IVF's relational plan."""

    def __init__(self, spark, centroids_bits: np.ndarray):
        self.spark = spark
        self.centroids = centroids_bits  # (nlist, code_size) uint8
        self.nlist = centroids_bits.shape[0]
        self._data = None

    @classmethod
    def build(cls, base: DataFrame, nlist: int, id_col: str = "id", bits_col: str = "bits"):
        spark = base.sparkSession
        # deterministic coarse codes: the nlist lowest-id codes act as
        # medoids (the reference trains k-means in float space then
        # binarizes; medoid init keeps this oracle-friendly)
        rows = base.select(id_col, bits_col).orderBy(id_col).limit(nlist).collect()
        cents = np.array([np.frombuffer(r[bits_col], dtype=np.uint8) for r in rows])
        idx = cls(spark, cents)
        bc = spark.sparkContext.broadcast(cents)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                bb = np.array([np.frombuffer(x, dtype=np.uint8) for x in pdf[bits_col]])
                lab = _hamming_matrix(bb, C).argmin(axis=1)
                yield pdf.assign(list_no=lab.astype(np.int32))

        from pyspark.sql import types as T

        schema = T.StructType(
            list(base.select(id_col, bits_col).schema.fields)
            + [T.StructField("list_no", T.IntegerType())]
        )
        idx._data = base.select(id_col, bits_col).mapInPandas(assign, schema).cache()
        idx._data.count()
        return idx

    def search(
        self, queries: DataFrame, k: int, nprobe: int, strategy: str = "bcast"
    ) -> DataFrame:
        qrows = queries.select("qid", "bits").collect()
        qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
        qb = np.array([np.frombuffer(r["bits"], dtype=np.uint8) for r in qrows])
        cd = _hamming_matrix(qb, self.centroids)
        order = np.argsort(cd, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        if strategy == "bcast":
            # broadcast-queries popcount kernel: each code crosses Arrow
            # once regardless of how many queries probe its list
            from auncel_spark.index.scan import scan_window_coded
            from auncel_spark.config import Metric

            partial = scan_window_coded(
                self._data, qids, None, order, 0, nprobe, k, Metric.L2,
                self.nlist, {"kind": "hamming", "qbits": qb}, code_col="bits",
                rebalance=self.spark.sparkContext.defaultParallelism,
            )
            return topk_per_query(partial, k).select("qid", "pos", "id", "dist")
        # join path (oracle-shape reference); Arrow probes frame — a
        # Python tuple list stalls the driver at nq·nprobe scale
        nq, npb = order.shape
        probes = self.spark.createDataFrame(
            pd.DataFrame(
                {
                    "qid": np.repeat(qids, npb),
                    "list_no": order.ravel(),
                }
            )
        )
        probed = sorted({int(x) for x in np.unique(order)})
        pruned = self._data.filter(F.col("list_no").isin(probed))
        joined = pruned.join(F.broadcast(probes), "list_no").select("qid", "id", "bits")
        bc = self.spark.sparkContext.broadcast((qids, qb, {int(q): i for i, q in enumerate(qids)}))

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            gq, gqb, qpos = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                out = []
                for qid, grp in pdf.groupby("qid"):
                    qv = gqb[qpos[int(qid)]][None, :]
                    bb = np.array([np.frombuffer(x, dtype=np.uint8) for x in grp["bits"]])
                    dist = _hamming_matrix(qv, bb)[0]
                    gids = grp["id"].to_numpy(dtype=np.int64)
                    kk = min(k, len(dist))
                    sel = np.lexsort((gids, dist))[:kk]  # (dist, id) ties
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": np.full(kk, qid, dtype=np.int64),
                                "id": gids[sel],
                                "dist": dist[sel].astype(np.float64),
                            }
                        )
                    )
                if out:
                    yield pd.concat(out, ignore_index=True)

        partial = joined.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
        return topk_per_query(partial, k).select("qid", "pos", "id", "dist")
