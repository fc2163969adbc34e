"""IVF-PQ: inverted lists storing PQ codes, ADC scanning.

Reference (SURVEY.md §2.3 O8-O9): ``IndexIVFPQ``
(``Auncel/IndexIVFPQ.h:34-130``, .cpp 1552 LoC): per-query M×ksub
distance tables over (optionally residual) codes, gather-sum ADC, with
``IndexIVFPQR``/``IndexRefineFlat`` re-ranking on top.

Storage: ``(id, code BINARY, list_no)`` partitioned by list_no — codes
are M bytes instead of 4·d, cutting scan+shuffle bytes ~32× at d=64/M=8
(SURVEY §7.3: what makes 100 TB realistic). Residual mode
(``by_residual``, the reference default) encodes r = x − centroid(list)
and builds one LUT per (query, probed list); plain mode builds one LUT
per query.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auncel_spark.config import DEFAULT_NLIST, Metric
from auncel_spark.index.ivf import IVFIndex
from auncel_spark.index.kmeans import assign_lists, train_kmeans
from auncel_spark.index.pq import ProductQuantizer
from auncel_spark.operators.topk import topk_per_query


class IVFPQIndex(IVFIndex):
    def __init__(
        self,
        spark: SparkSession,
        centroids: np.ndarray,
        pq: ProductQuantizer,
        data_path: str | None,
        metric: Metric = Metric.L2,
        by_residual: bool = True,
        data_df: DataFrame | None = None,
    ):
        super().__init__(spark, centroids, data_path, metric, data_df)
        self.pq = pq
        self.by_residual = by_residual

    @classmethod
    def build(
        cls,
        base: DataFrame,
        nlist: int = DEFAULT_NLIST,
        M: int = 8,
        nbits: int = 8,
        metric: Metric = Metric.L2,
        path: str | None = None,
        centroids: np.ndarray | None = None,
        by_residual: bool = True,
        kmeans_iter: int = 25,
        seed: int = 42,
        id_col: str = "id",
        vec_col: str = "vec",
    ) -> "IVFPQIndex":
        spark = base.sparkSession
        b = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        if centroids is None:
            centroids, _ = train_kmeans(
                b, nlist, metric=metric, max_iter=kmeans_iter, seed=seed,
                spherical=(metric == Metric.IP),
            )
        centroids = np.asarray(centroids, dtype=np.float64)
        assigned = assign_lists(b, centroids, metric)

        # train PQ on (residual) vectors, then encode distributed
        if by_residual:
            train_src = _residual_df(assigned, centroids)
        else:
            train_src = assigned
        pq = ProductQuantizer.train(train_src, M=M, nbits=nbits, vec_col="vec" if not by_residual else "rvec", seed=seed)

        idx = cls(spark, centroids, pq, path, metric, by_residual)
        if by_residual:
            coded = pq.encode(_residual_df(assigned, centroids), vec_col="rvec")
        else:
            coded = pq.encode(assigned)
        coded = coded.select("id", "code", "list_no")
        if path is not None:
            (
                coded.repartition("list_no")
                .write.mode("overwrite")
                .partitionBy("list_no")
                .parquet(os.path.join(path, "lists"))
            )
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(
                    {
                        "kind": "ivfpq",
                        "nlist": idx.nlist,
                        "d": idx.d,
                        "metric": metric.value,
                        "by_residual": by_residual,
                        "pq": pq.to_dict(),
                    },
                    f,
                )
            np.save(os.path.join(path, "centroids.npy"), centroids)
        else:
            idx._data_df = coded.cache()
            idx._data_df.count()
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFPQIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        centroids = np.load(os.path.join(path, "centroids.npy"))
        return cls(
            spark,
            centroids,
            ProductQuantizer.from_dict(meta["pq"]),
            path,
            Metric(meta["metric"]),
            meta["by_residual"],
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int,
        qid_col: str = "qid",
        vec_col: str = "vec",
        strategy: str = "join",
    ) -> DataFrame:
        # the lists table stores codes, not vectors — route through the
        # ADC _scan_lists override rather than the raw-vector GEMM path
        return super().search(queries, k, nprobe, qid_col, vec_col, strategy="join")

    def _scan_lists(
        self,
        probes: DataFrame,
        qids: np.ndarray,
        qmat: np.ndarray,
        k: int,
        probed_lists: list[int] | None = None,
    ) -> DataFrame:
        """ADC scan: partition-pruned code join + per-(query, list) LUT
        gather-sum (the InvertedListScanner of IndexIVFPQ)."""
        if probed_lists is None:
            probed_lists = sorted(
                {int(r["list_no"]) for r in probes.select("list_no").distinct().collect()}
            )
        pruned = self.data.filter(F.col("list_no").isin(probed_lists))
        joined = pruned.join(F.broadcast(probes), "list_no").select(
            "qid", "id", "code", "list_no"
        )
        bc = self.spark.sparkContext.broadcast(
            (
                qids,
                qmat,
                {int(q): i for i, q in enumerate(qids)},
                self.pq.codebooks,
                self.centroids if self.by_residual else None,
            )
        )
        metric = self.metric

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _, bq, qpos, books, cents = bc.value
            kernel = ProductQuantizer(books)
            lut_cache: dict[tuple[int, int], np.ndarray] = {}
            for pdf in batches:
                if pdf.empty:
                    continue
                out = []
                for (qid, list_no), grp in pdf.groupby(["qid", "list_no"]):
                    q = bq[qpos[int(qid)]]
                    key = (int(qid), int(list_no) if cents is not None else -1)
                    lut = lut_cache.get(key)
                    if lut is None:
                        # L2: |q−x|² = |(q−c) − r|² → table on (q−c).
                        # IP: ⟨q,x⟩ = ⟨q,c⟩ + ⟨q,r⟩ → table on q itself,
                        # constant ⟨q,c⟩ folded in below.
                        if cents is not None and metric == Metric.L2:
                            qeff = q - cents[int(list_no)]
                        else:
                            qeff = q
                        lut = kernel.lut_np(qeff, metric)
                        lut_cache[key] = lut
                    codes = np.array(
                        [np.frombuffer(c, dtype=np.uint8) for c in grp["code"]]
                    )
                    dist = kernel.adc_np(lut, codes)
                    if cents is not None and metric == Metric.IP:
                        dist = dist - float(q @ cents[int(list_no)])
                    gids = grp["id"].to_numpy(dtype=np.int64)
                    kk = min(k, len(dist))
                    sel = np.lexsort((gids, dist))[:kk]  # (dist, id) ties
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": np.full(kk, qid, dtype=np.int64),
                                "id": gids[sel],
                                "dist": dist[sel],
                            }
                        )
                    )
                if out:
                    yield pd.concat(out, ignore_index=True)

        return joined.mapInPandas(scan, schema="qid bigint, id bigint, dist double")

    def search_refine(
        self,
        queries: DataFrame,
        full_base: DataFrame,
        k: int,
        nprobe: int,
        k_factor: int = 4,
    ) -> DataFrame:
        """IVFPQR / IndexRefineFlat (O9): ADC candidates k·k_factor,
        exact re-rank against the uncompressed vectors."""
        from auncel_spark.operators.knn import knn_by_ids

        cand = self.search(queries, k * k_factor, nprobe).select("qid", "id")
        return knn_by_ids(queries, full_base, cand, k, self.metric)


def _residual_df(assigned: DataFrame, centroids: np.ndarray) -> DataFrame:
    """rvec = vec − centroid[list_no], Arrow-batched."""
    from pyspark.sql import types as T

    spark = assigned.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))
    schema = T.StructType(
        list(assigned.schema.fields)
        + [T.StructField("rvec", T.ArrayType(T.FloatType()))]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            res = mat - cents[pdf["list_no"].to_numpy()]
            yield pdf.assign(rvec=list(res.astype(np.float32)))

    return assigned.mapInPandas(work, schema=schema)
