"""IVF-SQ: inverted lists storing scalar-quantized codes.

Reference (SURVEY.md §2.2 B8): ``IndexIVFScalarQuantizer``
(``Auncel/IndexScalarQuantizer.h:90-150``): lists hold SQ codes
(d bytes/vector at QT_8bit, d/2 at QT_4bit, 3d/4 at QT_6bit, 2d at
QT_fp16), decoded on the fly inside the scan. Same storage layout and
probe machinery as IVF-Flat/IVF-PQ; the scan kernel decodes each Arrow
batch with the broadcast quantizer state before the GEMM.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np

from auncel_spark.functions.vector import as_matrix
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auncel_spark.config import DEFAULT_NLIST, Metric
from auncel_spark.index.ivf import IVFIndex
from auncel_spark.index.kmeans import assign_lists, train_kmeans
from auncel_spark.index.sq import ScalarQuantizer


class IVFSQIndex(IVFIndex):
    def __init__(
        self,
        spark: SparkSession,
        centroids: np.ndarray,
        sq: ScalarQuantizer,
        data_path: str | None,
        metric: Metric = Metric.L2,
        data_df: DataFrame | None = None,
    ):
        super().__init__(spark, centroids, data_path, metric, data_df)
        self.sq = sq

    @classmethod
    def build(
        cls,
        base: DataFrame,
        nlist: int = DEFAULT_NLIST,
        metric: Metric = Metric.L2,
        path: str | None = None,
        centroids: np.ndarray | None = None,
        kmeans_iter: int = 25,
        seed: int = 42,
        qtype: str = "8bit",
        rangestat: str = "minmax",
        rs_arg: float = 1.0,
        id_col: str = "id",
        vec_col: str = "vec",
    ) -> "IVFSQIndex":
        spark = base.sparkSession
        b = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        if centroids is None:
            centroids, _ = train_kmeans(
                b, nlist, metric=metric, max_iter=kmeans_iter, seed=seed,
                spherical=(metric == Metric.IP),
            )
        centroids = np.asarray(centroids, dtype=np.float64)
        sq = ScalarQuantizer.train(b, rangestat=rangestat, rs_arg=rs_arg, qtype=qtype)
        idx = cls(spark, centroids, sq, path, metric)
        coded = sq.encode(assign_lists(b, centroids, metric)).select(
            "id", "code", "list_no"
        )
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
                        "kind": "ivfsq",
                        "nlist": idx.nlist,
                        "d": idx.d,
                        "metric": metric.value,
                        "sq": sq.to_dict(),
                    },
                    f,
                )
            np.save(os.path.join(path, "centroids.npy"), centroids)
        else:
            idx._data_df = coded.cache()
            idx._data_df.count()
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFSQIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        centroids = np.load(os.path.join(path, "centroids.npy"))
        return cls(
            spark,
            centroids,
            ScalarQuantizer.from_dict(meta["sq"]),
            path,
            Metric(meta["metric"]),
        )

    def search(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int,
        qid_col: str = "qid",
        vec_col: str = "vec",
        strategy: str = "bcast",
        rebalance: int | None = None,
    ) -> DataFrame:
        """strategy="bcast" (default): broadcast-queries coded scan —
        each SQ code crosses Arrow once regardless of how many queries
        probe its list, decoded in-task (index/scan.py). "join": the
        probes-broadcast-join decode path (code payload duplicated per
        probing query; kept as the oracle-shape reference).
        ``rebalance``: tasks for the salted skew split of hot lists
        (None = defaultParallelism; 0 disables)."""
        if strategy == "join":
            return super().search(queries, k, nprobe, qid_col, vec_col, strategy="join")
        if rebalance is None:
            rebalance = self.spark.sparkContext.defaultParallelism
        from auncel_spark.index.scan import scan_window_coded
        from auncel_spark.operators.topk import topk_per_query

        q = queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec"))
        qpdf = q.toPandas()
        qids = qpdf["qid"].to_numpy(dtype=np.int64)
        qmat = as_matrix(qpdf["vec"])
        ranked, _ = self.coarse_rank(qids, qmat, nprobe)
        partial = scan_window_coded(
            self.data, qids, qmat, ranked, 0, nprobe, k, self.metric,
            self.nlist, {"kind": "sq", "sq": self.sq.to_dict()},
            rebalance=rebalance or None,
        )
        return topk_per_query(partial, k).select("qid", "pos", "id", "dist")

    def _scan_lists(
        self,
        probes: DataFrame,
        qids: np.ndarray,
        qmat: np.ndarray,
        k: int,
        probed_lists: list[int] | None = None,
    ) -> DataFrame:
        if probed_lists is None:
            probed_lists = sorted(
                {int(r["list_no"]) for r in probes.select("list_no").distinct().collect()}
            )
        pruned = self.data.filter(F.col("list_no").isin(probed_lists))
        joined = pruned.join(F.broadcast(probes), "list_no").select("qid", "id", "code")
        bc = self.spark.sparkContext.broadcast(
            (
                qids,
                qmat,
                {int(q): i for i, q in enumerate(qids)},
                self.sq.to_dict(),
            )
        )
        is_l2 = self.metric == Metric.L2

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _, bq, qpos, sqd = bc.value
            dec = ScalarQuantizer.from_dict(sqd)
            for pdf in batches:
                if pdf.empty:
                    continue
                out = []
                codes = np.array(
                    [np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]]
                )
                mat = dec.decode_np(codes)
                ids_all = pdf["id"].to_numpy(dtype=np.int64)
                for qid, grp_idx in pdf.groupby("qid").indices.items():
                    qv = bq[qpos[int(qid)]]
                    sub = mat[grp_idx]
                    dots = sub @ qv
                    if is_l2:
                        dist = (sub * sub).sum(axis=1) + (qv @ qv) - 2.0 * dots
                    else:
                        dist = -dots
                    gids = ids_all[grp_idx]
                    kk = min(k, len(dist))
                    sel = np.lexsort((gids, dist))[:kk]
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
