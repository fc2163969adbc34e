"""IndexFlat variants and matrix statistics.

Reference (SURVEY.md §2.3 O5, O31):
- ``IndexFlatL2BaseShift`` (``Auncel/IndexFlat.h:84-95``): L2 search
  with a per-database-vector shift subtracted from every distance
  (used for asymmetric corrections).
- ``IndexFlat1D`` (``Auncel/IndexFlat.h:136-158``): 1-D corpus kept
  sorted; kNN by binary search + two-pointer walk — relationally, an
  ORDER BY abs(x − q) LIMIT k.
- ``MatrixStats`` (``Auncel/AutoTune.h:218-252``): per-dimension
  profile of a vector corpus (min/max/mean/stddev, zero/invalid
  counts) used to sanity-check inputs before indexing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auncel_spark.functions.vector import as_matrix

from auncel_spark.operators.topk import topk_per_query


def knn_base_shift(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    shift_col: str = "shift",
    qid_col: str = "qid",
    q_vec_col: str = "vec",
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """O5 BaseShift: rank by L2²(q, x) − shift(x). Same GEMM partial
    top-k shape as ``knn_exact(strategy='gemm')`` with the per-row
    shift applied inside the kernel."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    spark = queries.sparkSession
    qrows = queries.select(qid_col, q_vec_col).collect()
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r[q_vec_col] for r in qrows], dtype=np.float64)
    bc = spark.sparkContext.broadcast((qids, qmat))
    b = base.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col(shift_col).alias("shift"),
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gq, gm = bc.value
        qn = (gm * gm).sum(axis=1)[:, None]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            mat = as_matrix(pdf["vec"])
            shift = pdf["shift"].to_numpy(dtype=np.float64)
            dist = qn + (mat * mat).sum(axis=1)[None, :] - 2.0 * (gm @ mat.T)
            dist = dist - shift[None, :]
            kk = min(k, dist.shape[1])
            part = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(gq, kk),
                    "id": ids[part].ravel(),
                    "dist": np.take_along_axis(dist, part, axis=1).ravel(),
                }
            )

    partial = b.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
    return topk_per_query(partial, k).select("qid", "pos", "id", "dist")


def knn_1d(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    qid_col: str = "qid",
    q_val_col: str = "val",
    id_col: str = "id",
    val_col: str = "val",
) -> DataFrame:
    """O5 Flat1D: nearest scalars by |x − q|; Catalyst turns the
    window into per-query TopK — no full sort of the corpus."""
    q = queries.select(F.col(qid_col).alias("qid"), F.col(q_val_col).alias("_qv"))
    b = base.select(F.col(id_col).alias("id"), F.col(val_col).alias("_bv"))
    scored = b.join(F.broadcast(q)).select(
        "qid", "id", F.abs(F.col("_qv") - F.col("_bv")).cast("double").alias("dist")
    )
    return topk_per_query(scored, k).select("qid", "pos", "id", "dist")


def matrix_stats(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """O31 MatrixStats: per-dimension corpus profile. One distributed
    agg over posexploded components (map-side combined)."""
    ex = df.select(F.posexplode(vec_col).alias("dim", "v"))
    return (
        ex.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.avg("v").alias("mean_v"),
            F.stddev_pop("v").alias("std_v"),
            F.sum(F.when(F.col("v") == 0.0, 1).otherwise(0)).alias("n_zero"),
            F.sum(F.when(F.isnan("v") | F.col("v").isNull(), 1).otherwise(0)).alias(
                "n_invalid"
            ),
        )
        .orderBy("dim")
    )
