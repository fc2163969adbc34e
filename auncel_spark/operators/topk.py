"""Top-k maintenance and cross-shard merge.

The reference keeps per-query fixed-size binary heaps
(``Auncel/Heap.h:88-147``) with per-thread partials merged at the end
(``HeapArray.addn``), and a 2-way sorted merge across shards
(``Auncel/dist/reduce.cpp:98-119``, ``merge_result_table_with``
``Auncel/utils.h:337-341``). In Spark both collapse to one associative
relational pattern: union the candidate sets, then re-take the best k
per query with a window — never a global sort. Catalyst compiles the
window to a per-partition ``TopK``-style sort after a hash exchange on
``qid``, which is the heap pattern, distributed.

Ties are broken by id ascending (``ranklist_handle_ties``,
``Auncel/utils.h:320-321``) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_query(
    df: DataFrame,
    k: int,
    qid_col: str = "qid",
    dist_col: str = "dist",
    id_col: str = "id",
    pos_col: str = "pos",
) -> DataFrame:
    """Keep the k closest rows per query; emit 0-based rank ``pos``.

    Equivalent of heap ``reorder_result`` output
    (``Auncel/IndexIVF.cpp:677``): ascending (dist, id) per query.
    """
    w = Window.partitionBy(qid_col).orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
    return (
        df.withColumn(pos_col, F.row_number().over(w) - 1)
        .filter(F.col(pos_col) < k)
    )


def merge_topk(
    k: int,
    *results: DataFrame,
    qid_col: str = "qid",
    dist_col: str = "dist",
    id_col: str = "id",
) -> DataFrame:
    """Merge any number of per-shard top-k tables into a global top-k.

    Reference: 2-way sorted merge per query (``dist/reduce.cpp:98-119``).
    Union + window is associative at any fan-in, so a 128-shard merge is
    one job instead of log2(128) pairwise passes.
    """
    if not results:
        raise ValueError("need at least one result table")
    out = results[0].select(qid_col, id_col, dist_col)
    for r in results[1:]:
        out = out.unionByName(r.select(qid_col, id_col, dist_col))
    # duplicate ids can appear when shards overlap; keep best per (qid,id)
    out = out.groupBy(qid_col, id_col).agg(F.min(dist_col).alias(dist_col))
    return topk_per_query(out, k, qid_col=qid_col, dist_col=dist_col, id_col=id_col)
