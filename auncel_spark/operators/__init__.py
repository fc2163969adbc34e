from auncel_spark.operators.knn import knn_by_ids, knn_exact, range_search
from auncel_spark.operators.recall import intersection_recall, threshold_recall
from auncel_spark.operators.topk import merge_topk, topk_per_query

__all__ = [
    "knn_by_ids",
    "knn_exact",
    "range_search",
    "intersection_recall",
    "threshold_recall",
    "merge_topk",
    "topk_per_query",
]
