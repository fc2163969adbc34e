from auncel_spark.operators.components import connected_components, dedup_clusters
from auncel_spark.operators.decontaminate import decontaminate, ngram_overlap
from auncel_spark.operators.knn import knn_by_ids, knn_exact, range_search
from auncel_spark.operators.packing import pack_sequences, packing_stats
from auncel_spark.operators.bloom import bloom_build, bloom_novel, bloom_probe
from auncel_spark.operators.recall import intersection_recall, threshold_recall
from auncel_spark.operators.repetition import (
    ngram_repetition_stats,
    repetition_filter,
    word_chunks,
)
from auncel_spark.operators.sampling import (
    domain_mix,
    hash_sample,
    stratified_sample,
)
from auncel_spark.operators.temporal import asof_join, session_stats, sessionize
from auncel_spark.operators.topk import merge_topk, topk_per_query

__all__ = [
    "knn_by_ids",
    "knn_exact",
    "range_search",
    "intersection_recall",
    "threshold_recall",
    "merge_topk",
    "topk_per_query",
    "connected_components",
    "dedup_clusters",
    "decontaminate",
    "ngram_overlap",
    "pack_sequences",
    "packing_stats",
    "domain_mix",
    "hash_sample",
    "stratified_sample",
    "asof_join",
    "session_stats",
    "sessionize",
    "bloom_build",
    "bloom_novel",
    "bloom_probe",
    "ngram_repetition_stats",
    "repetition_filter",
    "word_chunks",
]
