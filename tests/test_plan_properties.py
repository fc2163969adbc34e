"""Physical-plan regression guards: the scale behavior the engine is
built around must be visible in the executed plan, not assumed."""

from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.index.ivf import IVFIndex


def test_ivf_scan_prunes_partitions_and_broadcasts(base_df, query_df, tiny_vectors, tmp_path):
    xb, _ = tiny_vectors
    path = str(tmp_path / "ivf_plan")
    idx = IVFIndex.build(
        base_df, nlist=16, centroids=xb[:16].astype(np.float64), path=path
    )
    idx2 = IVFIndex.load(base_df.sparkSession, path)
    probes, qids, qmat, probed = idx2.probes_df(query_df.select("qid", "vec"), 4)
    partial = idx2._scan_lists(probes, qids, qmat, 10, probed_lists=probed)
    plan = partial._jdf.queryExecution().executedPlan().toString()
    # static partition pruning from the isin filter over list_no
    assert "PartitionFilters" in plan and "INSET" in plan, plan[:2000]
    # the probe side must broadcast (never shuffle the lists table)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no full-corpus exchange before the scan kernel
    assert plan.count("FileScan parquet") == 1


def test_exact_knn_has_no_shuffle_before_kernel(base_df, query_df):
    from auncel_spark.config import Metric
    from auncel_spark.operators.knn import knn_exact

    res = knn_exact(query_df, base_df, 5, Metric.L2, "gemm")
    plan = res._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the qid hash for the global top-k window —
    # the scan side must not shuffle vectors
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]


def test_coded_scan_prunes_partitions_no_join(base_df, query_df, tmp_path):
    """The broadcast-queries coded scan must read only probed list
    partitions (PartitionFilters INSET) and contain NO join at all —
    queries ride in a task broadcast, codes cross Arrow once."""
    from auncel_spark.index.ivfsq import IVFSQIndex

    path = str(tmp_path / "ivfsq_plan")
    idx = IVFSQIndex.build(base_df, nlist=16, kmeans_iter=3, qtype="4bit", path=path)
    idx2 = IVFSQIndex.load(base_df.sparkSession, path)
    res = idx2.search(query_df.limit(3), 5, 2, strategy="bcast")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and (
        "INSET" in plan or "list_no" in plan.split("PartitionFilters")[1][:120]
    ), plan[:2000]
    assert "Join" not in plan, plan[:2000]
    # only the code and partition columns are read — never a vec column
    assert "ReadSchema" in plan and "vec" not in plan.split("ReadSchema")[1][:200]


def test_word_chunks_shuffle_free(spark):
    from pyspark.sql import functions as F

    from auncel_spark.operators.repetition import word_chunks

    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(10)], "doc_id bigint, text string"
    )
    plan = (
        word_chunks(df, 4, 3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:2000]


def test_bloom_probe_broadcasts_bitset(spark):
    from auncel_spark.operators.bloom import bloom_build, bloom_probe

    df = spark.createDataFrame(
        [(i, f"t {i}") for i in range(20)], "doc_id bigint, text string"
    )
    res = bloom_probe(df, bloom_build(df, m=1 << 12), m=1 << 12)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # bit-set joins broadcast-side; the corpus is never shuffled for the join
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_source_cap_single_exchange(spark):
    from auncel_spark.operators.sampling import source_cap

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id bigint, source string"
    )
    plan = source_cap(df, 5)._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on source for the rank window; nothing global
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Exchange SinglePartition" not in plan
