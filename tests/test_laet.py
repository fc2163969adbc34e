from __future__ import annotations

import numpy as np
import pytest

from auncel_spark.index.ivf import IVFIndex
from auncel_spark.profile.laet import LearnedTermination
from tests.conftest import np_knn

TOPK = 10


@pytest.fixture(scope="module")
def laet_setup(spark):
    rng = np.random.default_rng(21)
    k, per, d = 16, 100, 16
    centers = rng.standard_normal((k, d)) * 3.0
    xb = np.vstack([centers[i] + rng.standard_normal((per, d)) for i in range(k)]).astype(np.float32)
    xq = (centers[rng.integers(0, k, 40)] + rng.standard_normal((40, d))).astype(np.float32)
    base = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(xb)], "id bigint, vec array<float>"
    ).cache()
    queries = spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(xq)], "qid bigint, vec array<float>"
    ).cache()
    idx = IVFIndex.build(base, nlist=32, kmeans_iter=8, seed=6)
    lt = LearnedTermination(idx, max_topk=40)
    lt.fit(queries, TOPK, target_recall=0.9)
    return xb, xq, lt, queries


def test_laet_fit_and_predict(laet_setup):
    xb, xq, lt, queries = laet_setup
    qids, nprobe = lt.predict_stages(queries)
    assert len(qids) == 40
    assert np.all(nprobe >= 1) and np.all(nprobe <= 32)


def test_laet_search_recall(laet_setup):
    xb, xq, lt, queries = laet_setup
    lt.multiplier = 2.0  # LAET's safety multiplier knob
    res, info = lt.search(queries, TOPK, return_info=True)
    ids_true, dists = np_knn(xq, xb, TOPK, "l2")
    gt_kth = dists[:, TOPK - 1]
    per_q = {}
    for r in res.collect():
        per_q.setdefault(r["qid"], []).append(r["dist"])
    recs = [
        (np.array(per_q[qi]) <= gt_kth[qi] + 1e-6).sum() / TOPK for qi in range(40)
    ]
    assert np.mean(recs) >= 0.8  # learned budgets hit the recall target on average
    assert info["nprobe"].mean() < 32  # and do so without exhaustive probing
