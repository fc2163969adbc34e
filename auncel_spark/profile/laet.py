"""LAET-style learned early termination (comparison system).

Reference (SURVEY.md §2.2 B18): the LAET fork (SIGMOD'20 "Learned
Adaptive Early Termination") trains a LightGBM regressor to predict
each query's minimal sufficient probe count, then searches with
``nprobe_i = multiplier · prediction`` capped at ``pred_max``
(``LAET/IndexIVF.h:114,118,131,205``; training pipeline
``LAET/benchs/learned_termination/train_gbdt.py:14-115``).

Spark re-expression: features come from the coarse ranking (already
computed for every search); labels are each training query's true
minimal stage (found by replaying the staged sweep against ground
truth — one pass, no per-nprobe re-search); the model is
``pyspark.ml.regression.GBTRegressor``. Online, predictions set a
per-query fixed probe target and the staged delta-scan loop retires
each query at its target — per-query adaptivity without Auncel's
geometric machinery (the experimental contrast the paper draws).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from auncel_spark.index.ivf import IVFIndex
from auncel_spark.profile.error_profile import ErrorProfile


class LearnedTermination:
    def __init__(self, index: IVFIndex, max_topk: int = 100, multiplier: float = 1.0):
        self.index = index
        self.max_topk = max_topk
        self.multiplier = multiplier  # LAET's "multipler = nprobe/100" knob
        self.model = None
        self._helper = ErrorProfile(index, max_topk=max_topk)

    # feature vector per query: coarse-distance shape + query norm
    def _features(self, qmat: np.ndarray, cdist: np.ndarray) -> np.ndarray:
        c0 = cdist[:, 0]
        safe = np.where(c0 == 0, 1.0, c0)
        n_take = min(10, cdist.shape[1]) - 1
        rat = cdist[:, 1 : 1 + n_take] / safe[:, None]
        norm = np.linalg.norm(qmat, axis=1)
        return np.column_stack([c0, rat, norm])

    def fit(
        self,
        train_queries: DataFrame,
        topk: int,
        target_recall: float = 0.9,
        gt_dists: np.ndarray | None = None,
        gbt_iter: int = 8,
    ) -> "LearnedTermination":
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import GBTRegressor

        if gt_dists is None:
            gt_dists = self._helper._exact_gt(train_queries)
        stages = []
        s = 1
        while s <= self.index.nlist:
            stages.append(s)
            s <<= 1
        sweep = self._helper._sweep_states(train_queries, stages)
        qids = sweep["qids"]
        # gt rows are ascending-qid; sweep rows follow collect order
        gt_dists = self._helper._align_gt(gt_dists, qids)
        gt_kth = gt_dists[:, topk - 1]
        # label: smallest stage whose state meets the recall target
        labels = np.full(len(qids), float(np.log2(stages[-1])))
        for si, st in enumerate(stages):
            d = sweep["states_d"][si][:, :topk]
            ok = (d <= gt_kth[:, None] + 1e-6).sum(axis=1) / topk >= target_recall
            fresh = ok & (labels == float(np.log2(stages[-1])))
            # only set once (first satisfying stage)
            if si < len(stages) - 1:
                labels[fresh] = float(si)

        q = train_queries.select("qid", "vec").collect()
        qmat = np.array([r["vec"] for r in q], dtype=np.float64)
        _, cdist = self.index.coarse_rank(
            np.array([r["qid"] for r in q]), qmat, self.index.nlist
        )
        feats = self._features(qmat, cdist)
        spark = self.index.spark
        rows = [
            ([float(v) for v in feats[i]], float(labels[i])) for i in range(len(qids))
        ]
        df = spark.createDataFrame(rows, "raw array<double>, label double")
        from pyspark.ml.functions import array_to_vector

        df = df.select(array_to_vector("raw").alias("features"), "label")
        # each boosting round is several Spark jobs; 8 rounds suffice
        # for the 11-feature budget regression (LightGBM in the
        # reference uses early stopping similarly)
        gbt = GBTRegressor(maxIter=gbt_iter, maxDepth=4, seed=42)
        self.model = gbt.fit(df)
        return self

    def predict_stages(self, queries: DataFrame) -> tuple[np.ndarray, np.ndarray]:
        from pyspark.ml.functions import array_to_vector

        q = queries.select("qid", "vec").collect()
        qids = np.array([r["qid"] for r in q], dtype=np.int64)
        qmat = np.array([r["vec"] for r in q], dtype=np.float64)
        _, cdist = self.index.coarse_rank(qids, qmat, self.index.nlist)
        feats = self._features(qmat, cdist)
        spark = self.index.spark
        df = spark.createDataFrame(
            [(int(qids[i]), [float(v) for v in feats[i]]) for i in range(len(qids))],
            "qid bigint, raw array<double>",
        ).select("qid", array_to_vector("raw").alias("features"))
        pred = {r["qid"]: r["prediction"] for r in self.model.transform(df).collect()}
        stage_idx = np.array(
            [max(0.0, pred[int(x)]) for x in qids]
        )
        nprobe = np.minimum(
            np.ceil((2.0 ** stage_idx) * self.multiplier), self.index.nlist
        ).astype(np.int64)
        return qids, nprobe

    def search(self, queries: DataFrame, topk: int, return_info: bool = False):
        """Probe each query to its predicted target via staged delta
        scans (shared machinery with the ELP loop)."""
        qids_order, nprobe = self.predict_stages(queries)
        ep = self._helper
        qids, qmat, ranked, cdist, _ = ep._coarse(queries)
        pos = {int(q): i for i, q in enumerate(qids)}
        targets = np.empty(len(qids), dtype=np.int64)
        for q, np_ in zip(qids_order, nprobe):
            targets[pos[int(q)]] = np_
        state_d = np.full((len(qids), ep.max_topk), np.inf)
        state_i = np.full((len(qids), ep.max_topk), -1, dtype=np.int64)
        # every per-query probe budget is known BEFORE any scan (the
        # learned predictor fixes it), so the staged ladder collapses
        # to ONE per-query-bounded scan job (scan_window hi_q). The
        # ladder retired a query at the first stage boundary >= its
        # target, so depths round up to the next power of two (capped
        # at the ladder's last stage) — identical scanned list sets,
        # log2(max nprobe) fewer Spark jobs per search.
        s_last = 1
        while (s_last << 1) <= self.index.nlist:
            s_last <<= 1
        depth = np.minimum(
            np.exp2(np.ceil(np.log2(np.maximum(targets, 1)))).astype(np.int64),
            s_last,
        )
        active = np.ones(len(qids), dtype=bool)
        ep._merge_state(
            state_d,
            state_i,
            ep._scan_delta(
                qids, qmat, ranked, active, 0, int(depth.max()), hi_q=depth
            ),
            pos,
        )
        res = ep._state_to_df(qids, state_d, state_i, topk)
        if return_info:
            return res, {"qid": qids, "nprobe": targets}
        return res
