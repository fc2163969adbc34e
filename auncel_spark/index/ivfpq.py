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

from auncel_spark.functions.vector import as_matrix
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
        use_precomputed_table: bool = True,
        rotation: np.ndarray | None = None,
        enc_of: np.ndarray | None = None,
        enc_centroids: np.ndarray | None = None,
    ):
        super().__init__(spark, centroids, data_path, metric, data_df)
        self.pq = pq
        self.by_residual = by_residual
        self.use_precomputed_table = use_precomputed_table
        self._term2: np.ndarray | None = None
        # refined (split-list) quantizer support: ``centroids`` are the
        # fine PROBING cells (nlist = parents · split), while codes stay
        # residual-encoded against the PARENT centroid — enc_of maps a
        # fine list to its parent's row in enc_centroids, keeping every
        # encoding-side table (term2, residual LUT base) parent-sized.
        # Built by ``split_ivfpq_lists``; None on ordinary indexes.
        self.enc_of = (
            np.asarray(enc_of, dtype=np.int32) if enc_of is not None else None
        )
        self.enc_centroids = (
            np.asarray(enc_centroids, dtype=np.float64)
            if enc_centroids is not None
            else None
        )
        # OPQ pre-rotation (faiss "OPQ{M},IVF{n},PQ{M}" idiom,
        # Auncel/AutoTune.cpp:741-949 factory strings): centroids here
        # are stored ROTATED, codes encode rotated residuals, and
        # queries rotate on entry. Exact refine stays rotation-free —
        # the rotation is orthonormal, so |Rq − Rx| = |q − x|.
        self.rotation = (
            np.asarray(rotation, dtype=np.float64) if rotation is not None else None
        )

    def precomputed_term2(self) -> np.ndarray:
        """``use_precomputed_table`` (IndexIVFPQ.h:48-59): for residual
        L2 ADC, |q − c − z|² = |q − c|² (term1, one scalar per probe)
        + (|z|² + 2·c·z) (term2 — THIS table, query-independent,
        (nlist, M, ksub)) + (−2·q·z) (term3, ONE per-query LUT). The
        round-1 kernel rebuilt the full residual LUT per (query, probed
        list) — M·ksub·dsub multiplies per pair; with the table it is a
        M·ksub add. At nlist=1024, M=8, ksub=256 the table is 16 MB —
        broadcast beside the codebooks."""
        if self._term2 is None:
            cb = self.pq.codebooks  # (M, ksub, dsub)
            znorm = (cb * cb).sum(-1)  # (M, ksub)
            # encoding centroids: the parent table under a split-list
            # quantizer (term2 is a property of the ENCODING cell, so
            # it stays parent-sized — nlist_fine/split rows)
            csrc = (
                self.enc_centroids if self.enc_centroids is not None else self.centroids
            )
            csub = csrc.reshape(csrc.shape[0], self.pq.M, self.pq.dsub)
            self._term2 = znorm[None, :, :] + 2.0 * np.einsum(
                "lmd,mkd->lmk", csub, cb
            )
        return self._term2

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
        pq: ProductQuantizer | None = None,
        opq: bool = False,
        assigned: DataFrame | None = None,
        encode_gemm: bool = False,
        rotation: np.ndarray | None = None,
    ) -> "IVFPQIndex":
        """``pq``: pre-built codebooks skip sampled-k-means training —
        used for seeded deterministic codebooks that a SQL oracle can
        replay (the seed-IVF trick applied to PQ). With ``opq=True`` a
        caller-supplied ``pq`` MUST have been trained on ROTATED
        residuals (pair it with the matching ``rotation=``) — codes are
        rotated-residual encodings (ADVICE r06: an unrotated-trained pq
        here silently degrades code quality).

        ``rotation``: a pre-trained OPQ rotation (d×d orthonormal);
        skips the in-build ``OPQTransform.train`` — the sample-train
        path for big corpora where the full-residual training passes
        are the dominant cost.

        ``opq``: train an OPQ rotation on the RESIDUALS and encode
        rotated residuals (requires by_residual + L2). Assignment is
        rotation-invariant — R(x−c) = Rx − Rc — so the inverted lists
        are identical to the unrotated build; only code quality
        changes. The stored centroids are rotated so every query-side
        term (coarse rank, term1/term2, LUTs) lives in code space.

        ``assigned``: a pre-assigned (id, vec, list_no) frame — e.g. a
        built IVF-Flat index's ``idx.data`` — skips the full-corpus
        nearest-centroid pass (the dominant build flop at 100M:
        ~2·10¹⁶ for nlist=1024·d96) and guarantees the compressed
        lists match the flat index's row for row, the "re-encode an
        existing index's lists" maintenance op. ``centroids`` is
        required and must be the quantizer that produced the
        assignment."""
        spark = base.sparkSession
        if assigned is not None:
            if centroids is None:
                raise ValueError("assigned= requires the matching centroids")
            centroids = np.asarray(centroids, dtype=np.float64)
            if "list_no" not in assigned.columns:
                raise ValueError("assigned= frame must carry a list_no column")
            # cheap misuse guard (ADVICE r05): a quantizer mismatch
            # otherwise produces residuals against the WRONG centroids
            # (silent quality loss) or an IndexError deep in
            # _residual_df, far from the misuse site. One metadata-ish
            # aggregate over the assignment column is negligible next
            # to the encode pass it precedes.
            mx = assigned.agg(F.max("list_no"), F.min("list_no")).first()
            if mx[0] is not None and (mx[0] >= len(centroids) or mx[1] < 0):
                raise ValueError(
                    f"assigned list_no range [{mx[1]}, {mx[0]}] incompatible "
                    f"with nlist={len(centroids)} quantizer"
                )
            assigned = assigned.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("vec"),
                F.col("list_no").cast("int").alias("list_no"),
            )
        else:
            b = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
            if centroids is None:
                centroids, _ = train_kmeans(
                    b, nlist, metric=metric, max_iter=kmeans_iter, seed=seed,
                    spherical=(metric == Metric.IP),
                )
            centroids = np.asarray(centroids, dtype=np.float64)
            assigned = assign_lists(b, centroids, metric)

        if opq:
            if not by_residual or metric != Metric.L2:
                raise ValueError("opq=True requires by_residual L2")
            from auncel_spark.index.transforms import OPQTransform

            res = _residual_df(assigned, centroids)
            if rotation is not None:
                rot = OPQTransform(np.asarray(rotation, dtype=np.float64))
            else:
                rot = OPQTransform.train(res, M=M, vec_col="rvec", seed=seed)
            rotation = rot.A
            res = rot.apply(res, vec_col="rvec")
            if pq is None:
                pq = ProductQuantizer.train(res, M=M, nbits=nbits, vec_col="rvec", seed=seed)
            coded = pq.encode(res, vec_col="rvec", gemm=encode_gemm)
            centroids = centroids @ rotation.T
        else:
            if rotation is not None:
                raise ValueError("rotation= only applies with opq=True")
            # measured guidance (VERDICT r08 Next #6): at d=960 the OPQ
            # rotation is a decisive recall win at the identical
            # operating point (recall@10 0.5006 vs 0.144 plain —
            # evidence/hd_highd_opq_rungs.json); at d=96 it is a tie
            # (evidence/10m_opq_rungs.json). The default stays explicit
            # (faiss posture: OPQ is a factory-spec opt-in) but a plain
            # high-d build now SAYS so instead of silently shipping the
            # measured-worse codes.
            if by_residual and metric == Metric.L2 and centroids.shape[1] >= 256:
                import warnings

                warnings.warn(
                    f"IVFPQ at d={centroids.shape[1]} without OPQ: the"
                    " measured high-d rung (evidence/"
                    "hd_highd_opq_rungs.json, d=960) shows OPQ-rotated"
                    " codes reach ~3.5x the recall of plain PQ at the"
                    " same operating point; consider opq=True or an"
                    " 'OPQ{M},IVF...' factory spec",
                    stacklevel=2,
                )
            # train PQ on (residual) vectors, then encode distributed
            if pq is None:
                if by_residual:
                    train_src = _residual_df(assigned, centroids)
                else:
                    train_src = assigned
                pq = ProductQuantizer.train(train_src, M=M, nbits=nbits, vec_col="vec" if not by_residual else "rvec", seed=seed)
            if by_residual:
                coded = pq.encode(
                    _residual_df(assigned, centroids), vec_col="rvec",
                    gemm=encode_gemm,
                )
            else:
                coded = pq.encode(assigned, gemm=encode_gemm)

        idx = cls(spark, centroids, pq, path, metric, by_residual, rotation=rotation)
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
            if rotation is not None:
                np.save(os.path.join(path, "rotation.npy"), rotation)
        else:
            idx._data_df = coded.cache()
            idx._data_df.count()
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFPQIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        centroids = np.load(os.path.join(path, "centroids.npy"))
        rot_path = os.path.join(path, "rotation.npy")
        rotation = np.load(rot_path) if os.path.exists(rot_path) else None
        enc_path = os.path.join(path, "enc_of.npy")
        enc_of = np.load(enc_path) if os.path.exists(enc_path) else None
        enc_centroids = (
            np.load(os.path.join(path, "enc_centroids.npy"))
            if enc_of is not None
            else None
        )
        return cls(
            spark,
            centroids,
            ProductQuantizer.from_dict(meta["pq"]),
            path,
            Metric(meta["metric"]),
            meta["by_residual"],
            rotation=rotation,
            enc_of=enc_of,
            enc_centroids=enc_centroids,
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
        """strategy="bcast" (default): broadcast-queries ADC scan —
        each M-byte code crosses Arrow once no matter how many queries
        probe its list; term3 LUTs are built lazily in-task, term2
        rides in broadcast (index/scan.py). "join": the per-(query,
        list) probes-join ADC path (kept as the oracle-shape
        reference). ``rebalance``: tasks for the salted skew split of
        hot lists (None = defaultParallelism; 0 disables)."""
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
        if self.rotation is not None:
            qmat = qmat @ self.rotation.T  # into code space (see __init__)
        ranked, _ = self.coarse_rank(qids, qmat, nprobe)
        use_t2 = (
            self.use_precomputed_table
            and self.by_residual
            and self.metric == Metric.L2
        )
        codec = {
            "kind": "pq",
            "books": self.pq.codebooks,
            "cents": (
                (self.enc_centroids if self.enc_centroids is not None else self.centroids)
                if self.by_residual
                else None
            ),
            "term2": self.precomputed_term2() if use_t2 else None,
            "enc_of": self.enc_of,
            # float32 ADC arithmetic (the reference engine's dtype —
            # Faiss computes ADC in float32): ~2x scan throughput.
            # Default False so hash-exact SQL-oracle replays (float64
            # in DuckDB) keep bit-matched boundary ordering; the scale
            # bench enables it via `idx.adc_fp32 = True`.
            "fp32": getattr(self, "adc_fp32", False),
        }
        partial = scan_window_coded(
            self.data, qids, qmat, ranked, 0, nprobe, k, self.metric,
            self.nlist, codec, rebalance=rebalance or None,
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
        use_t2 = (
            self.use_precomputed_table
            and self.by_residual
            and self.metric == Metric.L2
        )
        bc = self.spark.sparkContext.broadcast(
            (
                qids,
                qmat,
                {int(q): i for i, q in enumerate(qids)},
                self.pq.codebooks,
                (
                    (self.enc_centroids if self.enc_centroids is not None else self.centroids)
                    if self.by_residual
                    else None
                ),
                self.precomputed_term2() if use_t2 else None,
                self.enc_of,
            )
        )
        metric = self.metric

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _, bq, qpos, books, cents, t2, benc = bc.value
            kernel = ProductQuantizer(books)
            M, dsub = kernel.M, kernel.dsub
            lut_cache: dict[tuple[int, int], np.ndarray] = {}
            t3_cache: dict[int, np.ndarray] = {}
            for pdf in batches:
                if pdf.empty:
                    continue
                out = []
                for (qid, list_no), grp in pdf.groupby(["qid", "list_no"]):
                    q = bq[qpos[int(qid)]]
                    # encoding-cell row (parent under a split quantizer)
                    list_no = int(benc[int(list_no)]) if benc is not None else list_no
                    if t2 is not None:
                        # precomputed-table path: term3 once per QUERY
                        # (not per probed list), term2 gathered from the
                        # broadcast table, term1 a scalar
                        t3 = t3_cache.get(int(qid))
                        if t3 is None:
                            qsub = q.reshape(M, dsub)
                            t3 = -2.0 * np.einsum("md,mkd->mk", qsub, books)
                            t3_cache[int(qid)] = t3
                        diff = q - cents[int(list_no)]
                        lut = t2[int(list_no)] + t3
                        base_term = float(diff @ diff)
                    else:
                        key = (int(qid), int(list_no) if cents is not None else -1)
                        lut = lut_cache.get(key)
                        if lut is None:
                            # L2: |q−x|² = |(q−c) − r|² → table on (q−c).
                            # IP: ⟨q,x⟩ = ⟨q,c⟩ + ⟨q,r⟩ → table on q
                            # itself, constant ⟨q,c⟩ folded in below.
                            if cents is not None and metric == Metric.L2:
                                qeff = q - cents[int(list_no)]
                            else:
                                qeff = q
                            lut = kernel.lut_np(qeff, metric)
                            lut_cache[key] = lut
                        base_term = 0.0
                    codes = np.array(
                        [np.frombuffer(c, dtype=np.uint8) for c in grp["code"]]
                    )
                    dist = kernel.adc_np(lut, codes) + base_term
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
        strategy: str = "gemm",
    ) -> DataFrame:
        """IVFPQR / IndexRefineFlat (O9): ADC candidates k·k_factor,
        exact re-rank against the uncompressed vectors.

        strategy="gemm" (default): the candidate pair set is
        nq·k·k_factor rows — driver-bounded by construction — so it
        collects once, ships to executors as a CSR (id → probing
        queries) numpy broadcast, and the refine is ONE Arrow-batched
        streamed scan of the base with vectorized exact distances. No
        join, no shuffle of the base, no per-row JVM expression — the
        r04 measurement chain: r03's shuffle join cost ~21 ms/query at
        10M; the broadcast HASH join still cost ~25 (hash build of
        6.4M rows + HOF distance per pair); this path is ~3.

        strategy="join": the relational knn_by_ids path (kept as the
        oracle-shape reference and for unbounded candidate sets)."""
        from auncel_spark.operators.knn import knn_by_ids
        from auncel_spark.index.refine_blob import RefineBlob

        if isinstance(full_base, RefineBlob):
            # id-addressable refine sidecar: positioned reads of the
            # nq·k·k_factor candidate rows only — no streamed pass over
            # the uncompressed corpus per refine call (at 100M the
            # streamed pass was 38 GB of page-cache traffic per 5000-
            # query batch; the sidecar reads ~0.5% of that)
            q = queries.select("qid", "vec")
            qpdf = q.toPandas()
            qids = qpdf["qid"].to_numpy(dtype=np.int64)
            qmat = as_matrix(qpdf["vec"])
            cand = (
                self.search(queries, k * k_factor, nprobe)
                .select("qid", "id")
                .toPandas()
            )
            if len(cand) == 0:
                return self.spark.createDataFrame(
                    [], "qid bigint, pos int, id bigint, dist double"
                )
            qpos = {int(x): i for i, x in enumerate(qids)}
            return full_base.refine_topk(
                self.spark,
                qids,
                qmat,
                cand["qid"].map(qpos).to_numpy(dtype=np.int32),
                cand["id"].to_numpy(dtype=np.int64),
                k,
                self.metric,
            )
        if strategy == "join":
            cand = self.search(queries, k * k_factor, nprobe).select("qid", "id")
            return knn_by_ids(
                queries, full_base, cand, k, self.metric, broadcast_candidates=True
            )
        q = queries.select("qid", "vec")
        qpdf = q.toPandas()
        qids = qpdf["qid"].to_numpy(dtype=np.int64)
        qmat = as_matrix(qpdf["vec"])
        cand = self.search(queries, k * k_factor, nprobe).select("qid", "id").toPandas()
        if len(cand) == 0:
            # empty candidate set (e.g. empty query frame or all-empty
            # probed lists): skip the scan entirely — the kernel below
            # assumes a non-empty broadcast id table
            return self.spark.createDataFrame(
                [], "qid bigint, pos int, id bigint, dist double"
            )
        cid = cand["id"].to_numpy(dtype=np.int64)
        qpos = {int(x): i for i, x in enumerate(qids)}
        cqp = cand["qid"].map(qpos).to_numpy(dtype=np.int32)
        order = np.argsort(cid, kind="stable")
        cid_s, cqp_s = cid[order], cqp[order]
        uids, starts, counts = np.unique(cid_s, return_index=True, return_counts=True)
        bc = self.spark.sparkContext.broadcast(
            (qids, qmat, uids, starts.astype(np.int64), counts.astype(np.int64), cqp_s)
        )
        is_l2 = self.metric == Metric.L2

        import pyarrow as pa

        def refine(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            bqids, bq, buids, bst, bct, bqp = bc.value
            if len(buids) == 0:
                # defense in depth (the driver-side empty-cand early
                # return above should make this unreachable): indexing
                # an empty buids with clipped positions would raise
                return
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                ids = batch.column(0).to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )
                pos = np.searchsorted(buids, ids)
                pos_cl = np.clip(pos, 0, len(buids) - 1)
                hit = buids[pos_cl] == ids
                rows = np.where(hit)[0]
                if len(rows) == 0:
                    continue
                # Arrow-native vector decode, HIT ROWS ONLY: the
                # candidate set is ~0.5% of a 100M base, so gathering
                # before flatten copies ~150x fewer vector bytes than
                # flattening the whole batch (r06: the 100M refine scan
                # spent its non-IO time converting vectors it then
                # dropped)
                vec_hit = batch.column(1).take(pa.array(rows, type=pa.int64()))
                flat = vec_hit.flatten().to_numpy(zero_copy_only=False)
                mat = np.asarray(flat, dtype=np.float64).reshape(len(rows), -1)
                st, ct = bst[pos_cl[rows]], bct[pos_cl[rows]]
                total = int(ct.sum())
                # CSR expansion: candidate positions for every hit row
                seq = np.arange(total) - np.repeat(np.cumsum(ct) - ct, ct)
                cand_pos = np.repeat(st, ct) + seq
                qp = bqp[cand_pos]
                row_rep = np.repeat(np.arange(len(rows)), ct)
                v, qv = mat[row_rep], bq[qp]
                if is_l2:
                    diff = v - qv
                    dist = (diff * diff).sum(axis=1)
                else:
                    dist = -(v * qv).sum(axis=1)
                yield pa.RecordBatch.from_pydict(
                    {
                        "qid": bqids[qp],
                        "id": ids[rows][row_rep],
                        "dist": dist,
                    }
                )

        scored = full_base.select("id", "vec").mapInArrow(
            refine, schema="qid bigint, id bigint, dist double"
        )
        return topk_per_query(scored, k).select("qid", "pos", "id", "dist")


class IVFPQRIndex(IVFPQIndex):
    """IndexIVFPQR (``Auncel/IndexIVFPQ.h:155-200``): a second product
    quantizer encodes the residual-of-residual r₂ = x − c(list) − z₁,
    and re-ranking reconstructs x̂ = c + z₁ + z₂ from CODES ONLY — the
    refine never touches raw vectors (unlike IndexRefineFlat), which is
    what matters when the uncompressed corpus is too big to scan.
    Storage: lists carry (code, rcode); rcode adds refine_M bytes/row
    (the reference defaults refine_M = 2·M)."""

    def __init__(self, *args, refine_pq: ProductQuantizer | None = None, **kw):
        super().__init__(*args, **kw)
        self.refine_pq = refine_pq

    @classmethod
    def build(
        cls,
        base: DataFrame,
        nlist: int = DEFAULT_NLIST,
        M: int = 8,
        refine_M: int | None = None,
        nbits: int = 8,
        metric: Metric = Metric.L2,
        path: str | None = None,
        centroids: np.ndarray | None = None,
        kmeans_iter: int = 25,
        seed: int = 42,
        id_col: str = "id",
        vec_col: str = "vec",
        pq: ProductQuantizer | None = None,
        refine_pq: ProductQuantizer | None = None,
    ) -> "IVFPQRIndex":
        spark = base.sparkSession
        b = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        if centroids is None:
            centroids, _ = train_kmeans(
                b, nlist, metric=metric, max_iter=kmeans_iter, seed=seed,
                spherical=(metric == Metric.IP),
            )
        centroids = np.asarray(centroids, dtype=np.float64)
        refine_M = refine_M or 2 * M
        assigned = _residual_df(assign_lists(b, centroids, metric), centroids)
        if pq is None:
            pq = ProductQuantizer.train(assigned, M=M, nbits=nbits, vec_col="rvec", seed=seed)
        coded = pq.encode(assigned, vec_col="rvec")
        # r2 = rvec − decode(code): the second-level residual
        r2 = _residual2_df(coded, pq)
        rpq = refine_pq or ProductQuantizer.train(r2, M=refine_M, nbits=nbits, vec_col="r2", seed=seed + 1)
        full = rpq.encode(r2, vec_col="r2", code_col="rcode").select(
            "id", "code", "rcode", "list_no"
        )
        idx = cls(
            spark, centroids, pq, path, metric, True, refine_pq=rpq
        )
        if path is not None:
            import json as _json

            (
                full.repartition("list_no")
                .write.mode("overwrite")
                .partitionBy("list_no")
                .parquet(os.path.join(path, "lists"))
            )
            with open(os.path.join(path, "meta.json"), "w") as f:
                _json.dump(
                    {
                        "kind": "ivfpqr",
                        "nlist": idx.nlist,
                        "d": idx.d,
                        "metric": metric.value,
                        "by_residual": True,
                        "pq": pq.to_dict(),
                        "refine_pq": rpq.to_dict(),
                    },
                    f,
                )
            np.save(os.path.join(path, "centroids.npy"), centroids)
        else:
            idx._data_df = full.cache()
            idx._data_df.count()
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFPQRIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        centroids = np.load(os.path.join(path, "centroids.npy"))
        return cls(
            spark,
            centroids,
            ProductQuantizer.from_dict(meta["pq"]),
            path,
            Metric(meta["metric"]),
            True,
            refine_pq=ProductQuantizer.from_dict(meta["refine_pq"]),
        )

    def search(self, queries, k, nprobe, qid_col="qid", vec_col="vec", strategy="join", k_factor: int = 4):
        """ADC over the first-level codes for k·k_factor candidates,
        then codes-only re-rank through the second-level residual
        (IndexIVFPQR::search_preassigned two-pass shape)."""
        cand = super().search(queries, k * k_factor, nprobe, qid_col, vec_col)
        return self.refine_by_codes(
            queries.select(F.col(qid_col).alias("qid"), F.col(vec_col).alias("vec")),
            cand.select("qid", "id"),
            k,
        )

    def refine_by_codes(self, queries: DataFrame, cand: DataFrame, k: int) -> DataFrame:
        """Exact-in-reconstruction distances |q − (c + z₁ + z₂)|² for
        the candidate pairs; no raw vectors are read."""
        from auncel_spark.operators.topk import topk_per_query

        qpdf = queries.toPandas()
        qids = qpdf["qid"].to_numpy(dtype=np.int64)
        qmat = as_matrix(qpdf["vec"])
        rows = self.data.join(F.broadcast(cand), "id").select(
            "qid", "id", "code", "rcode", "list_no"
        )
        bc = self.spark.sparkContext.broadcast(
            (
                qids,
                qmat,
                {int(q): i for i, q in enumerate(qids)},
                self.pq.codebooks,
                self.refine_pq.codebooks,
                self.centroids,
            )
        )
        is_l2 = self.metric == Metric.L2

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            _, bq, qpos, books1, books2, cents = bc.value
            k1 = ProductQuantizer(books1)
            k2 = ProductQuantizer(books2)
            for pdf in batches:
                if pdf.empty:
                    continue
                c1 = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]])
                c2 = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf["rcode"]])
                xhat = (
                    cents[pdf["list_no"].to_numpy()]
                    + k1.decode_np(c1)
                    + k2.decode_np(c2)
                )
                ids = pdf["id"].to_numpy(dtype=np.int64)
                out_q, out_i, out_d = [], [], []
                for qid, idxs in pdf.groupby("qid").indices.items():
                    qv = bq[qpos[int(qid)]]
                    sub = xhat[idxs]
                    if is_l2:
                        diff = sub - qv[None, :]
                        dist = (diff * diff).sum(axis=1)
                    else:
                        dist = -(sub @ qv)
                    out_q.append(np.full(len(idxs), qid, dtype=np.int64))
                    out_i.append(ids[idxs])
                    out_d.append(dist)
                yield pd.DataFrame(
                    {
                        "qid": np.concatenate(out_q),
                        "id": np.concatenate(out_i),
                        "dist": np.concatenate(out_d),
                    }
                )

        scored = rows.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
        return topk_per_query(scored, k).select("qid", "pos", "id", "dist")


def _residual2_df(coded: DataFrame, pq: ProductQuantizer) -> DataFrame:
    """r2 = rvec − decode(code), Arrow-batched."""
    from pyspark.sql import types as T

    spark = coded.sparkSession
    bc = spark.sparkContext.broadcast(pq.codebooks)
    schema = T.StructType(
        list(coded.schema.fields) + [T.StructField("r2", T.ArrayType(T.FloatType()))]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = ProductQuantizer(bc.value)
        for pdf in batches:
            if pdf.empty:
                continue
            rv = as_matrix(pdf["rvec"])
            codes = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]])
            r2 = rv - kernel.decode_np(codes)
            yield pdf.assign(r2=list(r2.astype(np.float32)))

    return coded.mapInPandas(work, schema=schema)


def split_ivfpq_lists(
    flat_idx: IVFIndex,
    pq_idx: IVFPQIndex,
    split: int,
    path: str,
    sample_per_list: int = 256,
    kmeans_iter: int = 8,
    seed: int = 7,
    write_partitions: int = 256,
) -> IVFPQIndex:
    """Refine the coarse quantizer nlist → nlist·split WITHOUT touching
    a single code byte: per-parent sub-centroids are trained on a
    sampled slice of the flat lists, every row is re-routed to its
    nearest CHILD of its own parent (a ``split``-way argmin — ~10⁴×
    cheaper than the full n·nlist·d re-assignment GEMM), and the
    existing PQ codes are re-partitioned by the refined list id. Codes
    remain residual-encoded against the PARENT centroid, so ADC math is
    unchanged (``enc_of`` maps fine → parent; term2 stays parent-sized)
    and the refined index's codes are byte-identical to the input's.

    Why: posting lists must scale with the corpus. The reference's
    distributed answer is one IVF1024 PER 10M-row shard
    (``Auncel/dist/worker.cpp:83``) — lists ∝ n. A single index whose
    nlist is pinned while n grows 10× scans 10× more rows per probe
    (r06 measured 100M/nlist=1024: ~1.6M coded rows/query at
    nprobe=16). Splitting each list 4–16× restores nlist ~ √n without
    re-encoding, re-training the PQ, or rebuilding the 37 GB flat
    index: probe fraction drops ~split× at matched recall targets.

    ``pq_idx`` must be a residual, non-rotated IVFPQ built on
    ``flat_idx``'s assignment (the standard ``build(assigned=)`` path).
    """
    if pq_idx.rotation is not None or not pq_idx.by_residual:
        raise ValueError("split_ivfpq_lists requires a residual, non-OPQ IVFPQ")
    if pq_idx.enc_of is not None:
        raise ValueError("index is already split — split from the parent index")
    if not np.array_equal(
        np.asarray(flat_idx.centroids, dtype=np.float64),
        np.asarray(pq_idx.centroids, dtype=np.float64),
    ):
        raise ValueError("flat and PQ quantizers differ — codes would not match")
    spark = flat_idx.spark
    nlist, d = flat_idx.nlist, flat_idx.d
    parents = np.asarray(flat_idx.centroids, dtype=np.float64)

    # 1) per-parent sub-centroids from one sampled pass over the flat
    #    lists (the quantizer-train slice, Clustering.cpp practice)
    n = flat_idx.data.count()
    frac = min(1.0, 1.5 * sample_per_list * nlist / max(1, n))
    samp = (
        flat_idx.data.select("vec", "list_no")
        .sample(fraction=frac, seed=seed)
        .toPandas()
    )
    children = np.empty((nlist, split, d))
    from auncel_spark.index.pq import _lloyd_np

    lns = samp["list_no"].to_numpy()
    for p in range(nlist):
        rows = np.where(lns == p)[0]
        if len(rows) >= split:
            x = as_matrix(samp["vec"].iloc[rows])
            children[p] = _lloyd_np(x, split, kmeans_iter, seed + p)
        else:
            # empty/thin parent: children collapse onto the parent cell
            # (deterministic jitter keeps argmin well-defined)
            rng = np.random.default_rng(seed + p)
            children[p] = parents[p][None, :] + rng.normal(0, 1e-6, (split, d))

    # 2) route every row to its nearest child WITHIN its parent (one
    #    light pass over the flat lists: the per-row work is a
    #    split-way argmin, and the emitted frame is (id, rlist) — the
    #    same ~12 bytes/row exchange shape as ensure_index_big)
    bc = spark.sparkContext.broadcast(children)

    def route(batches):
        ch = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            lns_b = pdf["list_no"].to_numpy()
            mat = as_matrix(pdf["vec"])
            rl = np.empty(len(ids), dtype=np.int32)
            for ln in np.unique(lns_b):
                m = lns_b == ln
                c = ch[int(ln)]
                dd = (c * c).sum(axis=1)[None, :] - 2.0 * (mat[m] @ c.T)
                rl[m] = int(ln) * split + dd.argmin(axis=1).astype(np.int32)
            yield pd.DataFrame({"id": ids, "rlist": rl})

    routed = flat_idx.data.select("id", "vec", "list_no").mapInPandas(
        route, "id bigint, rlist int"
    )
    # 3) re-key the code table by the refined list id (codes unchanged)
    coded = (
        pq_idx.data.select("id", "code")
        .join(routed, "id")
        .select("id", "code", F.col("rlist").alias("list_no"))
    )
    (
        coded.repartition(write_partitions, "list_no")
        .sortWithinPartitions("list_no")
        .write.mode("overwrite")
        .partitionBy("list_no")
        .parquet(os.path.join(path, "lists"))
    )
    child_flat = children.reshape(nlist * split, d)
    enc_of = np.repeat(np.arange(nlist, dtype=np.int32), split)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "kind": "ivfpq",
                "nlist": nlist * split,
                "d": d,
                "metric": pq_idx.metric.value,
                "by_residual": True,
                "split": split,
                "parent_nlist": nlist,
                "pq": pq_idx.pq.to_dict(),
            },
            f,
        )
    np.save(os.path.join(path, "centroids.npy"), child_flat)
    np.save(os.path.join(path, "enc_of.npy"), enc_of)
    np.save(os.path.join(path, "enc_centroids.npy"), parents)
    return IVFPQIndex.load(spark, path)


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
            mat = as_matrix(pdf["vec"])
            res = mat - cents[pdf["list_no"].to_numpy()]
            yield pdf.assign(rvec=list(res.astype(np.float32)))

    return assigned.mapInPandas(work, schema=schema)
