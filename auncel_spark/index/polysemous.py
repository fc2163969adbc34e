"""Polysemous PQ search: Hamming pre-filter before ADC.

Reference (SURVEY.md §2.2 B12, §2.3 O11):
- ``IndexPQ::search`` modes (``Auncel/IndexPQ.h:74-91``): ST_PQ (plain
  ADC), ST_HE (Hamming filter on codes at threshold ``polysemous_ht``,
  then ADC on survivors), ST_SDC (symmetric table distance).
- ``PolysemousTraining`` (``Auncel/PolysemousTraining.h:121``, .cpp
  ~950 LoC): simulated-annealing permutation of PQ centroid indices so
  that code Hamming distance correlates with true distance — making
  the cheap filter meaningful.

Spark shape: the filter is a popcount column predicate evaluated
before the (more expensive) ADC gather — Catalyst's
filter-before-expensive-projection, expressed inside one Arrow kernel.
Annealing runs driver-side (the codebook permutation is M×256 ints;
the reference trains on a sample too).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from auncel_spark.config import Metric
from auncel_spark.index.binary import _POP
from auncel_spark.index.pq import ProductQuantizer
from auncel_spark.operators.topk import topk_per_query


def _anneal_reproduce(
    cdist: np.ndarray,
    nbits: int,
    n_iter: int,
    rng: np.random.Generator,
    init_temperature: float = 0.7,
    temperature_decay: float = 0.9 ** (1.0 / 500.0),
) -> np.ndarray:
    """Exact ``ReproduceWithHammingObjective`` annealing
    (``Auncel/PolysemousTraining.cpp:180-290``, optimizer :117-155):

    - target td[i,j] = (d_ij − mean)/std · sqrt(nbits/4) + nbits/2 —
      centroid distances affine-mapped onto the theoretical Hamming
      moments of random nbits codes;
    - weights w[i,j] = exp(−log 2 · td[i,j]) (``dis_weight_factor =
      log(2)``, PolysemousTraining.cpp:759) — reproducing SMALL
      distances matters most, they drive the filter;
    - cost = Σ w·(td − popcount(perm_i ⊕ perm_j))², minimized by
      random-swap annealing with the reference's acceptance rule
      (delta < 0 or rand < temperature) and schedule (T₀=0.7, decay
      0.9^(1/500)).

    The swap delta is computed on the affected rows/columns only — the
    reference's O(n) ``cost_update`` — with the Hamming and cost
    matrices cached, so each iteration is a handful of length-n vector
    ops instead of an n² recompute."""
    n = cdist.shape[0]
    std = cdist.std()
    td = (cdist - cdist.mean()) / (std if std > 0 else 1.0) * np.sqrt(
        nbits / 4.0
    ) + nbits / 2.0
    w = np.exp(-np.log(2.0) * td)
    perm = np.arange(n)
    pop = _POP[(perm[:, None] ^ perm[None, :]) & 0xFF]
    C = w * (td - pop) ** 2
    T = init_temperature
    for _ in range(n_iter):
        T *= temperature_decay
        i = int(rng.integers(0, n))
        j = int(rng.integers(0, n - 1))
        if j == i:
            j += 1
        pi, pj = perm[i], perm[j]
        rowi = _POP[(pj ^ perm) & 0xFF]
        rowj = _POP[(pi ^ perm) & 0xFF]
        rowi[i], rowi[j] = 0, _POP[(pj ^ pi) & 0xFF]
        rowj[j], rowj[i] = 0, _POP[(pi ^ pj) & 0xFF]
        newCi = w[i] * (td[i] - rowi) ** 2
        newCj = w[j] * (td[j] - rowj) ** 2
        # symmetry (XOR, td, w all symmetric) ⇒ columns = rows
        s_old = (
            C[i].sum() + C[j].sum() + C[:, i].sum() + C[:, j].sum()
            - (C[i, i] + C[i, j] + C[j, i] + C[j, j])
        )
        s_new = (
            2.0 * (newCi.sum() + newCj.sum())
            - (newCi[i] + newCi[j] + newCj[i] + newCj[j])
        )
        delta = s_new - s_old
        if delta < 0 or rng.random() < T:
            perm[i], perm[j] = pj, pi
            C[i], C[j] = newCi, newCj
            C[:, i], C[:, j] = newCi, newCj
    return perm


def polysemous_permutation(
    pq: ProductQuantizer,
    n_iter: int = 50_000,
    seed: int = 42,
    objective: str = "reproduce",
) -> np.ndarray:
    """Simulated-annealing permutation per subspace so that code
    Hamming distance tracks true centroid distance. Returns (M, ksub)
    int permutations mapping old code → new code.

    objective="reproduce" (default): the reference's exact
    ``ReproduceWithHammingObjective`` (affine-mapped distance targets,
    exp-decay weights — see ``_anneal_reproduce``).
    objective="corr": the r01 correlation proxy (kept for comparison;
    cheaper per iteration at small n_iter but weaker filters)."""
    rng = np.random.default_rng(seed)
    perms = np.empty((pq.M, pq.ksub), dtype=np.int64)
    nbits = max(1, int(np.log2(pq.ksub)))
    for m in range(pq.M):
        cb = pq.codebooks[m]
        cdist = ((cb[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        if objective == "reproduce":
            perms[m] = _anneal_reproduce(cdist, nbits, n_iter, rng)
            continue
        perm = np.arange(pq.ksub)

        def cost(p):
            codes = p[:, None] ^ p[None, :]
            ham = _POP[codes & 0xFF]  # ksub ≤ 256 → one byte
            # correlation proxy: Hamming should grow with distance
            return -np.corrcoef(ham.ravel(), cdist.ravel())[0, 1]

        cur = cost(perm)
        T = 1.0
        for it in range(n_iter):
            i, j = rng.integers(0, pq.ksub, 2)
            if i == j:
                continue
            perm[i], perm[j] = perm[j], perm[i]
            new = cost(perm)
            if new < cur or rng.random() < np.exp(-(new - cur) / max(T, 1e-9)):
                cur = new
            else:
                perm[i], perm[j] = perm[j], perm[i]
            T *= 0.999
        perms[m] = perm
    return perms


def remap_codes(df: DataFrame, perms: np.ndarray, code_col: str = "code") -> DataFrame:
    """Apply the polysemous permutation to stored codes."""
    from pyspark.sql import types as T

    bc = df.sparkSession.sparkContext.broadcast(perms)
    schema = df.schema

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            codes = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf[code_col]])
            out = np.empty_like(codes)
            for m in range(P.shape[0]):
                out[:, m] = P[m][codes[:, m]]
            yield pdf.assign(**{code_col: [bytes(c) for c in out]})

    return df.mapInPandas(work, schema=schema)


def polysemous_knn(
    queries: DataFrame,
    coded_base: DataFrame,
    pq: ProductQuantizer,
    k: int,
    ht: int,
    metric: Metric = Metric.L2,
    perms: np.ndarray | None = None,
) -> DataFrame:
    """ST_polysemous: filter candidates whose code Hamming distance to
    the query's code is < ht, ADC only on survivors; candidates the
    filter starves below k fall back to full ADC for that query
    (matching the reference's behavior of returning k results)."""
    spark = queries.sparkSession
    qrows = queries.select("qid", "vec").collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["vec"] for r in qrows], dtype=np.float64)
    qcodes = pq.encode_np(qmat)
    if perms is not None:
        for m in range(pq.M):
            qcodes[:, m] = perms[m][qcodes[:, m]]
    bc = spark.sparkContext.broadcast((qids, qmat, qcodes, pq.codebooks))
    b = coded_base.select("id", "code")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gqids, gq, gqc, books = bc.value
        kernel = ProductQuantizer(books)
        luts = np.stack([kernel.lut_np(q, metric) for q in gq])
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]])
            ham = _POP[gqc[:, None, :] ^ codes[None, :, :]].sum(axis=2)  # (nq, n)
            out = []
            for qi in range(len(gqids)):
                mask = ham[qi] < ht
                if mask.sum() < k:  # filter too aggressive → full ADC
                    mask = np.ones(len(ids), dtype=bool)
                sub = codes[mask]
                gathered = luts[qi][np.arange(kernel.M)[None, :], sub]
                dist = gathered.sum(axis=1)
                sids = ids[mask]
                kk = min(k, len(dist))
                sel = np.lexsort((sids, dist))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(kk, gqids[qi], dtype=np.int64),
                            "id": sids[sel],
                            "dist": dist[sel],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = b.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
    return topk_per_query(partial, k).select("qid", "pos", "id", "dist")


def sdc_knn(
    queries: DataFrame,
    coded_base: DataFrame,
    pq: ProductQuantizer,
    k: int,
) -> DataFrame:
    """ST_SDC: symmetric distance — the query is PQ-encoded too and
    distances come from precomputed centroid-to-centroid tables
    (cheaper queries, coarser distances)."""
    spark = queries.sparkSession
    qrows = queries.select("qid", "vec").collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qmat = np.array([r["vec"] for r in qrows], dtype=np.float64)
    qcodes = pq.encode_np(qmat)
    # (M, ksub, ksub) symmetric tables
    sdc = np.stack(
        [
            ((pq.codebooks[m][:, None, :] - pq.codebooks[m][None, :, :]) ** 2).sum(-1)
            for m in range(pq.M)
        ]
    )
    bc = spark.sparkContext.broadcast((qids, qcodes, sdc))
    b = coded_base.select("id", "code")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gqids, gqc, tables = bc.value
        M = tables.shape[0]
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            codes = np.array([np.frombuffer(c, dtype=np.uint8) for c in pdf["code"]])
            dist = np.zeros((len(gqids), len(ids)))
            for m in range(M):
                dist += tables[m][gqc[:, m][:, None], codes[:, m][None, :]]
            kk = min(k, dist.shape[1])
            part = np.lexsort((np.broadcast_to(ids, dist.shape), dist), axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(gqids, kk),
                    "id": ids[part].ravel(),
                    "dist": np.take_along_axis(dist, part, axis=1).ravel(),
                }
            )

    partial = b.mapInPandas(scan, schema="qid bigint, id bigint, dist double")
    return topk_per_query(partial, k).select("qid", "pos", "id", "dist")
