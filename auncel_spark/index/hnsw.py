"""HNSW — driver-side small-index helper.

Reference (SURVEY.md §2.3 O12, §2.2 B13): ``HNSW.{h,cpp}`` /
``IndexHNSW`` (~2258 LoC): multi-layer greedy graph search. SURVEY
§7.3 design decision: sequential, lock-heavy graph construction and
pointer-chasing search do NOT fit DataFrame execution; the bounded-ANN
capability is covered by the IVF path. This module keeps API parity
for users who ask for "HNSW32": an in-memory numpy implementation for
small corpora (the regime where HNSW beats IVF anyway), with the same
(qid, pos, id, dist) result contract.

Scale posture: ``build`` collects vectors to the driver and refuses
above ``max_rows`` — at 100 TB use IVF/IVFPQ; a distributed HNSW would
need a different system (disk-ANN-style), out of scope as in the
reference itself (its dist/ mode shards IVF, not HNSW).
"""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import DataFrame


class HNSWIndex:
    def __init__(self, M: int = 16, ef_construction: int = 64, seed: int = 42, max_rows: int = 200_000):
        self.M = M
        self.ef_construction = ef_construction
        self.seed = seed
        self.max_rows = max_rows
        self.levels: list[dict[int, list[int]]] = []  # per-level adjacency
        self.node_level: np.ndarray | None = None
        self.entry: int = -1
        self.x: np.ndarray | None = None
        self.ids: np.ndarray | None = None

    # --- construction (sequential insert, greedy descent) -------------

    def build(self, base: DataFrame, id_col: str = "id", vec_col: str = "vec") -> "HNSWIndex":
        n = base.count()
        if n > self.max_rows:
            raise ValueError(
                f"HNSW helper is driver-side; {n} rows > max_rows={self.max_rows}. "
                "Use IVFIndex/IVFPQIndex for large corpora."
            )
        rows = base.select(id_col, vec_col).collect()
        rows.sort(key=lambda r: r[id_col])
        self.ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        self.x = np.array([r[vec_col] for r in rows], dtype=np.float64)
        rng = np.random.default_rng(self.seed)
        ml = 1.0 / np.log(max(self.M, 2))
        self.node_level = np.floor(-np.log(rng.random(len(rows))) * ml).astype(int)
        max_level = int(self.node_level.max())
        self.levels = [dict() for _ in range(max_level + 1)]
        self.entry = -1
        for i in range(len(rows)):
            self._insert(i)
        return self

    def _dist(self, i: int, v: np.ndarray) -> float:
        d = self.x[i] - v
        return float(d @ d)

    def _search_layer(self, v: np.ndarray, entry: int, ef: int, level: int) -> list[tuple[float, int]]:
        visited = {entry}
        cand = [(self._dist(entry, v), entry)]
        best = list(cand)
        heapq.heapify(cand)
        while cand:
            dc, c = heapq.heappop(cand)
            worst = max(best)[0]
            if dc > worst and len(best) >= ef:
                break
            for nb in self.levels[level].get(c, []):
                if nb in visited:
                    continue
                visited.add(nb)
                dn = self._dist(nb, v)
                if len(best) < ef or dn < max(best)[0]:
                    heapq.heappush(cand, (dn, nb))
                    best.append((dn, nb))
                    best.sort()
                    if len(best) > ef:
                        best.pop()
        return best

    def _insert(self, i: int) -> None:
        lvl = int(self.node_level[i])
        if self.entry < 0:
            self.entry = i
            for l in range(lvl + 1):
                self.levels[l][i] = []
            return
        v = self.x[i]
        cur = self.entry
        top = int(self.node_level[self.entry])
        for l in range(top, lvl, -1):
            improved = True
            while improved:
                improved = False
                for nb in self.levels[l].get(cur, []):
                    if self._dist(nb, v) < self._dist(cur, v):
                        cur = nb
                        improved = True
        for l in range(min(lvl, top), -1, -1):
            cands = self._search_layer(v, cur, self.ef_construction, l)
            sel = [c for _, c in sorted(cands)[: self.M]]
            self.levels[l][i] = sel
            for s in sel:
                lst = self.levels[l].setdefault(s, [])
                lst.append(i)
                if len(lst) > self.M * 2:  # shrink, keep closest
                    lst.sort(key=lambda j: self._dist(j, self.x[s]))
                    del lst[self.M * 2 :]
            cur = sel[0] if sel else cur
        if lvl > top:
            self.entry = i

    # --- search --------------------------------------------------------

    def search(self, queries: DataFrame, k: int, ef_search: int = 64) -> DataFrame:
        spark = queries.sparkSession
        qrows = queries.select("qid", "vec").collect()
        out = []
        for r in qrows:
            v = np.asarray(r["vec"], dtype=np.float64)
            cur = self.entry
            for l in range(int(self.node_level[self.entry]), 0, -1):
                improved = True
                while improved:
                    improved = False
                    for nb in self.levels[l].get(cur, []):
                        if self._dist(nb, v) < self._dist(cur, v):
                            cur = nb
                            improved = True
            best = self._search_layer(v, cur, max(ef_search, k), 0)
            best.sort(key=lambda t: (t[0], self.ids[t[1]]))
            for pos, (d, i) in enumerate(best[:k]):
                out.append((int(r["qid"]), pos, int(self.ids[i]), float(d)))
        return spark.createDataFrame(out, "qid bigint, pos int, id bigint, dist double")
