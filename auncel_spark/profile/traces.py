"""phi→U traces: the trained error-profile maps.

Reference (SURVEY.md §2.2 B15-B16): one ``Trace`` per probe stage
(nprobe = 2^i), holding (phi = sum-of-angles, U = k-scaling) pairs.

- k-scaling (``kscaling``, IVF_pro.cpp:72-82): for the candidate at
  rank r (0-based) with distance kdis, find kdis in the query's true
  top-max_topk distance list (tolerance 1e-5 rel or abs); if it is the
  true g-th (0-based), U = (g+1)/(r+1) — "the true rank is U× the
  observed rank". Candidates outside the true top-max_topk stop the
  collection for that query.

- Sort-and-batch (``Trace::SB``, IVF_pro.cpp:109-149): sort pairs
  descending by phi, average in batches of bs=250 (running mean — we
  use float64, SURVEY §4), record per-batch std of U, store ascending.

- Lookup (``Trace::search``, IVF_pro.cpp:84-107): step function over
  batch means with a +std_m·std risk margin; below the first phi →
  first value; above the last phi → last value amplified by
  phi/phi_last; else the value of the last batch with mean phi ≤ phi.

Each trace is ≤ (nq·max_topk/4)/bs entries — a few KB; the full set is
broadcast to executors for online prediction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from auncel_spark.config import TRACE_BATCH_SIZE


def kscaling_batch(
    cand: np.ndarray, gt: np.ndarray, max_collect: int, block: int = 512
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All queries' trace points in one shot — the batched form of
    ``kscaling`` (identical per-row semantics: collect ranks 0..r while
    each candidate distance appears in the true list, stop at the first
    miss, cap at max_collect).

    cand, gt: (nq, K) sorted distance matrices. Returns flat
    (rows, ranks, U) arrays ordered query-major then rank-ascending —
    the same pair order the per-query loop produced. Blocked over
    queries so the (b, K, K) closeness tensor stays ~40 MB."""
    nq, K = cand.shape
    g = np.empty((nq, K), dtype=np.int64)
    valid = np.empty((nq, K), dtype=bool)
    for s0 in range(0, nq, block):
        sl = slice(s0, min(s0 + block, nq))
        c = cand[sl][:, :, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            close = np.abs(gt[sl][:, None, :] - c)
            denom = np.where(c != 0, np.abs(c), 1.0)
            m = (close / denom < 1e-5) | (close < 1e-5)
        valid[sl] = m.any(axis=2)
        g[sl] = m.argmax(axis=2)
    stop = np.where(valid.all(axis=1), K, np.argmin(valid, axis=1))
    take = np.minimum(stop, max_collect)
    total = int(take.sum())
    rows = np.repeat(np.arange(nq), take)
    offs = np.concatenate([[0], np.cumsum(take)[:-1]])
    ranks = np.arange(total) - np.repeat(offs, take)
    u = (g[rows, ranks] + 1.0) / (ranks + 1.0)
    return rows, ranks, u


def kscaling(
    cand_dists: np.ndarray, gt_dists: np.ndarray, max_collect: int
) -> list[tuple[int, float]]:
    """Per-query trace-point extraction. cand_dists: sorted candidate
    distances at this stage (ascending, length max_topk); gt_dists: true
    sorted distances. Returns [(rank, U)] for the first ranks whose
    distance appears in gt (reference collects at most max_topk/4)."""
    out: list[tuple[int, float]] = []
    for r, kd in enumerate(cand_dists):
        denom = abs(kd) if kd != 0 else 1.0
        close = np.abs(gt_dists - kd)
        hit = np.where((close / denom < 1e-5) | (close < 1e-5))[0]
        if len(hit) == 0:
            break
        out.append((r, float(hit[0] + 1) / float(r + 1)))
        if len(out) >= max_collect:
            break
    return out


@dataclass
class Trace:
    """Compact monotone phi→U map for one probe stage."""

    nprobe: int
    phi: np.ndarray = field(default_factory=lambda: np.array([]))
    u: np.ndarray = field(default_factory=lambda: np.array([]))
    std: np.ndarray = field(default_factory=lambda: np.array([]))

    @classmethod
    def from_pairs(
        cls, nprobe: int, phi: np.ndarray, u: np.ndarray, bs: int = TRACE_BATCH_SIZE
    ) -> "Trace":
        """Sort-and-batch (SB)."""
        phi = np.asarray(phi, dtype=np.float64)
        u = np.asarray(u, dtype=np.float64)
        keep = ~((phi < 0) & (u < 0))
        phi, u = phi[keep], u[keep]
        if len(phi) == 0:
            return cls(nprobe)
        order = np.argsort(-phi, kind="stable")  # descending, as SB sorts
        phi, u = phi[order], u[order]
        n = len(phi)
        nb = (n + bs - 1) // bs
        mphi = np.empty(nb)
        mu = np.empty(nb)
        stds = np.empty(nb)
        for i in range(nb):
            lo, hi = i * bs, min((i + 1) * bs, n)
            mphi[i] = phi[lo:hi].mean()
            mu[i] = u[lo:hi].mean()
            # reference divides by bs (not batch size) — keep identical
            stds[i] = np.sqrt(((u[lo:hi] - mu[i]) ** 2).sum() / bs)
        # ascending phi
        return cls(nprobe, mphi[::-1].copy(), mu[::-1].copy(), stds[::-1].copy())

    def search(self, phi: np.ndarray, std_m: float) -> np.ndarray:
        """Vectorized U(phi) lookup with risk margin (Trace::search)."""
        phi = np.atleast_1d(np.asarray(phi, dtype=np.float64))
        if len(self.phi) == 0:
            return np.ones_like(phi)
        padded = self.u + std_m * self.std
        idx = np.searchsorted(self.phi, phi, side="right") - 1
        below = idx < 0
        above = phi >= self.phi[-1]
        idx = np.clip(idx, 0, len(self.phi) - 1)
        out = padded[idx]
        out = np.where(below, padded[0], out)
        ampli = phi / self.phi[-1] if self.phi[-1] != 0 else np.ones_like(phi)
        out = np.where(above, padded[-1] * ampli, out)
        return out

    def to_dict(self) -> dict:
        return {
            "nprobe": self.nprobe,
            "phi": self.phi.tolist(),
            "u": self.u.tolist(),
            "std": self.std.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Trace":
        return cls(
            d["nprobe"],
            np.array(d["phi"]),
            np.array(d["u"]),
            np.array(d["std"]),
        )
