"""Voronoi-boundary geometry for the error-profile system.

Reference (SURVEY.md §2.3 O25): ``error_pro::set_online`` and
``cosine_theorem`` (``Auncel/IVF_pro.cpp:196-238, 41-51``).

Per query, after coarse ranking of the centroids:
- ``cen_to_cen[j]`` = distance between the query's nearest centroid and
  the (j+2)-th ranked centroid, looked up in the precomputed
  inter-centroid matrix (B3).
- ``dist_to_boundary[j]`` = distance from the query to the Voronoi
  boundary between its home cell and ranked centroid j+2, via the
  cosine-theorem form  c/2 − (a² + c² − b²)/(2c)  with
  a = coarse_dist(rank 0), b = coarse_dist(rank j+1), c = cen_to_cen[j].
  All quantities are the reference's native units: squared L2 for the
  L2 metric; for IP, a and b first pass through arccos of the (unit
  normalized) dot product, exactly as ``set_online`` does with its
  arccos LUT (we use numpy's acos — SURVEY §4 drops the LUT).

phi (the "sum of angles", O26 ``sum_angle``, IVF_pro.cpp:162-177):
given a candidate distance kdis and a probe stage s, sum
acos(dist_to_boundary[i]/kdis) over the 15 boundaries starting at
index s−1, counting only boundaries with dist_to_boundary[i] < kdis.
"""

from __future__ import annotations

import numpy as np

from auncel_spark.config import Metric

N_ANGLE_BOUNDARIES = 15  # the reference's fixed window (IndexIVF.cpp:553)
EXTRA_BOUNDARIES = 20  # "amplify 20 if you collect more angles" (IVF_pro.cpp:203)


def max_boundaries(nlist: int) -> int:
    """The reference sizes its boundary arrays nlist/8 + 20
    (IVF_pro.cpp:203); guard small-nlist configs."""
    return int(min(nlist // 8 + EXTRA_BOUNDARIES, nlist - 1))


def boundary_distances(
    coarse_dist: np.ndarray,
    coarse_ids: np.ndarray,
    interdis: np.ndarray,
    metric: Metric,
) -> np.ndarray:
    """Vectorized over queries.

    coarse_dist: (nq, >=m+1) ranked coarse distances (engine convention:
        L2 → squared L2; IP → negative dot). coarse_ids likewise.
    interdis: (nlist, nlist) symmetric inter-centroid matrix from
        ``inter_centroid_matrix`` (L2: plain L2 of centroids — note the
        reference stores *squared* L2 there, see below; IP: angles).
    Returns (nq, m) dist-to-boundary.

    Unit note: the reference's ``fvec_inter_vecs`` stores squared L2
    between centroids while coarse distances are squared L2 too; the
    cosine-theorem inputs are therefore all in squared-distance space.
    We reproduce that faithfully (the profile is a learned monotone
    heuristic — what matters is using the *same* feature offline and
    online).
    """
    nlist = interdis.shape[0]
    m = max_boundaries(nlist)
    nq = coarse_dist.shape[0]
    avail = min(m + 1, coarse_dist.shape[1]) - 1

    home = coarse_ids[:, 0].astype(np.int64)
    others = coarse_ids[:, 1 : avail + 1].astype(np.int64)

    if metric == Metric.L2:
        a = coarse_dist[:, [0]]
        b = coarse_dist[:, 1 : avail + 1]
        # squared centroid-to-centroid distance, as fvec_inter_vecs stores
        c = interdis[home[:, None], others] ** 2
    else:
        # engine IP dist = -dot; reference feeds acos(dot) for a, b and
        # the raw centroid dot for c (fvec_inter_vecs_IP). interdis for
        # IP already holds acos(cdot); recover cos to match reference c.
        a = np.arccos(np.clip(-coarse_dist[:, [0]], -1.0, 1.0))
        b = np.arccos(np.clip(-coarse_dist[:, 1 : avail + 1], -1.0, 1.0))
        c = np.cos(interdis[home[:, None], others])

    with np.errstate(divide="ignore", invalid="ignore"):
        dtb = c / 2.0 - (a * a + c * c - b * b) / (2.0 * c)
    dtb = np.where(np.isfinite(dtb), dtb, np.inf)
    if avail < m:
        pad = np.full((nq, m - avail), np.inf)
        dtb = np.concatenate([dtb, pad], axis=1)
    return dtb


def sum_angle(
    kdis: np.ndarray, dist_to_boundary: np.ndarray, start: int
) -> np.ndarray:
    """phi = Σ acos(dtb_i / kdis) over boundaries [start, start+15)
    with dtb_i < kdis (``sum_angle``, IVF_pro.cpp:162-177).

    kdis: (nq,) or (nq, r) candidate distances (squared L2, or acos'd
        similarity for IP). dist_to_boundary: (nq, m).
    Returns phi with kdis's shape.
    """
    dtb = dist_to_boundary[:, start : start + N_ANGLE_BOUNDARIES]
    scalar_rank = kdis.ndim == 1
    kd = kdis[:, None] if scalar_rank else kdis
    # (nq, r, nb) ratio
    ratio = dtb[:, None, :] / np.where(kd[:, :, None] == 0, np.inf, kd[:, :, None])
    mask = dtb[:, None, :] < kd[:, :, None]
    ang = np.arccos(np.clip(ratio, -1.0, 1.0))
    phi = np.where(mask, ang, 0.0).sum(axis=2)
    return phi[:, 0] if scalar_rank else phi
