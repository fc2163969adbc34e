"""Vector math as Catalyst column expressions (the codegen'd fast path).

Re-expresses the reference's dense-kernel surface (``Auncel/utils.h``:
``fvec_L2sqr``, ``fvec_inner_product``, ``fvec_norm_L2sqr``,
``fvec_renorm_L2``, ``inner_product_to_L2sqr``) as ``pyspark.sql``
higher-order functions over ``ARRAY<FLOAT>`` columns. These stay inside
whole-stage codegen — no Python round-trip — which is the right trade
for moderate d (the test corpus is d=64). For large d in hot loops, the
GEMM pandas-UDF kernels in ``operators/knn.py`` take over, exactly as
the reference switches to BLAS above ``distance_compute_blas_threshold``
(``Auncel/utils.h:186-187``).

All arithmetic is performed in float64 (inputs cast element-wise) so
results are reproducible and comparable against a float64 SQL oracle;
the reference stores float32 but its BLAS path accumulates in higher
precision too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from auncel_spark.config import Metric


def _as_double(arr: Column | str) -> Column:
    arr = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(arr, lambda x: x.cast("double"))


def l2sq_distance(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance (reference: ``fvec_L2sqr``, Auncel/utils.h:128-133).

    Sequential left-to-right float64 accumulation — deterministic.
    """
    pairs = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def inner_product(a: Column | str, b: Column | str) -> Column:
    """Dot product (reference: ``fvec_inner_product``, Auncel/utils.h:122-126)."""
    pairs = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str, squared: bool = False) -> Column:
    """L2 norm (reference: ``fvec_norm_L2sqr``, Auncel/utils.h:136-147)."""
    sq = inner_product(a, a)
    return sq if squared else F.sqrt(sq)


def l2_normalize(a: Column | str) -> Column:
    """Renormalize to unit L2 (reference: ``fvec_renorm_L2``,
    Auncel/utils.h:150; used for the IP/cosine path,
    Auncel/IndexIVF.cpp:102-110). Zero vectors pass through unchanged,
    matching the reference (it skips nr == 0 rows).
    """
    arr = _as_double(a)
    nrm = F.sqrt(F.aggregate(F.zip_with(arr, arr, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x))
    return F.when(nrm == 0.0, arr).otherwise(F.transform(arr, lambda x: x / nrm))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = <a,b> / (|a||b|); 0 when either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(inner_product(a, b) / denom)


def dist_expr(a: Column | str, b: Column | str, metric: Metric) -> Column:
    """The engine-wide ascending distance column: L2 → squared L2,
    IP → negated dot product (so smaller is always closer and one
    ``ORDER BY dist, id`` rule covers both; see ``config.Metric``).
    """
    if metric == Metric.L2:
        return l2sq_distance(a, b)
    if metric == Metric.COSINE:
        return -cosine_similarity(a, b)
    return -inner_product(a, b)


def ip_to_l2sq(ip: Column, norm_a_sq: Column, norm_b_sq: Column) -> Column:
    """|x−y|² = |x|² + |y|² − 2⟨x,y⟩ (reference:
    ``inner_product_to_L2sqr``, Auncel/utils.h:156-159)."""
    return norm_a_sq + norm_b_sq - 2.0 * ip


def ids_mat_from_arrow(batch, id_idx: int = 0, vec_idx: int = 1, dtype=None):
    """(int64 ids, float64 (n, d) matrix) from an Arrow record batch of
    (id bigint, vec array<float>) — the ``mapInArrow`` twin of
    ``as_matrix``. The list column's flat float32 values buffer is
    viewed once and widened in one vectorized pass; the mapInPandas
    route materialized one ndarray object PER ROW during the
    Arrow→pandas conversion before ``as_matrix`` could even see the
    cells. Widening float32→float64 is exact, so results are
    value-identical to the pandas route.
    """
    import numpy as np

    ids = (
        batch.column(id_idx)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=False)
    )
    vc = batch.column(vec_idx)
    n = len(vc)
    if n == 0:
        return ids, np.empty((0, 0), dtype=dtype or np.float64)
    flat = vc.flatten().to_numpy(zero_copy_only=False)
    mat = np.asarray(flat, dtype=dtype or np.float64).reshape(n, -1)
    return ids, mat


def as_matrix(cells, dtype=None):
    """Decode a pandas Series (or sequence) of equal-length vector cells
    into an ``(n, d)`` float64 ndarray.

    ``np.concatenate(cells, dtype=...)`` fuses the copy and the
    float32→float64 widening into one pass — measured 41.3 vs 49.2 ms
    per 100k×96 Arrow batch against ``np.array(list(cells), dtype=...)``
    on this container — and is value-identical: both apply the same
    exact element-wise widening. Every GEMM kernel decodes its query
    and base batches through here.
    """
    import numpy as np

    if dtype is None:
        dtype = np.float64
    vals = cells.to_numpy() if hasattr(cells, "to_numpy") else cells
    n = len(vals)
    if n == 0:
        # np.concatenate rejects an empty sequence; keep the legacy
        # shape-(0,) result so unguarded callers behave identically
        return np.array(list(vals), dtype=dtype)
    return np.concatenate(vals, dtype=dtype).reshape(n, -1)
