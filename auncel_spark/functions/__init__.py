from auncel_spark.functions.vector import (
    cosine_similarity,
    dist_expr,
    inner_product,
    l2_norm,
    l2_normalize,
    l2sq_distance,
)

__all__ = [
    "cosine_similarity",
    "dist_expr",
    "inner_product",
    "l2_norm",
    "l2_normalize",
    "l2sq_distance",
]
