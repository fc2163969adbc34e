from auncel_spark.index.ivf import IVFIndex
from auncel_spark.index.kmeans import assign_lists, train_kmeans

__all__ = ["IVFIndex", "assign_lists", "train_kmeans"]
