"""auncel_spark — a PySpark-native error-bounded vector analytics engine.

A from-scratch re-expression of the capabilities of pkusys/Auncel
(NSDI'23 "Fast, Approximate Vector Queries on Very Large Unstructured
Datasets") on top of the Spark DataFrame/SQL engine:

- exact k-NN / range search over L2 and inner-product metrics,
- IVF (inverted-file) indexes backed by ``partitionBy("list_no")``
  Parquet so Catalyst partition pruning replaces posting-list seeks,
- PQ / SQ compression with ADC scanning in Arrow-vectorized kernels,
- Auncel's error-profile system (phi–U traces + geometric recall
  prediction) expressed as a driver-staged iterative DataFrame job,
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash),
  similarity search, text analysis, multimodal column plumbing.

Design rule (SURVEY.md §4): the relational shell stays pure DataFrame so
Catalyst does pruning/pushdown/AQE; numeric kernels live in pandas UDFs.
Only tiny state (centroids, codebooks, traces — MBs) ever reaches the
driver or a broadcast; vector data never does.
"""

import os as _os

# Must precede the first numpy import in the process: numpy madvises
# MADV_HUGEPAGE on >=4 MB buffers and under THP defrag=[madvise] every
# 2 MB first-touch fault runs synchronous compaction (measured 0.3-0.4
# vs 6-15 GB/s — an ~8x tax on fresh kernel temporaries; details in
# session.py). Harmless no-op where numpy is already imported or THP
# is configured differently.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from auncel_spark.config import Metric

__all__ = ["Metric"]
__version__ = "0.1.0"
