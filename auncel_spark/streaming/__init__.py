from auncel_spark.streaming.ingest import (
    stream_assign_vectors,
    stream_windowed_event_stats,
)
from auncel_spark.streaming.search import stream_ivf_search, stream_search

__all__ = [
    "stream_assign_vectors",
    "stream_windowed_event_stats",
    "stream_ivf_search",
    "stream_search",
]
