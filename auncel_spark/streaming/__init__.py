from auncel_spark.streaming.ingest import (
    stream_assign_vectors,
    stream_windowed_event_stats,
)

__all__ = ["stream_assign_vectors", "stream_windowed_event_stats"]
