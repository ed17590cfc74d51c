from vector_db_core_spark.streaming.ingest import (
    IngestBuffer,
    dedup_within_watermark,
    ingest_metrics,
    stream_append_to_store,
    windowed_event_counts,
)

__all__ = [
    "IngestBuffer",
    "dedup_within_watermark",
    "ingest_metrics",
    "stream_append_to_store",
    "windowed_event_counts",
]
