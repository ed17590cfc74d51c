from vector_db_core_spark.streaming.ingest import (
    IngestBuffer,
    dedup_within_watermark,
    ingest_metrics,
    interval_join_followups,
    session_event_counts,
    stream_append_to_store,
    windowed_event_counts,
)
from vector_db_core_spark.streaming.stateful import running_user_totals

__all__ = [
    "running_user_totals",
    "IngestBuffer",
    "dedup_within_watermark",
    "ingest_metrics",
    "interval_join_followups",
    "session_event_counts",
    "stream_append_to_store",
    "windowed_event_counts",
]
