from scikit_learn_imputer_spark.streaming.events import (
    windowed_event_counts,
    windowed_event_counts_batch,
    stream_events_from_parquet,
)

__all__ = [
    "windowed_event_counts",
    "windowed_event_counts_batch",
    "stream_events_from_parquet",
]
