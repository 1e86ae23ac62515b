from scikit_learn_imputer_spark.streaming.events import (
    windowed_event_counts,
    windowed_event_counts_batch,
    stream_events_from_parquet,
)
from scikit_learn_imputer_spark.streaming.ingest import (
    ingest_batch,
    stream_corpus_ingest,
)
from scikit_learn_imputer_spark.streaming.sinks import idempotent_batch_sink

__all__ = [
    "windowed_event_counts",
    "windowed_event_counts_batch",
    "stream_events_from_parquet",
    "ingest_batch",
    "stream_corpus_ingest",
    "idempotent_batch_sink",
]
