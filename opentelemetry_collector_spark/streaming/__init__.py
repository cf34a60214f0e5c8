from opentelemetry_collector_spark.streaming.stream import (
    accumulate_bloom_stream,
    accumulate_cells_stream,
    interval_join_stream,
    read_bloom_artifact,
    read_transcript_stream,
    run_stream_pipeline,
    session_turn_counts,
    windowed_turn_counts,
)

__all__ = [
    "accumulate_bloom_stream",
    "accumulate_cells_stream",
    "interval_join_stream",
    "read_bloom_artifact",
    "read_transcript_stream",
    "run_stream_pipeline",
    "session_turn_counts",
    "windowed_turn_counts",
]
