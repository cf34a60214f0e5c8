from opentelemetry_collector_spark.streaming.stream import (
    read_transcript_stream,
    run_stream_pipeline,
    session_turn_counts,
    windowed_turn_counts,
)

__all__ = [
    "read_transcript_stream",
    "run_stream_pipeline",
    "session_turn_counts",
    "windowed_turn_counts",
]
