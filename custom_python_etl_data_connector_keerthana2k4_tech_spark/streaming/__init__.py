"""Structured Streaming surface (SURVEY §7 M5)."""

from custom_python_etl_data_connector_keerthana2k4_tech_spark.streaming.ops import (
    foreach_batch_upsert,
    run_pulse_stream,
    session_counts,
    stateful_running_totals,
    stream_dedup,
    stream_stream_join,
    streaming_ewma,
    windowed_counts,
)

__all__ = [
    "foreach_batch_upsert",
    "run_pulse_stream",
    "session_counts",
    "stateful_running_totals",
    "stream_dedup",
    "stream_stream_join",
    "streaming_ewma",
    "windowed_counts",
]
