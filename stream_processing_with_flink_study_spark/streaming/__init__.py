"""Structured Streaming surface: sources (S4-S7), streaming twins of
the batch queries, stateful process functions (P1-P7), sinks (O1-O8),
and the AvailableNow equivalence runner (SURVEY.md §5.3)."""

from .pipelines import (
    basic_pipeline_stream,
    dedup_within_watermark_stream,
    interval_join_stream,
    rolling_sum_stream,
    run_available_now,
    session_window_stream,
    smoke_alert_stream,
    window_join_stream,
    windowed_avg_stream,
)
from .process import (
    count_window_sum_tws,
    rocksdb_conf,
    running_max,
    topk_counts_tws,
)
from .sinks import (
    IdempotentKeyedUpsert,
    console_sink,
    foreach_batch_sink,
    encode_kafka_records,
    kafka_sink,
    parquet_sink,
    two_phase_commit_writer,
)
from .sources import (
    decode_json_value,
    events_stream,
    file_stream,
    kafka_source_options,
    kafka_stream,
    memory_batches_stream,
)
from .stateful import (
    count_window_sum,
    topk_counts,
    dedup_first,
    funnel_matches,
    keyed_rolling_reduce,
    simhash_near_dup_stream,
    temp_delta_alerts,
)

__all__ = [
    "IdempotentKeyedUpsert",
    "basic_pipeline_stream",
    "console_sink",
    "count_window_sum",
    "count_window_sum_tws",
    "dedup_first",
    "dedup_within_watermark_stream",
    "events_stream",
    "file_stream",
    "foreach_batch_sink",
    "funnel_matches",
    "interval_join_stream",
    "decode_json_value",
    "encode_kafka_records",
    "kafka_sink",
    "kafka_source_options",
    "kafka_stream",
    "keyed_rolling_reduce",
    "memory_batches_stream",
    "parquet_sink",
    "rocksdb_conf",
    "rolling_sum_stream",
    "run_available_now",
    "running_max",
    "session_window_stream",
    "simhash_near_dup_stream",
    "temp_delta_alerts",
    "topk_counts",
    "topk_counts_tws",
    "smoke_alert_stream",
    "two_phase_commit_writer",
    "window_join_stream",
    "windowed_avg_stream",
]
