from dw_etl_spark.streaming.sinks import (
    cms_batch_applier,
    cms_stream_writer,
    scd2_stream_writer,
)
from dw_etl_spark.streaming.stateful import first_seen_dedup, watermarked_dedup
from dw_etl_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    windowed_event_counts,
)

__all__ = [
    "first_seen_dedup",
    "watermarked_dedup",
    "cms_batch_applier",
    "cms_stream_writer",
    "scd2_stream_writer",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize",
    "windowed_event_counts",
]
