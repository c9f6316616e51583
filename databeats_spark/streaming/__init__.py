from databeats_spark.streaming.events import (  # noqa: F401
    run_available_now,
    stream_events,
    streaming_sessionization,
    windowed_event_stats,
)
