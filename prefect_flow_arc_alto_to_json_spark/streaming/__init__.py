from .pipeline import (
    dedup_events,
    run_available_now,
    sessionized_events,
    stream_events,
    windowed_event_counts,
)
from .watermark import WatermarkStore, incremental_filter

__all__ = [
    "WatermarkStore",
    "incremental_filter",
    "stream_events",
    "windowed_event_counts",
    "sessionized_events",
    "dedup_events",
    "run_available_now",
]
