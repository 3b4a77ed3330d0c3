"""Structured Streaming surface of the engine."""

from mvrepair.streaming.incremental import (
    streaming_events_hourly,
    streaming_reconcile_against_static,
)

__all__ = ["streaming_events_hourly", "streaming_reconcile_against_static"]
