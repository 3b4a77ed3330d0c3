"""Structured Streaming surface of the engine."""

from mvrepair.streaming.incremental import (
    streaming_classify_against_static,
    streaming_dedup_native,
    streaming_events_hourly,
    streaming_reconcile_against_static,
)
from mvrepair.streaming.repair import (
    repair_cells_foreach_batch,
    repair_cells_to_files,
    streaming_repair_upserts,
)

__all__ = [
    "streaming_classify_against_static",
    "streaming_dedup_native",
    "streaming_events_hourly",
    "streaming_reconcile_against_static",
    "streaming_repair_upserts",
    "repair_cells_foreach_batch",
    "repair_cells_to_files",
]
