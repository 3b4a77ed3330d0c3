"""Incremental (Structured Streaming) repair.

The reference repairs via a nightly full-scan batch job (MvSync.java:108-156
— scan both tables, cogroup, mutate).  At 100 TB a full rescan per run is
the dominant cost; the incremental path instead consumes a STREAM of
base-table changes (CDC feed, incremental snapshot directory, Kafka topic)
and emits column-granular repair cells per microbatch:

    base change stream ──left join──▶ MV snapshot ──▶ classify ──▶
    plan_upserts (unchanged batch code) ──▶ repair-cell stream

Because ``streaming_classify_against_static`` preserves the batch wide-frame
contract and ``plan_upserts`` is pure column algebra (filter + projection +
explode), the SAME planner runs on the streaming plan — no reimplementation,
no semantic drift between the batch and streaming repair paths.  Each
microbatch join is a broadcast/SMJ of the delta against the snapshot instead
of a full-corpus shuffle.

Sinks:
- ``repair_cells_to_files``: append-mode parquet log of repair cells — the
  durable hand-off to a downstream applier (exactly-once via the streaming
  checkpoint + file-sink manifest).
- ``repair_cells_foreach_batch``: per-microbatch callback for the imperative
  edge (the token-bucket CQL executor in ``mvrepair.sources.cassandra``) —
  same seam the batch applier uses.

Delete repair stays batch-only BY DESIGN: MISSING_IN_BASE_TABLE (orphan)
detection needs the full base-side key set, which a base-change stream
cannot provide (SURVEY §7 lambda split; the guarded anti-join probe is
DBOperations.java:196-228 parity and needs a complete fresh snapshot).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mvrepair.config import SyncSettings
from mvrepair.operators.repair import plan_upserts
from mvrepair.schema import MVSpec
from mvrepair.streaming.incremental import streaming_classify_against_static


def streaming_repair_upserts(
    base_stream: DataFrame,
    mv_static: DataFrame,
    spec: MVSpec,
    settings: SyncSettings | None = None,
    respect_flags: bool = False,
) -> DataFrame:
    """Streaming column-granular upsert plan.

    Returns a STREAMING DataFrame with the exact schema of the batch
    ``plan_upserts`` output — one row per (MV key, changed MV non-PK
    column): ``<mv_pk…>, column, column_type, value, writetime, ttl,
    flavor`` (UpsertFlavors.java:3-8 flavors, per-cell writetime/ttl
    carried from the base row, equal columns skipped, null-PK keys
    excluded).  On a fully drained stream the result equals the batch
    plan for the same inputs, minus window filtering (incremental mode
    has none) — the property the driver's oracle hash-checks.
    """
    wide = streaming_classify_against_static(base_stream, mv_static, spec)
    return plan_upserts(wide, spec, settings, respect_flags=respect_flags)


def repair_cells_to_files(
    cells: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Durable repair-cell log: append-mode parquet sink.

    Exactly-once delivery comes from the checkpoint + the file sink's
    commit manifest; a downstream applier (or the batch file-mode
    rewriter) consumes the log idempotently — upserts carry explicit
    writetime, so replays converge (same guarantee the reference leans on
    for task retries, SURVEY §7 "repair executors idempotent").
    """
    writer = (
        cells.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def repair_cells_foreach_batch(
    cells: DataFrame,
    apply_fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Imperative repair edge: ``apply_fn(batch_df, batch_id)`` per
    microbatch.

    This is where the live-database executor plugs in —
    ``sources.cassandra.apply_repairs_cassandra`` inside ``apply_fn`` gives the
    streaming path the same token-bucket-limited, prepared-statement CQL
    writes as the batch path.  ``foreachBatch`` re-delivers a batch after
    a failure (at-least-once); the executor's explicit-writetime upserts
    make that idempotent.
    """
    writer = cells.writeStream.foreachBatch(apply_fn).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
