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
- ``compact_and_apply_log``: the batch tail of the durable-log workflow —
  LWW-compact the accumulated cell log (restarts/retries/superseding
  snapshots append duplicates) and hand the applier exactly one winning
  cell per target, with ``n_superseded`` stats for the saved mutations.

Delete repair stays batch-only BY DESIGN: MISSING_IN_BASE_TABLE (orphan)
detection needs the full base-side key set, which a base-change stream
cannot provide (SURVEY §7 lambda split; the guarded anti-join probe is
DBOperations.java:196-228 parity and needs a complete fresh snapshot).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F
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


def compact_and_apply_log(
    spark,
    log_path: str,
    key_cols: list[str],
    apply_fn: Callable[[DataFrame], None] | None = None,
    column_col: str = "column",
) -> tuple[DataFrame, dict]:
    """The documented pre-apply step of the durable-log workflow:
    ``repair_cells_to_files`` log ──▶ COMPACT ──▶ apply.

    A long-running incremental repair appends to the cell log across
    restarts, retries, and superseding snapshots, so the same (MV key,
    column) target accumulates multiple cells.  Applying the raw log
    works (explicit-writetime upserts are idempotent and LWW-converge in
    Cassandra) but wastes one mutation per superseded cell and re-sends
    stale values; compacting first (``compact_repair_log`` — one
    map-side-combinable ``max_by`` aggregate, never a window) applies
    exactly one winning cell per target, with Cassandra's own
    last-write-wins semantics decided engine-side.

    ``apply_fn`` receives the compacted plan in the exact
    ``plan_upserts`` schema (the ``n_superseded`` bookkeeping column
    dropped) — pass the file-mode rewriter or a closure over
    ``sources.cassandra.apply_repairs_cassandra``.  Returns the
    compacted plan plus a stats dict: ``n_log_cells`` (raw log rows),
    ``n_applied`` (winning cells), ``n_superseded`` (shadowed rows =
    the mutation traffic compaction saved).  The stats come from the
    compacted frame itself (a bounded aggregate, no second log scan).
    """
    from mvrepair.operators.repair import compact_repair_log

    cells = spark.read.parquet(log_path)
    compacted = compact_repair_log(cells, key_cols, column_col)
    plan = compacted.drop("n_superseded")
    if apply_fn is not None:
        apply_fn(plan)
    [row] = compacted.agg(
        F.count(F.lit(1)).alias("n_applied"),
        F.coalesce(F.sum("n_superseded"), F.lit(0)).alias("n_superseded"),
    ).collect()
    stats = {
        "n_applied": row["n_applied"],
        "n_superseded": row["n_superseded"],
        "n_log_cells": row["n_applied"] + row["n_superseded"],
    }
    return plan, stats


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
