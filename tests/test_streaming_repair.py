"""Streaming repair leg: incremental upsert planning + sinks + CLI main.

The invariant under test: the streaming repair path reuses the BATCH
``plan_upserts`` on a stream-static classified frame, so a fully drained
stream must produce exactly the batch repair plan for the same inputs
(minus window filtering, which incremental mode doesn't have).
"""

from __future__ import annotations

import os

from mvrepair.plans import mv_pair as P
from mvrepair.operators.reconcile import classify
from mvrepair.operators.repair import plan_upserts
from mvrepair.streaming.repair import (
    repair_cells_foreach_batch,
    repair_cells_to_files,
    streaming_repair_upserts,
)

CELL_COLS = [
    "o_custkey", "o_orderkey", "column", "column_type",
    "value", "writetime", "ttl", "flavor",
]


def _cells_set(rows):
    return {tuple(r[c] for c in CELL_COLS) for r in rows}


def _batch_plan_rows(spark, sf_dir):
    # batch twin WITHOUT a window — incremental mode classifies every change
    wide = classify(
        P.base_df(spark, sf_dir), P.mv_df(spark, sf_dir), P.spec(), window=None
    )
    return plan_upserts(wide, P.spec()).collect()


def test_streaming_repair_upserts_equals_batch_plan(spark, sf_dir):
    cells = streaming_repair_upserts(
        P.base_stream_df(spark, sf_dir), P.mv_df(spark, sf_dir), P.spec()
    )
    assert cells.isStreaming
    q = (
        cells.writeStream.format("memory")
        .queryName("__t_stream_upserts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("__t_stream_upserts").collect()
    batch = _batch_plan_rows(spark, sf_dir)
    assert _cells_set(streamed) == _cells_set(batch)
    assert len(streamed) == len(batch)


def test_repair_cells_to_files_durable_log(spark, sf_dir, tmp_path):
    cells = streaming_repair_upserts(
        P.base_stream_df(spark, sf_dir), P.mv_df(spark, sf_dir), P.spec()
    )
    out = str(tmp_path / "cells")
    q = repair_cells_to_files(cells, out, str(tmp_path / "ckpt"))
    q.awaitTermination()
    logged = spark.read.parquet(out).collect()
    assert _cells_set(logged) == _cells_set(_batch_plan_rows(spark, sf_dir))


def test_repair_cells_foreach_batch_applier_seam(spark, sf_dir, tmp_path):
    """The imperative edge: every microbatch reaches apply_fn; the union of
    batches is the full plan (at-least-once per batch, exactly-once here
    because availableNow drains without failures)."""
    cells = streaming_repair_upserts(
        P.base_stream_df(spark, sf_dir), P.mv_df(spark, sf_dir), P.spec()
    )
    seen: list[tuple] = []
    batch_ids: list[int] = []

    def apply_fn(batch_df, batch_id):
        batch_ids.append(batch_id)
        seen.extend(_cells_set(batch_df.collect()))

    q = repair_cells_foreach_batch(
        cells, apply_fn, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert batch_ids  # at least one microbatch fired
    assert set(seen) == _cells_set(_batch_plan_rows(spark, sf_dir))


def test_cli_main_runs_job_and_prints_stats(spark, tmp_path, capsys):
    """``python -m mvrepair`` parity (MvSync.java:43-45): settings from the
    Spark conf + key=value overrides, stats line on stdout, exit 0."""
    from mvrepair.__main__ import main

    db = "mvrepair_cli_ks"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        spark.sql(
            f"CREATE TABLE {db}.b (pk STRING, c1 INT) USING PARQUET "
            "TBLPROPERTIES ('mvrepair.pk'='pk')"
        )
        spark.sql(
            f"CREATE TABLE {db}.m (pk STRING, c1 INT) USING PARQUET "
            "TBLPROPERTIES ('mvrepair.pk'='pk')"
        )
        spark.sql(f"INSERT INTO {db}.b VALUES ('a', 1), ('b', 2)")
        spark.sql(f"INSERT INTO {db}.m VALUES ('a', 1), ('b', 99)")
        outdir = str(tmp_path / "out")
        rc = main(
            [
                f"cass.mv.keyspace={db}",
                "cass.mv.basetablename=b",
                "cass.mv.mvname=m",
                f"cass.mv.output.dir={outdir}",
                # no writetime companions → reference window would skip
                # nothing (no writetimes at all ⇒ sentinel ⇒ in-window)
            ]
        )
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        assert "totRecords: 2" in line and "inConsistentRecords: 1" in line
        assert os.path.isdir(os.path.join(outdir, "INCONSISTENT"))
        with open(os.path.join(outdir, "stats.txt")) as fh:
            assert fh.read() == line
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_cli_main_failure_exit_code(spark, capsys):
    from mvrepair.__main__ import main

    rc = main(["cass.mv.keyspace=__no_such_ks__",
               "cass.mv.basetablename=b", "cass.mv.mvname=m"])
    assert rc == 1
    assert "failed" in capsys.readouterr().err


def test_restart_from_checkpoint_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart: drain half the change stream, then restart the
    sink from the SAME checkpoint with new source files present.  The
    durable log must equal the full batch plan exactly — nothing lost
    (the checkpoint resumed where it left off) and nothing duplicated
    (phase-1 files are not re-emitted) — the guarantee that makes a
    crashed incremental repair job safe to rerun at 100 TB."""
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    base = P.base_df(spark, sf_dir)

    def _drop_file(df, name):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = glob.glob(f"{stage}/part-*.parquet")
        shutil.copy(part, str(src / f"{name}.parquet"))

    _drop_file(base.filter("o_orderkey % 2 = 0"), "h1")
    schema = spark.read.parquet(str(src)).schema
    out, ckpt = str(tmp_path / "cells"), str(tmp_path / "ckpt")

    def _run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        cells = streaming_repair_upserts(stream, P.mv_df(spark, sf_dir), P.spec())
        q = repair_cells_to_files(cells, out, ckpt)
        q.awaitTermination()

    _run_once()                                   # phase 1: half the changes
    phase1 = len(spark.read.parquet(out).collect())
    _drop_file(base.filter("o_orderkey % 2 = 1"), "h2")
    _run_once()                                   # restart, same checkpoint

    logged = spark.read.parquet(out).collect()
    batch = _batch_plan_rows(spark, sf_dir)
    assert _cells_set(logged) == _cells_set(batch)
    assert len(logged) == len(batch)              # no duplicate re-emission
    assert 0 < phase1 < len(batch)                # phase 1 really was partial


def test_compact_and_apply_log_replayed_retries(spark, sf_dir, tmp_path):
    """The durable-log workflow e2e: stream plans cells -> applier appends
    them to a durable log -> the job RESTARTS with a lost checkpoint and
    replays every delivery -> a later superseding snapshot appends a
    newer cell for one target.  compact_and_apply_log must hand the
    applier exactly one winning cell per (MV key, column) — the applied
    mutation set equals the compacted one, replays collapse, the newer
    writetime wins, and the stats account for every shadowed row."""
    from mvrepair.streaming.repair import compact_and_apply_log

    log = str(tmp_path / "log")

    def log_writer(batch_df, batch_id):
        batch_df.write.mode("append").parquet(log)

    for ck in ("ck1", "ck2"):  # second run = retry replay, fresh checkpoint
        cells = streaming_repair_upserts(
            P.base_stream_df(spark, sf_dir), P.mv_df(spark, sf_dir), P.spec()
        )
        q = repair_cells_foreach_batch(
            cells, log_writer, checkpoint=str(tmp_path / ck)
        )
        q.awaitTermination()

    batch = _batch_plan_rows(spark, sf_dir)
    assert batch, "fixture must produce at least one repair cell"
    # a superseding snapshot later emits a NEWER cell for one target
    target = sorted(
        batch, key=lambda r: (r["o_custkey"], r["o_orderkey"], r["column"])
    )[0]
    newer = dict(target.asDict())
    newer["writetime"] = (newer["writetime"] or 0) + 10_000_000
    newer["value"] = "__superseding__"
    log_schema = spark.read.parquet(log).schema
    spark.createDataFrame([newer], log_schema).write.mode("append").parquet(log)

    applied: list[tuple] = []

    def apply_fn(plan_df):
        assert "n_superseded" not in plan_df.columns
        applied.extend(_cells_set(plan_df.collect()))

    plan, stats = compact_and_apply_log(
        spark, log, ["o_custkey", "o_orderkey"], apply_fn
    )
    compacted = _cells_set(plan.collect())
    assert set(applied) == compacted
    # expected: the deduped batch plan with the superseded target replaced
    want = (_cells_set(batch) - {tuple(target[c] for c in CELL_COLS)}) | {
        tuple(newer[c] for c in CELL_COLS)
    }
    assert compacted == want
    # stats: 2 deliveries of every cell + 1 superseding cell
    assert stats["n_log_cells"] == 2 * len(batch) + 1
    assert stats["n_applied"] == len(batch)
    assert stats["n_superseded"] == len(batch) + 1


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """The two-sided stateful join drains to exactly the batch interval
    join: matches inside the window (inclusive start, exclusive end),
    across users never, across the boundary never."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mvrepair.streaming.incremental import streaming_view_purchase_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, user, etype, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, etype)

    rows = [
        ev(1, 10, "view", 0),
        ev(2, 10, "purchase", 30),    # in window -> match (1,2)
        ev(3, 10, "purchase", 60),    # exactly +1h: excluded
        ev(4, 11, "view", 0),
        ev(5, 12, "purchase", 10),    # other user: no match for 4
        ev(6, 11, "purchase", 59),    # in window -> match (4,6)
        ev(7, 13, "purchase", 5),     # purchase before any view: alone
        ev(8, 13, "view", 6),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    path = str(tmp_path / "events")
    df.coalesce(1).write.parquet(path)
    schema = spark.read.parquet(path).schema
    views = (
        spark.readStream.schema(schema).parquet(path)
        .filter(F.col("event_type") == "view")
    )
    purchases = (
        spark.readStream.schema(schema).parquet(path)
        .filter(F.col("event_type") == "purchase")
    )
    q = (
        streaming_view_purchase_join(views, purchases)
        .writeStream.format("memory")
        .queryName("__t_vp_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.view_id, r.purchase_id, r.gap_us)
        for r in spark.table("__t_vp_join").collect()
    }
    assert got == {(1, 2, 30 * 60 * 1_000_000), (4, 6, 59 * 60 * 1_000_000)}


def test_view_purchase_multibatch_drops_late_rows(spark, tmp_path):
    """Pins the documented batch-equality CONTINGENCY (round-10
    ADVICE): across micro-batches, watermark advancement drops
    late-arriving purchases whose cross-batch matches a batch join
    would keep.  Purchases arrive as THREE files drained one per batch
    (maxFilesPerTrigger=1): file A advances the watermark to 18:00,
    filler file F makes one batch RUN at that watermark (state
    eviction happens at the end of the first batch executed with the
    advanced watermark, so the buffered 12:00 view is dropped there),
    and file B carries a 12:30 purchase matching that evicted view —
    the batch oracle emits the match, the stream (correctly, per
    Spark's stream-stream semantics) does not."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from mvrepair.streaming.incremental import streaming_view_purchase_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, user, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), user)

    views_rows = [
        ev(1, 10, 0),      # V1: the view the late purchase matches
        ev(2, 20, 8 * 60), # 20:00 — advances the view-side watermark
    ]
    pur_a = [ev(100, 99, 8 * 60)]      # 20:00, no view for user 99
    pur_f = [ev(102, 98, 8 * 60 + 1)]  # filler: runs a batch at wm 18:00
    pur_b = [ev(101, 10, 30)]          # 12:30 — LATE: inside V1's window

    cols = ["event_id", "ts", "user_id"]
    views_path = str(tmp_path / "views")
    spark.createDataFrame(views_rows, cols).coalesce(1).write.parquet(
        views_path
    )

    pur_dir = tmp_path / "purchases"
    pur_dir.mkdir()
    now = 1_700_000_000
    for name, rows, mtime in [
        ("a.parquet", pur_a, now),
        ("f.parquet", pur_f, now + 60),
        ("b.parquet", pur_b, now + 120),
    ]:
        staging = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            staging
        )
        [part] = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(pur_dir / name)
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    schema = spark.read.parquet(views_path).schema
    views = spark.readStream.schema(schema).parquet(views_path)
    purchases = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(pur_dir))
    )
    q = (
        streaming_view_purchase_join(views, purchases)
        .writeStream.format("memory")
        .queryName("__t_vp_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.table("__t_vp_late").collect()
    }
    # the batch interval join WOULD match (1, 101); the multi-batch
    # drain drops it — the filler batch ran at watermark 18:00 and
    # evicted V1's buffered state (18:00 > view_ts + 1 h), so the
    # late purchase in the final batch finds nothing to join
    assert got == set()
    # sanity: the same data joined as BATCH frames keeps the match
    vb = spark.read.parquet(views_path).select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    pb = spark.read.parquet(str(pur_dir)).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = vb.join(
        pb,
        on=[
            vb["user_id"] == pb["p_user_id"],
            pb["purchase_ts"] >= vb["view_ts"],
            pb["purchase_ts"]
            < vb["view_ts"] + F.expr("INTERVAL 1 hour"),
        ],
    )
    assert {
        (r.view_id, r.purchase_id) for r in batch.collect()
    } == {(1, 101)}
