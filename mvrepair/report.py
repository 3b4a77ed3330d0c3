"""Report sinks: golden-text formatter, categorized fan-out, stats file.

Parity targets (citations into /root/reference):
- Record format (O17): ``MVInconsistentRow.toString``
  (src/main/java/mvsync/MVInconsistentRow.java:32-53):
  ``Problem:/RowKey:/MainTableEntry:/MVTableEntry:[/BaseColumn:/MvColumn:]``
  with ``RecordColumnInfo.toString`` = ``name:TYPE[:value]`` (value omitted
  when null — RecordColumnInfo.java:39-47) and ``RecordPrimaryKey.toString``
  = ``name:TYPE:value,…`` (RecordPrimaryKey.java:63-76).
- Categorized sinks (O16): ``<outdir>/<PROBLEM>/…`` with records separated
  by ``"="*30`` (MVJobOutputStreamer.java:28-101).  Re-expressed as
  ``write.partitionBy("problem").text`` — one directory per category, one
  file per Spark partition, exactly the reference's layout shape.
- Stats sink (O18): single-line ``stats.txt`` (JobStats.java:44-76,
  golden in README.md:73).

Row rendering note: the reference prints ``CassandraRow{col: val, …}`` in
connector map order, which is not deterministic; we render sorted column
order and match parsed content, not byte order (SURVEY §7).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

from mvrepair.functions import render_value
from mvrepair.operators.reconcile import (
    BASE_PREFIX,
    CONSISTENT,
    INCONSISTENT,
    MV_PREFIX,
    SKIPPED,
    JobStatsResult,
)
from mvrepair.schema import MVSpec, TTL_SUFFIX, WRITETIME_SUFFIX

SEPARATOR = "=" * 30

# MVJobOutputStreamer.java:43-48 — the two repair-error report categories.
ERR_DELETING = "ERR_DELETING"
ERR_UPSERTING = "ERR_UPSERTING"


def _render_or_null(col: Column, typ: str) -> Column:
    return F.coalesce(render_value(col, typ), F.lit("null"))


def _row_key_expr(spec: MVSpec) -> Column:
    """RecordPrimaryKey.toString: ``name:TYPE:value,…`` over the MV PK."""
    parts = []
    for c in spec.mv_pk:
        typ = spec.mv.columns[c]
        if parts:
            parts.append(F.lit(","))
        parts.append(F.lit(f"{c}:{typ}:"))
        parts.append(_render_or_null(F.col(c), typ))
    return F.concat(*parts)


def _row_render_expr(wide_cols: list[str], spec: MVSpec, prefix: str, side) -> Column:
    """``CassandraRow{col: val, …}`` in sorted column order; null row (side
    absent) renders as the literal ``null``."""
    parts: list[Column] = [F.lit("CassandraRow{")]
    first = True
    for c in sorted(side.columns):
        typ = side.columns[c]
        src = c if c in spec.mv_pk else prefix + c
        if src not in wide_cols and c not in spec.mv_pk:
            continue
        entries = [(c, _render_or_null(F.col(src), typ))]
        if not first:
            parts.append(F.lit(", "))
        for name, val in entries:
            parts.append(F.lit(f"{name}: "))
            parts.append(val)
        first = False
        for suffix, label in ((WRITETIME_SUFFIX, "writetime"), (TTL_SUFFIX, "ttl")):
            comp = (prefix + c + suffix) if c not in spec.mv_pk else None
            if comp and comp in wide_cols:
                parts.append(F.lit(f", {label}({c}): "))
                parts.append(F.coalesce(F.col(comp).cast("string"), F.lit("null")))
    parts.append(F.lit("}"))
    present = F.coalesce(F.col(prefix + "present"), F.lit(False))
    return F.when(present, F.concat(*parts)).otherwise(F.lit("null"))


def _record_expr(cols: list[str], spec: MVSpec) -> Column:
    """The full golden record text (MVInconsistentRow.toString parity)."""
    diff_name_type = F.concat(F.col("diff_column"), F.lit(":"), F.col("diff_type"))
    base_cell = F.when(
        F.col("base_value").isNotNull(),
        F.concat(diff_name_type, F.lit(":"), F.col("base_value")),
    ).otherwise(diff_name_type)
    mv_cell = F.when(
        F.col("mv_value").isNotNull(),
        F.concat(diff_name_type, F.lit(":"), F.col("mv_value")),
    ).otherwise(diff_name_type)

    return F.concat(
        F.lit("Problem: "),
        F.col("problem"),
        F.lit("\nRowKey: "),
        _row_key_expr(spec),
        F.lit("\nMainTableEntry: "),
        _row_render_expr(cols, spec, BASE_PREFIX, spec.base),
        F.lit("\nMVTableEntry: "),
        _row_render_expr(cols, spec, MV_PREFIX, spec.mv),
        F.when(
            (F.col("problem") == INCONSISTENT) & F.col("diff_column").isNotNull(),
            F.concat(
                F.lit("\nBaseColumn: "), base_cell, F.lit("\nMvColumn: "), mv_cell
            ),
        ).otherwise(F.lit("")),
    )


def format_report(wide: DataFrame, spec: MVSpec) -> DataFrame:
    """Wide classified DataFrame → (problem, record) golden-text rows for
    all problem keys (CONSISTENT/SKIPPED emit nothing)."""
    record = _record_expr(wide.columns, spec)
    return wide.filter(~F.col("problem").isin(CONSISTENT, SKIPPED)).select(
        F.col("problem"), record.alias("record")
    )


def _default_upsert_err(wide: DataFrame, spec: MVSpec, settings) -> Column:
    """File-mode upsert failure surface: the reference refuses (and reports)
    upserts whose MV-PK has a null column (DBOperations.java:296-309,
    ``Primary key column %s is null``) — the one mutation error that exists
    without a live database.

    When this fires: the wide frame's PK columns are using-join coalesced,
    so a null only survives when NEITHER side had a value — i.e. a
    base-only row whose *promoted* MV-PK column is null (such rows never
    joined, classify as MISSING_IN_MV_TABLE, and are exactly the rows the
    reference's pre-mutation check rejects: the base row can't be inserted
    into the MV without a full PK).  For INCONSISTENT rows both sides
    matched on non-null keys, so — as in the reference, where Cassandra
    PKs are non-null — the check cannot fire there."""
    from mvrepair.operators.reconcile import MISSING_IN_MV_TABLE

    p = F.col("problem")
    attempted = ((p == INCONSISTENT) & F.lit(settings.fix_inconsistent_mv)) | (
        (p == MISSING_IN_MV_TABLE) & F.lit(settings.fix_missing_mv)
    )
    first_null = F.coalesce(
        *[F.when(F.col(c).isNull(), F.lit(c)) for c in spec.mv_pk],
        F.lit(None).cast("string"),
    )
    return F.when(
        attempted & first_null.isNotNull(),
        F.concat(F.lit("Primary key column "), first_null, F.lit(" is null")),
    )


def format_report_categorized(
    wide: DataFrame,
    spec: MVSpec,
    settings=None,
    upsert_err: Column | None = None,
    delete_err: Column | None = None,
) -> DataFrame:
    """(category, record) with repair-error fan-out, in ONE scan.

    Routing parity with ``MVJobOutputStreamer.streamOutput``
    (MVJobOutputStreamer.java:64-101): every problem row goes to its
    problem category; a row whose repair mutation failed ADDITIONALLY goes
    to ERR_DELETING / ERR_UPSERTING with the error message appended.
    ``upsert_err`` / ``delete_err`` are string expressions (null = no
    error); the default upsert error reproduces the reference's null-PK
    refusal.  Fan-out is an explode over a per-row category array, so the
    classified frame is scanned once — no per-category re-scan.
    """
    from mvrepair.config import SyncSettings

    settings = settings or SyncSettings()
    if upsert_err is None:
        upsert_err = _default_upsert_err(wide, spec, settings)
    if delete_err is None:
        delete_err = F.lit(None).cast("string")

    record = _record_expr(wide.columns, spec)
    p = F.col("problem")
    targets = F.array_compact(
        F.array(
            F.when(
                ~p.isin(CONSISTENT, SKIPPED),
                F.struct(p.alias("category"), record.alias("record")),
            ),
            F.when(
                delete_err.isNotNull(),
                F.struct(
                    F.lit(ERR_DELETING).alias("category"),
                    F.concat(record, F.lit("\n"), delete_err).alias("record"),
                ),
            ),
            F.when(
                upsert_err.isNotNull(),
                F.struct(
                    F.lit(ERR_UPSERTING).alias("category"),
                    F.concat(record, F.lit("\n"), upsert_err).alias("record"),
                ),
            ),
        )
    )
    return (
        wide.select(F.explode(targets).alias("t"))
        .select("t.category", "t.record")
    )


def write_reports(
    wide: DataFrame,
    spec: MVSpec,
    outdir: str,
    settings=None,
    upsert_err: Column | None = None,
    delete_err: Column | None = None,
) -> None:
    """O16 multi-sink fan-out: ``<outdir>/category=<CATEGORY>/part-*.txt``
    with ``"="*30`` separators appended per record (FileStreamer parity).

    Routes through ``format_report_categorized``, so repair-error rows
    additionally land in ``ERR_DELETING``/``ERR_UPSERTING`` — the full
    MVJobOutputStreamer category set.  ``runner.run`` wraps this with the
    reference's exact directory names (category= prefix stripped) plus
    stats.txt."""
    formatted = format_report_categorized(
        wide, spec, settings, upsert_err=upsert_err, delete_err=delete_err
    ).withColumn("record", F.concat(F.col("record"), F.lit("\n" + SEPARATOR)))
    formatted.write.partitionBy("category").mode("overwrite").text(outdir)


def write_error_reports(
    wide: DataFrame,
    spec: MVSpec,
    outdir: str,
    upsert_errors: DataFrame | None = None,
    delete_errors: DataFrame | None = None,
) -> None:
    """Append ERR_UPSERTING / ERR_DELETING records for keys whose LIVE
    repair mutation failed.

    The reference streams the failed record plus the exception text while
    mutating (MVJobOutputStreamer.java:64-101, fed from the catch blocks in
    DBOperations.java:58-94 / :240-387); batch-side, the error frames come
    back from ``sources.cassandra.apply_repairs_cassandra`` AFTER the
    report write, so the error categories are a second, append-mode write
    into the same categorized layout.  Errors are aggregated per key
    (sorted distinct messages, ``"; ``"-joined) so a key with several
    failed column upserts emits one record — bounded output per key.

    DELIBERATE format divergence (the one departure from the pinned
    reference formats): the reference streams ONE block per failed
    mutation (MVJobOutputStreamer.java:84-94), so a key with N failing
    column upserts emits N blocks; here it emits one block with the
    distinct messages joined.  Message PREFIXES match the reference
    ('Error upserting data:' / 'Error deleting data:',
    DBOperations.java:90,383).
    """
    frames = [
        (ERR_UPSERTING, upsert_errors),
        (ERR_DELETING, delete_errors),
    ]
    record = _record_expr(wide.columns, spec)
    out = None
    for category, errors in frames:
        if errors is None:
            continue
        per_key = errors.groupBy(*spec.mv_pk).agg(
            F.array_join(
                F.sort_array(F.collect_set("error")), "; "
            ).alias("__err")
        )
        part = (
            wide.join(per_key, on=list(spec.mv_pk), how="inner")
            .select(
                F.lit(category).alias("category"),
                F.concat(record, F.lit("\n"), F.col("__err")).alias("record"),
            )
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        return
    formatted = out.withColumn(
        "record", F.concat(F.col("record"), F.lit("\n" + SEPARATOR))
    )
    formatted.write.partitionBy("category").mode("append").text(outdir)


def write_stats(stats: JobStatsResult, outdir: str) -> None:
    """O18: single-line ``stats.txt`` in exact JobStats.toString format."""
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "stats.txt"), "w") as fh:
        fh.write(stats.render())
