"""Repair planning + file-mode apply.

Re-expresses the reference's imperative per-row CQL repair
(/root/reference/src/main/java/mvsync/db/DBOperations.java:240-387 upsert,
:58-94 delete, :196-228 guard probe) as pure DataFrame transforms:

- ``plan_upserts``: one cell per (key, changed column) for
  INCONSISTENT / MISSING_IN_MV_TABLE keys — column-granular, carrying the
  base row's per-cell writetime/ttl and the statement flavor
  (UpsertFlavors.java:3-8), equal columns skipped (shouldSkipField,
  DBOperations.java:230-238), null-PK keys diverted to an error plan
  (DBOperations.java:296-309).
- ``plan_deletes``: MISSING_IN_BASE_TABLE orphans re-verified against a
  fresh base snapshot with a left-anti join (the set-based equivalent of
  the per-row ``SELECT … ALLOW FILTERING`` guard, DBOperations.java:196-228,
  PreparedStatementHelper.java:80-92).
- ``apply_repairs_file_mode``: rewrites the MV dataset (join + ``F.when``
  column replacement) — the deterministic fixture-harness analogue of the
  CQL mutation path.

All of it is lazy Catalyst algebra; the only imperative edge in the engine
is the optional Cassandra executor in ``mvrepair.sources.cassandra``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mvrepair.config import SyncSettings
from mvrepair.functions import deep_eq, render_value
from mvrepair.schema import (
    COLLECTION_TYPES,
    MVSpec,
    ttl_col,
    writetime_col,
)
from mvrepair.operators.reconcile import (
    BASE_PREFIX,
    CONSISTENT,
    INCONSISTENT,
    MISSING_IN_BASE_TABLE,
    MISSING_IN_MV_TABLE,
    MV_PREFIX,
    SKIPPED,
    classify,
)

# UpsertFlavors.java:3-8
NO_TIMESTAMP_TTL = "NO_TIMESTAMP_TTL"
TIMESTAMP = "TIMESTAMP"
TTL = "TTL"
TIMESTAMP_TTL = "TIMESTAMP_TTL"

_UPSERT_PROBLEMS = (INCONSISTENT, MISSING_IN_MV_TABLE)


def _changed(c: str, t: str) -> Column:
    """NOT shouldSkipField (DBOperations.java:230-238): skip only when both
    rows exist and values deep-equal; a missing MV row never skips."""
    mv_absent = ~F.coalesce(F.col(MV_PREFIX + "present"), F.lit(False))
    base_c = F.col(BASE_PREFIX + c)
    mv_c = F.col(MV_PREFIX + c)
    return mv_absent | ~deep_eq(base_c, mv_c, t)


def _base_or_null(df_cols: list[str], name: str, cast: str | None = None) -> Column:
    if name in df_cols:
        return F.col(name)
    col = F.lit(None)
    return col.cast(cast) if cast else col


def _pk_has_null(spec: MVSpec) -> Column:
    """Reference refuses upserts whose (base-sourced) MV PK has a null
    (DBOperations.java:296-309).  After the using-join the PK columns are
    the join key; they can only be null if the source row had a null key."""
    cond = F.lit(False)
    for c in spec.mv_pk:
        cond = cond | F.col(c).isNull()
    return cond


def _upsert_candidates(wide: DataFrame, settings: SyncSettings | None) -> DataFrame:
    settings = settings or SyncSettings()
    p = F.col("problem")
    probs = []
    if settings is None or settings.fix_inconsistent_mv:
        probs.append(INCONSISTENT)
    if settings is None or settings.fix_missing_mv:
        probs.append(MISSING_IN_MV_TABLE)
    return wide.filter(p.isin(*probs) if probs else F.lit(False))


def plan_upserts(
    wide: DataFrame,
    spec: MVSpec,
    settings: SyncSettings | None = None,
    respect_flags: bool = False,
) -> DataFrame:
    """Column-granular upsert plan.

    Input: the wide classified DataFrame from ``classify``.  Output: one row
    per (MV key, changed MV non-PK column):

        <mv_pk…>, column, column_type, value (rendered string),
        writetime (long|null), ttl (int|null), flavor

    Iterates ALL MV non-PK columns (DBOperations.java:245-249 uses
    ``mvNonPrimaryKeyColumns``, not just common ones); values come from the
    base row (absent-in-base columns bind null).  ``writetime`` is omitted
    under ``mutation.uselatestts`` (DBOperations.java:252-261); TTL is
    always carried when present (:263-266); collections have neither
    (MvSync.java:224).  Keys with a null PK column are EXCLUDED — see
    ``plan_upsert_errors``.
    """
    settings = settings or SyncSettings()
    cand = (
        _upsert_candidates(wide, settings)
        if respect_flags
        else wide.filter(F.col("problem").isin(*_UPSERT_PROBLEMS))
    )
    cand = cand.filter(~_pk_has_null(spec))

    cols = cand.columns
    cells = []
    for c, t in sorted(spec.mv.non_pk.items()):
        base_c = _base_or_null(cols, BASE_PREFIX + c)
        is_coll = t in COLLECTION_TYPES
        wt = (
            F.lit(None).cast("long")
            if (settings.use_latest_ts or is_coll)
            else _base_or_null(cols, BASE_PREFIX + writetime_col(c), "long")
        )
        ttl = (
            F.lit(None).cast("int")
            if is_coll
            else _base_or_null(cols, BASE_PREFIX + ttl_col(c), "int")
        )
        flavor = (
            F.when(wt.isNotNull() & ttl.isNotNull(), F.lit(TIMESTAMP_TTL))
            .when(wt.isNotNull(), F.lit(TIMESTAMP))
            .when(ttl.isNotNull(), F.lit(TTL))
            .otherwise(F.lit(NO_TIMESTAMP_TTL))
        )
        cells.append(
            F.when(
                _changed(c, t) if (BASE_PREFIX + c in cols or MV_PREFIX + c in cols) else F.lit(True),
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(t).alias("column_type"),
                    F.when(base_c.isNotNull(), render_value(base_c, t)).alias("value"),
                    wt.alias("writetime"),
                    ttl.alias("ttl"),
                    flavor.alias("flavor"),
                ),
            )
        )

    exploded = cand.select(
        *spec.mv_pk,
        F.explode(F.array_compact(F.array(*cells))).alias("cell"),
    )
    return exploded.select(
        *spec.mv_pk,
        "cell.column",
        "cell.column_type",
        "cell.value",
        "cell.writetime",
        "cell.ttl",
        "cell.flavor",
    )


def plan_upsert_errors(wide: DataFrame, spec: MVSpec) -> DataFrame:
    """Keys whose upsert the reference refuses: null MV-PK column
    (DBOperations.java:296-309) → ERR_UPSERTING report category."""
    return (
        wide.filter(F.col("problem").isin(*_UPSERT_PROBLEMS))
        .filter(_pk_has_null(spec))
        .select(*spec.mv_pk, "problem")
    )


def plan_deletes(
    wide: DataFrame,
    spec: MVSpec,
    current_base_df: DataFrame,
) -> DataFrame:
    """Guarded delete plan for MV orphans.

    MISSING_IN_BASE_TABLE keys, re-verified absent from a *fresh* base
    snapshot via left-anti join on the MV PK — the set-based equivalent of
    the reference's per-row point lookup (isPresentInBaseTable,
    DBOperations.java:196-228).  Output: one row per MV PK to delete.
    """
    orphans = wide.filter(F.col("problem") == MISSING_IN_BASE_TABLE).select(
        *spec.mv_pk
    )
    fresh = current_base_df.select(*spec.mv_pk)
    return orphans.join(fresh, on=spec.mv_pk, how="left_anti")


def plan_not_deleted(
    wide: DataFrame,
    spec: MVSpec,
    current_base_df: DataFrame,
) -> DataFrame:
    """Orphans whose delete is suppressed because the key re-appeared in the
    base snapshot (DBResult.entryPresent → notDelRecords,
    MvSync.java:391-397)."""
    orphans = wide.filter(F.col("problem") == MISSING_IN_BASE_TABLE).select(
        *spec.mv_pk
    )
    fresh = current_base_df.select(*spec.mv_pk)
    return orphans.join(fresh, on=spec.mv_pk, how="left_semi")


def apply_repairs_file_mode(
    base_df: DataFrame,
    mv_df: DataFrame,
    spec: MVSpec,
    settings: SyncSettings | None = None,
    window: tuple[int, int] | None = None,
) -> DataFrame:
    """Deterministic file-mode repair: returns the repaired MV dataset.

    Equivalent of running the reference with all three fix flags honored,
    but as a pure join + per-column ``F.when`` rewrite (FIXTURES.md F5:
    "resulting MV dataset must equal the base table's projection under the
    MV schema for all in-window keys"):

      * CONSISTENT / SKIPPED → MV row unchanged,
      * INCONSISTENT (+fixinconsistentmv) → changed columns replaced by the
        base value, carrying base writetime/ttl companions,
      * MISSING_IN_MV_TABLE (+fixmissingmv) → base row projected onto the
        MV schema inserted,
      * MISSING_IN_BASE_TABLE (+fixorphanmv) → dropped (the guard re-check
        against the same snapshot is vacuously true in file mode).
    """
    settings = settings or SyncSettings()
    fix_inc = settings.fix_inconsistent_mv
    fix_missing = settings.fix_missing_mv
    fix_orphan = settings.fix_orphan_mv

    wide = classify(base_df, mv_df, spec, window=window)
    cols = wide.columns
    p = F.col("problem")
    mv_present = F.coalesce(F.col(MV_PREFIX + "present"), F.lit(False))

    keep = (
        (mv_present & p.isin(CONSISTENT, SKIPPED, INCONSISTENT))
        | ((p == MISSING_IN_MV_TABLE) & F.lit(fix_missing))
        | ((p == MISSING_IN_BASE_TABLE) & F.lit(not fix_orphan) & mv_present)
    )

    out_cols: list[Column] = [F.col(c) for c in spec.mv_pk]
    for c, t in sorted(spec.mv.non_pk.items()):
        take_base = (
            (p == INCONSISTENT) & F.lit(fix_inc) & _changed(c, t)
        ) | ((p == MISSING_IN_MV_TABLE) & F.lit(fix_missing))
        base_c = _base_or_null(cols, BASE_PREFIX + c)
        mv_c = _base_or_null(cols, MV_PREFIX + c)
        out_cols.append(F.when(take_base, base_c).otherwise(mv_c).alias(c))
        if t not in COLLECTION_TYPES:
            for suffix_fn, cast in ((writetime_col, "long"), (ttl_col, "int")):
                b = _base_or_null(cols, BASE_PREFIX + suffix_fn(c), cast)
                m = _base_or_null(cols, MV_PREFIX + suffix_fn(c), cast)
                out_cols.append(F.when(take_base, b).otherwise(m).alias(suffix_fn(c)))

    return wide.filter(keep).select(*out_cols)


def compact_repair_log(
    cells: DataFrame,
    key_cols: list[str],
    column_col: str = "column",
) -> DataFrame:
    """Compact a durable repair-cell log: keep the WINNING cell per
    (MV key, column) — the step a long-running incremental repair needs
    before applying, once restarts/retries and superseding snapshots have
    appended multiple cells for the same target.

    The winner is the max by (writetime, value, flavor, ttl,
    column_type), each field preceded by a not-null flag so nulls lose
    deterministically and ties are only possible between identical
    payloads — replays of the same cell collapse without ambiguity,
    later-writetime cells supersede earlier ones (exactly Cassandra's
    own last-write-wins cell semantics, applied to the log).  Output
    adds ``n_superseded``: how many older cells the winner shadowed.

    Scale shape: one map-side-combinable ``max_by(struct)`` aggregate on
    (key, column) — never a window sort; groups are per-cell-target and
    tiny by construction, so there is no skew surface.
    """
    def flagged(c: str, null_sub) -> list[Column]:
        return [
            F.col(c).isNotNull().alias(f"{c}_nn"),
            F.coalesce(F.col(c), F.lit(null_sub)).alias(f"{c}_v"),
        ]

    comp = F.struct(
        *flagged("writetime", -(2 ** 62)),
        *flagged("value", ""),
        *flagged("flavor", ""),
        *flagged("ttl", -1),
        *flagged("column_type", ""),
    )
    payload = F.struct("column_type", "value", "writetime", "ttl", "flavor")
    out = cells.groupBy(*key_cols, column_col).agg(
        F.max_by(payload, comp).alias("__w"),
        F.count(F.lit(1)).alias("__n"),
    )
    return out.select(
        *key_cols,
        column_col,
        "__w.*",
        (F.col("__n") - 1).cast("long").alias("n_superseded"),
    )
