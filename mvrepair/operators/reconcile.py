"""Core reconciliation operator: base table vs materialized view.

Re-expresses the reference's hand-built RDD pipeline
(/root/reference/src/main/java/mvsync/MvSync.java:268-427) as one lazy
Catalyst plan:

    window flags (O7) → dedup-first (O8 fine print) → full-outer join on the
    MV primary key (O8) → existence classification (O9/O11) → alphabetical
    first-mismatch column diff (O10) → counters (O12).

Everything is built from `pyspark.sql.functions` expressions — no UDFs, no
RDDs — so the whole compare stays inside WholeStageCodegen and Catalyst is
free to pick broadcast/SMJ strategies and AQE skew handling at 100 TB scale.

Semantic parity notes (the "fine print" of SURVEY §2):
- Join key = MV primary key for both sides (MvSync.java:129, :138-139).
  Cassandra PKs are non-null, so a plain using-columns equi-join matches the
  reference's ``RecordPrimaryKey`` cogroup semantics.
- Window (shouldSkip, MvSync.java:430-450): least/most writetime over
  COMMON non-collection non-PK columns whose VALUE is non-null
  (getTheLeastAndMostModificationTimeInMicroSeconds, :452-479); µs→sec by
  truncating conversion (:434-443); skip when ``start > least || most > end``.
  A row with no eligible writetimes is never skipped (Long.MAX/MIN
  sentinels).  A skipped row on EITHER side skips the whole key
  (:325-347) — so the flag is computed per side but applied post-join.
- Duplicate keys: only the first row per side is considered (:325-338);
  mirrored with dropDuplicates on the PK (order nondeterministic in the
  reference too).
- First mismatch: alphabetical column order (TreeMap), null==null equal,
  null vs value unequal (getInconsistentTuple, :482-510).
- CONSISTENT keys produce no report output, only counters (:374-378).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from mvrepair.config import SyncSettings
from mvrepair.functions import deep_eq, render_value
from mvrepair.schema import (
    COLLECTION_TYPES,
    MVSpec,
    TableSchema,
    ttl_col,
    writetime_col,
)

# MVConsistencyState.java:3-8 (+ the implicit skipped state of shouldSkip)
CONSISTENT = "CONSISTENT"
MISSING_IN_BASE_TABLE = "MISSING_IN_BASE_TABLE"
MISSING_IN_MV_TABLE = "MISSING_IN_MV_TABLE"
INCONSISTENT = "INCONSISTENT"
SKIPPED = "SKIPPED"

BASE_PREFIX = "base__"
MV_PREFIX = "mv__"

_PRESENT = "present"
_IN_WINDOW = "in_window"


def _least(cols: list[Column]) -> Column:
    if not cols:
        return F.lit(None).cast("long")
    if len(cols) == 1:
        return cols[0]
    return F.least(*cols)


def _greatest(cols: list[Column]) -> Column:
    if not cols:
        return F.lit(None).cast("long")
    if len(cols) == 1:
        return cols[0]
    return F.greatest(*cols)


def _in_window_expr(
    df: DataFrame, spec: MVSpec, window: tuple[int, int] | None
) -> Column:
    """Per-row in-window flag (negation of shouldSkip, MvSync.java:430-450).

    Only writetimes of common, non-collection columns whose value is
    non-null participate (MvSync.java:452-479).  Comparison happens in
    SECONDS after a truncating µs→sec cast (:434-443).
    """
    if window is None:
        return F.lit(True)
    start_us, end_us = window
    start_sec = start_us // 1_000_000
    end_sec = end_us // 1_000_000
    terms = [
        F.when(F.col(c).isNotNull(), F.col(writetime_col(c)))
        for c, t in spec.compare_columns
        if t not in COLLECTION_TYPES and writetime_col(c) in df.columns
    ]
    # (long) cast in Java truncates toward zero — mirror exactly.
    least_sec = (_least(terms).cast("double") / 1_000_000.0).cast("long")
    most_sec = (_greatest(terms).cast("double") / 1_000_000.0).cast("long")
    skip = (F.lit(start_sec) > least_sec) | (most_sec > F.lit(end_sec))
    # no eligible writetime → sentinel MAX/MIN in the reference → never skipped
    return ~F.coalesce(skip, F.lit(False))


def _prepare_side(
    df: DataFrame,
    spec: MVSpec,
    prefix: str,
    window: tuple[int, int] | None,
    dedup_first: bool,
) -> DataFrame:
    pk = spec.mv_pk
    others = [c for c in df.columns if c not in pk]
    out = df.select(
        *pk,
        *[F.col(c).alias(prefix + c) for c in others],
        _in_window_expr(df, spec, window).alias(prefix + _IN_WINDOW),
        F.lit(True).alias(prefix + _PRESENT),
    )
    if dedup_first:
        # O8 fine print: only the first row per key per side is considered
        # (MvSync.java:325-338); which one is nondeterministic there too.
        out = out.dropDuplicates(pk)
    return out


def _diff_exprs(spec: MVSpec) -> tuple[Column, Column, Column, Column]:
    """First-mismatch (alphabetical) column name/type + rendered values.

    getInconsistentTuple parity (MvSync.java:482-510): null==null equal,
    null vs value is a mismatch whose null side renders as null.
    """
    names, types, base_vals, mv_vals = [], [], [], []
    for c, t in spec.compare_columns:
        neq = ~deep_eq(F.col(BASE_PREFIX + c), F.col(MV_PREFIX + c), t)
        names.append(F.when(neq, F.lit(c)))
        types.append(F.when(neq, F.lit(t)))
        base_vals.append(
            F.when(
                neq,
                F.when(
                    F.col(BASE_PREFIX + c).isNotNull(),
                    render_value(F.col(BASE_PREFIX + c), t),
                ),
            )
        )
        mv_vals.append(
            F.when(
                neq,
                F.when(
                    F.col(MV_PREFIX + c).isNotNull(),
                    render_value(F.col(MV_PREFIX + c), t),
                ),
            )
        )
    if not names:
        null_s = F.lit(None).cast("string")
        return null_s, null_s, null_s, null_s
    return (
        F.coalesce(*names) if len(names) > 1 else names[0],
        F.coalesce(*types) if len(types) > 1 else types[0],
        F.coalesce(*base_vals) if len(base_vals) > 1 else base_vals[0],
        F.coalesce(*mv_vals) if len(mv_vals) > 1 else mv_vals[0],
    )


def classify(
    base_df: DataFrame,
    mv_df: DataFrame,
    spec: MVSpec,
    window: tuple[int, int] | None = None,
    dedup_first: bool = True,
) -> DataFrame:
    """Full-outer reconcile → wide classified DataFrame.

    Returns one row per distinct MV-PK with columns:
      * the MV PK columns (coalesced across sides by the using-join),
      * every non-key input column prefixed ``base__`` / ``mv__``
        (including ``__writetime``/``__ttl`` companions),
      * ``problem`` ∈ {CONSISTENT, MISSING_IN_BASE_TABLE,
        MISSING_IN_MV_TABLE, INCONSISTENT, SKIPPED},
      * ``diff_column``/``diff_type``/``base_value``/``mv_value`` — the
        first (alphabetical) mismatching common column, rendered
        convertToString-style; null unless INCONSISTENT.

    ``window`` is ``(start_us, end_us)`` inclusive reference semantics;
    ``None`` disables windowing (native mode).
    """
    base_p = _prepare_side(base_df, spec, BASE_PREFIX, window, dedup_first)
    mv_p = _prepare_side(mv_df, spec, MV_PREFIX, window, dedup_first)

    joined = base_p.join(mv_p, on=spec.mv_pk, how="full_outer")

    base_present = F.coalesce(F.col(BASE_PREFIX + _PRESENT), F.lit(False))
    mv_present = F.coalesce(F.col(MV_PREFIX + _PRESENT), F.lit(False))
    # skip-either-side (MvSync.java:325-347): an out-of-window row on either
    # present side skips the whole key.
    skipped = (base_present & ~F.col(BASE_PREFIX + _IN_WINDOW)) | (
        mv_present & ~F.col(MV_PREFIX + _IN_WINDOW)
    )
    skipped = F.coalesce(skipped, F.lit(False))

    diff_name, diff_type, base_val, mv_val = _diff_exprs(spec)
    both = base_present & mv_present

    problem = (
        F.when(skipped, F.lit(SKIPPED))
        .when(~base_present, F.lit(MISSING_IN_BASE_TABLE))
        .when(~mv_present, F.lit(MISSING_IN_MV_TABLE))
        .when(diff_name.isNotNull(), F.lit(INCONSISTENT))
        .otherwise(F.lit(CONSISTENT))
    )

    return joined.withColumns(
        {
            "problem": problem,
            "diff_column": F.when(~skipped & both, diff_name),
            "diff_type": F.when(~skipped & both, diff_type),
            "base_value": F.when(~skipped & both, base_val),
            "mv_value": F.when(~skipped & both, mv_val),
        }
    )


def reconcile_report(
    base_df: DataFrame,
    mv_df: DataFrame,
    spec: MVSpec,
    window: tuple[int, int] | None = None,
) -> DataFrame:
    """Report projection: only problem keys (CONSISTENT and SKIPPED rows
    produce no report output — MvSync.java:374-378), with the PK, the
    classification, and the first-mismatch diff cell."""
    wide = classify(base_df, mv_df, spec, window)
    return wide.filter(
        ~F.col("problem").isin(CONSISTENT, SKIPPED)
    ).select(
        *spec.mv_pk,
        "problem",
        "diff_column",
        "diff_type",
        "base_value",
        "mv_value",
    )


@dataclass
class JobStatsResult:
    counters: dict[str, int]

    # JobStats.toString parity (JobStats.java:44-76; golden in README.md:73)
    def render(self) -> str:
        c = self.counters
        return (
            f"totRecords: {c['totRecords']}"
            f", skippedRecords: {c['skippedRecords']}"
            f", consistentRecords: {c['consistentRecords']}"
            f", inConsistentRecords: {c['inConsistentRecords']}"
            f", missingBaseTableRecords: {c['missingBaseTableRecords']}"
            f", missingMvRecords: {c['missingMvRecords']}"
            f", repairRecords: {c['repairRecords']}"
            f", notRepairRecords: {c['notRepairRecords']}"
            f", delAttemptedRecords: {c['delAttemptedRecords']}"
            f", delErrRecords: {c['delErrRecords']}"
            f", delSuccessRecords: {c['delSuccessRecords']}"
            f", notDelRecords: {c['notDelRecords']}"
            f", upsertAttemptedRecords: {c['upsertAttemptedRecords']}"
            f", upsertErrRecords: {c['upsertErrRecords']}"
            f", upsertSuccessRecords: {c['upsertSuccessRecords']}"
        )


def stats_agg_exprs(
    settings: SyncSettings | None = None,
    upsert_err: Column | None = None,
    delete_err: Column | None = None,
) -> list[Column]:
    """Aggregate expressions computing the 15 JobStats counters from a
    classified wide DataFrame in ONE pass (increments mirrored from
    MvSync.java:315, :350-378, :384-412).

    ``upsert_err`` / ``delete_err`` are per-row error-message expressions
    (null = the mutation would succeed) — pass the same expressions given
    to ``format_report_categorized`` so err/success counters agree with the
    ERR_* report categories (MvSync.java:399-412 counts err vs success off
    the mutation result the same way).  When omitted, the success path is
    assumed; error counts then come from the repair applier when one runs.
    """
    settings = settings or SyncSettings()
    p = F.col("problem")

    def cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    fix_orphan = settings.fix_orphan_mv
    fix_inc = settings.fix_inconsistent_mv
    fix_missing = settings.fix_missing_mv

    repairable = (
        ((p == MISSING_IN_BASE_TABLE) & F.lit(fix_orphan))
        | ((p == INCONSISTENT) & F.lit(fix_inc))
        | ((p == MISSING_IN_MV_TABLE) & F.lit(fix_missing))
    )
    not_repaired = p.isin(MISSING_IN_BASE_TABLE, INCONSISTENT, MISSING_IN_MV_TABLE) & ~repairable
    del_attempted = (p == MISSING_IN_BASE_TABLE) & F.lit(fix_orphan)
    upsert_attempted = ((p == INCONSISTENT) & F.lit(fix_inc)) | (
        (p == MISSING_IN_MV_TABLE) & F.lit(fix_missing)
    )
    del_err = (
        F.lit(False) if delete_err is None else del_attempted & delete_err.isNotNull()
    )
    ups_err = (
        F.lit(False) if upsert_err is None else upsert_attempted & upsert_err.isNotNull()
    )

    return [
        F.count(F.lit(1)).alias("totRecords"),
        cnt(p == SKIPPED).alias("skippedRecords"),
        cnt(p == CONSISTENT).alias("consistentRecords"),
        cnt(p == INCONSISTENT).alias("inConsistentRecords"),
        cnt(p == MISSING_IN_BASE_TABLE).alias("missingBaseTableRecords"),
        cnt(p == MISSING_IN_MV_TABLE).alias("missingMvRecords"),
        cnt(repairable).alias("repairRecords"),
        cnt(not_repaired).alias("notRepairRecords"),
        cnt(del_attempted).alias("delAttemptedRecords"),
        cnt(del_err).alias("delErrRecords"),
        cnt(del_attempted & ~del_err).alias("delSuccessRecords"),
        F.lit(0).cast("long").alias("notDelRecords"),
        cnt(upsert_attempted).alias("upsertAttemptedRecords"),
        cnt(ups_err).alias("upsertErrRecords"),
        cnt(upsert_attempted & ~ups_err).alias("upsertSuccessRecords"),
    ]


def read_rows_exprs() -> list[Column]:
    """ReadRows parity aggregate (rides the same one action via a second
    ``observe``): the reference bumps readRows once per scanned row on EACH
    side pre-join (MvSync.java:250); post-join, a key contributes one read
    per present side, so the per-side present sums reproduce the pre-join
    scan count (modulo dropped duplicate keys — the one residual
    approximation, documented in metrics.py).  Kept out of
    ``stats_agg_exprs`` so the 15-counter JobStats contract (and the
    ``mv_stats`` oracle schema) stays exact."""
    base_present = F.coalesce(F.col(BASE_PREFIX + _PRESENT), F.lit(False))
    mv_present = F.coalesce(F.col(MV_PREFIX + _PRESENT), F.lit(False))

    def cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return [(cnt(base_present) + cnt(mv_present)).alias("readRows")]


def job_stats(
    wide: DataFrame, settings: SyncSettings | None = None
) -> JobStatsResult:
    """Collect the 15-counter stats for a classified DataFrame (single job)."""
    row = wide.agg(*stats_agg_exprs(settings)).first()
    return JobStatsResult(counters=row.asDict())


def stats_df(wide: DataFrame, settings: SyncSettings | None = None) -> DataFrame:
    """Same counters as a one-row DataFrame (for sinks / oracle checks)."""
    return wide.agg(*stats_agg_exprs(settings))
