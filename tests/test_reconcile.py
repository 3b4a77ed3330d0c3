"""Scenario tests for the core reconcile operator — FIXTURES.md F1/F2.

Mirrors the reference's e2e scenarios (MvSyncTest.java:1175-1219,
MvSyncRDDTest.TestRDDType): consistent / missing-in-mv / missing-in-base /
mismatch / out-of-window skip / duplicate keys / null semantics, plus the
fewer-columns-MV variant (MvSyncTest.java:1066-1173).
"""

import pytest
from pyspark.sql import Row, functions as F

from mvrepair.config import SyncSettings
from mvrepair.operators.reconcile import (
    CONSISTENT,
    INCONSISTENT,
    MISSING_IN_BASE_TABLE,
    MISSING_IN_MV_TABLE,
    SKIPPED,
    classify,
    job_stats,
    reconcile_report,
)
from mvrepair.schema import MVSpec, TableSchema

# F2 canonical writetime: 2024-01-02 in µs
WT = 1_704_153_600_000_000
IN_WINDOW = (0, 1_704_153_601_000_000)       # endtsinsec=1704153601
OUT_WINDOW = (0, 1_704_067_201_000_000)      # endtsinsec=1704067201 (row out)

BASE_SCHEMA = TableSchema(
    pk=["pk", "ck1", "ck2"],
    columns={
        "pk": "TEXT", "ck1": "TEXT", "ck2": "INT",
        "c1": "INT", "c2": "INT", "c3": "INT", "c4": "INT",
    },
)
MV_SCHEMA = TableSchema(
    pk=["c1", "pk", "ck1", "ck2"],
    columns={
        "c1": "INT", "pk": "TEXT", "ck1": "TEXT", "ck2": "INT",
        "c2": "INT", "c3": "INT", "c4": "INT",
    },
)
SPEC = MVSpec(base=BASE_SCHEMA, mv=MV_SCHEMA)


def base_row(pk="k1", ck1="a", ck2=1, c1=10, c2=20, c3=30, c4=40, wt=WT, ttl=None):
    d = {"pk": pk, "ck1": ck1, "ck2": ck2, "c1": c1, "c2": c2, "c3": c3, "c4": c4}
    for c in ("c1", "c2", "c3", "c4"):
        d[f"{c}__writetime"] = wt
        d[f"{c}__ttl"] = ttl
    return Row(**d)


def mv_row(pk="k1", ck1="a", ck2=1, c1=10, c2=20, c3=30, c4=40, wt=WT, ttl=None):
    d = {"c1": c1, "pk": pk, "ck1": ck1, "ck2": ck2, "c2": c2, "c3": c3, "c4": c4}
    for c in ("c2", "c3", "c4"):
        d[f"{c}__writetime"] = wt
        d[f"{c}__ttl"] = ttl
    return Row(**d)


BASE_DDL = (
    "pk string, ck1 string, ck2 int, c1 int, c2 int, c3 int, c4 int, "
    "c1__writetime long, c1__ttl int, c2__writetime long, c2__ttl int, "
    "c3__writetime long, c3__ttl int, c4__writetime long, c4__ttl int"
)
MV_DDL = (
    "c1 int, pk string, ck1 string, ck2 int, c2 int, c3 int, c4 int, "
    "c2__writetime long, c2__ttl int, c3__writetime long, c3__ttl int, "
    "c4__writetime long, c4__ttl int"
)


def mk(spark, rows, ddl):
    return spark.createDataFrame([r.asDict() for r in rows], schema=ddl)


def problems(df):
    return {
        tuple(r[c] for c in ("c1", "pk", "ck1", "ck2")): r["problem"]
        for r in df.collect()
    }


def test_spec_common_columns():
    assert SPEC.mv_pk == ["c1", "pk", "ck1", "ck2"]
    assert SPEC.compare_names == ["c2", "c3", "c4"]


def test_consistent(spark):
    wide = classify(
        mk(spark, [base_row()], BASE_DDL), mk(spark, [mv_row()], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    assert problems(wide) == {(10, "k1", "a", 1): CONSISTENT}
    # CONSISTENT keys produce no report output (MvSync.java:374-378)
    rep = reconcile_report(
        mk(spark, [base_row()], BASE_DDL), mk(spark, [mv_row()], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    assert rep.count() == 0


def test_missing_in_mv(spark):
    wide = classify(
        mk(spark, [base_row(), base_row(pk="k2", c1=11)], BASE_DDL),
        mk(spark, [mv_row()], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    assert problems(wide)[(11, "k2", "a", 1)] == MISSING_IN_MV_TABLE


def test_missing_in_base(spark):
    wide = classify(
        mk(spark, [base_row()], BASE_DDL),
        mk(spark, [mv_row(), mv_row(pk="k3", c1=12)], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    assert problems(wide)[(12, "k3", "a", 1)] == MISSING_IN_BASE_TABLE


def test_mismatch_first_alphabetical_column(spark):
    # c3 and c4 both differ → first alphabetical (c3) is reported
    wide = classify(
        mk(spark, [base_row(c3=30, c4=40)], BASE_DDL),
        mk(spark, [mv_row(c3=31, c4=41)], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    row = wide.collect()[0]
    assert row["problem"] == INCONSISTENT
    assert row["diff_column"] == "c3"
    assert row["diff_type"] == "INT"
    assert row["base_value"] == "30"
    assert row["mv_value"] == "31"


def test_null_vs_value_is_mismatch(spark):
    wide = classify(
        mk(spark, [base_row(c3=None)], BASE_DDL),
        mk(spark, [mv_row(c3=30)], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    row = wide.collect()[0]
    assert row["problem"] == INCONSISTENT
    assert row["diff_column"] == "c3"
    assert row["base_value"] is None  # null side renders null (MvSync.java:499-509)
    assert row["mv_value"] == "30"


def test_null_vs_null_is_equal(spark):
    wide = classify(
        mk(spark, [base_row(c3=None)], BASE_DDL),
        mk(spark, [mv_row(c3=None)], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    assert list(problems(wide).values()) == [CONSISTENT]


def test_out_of_window_skips_whole_key(spark):
    # base in window, mv row written later → whole key skipped, not INCONSISTENT
    wide = classify(
        mk(spark, [base_row()], BASE_DDL),
        mk(spark, [mv_row(c3=99)], MV_DDL),
        SPEC, window=OUT_WINDOW,
    )
    assert list(problems(wide).values()) == [SKIPPED]


def test_default_window_skips_everything(spark):
    # bug-compatible: starttsinsec=-1/endtsinsec=-1 skips any row with a writetime
    settings = SyncSettings({})
    wide = classify(
        mk(spark, [base_row()], BASE_DDL),
        mk(spark, [mv_row()], MV_DDL),
        SPEC, window=settings.window_micros(),
    )
    assert list(problems(wide).values()) == [SKIPPED]


def test_no_window_native_mode(spark):
    wide = classify(
        mk(spark, [base_row()], BASE_DDL),
        mk(spark, [mv_row()], MV_DDL),
        SPEC, window=None,
    )
    assert list(problems(wide).values()) == [CONSISTENT]


def test_duplicate_keys_first_only(spark):
    # two base rows with the same MV PK → only one considered (O8 fine print)
    wide = classify(
        mk(spark, [base_row(c2=20), base_row(c2=20)], BASE_DDL),
        mk(spark, [mv_row(c2=20)], MV_DDL),
        SPEC, window=IN_WINDOW,
    )
    assert wide.count() == 1


def test_mv_with_fewer_columns_still_consistent(spark):
    # MvSyncTest.java:1066-1173 — MV lacking c4 is consistent if c2/c3 agree
    mv_schema = TableSchema(
        pk=["c1", "pk", "ck1", "ck2"],
        columns={"c1": "INT", "pk": "TEXT", "ck1": "TEXT", "ck2": "INT",
                 "c2": "INT", "c3": "INT"},
    )
    spec = MVSpec(base=BASE_SCHEMA, mv=mv_schema)
    assert spec.compare_names == ["c2", "c3"]
    mv_ddl = (
        "c1 int, pk string, ck1 string, ck2 int, c2 int, c3 int, "
        "c2__writetime long, c2__ttl int, c3__writetime long, c3__ttl int"
    )
    rows = [Row(c1=10, pk="k1", ck1="a", ck2=1, c2=20, c3=30,
                c2__writetime=WT, c2__ttl=None, c3__writetime=WT, c3__ttl=None)]
    wide = classify(
        mk(spark, [base_row(c4=999)], BASE_DDL),
        spark.createDataFrame([r.asDict() for r in rows], schema=mv_ddl),
        spec, window=IN_WINDOW,
    )
    assert [r["problem"] for r in wide.collect()] == [CONSISTENT]


def test_type_mismatch_column_not_compared(spark):
    # common column with different declared type is excluded (MvSync.java:274-285)
    mv_schema = TableSchema(
        pk=["c1", "pk", "ck1", "ck2"],
        columns={"c1": "INT", "pk": "TEXT", "ck1": "TEXT", "ck2": "INT",
                 "c2": "TEXT", "c3": "INT", "c4": "INT"},
    )
    spec = MVSpec(base=BASE_SCHEMA, mv=mv_schema)
    assert spec.compare_names == ["c3", "c4"]


def test_job_stats_counters(spark):
    base = mk(
        spark,
        [
            base_row(pk="a"),                       # consistent
            base_row(pk="b", c1=11),                # missing in mv
            base_row(pk="c", c1=12, c3=1),          # inconsistent
            base_row(pk="e", c1=14, wt=WT * 2),     # out of window -> skipped
        ],
        BASE_DDL,
    )
    mv = mk(
        spark,
        [
            mv_row(pk="a"),
            mv_row(pk="c", c1=12, c3=2),
            mv_row(pk="d", c1=13),                  # missing in base
            mv_row(pk="e", c1=14, wt=WT * 2),
        ],
        MV_DDL,
    )
    wide = classify(base, mv, SPEC, window=IN_WINDOW)
    stats = job_stats(wide, SyncSettings({}))
    c = stats.counters
    assert c["totRecords"] == 5
    assert c["skippedRecords"] == 1
    assert c["consistentRecords"] == 1
    assert c["inConsistentRecords"] == 1
    assert c["missingBaseTableRecords"] == 1
    assert c["missingMvRecords"] == 1
    assert c["repairRecords"] == 0         # all fix flags default false
    assert c["notRepairRecords"] == 3
    assert stats.render().startswith("totRecords: 5, skippedRecords: 1,")


def test_job_stats_with_fix_flags(spark):
    base = mk(spark, [base_row(pk="b", c1=11)], BASE_DDL)
    mv = mk(spark, [mv_row(pk="d", c1=13)], MV_DDL)
    wide = classify(base, mv, SPEC, window=IN_WINDOW)
    settings = SyncSettings(
        {"cass.mv.fixmissingmv": "true", "cass.mv.fixorphanmv": "true"}
    )
    c = job_stats(wide, settings).counters
    assert c["repairRecords"] == 2
    assert c["delAttemptedRecords"] == 1
    assert c["upsertAttemptedRecords"] == 1
    assert c["notRepairRecords"] == 0
