"""Golden-output tests for the report surface (O16/O17).

Ported from the reference's flagship e2e assertions:
- record block golden: MvSyncTest.java:1138-1145 (``Problem:/RowKey:/
  MainTableEntry:/MVTableEntry:`` + optional ``BaseColumn:/MvColumn:``),
  format defined by MVInconsistentRow.java:32-53;
- RowKey format ``name:TYPE:value,…``: RecordPrimaryKey.java:63-76;
- cell format ``name:TYPE[:value]`` (value omitted when null):
  RecordColumnInfo.java:39-47;
- categorized directory layout + ``"="*30`` separators:
  MVJobOutputStreamer.java:28-61, FileStreamer.java:20-34;
- stats.txt single line: JobStats.java:44-76, README.md:73.

Deliberate deviation (SURVEY §7): the reference prints ``CassandraRow``
entries in connector map order, which is nondeterministic; we render
sorted column order and pin OUR canonical form byte-exactly, plus a
parsed-content parity check against the reference's golden string.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import Row, functions as F, types as T

from mvrepair.config import SyncSettings
from mvrepair.operators.reconcile import classify
from mvrepair.report import (
    ERR_DELETING,
    ERR_UPSERTING,
    SEPARATOR,
    format_report,
    format_report_categorized,
    write_reports,
)
from mvrepair.schema import MVSpec, TableSchema

# Schema mirrors MvSyncRDDTest PK_STRING_AND_INTEGER: base PK (pk, ck1,
# ck2), MV PK = base PK + promoted c1 (alphabetical: c1, ck1, ck2, pk).
WT = 1_704_153_600_000_000  # 2024-01-02 writetime (µs), as in the golden
WINDOW = (0, 1_704_153_600_000_000)

_BASE_FIELDS = [
    ("pk", T.StringType()),
    ("ck1", T.StringType()),
    ("ck2", T.IntegerType()),
    ("c1", T.IntegerType()),
    ("c2", T.IntegerType()),
    ("c3", T.IntegerType()),
    ("c2__writetime", T.LongType()),
    ("c2__ttl", T.IntegerType()),
    ("c3__writetime", T.LongType()),
    ("c3__ttl", T.IntegerType()),
]


def _spec() -> MVSpec:
    cols = {
        "pk": "ASCII",
        "ck1": "ASCII",
        "ck2": "INT",
        "c1": "INT",
        "c2": "INT",
        "c3": "INT",
    }
    return MVSpec(
        base=TableSchema(pk=["pk", "ck1", "ck2"], columns=dict(cols)),
        mv=TableSchema(pk=["c1", "ck1", "ck2", "pk"], columns=dict(cols)),
    )


def _df(spark, rows):
    schema = T.StructType([T.StructField(n, t) for n, t in _BASE_FIELDS])
    return spark.createDataFrame(rows, schema)


def _row(pk, ck1, ck2, c1, c2, c3, wt=WT, ttl=None):
    return (pk, ck1, ck2, c1, c2, c3, wt, ttl, wt, ttl)


@pytest.fixture(scope="module")
def golden_frames(spark):
    # key A: consistent; key B: MV-only (orphan); key C: c2 mismatch.
    base = _df(
        spark,
        [
            _row("Driver1", "NY", 2021, 10, 20, 30),
            _row("Driver3", "SF", 2022, 12, 25, 35),
        ],
    )
    mv = _df(
        spark,
        [
            _row("Driver1", "NY", 2021, 10, 20, 30),
            _row("Driver2", "NY", 2021, 11, 22, 33),
            _row("Driver3", "SF", 2022, 12, 99, 35),
        ],
    )
    return base, mv


def _records(spark, golden_frames, spec=None):
    base, mv = golden_frames
    spec = spec or _spec()
    wide = classify(base, mv, spec, window=WINDOW)
    out = format_report(wide, spec).collect()
    return {r["record"].split("\n")[1]: r for r in out}  # keyed by RowKey line


def test_golden_missing_in_base_table_record(spark, golden_frames):
    """MvSyncTest.java:1138-1145 parity (sorted CassandraRow order)."""
    recs = _records(spark, golden_frames)
    rec = recs["RowKey: c1:INT:11,ck1:ASCII:NY,ck2:INT:2021,pk:ASCII:Driver2"]
    assert rec["problem"] == "MISSING_IN_BASE_TABLE"
    assert rec["record"] == (
        "Problem: MISSING_IN_BASE_TABLE\n"
        "RowKey: c1:INT:11,ck1:ASCII:NY,ck2:INT:2021,pk:ASCII:Driver2\n"
        "MainTableEntry: null\n"
        "MVTableEntry: CassandraRow{c1: 11, c2: 22, writetime(c2): "
        "1704153600000000, ttl(c2): null, c3: 33, writetime(c3): "
        "1704153600000000, ttl(c3): null, ck1: NY, ck2: 2021, pk: Driver2}"
    )


def test_golden_content_parity_with_reference_string(spark, golden_frames):
    """Parsed-content parity with the reference's exact golden
    (MvSyncTest.java:1139-1143): same entry set, different (sorted) order."""
    reference_golden = (
        "CassandraRow{c3: 33, c2: 22, writetime(c2): 1704153600000000, "
        "c1: 11, ttl(c2): null, pk: Driver2, ck2: 2021, ttl(c3): null, "
        "ck1: NY, writetime(c3): 1704153600000000}"
    )
    recs = _records(spark, golden_frames)
    rec = recs["RowKey: c1:INT:11,ck1:ASCII:NY,ck2:INT:2021,pk:ASCII:Driver2"]
    ours = rec["record"].split("MVTableEntry: ")[1].split("\n")[0]

    def entries(s: str) -> set[str]:
        return set(re.findall(r"[\w()]+: [^,}]+", s))

    assert entries(ours) == entries(reference_golden)


def test_golden_inconsistent_record_with_diff_cells(spark, golden_frames):
    """BaseColumn/MvColumn cells: ``name:TYPE:value``
    (RecordColumnInfo.java:39-47; MVInconsistentRow.java:45-51)."""
    recs = _records(spark, golden_frames)
    rec = recs["RowKey: c1:INT:12,ck1:ASCII:SF,ck2:INT:2022,pk:ASCII:Driver3"]
    assert rec["problem"] == "INCONSISTENT"
    lines = rec["record"].split("\n")
    assert lines[0] == "Problem: INCONSISTENT"
    assert lines[2].startswith("MainTableEntry: CassandraRow{")
    assert lines[3].startswith("MVTableEntry: CassandraRow{")
    assert lines[4] == "BaseColumn: c2:INT:25"
    assert lines[5] == "MvColumn: c2:INT:99"
    assert "c2: 25" in lines[2] and "c2: 99" in lines[3]


def test_null_value_diff_cell_omits_value(spark):
    """A null side renders ``name:TYPE`` with no value suffix
    (RecordColumnInfo.java:39-47: value omitted when null)."""
    spec = _spec()
    base = _df(spark, [_row("D", "NY", 1, 1, None, 3)])
    mv = _df(spark, [_row("D", "NY", 1, 1, 7, 3)])
    wide = classify(base, mv, spec, window=WINDOW)
    rec = format_report(wide, spec).collect()[0]["record"]
    assert "\nBaseColumn: c2:INT\n" in rec + "\n"
    assert rec.endswith("MvColumn: c2:INT:7")


def test_consistent_and_skipped_emit_nothing(spark, golden_frames):
    """MvSync.java:374-378: CONSISTENT produces no report output; and an
    out-of-window row on either side skips the whole key."""
    base, mv = golden_frames
    spec = _spec()
    recs = format_report(classify(base, mv, spec, window=WINDOW), spec).collect()
    assert len(recs) == 2  # Driver1 consistent → absent
    # shrink the window so every key is SKIPPED → nothing at all
    recs = format_report(classify(base, mv, spec, window=(0, 1)), spec).collect()
    assert recs == []


def test_categorized_err_upserting_routing(spark, golden_frames):
    """MVJobOutputStreamer.java:64-101 parity: a failing upsert row goes to
    its problem category AND to ERR_UPSERTING with the error appended.
    The default error is the reference's null-PK refusal
    (DBOperations.java:296-309) — a base-only row whose promoted MV-PK
    column (c1) is null."""
    spec = _spec()
    base = _df(
        spark,
        [
            _row("Driver1", "NY", 2021, 10, 20, 30),
            _row("DriverX", "LA", 2030, None, 5, 6),  # null promoted PK
        ],
    )
    mv = _df(spark, [_row("Driver1", "NY", 2021, 10, 20, 30)])
    settings = SyncSettings({"cass.mv.fixmissingmv": "true"})
    wide = classify(base, mv, spec, window=WINDOW)
    out = format_report_categorized(wide, spec, settings).collect()
    by_cat = {}
    for r in out:
        by_cat.setdefault(r["category"], []).append(r["record"])
    assert set(by_cat) == {"MISSING_IN_MV_TABLE", ERR_UPSERTING}
    (err_rec,) = by_cat[ERR_UPSERTING]
    assert err_rec.endswith("Primary key column c1 is null")
    # the same key also reported under its problem category, sans error
    (prob_rec,) = by_cat["MISSING_IN_MV_TABLE"]
    assert prob_rec == err_rec.rsplit("\n", 1)[0]


def test_categorized_delete_err_routing(spark, golden_frames):
    """ERR_DELETING routing with a caller-supplied error expression."""
    base, mv = golden_frames
    spec = _spec()
    wide = classify(base, mv, spec, window=WINDOW)
    delete_err = F.when(
        F.col("problem") == "MISSING_IN_BASE_TABLE", F.lit("boom")
    )
    out = format_report_categorized(wide, spec, delete_err=delete_err).collect()
    cats = {r["category"] for r in out}
    assert ERR_DELETING in cats
    err = [r for r in out if r["category"] == ERR_DELETING]
    assert len(err) == 1 and err[0]["record"].endswith("\nboom")


def test_write_reports_layout_and_separator(spark, golden_frames, tmp_path):
    """O16 sink shape: one directory per category, records separated by
    ``"="*30`` (MVJobOutputStreamer.java:28-61; FileStreamer.java:20-34)."""
    base, mv = golden_frames
    spec = _spec()
    wide = classify(base, mv, spec, window=WINDOW)
    outdir = str(tmp_path / "reports")
    write_reports(wide, spec, outdir)
    cats = {
        d.split("=", 1)[1] for d in os.listdir(outdir) if d.startswith("category=")
    }
    assert cats == {"MISSING_IN_BASE_TABLE", "INCONSISTENT"}
    for cat in cats:
        txt = "".join(
            open(os.path.join(outdir, f"category={cat}", f)).read()
            for f in sorted(os.listdir(os.path.join(outdir, f"category={cat}")))
            if f.startswith("part-")
        )
        # every record block closed by the separator line
        blocks = [b for b in txt.split(SEPARATOR + "\n") if b.strip()]
        assert all(b.startswith(f"Problem: {cat}\n") for b in blocks)
        assert txt.rstrip("\n").endswith(SEPARATOR)
