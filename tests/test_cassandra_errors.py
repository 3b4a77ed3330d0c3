"""Live-repair failure surface: CQL executor errors → ERR_* categories.

Parity target: the reference catches per-mutation CQL failures and streams
the failed record + exception into ERR_DELETING / ERR_UPSERTING
(DBOperations.java:58-94 delete catch, :240-387 upsert catch;
MVJobOutputStreamer.java:43-48, :64-101), bumping delErrRecords /
upsertErrRecords (MvSync.java:384-412).  Batch-side,
``apply_repairs_cassandra`` returns per-key error frames (the
``session_factory`` seam replaces the live driver, mirroring the
reference's mocked ``CqlSession`` tests, MvSyncTest.java:1508-1708), and
``runner.run`` routes them into the categorized report + stats counters.
"""

from __future__ import annotations

import os

import pytest

from mvrepair.report import SEPARATOR
from mvrepair.runner import run
from mvrepair.sources.cassandra import apply_repairs_cassandra

from tests.test_runner import WT, _settings, _spec, e2e_frames  # noqa: F401


def _flaky_factory():
    """Session-double factory.  The classes are defined in FUNCTION scope
    so cloudpickle serializes them by value — the tests module isn't
    importable from Spark's Python workers."""

    class FakeStatement:
        def __init__(self, cql: str):
            self.cql = cql

        def bind(self, values):
            return (self.cql, list(values))

    class FlakySession:
        """DELETE fails for pk='B', upsert of column c2 fails for pk='C';
        everything else succeeds."""

        def prepare(self, cql: str) -> FakeStatement:
            return FakeStatement(cql)

        def execute(self, bound):
            cql, values = bound
            if cql.startswith("DELETE") and "B" in values:
                raise RuntimeError("WriteTimeout during DELETE")
            if "c2)" in cql and "C" in values:
                raise RuntimeError("Unavailable during INSERT")

    return FlakySession


def _read_category(outdir: str, category: str) -> list[str]:
    cat_dir = os.path.join(outdir, category)
    txt = "".join(
        open(os.path.join(cat_dir, f)).read()
        for f in sorted(os.listdir(cat_dir))
        if f.startswith("part-")
    )
    return [b for b in txt.split(SEPARATOR + "\n") if b.strip()]


def test_apply_repairs_returns_per_key_error_frames(spark, e2e_frames, tmp_path):
    from mvrepair.operators.reconcile import classify
    from mvrepair.operators.repair import plan_deletes, plan_upserts

    base, mv = e2e_frames
    spec = _spec()
    settings = _settings(str(tmp_path / "unused"))
    wide = classify(base, mv, spec, window=(0, WT))
    upserts = plan_upserts(wide, spec, settings, respect_flags=True)
    deletes = plan_deletes(wide, spec, base)

    uerr, derr = apply_repairs_cassandra(
        upserts, deletes, spec, settings, session_factory=_flaky_factory()
    )
    try:
        d = derr.collect()
        assert len(d) == 1
        assert d[0]["pk"] == "B" and "WriteTimeout" in d[0]["error"]
        assert set(derr.columns) == {"c1", "ck1", "ck2", "pk", "error"}

        u = uerr.collect()
        assert len(u) == 1
        assert u[0]["pk"] == "C"
        # reference message prefix (DBOperations.java:90) + column context
        assert u[0]["error"].startswith("Error upserting data:")
        assert "[column c2]" in u[0]["error"]
        assert "Unavailable" in u[0]["error"]
        assert d[0]["error"].startswith("Error deleting data:")
    finally:
        # checkpointed frames — unpersist is a no-op; references dropped
        # on return (see apply_repairs_cassandra docstring)
        pass


def test_run_routes_live_errors_into_err_categories(spark, e2e_frames, tmp_path):
    base, mv = e2e_frames
    spec = _spec()
    outdir = str(tmp_path / "out")
    settings = _settings(outdir)

    def applier(upserts, deletes):
        return apply_repairs_cassandra(
            upserts, deletes, spec, settings, session_factory=_flaky_factory()
        )

    stats = run(
        spark,
        settings,
        base_df=base,
        mv_df=mv,
        spec=spec,
        repair_applier=applier,
    )

    # the failed DELETE for B lands in ERR_DELETING/part-*.txt
    del_blocks = _read_category(outdir, "ERR_DELETING")
    assert len(del_blocks) == 1
    assert "pk:ASCII:B" in del_blocks[0]
    assert "WriteTimeout during DELETE" in del_blocks[0]
    assert "Problem: MISSING_IN_BASE_TABLE" in del_blocks[0]

    # ERR_UPSERTING now holds BOTH the static null-PK refusal (X) and the
    # live CQL failure (C) — the append write merged, not clobbered
    ups_blocks = _read_category(outdir, "ERR_UPSERTING")
    assert len(ups_blocks) == 2
    joined = "\n".join(ups_blocks)
    assert "Primary key column c1 is null" in joined
    assert "Unavailable during INSERT" in joined

    # counters: live failures fold into delErr/upsertErr and come off the
    # success counts (MvSync.java:384-412 increment parity)
    c = stats.counters
    assert c["delAttemptedRecords"] == 1 and c["delErrRecords"] == 1
    assert c["delSuccessRecords"] == 0
    assert c["upsertAttemptedRecords"] == 3 and c["upsertErrRecords"] == 2
    assert c["upsertSuccessRecords"] == 1


def test_run_with_none_returning_applier_unchanged(spark, e2e_frames, tmp_path):
    """A recorder applier returning None keeps the pre-existing behavior:
    no ERR_DELETING dir, counters untouched."""
    base, mv = e2e_frames
    outdir = str(tmp_path / "out")
    seen = {}

    def applier(upserts, deletes):
        seen["n_upserts"] = upserts.count()
        seen["n_deletes"] = deletes.count()

    stats = run(
        spark,
        _settings(outdir),
        base_df=base,
        mv_df=mv,
        spec=_spec(),
        repair_applier=applier,
    )
    assert seen["n_deletes"] == 1 and seen["n_upserts"] >= 1
    assert not os.path.isdir(os.path.join(outdir, "ERR_DELETING"))
    assert stats.counters["delErrRecords"] == 0


def _type_checking_factory():
    """Session double that REJECTS float binds — catches the Arrow→pandas
    nullable-long→float64 coercion that would make the real driver's
    int64 pack fail on writetime/ttl binds."""

    class FakeStatement:
        def __init__(self, cql):
            self.cql = cql

        def bind(self, values):
            return (self.cql, list(values))

    class TypeCheckingSession:
        def prepare(self, cql):
            return FakeStatement(cql)

        def execute(self, bound):
            cql, values = bound
            for v in values:
                if isinstance(v, float):
                    raise TypeError(f"float bind {v!r} in {cql}")

    return TypeCheckingSession


def test_upsert_binds_stay_integral_in_mixed_flavor_batches(spark):
    """A batch mixing NO_TIMESTAMP_TTL and TIMESTAMP rows makes the
    writetime column nullable → pandas float64; the executor must bind
    exact ints anyway (no error rows from the type-checking session)."""
    from pyspark.sql import types as T

    from mvrepair.config import SyncSettings
    from mvrepair.schema import MVSpec, TableSchema

    spec = MVSpec(
        base=TableSchema(pk=["pk"], columns={"pk": "ASCII", "c1": "INT"}),
        mv=TableSchema(pk=["pk"], columns={"pk": "ASCII", "c1": "INT"}),
    )
    schema = T.StructType(
        [
            T.StructField("pk", T.StringType()),
            T.StructField("column", T.StringType()),
            T.StructField("column_type", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("writetime", T.LongType()),
            T.StructField("ttl", T.IntegerType()),
            T.StructField("flavor", T.StringType()),
        ]
    )
    upserts = spark.createDataFrame(
        [
            ("A", "c1", "INT", "1", None, None, "NO_TIMESTAMP_TTL"),
            ("B", "c1", "INT", "2", 1_704_153_600_000_000, None, "TIMESTAMP"),
            ("C", "c1", "INT", "3", 1_704_153_600_000_000, 60, "TIMESTAMP_TTL"),
        ],
        schema,
    )
    deletes = upserts.select("pk").limit(0)
    uerr, derr = apply_repairs_cassandra(
        upserts, deletes, spec, SyncSettings({}),
        session_factory=_type_checking_factory(),
    )
    try:
        assert uerr.count() == 0 and derr.count() == 0
    finally:
        uerr.unpersist()
        derr.unpersist()


def test_prepare_failure_aborts_instead_of_error_rows(spark, e2e_frames, tmp_path):
    """A failing prepare (bad table / schema drift) is a configuration
    error and must abort the job loudly, not degrade into N per-key
    ERR_* rows."""
    from mvrepair.operators.reconcile import classify
    from mvrepair.operators.repair import plan_deletes, plan_upserts

    def broken_factory():
        class BrokenSession:
            def prepare(self, cql):
                raise RuntimeError("unconfigured table does not exist")

            def execute(self, bound):
                pass

        return BrokenSession

    base, mv = e2e_frames
    spec = _spec()
    settings = _settings(str(tmp_path / "unused"))
    wide = classify(base, mv, spec, window=(0, WT))
    upserts = plan_upserts(wide, spec, settings, respect_flags=True)
    deletes = plan_deletes(wide, spec, base)
    with pytest.raises(Exception, match="unconfigured table does not exist"):
        apply_repairs_cassandra(
            upserts, deletes, spec, settings, session_factory=broken_factory()
        )
