"""Cassandra source/sink: connector scan config + rate-limited repair executor.

Live-cluster counterpart of the parquet fixture harness:

- ``scan_reader``: configures a DataFrame reader for the Spark-Cassandra
  connector (O1, reference ``cassandraTable`` scan MvSync.java:245-246).
  The connector is not bundled here; the method builds the reader and
  fails with a clear error if the format is absent.  Scan throttling maps
  to the connector's ``spark.cassandra.input.readsPerSec`` — the
  declarative equivalent of the reference's per-row Guava limiter (O4,
  MvSync.java:250-255).
- ``TokenBucket``: the mutation-side rate limiter (O4/O14/O15,
  reference 5 rows/s/worker default, MVSyncSettings.java:92-94).  Plain
  deterministic token bucket, unit-tested.
- ``apply_repairs_cassandra``: executor issuing the planned upserts/
  deletes over the DataStax python driver with a per-executor-process
  session singleton and per-partition prepared-statement cache — mirroring
  CassandraClient.java:15-33 and PreparedStatementHelper.java:36-78.
  Runs as ``mapInPandas`` (not ``foreachPartition``) so each failed
  mutation yields a per-key ERROR ROW instead of vanishing into a log:
  the returned (upsert_errors, delete_errors) frames feed the
  ERR_UPSERTING / ERR_DELETING report categories, reproducing the
  reference's live-failure surface (MVJobOutputStreamer.java:43-48,
  DBOperations.java:58-94 catch-and-stream).  Gated behind an import-try:
  absent driver → NotImplementedError (detection/planning never needs it);
  tests inject a ``session_factory``.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from mvrepair.config import SyncSettings


def scan_reader(spark: SparkSession, settings: SyncSettings, table: str):
    """DataFrameReader for a connector scan with consistency + throttle.

    Column pruning/predicate pushdown then flow through Catalyst into the
    connector (the reference builds its SELECT by hand, O2)."""
    return (
        spark.read.format("org.apache.spark.sql.cassandra")
        .option("keyspace", settings.keyspace)
        .option("table", table)
        .option("spark.cassandra.connection.host", settings.cassandra_host)
        .option("spark.cassandra.connection.port", str(settings.cassandra_port))
        .option("spark.cassandra.input.consistency.level", settings.read_consistency)
        .option("spark.cassandra.input.readsPerSec", str(settings.scan_rate_limit))
    )


class TokenBucket:
    """Deterministic token-bucket limiter (Guava RateLimiter stand-in).

    ``rate`` permits/second, burst of 1 second.  ``acquire`` blocks; the
    clock is injectable for tests.
    """

    def __init__(self, rate: float, clock=time.monotonic, sleep=time.sleep):
        if rate <= 0:
            raise ValueError("rate must be positive")
        self.rate = float(rate)
        self.capacity = max(1.0, float(rate))
        self.tokens = self.capacity
        self._clock = clock
        self._sleep = sleep
        self._last = clock()

    def _refill(self) -> None:
        now = self._clock()
        self.tokens = min(self.capacity, self.tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self, permits: int = 1) -> float:
        """Block until ``permits`` tokens are available; returns wait time."""
        waited = 0.0
        while True:
            self._refill()
            if self.tokens >= permits:
                self.tokens -= permits
                return waited
            need = (permits - self.tokens) / self.rate
            self._sleep(need)
            waited += need


# per-executor-process session singleton (CassandraClient.java:15-33 parity)
_SESSION = None


def _get_session(settings: SyncSettings):
    global _SESSION
    if _SESSION is None:
        try:
            from cassandra.cluster import Cluster  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "cassandra-driver is not installed in this environment; "
                "repair execution against a live cluster is unavailable. "
                "Use apply_repairs_file_mode for the fixture harness."
            ) from exc
        cluster = Cluster(
            [settings.cassandra_host], port=settings.cassandra_port
        )
        _SESSION = cluster.connect(settings.keyspace)
    return _SESSION


def _error_schema(plan: DataFrame, mv_pk: list[str]) -> StructType:
    """PK columns (input types preserved) + one ``error`` string."""
    pk_fields = [f for f in plan.schema.fields if f.name in mv_pk]
    return StructType(pk_fields + [StructField("error", StringType(), True)])


def apply_repairs_cassandra(
    upserts: DataFrame,
    deletes: DataFrame,
    spec,
    settings: SyncSettings,
    session_factory: Callable[[], object] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Execute a repair plan against a live cluster (rate-limited) and
    return ``(upsert_errors, delete_errors)`` — per-key failure rows.

    One ``mapInPandas`` pass per plan; per-partition statement cache;
    ``mutation.ratelimiter`` rows/sec per executor.  Statement shapes are
    the reference's 4 upsert flavors (PreparedStatementHelper.java:36-78)
    and the full-PK delete (:94-108).  A mutation that raises is caught
    per row (DBOperations.java:58-94 / :240-387 catch-and-continue parity)
    and emitted as ``(<mv_pk…>, error)``; the error frames are DURABLY
    materialized here via ``localCheckpoint(eager=True)`` so the
    mutations run exactly once no matter how many actions the caller
    later runs on them.  A plain persist+count was NOT enough (round-4
    ADVICE): cache eviction or executor loss would silently recompute
    the ``mapInPandas`` stage — re-executing live CQL, and TTL-flavored
    upserts are not idempotent under replay (the expiry window resets).
    After a local checkpoint recompute is impossible; losing an executor
    fails the downstream action loudly instead (acceptable: the error
    frames are tiny and the job should surface the loss, not re-mutate).
    Error-message text intentionally matches the reference prefixes
    ('Error upserting data:' / 'Error deleting data:',
    DBOperations.java:90,383); unlike the reference's one-block-per-
    failed-mutation stream, downstream reporting aggregates
    sorted-distinct messages per key (documented divergence, see
    ``report.write_error_reports``).  Feed the frames to
    ``report.write_error_reports`` for the ERR_DELETING / ERR_UPSERTING
    categories (MVJobOutputStreamer.java:43-48).

    ``session_factory`` is the test seam (a per-executor callable
    returning a driver session); default is the module singleton.
    """
    mv_pk = list(spec.mv_pk)
    ks, mv = settings.keyspace, settings.mv_name
    rate = settings.mutation_rate_limit
    factory = session_factory or (lambda: _get_session(settings))

    up_schema = _error_schema(upserts, mv_pk)
    del_schema = _error_schema(deletes, mv_pk)

    def _py(v):
        """numpy scalar → plain Python (the driver packs binds itself)."""
        return v.item() if hasattr(v, "item") else v

    def run_upserts(batches: Iterable) -> Iterable:
        import pandas as pd

        session = factory()
        limiter = TokenBucket(rate)
        stmt_cache: dict[tuple[str, str], object] = {}

        def stmt_for(col: str, flavor: str):
            # OUTSIDE the per-row catch: a failing prepare is a
            # configuration error (bad keyspace/table, schema drift) and
            # must abort the task loudly — the reference prepares its
            # statements before the row loop for the same reason
            # (PreparedStatementHelper.java:36-78); only EXECUTION
            # failures become per-key error rows.
            key = (col, flavor)
            if key not in stmt_cache:
                pk_binds = ", ".join(["?"] * (len(mv_pk) + 1))
                using = {
                    "NO_TIMESTAMP_TTL": "",
                    "TIMESTAMP": " USING TIMESTAMP ?",
                    "TTL": " USING TTL ?",
                    "TIMESTAMP_TTL": " USING TIMESTAMP ? AND TTL ?",
                }[flavor]
                cql = (
                    f"INSERT INTO {ks}.{mv} ({', '.join(mv_pk)}, {col}) "
                    f"VALUES ({pk_binds}){using}"
                )
                stmt_cache[key] = session.prepare(cql)
            return stmt_cache[key]

        for pdf in batches:
            errs: list[dict] = []
            for row in pdf.to_dict("records"):
                limiter.acquire()
                col, flavor = row["column"], row["flavor"]
                stmt = stmt_for(col, flavor)
                try:
                    binds = [_py(row[c]) for c in mv_pk] + [_py(row["value"])]
                    # Arrow→pandas turns a NULLABLE long/int column into
                    # float64 (NaN for nulls), so a mixed-flavor batch
                    # delivers writetime/ttl as np.float64 even on rows
                    # where they're set — int() restores the exact value
                    # (µs epochs < 2^53) before the driver packs int64
                    if flavor in ("TIMESTAMP", "TIMESTAMP_TTL"):
                        binds.append(int(row["writetime"]))
                    if flavor in ("TTL", "TIMESTAMP_TTL"):
                        binds.append(int(row["ttl"]))
                    session.execute(stmt.bind(binds))
                except Exception as exc:  # noqa: BLE001 — stream, don't die
                    # reference prefix (DBOperations.java:90); the failing
                    # column rides behind it so per-key aggregation stays
                    # diagnosable
                    errs.append(
                        {**{c: row[c] for c in mv_pk},
                         "error": f"Error upserting data: {exc} [column {col}]"}
                    )
            yield pd.DataFrame(errs, columns=[f.name for f in up_schema])

    def run_deletes(batches: Iterable) -> Iterable:
        import pandas as pd

        session = factory()
        limiter = TokenBucket(rate)
        where = " AND ".join(f"{c} = ?" for c in mv_pk)
        # prepared once, outside the catch — see stmt_for
        stmt = session.prepare(f"DELETE FROM {ks}.{mv} WHERE {where}")
        for pdf in batches:
            errs = []
            for row in pdf.to_dict("records"):
                limiter.acquire()
                try:
                    session.execute(stmt.bind([_py(row[c]) for c in mv_pk]))
                except Exception as exc:  # noqa: BLE001
                    # reference prefix (DBOperations.java:383)
                    errs.append(
                        {**{c: row[c] for c in mv_pk},
                         "error": f"Error deleting data: {exc}"}
                    )
            yield pd.DataFrame(errs, columns=[f.name for f in del_schema])

    # localCheckpoint(eager=True) IS the mutation action — and the only
    # one ever: the checkpointed frames cannot be recomputed, so later
    # consumers (runner's counts, the error-report join) can never
    # silently re-execute CQL the way a persist()+count() could after
    # cache eviction / executor loss / task retry.
    upsert_errors = upserts.mapInPandas(run_upserts, up_schema).localCheckpoint(
        eager=True
    )
    delete_errors = deletes.mapInPandas(run_deletes, del_schema).localCheckpoint(
        eager=True
    )
    return upsert_errors, delete_errors
