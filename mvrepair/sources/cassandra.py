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
- ``apply_repairs_cassandra``: ``foreachPartition`` executor issuing the
  planned upserts/deletes over the DataStax python driver with a per-JVM
  (here per-executor-process) session singleton and per-partition
  prepared-statement cache — mirroring CassandraClient.java:15-33 and
  PreparedStatementHelper.java:36-78.  Gated behind an import-try: absent
  driver → NotImplementedError (detection/planning never needs it).
"""

from __future__ import annotations

import time
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

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


def apply_repairs_cassandra(
    upserts: DataFrame,
    deletes: DataFrame,
    spec,
    settings: SyncSettings,
) -> None:
    """Execute a repair plan against a live cluster (rate-limited).

    One ``foreachPartition`` pass per plan; per-partition statement cache;
    ``mutation.ratelimiter`` rows/sec per executor.  Statement shapes are
    the reference's 4 upsert flavors (PreparedStatementHelper.java:36-78)
    and the full-PK delete (:94-108).
    """
    mv_pk = list(spec.mv_pk)
    ks, mv = settings.keyspace, settings.mv_name
    rate = settings.mutation_rate_limit
    consistency = settings.mv_write_consistency

    def run_upserts(rows: Iterable) -> None:
        session = _get_session(settings)
        limiter = TokenBucket(rate)
        stmt_cache: dict[tuple[str, str], object] = {}
        for row in rows:
            limiter.acquire()
            col, flavor = row["column"], row["flavor"]
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
            binds = [row[c] for c in mv_pk] + [row["value"]]
            if flavor in ("TIMESTAMP", "TIMESTAMP_TTL"):
                binds.append(row["writetime"])
            if flavor in ("TTL", "TIMESTAMP_TTL"):
                binds.append(row["ttl"])
            session.execute(stmt_cache[key].bind(binds))

    def run_deletes(rows: Iterable) -> None:
        session = _get_session(settings)
        limiter = TokenBucket(rate)
        where = " AND ".join(f"{c} = ?" for c in mv_pk)
        stmt = session.prepare(f"DELETE FROM {ks}.{mv} WHERE {where}")
        for row in rows:
            limiter.acquire()
            session.execute(stmt.bind([row[c] for c in mv_pk]))

    upserts.foreachPartition(run_upserts)
    deletes.foreachPartition(run_deletes)
