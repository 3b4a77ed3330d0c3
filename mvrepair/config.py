"""Job configuration surface.

Parity with the reference's ``MVSyncSettings``
(/root/reference/src/main/java/mvsync/MVSyncSettings.java:23-136): same
setting names (``cass.mv.*`` with ``spark.cass.mv.*`` fallback) and same
defaults, read from a plain dict, a SparkConf, or ``spark.conf``.

The reference's window semantics are preserved bug-compatibly: with the
defaults ``starttsinsec=-1, endtsinsec=-1`` every row that has any writetime
fails ``most <= end`` and is skipped (MvSync.java:444-448) — the window is
effectively mandatory.  The native API (`window_micros`) returns ``None``
for "no window configured" only when the caller opts into
``native_unbounded=True``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

PREFIX = "cass.mv"

_DEFAULTS: dict[str, str] = {
    "starttsinsec": "-1",
    "endtsinsec": "-1",
    "readconsistency": "LOCAL_QUORUM",
    "mvwriteconsistency": "LOCAL_QUORUM",
    "fixmissingmv": "false",
    "fixorphanmv": "false",
    "fixinconsistentmv": "false",
    "cassandra.host": "localhost",
    "cassandra.port": "9042",
    "scan.ratelimiter": "10",
    "mutation.ratelimiter": "5",
    "mutation.uselatestts": "false",
    "cassandra.datacenter": "datacenter1",
    "output.dir": "/tmp/cassandra-mv-repair-spark-job/",
}


@dataclass
class SyncSettings:
    """Typed view over the 18-setting config surface (MVSyncSettings.java)."""

    conf: Mapping[str, Any] = field(default_factory=dict)

    @classmethod
    def from_spark(cls, spark) -> "SyncSettings":
        """Read settings from an active SparkSession's runtime conf."""
        return cls(dict(spark.sparkContext.getConf().getAll()))

    # -- resolution: `cass.mv.X` first, then `spark.cass.mv.X`
    # (MVSyncSettings.java:122-128)
    def _get(self, name: str, default: str | None = None) -> str | None:
        for key in (f"{PREFIX}.{name}", f"spark.{PREFIX}.{name}"):
            val = self.conf.get(key)
            if val is not None and str(val) != "":
                return str(val)
        if default is not None:
            return default
        return _DEFAULTS.get(name)

    # -- time window (MVSyncSettings.java:23-32)
    @property
    def start_ts_epoch_sec(self) -> int:
        return int(self._get("starttsinsec"))

    @property
    def end_ts_epoch_sec(self) -> int:
        return int(self._get("endtsinsec"))

    def window_micros(self, native_unbounded: bool = False) -> tuple[int, int] | None:
        """(start_us, end_us) inclusive bounds, reference semantics.

        Seconds → microseconds conversion mirrors MvSync.java:438-443.
        ``native_unbounded=True`` treats the -1/-1 default as "no window"
        instead of the reference's skip-everything behavior.
        """
        start, end = self.start_ts_epoch_sec, self.end_ts_epoch_sec
        if native_unbounded and start == -1 and end == -1:
            return None
        return (start * 1_000_000, end * 1_000_000)

    # -- identity (MVSyncSettings.java:34-48)
    @property
    def keyspace(self) -> str | None:
        return self._get("keyspace")

    @property
    def base_table_name(self) -> str | None:
        return self._get("basetablename")

    @property
    def mv_name(self) -> str | None:
        return self._get("mvname")

    # -- consistency (MVSyncSettings.java:50-57)
    @property
    def read_consistency(self) -> str:
        return self._get("readconsistency")

    @property
    def mv_write_consistency(self) -> str:
        return self._get("mvwriteconsistency")

    # -- repair toggles (MVSyncSettings.java:59-75)
    @property
    def fix_missing_mv(self) -> bool:
        return self._get("fixmissingmv").lower() == "true"

    @property
    def fix_orphan_mv(self) -> bool:
        return self._get("fixorphanmv").lower() == "true"

    @property
    def fix_inconsistent_mv(self) -> bool:
        return self._get("fixinconsistentmv").lower() == "true"

    @property
    def repair_enabled(self) -> bool:
        return self.fix_missing_mv or self.fix_orphan_mv or self.fix_inconsistent_mv

    # -- connection (MVSyncSettings.java:77-84, 104-117)
    @property
    def cassandra_host(self) -> str:
        return self._get("cassandra.host")

    @property
    def cassandra_port(self) -> int:
        return int(self._get("cassandra.port"))

    @property
    def cassandra_username(self) -> str | None:
        return self._get("cassandra.username")

    @property
    def cassandra_password(self) -> str | None:
        return self._get("cassandra.password")

    @property
    def cassandra_datacenter(self) -> str:
        return self._get("cassandra.datacenter")

    # -- throttles (MVSyncSettings.java:86-94)
    @property
    def scan_rate_limit(self) -> int:
        """Rows/sec per worker for scans (default 10)."""
        return int(self._get("scan.ratelimiter"))

    @property
    def mutation_rate_limit(self) -> int:
        """Rows/sec per worker for repair mutations (default 5)."""
        return int(self._get("mutation.ratelimiter"))

    # -- repair timestamp mode (MVSyncSettings.java:96-102)
    @property
    def use_latest_ts(self) -> bool:
        return self._get("mutation.uselatestts").lower() == "true"

    # -- output (MVSyncSettings.java:119-121)
    @property
    def output_dir(self) -> str:
        return self._get("output.dir")
