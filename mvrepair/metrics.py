"""Lifecycle/observability counters (O20).

Parity with the reference's codahale registry ``MvSyncJobMetrics``
(/root/reference/src/main/java/mvsync/output/MvSyncJobMetrics.java:6-23):
the same 16 counter names, driver-side.  Per-record counters
(ProcessRecord, MissingBaseTable, …) are fed from the ``df.observe``
results of the report action — one pass over the data, exactly-once per
action (better than accumulators' at-least-once under task retries) —
never from a second aggregation job.
"""

from __future__ import annotations

from collections import Counter
from typing import Mapping

# MvSyncJobMetrics.java:8-23 — counter registry names.
COUNTER_NAMES = [
    "JobStarted",
    "JobCompleted",
    "JobError",
    "KeyspaceMetadataError",
    "MVDoesNotExist",
    "ProcessRecord",
    "MissingBaseTable",
    "MissingMV",
    "InconsistentRecord",
    "ConsistentRecord",
    "RecordRepairOn",
    "RecordRepairOff",
    "DeleteRecord",
    "UpsertRecord",
    "RecordNotInScope",
    "ReadRows",
]

# JobStats observe-metric name → lifecycle counter(s) it feeds
# (increment sites: MvSync.java:250 readRows; :315 processRecord;
# :350-378 classification; :384-412 repair).  ``totRecords`` feeds BOTH
# ProcessRecord and ReadRows: the reference bumps readRows once per scanned
# row pre-join (MvSync.java:250) while our observe runs post-join, so
# distinct-key count is the closest single-pass approximation.
_FROM_JOB_STATS = {
    "totRecords": ("ProcessRecord", "ReadRows"),
    "skippedRecords": "RecordNotInScope",
    "consistentRecords": "ConsistentRecord",
    "inConsistentRecords": "InconsistentRecord",
    "missingBaseTableRecords": "MissingBaseTable",
    "missingMvRecords": "MissingMV",
    "repairRecords": "RecordRepairOn",
    "notRepairRecords": "RecordRepairOff",
    "delAttemptedRecords": "DeleteRecord",
    "upsertAttemptedRecords": "UpsertRecord",
}


class JobMetrics:
    """A plain counter registry; one instance per job run (the reference
    uses process-global statics — an instance is the testable shape)."""

    def __init__(self) -> None:
        self._counters: Counter[str] = Counter({n: 0 for n in COUNTER_NAMES})

    def inc(self, name: str, n: int = 1) -> None:
        if name not in self._counters:
            raise KeyError(f"unknown counter {name!r}")
        self._counters[name] += n

    def count(self, name: str) -> int:
        return self._counters[name]

    def absorb_job_stats(self, stats: Mapping[str, int]) -> None:
        """Feed the 15 JobStats counters (from ``df.observe``) into the
        lifecycle registry.  ReadRows is approximated as totRecords (the
        reference counts per scanned row pre-join, MvSync.java:250; the
        observe runs post-join, so the distinct-key count is the
        single-pass stand-in — see _FROM_JOB_STATS)."""
        for src, dsts in _FROM_JOB_STATS.items():
            if src in stats:
                targets = dsts if isinstance(dsts, tuple) else (dsts,)
                for dst in targets:
                    self._counters[dst] += int(stats[src])

    def as_dict(self) -> dict[str, int]:
        return dict(self._counters)


# Module-level default registry, mirroring the reference's static usage.
GLOBAL_METRICS = JobMetrics()
