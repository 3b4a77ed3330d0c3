"""mvrepair — a PySpark-native table-reconciliation + analytics engine.

From-scratch re-expression of the capabilities of
``jaydeepkumar1984/cassandra-mv-repair-spark-job`` (read-only reference at
``/root/reference``) as idiomatic DataFrame/Catalyst operators, extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Public API re-exports the main operator entry points.
"""

from mvrepair.config import SyncSettings
from mvrepair.schema import MVSpec, TableSchema
from mvrepair.operators.reconcile import classify, reconcile_report, job_stats
from mvrepair.operators.repair import plan_upserts, plan_deletes, apply_repairs_file_mode

__all__ = [
    "SyncSettings",
    "MVSpec",
    "TableSchema",
    "classify",
    "reconcile_report",
    "job_stats",
    "plan_upserts",
    "plan_deletes",
    "apply_repairs_file_mode",
]

__version__ = "0.1.0"
