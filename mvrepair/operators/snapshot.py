"""Corpus snapshot versioning: diff two crawl/corpus versions.

A training-data pipeline re-crawls continuously; before reprocessing
100 TB it needs to know WHAT changed — which documents are new, gone,
or edited — so downstream stages (dedup indexes, embeddings, packed
sequences) can refresh incrementally instead of from scratch.

``snapshot_diff`` is the corpus-side instance of the engine's core
reconcile shape (full-outer join + existence classification — the same
O8/O9 algebra ``mvrepair.operators.reconcile`` runs for MV repair,
cf. reference MvSync.java:300-347), with content digests standing in
for the column-wise diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Row-level diff of two corpus snapshots.

    Output per id present in either side: ``status`` in
    {added, removed, changed, unchanged}, plus the md5 content digests
    (null on the side where the doc is absent).

    Scale shape: both sides project to (id, digest) BEFORE the join —
    document text never crosses the wire; the full-outer join is one
    hash-to-hash exchange on the id (and prunes to a broadcast join when
    one snapshot delta is small).  Digesting is a map-side expression, so
    the whole diff is scan + scan + one join.
    """
    # presence is tracked with explicit flags, NOT digest nullness: a doc
    # present on both sides with NULL text has md5(NULL)=NULL on both,
    # which digest-nullness would misread as added/removed
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("old_hash"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")), "changed"
        )
        .otherwise("unchanged")
    )
    return j.select(
        F.col(id_col), status.alias("status"), "old_hash", "new_hash"
    )
