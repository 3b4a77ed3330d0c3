"""Incremental aggregate-view maintenance: refresh cost ∝ delta size.

The reference repairs a ROW-mirror MV by rescanning both tables
(MvSync.java full-scan design).  Aggregate views allow something far
cheaper — the classic incremental view-maintenance result (Gupta &
Mumick, "Maintenance of Materialized Views: Problems, Techniques and
Applications", IEEE DE Bulletin 1995): if every measure is a
commutative monoid (count, sum, min, max under insert-only deltas),
the stored view IS partial aggregation state, and a refresh is

    refreshed = re-aggregate( stored-rows ∪ aggregate(delta) )

one shuffle of (|view| + |delta-groups|) rows — never a rescan of the
100 TB base.  No full-outer join / coalesce-combine: representing the
view as mergeable state and re-running the SAME aggregate is both
simpler and map-combinable on each side (Spark plans partial aggs
before the exchange for every measure used here).

Insert-only contract: min/max are NOT maintainable under deletes or
updates-in-place (a retracted row can hold the current extremum, whose
replacement is unknowable from the view).  ``refresh_aggregate``
therefore defines the delta as appended rows; deletions require either
dropping min/max from the view or a key-scoped recompute (the merkle
drill composes for exactly that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_KINDS = ("count", "sum", "min", "max")


def aggregate_view(
    df: DataFrame, keys: list[str], measures: list[tuple[str, str, str]]
) -> DataFrame:
    """Materialize the view: per key, one column per (out_name, kind,
    col) measure.  ``kind`` ∈ {count, sum, min, max}; ``col`` is ignored
    for count.  The output is valid *mergeable state* for
    ``refresh_aggregate``.
    """
    return df.groupBy(*keys).agg(*_first_level(measures))


def _first_level(measures: list[tuple[str, str, str]]) -> list[Column]:
    cols = []
    for out, kind, col in measures:
        if kind not in _KINDS:
            raise ValueError(f"unsupported measure kind: {kind}")
        if kind == "count":
            cols.append(F.count(F.lit(1)).alias(out))
        else:
            cols.append(getattr(F, kind)(F.col(col)).alias(out))
    return cols


def _merge_level(measures: list[tuple[str, str, str]]) -> list[Column]:
    # merging partial states: counts add, sums add, min/max fold
    cols = []
    for out, kind, _ in measures:
        fn = F.sum if kind in ("count", "sum") else getattr(F, kind)
        cols.append(fn(F.col(out)).alias(out))
    return cols


def refresh_aggregate(
    stored: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: list[tuple[str, str, str]],
) -> DataFrame:
    """Fold an insert-only delta into a stored aggregate view.

    ``stored`` must have the schema ``aggregate_view`` produces for the
    same (keys, measures).  Exactness (refreshed == recompute over
    base ∪ delta) is the DuckDB-oracled contract of the registered
    query and is pinned property-style in tests.
    """
    delta_agg = aggregate_view(delta, keys, measures)
    merged = stored.select(*keys, *[m[0] for m in measures]).unionByName(
        delta_agg
    )
    return merged.groupBy(*keys).agg(*_merge_level(measures))
