"""Deterministic cardinality sketch: KMV (k minimum values / bottom-k).

The reference has no sketches (SURVEY §2 "absent" rows); a 100 TB
pipeline needs cheap distinct counts (vocabulary size, distinct users,
dedup-rate estimation).  Spark's native ``approx_count_distinct`` is
HLL++ whose register values are implementation-specific — no external
oracle can reproduce them — so the engine also ships KMV, the classic
bottom-k estimator, built on the repo-wide md5 ``stable_hash64``:
every intermediate (the k minimum hashes) and the final estimate are
bit-reproducible in any engine with md5 + IEEE doubles.

Estimator: with h uniform on [0, 2^60) and kth_min the k-th smallest
distinct hash, E[distinct] ≈ (k-1) · 2^60 / kth_min (the standard KMV
mean estimator); when fewer than k distinct hashes exist the count is
exact.  Standard error ≈ 1/sqrt(k-2).

Scale shape: ``distinct → TakeOrderedAndProject(k)`` — the per-partition
bottom-k merges on the driver side of one shuffle of at most
``partitions × k`` rows; state is O(k), never corpus-sized.  (For
map-side pre-reduction at extreme scale, bottom-k per partition via
``sort_array(collect_set())[:k]`` composes the same way.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mvrepair.functions import stable_hash64

HASH_SPACE = float(2**60)  # stable_hash64 domain (exact as a double)


def kmv_distinct(
    df: DataFrame, col: str, k: int = 64
) -> DataFrame:
    """One-row KMV distinct-count sketch of ``col``.

    Output: (k int, n_seen bigint, kth_min bigint, est_distinct double).
    ``n_seen < k`` means the count is exact (small domain) and
    ``est_distinct = n_seen``; otherwise the mean estimator applies.
    """
    if k < 3:
        raise ValueError("KMV needs k >= 3 (variance is 1/sqrt(k-2))")
    hashes = (
        df.select(stable_hash64(F.col(col).cast("string")).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    bottom = hashes.orderBy("h").limit(k)
    est: Column = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.max("h").cast("double")
    )
    return bottom.agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth_min"),
        est.alias("est_distinct"),
    )
