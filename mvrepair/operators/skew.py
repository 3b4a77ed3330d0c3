"""Skew-mitigation utilities for 100 TB joins and aggregations.

AQE (``spark.sql.adaptive.skewJoin.enabled``, on by default here) already
splits skewed sort-merge partitions at runtime; these helpers cover the two
cases AQE can't:

- ``salted_agg``: two-phase aggregation for heavily skewed group keys.
  Phase 1 groups on (key, salt) — the hot key's rows spread over ``salt``
  partitions and combine locally; phase 2 merges the ``salt`` partials.
  Correct for any algebraic aggregate expressed as (partial, merge) pairs.
- ``salted_join``: fine-grained skew equi-join.  The (small) right side is
  replicated ``salt`` times — an explode, cheap when right is dimension-
  sized — and the left side picks a random-but-deterministic salt from its
  row content, so one hot key's rows land in ``salt`` different shuffle
  partitions instead of one.

Both keep everything in DataFrame algebra (Catalyst plans the shuffles);
the salt is derived with ``pmod(hash(...))`` so runs are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALT = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt: int = DEFAULT_SALT,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (phase-1 partial over input rows, phase-2
    merge over the partial column of the same name), e.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),  F.sum("n")),
            "tot": (F.sum("v"),         F.sum("tot")),
            "mx":  (F.max("v"),         F.max("mx")),
        })

    The salt is hashed from ``salt_source`` columns (default: all non-key
    columns) so it is deterministic yet spreads a hot key's rows.
    """
    # A key-only DataFrame would leave F.hash() with zero args (analysis
    # error) — fall back to hashing the keys themselves, same as salted_join.
    src = salt_source or [c for c in df.columns if c not in keys] or keys
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in src]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left side, replicate the
    (small) right side ``salt`` times, join on keys + salt.

    Only left-preserving join types make sense here (``inner``, ``left``) —
    the right side is replicated, so right-preserving types would duplicate
    unmatched right rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsrc = [c for c in left.columns if c not in keys]
    l = left.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in (lsrc or keys)]), F.lit(salt)),
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on=keys + ["__salt"], how=how).drop("__salt")
