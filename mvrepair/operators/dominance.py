"""Pareto-dominance (skyline) operators.

The skyline of a set of points is the subset not dominated by any other
point — p dominates q when p is no worse on every criterion and strictly
better on at least one.  Skyline queries are the standard "best
price/size trade-offs" primitive (Börzsönyi, Kossmann, Stocker, ICDE
2001); the reference engine has no such operator, so this is part of the
"absent surface" our engine adds first-class (same doctrine as the
rollup/top-k block in ``__spark_entry__``).

Why NOT the textbook block-nested-loop / dominance self-join: a
dominance join is O(n²) and — worse for Spark — a non-equi join, so
Catalyst would plan a CartesianProduct.  For the 2-D minimize/minimize
case the skyline has a closed sort-based form:

    sort by (x asc, y asc); p is in the skyline iff no strictly-cheaper
    point has y ≤ p.y and no same-x point has y < p.y.

which decomposes into ALL-equi-join, bounded-frame algebra:

1. ``per_x``    = groupBy(x).min(y)           — one corpus-sized agg,
   map-side combinable, output is |distinct x| rows.
2. ``run_min(x)`` = min(min_y) over all x' < x, computed on ``per_x``
   via the TWO-LEVEL bucket decomposition below (never a
   single-partition window over the per-x frame — the
   token_budget_fill precedent, r8 verdict item #2).
3. join back on x (an equi-join against the reduced frame — AQE
   broadcasts it when it is small; no hint, so an adversarial
   all-distinct-x input degrades to a plain shuffled hash join instead
   of a driver OOM) and keep rows with ``y == min_y_at_my_x`` and
   ``(run_min is null or run_min > y)``.

The two-level running min (numeric x): ``bkt = floor(x / width)`` is an
order-preserving, sampling-free, stats-pass-free bucketing (monotone
non-decreasing in x — IEEE division by a positive constant and floor
both preserve order), so ``min over x' < x`` splits EXACTLY into

    least( min over buckets  b' < bkt(x)   — the bucket-frame prefix,
           min over same-bucket x' < x     — a window PARTITIONED by bkt )

The only unpartitioned window runs over the BUCKET frame —
|x-domain| / width rows (4096× smaller), the same reduction
token_budget_fill's boundary-class decomposition was accepted with; for
a pathologically wide x-domain the same decomposition nests (bucket the
bucket frame), which drops in here without semantic change.  ``least``
is null-skipping in Spark (null only when BOTH sides are null), which
is exactly the "no prior point" semantics the filter needs.

Non-numeric x (strings, dates without a numeric cast) falls back to the
single-partition window over ``per_x`` — order-preserving bucketing
needs numeric division — matching token_budget_fill's fallback
contract.

Duplicate points (same x AND same y) do not dominate each other — both
survive, matching the NOT EXISTS oracle's strict-somewhere semantics.

Total cost: one corpus agg exchange keyed on x + one bucket-keyed
exchange over the reduced frame (shared by the bucket agg, the
in-bucket window, and the prefix join) + one equi-join back; the corpus
is scanned once and never globally sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _run_min_bucketed(
    per_x: DataFrame, x: str, min_y: str, bucket_width: int
) -> DataFrame:
    """``per_x`` + ``__run_min`` = min(min_y) over all x' < x, with the
    running min decomposed over ``floor(x / bucket_width)`` buckets so
    no window runs single-partition over the per-x frame."""
    bkt = F.floor(F.col(x) / F.lit(int(bucket_width))).cast("long")
    b = per_x.withColumn("__bkt", bkt)
    per_bkt = b.groupBy("__bkt").agg(F.min(min_y).alias("__bmin"))
    # prefix min over PRIOR buckets: the bucket frame is |x-domain|/width
    # rows — the one unpartitioned window, over the reduced-reduced frame
    wb = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    prior = per_bkt.select(
        "__bkt", F.min("__bmin").over(wb).alias("__prior_min")
    )
    # in-bucket running min: partitioned by bucket, parallel per bucket,
    # ≤ width distinct x per task
    wi = (
        Window.partitionBy("__bkt")
        .orderBy(x)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.withColumn("__in_min", F.min(min_y).over(wi))
        .join(prior, "__bkt")
        .select(
            x,
            min_y,
            # least skips nulls (null only when both are) — exactly the
            # "no strictly-cheaper x exists" sentinel the filter tests
            F.least("__prior_min", "__in_min").alias("__run_min"),
        )
    )


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    keep: list[str] | None = None,
    bucket_width: int = 4096,
) -> DataFrame:
    """2-D minimize/minimize skyline of ``df`` over columns ``x``, ``y``.

    Returns the input rows (projected to ``keep`` + ``x`` + ``y``) that
    no other row dominates.  Exact: equality/comparison only, no
    floating-point arithmetic feeds the VALUES compared (the bucket id
    divides x but is used purely as a partitioning key), so the result
    is bit-stable across engines for any column type with a total order.

    ``bucket_width`` sizes the running-min decomposition (see module
    doc); ``<= 1`` or a non-numeric ``x`` falls back to the
    single-partition window over the per-x frame.
    """
    from pyspark.sql.types import NumericType

    keep = keep if keep is not None else []
    per_x = df.groupBy(x).agg(F.min(y).alias("__min_y"))
    x_numeric = isinstance(df.schema[x].dataType, NumericType)
    if x_numeric and bucket_width > 1:
        run = _run_min_bucketed(per_x, x, "__min_y", bucket_width)
    else:
        w = Window.orderBy(x).rowsBetween(Window.unboundedPreceding, -1)
        run = per_x.select(
            x, "__min_y", F.min("__min_y").over(w).alias("__run_min")
        )
    out_cols = [*keep, x, y]
    return (
        df.join(run, x)
        .where(
            (F.col(y) == F.col("__min_y"))
            & (F.col("__run_min").isNull() | (F.col("__run_min") > F.col(y)))
        )
        .select(*out_cols)
    )
