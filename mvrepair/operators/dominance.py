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
2. ``run_min``  = min(min_y) over (order by x rows unbounded-preceding
   → 1 preceding) on ``per_x`` — a single-partition window, but over
   the REDUCED frame only (the key_skew doctrine: the corpus never
   enters a global sort; at an unbounded x-domain this frame is the
   histogram, and a two-level range-bucket decomposition — the
   token_budget_fill precedent — drops in without changing semantics).
3. join back on x (an equi-join against the reduced frame — AQE
   broadcasts it when it is small, which it is whenever the x-domain
   is; no hint, so an adversarial all-distinct-x input degrades to a
   plain shuffled hash join instead of a driver OOM) and keep rows with
   ``y == min_y_at_my_x`` and ``(run_min is null or run_min > y)``.

Duplicate points (same x AND same y) do not dominate each other — both
survive, matching the NOT EXISTS oracle's strict-somewhere semantics.

Total cost: one agg exchange + one join against a reduced frame; the
corpus is scanned once and never globally sorted.  At 100 TB the only
corpus-sized shuffle keys on x (the groupBy), which AQE handles like
any aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    keep: list[str] | None = None,
) -> DataFrame:
    """2-D minimize/minimize skyline of ``df`` over columns ``x``, ``y``.

    Returns the input rows (projected to ``keep`` + ``x`` + ``y``) that
    no other row dominates.  Exact: equality/comparison only, no
    floating-point arithmetic is performed on the values, so the result
    is bit-stable across engines for any column type with a total order.
    """
    keep = keep if keep is not None else []
    per_x = df.groupBy(x).agg(F.min(y).alias("__min_y"))
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
