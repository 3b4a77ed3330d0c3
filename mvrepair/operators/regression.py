"""Closed-form grouped regression: exact-integer OLS trend and Pearson
correlation per key.

The reference engine has no regression surface (SURVEY.md §2 "absent"
rows); a training-data / observability pipeline needs per-series trend
detection (is this event type growing?) and feature-correlation scans
(does value drift with time-of-day?) without ever leaving the
aggregation layer.

Scale design — why closed-form sums, not MLlib or a window:

- OLS over (x, y) pairs needs only the sufficient statistics
  (n, Σx, Σy, Σxy, Σx²): ONE map-combinable hash aggregate per key —
  no per-key sort, no window frame, no iterative solver.  At 100 TB the
  whole operator is a partial-agg tree; the shuffle carries a handful
  of longs per key.
- The slope algebra runs on the per-key aggregate rows (a #keys-sized
  frame) in DECIMAL(38,0), so the cross products n·Σxy − Σx·Σy never
  wrap int64 (epoch-hour x values square to ~1e17 before the 1e6
  micro-scaling; int64 sums would wrap SILENTLY with ANSI off).
- Both normal-equation determinants are SHIFT-INVARIANT
  (n·Σxy − Σx·Σy and n·Σx² − (Σx)² are unchanged by x → x−c), so no
  per-key recentering pass is needed for exactness — the textbook
  "subtract the mean" formulation would cost a second corpus aggregate
  for nothing.
- Output quantization is exact integer floor division (micro units):
  ``_floor_div`` subtracts the positive modulus before ``div`` so the
  result is the true floor for either sign — Spark's ``div`` truncates
  toward zero while DuckDB's ``//`` floors, and slopes are signed, so
  naive truncation would diverge between engine and oracle on every
  negative trend (the temporal.py ``_bin_of`` lesson).

Reference scope note: cassandra-mv-repair-spark-job has no analytics
operators at all (its inventory ends at repair sinks); this module is
part of the added training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DEC = "decimal(38,0)"


def _d(c: Column) -> Column:
    return c.cast(_DEC)


def _floor_div_cols(frame: DataFrame, num: str, den: str, out: str) -> DataFrame:
    """floor(frame[num] / frame[den]) exactly → BIGINT column ``out``.

    Both operands DECIMAL(38,0), den > 0.  ``num - pmod(num, den)`` is an
    exact multiple of ``den``, so truncating ``div`` IS the floor; the
    DuckDB twin is ``(num - ((num % den) + den) % den) // den``.
    """
    return frame.withColumn(
        out,
        F.expr(
            f"CAST((CAST({num} - pmod({num}, {den}) AS {_DEC})"
            f" div {den}) AS BIGINT)"
        ),
    )


def grouped_trend(
    df: DataFrame,
    key_col: str,
    x: Column,
    y: Column,
    min_points: int = 2,
) -> DataFrame:
    """Per-key OLS line fit y = a + b·x from one aggregation pass.

    Returns (key, n_points, slope_micro, level_micro): slope in exact
    integer micro-units (floor(1e6·b)) plus the mean level
    floor(1e6·Σy/n) — the shift-stable pair (an intercept at x = 0 is
    meaningless when x is an epoch index).  Keys with a degenerate
    determinant (fewer than ``min_points`` or all x equal) are dropped.

    x and y must be integral-valued columns (cast to long before the
    sums); Σxy and Σx² accumulate as DECIMAL(38,0) so no magnitude of
    epoch index can wrap the partial aggregates.
    """
    sums = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(x.cast("long")).cast(_DEC).alias("__sx"),
        F.sum(y.cast("long")).cast(_DEC).alias("__sy"),
        F.sum(_d(x.cast("long")) * _d(y.cast("long"))).cast(_DEC).alias("__sxy"),
        F.sum(_d(x.cast("long")) * _d(x.cast("long"))).cast(_DEC).alias("__sxx"),
    )
    sums = sums.withColumn(
        "__num",
        (
            (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
            * F.lit(1_000_000).cast(_DEC)
        ).cast(_DEC),
    ).withColumn(
        "__den",
        (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
            _DEC
        ),
    ).withColumn(
        "__lnum", (F.col("__sy") * F.lit(1_000_000).cast(_DEC)).cast(_DEC)
    )
    sums = sums.filter(
        (F.col("__n") >= min_points) & (F.col("__den") > F.lit(0))
    )
    sums = _floor_div_cols(sums, "__num", "__den", "slope_micro")
    sums = _floor_div_cols(sums, "__lnum", "__n", "level_micro")
    return sums.select(
        F.col(key_col),
        F.col("__n").cast("long").alias("n_points"),
        "slope_micro",
        "level_micro",
    )


def grouped_correlation(
    df: DataFrame,
    key_col: str,
    x: Column,
    y: Column,
    min_points: int = 2,
) -> DataFrame:
    """Per-key Pearson correlation, exact until the last step: the three
    determinants n·Σxy−ΣxΣy, n·Σx²−(Σx)², n·Σy²−(Σy)² are exact
    DECIMAL(38,0); only the final num / sqrt(varx·vary) runs in IEEE
    doubles — bit-identical across engines because both evaluate the
    same casts, two sqrts and one divide (the cosine_micro doctrine,
    similarity.py).

    Returns (key, n_points, r_micro) with r_micro = floor(1e6·r).
    Keys with zero variance on either axis are dropped (r undefined).
    Same one-pass map-combinable shape as ``grouped_trend``.
    """
    sums = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast(_DEC).alias("__n"),
        F.sum(x.cast("long")).cast(_DEC).alias("__sx"),
        F.sum(y.cast("long")).cast(_DEC).alias("__sy"),
        F.sum(_d(x.cast("long")) * _d(y.cast("long"))).cast(_DEC).alias("__sxy"),
        F.sum(_d(x.cast("long")) * _d(x.cast("long"))).cast(_DEC).alias("__sxx"),
        F.sum(_d(y.cast("long")) * _d(y.cast("long"))).cast(_DEC).alias("__syy"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    num = (n * F.col("__sxy") - sx * sy).cast(_DEC).cast("double")
    varx = (n * F.col("__sxx") - sx * sx).cast(_DEC)
    vary = (n * F.col("__syy") - sy * sy).cast(_DEC)
    r = num / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
    return (
        sums.filter(
            (n >= min_points) & (varx > F.lit(0)) & (vary > F.lit(0))
        )
        .select(
            F.col(key_col),
            F.col("__n").cast("long").alias("n_points"),
            F.floor(r * 1_000_000).cast("long").alias("r_micro"),
        )
    )


def theilsen_slope(
    pts: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Theil-Sen slope — the ROBUST companion of
    :func:`grouped_trend`'s OLS: the median of all pairwise slopes
    (Sen 1968), with ~29% breakdown where one outlier hour can drag
    the least-squares line arbitrarily.

    Exact algebra, engine-portable: each pair's slope quantizes to
    ``floor((y_j − y_i)·1e6 / (x_j − x_i))`` via the pmod floor-div
    identity (truncating ``div`` of an exact multiple IS the floor;
    DuckDB's ``//`` floors natively — the grouped_trend discipline, so
    negative slopes round identically in both engines), and the
    reported value is the LOWER MEDIAN at rank ⌈n_pairs/2⌉ under the
    total order (slope, x_i, x_j).

    Scale shape: the pairwise frame is a group-keyed self-join —
    O(Σ m_g²) pairs where m_g is the POINTS-PER-GROUP (a time-DOMAIN
    size: hours in range, never corpus rows; corpus rows fold into the
    per-hour points first).  One group-keyed shuffle builds the pairs,
    one rank window picks the median.  For m beyond ~10⁴ points use
    grouped_trend or pre-thin the series — the quadratic pair count is
    the documented price of the exact median-of-slopes estimator.

    Output: ``(key, n_points, n_pairs, slope_micro)``.
    """
    from pyspark.sql.window import Window

    a = pts.select(
        F.col(key_col).alias("__k"),
        F.col(x_col).cast("long").alias("__x1"),
        F.col(y_col).cast("long").alias("__y1"),
    )
    b = pts.select(
        F.col(key_col).alias("__k"),
        F.col(x_col).cast("long").alias("__x2"),
        F.col(y_col).cast("long").alias("__y2"),
    )
    pairs = (
        a.join(b, "__k")
        .filter(F.col("__x2") > F.col("__x1"))
        .select(
            "__k",
            "__x1",
            "__x2",
            F.expr(
                "CAST(((__y2 - __y1) * 1000000"
                " - pmod((__y2 - __y1) * 1000000, __x2 - __x1))"
                " DIV (__x2 - __x1) AS BIGINT)"
            ).alias("__s"),
        )
    )
    w_rank = Window.partitionBy("__k").orderBy("__s", "__x1", "__x2")
    w_all = Window.partitionBy("__k")
    ranked = pairs.select(
        "__k",
        "__s",
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__np"),
    )
    med = ranked.filter(F.col("__rn") == F.expr("(__np + 1) DIV 2"))
    n_pts = pts.groupBy(F.col(key_col).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return (
        med.join(n_pts, "__k")
        .select(
            F.col("__k").alias(key_col),
            "n_points",
            F.col("__np").cast("long").alias("n_pairs"),
            F.col("__s").alias("slope_micro"),
        )
    )
