"""Temporal operators: as-of join and sessionization.

The reference engine has no temporal operators (SURVEY.md §2 "absent"
rows); these are part of the added analytics surface a training-data /
event pipeline needs.

Scale design:

- ``asof_join`` is the union+window formulation, not join-then-rank.  A
  naive ``left JOIN right ON key AND r.ts <= l.ts`` materializes every
  (left, earlier-right) pair before the rank filter — quadratic blowup per
  key at 100 TB.  Union+window shuffles each input row exactly once on the
  key, sorts within the partition, and carries the latest right payload
  forward with ``last(ignorenulls)`` — linear in rows, one shuffle, and
  whole-stage-codegen throughout (window frame UNBOUNDED PRECEDING →
  CURRENT ROW is the running-frame fast path).
- ``sessionize`` uses Spark's native ``session_window`` aggregation —
  map-side partial merge of [start, end) intervals, so the shuffle carries
  per-(key, open-session) state rather than raw events, and the same code
  works under Structured Streaming with a watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _bin_of(x: Column, b: int) -> Column:
    """Exact integer FLOOR division of a µs value into bin ``b``.

    SQL ``DIV`` truncates toward zero, so for negative (pre-1970)
    timestamps the bin containing zero would span (-b, b) — nearly double
    width — degrading replication/pruning there and breaking the meet
    rule's exactly-once guarantee for straddling intervals (round-4
    ADVICE).  Float ``floor(x / b)`` floors correctly but drifts near bin
    edges at µs magnitudes.  ``x - pmod(x, b)`` is an exact multiple of
    ``b`` (pmod is the positive modulus), so the division is exact and
    the result is the true floor for any sign.
    """
    return ((x - F.pmod(x, F.lit(b))) / F.lit(b)).cast("bigint")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join: for every left row, attach the right row with
    the greatest ``ts_col`` ≤ the left row's ``ts_col`` (``backward``,
    default) or the smallest ``ts_col`` ≥ it (``forward``) for the same
    key (or nulls if no such row).

    ``payload_cols`` are the right-side columns to carry; they appear on
    the output prefixed ``asof_``.  Ties inside the right side at the same
    (key, ts) are broken by ``tiebreak_col`` (greatest wins, both
    directions) so the result is deterministic; right rows sort before
    left rows at an equal timestamp, making the match inclusive.
    ``forward`` is the identical union+window plan on reversed time —
    same single shuffle, same running-frame fast path.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ts_order = (
        F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    )
    order: list[Column] = [ts_order, F.col("__side").asc()]
    if tiebreak_col is not None:
        order.append(F.col(f"__p.{tiebreak_col}").asc_nulls_first())

    payload = F.struct(*[F.col(c) for c in payload_cols])
    l_cols = [c for c in left.columns]
    tagged_l = left.select(
        *l_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__p"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (key_cols + [ts_col]) else F.lit(None).alias(c)
            for c in l_cols
        ],
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged_l.unionByName(tagged_r).withColumn(
        "__match", F.last("__p", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("__side") == 1).select(
        *l_cols,
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in payload_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval (range) join: every left point-in-time row paired with
    every right interval row of the same key where ``right_start <=
    left_ts <= right_end`` (both bounds inclusive).

    Scale design — bin-bucketed equi-join, not a theta join.  The naive
    formulation ``left JOIN right ON key AND ts BETWEEN start AND end``
    has a non-equi predicate, which Spark plans as a per-key nested loop
    inside the SMJ partitions (or worse, BroadcastNestedLoopJoin when no
    equi keys exist) — quadratic per key.  Instead: the left point maps to
    time bin ``floor(ts / bin_width)``; each right interval explodes to
    the (few) bins it overlaps; the join is a plain hash/SMJ equi-join on
    (key…, bin) followed by the exact range filter.  Each matching pair
    appears exactly once — the pair can only meet in the single bin the
    left timestamp falls into.  ``bin_width_us`` trades interval
    replication (≈ span/bin_width + 1 copies of each right row) against
    bucket selectivity; set it near the typical interval span.

    Column contract: apart from ``key_cols``, the two inputs must have
    disjoint column names (alias before calling).  Output: all left
    columns + all non-key right columns.
    """
    lb = _bin_of(F.unix_micros(F.col(left_ts)), bin_width_us)
    l = left.withColumn("__bin", lb)
    r = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin_of(F.unix_micros(F.col(right_start)), bin_width_us),
                _bin_of(F.unix_micros(F.col(right_end)), bin_width_us),
            )
        ),
    )
    out = l.join(r, on=key_cols + ["__bin"], how="inner").filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    )
    return out.drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval × interval OVERLAP join on half-open µs ranges: pairs
    where ``[l_start, l_end)`` and ``[r_start, r_end)`` intersect (same
    key, or every key when ``key_cols`` is empty), with the overlap
    length appended as ``overlap_us``.

    Scale design — the interval generalization of ``range_join``: both
    sides explode to the time bins their interval covers, the join is a
    plain equi-join on (key…, bin), and each overlapping pair is kept
    exactly once by the MEET RULE: only in the bin containing the
    overlap's start, ``floor(greatest(l_start, r_start) / bin_width)``
    (both intervals cover that bin by construction, and any other shared
    bin fails the rule).  Replication per row ≈ span/bin_width + 1; with
    no key columns the bin IS the distribution key — time-partitioned
    parallelism instead of a cross join.  All bin arithmetic is exact
    integer FLOOR division (``_bin_of``): truncating ``DIV`` would
    mis-bin negative pre-1970 µs values, float division drifts near bin
    edges at µs magnitudes.

    Inputs are int64 µs columns (``unix_micros`` upstream); apart from
    ``key_cols`` the two inputs must have disjoint column names.  Empty
    intervals (end ≤ start) never match.
    """
    B = int(bin_width_us)

    def with_bins(df: DataFrame, start: str, end: str) -> DataFrame:
        seq = F.sequence(
            _bin_of(F.col(start), B), _bin_of(F.col(end) - 1, B)
        )
        guarded = F.when(F.col(end) > F.col(start), seq).otherwise(
            F.array().cast("array<bigint>")
        )
        return df.withColumn("__bin", F.explode(guarded))

    l = with_bins(left, l_start, l_end)
    r = with_bins(right, r_start, r_end)
    on = key_cols + ["__bin"]
    meet = _bin_of(F.greatest(F.col(l_start), F.col(r_start)), B)
    out = (
        l.join(r, on=on, how="inner")
        .filter(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .filter(F.col("__bin") == meet)
        .withColumn(
            "overlap_us",
            F.least(F.col(l_end), F.col(r_end))
            - F.greatest(F.col(l_start), F.col(r_start)),
        )
    )
    return out.drop("__bin")


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization via native ``session_window``.

    A session is a maximal run of events per key where consecutive gaps
    are <= ``gap`` (Spark's boundary is inclusive: an event exactly at the
    previous session's end extends it).  Emits one row per (key, session):
    start = first event
    time, end = last event time + gap (Spark's session-window convention),
    event count, and (optionally) an exact decimal sum of ``value_col``.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value")
        )
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            *([F.col("total_value")] if value_col is not None else []),
        )
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-key event sequences — the
    Markov bigram table behind funnel analysis and next-event models
    ("after a signup, what fraction of next events are purchases?").

    Per key, events order by (ts, id) — the id tie-break makes
    simultaneous events deterministic — and every consecutive
    (src, dst) step counts once.  Output per (src, dst): ``n`` (step
    count) and ``p_micro`` = n * 1e6 div Σ_dst n (the conditional
    next-step probability in exact integer micro-units: integer division
    of exact counts, so both engines agree bit-for-bit — no float
    division in the output).

    Scale shape: one lead() window partitioned by key (the canonical
    sessionization partitioning this repo already standardizes on —
    per-key partitions, bounded by per-user activity, never a global
    sort), then a map-side-combinable (src, dst) count; the conditional
    denominator is a window over the transition-matrix frame itself —
    |event types|² rows, not corpus-sized.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    steps = (
        df.select(
            F.col(key_col),
            F.col(type_col).alias("src"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
    )
    counts = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    per_src = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.expr("n * 1000000").cast("long").alias("__num"),
        F.sum("n").over(per_src).alias("__den"),
    ).select(
        "src",
        "dst",
        "n",
        F.expr("__num div __den").cast("long").alias("p_micro"),
    )


def gapfill_locf(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Hypertable-style ``time_bucket_gapfill`` + last-observation-carried-
    forward: bucket events per key, then densify every key's series over
    the GLOBAL observed bucket range so downstream consumers (dashboards,
    feature windows, rate differentiators) see one row per (key, bucket)
    with gaps explicit.

    Contract per (key, bucket) on the shared [min, max] bucket spine:
    ``n_events`` (0 on gap rows), ``sum_value`` (exact ``decimal(18,6)``
    sum cast to double; NULL on gaps), and ``locf_value`` = the latest
    non-gap ``sum_value`` at-or-before the bucket (NULL before the key's
    first observation — standard LOCF leaves leading gaps empty).

    Scale shape: the ONLY corpus-sized work is the bucketed aggregation —
    one shuffle with map-side partial combine.  Everything after operates
    on the bucket frame (|keys| x |observed buckets|, e.g. event-types x
    hours — thousands of rows at ANY corpus scale): the spine derives
    from a per-key min/max aggregate plus an empty-partition window over
    that |keys|-row frame (the ``key_skew`` single-partition-by-design
    precedent — the frame is keys-sized, not corpus-sized), expanded with
    ``sequence``+``explode`` (no cross join, no driver collect), and the
    LOCF window partitions by key over the densified spine.  A naive
    generate_series-driver loop or a CROSS JOIN against a collected range
    would either bottleneck on the driver or trip the
    BroadcastNestedLoopJoin audit; this shape does neither.
    """
    b = (
        df.groupBy(F.window(ts_col, bucket).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__v"),
        )
        .select(
            F.col(key_col),
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "n_events",
            "__v",
        )
    )
    # per-key bucket extents (|keys| rows), then the global range via an
    # empty-partition window over that tiny frame
    per_key = b.groupBy(key_col).agg(
        F.min("bucket_us").alias("__kmin"), F.max("bucket_us").alias("__kmax")
    )
    w_all = Window.partitionBy()
    spine = per_key.select(
        F.col(key_col),
        F.min("__kmin").over(w_all).alias("__gmin"),
        F.max("__kmax").over(w_all).alias("__gmax"),
    ).select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__gmin"), F.col("__gmax"), F.lit(bucket_us))
        ).alias("bucket_us"),
    )
    filled = spine.join(b, [key_col, "bucket_us"], "left")
    w_locf = (
        Window.partitionBy(key_col)
        .orderBy(F.asc("bucket_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key_col),
        F.col("bucket_us"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.col("__v").cast("double").alias("sum_value"),
        F.last("__v", ignorenulls=True)
        .over(w_locf)
        .cast("double")
        .alias("locf_value"),
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: of the users who performed ``steps[0]``,
    how many later performed ``steps[1]``, then ``steps[2]`` strictly
    after that, and so on — the product-analytics funnel where each step
    must occur STRICTLY AFTER the user's earliest completion of the
    previous step (the standard "first-touch" funnel semantics).

    Output: one row per step — ``step`` (1-based), ``event_type``,
    ``n_users`` (users reaching the step), ``conversion_micro``
    (n_users * 1e6 div step-1 count) and ``stepwise_micro`` (vs the
    previous step) — integer division of exact counts, bit-identical
    across engines.

    Scale shape: ONE user-keyed shuffle.  The chained per-user step
    times s_i = min(ts WHERE type = steps[i] AND ts > s_{i-1}) are
    whole-partition window aggregates over the SAME partitioning, so
    Catalyst stacks k Window operators on one Exchange+Sort (no join
    per step — the naive k-way self-join formulation shuffles the
    corpus k times and explodes on hot users).  The per-user reduction
    that follows reuses the window's partitioning (no second exchange),
    and everything after the global count runs on the k-row step frame
    (the ``key_skew`` tiny-frame precedent).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    w_user = Window.partitionBy(key_col)
    cur = df.select(key_col, ts_col, type_col)
    prev: Column | None = None
    for i, st in enumerate(steps):
        cond = F.col(type_col) == st
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        cur = cur.withColumn(f"__s{i}", F.min(F.when(cond, F.col(ts_col))).over(w_user))
        prev = F.col(f"__s{i}")
    per_user = cur.groupBy(key_col).agg(
        *[F.min(f"__s{i}").alias(f"__s{i}") for i in range(len(steps))]
    )
    counts = per_user.agg(
        *[
            F.count(f"__s{i}").cast("long").alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    stack = F.expr(
        "stack({n}, {args})".format(
            n=len(steps),
            args=", ".join(
                f"{i + 1}, '{steps[i]}', __n{i}" for i in range(len(steps))
            ),
        )
    ).alias("step", "event_type", "n_users")
    tall = counts.select(stack)
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("step")
    tall = tall.withColumn(
        "__first", F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(w_all)
    ).withColumn("__prev", F.lag("n_users").over(w_ord))
    return tall.select(
        "step",
        "event_type",
        "n_users",
        F.when(F.col("__first") > 0, F.expr("n_users * 1000000 div __first"))
        .cast("long")
        .alias("conversion_micro"),
        F.when(F.col("__prev") > 0, F.expr("n_users * 1000000 div __prev"))
        .cast("long")
        .alias("stepwise_micro"),
    )


def moving_anomaly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_us: int = 3_600_000_000,
    history: int = 24,
    min_history: int = 6,
    mult_micro: int = 2_000_000,
) -> DataFrame:
    """Trailing-moving-average anomaly flags on the bucketed event-count
    series: bucket events per key, then flag buckets whose count exceeds
    ``mult_micro``/1e6 times the trailing mean over the previous
    ``history`` buckets (current bucket excluded; buckets with fewer
    than ``min_history`` observed trailing buckets are unscored — NULL).

    The comparison is exact cross-multiplied integers —
    ``n * covered * 1e6 > mult_micro * trailing_sum`` — and the reported
    ``deviation_micro`` (n vs trailing mean, micro-units) is integer
    division, so the flags hash bit-identically across engines; no float
    means, no libm.

    Scale shape: the only corpus-sized work is the bucketed count (one
    shuffle, map-side combine).  The trailing window runs on the bucket
    frame (|keys| x |buckets| — thousands of rows at any corpus scale)
    as a RANGE frame over the integer bucket index, so missing buckets
    (hours with no events) widen the gap instead of silently shifting
    the baseline the way a ROWS frame would.  Same post-agg tiny-frame
    doctrine as ``gapfill_locf``/``key_skew``.
    """
    b = (
        df.groupBy(key_col, _bin_of(F.unix_micros(F.col(ts_col)), bucket_us).alias("__idx"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_trail = (
        Window.partitionBy(key_col)
        .orderBy("__idx")
        .rangeBetween(-history, -1)
    )
    scored = b.select(
        F.col(key_col),
        (F.col("__idx") * bucket_us).alias("bucket_us"),
        "n",
        F.sum("n").over(w_trail).alias("__tsum"),
        F.count("n").over(w_trail).cast("long").alias("__tcnt"),
    )
    ok = (F.col("__tcnt") >= min_history) & (F.col("__tsum") > 0)
    return scored.select(
        key_col,
        "bucket_us",
        "n",
        F.coalesce("__tsum", F.lit(0)).cast("long").alias("trailing_sum"),
        F.col("__tcnt").alias("trailing_buckets"),
        F.when(ok, F.expr("(n * __tcnt * 1000000) div __tsum"))
        .cast("long")
        .alias("deviation_micro"),
        F.when(
            ok,
            F.expr(f"n * __tcnt * 1000000 > {mult_micro} * __tsum"),
        ).alias("is_anomaly"),
    )


def activity_islands(
    df: DataFrame,
    key_col: str = "user_id",
    start_col: str = "__start_us",
    end_col: str = "__end_us",
) -> DataFrame:
    """Interval coalescing (gaps-and-islands) over VARIABLE-LENGTH
    intervals: merge every key's overlapping/touching ``[start, end)``
    intervals into maximal islands and report per key the island count,
    total covered time, and longest island — the interval-union rollup
    ("how much wall-clock was actually covered") that point-event
    sessionization (``session_window``, which gaps on event POINTS with
    one fixed timeout) cannot express: here each row carries its own
    duration, so islands are unions of heterogeneous spans.

    Semantics: intervals touching end-to-start merge (a gap must be
    STRICTLY positive to split islands).  All arithmetic is exact µs
    integers; output is bit-identical across engines.  Ordering is
    (start, end): full-tie rows are identical intervals, so the
    running-max flag and island ids are invariant under tie order.

    Scale shape: ONE key-keyed Exchange+Sort carries both window passes
    — the new-island flag (running max of prior interval ends, ROWS
    UNBOUNDED PRECEDING..1 PRECEDING) and the island-id running sum —
    and both the per-island and per-key aggregations reuse that
    partitioning (HashPartitioning(key) clusters every (key, island)
    group), so the whole operator is one shuffle.  Never a corpus-global
    window, no self-join (the naive interval-merge formulation joins
    intervals against themselves — quadratic per key on dense keys).
    """
    base = df.select(
        F.col(key_col),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    )
    w_ord = Window.partitionBy(key_col).orderBy(F.asc("__s"), F.asc("__e"))
    prev_max_end = F.max("__e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.select(
        key_col,
        "__s",
        "__e",
        F.when(
            prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1
        )
        .otherwise(0)
        .alias("__new"),
    )
    islands = flagged.select(
        key_col,
        "__s",
        "__e",
        F.sum("__new")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__isl"),
    )
    per_island = islands.groupBy(key_col, "__isl").agg(
        F.min("__s").alias("__is"), F.max("__e").alias("__ie")
    )
    return per_island.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("__ie") - F.col("__is")).cast("long").alias("covered_us"),
        F.max(F.col("__ie") - F.col("__is")).cast("long").alias("max_island_us"),
    )


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by the ``period`` (week
    or day) of their FIRST event (the cohort), counted once per
    subsequent active period — the standard product-analytics retention
    triangle ("of the users acquired in period P, how many were active
    P+k?").

    Output per (cohort_week_us, week_offset): ``n_users`` (distinct
    active users) and ``retention_micro`` = n_users * 1e6 div cohort
    size (offset 0 row = the cohort size itself, retention 1e6) —
    integer division of exact counts, bit-identical across engines.
    (Column names keep the ``week`` spelling for both periods — the
    offset unit is whatever ``period`` selects.)

    Scale shape: two aggregations over the event stream, BOTH keyed by
    user — first-touch ``min(ts)`` and the distinct (user, week)
    activity set — so they share one shuffle layout and the user-keyed
    join between them introduces no third exchange (sort-merge on the
    already-partitioned aggregates; ReuseExchange collapses the scans).
    The matrix aggregation and the per-cohort denominator window then
    run on cohort x offset frames (weeks², not corpus-sized).  Never a
    corpus-sized window, never a driver collect.
    """
    if period not in ("week", "day"):
        raise ValueError(f"period must be week|day, got {period!r}")
    week_us = (7 if period == "week" else 1) * 86_400 * 1_000_000
    first = df.groupBy(key_col).agg(
        F.unix_micros(F.date_trunc(period, F.min(ts_col))).alias("__cohort")
    )
    active = (
        df.select(
            F.col(key_col),
            F.unix_micros(F.date_trunc(period, F.col(ts_col))).alias("__week"),
        )
        .dropDuplicates([key_col, "__week"])
    )
    mat = (
        active.join(first, key_col)
        .select(
            F.col("__cohort").alias("cohort_week_us"),
            ((F.col("__week") - F.col("__cohort")) / F.lit(week_us))
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week_us", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    w_cohort = Window.partitionBy("cohort_week_us")
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(w_cohort)
    return mat.select(
        "cohort_week_us",
        "week_offset",
        "n_users",
        F.expr(f"n_users * 1000000").cast("long").alias("__num"),
        size.alias("__den"),
    ).select(
        "cohort_week_us",
        "week_offset",
        "n_users",
        F.expr("__num div __den").cast("long").alias("retention_micro"),
    )


def event_paths(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    k: int = 25,
) -> DataFrame:
    """Top-k most frequent length-3 event-type paths over per-key
    streams — the behavioral trigram table (event_transitions is its
    first-order cousin): "what three-step journeys dominate?".

    Per key, events order by (ts, id) — the id tie-break makes
    simultaneous events deterministic — and every window of 3
    consecutive events counts once.  Ties in the top-k break by the
    path itself, so the cut is deterministic.

    Scale shape: BOTH lead() columns ride ONE key-keyed Exchange+Sort
    (same window spec → one Window operator), the path count is
    map-side combinable over the |types|³-bounded path space, and the
    top-k is TakeOrderedAndProject — never a global sort.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    steps = (
        df.select(
            F.col(key_col),
            F.col(type_col).alias("step_1"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("step_2", F.lead("step_1", 1).over(w))
        .withColumn("step_3", F.lead("step_1", 2).over(w))
        .filter(F.col("step_3").isNotNull())
    )
    counts = steps.groupBy("step_1", "step_2", "step_3").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.orderBy(
        F.desc("n"), F.asc("step_1"), F.asc("step_2"), F.asc("step_3")
    ).limit(k)


def scd2_history(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an event stream:
    per key, collapse CONSECUTIVE runs of the same value into validity
    intervals ``[valid_from_us, valid_to_us)`` — the change-data-capture
    compaction that turns an append-only log into a queryable history
    table.  The last run per key is open (``valid_to_us`` NULL).

    Run-length encoding is the equality cousin of the interval-overlap
    islands algebra (``activity_islands``): a run starts where the value
    differs from its predecessor (lag), run ids are the running sum of
    start flags, and each (key, run) aggregates once.

    Scale shape: ONE key-keyed Exchange+Sort carries the lag flag
    window, the run-id running-sum window, AND the (key, run) aggregate
    (HashPartitioning(key) satisfies the (key, run) clustering — rows of
    one run never straddle partitions); the closing ``valid_to_us`` is a
    lead() over the RUNS frame (one row per run, not per event).  Exact
    µs integers; no corpus-sized second shuffle.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc("__t"), F.asc("__id"))
    flagged = df.select(
        F.col(key_col),
        F.col(type_col).alias("__v"),
        F.unix_micros(F.col(ts_col)).alias("__t"),
        F.col(id_col).alias("__id"),
    ).select(
        key_col,
        "__v",
        "__t",
        "__id",
        F.when(
            F.lag("__v").over(w).isNull()
            | (F.lag("__v").over(w) != F.col("__v")),
            1,
        )
        .otherwise(0)
        .alias("__new"),
    )
    runs = flagged.select(
        key_col,
        "__v",
        "__t",
        F.sum("__new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__run"),
    ).groupBy(key_col, "__run").agg(
        F.first("__v").alias("value"),
        F.min("__t").alias("valid_from_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wr = Window.partitionBy(key_col).orderBy(F.asc("__run"))
    return runs.select(
        F.col(key_col),
        F.col("__run").cast("long").alias("run_seq"),
        "value",
        "valid_from_us",
        F.lead("valid_from_us").over(wr).alias("valid_to_us"),
        "n_events",
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average over irregularly-sampled series (the
    TimescaleDB ``time_weight('LOCF', …)`` operator): per key, each
    observation holds until the next one, so the average is
    ``Σ value·Δt / Σ Δt`` with Δt the µs gap to the key's next sample —
    the honest mean of a sensor/price/metric series where plain avg()
    over-weights bursts.  The last sample per key has no successor and
    carries zero weight (the open interval's duration is unknowable —
    TimescaleDB's LOCF makes the same call at series end).

    Exactness: Δt is exact integer µs; ``value`` quantizes to exact
    micro-units (×10⁶, through DECIMAL(18,6) so the double→decimal
    rounding is the engines' shared correctly-rounded step); the
    weighted sum accumulates in DECIMAL(38,0) and the result is the
    integer division ``twa_micro = Σ v_micro·Δt DIV Σ Δt`` — ZERO
    floating-point steps.  (A first cut divided doubles: Spark's
    BigDecimal.doubleValue is correctly rounded, DuckDB's int128/10^k
    cast is two roundings — last-ulp mismatch on real sums.  Integer
    micro-units are the repo convention for exactly this reason.)

    Scale shape: ONE key-keyed Exchange+Sort carries the lead() window
    and the aggregate (HashPartitioning(key) satisfies the grouping);
    output is one row per key.  Ties at equal ts order by ``id_col`` so
    Δt assignment is deterministic on any input.
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(id_col))
    t_us = F.unix_micros(F.col(ts_col))
    vm = (F.col(value_col).cast("decimal(18,6)") * 1_000_000).cast("bigint")
    flagged = df.select(
        key_col,
        vm.alias("__vm"),
        (F.lead(t_us).over(w) - t_us).alias("__dt_us"),
    ).filter(F.col("__dt_us").isNotNull())
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("__dt_us").alias("span_us"),
        F.expr(
            "CAST(sum(CAST(__vm AS DECIMAL(38,0)) * __dt_us)"
            " DIV sum(__dt_us) AS BIGINT)"
        ).alias("twa_micro"),
    )


def mad_anomaly(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
) -> DataFrame:
    """Robust per-group outliers: |v − median| > k·MAD — the
    median-absolute-deviation companion of ``moving_anomaly`` (a mean
    baseline moves WITH the outliers it should flag; median and MAD
    have a 50% breakdown point, the standard robust-statistics fix).

    Exactness: values floor-quantize to int64 micros; medians are
    discrete type-1 (the token_quantiles convention: the element at
    row_number (n+1)//2 under the deterministic (value, id) order), so
    both medians and the k·MAD comparison are pure integer arithmetic —
    no float percentile, nothing engine-specific.

    Scale shape: two group-keyed rank windows (values, then absolute
    deviations) + two broadcast joins of the group-sized
    median/MAD frames; nothing but the input rows ever shuffles, and
    only on the group key.

    Output: (group_col, id_col, v_micro, med_micro, dev_micro,
    mad_micro) for flagged rows, ordered.
    """
    from pyspark.sql.window import Window

    v = F.floor(F.col(value_col).cast("double") * 1_000_000).cast("bigint")
    base = df.select(
        F.col(group_col), F.col(id_col), v.alias("v_micro")
    ).filter(F.col("v_micro").isNotNull())
    w = Window.partitionBy(group_col).orderBy("v_micro", id_col)
    wn = Window.partitionBy(group_col)
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    med = ranked.filter(
        F.col("__rn") == F.expr("(__n + 1) div 2")
    ).select(F.col(group_col), F.col("v_micro").alias("med_micro"))
    devs = base.join(F.broadcast(med), group_col).withColumn(
        "dev_micro", F.abs(F.col("v_micro") - F.col("med_micro"))
    )
    w2 = Window.partitionBy(group_col).orderBy("dev_micro", id_col)
    mad = (
        devs.withColumn("__rn", F.row_number().over(w2))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select(F.col(group_col), F.col("dev_micro").alias("mad_micro"))
    )
    return (
        devs.join(F.broadcast(mad), group_col)
        .filter(F.col("dev_micro") > F.lit(k) * F.col("mad_micro"))
        .select(
            group_col, id_col, "v_micro", "med_micro", "dev_micro",
            "mad_micro",
        )
        .orderBy(group_col, "v_micro", id_col)
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    window_us: int = 2 * 24 * 3600 * 1_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Multi-touch LINEAR attribution with EXACT integer credits: each
    conversion distributes exactly 1,000,000 micro-credits equally over
    the user's touch events in the lookback window — the marketing/
    funnel-analytics primitive ("which channel earns the purchase?").

    Equal split in floats never sums back to 1 per conversion; here the
    split is the Hamilton apportionment of 1e6 over n touches
    (``base = 1e6 DIV n``, the ``1e6 % n`` leftover going to the most
    RECENT touches, ties by event id) — so ``sum(credit) ==
    conversions_with_touches * 1e6`` BY CONSTRUCTION, carried as the
    self-audit window column.

    Plan shape: ONE user-keyed equi-join of conversions against touches
    with the time band as a join-level filter (the purchase_context /
    range-join family — at 100 TB both sides shuffle once on user, and
    the band filter prunes within the co-partitioned stream), then one
    conversion-keyed window pair (count + recency rank) on the matched
    pairs and a |touch_types|-row rollup.

    Output per touch type: ``n_touches``, ``credit_micro`` (int64),
    and the shared ``total_credit_micro`` audit column — it equals
    (conversions with >= 1 in-window touch) * 1e6, which the unit test
    asserts against an independent distinct count.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("__u"),
        us.alias("__ct"),
        F.col(id_col).alias("__cid"),
    )
    touch = events.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("__u"),
        us.alias("__tt"),
        F.col(id_col).alias("__tid"),
        F.col(type_col).alias("touch_type"),
    )
    pairs = conv.join(touch, "__u").filter(
        (F.col("__tt") < F.col("__ct"))
        & (F.col("__tt") >= F.col("__ct") - F.lit(int(window_us)))
    )
    w_conv = Window.partitionBy("__cid")
    w_rank = Window.partitionBy("__cid").orderBy(
        F.col("__tt").desc(), F.col("__tid").asc()
    )
    credited = pairs.select(
        "touch_type",
        "__cid",
        F.count(F.lit(1)).over(w_conv).alias("__n"),
        F.row_number().over(w_rank).alias("__r"),
    ).select(
        "touch_type",
        "__cid",
        (
            F.expr("1000000 DIV __n")
            + F.when(F.col("__r") <= F.expr("1000000 % __n"), 1).otherwise(0)
        ).alias("__credit"),
    )
    w_all = Window.partitionBy()
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("__credit").alias("credit_micro"),
        )
        .select(
            "touch_type",
            "n_touches",
            "credit_micro",
            F.sum("credit_micro").over(w_all).alias("total_credit_micro"),
        )
    )


def km_survival(
    events: DataFrame,
    conversion_type: str = "purchase",
    bucket_us: int = 3_600_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier survival estimator (Kaplan & Meier 1958) over
    time-to-conversion with right censoring — the survival-analysis
    primitive behind conversion-latency and churn curves: subject =
    user, event = first ``conversion_type`` after the user's first
    activity, censoring = last activity for users who never convert.

    EXACT integer algebra: durations bucket to integer units
    (``DIV bucket_us``), the life table (d_t deaths, c_t censored,
    n_t at-risk) is pure exact counts, and the survival curve is the
    integer micro-unit recurrence ``S_t = S_prev·(n_t−d_t) DIV n_t``
    (S_0 = 1e6) — each step one int64 multiply + truncating divide,
    bit-identical in any engine (bound: n < 2^43 keeps S·n under
    2^63), replayed by the oracle as a recursive CTE.  Quantizing at
    every step instead of once at the end loses < |steps| micro-units
    — the price of cross-engine exactness, documented not hidden.

    Scale shape: ONE user-keyed aggregate over the event stream (the
    corpus-sized pass), a bucket-keyed count onto the life table
    (bounded by the time domain / bucket width), and the sequential
    product folds IN-PLAN over one ``array_sort(collect_list(...))``
    row — no driver loop, no Python; the fold's array is life-table-
    sized, never user-sized.

    Output per bucket with activity: ``(t, d, c, n, s_micro)`` —
    at-risk follows the standard convention (deaths and censorings at
    t leave the risk set after t).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(us).alias("__first"),
        F.min(
            F.when(F.col(type_col) == conversion_type, us)
        ).alias("__conv"),
        F.max(us).alias("__last"),
    )
    dur = per_user.select(
        F.col("__conv").isNotNull().alias("__converted"),
        F.expr(
            f"CAST((coalesce(__conv, __last) - __first) DIV {int(bucket_us)}"
            " AS BIGINT)"
        ).alias("t"),
    )
    lt = dur.groupBy("t").agg(
        F.count(F.when(F.col("__converted"), 1)).alias("d"),
        F.count(F.when(~F.col("__converted"), 1)).alias("c"),
    )
    w_all = Window.partitionBy()
    w_prior = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    steps = lt.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prior), F.lit(0)
            )
        ).alias("n"),
    )
    one = steps.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "c", "n"))
        ).alias("steps")
    )
    folded = one.select(
        F.explode(
            F.expr(
                """
aggregate(
  steps,
  struct(CAST(1000000 AS BIGINT) AS s,
         CAST(array() AS array<struct<t: bigint, d: bigint, c: bigint,
                                      n: bigint, sm: bigint>>) AS out),
  (acc, x) -> struct(
    CAST((acc.s * (x.n - x.d)) DIV x.n AS BIGINT) AS s,
    concat(acc.out, array(struct(
      x.t AS t, x.d AS d, x.c AS c, x.n AS n,
      CAST((acc.s * (x.n - x.d)) DIV x.n AS BIGINT) AS sm))) AS out)
).out"""
            )
        ).alias("r")
    )
    return folded.select(
        F.col("r.t").alias("t"),
        F.col("r.d").alias("d"),
        F.col("r.c").alias("c"),
        F.col("r.n").alias("n"),
        F.col("r.sm").alias("s_micro"),
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    alpha_num: int = 1,
    alpha_den: int = 8,
) -> DataFrame:
    """Per-key exponentially-weighted moving average over an integer
    series — the exponential-decay smoother the monitoring set was
    missing next to the trailing-mean and MAD detectors: EWMA reacts
    to level shifts with O(1) state and a tunable memory (α =
    ``alpha_num/alpha_den``).

    EXACT integer recurrence (the km_survival doctrine): s_t =
    (α_num·x_t·1e6 + (α_den−α_num)·s_{t−1}) DIV α_den in micro-units,
    seeded s_0 = x_0·1e6 — each step one int64 multiply-add +
    truncating divide, bit-identical in any engine (bound:
    x·1e6·α_den < 2^63 ⇒ x under ~1e12/α_den), replayed by the oracle
    as a recursive CTE.  Per-step quantization drifts < |series|
    micro-units from the real-valued EWMA — the documented price of
    cross-engine exactness.

    Scale shape: the series is assumed PRE-AGGREGATED (one bucket-
    keyed count pass upstream is the corpus-sized work); this operator
    is one key-keyed ``array_sort(collect_list(...))`` + an in-plan
    SQL fold per key + an explode — state per key is its own series
    (time-domain-sized, the gapfill family's bound), never corpus rows.

    Output: ``(key_col, t, x, s_micro, dev_micro)`` where dev is the
    pre-update surprise ``x·1e6 − s_{t−1}`` (0 at the seed row).
    """
    a, d = int(alpha_num), int(alpha_den)
    if not (0 < a <= d):
        raise ValueError("need 0 < alpha_num <= alpha_den")
    one = df.groupBy(F.col(key_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(t_col).cast("long").alias("t"),
                    F.col(x_col).cast("long").alias("x"),
                )
            )
        ).alias("steps")
    )
    fold = F.expr(
        f"""
aggregate(
  steps,
  struct(CAST(-1 AS BIGINT) AS s,
         CAST(array() AS array<struct<t: bigint, x: bigint,
                                      sm: bigint, dev: bigint>>) AS out),
  (acc, e) -> struct(
    CAST(({a} * e.x * 1000000
          + {d - a} * (CASE WHEN acc.s < 0 THEN e.x * 1000000
                            ELSE acc.s END)) DIV {d} AS BIGINT) AS s,
    concat(acc.out, array(struct(
      e.t AS t, e.x AS x,
      CAST(({a} * e.x * 1000000
            + {d - a} * (CASE WHEN acc.s < 0 THEN e.x * 1000000
                              ELSE acc.s END)) DIV {d} AS BIGINT) AS sm,
      CAST(e.x * 1000000
           - (CASE WHEN acc.s < 0 THEN e.x * 1000000
                   ELSE acc.s END) AS BIGINT) AS dev))) AS out)
).out"""
    )
    return one.select(key_col, F.explode(fold).alias("r")).select(
        key_col,
        F.col("r.t").alias("t"),
        F.col("r.x").alias("x"),
        F.col("r.sm").alias("s_micro"),
        F.col("r.dev").alias("dev_micro"),
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Per-bucket PEAK number of concurrently-open half-open intervals
    [start, end) — the gauge metric ("max concurrent sessions/
    connections/jobs per day") that interval-overlap JOINS can't
    express: it needs the classic sweep (+1 at start, −1 at end,
    running sum, max).

    EXACT across bucket boundaries: every interval explodes into its
    per-bucket segments (an interval open at midnight contributes a
    segment opening AT the bucket start), so each bucket's sweep sees
    the true open count — no "attribute the session to its start day"
    approximation.  Half-open semantics pin the tie rule: at equal
    timestamps the −1 sorts first, so an interval ending exactly when
    another starts never counts as overlap.  Ties collapse into one
    (t, ±1) net row BEFORE the sweep, making the running sum's order
    total and the whole result engine-exact.

    Scale shape: the sweep window partitions BY BUCKET — parallel
    across days, per-day state bounded by that day's interval count;
    the segment explode is ≤ (interval span / bucket) rows, ~1-2 for
    session-length intervals.  No global-order window anywhere.

    Output: ``(epoch_day, peak)`` (bucket index = µs DIV bucket_us).
    """
    from pyspark.sql.window import Window

    base = intervals.select(
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    ).filter(F.col("__e") > F.col("__s"))
    segs = base.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.expr(f"__s DIV {bucket_us}"),
                F.expr(f"(__e - 1) DIV {bucket_us}"),
            )
        ),
    ).select(
        "day",
        F.greatest(F.col("__s"), F.col("day") * bucket_us).alias("t0"),
        F.least(F.col("__e"), (F.col("day") + 1) * bucket_us).alias("t1"),
    )
    pts = segs.select(
        "day", F.col("t0").alias("t"), F.lit(1).alias("dd")
    ).unionAll(
        segs.select("day", F.col("t1").alias("t"), F.lit(-1).alias("dd"))
    )
    net = pts.groupBy("day", "t", "dd").agg(
        F.sum("dd").cast("long").alias("net")
    )
    w = Window.partitionBy("day").orderBy("t", "dd").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = net.select("day", F.sum("net").over(w).alias("c"))
    return cum.groupBy(F.col("day").cast("long").alias("epoch_day")).agg(
        F.max("c").cast("long").alias("peak")
    )


def lttb_downsample(
    pts: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    buckets: int = 12,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    per series key — the dashboard decimation algorithm: keep the
    first and last points, split the interior into ``buckets`` rank
    buckets, and from each bucket keep the point forming the LARGEST
    triangle with the previously kept point and the NEXT bucket's
    centroid, so extremes survive where averaging would flatten them.

    EXACT integer geometry: with prev point P, candidate X and next-
    bucket sums (Sx, Sy, c), the doubled-area-times-c
    ``|(Px·c − Sx)(Xy − Py) − (Px − Xx)(Sy − Py·c)|`` compares
    candidates without ever forming the rational centroid (c is
    constant within a bucket, so the scaling preserves the argmax);
    ties break to the smaller x.

    r12 optimization round (guide §1/§2.4; supersedes the r11
    one-checkpoint-per-round loop): the left-to-right dependence FOLDS
    IN-PLAN — per key, the sorted point array aggregates once
    (``collect_list`` + ``array_sort``) and one ``aggregate`` HOF
    replays the identical bucket chain (same bucket assignment, same
    doubled-area argmax, same anchor carry) inside a single expression.
    The r11 shape paid one eager localCheckpoint per bucket: 45 Spark
    jobs and ~4.2 s at sf0.1 where the fold is 3 jobs and ~0.5 s,
    output bit-identical (pinned by
    ``test_lttb_fold_equals_round_loop_shapes``).  The SQL oracle still
    replays the chain as unrolled fixed-round blocks — the contract is
    the output, and the argmax iterates candidates in ascending x with
    a strict ``>``, which IS the (area desc, x asc) head.

    Scale contract (the holt_smooth/ewma doctrine): the per-key series
    must be DOMAIN-sized (points per key, e.g. hours — never corpus
    rows; fold corpus rows into the series first), because each key's
    points gather into one array row.  Bucket semantics preserved
    exactly: a bucket picks only when it has candidates AND the next
    bucket's centroid exists (empty next bucket ⇒ no pick, anchor
    carries) — the r11 inner-join behavior.

    Output: ``(key, bucket, x, y)`` with bucket −1 for the first
    point and ``buckets`` for the last — ``2 + buckets`` rows per key
    (fewer if a series has < buckets + 2 points; empty interior
    buckets are skipped).
    """
    base = pts.select(
        F.col(key_col).alias("k"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    one = base.groupBy("k").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("x"), F.col("y")))
        ).alias("pts")
    )
    B = int(buckets)
    staged = (
        one.withColumn("n", F.expr("size(pts)"))
        .withColumn("fst", F.expr("element_at(pts, 1)"))
        .withColumn("lst", F.expr("element_at(pts, n)"))
        # interior points with their bucket: index i in the slice is
        # 0-based = rn - 2, so b = (rn-2)*B div (n-2), the r11 rank
        # arithmetic verbatim (the lambda never evaluates on n <= 2:
        # the slice is empty, so the n-2 divisor is safe)
        .withColumn(
            "interior",
            F.expr(
                f"""transform(slice(pts, 2, greatest(n - 2, 0)),
                    (e, i) -> struct(e.x AS x, e.y AS y,
                      CAST((CAST(i AS BIGINT) * {B}) DIV (n - 2) AS INT) AS b))"""
            ),
        )
        # per-bucket centroid sums; index b+1 (1-based) = bucket b,
        # c = 0 marks an empty bucket; the virtual centroid after the
        # final bucket is the last point (c = 1), as before
        .withColumn(
            "cents",
            F.expr(
                f"""transform(sequence(0, {B}),
                    bb -> CASE WHEN bb = {B}
                      THEN struct(lst.x AS sx, lst.y AS sy, CAST(1 AS BIGINT) AS c)
                      ELSE aggregate(
                        filter(interior, e -> e.b = bb),
                        struct(CAST(0 AS BIGINT) AS sx, CAST(0 AS BIGINT) AS sy,
                               CAST(0 AS BIGINT) AS c),
                        (a, e) -> struct(a.sx + e.x AS sx, a.sy + e.y AS sy,
                                         a.c + 1 AS c))
                      END)"""
            ),
        )
    )
    # doubled-area-times-c, candidates ascending in x + strict '>' =
    # (area desc, x asc) argmax; transform(array(..), v -> ..) is the
    # expression-level let-binding (evaluate once, name it)
    area = (
        "abs((acc.px * nx.c - nx.sx) * (e.y - acc.py)"
        " - (acc.px - e.x) * (nx.sy - acc.py * nx.c))"
    )
    fold = f"""aggregate(
        sequence(0, {B} - 1),
        struct(fst.x AS px, fst.y AS py,
               CAST(array() AS array<struct<b: INT, x: BIGINT, y: BIGINT>>) AS picks),
        (acc, bb) -> CASE
          WHEN size(filter(interior, e -> e.b = bb)) > 0
               AND element_at(cents, bb + 2).c > 0
          THEN element_at(transform(array(element_at(cents, bb + 2)), nx ->
                 element_at(transform(array(
                     aggregate(
                       filter(interior, e -> e.b = bb),
                       struct(CAST(-1 AS BIGINT) AS a, CAST(0 AS BIGINT) AS x,
                              CAST(0 AS BIGINT) AS y),
                       (pa, e) -> CASE WHEN {area} > pa.a
                         THEN struct({area} AS a, e.x AS x, e.y AS y)
                         ELSE pa END)
                   ), bst -> struct(bst.x AS px, bst.y AS py,
                        concat(acc.picks,
                               array(struct(bb AS b, bst.x AS x, bst.y AS y)))
                        AS picks)), 1)), 1)
          ELSE acc END)"""
    out_arr = f"""concat(
        array(struct(CAST(-1 AS INT) AS bucket, fst.x AS x, fst.y AS y)),
        transform(({fold}).picks,
                  p -> struct(p.b AS bucket, p.x AS x, p.y AS y)),
        array(struct(CAST({B} AS INT) AS bucket, lst.x AS x, lst.y AS y)))"""
    return staged.select(
        "k", F.explode(F.expr(out_arr)).alias("p")
    ).select("k", "p.bucket", "p.x", "p.y")


def holt_smooth(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    alpha_num: int = 1,
    alpha_den: int = 8,
    beta_num: int = 1,
    beta_den: int = 4,
) -> DataFrame:
    """Per-key Holt linear (double-exponential) smoothing — the
    TRENDING companion of :func:`ewma_smooth`: EWMA lags a ramp by
    construction (its forecast is flat), Holt carries a trend state so
    the one-step forecast is level + slope and a steady ramp's
    surprise converges to ~0 instead of a constant offset.

    EXACT integer recurrences in micro-units (the km/ewma doctrine),
    with one deliberate difference: every division is an explicit
    FLOOR division via the pmod identity — the trend state (and a
    falling series' forecast) go NEGATIVE, where Spark's truncating
    ``DIV`` and DuckDB's flooring ``//`` disagree (the Theil-Sen
    lesson applied to a recurrence):

        pred_t = l_{t−1} + b_{t−1}
        l_t = ⌊(α·x_t·1e6 + (1−α)·pred_t) / 1⌋_α-scaled
        b_t = ⌊(β·(l_t − l_{t−1}) + (1−β)·b_{t−1})⌋_β-scaled
        dev_t = x_t·1e6 − pred_t          (the forecast surprise)

    seeded l_0 = x_0·1e6, b_0 = 0, dev_0 = 0.  The oracle replays the
    chain as a recursive CTE with two state columns.

    Scale shape: identical to ewma_smooth — series pre-aggregated
    upstream, one key-keyed collect + in-plan fold + explode, state
    per key time-domain-sized.

    Output: ``(key_col, t, x, l_micro, b_micro, dev_micro)``.
    """
    a, ad = int(alpha_num), int(alpha_den)
    b, bd = int(beta_num), int(beta_den)
    if not (0 < a <= ad and 0 < b <= bd):
        raise ValueError("need 0 < num <= den for alpha and beta")
    one = df.groupBy(F.col(key_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(t_col).cast("long").alias("t"),
                    F.col(x_col).cast("long").alias("x"),
                )
            )
        ).alias("steps")
    )

    def fdiv(num: str, den: int) -> str:
        return f"CAST((({num}) - pmod(({num}), {den})) DIV {den} AS BIGINT)"

    pred = "(acc.l + acc.b)"
    l_new = (
        f"CASE WHEN NOT acc.seeded THEN e.x * 1000000 ELSE "
        + fdiv(f"{a} * e.x * 1000000 + {ad - a} * {pred}", ad)
        + " END"
    )
    b_new = (
        f"CASE WHEN NOT acc.seeded THEN CAST(0 AS BIGINT) ELSE "
        + fdiv(f"{b} * (({l_new}) - acc.l) + {bd - b} * acc.b", bd)
        + " END"
    )
    dev = (
        f"CASE WHEN NOT acc.seeded THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(e.x * 1000000 - {pred} AS BIGINT) END"
    )
    fold = F.expr(
        f"""
aggregate(
  steps,
  struct(false AS seeded, CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
         CAST(array() AS array<struct<t: bigint, x: bigint, lm: bigint,
                                      bm: bigint, dev: bigint>>) AS out),
  (acc, e) -> struct(
    true AS seeded,
    CAST(({l_new}) AS BIGINT) AS l,
    CAST(({b_new}) AS BIGINT) AS b,
    concat(acc.out, array(struct(
      e.t AS t, e.x AS x,
      CAST(({l_new}) AS BIGINT) AS lm,
      CAST(({b_new}) AS BIGINT) AS bm,
      {dev} AS dev))) AS out)
).out"""
    )
    return one.select(key_col, F.explode(fold).alias("r")).select(
        key_col,
        F.col("r.t").alias("t"),
        F.col("r.x").alias("x"),
        F.col("r.lm").alias("l_micro"),
        F.col("r.bm").alias("b_micro"),
        F.col("r.dev").alias("dev_micro"),
    )
