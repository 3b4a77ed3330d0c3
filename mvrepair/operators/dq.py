"""Declarative data-quality checks: a Deequ-style constraint report in
ONE pass over the table.

A 100 TB ingest pipeline validates before it processes: completeness of
required columns, key uniqueness, domain rules (value ranges,
cross-column order).  The open-source pattern (AWS Deequ, Great
Expectations) compiles every declared check into one aggregate so the
table is scanned once regardless of how many constraints ride along —
that is the whole design here: each check contributes aggregate
expressions to a single ``agg()``, the verdict row explodes into a
(check, value, passed) report, and the only exchange is the final
single-row combine (map-side partials all the way).

Uniqueness checks add exact ``count(distinct …)`` aggregates; Spark
plans multi-distinct via Expand (row multiplication by the number of
distinct groups) — the canonical exact plan, preferred here over
``approx_count_distinct`` because HLL++ register state is
engine-private and unverifiable (use ``sketch.hll_registers`` when an
estimate is enough).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class DQCheck:
    """One constraint: a bigint metric aggregate + a pass predicate
    evaluated on the aggregated row (may reference other metrics via
    their check names)."""

    name: str
    metric: Column
    passed: Column


def completeness(col: str) -> DQCheck:
    """Metric: null count; passes when every row has the value."""
    n_null = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("bigint")
    return DQCheck(f"complete({col})", n_null, F.col(f"complete({col})") == 0)


def unique(cols: list[str]) -> DQCheck:
    """Metric: distinct combinations; passes when it equals the row
    count (a primary-key check).  Null-free keys assumed: SQL
    ``count(DISTINCT a, b)`` EXCLUDES tuples with any null member, so a
    null-keyed row would deflate the metric and read as a duplicate —
    pair with ``completeness`` checks on the key columns."""
    name = f"unique({','.join(cols)})"
    return DQCheck(
        name,
        F.count_distinct(*[F.col(c) for c in cols]).cast("bigint"),
        F.col(name) == F.col("n_rows"),
    )


def satisfies(rule: str, predicate: Column) -> DQCheck:
    """Metric: violation count of a row-level predicate; passes at 0."""
    name = f"satisfies({rule})"
    violations = F.sum(
        F.when(predicate, 0).otherwise(1)  # null predicate = violation
    ).cast("bigint")
    return DQCheck(name, violations, F.col(name) == 0)


def dq_report(df: DataFrame, checks: list[DQCheck]) -> DataFrame:
    """Run every check in one aggregate pass.

    Output: (check string, value bigint, passed boolean) — one row per
    check plus a leading ``n_rows`` row (value = table size, passed =
    non-empty).
    """
    if not checks:
        raise ValueError("dq_report needs at least one check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[c.metric.alias(c.name) for c in checks],
    )
    entries = [
        F.struct(
            F.lit("n_rows").alias("check"),
            F.col("n_rows").alias("value"),
            (F.col("n_rows") > 0).alias("passed"),
        )
    ] + [
        F.struct(
            F.lit(c.name).alias("check"),
            F.col(c.name).alias("value"),
            c.passed.alias("passed"),
        )
        for c in checks
    ]
    return agg.select(F.explode(F.array(*entries)).alias("__c")).select(
        "__c.check", "__c.value", "__c.passed"
    )


def referential_report(
    fact: DataFrame,
    checks: list[tuple[str, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity checks (Deequ's containment class): for
    each (name, fact_col, dim_df, dim_col), the metric is the number of
    fact rows whose key has NO match in the dimension (nulls counted as
    violations — a null FK can't reference anything); passes at 0.

    Unlike the single-pass ``dq_report`` aggregates, containment needs
    a join per check — each is a left-anti join against the DISTINCT
    dimension keys (dim-key-sized, broadcastable when the key set is
    small even if the dimension isn't), counted and unioned into the
    same (check, value, passed) verdict shape so both report kinds
    concatenate.
    """
    if not checks:
        raise ValueError("referential_report needs at least one check")
    out = None
    for name, fact_col, dim_df, dim_col in checks:
        keys = dim_df.select(F.col(dim_col).alias(fact_col)).distinct()
        violations = (
            fact.select(fact_col)
            .join(keys, on=fact_col, how="left_anti")
            .agg(F.count(F.lit(1)).alias("value"))
            .select(
                F.lit(f"references({name})").alias("check"),
                F.col("value"),
                (F.col("value") == 0).alias("passed"),
            )
        )
        out = violations if out is None else out.unionByName(violations)
    return out


def fd_report(
    df: DataFrame, fds: list[tuple[list[str], list[str]]]
) -> DataFrame:
    """Approximate-functional-dependency profiling: for each candidate
    FD X -> Y, the g3 error measure (Kivinen & Mannila) — the minimum
    number of rows to DELETE for the dependency to hold exactly:
    violations = Σ over X-groups of (group size − its plurality
    (X,Y)-combination count).  g3 = 0 iff the FD holds.

    The discovery half of the DQ surface (``dq_report`` checks declared
    constraints; this measures how far candidate ones are from true) —
    the signal that finds denormalization drift, stale dimension
    copies, and key columns that are ALMOST keys before a pipeline
    bakes the assumption in.

    Scale shape per FD: groupBy(X ∪ Y) count, then groupBy(X) fold,
    then one single-row combine — two map-combinable exchanges, output
    one row, no joins, no windows.  Nulls are ordinary values on both
    sides (groupBy semantics), documented over SQL's DISTINCT-tuple
    null rules.

    Output: (fd string, n_groups bigint, violating_groups bigint,
    violations bigint, passed boolean), one row per candidate in input
    order.
    """
    if not fds:
        raise ValueError("fd_report needs at least one candidate FD")
    reports = []
    for lhs, rhs in fds:
        if not lhs or not rhs or set(lhs) & set(rhs):
            raise ValueError(f"malformed FD {lhs} -> {rhs}")
        name = f"{','.join(lhs)}->{','.join(rhs)}"
        pairs = df.groupBy(
            *[F.col(c) for c in lhs + rhs]
        ).agg(F.count(F.lit(1)).alias("__n"))
        groups = pairs.groupBy(*[F.col(c) for c in lhs]).agg(
            F.sum("__n").alias("__total"),
            F.max("__n").alias("__plural"),
        )
        reports.append(
            groups.agg(
                F.lit(name).alias("fd"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(
                    F.when(F.col("__plural") < F.col("__total"), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("violating_groups"),
                F.sum(F.col("__total") - F.col("__plural"))
                .cast("bigint")
                .alias("violations"),
            ).withColumn("passed", F.col("violations") == 0)
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def mi_report(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Entropy / mutual-information profile of candidate column pairs —
    the CONTINUOUS complement of ``fd_report``'s g3: g3 counts rows
    violating a hard dependency, MI measures how much knowing X shrinks
    the uncertainty of Y anywhere on the scale from independence
    (MI = 0) to functional determination (MI = H(Y)).  The profiling
    signal behind join-key discovery, feature selection, and redundant-
    column detection.

    Exactness: all scores are q20 log2 units via the cross-engine-exact
    ``micro_log2`` quantizer, WEIGHTED-SUM form (divide by n for bits):
    h_x_q20w = Σ_x c_x·log2(n/c_x), mi_q20w = Σ_xy c_xy·log2(pmi ratio)
    with the ratio assembled in the fixed two-division order the SQL
    twin mirrors.  MI >= 0 up to quantization (each term's sign follows
    the exact ratio); MI <= min(H(X), H(Y)) likewise.

    Scale shape: ONE corpus pass computes EVERY pair's joint counts as
    grouping sets of a single aggregate (r12, guide §2.3 — the r11
    layout still scanned the corpus once per pair); the grouping-sets
    frame is persisted for the report's lifetime and every consumer —
    per-pair joints (grouping_id filters over the cache), margins, PMI
    join, totals — reads the cache, never a second corpus scan.  Per
    pair: two vocab-sized margin joins, the total n as a single-task
    window-total riding each margin frame (sum of either margin = n,
    the same int64 fold), one-row aggregates combined by union +
    re-aggregate (never a 1-row join — it constant-folds to BNLJ).

    Job shape (r11 optimization round, guide §1): the report runs as
    ONE collect — all pairs' one-row blocks union into a single plan
    materialized by a single action — instead of the old per-pair
    persist → multi-stage collect → scalar-subquery chains (56 jobs
    for 3 pairs measured at sf0.1, 8.9 s where the data work is ~1 s;
    scalar subqueries each execute as their own job chain, so n now
    rides the margin frames as a window-total instead).  A fully-lazy
    no-persist variant was tried and REJECTED: without the cache the
    joint subtree is duplicated per consumer (30 FileScans / 90
    Exchanges in the static plan) and AQE's runtime reuse did not
    collapse them (measured slower than the eager original).  The
    joint frames are unpersisted before return; the returned frame is
    a literal rebuild — nothing stays cached past the call (the
    round-10 ADVICE unreachable-persist finding stays closed).

    Output per pair: (pair string, n bigint, n_joint bigint,
    h_x_q20w, h_y_q20w, mi_q20w bigint).
    """
    from pyspark import StorageLevel

    from mvrepair.functions.exactlog import micro_log2

    if not pairs:
        raise ValueError("mi_report needs at least one column pair")
    from pyspark.sql.window import Window as _W

    # ONE quantizer instance for the whole report (r11 optimization
    # round): micro_log2 is a large higher-order expression — measured
    # ~0.8-1 s of per-action driver analysis/codegen PER INSTANCE even
    # on a 15-row frame, so the old 3-per-pair layout paid ~9 s of pure
    # plan overhead.  Every entropy/MI contribution is the same shape
    # Σ weight·log_q(ratio), so all pairs' term streams union into one
    # (pair, kind, ratio, weight) frame, identical ratios are grouped
    # BEFORE the quantizer (int64 multiplication distributes over the
    # int64 sum — bit-identical: Σ_i w_i·l(r) over equal r equals
    # (Σ_i w_i)·l(r), and for the margins Σ_keys c·l = (k·c)·l), and
    # the single micro_log2 projection runs over the few-hundred-row
    # deduped term frame.
    term_frames = []
    count_frames = []
    null_l = F.lit(None).cast("bigint")
    seen_pairs: set[tuple[str, str]] = set()
    for x, y in pairs:
        if x == y:
            raise ValueError(f"degenerate pair ({x}, {y})")
        if (x, y) in seen_pairs:
            # a duplicate pair would collapse into one output row at the
            # final groupBy('pair') (r11 ADVICE) — reject up front
            raise ValueError(f"duplicate pair ({x}, {y})")
        seen_pairs.add((x, y))

    # ONE corpus pass for ALL pairs' joint aggregations (r12, guide
    # §2.3; r11 left 3 separate groupBy(X,Y) corpus scans).  The pairs'
    # joint counts compute as GROUPING SETS of one aggregate; each
    # pair's joint frame is a grouping_id filter over the single cached
    # result.  Exactness: grouping_id bit i is 1 iff grouping column i
    # is AGGREGATED in the row's set, so set membership is carried out
    # of band — a data NULL in a grouping key stays a value and can
    # never be confused with an aggregated column, and two sets over
    # different columns can never collide (distinct gid).  Each
    # filtered slice is therefore row-for-row the old per-pair
    # groupBy(x, y).count() frame.
    gcols: list[str] = []
    for x, y in pairs:
        for c in (x, y):
            if c not in gcols:
                gcols.append(c)
    set_lists: list[list[str]] = []
    for x, y in pairs:
        cols = sorted({x, y}, key=gcols.index)
        if cols not in set_lists:
            set_lists.append(cols)
    gs = (
        df.groupingSets(
            [[F.col(c) for c in s] for s in set_lists],
            *[F.col(c) for c in gcols],
        )
        .agg(
            F.count(F.lit(1)).alias("__cxy"),
            F.grouping_id().alias("__gid"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_g = len(gcols)

    for x, y in pairs:
        name = f"{x}|{y}"
        want_gid = sum(
            1 << (n_g - 1 - i) for i, c in enumerate(gcols) if c not in (x, y)
        )
        joint = gs.filter(F.col("__gid") == want_gid).select(
            F.col(x).alias("__x"), F.col(y).alias("__y"), "__cxy"
        )
        # the total n rides the cx margin as a window-total (sum of the
        # margin = n exactly, same int64 fold as the old scalar
        # subquery, which executed as its own multi-stage job chain)
        w_all = _W.partitionBy()
        cx = (
            joint.groupBy("__x")
            .agg(F.sum("__cxy").alias("__cx"))
            .withColumn("__n", F.sum("__cx").over(w_all).cast("long"))
        )
        cy = joint.groupBy("__y").agg(F.sum("__cxy").alias("__cy"))
        ratio = (
            F.col("__cxy").cast("double") / F.col("__cx").cast("double")
        ) * (
            F.col("__n").cast("double") / F.col("__cy").cast("double")
        )
        # mi terms: ratio per joint cell, weight = cell count
        term_frames.append(
            joint.join(cx, "__x")
            .join(cy, "__y")
            .select(
                F.lit(name).alias("pair"),
                F.lit("mi").alias("kind"),
                ratio.alias("__r"),
                F.col("__cxy").alias("__w"),
            )
        )
        # margin-entropy terms: ratio = n/c per margin row, weight = c
        # (so Σ w·l(r) = Σ c·log_q(n/c) exactly); the h_y total n is
        # the same window-total fold over ITS margin (sum = n too)
        term_frames.append(
            cx.select(
                F.lit(name).alias("pair"),
                F.lit("hx").alias("kind"),
                (
                    F.col("__n").cast("double") / F.col("__cx").cast("double")
                ).alias("__r"),
                F.col("__cx").alias("__w"),
            )
        )
        term_frames.append(
            cy.withColumn(
                "__ny", F.sum("__cy").over(w_all).cast("long")
            ).select(
                F.lit(name).alias("pair"),
                F.lit("hy").alias("kind"),
                (
                    F.col("__ny").cast("double") / F.col("__cy").cast("double")
                ).alias("__r"),
                F.col("__cy").alias("__w"),
            )
        )
        count_frames.append(
            joint.agg(
                F.sum("__cxy").cast("bigint").alias("n"),
                F.count(F.lit(1)).cast("bigint").alias("n_joint"),
            ).select(
                F.lit(name).alias("pair"), "n", "n_joint",
                null_l.alias("h_x_q20w"), null_l.alias("h_y_q20w"),
                null_l.alias("mi_q20w"),
            )
        )
    terms = term_frames[0]
    for t in term_frames[1:]:
        terms = terms.unionByName(t)
    quant = (
        terms.groupBy("pair", "kind", "__r")
        .agg(F.sum("__w").alias("__w"))
        .select(
            "pair", "kind", "__w", micro_log2(F.col("__r")).alias("__l")
        )
    )
    folded = (
        quant.groupBy("pair", "kind")
        .agg(F.sum(F.col("__w") * F.col("__l")).cast("bigint").alias("__v"))
        .groupBy("pair")
        .agg(
            F.max(F.when(F.col("kind") == "hx", F.col("__v"))).alias(
                "h_x_q20w"
            ),
            F.max(F.when(F.col("kind") == "hy", F.col("__v"))).alias(
                "h_y_q20w"
            ),
            F.max(F.when(F.col("kind") == "mi", F.col("__v"))).alias(
                "mi_q20w"
            ),
        )
        .select(
            "pair", null_l.alias("n"), null_l.alias("n_joint"),
            "h_x_q20w", "h_y_q20w", "mi_q20w",
        )
    )
    plan = folded
    for cf in count_frames:
        plan = plan.unionByName(cf)
    plan = plan.groupBy("pair").agg(
        F.max("n").alias("n"),
        F.max("n_joint").alias("n_joint"),
        F.max("h_x_q20w").alias("h_x_q20w"),
        F.max("h_y_q20w").alias("h_y_q20w"),
        F.max("mi_q20w").alias("mi_q20w"),
    )
    # (a static-planned collect was tried here and REJECTED: sizing the
    # whole report to the input's estimated bytes serializes the
    # corpus-facing joint aggregations; AQE sizes the joint exchange
    # and the vocab-sized tail differently, which is exactly right)
    try:
        rows = plan.collect()
    finally:
        gs.unpersist()
    order = {f"{x}|{y}": i for i, (x, y) in enumerate(pairs)}
    rows.sort(key=lambda r: order[r["pair"]])
    return df.sparkSession.createDataFrame(
        rows,
        "pair string, n bigint, n_joint bigint, h_x_q20w bigint, "
        "h_y_q20w bigint, mi_q20w bigint",
    )


def category_drift(
    df: DataFrame,
    cat_col: str,
    ts_col: str,
) -> DataFrame:
    """Distribution-drift monitor between the two halves of a table's
    time range: per-category PSI contribution + two-sample chi-square —
    THE production gate for "did this feed's categorical mix shift?"
    (population stability index; >0.25 conventionally means retrain /
    investigate).  The reference window A is rows at or before the
    midpoint of [min(ts), max(ts)], B the rest — a data-derived,
    order-independent split.

    Exact-arithmetic contract (oracle-hash-checkable, the
    source_divergence doctrine):
    - counts are exact integers off ONE map-combinable
      (category, half) aggregate — the only corpus-sized pass;
    - PSI per category = delta_micro * ml_q20, both int64:
      delta_micro = floor((ca/na - cb/nb) * 1e6) and ml_q20 =
      micro_log2((ca/na) * (nb/cb)) — each factor a single IEEE
      division on exact ints, cross-engine bit-identical; the sum of
      per-category int64 contributions is order-independent (never a
      float sum);
    - chi-square cell terms ((obs-exp)^2/exp, exp = na*rt/T) quantize
      per-cell to micro-units before the integer sum.  The ``na*rt``
      int64 product bounds the exact path at ~3e9 rows per window;
      past that switch the expected-count to the two-division form
      (the source_divergence overflow note).
    - categories present in only one half are dropped from the PSI
      join (PSI is undefined at q=0); their mass still counts in
      na/nb, so the drop is visible as column totals vs sum(ca/cb).

    Scale shape: one corpus scan -> |categories| x 2 count rows;
    everything after runs on that tiny frame (empty-partition windows,
    the key_skew precedent).  Output: one row per category in both
    halves, carrying the shared totals.
    """
    from pyspark.sql.window import Window

    from mvrepair.functions.exactlog import micro_log2

    # the midpoint is ONE bounded aggregate collected driver-side (the
    # zorder normalization precedent) so the count pass can use it as a
    # literal — no 1-row cross join (BNLJ) in the returned plan, and
    # the conditional-count pivot keeps it to a SINGLE corpus scan
    us = _event_us(ts_col)
    [row] = df.agg(
        F.shiftright(F.min(us) + F.max(us), 1).alias("mid")
    ).collect()
    cnt = drift_counts(df, cat_col, ts_col, int(row["mid"]))
    return drift_scores(cnt)


def _event_us(ts_col: str) -> Column:
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def drift_counts(
    df: DataFrame, cat_col: str, ts_col: str, mid_us: int
) -> DataFrame:
    """The drift monitor's ONLY corpus-sized pass: per-category
    conditional counts on either side of the (literal) midpoint — a
    plain keyed count aggregate, map-combinable, and therefore
    STREAMING-LEGAL unchanged: as a streaming aggregation it holds one
    JVM state row per category (two longs), and an availableNow +
    complete drain equals the batch pivot cell-for-cell, so
    :func:`drift_scores` and the DuckDB oracle apply verbatim to the
    drained table (the price_hist_stream doctrine)."""
    us = _event_us(ts_col)
    mid = F.lit(int(mid_us))
    return df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.when(us <= mid, 1)).alias("ca"),
        F.count(F.when(us > mid, 1)).alias("cb"),
    )


def drift_scores(cnt: DataFrame) -> DataFrame:
    """PSI + chi-square tail over the |categories|-row count frame
    (see :func:`category_drift` for the exactness contract)."""
    from pyspark.sql.window import Window

    from mvrepair.functions.exactlog import micro_log2

    w = Window.partitionBy()
    j = cnt.select(
        "category",
        "ca",
        "cb",
        F.sum("ca").over(w).alias("na"),
        F.sum("cb").over(w).alias("nb"),
    ).filter((F.col("ca") > 0) & (F.col("cb") > 0))
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    ratio = pa * (F.col("nb").cast("double") / F.col("cb").cast("double"))
    rt = F.col("ca") + F.col("cb")
    tt = F.col("na") + F.col("nb")
    exp_a = (F.col("na") * rt).cast("double") / tt.cast("double")
    exp_b = (F.col("nb") * rt).cast("double") / tt.cast("double")
    da = F.col("ca").cast("double") - exp_a
    db = F.col("cb").cast("double") - exp_b
    scored = j.select(
        "category",
        "ca",
        "cb",
        "na",
        "nb",
        F.floor((pa - pb) * F.lit(1000000.0)).cast("long").alias(
            "delta_micro"
        ),
        micro_log2(ratio).alias("ml_q20"),
        (
            F.floor(da * da / exp_a * F.lit(1000000.0))
            + F.floor(db * db / exp_b * F.lit(1000000.0))
        ).cast("long").alias("chi2_micro"),
    ).withColumn(
        "psi_q", F.col("delta_micro") * F.col("ml_q20")
    )
    return scored.select(
        "category",
        "ca",
        "cb",
        "na",
        "nb",
        "delta_micro",
        "ml_q20",
        "psi_q",
        "chi2_micro",
        F.sum("psi_q").over(w).alias("psi_total_q"),
        F.sum("chi2_micro").over(w).alias("chi2_total_micro"),
    )


def woe_iv(
    df: DataFrame,
    value_col: str,
    label_col: str,
    n_bins: int = 8,
    width: int = 1 << 16,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value report: equi-depth bin a
    numeric feature and score each bin's separation of a binary label —
    the classic supervised-binning diagnostic (credit-scoring lineage;
    IV > 0.3 = strong predictor) a feature pipeline runs before
    committing a column to training.

    The bin BOUNDARIES come from the mergeable equiwidth-grid quantile
    sketch (``sketch.hist_quantile_est``) rather than an exact rank
    window: one map-combinable count pass + a bounded grid instead of a
    full sort of the value stream — the whole point of the sketch at
    100 TB, with its hard 0 <= err < width bound keeping the bins
    honestly equi-depth-ish.  Boundary estimates are collected (<=
    n_bins-1 rows, bounded by construction) and the bin assignment is a
    pure map-side literal comparison sum.

    Exactness (the category_drift conventions): per-bin good/bad counts
    are exact integers off ONE (bin) conditional-count pass;
    WOE_q20 = micro_log2((good/G) * (B/bad)) — the two-division ratio
    form; IV contribution = delta_micro * WOE_q20, int64, so the
    cross-bin IV sum is order-independent.  Bins empty on either side
    are dropped (WOE undefined at 0) but still count in G/B.

    Output per surviving bin: ``bin`` (0-based), ``lo`` (lower boundary,
    NULL for bin 0), good/bad, the shared totals, ``delta_micro``,
    ``woe_q``, ``iv_q`` and the shared ``iv_total_q``.
    """
    from functools import reduce as _reduce

    from pyspark.sql.window import Window

    from mvrepair.functions.exactlog import micro_log2
    from mvrepair.operators.sketch import equiwidth_hist, hist_quantile_est

    if n_bins < 2:
        raise ValueError("woe_iv needs n_bins >= 2")
    base = df.select(
        F.col(value_col).cast("bigint").alias("__v"),
        F.col(label_col).cast("boolean").alias("__y"),
    )
    hist = equiwidth_hist(base, "__v", [], width)
    qs = [i * 1_000_000 // n_bins for i in range(1, n_bins)]
    bounds = sorted(
        {
            int(r["est"])
            for r in hist_quantile_est(hist, [], qs, width).collect()
        }
    )
    binc = _reduce(
        lambda a, b: a + b,
        [(F.col("__v") > F.lit(b)).cast("int") for b in bounds],
    ).cast("int")
    cnt = base.groupBy(binc.alias("bin")).agg(
        F.count(F.when(F.col("__y"), 1)).alias("good"),
        F.count(F.when(~F.col("__y"), 1)).alias("bad"),
    )
    w = Window.partitionBy()
    j = cnt.select(
        "bin",
        F.element_at(
            F.array(
                F.lit(None).cast("long"), *[F.lit(b) for b in bounds]
            ),
            F.col("bin") + 1,
        ).alias("lo"),
        "good",
        "bad",
        F.sum("good").over(w).alias("g_tot"),
        F.sum("bad").over(w).alias("b_tot"),
    ).filter((F.col("good") > 0) & (F.col("bad") > 0))
    pg = F.col("good").cast("double") / F.col("g_tot").cast("double")
    pb = F.col("bad").cast("double") / F.col("b_tot").cast("double")
    ratio = pg * (F.col("b_tot").cast("double") / F.col("bad").cast("double"))
    scored = j.select(
        "bin",
        "lo",
        "good",
        "bad",
        "g_tot",
        "b_tot",
        F.floor((pg - pb) * F.lit(1000000.0)).cast("long").alias(
            "delta_micro"
        ),
        micro_log2(ratio).alias("woe_q"),
    ).withColumn("iv_q", F.col("delta_micro") * F.col("woe_q"))
    return scored.select(
        "*", F.sum("iv_q").over(w).alias("iv_total_q")
    )


def benford_report(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-digit conformance check — the forensic DQ test for
    fabricated or truncated numeric feeds (Benford 1938; Nigrini's
    audit usage): across data spanning several decades, the leading
    digit d should appear with probability log10(1 + 1/d).

    All-integer deviation algebra (no float sums, no libm): the
    expected log-probabilities ship as PRECOMPUTED micro_log2 constants
    (``ML_d = micro_log2((d+1)/d)``, ``ML10 = micro_log2(10)`` — the
    same int64 in any engine by construction), and each digit's
    deviation is the exact int64 cross-product difference
    ``dev_q = c_d * ML10 - n * ML_d`` — zero iff the observed share
    equals Benford's in q20 units; ``/ (n * ML10)`` recovers the
    relative deviation.  ``|dev_q|`` sums order-independently into the
    single-number verdict.  Bound: n < ~2.6e12 keeps n * ML_d under
    2^63 (ML_d <= 2^20·log2 10 ≈ 3.5e6).

    First digit: string head of the positive integer value — identical
    in both engines for BIGINT; non-positive values are excluded (no
    leading digit).  Plan: ONE map-combinable digit-count pass, then
    constants and windows over the 9-row frame.
    """
    from pyspark.sql.window import Window

    from mvrepair.functions.exactlog import py_micro_log2

    ml10 = py_micro_log2(10.0)
    mls = {d: py_micro_log2((d + 1) / d) for d in range(1, 10)}
    v = F.col(value_col).cast("bigint")
    cnt = (
        df.filter(v > 0)
        .groupBy(
            F.substring(v.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy()
    ml_d = F.element_at(
        F.array(*[F.lit(mls[d]).cast("long") for d in range(1, 10)]),
        F.col("digit"),
    )
    scored = cnt.select(
        "digit",
        "c",
        F.sum("c").over(w).alias("n"),
        ml_d.alias("ml_d"),
        F.lit(ml10).cast("long").alias("ml10"),
    ).withColumn(
        "dev_q", F.col("c") * F.col("ml10") - F.col("n") * F.col("ml_d")
    )
    return scored.select(
        "*",
        F.sum(F.abs(F.col("dev_q"))).over(w).alias("abs_dev_total_q"),
    )


def numeric_drift_ks(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    quant: int = 100,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the two
    halves of a table's time range — the NUMERIC companion of
    :func:`category_drift`: D = max over values of |ECDF_A − ECDF_B|,
    the classic distribution-shift test for a continuous feed.

    EXACT integer algebra end to end: values quantize to
    ``floor(v·quant)`` units, cumulative counts are exact ints off one
    (unit, half) conditional-count pass, and the sup statistic is the
    max of the CROSS-MULTIPLIED difference ``|cumA·nB − cumB·nA|``
    (int64; bound na·nb < 2^63 ⇒ fine to ~3e9 rows per side) — never a
    float ECDF, so the argmax and ties are engine-exact.  The reported
    ``d_micro`` is the single deterministic division at the end.

    Scale note: the cumulative needs a GLOBAL order over the DISTINCT
    quantized values — one Exchange+Sort over the value-domain-sized
    frame (6.4k cents here; the exact-quantile family's cost shape).
    For an unbounded domain, pre-bin with ``sketch.equiwidth_hist`` and
    accept the bin-width resolution; the statistic over bins is the
    same algebra.

    Output: ONE row — ``(ks_at_unit, cum_a, cum_b, na, nb, d_num,
    d_micro)``: the smallest quantized value achieving the sup, the
    exact cross-product numerator, and micro-quantized D.
    """
    from pyspark.sql.window import Window

    us = _event_us(ts_col)
    [row] = df.agg(
        F.shiftright(F.min(us) + F.max(us), 1).alias("mid")
    ).collect()
    mid = F.lit(int(row["mid"]))
    q = F.floor(F.col(value_col).cast("double") * quant).cast("long")
    cnt = df.groupBy(q.alias("unit")).agg(
        F.count(F.when(us <= mid, 1)).alias("ca"),
        F.count(F.when(us > mid, 1)).alias("cb"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("unit").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cnt.select(
        "unit",
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    ).withColumn(
        "d_num",
        F.abs(
            F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
        ),
    )
    best = cum.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("d_num").desc(), F.col("unit").asc()))
        .alias("__rn"),
    ).filter(F.col("__rn") == 1)
    return best.select(
        F.col("unit").alias("ks_at_unit"),
        "cum_a",
        "cum_b",
        "na",
        "nb",
        "d_num",
        F.floor(
            F.col("d_num").cast("double")
            / (F.col("na") * F.col("nb")).cast("double")
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("d_micro"),
    )


def numeric_drift_w1(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    quant: int = 100,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) drift between the two
    halves of a table's time range — the MAGNITUDE companion of
    :func:`numeric_drift_ks`: where KS reports the worst single point
    of ECDF divergence, W1 integrates it, so a small-but-everywhere
    shift (mean drift) scores high even when no single value's gap is
    large.  On a 1-D empirical pair the transport integral collapses to

        W1 = Σ_i |F_A(u_i) − F_B(u_i)| · (u_{i+1} − u_i)

    over the sorted distinct quantized units — no assignment problem,
    one cumulative pass (Ramdas et al. 2017, "On Wasserstein two-sample
    testing", eq. 4; public result).

    EXACT integer algebra end to end, the KS discipline: per-unit term
    ``|cumA·nB − cumB·nA| · gap`` (int64), summed exactly, and the
    reported ``w1_micro`` (micro-units of the QUANTIZED domain, i.e.
    value·quant) is one exact floor division decomposed as
    ``q·1e6 + (r·1e6) DIV (na·nb)`` so no intermediate exceeds int64.
    Bound: Σ term ≤ na·nb·width; at na=nb=3e5 and width 6.4e3 that is
    ~5.8e17 < 2^63.  For wider domains pre-bin with a coarser ``quant``
    (the statistic over bins is the same algebra at bin resolution).

    Scale shape: identical to KS — one conditional-count pass over the
    corpus, then one Exchange+Sort over the value-DOMAIN-sized frame.
    Output ONE row: ``(n_units, na, nb, w1_num, w1_micro)``.
    """
    from pyspark.sql.window import Window

    us = _event_us(ts_col)
    [row] = df.agg(
        F.shiftright(F.min(us) + F.max(us), 1).alias("mid")
    ).collect()
    mid = F.lit(int(row["mid"]))
    q = F.floor(F.col(value_col).cast("double") * quant).cast("long")
    cnt = df.groupBy(q.alias("unit")).agg(
        F.count(F.when(us <= mid, 1)).alias("ca"),
        F.count(F.when(us > mid, 1)).alias("cb"),
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("unit")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = cnt.select(
        "unit",
        F.sum("ca").over(w_cum).alias("cum_a"),
        F.sum("cb").over(w_cum).alias("cum_b"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
        # gap to the NEXT distinct unit; the last unit closes the
        # integral (both ECDFs are 1 there), so its gap is 0.
        (F.coalesce(F.lead("unit").over(w_ord), F.col("unit"))
         - F.col("unit")).alias("gap"),
    )
    return stepped.groupBy().agg(
        F.count(F.lit(1)).alias("n_units"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
            * F.col("gap")
        ).alias("w1_num"),
    ).select(
        "n_units",
        "na",
        "nb",
        "w1_num",
        # exact floor((w1_num * 1e6) / (na*nb)) without the 1e6 blowup
        F.expr(
            "w1_num DIV (na * nb) * 1000000"
            " + (w1_num % (na * nb)) * 1000000 DIV (na * nb)"
        ).cast("long").alias("w1_micro"),
    )


def gini_concentration(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of a per-key value distribution — the
    concentration diagnostic ("how head-heavy is revenue per product /
    token mass per source / sample count per domain?") a curation
    pipeline reads before rebalancing; 0 = uniform, →1 = one key owns
    everything.

    Exact integer Lorenz algebra: per-key totals are exact int64 sums;
    with keys ranked ascending by (value, key), the numerator is
    ``Σ (2i − n − 1)·x_i`` accumulated in DECIMAL(38,0) (the
    event_trend cross-product precedent — n·x can pass 2^63 long
    before 10^38), and ``gini_micro = (1e6·num) DIV (n·Σx)`` is one
    integral divide on exact decimals (both engines truncate).  Ties
    rank deterministically by key; equal values make the sum
    tie-order-invariant anyway.

    Scale shape: one key-keyed aggregate (the corpus pass), then one
    Exchange+Sort + windows over the KEY-DOMAIN-sized frame (the exact
    KS/quantile family's cost; for unbounded key domains, Gini over
    histogram-sketch bins is the same algebra).  Output: ONE row
    ``(n_keys, total_value, gini_micro)``.
    """
    from pyspark.sql.window import Window

    per_key = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum(F.col(value_col).cast("long")).alias("__x")
    )
    w_all = Window.partitionBy()
    ranked = per_key.select(
        "__x",
        F.row_number()
        .over(Window.orderBy(F.col("__x").asc(), F.col("__k").asc()))
        .alias("__i"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    return ranked.agg(
        F.max("__n").alias("n_keys"),
        F.sum("__x").alias("total_value"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * sum(CAST((2 * __i - __n - 1) AS DECIMAL(38,0))"
            "       * CAST(__x AS DECIMAL(38,0))))"
            " DIV (CAST(max(__n) AS DECIMAL(38,0))"
            "      * CAST(sum(__x) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_micro"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    q: int = 100,
) -> DataFrame:
    """Cross-group quantile normalization (the microarray-era recipe,
    Bolstad et al. 2003, at q-quantile resolution): replace each row's
    value with the POOLED distribution's value at the row's
    within-group relative rank — after it, every group has the same
    marginal distribution, which is how heterogeneous quality/length
    scores from different sources become comparable before a global
    threshold is applied.

    Exact integer algebra, type-1 quantile semantics throughout (the
    token_quantiles convention): within-group percentile
    p = ⌈q·r / n_g⌉ from a group-partitioned rank window; pooled
    quantile p = the value at pooled position ⌈N·p / q⌉, computed from
    the value-DOMAIN cumulative frame (one domain-sized Exchange+Sort —
    the part_gini exception, never a corpus-wide global sort) via the
    hist fan-filter-min pattern; the q-row pooled map broadcast-joins
    back to the corpus.

    Scale shape: one group-partitioned rank window (parallel across
    groups), one domain-sized cumulative, one broadcast join.  No
    corpus-sized global window anywhere.

    Output: ``(id, group, value, pct, norm_value)``.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("group"),
        F.col(value_col).cast("long").alias("value"),
    )
    w_grp = Window.partitionBy("group").orderBy("value", "id")
    w_n = Window.partitionBy("group")
    ranked = base.select(
        "*",
        F.row_number().over(w_grp).cast("long").alias("__r"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("__n"),
    ).withColumn(
        "pct", F.expr(f"({q} * __r + __n - 1) DIV __n").cast("long")
    )
    dom = base.groupBy("value").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    cumf = dom.select(
        "value",
        F.sum("__cnt").over(w_cum).alias("__cum"),
        F.sum("__cnt").over(w_tot).alias("__N"),
    )
    grid = F.array(*[F.lit(int(p)).cast("long") for p in range(1, q + 1)])
    pool = (
        cumf.withColumn("__p", F.explode(grid))
        .filter(
            F.col("__cum") >= F.expr(f"(__N * __p + {q - 1}) DIV {q}")
        )
        .groupBy(F.col("__p").alias("pct"))
        .agg(F.min("value").alias("norm_value"))
    )
    return ranked.join(F.broadcast(pool), "pct").select(
        "id", "group", "value", "pct", "norm_value"
    )
