"""Deterministic sampling & split-assignment for training-data pipelines.

``df.sample`` is seed-dependent per partition layout, which makes results
unstable under repartitioning — unacceptable for a reproducible 100 TB
pipeline.  These operators derive membership from a content hash instead
(``stable_hash64``: md5-based, engine-portable), so the same row lands in
the same split on any cluster, any partitioning, any engine:

- ``hash_split``: train/val/test assignment from ``hash(id) mod 100``
  ranges.  Pure projection — no shuffle, no state.
- ``stratified_sample``: keep ``fraction`` of rows per key by hash
  threshold; deterministic twin of ``sampleBy`` with exact replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mvrepair.functions import stable_hash64

DEFAULT_SPLITS: list[tuple[str, int, int]] = [
    ("train", 0, 98),
    ("val", 98, 99),
    ("test", 99, 100),
]


def _bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket 0..buckets-1 from the id's decimal rendering."""
    return stable_hash64(id_col.cast("string")) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, int, int]] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a split label from hash-bucket ranges.

    ``splits`` is a list of (label, lo, hi) half-open percent ranges over
    ``hash(id) mod 100``; defaults to 98/1/1 train/val/test.
    """
    splits = splits or DEFAULT_SPLITS
    b = _bucket(F.col(id_col))
    expr = None
    for label, lo, hi in splits:
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(out_col, expr)


def split_contamination(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Eval-set docs whose exact text also appears in the train split.

    The train/test contamination check every training pipeline needs before
    shipping a split: assign splits (hash-bucket, reproducible), digest the
    text, and left-semi join the val/test side against the distinct train
    digests.  Output: (doc_id, split, text_hash) of contaminated eval docs.

    Scale shape: both sides reduce to (digest) / (digest, id, split) rows
    before the join — the wire never carries document text.  The train side
    is distinct-aggregated (map-side combine), and the join is a semi join
    on the digest, so Catalyst/AQE can broadcast the (tiny) eval side or
    shuffle both on the digest; either plan is one shuffle of digests.
    """
    s = hash_split(df, id_col, splits).select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"), F.col("split")
    )
    train = s.filter(F.col("split") == "train").select("text_hash").distinct()
    evals = s.filter(F.col("split") != "train")
    return evals.join(train, "text_hash", "left_semi").select(
        id_col, "split", "text_hash"
    )


def stratified_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    buckets: int = 1000,
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by id hash.

    Exactly reproducible: re-running (or re-reading on another cluster)
    selects the same rows.  Use a per-stratum fraction by filtering the
    strata first — the hash threshold composes with any predicate.
    """
    thresh = int(fraction * buckets)
    return df.filter(_bucket(F.col(id_col), buckets) < thresh)


def weighted_mix(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = 1000,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic weighted corpus mixing: per-source epoch counts.

    Training mixtures are specified as "repeat source A for 2.4 epochs,
    source B for 0.5" — a rate ``r`` per ``key_col`` value meaning each
    row yields ``floor(r)`` full copies plus one extra iff
    ``hash(id) mod buckets < frac(r) * buckets``.  Rates are quantized to
    ``1/buckets`` in DRIVER-side Python integers, so membership is exact
    integer arithmetic in the plan (no float thresholds to drift between
    engines or re-runs) and the selection of the fractional-epoch subset
    is the same documents on every cluster and every partitioning.

    Output: the input columns plus ``epoch_col`` (int, ``0..n_copies-1``).

    Scale shape: pure per-row projection + ``explode`` — no shuffle, no
    state; output volume is exactly ``Σ rate_s · |source_s|`` rows.  The
    rate table rides in the plan as a chained-``when`` literal (mixtures
    are a handful of sources; a thousand-source mixture would move to a
    broadcast-joined rate dimension, same semantics).
    """
    def _quantize(r: float) -> tuple[int, int]:
        millis = int(round(float(r) * buckets))
        if millis < 0:
            raise ValueError(f"negative mix rate {r!r}")
        return millis // buckets, millis % buckets

    whole_expr: Column | None = None
    rem_expr: Column | None = None
    for key in sorted(rates):
        whole, rem = _quantize(rates[key])
        cond = F.col(key_col) == key
        whole_expr = (
            F.when(cond, whole) if whole_expr is None else whole_expr.when(cond, whole)
        )
        rem_expr = F.when(cond, rem) if rem_expr is None else rem_expr.when(cond, rem)
    d_whole, d_rem = _quantize(default_rate)
    whole_expr = F.lit(d_whole) if whole_expr is None else whole_expr.otherwise(d_whole)
    rem_expr = F.lit(d_rem) if rem_expr is None else rem_expr.otherwise(d_rem)

    bucket = _bucket(F.col(id_col), buckets)
    n_copies = (whole_expr + F.when(bucket < rem_expr, 1).otherwise(0)).cast("int")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - F.lit(1))),
        )
        .drop("__n_copies")
    )


def dsir_scores(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much its hashed-unigram distribution looks like the TARGET
    subset (rows where ``target_pred`` holds) versus the raw corpus.

    Per hash bucket ``b`` (``stable_hash64(token) mod buckets``), the
    log-likelihood-ratio weight is

        w(b) = mlog2( ((ct+1)/(Tt+B)) / ((cr+1)/(Tr+B)) )

    with ``ct``/``cr`` the target/raw token counts in the bucket,
    ``Tt``/``Tr`` the totals, ``B`` the bucket count (add-one smoothing),
    and ``mlog2`` the cross-engine-EXACT quantized log2 of
    ``mvrepair.functions.exactlog`` (2^20 scale).  Weights quantize to
    int64 BEFORE the per-doc sum (the bm25 convention: order-independent
    exact aggregation); the quantizer itself composes only IEEE-exact
    ops, because the previous floor(ln*1e6) convention was MEASURED to
    floor differently across Java/libm on boundary-adversarial grids.
    Output per doc: ``n_tokens``, ``dsir_micro`` (sum of its tokens'
    bucket weights) — resampling keeps the high-score tail.

    Scale shape: ONE corpus token pass — both distributions and the
    scoring pass derive from the same per-(doc, bucket) aggregate, whose
    shuffle Spark's ReuseExchange dedupes (the two consumers are
    plan-identical), so the corpus is scanned and exploded exactly once;
    everything downstream of it is doc-count-sized or smaller.  The
    bucket totals reduce over ``buckets`` rows (an empty-frame window,
    single tiny partition by construction), and the weight table is
    broadcast to the scoring join — no driver-side artifacts at all,
    unlike bm25's collected idf map.
    """
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    tok = df.select(
        F.col(id_col),
        target_pred.alias("__t"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).select(
        id_col,
        "__t",
        # coalesce makes the bucket NON-NULLABLE (split yields no null
        # tokens, so the 0 branch is dead): without it the inner join
        # injects isnotnull(__b) into the scoring branch only, the two
        # corpus subplans stop being identical, and ReuseExchange —
        # the whole one-pass design — silently fails to fire.
        F.coalesce(stable_hash64(F.col("__tok")) % buckets, F.lit(0)).alias(
            "__b"
        ),
    )
    # The one corpus-sized aggregate; __t is constant per doc so adding it
    # to the key changes nothing semantically but lets the distribution
    # pass reuse this exchange instead of re-exploding the corpus.
    doc_bucket = tok.groupBy(id_col, "__t", "__b").agg(
        F.count(F.lit(1)).alias("__n")
    )
    counts = doc_bucket.groupBy("__b").agg(
        F.sum("__n").alias("__cr"),
        F.coalesce(F.sum(F.when(F.col("__t"), F.col("__n"))), F.lit(0)).alias(
            "__ct"
        ),
    )
    everything = Window.partitionBy()
    weights = counts.select(
        "__b",
        "__cr",
        "__ct",
        F.sum("__cr").over(everything).alias("__tr"),
        F.sum("__ct").over(everything).alias("__tt"),
    )
    # weight = mlog2 of the likelihood RATIO: the target and raw unigram
    # ratios are each one correctly-rounded double division of exact
    # integers, their quotient a third — so both engines hand the
    # cross-engine-exact quantizer (mvrepair.functions.exactlog, which
    # replaced the measurably hash-flaky floor(ln*1e6) convention) the
    # identical double.
    from mvrepair.functions.exactlog import micro_log2_df

    weights = micro_log2_df(
        weights.select(
            "__b",
            (
                (
                    (F.col("__ct") + 1).cast("double")
                    / (F.col("__tt") + buckets)
                )
                / (
                    (F.col("__cr") + 1).cast("double")
                    / (F.col("__tr") + buckets)
                )
            ).alias("__r"),
        ),
        F.col("__r"),
        "__w",
        ["__b"],
    )
    return (
        doc_bucket.join(broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_tokens"),
            F.sum(F.col("__n") * F.col("__w")).alias("dsir_micro"),
        )
    )


def token_budget_fill(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 4096,
) -> DataFrame:
    """Fill a per-group token budget with the highest-quality documents —
    the final selection step of a pretraining data build ("take the best
    N billion tokens from each source").

    Contract: per group, documents are ordered (quality_score DESC,
    id ASC) and the greedy prefix whose running token total stays within
    ``budget`` is kept.  Output: (id, group, quality_score, n_tokens) of
    the kept rows — deterministic on any partitioning.

    Scale shape: the naive formulation is a running-sum window over every
    row of a group — one task per group, a non-starter when one source is
    half the corpus.  The prefix decomposes TWICE:

    1. By CLASS — the quality score is a small integer (0-3), so a tiny
       (groups x 4)-row aggregate of per-class token totals + a running
       sum over THAT frame decides each class as fully-kept / boundary /
       dropped; fully-kept classes pass with a broadcast-join comparison
       (map-side, no sort).  Equivalent to the naive prefix because every
       doc of a higher class precedes every doc of a lower one in the
       greedy order.
    2. By ID-RANGE BUCKET within the single boundary class — the id is
       numeric, so ``id div bucket_width`` is an order-preserving,
       sampling-free bucketing.  A per-(group, bucket) token-sum
       aggregate + a running sum over the bucket frame (rows/width per
       group, not rows per group) decides whole buckets map-side; ONLY
       the one crossing bucket per group pays a row-level sort window,
       over its own <= ``bucket_width`` docs.  The bucket join, the
       bucket-frame window, and the crossing-bucket window all key on
       (group, bucket), so the exchange is reused.  Exact: every row of
       a bucket past the crossing bucket has running total above the
       budget (token counts are non-negative), including 0-token docs.

    Falls back to the single boundary-class window when the id column is
    non-numeric (order-preserving bucketing needs a numeric id) or
    ``bucket_width <= 1``.
    """
    from pyspark.sql.functions import broadcast
    from pyspark.sql.types import NumericType
    from pyspark.sql.window import Window

    from mvrepair.operators.text import _quality_score_expr, tokenize

    scored = df.select(
        F.col(group_col),
        F.col(id_col),
        _quality_score_expr(text_col).cast("int").alias("quality_score"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    per_class = scored.groupBy(group_col, "quality_score").agg(
        F.sum("n_tokens").alias("__ct")
    )
    # running total over the class frame: <= 4 rows per group, no ties on
    # the (unique) class key, so the window is deterministic and tiny
    wc = Window.partitionBy(group_col).orderBy(
        F.desc("quality_score")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes = per_class.withColumn("__cum", F.sum("__ct").over(wc)).withColumn(
        "__before", F.col("__cum") - F.col("__ct")
    )
    tagged = scored.join(broadcast(classes), [group_col, "quality_score"])
    out_cols = [id_col, group_col, "quality_score", "n_tokens"]
    full = tagged.filter(F.col("__cum") <= budget).select(*out_cols)
    boundary = tagged.filter(
        (F.col("__before") <= budget) & (F.col("__cum") > budget)
    )
    id_numeric = isinstance(df.schema[id_col].dataType, NumericType)
    if id_numeric and bucket_width > 1:
        bkt = F.expr(f"`{id_col}` div {int(bucket_width)}").cast("long")
        b = boundary.withColumn("__bkt", bkt)
        per_bkt = b.groupBy(group_col, "__bkt").agg(
            F.sum("n_tokens").alias("__bt")
        )
        wk = Window.partitionBy(group_col).orderBy(F.asc("__bkt")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        bkts = (
            per_bkt.withColumn("__bcum", F.sum("__bt").over(wk))
            .withColumn("__bbefore", F.col("__bcum") - F.col("__bt"))
            .select(group_col, "__bkt", "__bcum", "__bbefore")
        )
        # no broadcast hint: the bucket frame is rows/width per group —
        # small at test scale (AQE broadcasts it), but a web-scale
        # boundary class can have 1e6+ buckets; a (group, bucket)-keyed
        # shuffle join stays safe and its exchange is shared with the
        # crossing-bucket window below.
        bt = b.join(bkts, [group_col, "__bkt"])
        remaining_hit = F.col("__before") + F.col("__bcum")
        bfull = bt.filter(remaining_hit <= budget).select(*out_cols)
        bedge = bt.filter(
            (F.col("__before") + F.col("__bbefore") <= budget)
            & (remaining_hit > budget)
        )
        wb = Window.partitionBy(group_col, "__bkt").orderBy(
            F.asc(id_col)
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        partial = (
            bedge.withColumn(
                "__run",
                F.col("__before")
                + F.col("__bbefore")
                + F.sum("n_tokens").over(wb),
            )
            .filter(F.col("__run") <= budget)
            .select(*out_cols)
        )
        return full.unionByName(bfull).unionByName(partial)
    wb = Window.partitionBy(group_col).orderBy(F.asc(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    partial = (
        boundary.withColumn(
            "__run", F.col("__before") + F.sum("n_tokens").over(wb)
        )
        .filter(F.col("__run") <= budget)
        .select(*out_cols)
    )
    return full.unionByName(partial)


def quality_percentiles(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document percentile rank of the quality score within its group
    — the rank-normalization step quality-threshold pipelines use when
    absolute scores aren't comparable across sources ("keep each
    source's top 30%").

    Contract per doc: ``pct_micro = count_below * 1e6 div (n_group - 1)``
    (percent_rank with ties sharing the minimum rank — the SQL
    ``percent_rank()`` convention — in exact integer micro-units; 0 when
    the group has one doc).  Integer division of exact counts, so both
    engines agree bit-for-bit.

    Scale shape: the naive formulation is ``percent_rank() OVER
    (PARTITION BY group ORDER BY score)`` — a full sort of every group,
    one task per group.  The quality score is a small integer (0-3), so
    the rank decomposes by CLASS exactly like ``token_budget_fill``'s
    budget: a (groups x 4)-row count frame + a running total over THAT
    frame gives ``count_below`` per (group, class); every doc then gets
    its percentile from a broadcast join — map-side, ZERO sort tasks at
    any scale.
    """
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    from mvrepair.operators.text import _quality_score_expr

    scored = df.select(
        F.col(group_col),
        F.col(id_col),
        _quality_score_expr(text_col).cast("int").alias("quality_score"),
    )
    per_class = scored.groupBy(group_col, "quality_score").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wc = Window.partitionBy(group_col).orderBy(F.asc("quality_score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(group_col)
    classes = per_class.select(
        group_col,
        "quality_score",
        (F.sum("__n").over(wc) - F.col("__n")).alias("__below"),
        F.sum("__n").over(wt).alias("__total"),
    )
    return scored.join(broadcast(classes), [group_col, "quality_score"]).select(
        id_col,
        group_col,
        "quality_score",
        F.when(F.col("__total") > 1,
               F.expr("__below * 1000000 div (__total - 1)"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("pct_micro"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight: Column,
    id_col: str = "doc_id",
    keep: list[str] | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis-Spirakis A-ES
    priority sampling (Inf. Process. Lett. 2006): every row gets key
    u^(1/w) for a uniform u, and the top-n keys ARE a weighted sample
    without replacement.  The pretraining-data use case is "sample
    documents proportional to token count / quality weight,
    reproducibly, in one pass" — the sampling mode corpus builds use
    between the rate-based ``doc_sample`` (fixed fraction per bucket)
    and the greedy ``token_budget_fill`` (take the best prefix).

    Engine-portable exact arithmetic end to end:

    - u = ((stable_hash64(id) mod 2^31) + 1) / 2^31 — a dyadic rational
      in (0, 1], exactly representable, identical in any engine
      (seedless and reproducible: the id IS the randomness, the
      corpus-diff/doc_sample convention);
    - the A-ES key is monotone in log2(u)/w, so rows are ranked by
      ``priority = (micro_log2(u) * scale) div w`` — micro_log2 is the
      repo's bit-exact quantized log2, the products stay well inside
      int64 (|micro_log2| <= 64e6 · scale = 6.4e13), and the division
      truncates identically in Spark (`div` semantics, here as the
      subtract-remainder form) and DuckDB (`//`);
    - ties (same quantized priority) break on ascending id.

    Quantization makes this a DEFINED sampling design, not an
    approximation of one: the keys are a deterministic monotone
    function of (u, w), which is all A-ES requires — two engines (and a
    rerun tomorrow) select the identical sample.

    Scale shape: one map-side projection (hash + the fixed 11-step
    micro_log2 ladder per row) + TakeOrderedAndProject for the top-n —
    no shuffle wider than n rows, no window over the corpus.  Rows with
    non-positive weight are excluded (a zero-weight row has key 0 in
    A-ES — never sampled — and its log form would divide by zero).

    Output: (*keep, id_col, weight bigint, priority bigint), the n
    sampled rows, priority desc / id asc.
    """
    from mvrepair.functions.exactlog import micro_log2

    keep = keep if keep is not None else []
    m = 1 << 31
    pm = stable_hash64(F.col(id_col).cast("string")) % F.lit(m)
    u = (pm + 1).cast("double") / F.lit(float(m))
    w = weight.cast("long")
    ls = micro_log2(u) * F.lit(int(scale))
    # truncating integer division, sign-portable: a - a % w is exactly
    # divisible, the double quotient of exact int64s <= 6.4e13 is exact
    priority = ((ls - ls % w) / w).cast("long")
    return (
        df.select(
            *keep,
            F.col(id_col),
            w.alias("weight"),
            priority.alias("priority"),
        )
        .filter(F.col("weight") > 0)
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(n)
    )


def weighted_sample_per_group(
    df: DataFrame,
    n_per_group: int,
    weight: Column,
    group_col: str,
    id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """STRATIFIED weighted sampling without replacement: the A-ES
    priority key of ``weighted_sample`` ranked WITHIN each stratum — the
    corpus-build mode "best-n documents per source, proportional to
    weight, reproducible" (a global top-n lets one giant stratum crowd
    out every small one; per-source caps are how real mixes are specced,
    cf. the corpus_mix weights).

    Identical exact arithmetic to ``weighted_sample`` (same dyadic u,
    same micro_log2 ladder, same truncating division, same ties), so a
    stratum's sample equals what ``weighted_sample`` would pick from
    that stratum alone — pinned by test.

    Scale shape: the same one map-side projection, then ONE exchange on
    ``group_col`` under a rank window that Spark executes as
    WindowGroupLimit (per-partition top-n pushdown BEFORE the shuffle,
    the posting_lists shape) — never a corpus-wide sort, state bounded
    by n_per_group per stratum.
    """
    from pyspark.sql.window import Window

    from mvrepair.functions.exactlog import micro_log2

    m = 1 << 31
    pm = stable_hash64(F.col(id_col).cast("string")) % F.lit(m)
    u = (pm + 1).cast("double") / F.lit(float(m))
    w = weight.cast("long")
    ls = micro_log2(u) * F.lit(int(scale))
    priority = ((ls - ls % w) / w).cast("long")
    win = Window.partitionBy(group_col).orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(group_col),
            F.col(id_col),
            w.alias("weight"),
            priority.alias("priority"),
        )
        .filter(F.col("weight") > 0)
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= n_per_group)
        .select(
            group_col, id_col, "weight", "priority",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def contrastive_negatives(
    df: DataFrame,
    id_col: str = "doc_id",
    n_negatives: int = 3,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic negative-pair mining for contrastive training: each
    anchor row gets ``n_negatives`` pseudo-random negatives drawn from
    the corpus, reproducible on any cluster / partitioning / engine
    (the hash_split doctrine — never ``df.sample``).

    Scheme: every row is assigned a hash bucket (``stable_hash64(id) %
    n_buckets``); each bucket elects one REPRESENTATIVE (the row whose
    salted hash is minimal, id as tiebreak).  Anchor i's j-th negative
    is the representative of bucket ``stable_hash64(id || '#' || j) %
    n_buckets`` — a fresh hash draw per (anchor, j), so negatives are
    spread uniformly over the representative set.  Self-pairs (the
    anchor drew its own bucket's rep and IS the rep) are dropped;
    duplicate draws (two j landing on the same bucket) are kept —
    standard with-replacement negative sampling.

    Output: ``(anchor_id, j, negative_id)``.

    Scale shape — the corpus NEVER shuffles: the representative election
    is a ``min(struct(salted_hash, id))`` aggregate onto ``n_buckets``
    rows (map-side combinable: each task contributes at most n_buckets
    partial rows), and the anchor side is a row-local explode of j=1..k
    plus a BROADCAST join against the tiny representative table.  At
    100 TB this is two map passes and one n_buckets-row broadcast —
    no corpus exchange anywhere.
    """
    rep_h = stable_hash64(F.concat(F.col(id_col).cast("string"), F.lit("#rep")))
    reps = (
        df.select(
            _bucket(F.col(id_col), n_buckets).alias("__bucket"),
            rep_h.alias("__h"),
            F.col(id_col),
        )
        .groupBy("__bucket")
        .agg(
            F.min(F.struct(F.col("__h"), F.col(id_col))).alias("__best")
        )
        .select(
            F.col("__bucket"),
            F.col(f"__best.{id_col}").alias("negative_id"),
        )
    )
    anchors = df.select(F.col(id_col).alias("anchor_id")).withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(1, n_negatives + 1)]))
    )
    anchors = anchors.withColumn(
        "__bucket",
        stable_hash64(
            F.concat(
                F.col("anchor_id").cast("string"),
                F.lit("#"),
                F.col("j").cast("string"),
            )
        )
        % F.lit(n_buckets),
    )
    return (
        anchors.join(F.broadcast(reps), "__bucket")
        .filter(F.col("anchor_id") != F.col("negative_id"))
        .select(
            "anchor_id", F.col("j").cast("int").alias("j"), "negative_id"
        )
    )


def budget_apportion(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer budget
    across keys, proportional to exact integer weights — the crawl/
    sampling PLANNER's primitive: "we can afford ``budget`` documents
    next epoch; how many from each source, proportional to its token
    mass, such that the allocations are integers and sum EXACTLY to the
    budget?"  Rounding each share independently never sums right;
    Hamilton's method (base = floor share, then +1 to the largest
    remainders until the budget is spent) is the classic fix, fully
    deterministic here (remainder ties resolve by key).

    All arithmetic is exact int64: ``base = (budget·w) DIV W``,
    ``rem = (budget·w) % W`` (both engines truncate non-negatives);
    bound: ``budget·max(w) < 2^63``.  The output carries
    ``total_alloc`` as a self-audit column — it equals ``budget`` BY
    CONSTRUCTION on every row (the leftover L = budget − Σbase is
    exactly the number of +1s handed out, since Σrem = L·W).

    Plan: ONE map-combinable weight aggregate (the only corpus-sized
    pass), then rank/sum windows over the |keys|-row frame.
    """
    from pyspark.sql.window import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("wt")
    )
    w_all = Window.partitionBy()
    t = agg.select(
        "key", "wt", F.sum("wt").over(w_all).alias("__tot")
    )
    t = t.select(
        "key",
        "wt",
        F.expr(f"({budget} * wt) DIV __tot").alias("base"),
        F.expr(f"({budget} * wt) % __tot").alias("rem"),
    )
    t = t.select(
        "key",
        "wt",
        "base",
        "rem",
        (F.lit(budget) - F.sum("base").over(w_all)).alias("__left"),
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("key").asc()))
        .cast("int")
        .alias("rnk"),
    )
    t = t.withColumn(
        "alloc",
        F.col("base")
        + F.when(F.col("rnk") <= F.col("__left"), 1).otherwise(0),
    )
    return t.select(
        "key",
        "wt",
        "base",
        "rem",
        "rnk",
        "alloc",
        F.sum("alloc").over(w_all).alias("total_alloc"),
    )
