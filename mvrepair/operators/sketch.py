"""Deterministic sketches: KMV cardinality (+ theta intersection),
Bloom semi-join reduction, Count-Min frequency (+ join-size inner
product), key-skew profiling, HLL registers.

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


def kmv_distinct_by(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Per-GROUP KMV distinct-count sketches — one row per group with
    the same estimator as ``kmv_distinct`` (per-source vocabulary /
    distinct-user counts, the profile a mix designer reads before
    weighting sources).

    Scale shape: distinct (group, hash) pairs, then ONE exchange on the
    group under a rank window Spark executes as WindowGroupLimit — the
    per-partition top-k cut runs BEFORE the shuffle, so at most
    ``partitions x k`` rows per group move, never the corpus (the
    grouped form of the bottom-k TakeOrdered; sketches stay mergeable
    by construction: the union of two groups' bottom-k sets bottom-k's
    to the merged sketch).

    Output: (group_col, k int, n_seen bigint, kth_min bigint,
    est_distinct double), one row per group.
    """
    from pyspark.sql.window import Window

    if k < 3:
        raise ValueError("KMV needs k >= 3 (variance is 1/sqrt(k-2))")
    hashes = (
        df.select(
            F.col(group_col),
            stable_hash64(F.col(col).cast("string")).alias("h"),
        )
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    win = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    bottom = hashes.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= k
    )
    est: Column = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.max("h").cast("double")
    )
    return bottom.groupBy(group_col).agg(
        F.lit(k).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth_min"),
        est.alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Bloom semi-join reduction (runtime row-filter, made explicit)
# ---------------------------------------------------------------------------
#
# THE 100 TB join-pruning pattern: when the filtered dim side is too big
# to broadcast as ROWS but its qualifying-key SET still fits a few KB of
# BITS, a Bloom filter of the keys prunes the fact scan BEFORE the
# shuffle — Spark's own InjectRuntimeFilter/BloomFilterAggregate does
# exactly this behind AQE, but its bit layout is implementation-specific
# (no external oracle can replay it) and it only fires when statistics
# cooperate.  This is the deterministic, engine-portable form: k md5
# stable-hash bit positions per key, a fixed m-bit bitmap, membership as
# pure map-side integer algebra.  No false negatives ever (a wrong
# bitmap that dropped a real key WOULD flip the final hash, so the
# oracle gate checks the property end to end); false positives are
# eliminated by the exact join that follows, so the semantics of
# bloom-prune + join are EXACTLY those of the plain join — the filter
# only changes how many fact rows survive the scan.

# 2^b for b in 0..63 as SIGNED int64 literals (bit 63 is the sign bit);
# indexing this array replaces a variable-amount shift, which the
# column API only takes as a Python-literal amount
_POW2 = [1 << b for b in range(63)] + [-(1 << 63)]


def _bloom_positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    """The k bit positions of a key: independent hash functions derived
    from the repo-wide md5 ``stable_hash64`` by salting the rendered key
    with the function index (the MinHash row convention); each position
    is ``hash % m_bits`` — non-negative because the hash is 60-bit.

    Measured design note: Kirsch-Mitzenmacher double hashing (one md5
    split into h1 + i·h2 strides) looks like a k× hash saving but ran
    ~1.9x SLOWER on a 5M-row prune — the membership test is a
    short-circuiting AND, so Spark's whole-stage subexpression
    elimination cannot hoist the shared hash out of the conditional
    branches (it re-evaluates per test), while the salted form pays
    only ~1 md5 per REJECTED row because the first failing test ends
    the row.  k independent salts it is."""
    return [
        stable_hash64(F.concat(key.cast("string"), F.lit(f"#b{i}")))
        % m_bits
        for i in range(k_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 8192, k_hashes: int = 4
) -> list[int]:
    """Build the bitmap driver-side: ONE distinct-positions aggregate
    (bounded by ``m_bits`` rows — the train_kmeans model-artifact
    precedent: positions, never keys, reach the driver) folded into
    ``m_bits/64`` signed int64 words.  The artifact broadcasts into
    every task as a literal, like every other model here."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos_rows = (
        df.select(
            F.explode(
                F.array(
                    *_bloom_positions(F.col(key_col), m_bits, k_hashes)
                )
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # fold into signed int64 (bit 63 set -> negative) for the literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k_hashes: int
) -> Column:
    """Map-side membership test: all k bits set.  Pure integer algebra
    (md5 + element_at + bitwiseAND) — no shuffle, no UDF, and a DuckDB
    twin replays it exactly (`&`, `>>`, list indexing)."""
    wlit, plit = F.lit(words), F.lit(_POW2)
    tests = []
    for p in _bloom_positions(key, m_bits, k_hashes):
        word = F.element_at(wlit, F.shiftright(p, 6).cast("int") + 1)
        mask = F.element_at(plit, (p % 64).cast("int") + 1)
        tests.append(word.bitwiseAND(mask) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semijoin(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int | None = None,
    k_hashes: int = 4,
) -> DataFrame:
    """Prune ``fact`` to rows whose key MIGHT be in ``dim``'s key set
    (no false negatives; false-positive rate ≈ (1-e^(-kn/m))^k, ~2.4%
    at the n=m/8, k=4 design point).  The caller joins the survivors
    exactly — the join's semantics are unchanged, its input is a
    fraction of the scan.  At 100 TB this is the shuffle you don't pay:
    the bitmap is m/8 bytes regardless of dim row width, so it applies
    precisely where broadcast-hash-join can't.

    SIZING matters twice, not once (measured at sf0.1): an undersized
    bitmap (n >> m/8) doesn't just leak false positives through to the
    exact join — it makes the PRUNE itself slower, because each of the
    k tests passes with probability ≈ the fraction of set bits, so the
    short-circuiting AND stops rejecting early (at 77% bits set the
    average row pays ~4 hashes instead of ~1.6 and 35% of non-members
    leak).  ``m_bits=None`` (default) applies the rule
    m = next_pow2(8·n) floored at 512 — one count() over the dim, the
    same bounded pre-pass the build's position collect already is."""
    if m_bits is None:
        n = dim.count()
        m_bits = 512
        while m_bits < 8 * max(1, n):
            m_bits *= 2
    words = bloom_build(dim, dim_key, m_bits, k_hashes)
    return fact.filter(
        bloom_might_contain(F.col(fact_key), words, m_bits, k_hashes)
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top_keys: int = 10
) -> DataFrame:
    """Pre-flight skew diagnostics for a shuffle key: exact group-size
    distribution stats, computed scalably and in pure integer arithmetic.

    Before shuffling 100 TB on a key (a join, a groupBy, a repartition),
    the question is always "how bad is the heaviest key?" — this answers
    it without the naive global sort: group sizes reduce to a SIZE
    HISTOGRAM (groupBy(size).count — output is #distinct-sizes rows, a
    few thousand even at web scale), and every statistic is a window over
    that tiny frame.  Two map-side-combinable aggregates total; the only
    corpus-sized exchange is the per-key count itself.

    Output (stat, value) rows, all int64:
    ``n_rows``/``n_keys``/``max_size``; discrete type-1 quantiles of the
    key-size distribution ``p50_size``/``p90_size``/``p99_size``
    (``cum*den >= num*n_keys`` — the token_quantiles integer-position
    convention, no float rounding anywhere); and concentration shares
    ``top1_share_micro``/``top{K}_share_micro`` (micro-units, floor
    division) — the fraction of ALL rows owned by the heaviest 1 / K
    keys, i.e. the number that decides between a plain shuffle, AQE skew
    handling, and salting.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__sz"))
    hist = counts.groupBy("__sz").agg(F.count(F.lit(1)).alias("__k"))
    asc = Window.orderBy("__sz").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    desc = Window.orderBy(F.desc("__sz")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    h = hist.select(
        "__sz",
        "__k",
        F.sum("__k").over(asc).alias("__cum"),
        F.sum("__k").over(desc).alias("__cumd"),
        F.sum("__k").over(tot).alias("__nk"),
        F.sum(F.col("__sz") * F.col("__k")).over(tot).alias("__nr"),
    )

    def q(num: int, den: int) -> Column:
        # smallest size whose cumulative key count reaches ceil(q*n_keys):
        # cum >= ceil(num*nk/den)  <=>  cum*den >= num*nk  (integers)
        return F.min(
            F.when(
                F.col("__cum") * den >= F.col("__nk") * num, F.col("__sz")
            )
        )

    remaining = F.greatest(
        F.lit(top_keys) - (F.col("__cumd") - F.col("__k")), F.lit(0)
    )
    agg = h.agg(
        F.max("__nr").alias("n_rows"),
        F.max("__nk").alias("n_keys"),
        F.max("__sz").alias("max_size"),
        q(1, 2).alias("p50_size"),
        q(9, 10).alias("p90_size"),
        q(99, 100).alias("p99_size"),
        F.sum(
            F.col("__sz") * F.least(F.col("__k"), remaining)
        ).alias("__top_rows"),
    )
    stats = [
        ("n_rows", F.col("n_rows")),
        ("n_keys", F.col("n_keys")),
        ("max_size", F.col("max_size")),
        ("p50_size", F.col("p50_size")),
        ("p90_size", F.col("p90_size")),
        ("p99_size", F.col("p99_size")),
        ("top1_share_micro", F.expr("max_size * 1000000 DIV n_rows")),
        (
            f"top{top_keys}_share_micro",
            F.expr("__top_rows * 1000000 DIV n_rows"),
        ),
    ]
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("stat"), col.cast("long").alias("value")
            )
            for name, col in stats
        ]
    )
    return agg.select(F.explode(arr).alias("__s")).select(
        "__s.stat", "__s.value"
    )


# ---------------------------------------------------------------------------
# HyperLogLog with engine-portable registers (Flajolet et al. 2007).
# ---------------------------------------------------------------------------

HLL_P = 7  # 2^7 = 128 registers; std err ≈ 1.04/sqrt(128) ≈ 9.2%
HLL_M = 1 << HLL_P
# alpha_m for m >= 128 (Flajolet et al. §4); the full numerator
# alpha_m * m^2 * 2^RMAX is folded into ONE double literal so Spark and
# the oracle divide the same two IEEE doubles — no transcendental, no
# re-association.
_HLL_RMAX = 61 - HLL_P  # max rho: (60 - p) suffix bits, +1 for suffix == 0
HLL_RAW_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * float(
    1 << (HLL_P + HLL_P + _HLL_RMAX)
)


def hll_registers(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Mergeable HLL register frame: (group_cols…, register, rho).

    ``register`` = top p bits of the 60-bit md5 hash; ``rho`` = leading
    zeros of the remaining 53-bit suffix + 1 (binary-length arithmetic —
    exact on bigints, replayable as ``length(bin(x))`` in any engine;
    Spark's own ``approx_count_distinct`` is HLL++ with private
    registers, which no oracle can check).

    Mergeability — the whole point at 100 TB — is ``max(rho)`` per
    register: partial aggregation combines map-side, shards/sources
    union by register-wise max, and a day's sketch is 128 longs however
    many rows it summarizes.  Pinned in tests: merging per-group
    registers equals sketching the union directly.
    """
    group_cols = group_cols or []
    return (
        hll_rows(df, col, group_cols)
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_rows(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Pre-aggregation projection: (group_cols…, register, rho) per row
    — pure map-side column algebra, exposed so callers can aggregate it
    under grouping sets / windows without a second scan."""
    group_cols = group_cols or []
    suffix_bits = 60 - HLL_P
    h = stable_hash64(F.col(col).cast("string"))
    suffix = h.bitwiseAND(F.lit((1 << suffix_bits) - 1))
    blen = F.length(F.conv(suffix.cast("string"), 10, 2))
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits) - (blen - F.lit(1))
    )
    return df.select(
        *group_cols,
        F.shiftright(h, suffix_bits).alias("register"),
        rho.alias("rho"),
    )


def hll_registers_with_total(
    df: DataFrame, col: str, group_col: str, total_label: str = "ALL"
) -> DataFrame:
    """Per-group register frames PLUS the merged total — in ONE table
    pass via GROUPING SETS ((group, register), (register)): the Expand
    doubles pre-agg rows map-side instead of a second corpus scan (a
    first cut unioned two aggregates over the same source, which planned
    two FileScans).  The total row is labeled ``total_label``; merging
    here is the register-wise max the grouping set computes — identical
    to folding the per-group sketches, pinned in tests.  Assumes
    ``group_col`` is non-null (the grouping-set null marks the total
    row; a null data group would merge into it).
    """
    rows = hll_rows(df, col, [group_col])
    regs = rows.groupingSets(
        [[group_col, "register"], ["register"]], group_col, "register"
    ).agg(F.max("rho").alias("rho"))
    return regs.select(
        F.coalesce(F.col(group_col), F.lit(total_label)).alias(group_col),
        "register",
        "rho",
    )


def hll_fold(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Fold a register frame into the raw HLL estimate per group.

    Output: (group_cols…, m, regs_set, zero_regs, s_scaled,
    est_distinct).  ``s_scaled`` is the harmonic-mean denominator as an
    EXACT integer (sum of 2^(RMAX - rho), absent registers at rho = 0),
    so the only floating step is one literal/one cast/one divide —
    bit-identical across engines.  The raw estimator only (no linear
    counting / bias correction: those need ln(), whose last-ulp value is
    libm-specific; ``zero_regs`` is exposed so callers in one engine can
    apply them).
    """
    group_cols = group_cols or []
    term = F.expr(f"shiftleft(1L, {_HLL_RMAX} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("regs_set"),
        F.sum(term).alias("s_present"),
    )
    s_scaled = F.col("s_present") + (F.lit(HLL_M) - F.col("regs_set")) * F.lit(
        1 << _HLL_RMAX
    )
    return agg.select(
        *group_cols,
        F.lit(HLL_M).alias("m"),
        F.col("regs_set"),
        (F.lit(HLL_M) - F.col("regs_set")).alias("zero_regs"),
        s_scaled.alias("s_scaled"),
        (F.lit(HLL_RAW_NUM) / s_scaled.cast("double")).alias("est_distinct"),
    )


def join_size_estimate(
    left: DataFrame, left_key: str, right: DataFrame, right_key: str
) -> DataFrame:
    """EXACT equi-join output cardinality WITHOUT running the join —
    the planner pre-flight that decides whether a 100 TB join is safe
    to launch: Σ over matching keys of count_left(k)·count_right(k).

    Each side is scanned ONCE into its per-key count frame (the only
    corpus-sized exchanges, map-combinable); the frames full-outer join
    key-to-key (distinct-key-sized, not row-sized) and ONE aggregate
    emits the whole report.  Complements ``key_skew_profile``: that
    prices one side's shuffle, this prices the join's OUTPUT —
    the quantity that explodes when both sides are skewed on the same
    hot key (cl·cr per key, visible in ``max_key_product``).

    Output (one row): left_rows, left_keys, right_rows, right_keys,
    matched_keys, join_rows, max_key_product.  Products accumulate in
    DECIMAL(38,0) (two billion-row sides sharing one key = 10^18
    products; bigint sums would overflow) and render as bigint here —
    callers at true 100 TB scale should read the decimal column form.
    """
    cl = left.groupBy(F.col(left_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cl")
    )
    cr = right.groupBy(F.col(right_key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__cr")
    )
    j = cl.join(cr, on="__k", how="full_outer")
    prod = F.col("__cl").cast("decimal(38,0)") * F.col("__cr")
    return j.agg(
        F.sum(F.coalesce("__cl", F.lit(0))).alias("left_rows"),
        F.count("__cl").alias("left_keys"),
        F.sum(F.coalesce("__cr", F.lit(0))).alias("right_rows"),
        F.count("__cr").alias("right_keys"),
        F.count(F.when(F.col("__cl").isNotNull() & F.col("__cr").isNotNull(), 1)).alias("matched_keys"),
        F.sum(prod).cast("bigint").alias("join_rows"),
        F.max(prod).cast("bigint").alias("max_key_product"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (point-frequency estimation in sublinear state)
# ---------------------------------------------------------------------------
#
# The frequency companion of the KMV/HLL cardinality sketches: a d x w
# counter grid answers "how often did key x occur?" without ever
# holding the key space — the state is d*w longs no matter how many
# distinct keys stream through, and grids MERGE by cell-wise addition
# (the property that makes the sketch a partial aggregate at 100 TB:
# every executor folds its partition into a local grid and the shuffle
# carries d*w rows per partition, never the key stream).  Estimates
# never undercount (each of the d cells holds the key's true count
# plus whatever collided there; min over d takes the least-polluted
# cell), overcount by <= 2N/w with probability >= 1 - 2^-d (Cormode &
# Muthukrishnan 2005).  Like the Bloom filter, the hash family is the
# salted md5 ``stable_hash64`` so a DuckDB oracle replays the exact
# grid and the exact estimates bit-for-bit.


def cms_counters(
    df: DataFrame, key_col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Build the d x w Count-Min grid over every occurrence of
    ``key_col`` (weighted streams: pre-expand or pre-aggregate).

    Scale shape: ONE Expand (d struct rows per occurrence) under ONE
    map-combinable aggregate — partial grids collapse to <= d*w rows
    per partition before the (bounded) shuffle.  Output:
    (r int, col bigint, c bigint), <= d*w rows.
    """
    if w < 2 or d < 1:
        raise ValueError("CMS needs w >= 2, d >= 1")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).cast("int").alias("r"),
                (
                    stable_hash64(
                        F.concat(
                            F.col(key_col).cast("string"), F.lit(f"#c{r}")
                        )
                    )
                    % w
                ).alias("col"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    probes: DataFrame,
    key_col: str,
    counters: DataFrame,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes`` against a
    ``cms_counters`` grid: est(x) = min over the d rows of the cell
    each salted hash lands in.

    The grid is <= d*w rows — it BROADCASTS (the train_kmeans
    model-artifact doctrine: the model moves to the data, the probe
    stream never shuffles on the grid's account).  A missing cell means
    no occurrence hashed there, so it reads as 0 (and forces est = 0 —
    correct, since a key that occurred would have incremented all d of
    its cells).

    Output: probes' columns + (cms_est bigint).
    """
    from pyspark.sql.functions import broadcast

    pr = probes.withColumn(
        "__rc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        (
                            stable_hash64(
                                F.concat(
                                    F.col(key_col).cast("string"),
                                    F.lit(f"#c{r}"),
                                )
                            )
                            % w
                        ).alias("col"),
                    )
                    for r in range(d)
                ]
            )
        ),
    )
    # Alias the grid to reserved names before the join: a probe frame
    # that already carries a column named r/col/c would otherwise
    # collide with the grid's schema and break resolution (round-10
    # ADVICE).  The probe side already protects itself with __rc.
    grid = counters.select(
        F.col("r").alias("__cms_r"),
        F.col("col").alias("__cms_col"),
        F.col("c").alias("__cms_c"),
    )
    joined = pr.join(
        broadcast(grid),
        on=[
            pr["__rc.r"] == grid["__cms_r"],
            pr["__rc.col"] == grid["__cms_col"],
        ],
        how="left",
    )
    return joined.groupBy(*[probes[c] for c in probes.columns]).agg(
        F.min(F.coalesce(F.col("__cms_c"), F.lit(0))).alias("cms_est")
    )


# ---------------------------------------------------------------------------
# KMV theta intersection (set-operation estimates over bottom-k sketches)
# ---------------------------------------------------------------------------


def kmv_overlap(
    df: DataFrame, group_col: str, col: str, k: int = 64
) -> DataFrame:
    """Pairwise distinct-value INTERSECTION estimates between groups —
    the theta-sketch set algebra (Dasgupta et al., "Theta sketches")
    over the same bottom-k samples ``kmv_distinct_by`` keeps: each
    group's sample is a uniform hash-subsample below its threshold
    theta (= the k-th smallest hash, or the full 2^60 space when the
    group has < k distinct values and the sketch is exact), so within
    min(theta_a, theta_b) BOTH samples are complete and the shared
    hashes there are a uniform sample of the true intersection:
    est = |{h in S_a ∩ S_b : h < theta}| * 2^60 / theta.

    Scale shape: ONE distinct (group, hash) pass, ONE group-keyed rank
    window (WindowGroupLimit cuts to k per group BEFORE the exchange —
    the kmv_distinct_by shape), then all joins are over <= k-row-per-
    group sample frames: at 100 TB the corpus is scanned once and
    everything downstream is sketch-sized.  Audience overlap ("how many
    users did BOTH X and Y") without ever joining the raw streams.

    Output: one row per unordered group pair (a < b):
    (group_a, group_b, est_a double, est_b double,
    est_intersection double, sample_overlap bigint).
    """
    from pyspark.sql.window import Window

    if k < 3:
        raise ValueError("KMV needs k >= 3 (variance is 1/sqrt(k-2))")
    hashes = (
        df.select(
            F.col(group_col).alias("g"),
            stable_hash64(F.col(col).cast("string")).alias("h"),
        )
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    win = Window.partitionBy("g").orderBy(F.col("h").asc())
    bottom = hashes.withColumn("rn", F.row_number().over(win)).filter(
        F.col("rn") <= k
    )
    # the bottom-k frame is sketch-sized (k rows per group) but its
    # lineage is the corpus-sized distinct+window; three consumers
    # follow (stats, both sample sides), so cut the lineage here —
    # the mv_merkle_upserts drill-keys precedent — and the corpus is
    # scanned ONCE no matter how the sketch algebra fans out below
    bottom = bottom.localCheckpoint(eager=True)
    space = F.lit(int(HASH_SPACE)).cast("bigint")
    stats = bottom.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max("h").alias("kth_min"),
    ).select(
        "g",
        "n_seen",
        # theta: the sample is complete below this hash value
        F.when(F.col("n_seen") < k, space)
        .otherwise(F.col("kth_min"))
        .alias("theta"),
        F.when(
            F.col("n_seen") < k, F.col("n_seen").cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE)
            / F.col("kth_min").cast("double")
        )
        .alias("est_distinct"),
    )
    # retained sample = hashes strictly below the group's theta (the
    # k-th itself is the threshold, not a member — when exact, all stay)
    sample = (
        bottom.join(F.broadcast(stats.select("g", "theta")), "g")
        .filter(F.col("h") < F.col("theta"))
        .select("g", "h", "theta")
    )
    a = sample.select(
        F.col("g").alias("group_a"),
        F.col("h"),
        F.col("theta").alias("__ta"),
    )
    b = sample.select(
        F.col("g").alias("group_b"),
        F.col("h"),
        F.col("theta").alias("__tb"),
    )
    inter = (
        a.join(b, on="h")
        .filter(F.col("group_a") < F.col("group_b"))
        .withColumn("__theta", F.least("__ta", "__tb"))
        .groupBy("group_a", "group_b", "__theta")
        .agg(
            F.sum(
                F.when(F.col("h") < F.col("__theta"), 1).otherwise(0)
            ).alias("sample_overlap")
        )
    )
    # pair scaffold: zero-overlap pairs must still report (the inner
    # sample join drops them).  Groups are a bounded enum here (the
    # caller's contract); the hash-keyed equi-join above already binds
    # every pair that shares a sample hash, so the scaffold only adds
    # the empty ones: derive it from stats x stats via a hash-free
    # union trick — stats is sketch-sized, so a broadcast non-equi pair
    # frame would be fine, but we keep the plan BNLJ-free by exploding
    # the (tiny) sorted group list against itself row-locally.
    glist = F.array_sort(
        F.collect_list(F.struct("g", "theta", "est_distinct"))
    )
    pairs = (
        stats.agg(glist.alias("gs"))
        .select(F.explode("gs").alias("ga"), F.col("gs"))
        .select(
            F.col("ga"),
            F.explode(
                F.filter("gs", lambda x: x["g"] > F.col("ga.g"))
            ).alias("gb"),
        )
        .select(
            F.col("ga.g").alias("group_a"),
            F.col("gb.g").alias("group_b"),
            F.col("ga.est_distinct").alias("est_a"),
            F.col("gb.est_distinct").alias("est_b"),
            F.least(F.col("ga.theta"), F.col("gb.theta")).alias("__theta"),
        )
    )
    out = pairs.join(
        inter.select("group_a", "group_b", "sample_overlap"),
        on=["group_a", "group_b"],
        how="left",
    ).select(
        "group_a",
        "group_b",
        "est_a",
        "est_b",
        (
            F.coalesce(F.col("sample_overlap"), F.lit(0)).cast("double")
            * F.lit(HASH_SPACE)
            / F.col("__theta").cast("double")
        ).alias("est_intersection"),
        F.coalesce(F.col("sample_overlap"), F.lit(0))
        .cast("bigint")
        .alias("sample_overlap"),
    )
    return out


def cms_join_size(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Equi-join output cardinality estimated from two Count-Min grids
    — the AGMS/CM inner-product estimator (Cormode & Muthukrishnan
    2005, §4.2): for each of the d rows, Σ_col a_r[col]·b_r[col]
    equals Σ_keys count_l(k)·count_r(k) PLUS non-negative collision
    cross-terms, so min over d never undercounts the true join size.

    The sketch-space version of ``join_size_estimate``: that one is
    exact but pays a distinct-key-sized shuffle per side; this one
    reduces each side to d·w longs (mergeable, map-combinable) and the
    estimate is one broadcast-grid zip — the pre-flight you can afford
    on EVERY candidate join of a 100 TB plan search, graduating to the
    exact frame only when the estimate is near a budget.

    Output (one row): est_join_rows bigint (never below the true
    count), plus per-row inner products d_0..d_{d-1} for the audit.
    """
    from pyspark.sql.functions import broadcast

    a = cms_counters(left.select(F.col(left_key)), left_key, w=w, d=d)
    b = cms_counters(right.select(F.col(right_key)), right_key, w=w, d=d)
    prod = (
        a.join(
            broadcast(b.withColumnsRenamed({"c": "cb"})),
            on=["r", "col"],
            how="inner",  # a missing cell on either side contributes 0
        )
        .groupBy("r")
        .agg(F.sum(F.col("c") * F.col("cb")).alias("ip"))
    )
    wide = prod.agg(
        F.min("ip").cast("bigint").alias("est_join_rows"),
        *[
            F.max(F.when(F.col("r") == r, F.col("ip")))
            .cast("bigint")
            .alias(f"d_{r}")
            for r in range(d)
        ],
    )
    return wide


# ---------------------------------------------------------------------------
# equi-width histogram quantiles: the mergeable ordered-statistic sketch
# ---------------------------------------------------------------------------
# The set so far covers membership (Bloom), frequency (CMS), cardinality
# (KMV/HLL) — this adds ORDER STATISTICS, the last stat a plan search
# needs (equi-depth partition bounds, skew cutoffs, p95 gates).  The
# classic fixed-grid histogram is chosen over KLL/t-digest deliberately:
# its cells are exact integer counts on a deterministic grid, so a
# DuckDB oracle replays the whole estimator bit-for-bit (the repo-wide
# exactness doctrine), it is a pure map-combinable aggregate (<= groups
# x buckets rows cross the shuffle, never the value stream), and its
# error bound is a hard guarantee (estimate = bucket upper edge, so
# 0 <= est - true_quantile < width ALWAYS), not a probabilistic one.


def equiwidth_hist(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    width: int,
) -> DataFrame:
    """Fixed-grid histogram: bucket = value DIV width (non-negative
    integer values; both engines truncate).  ONE map-combinable count
    aggregate — partial grids collapse per partition before the
    bounded shuffle, the cms_counters scale shape without even an
    Expand.  Output: group_cols + (bucket, cnt), <= groups x
    (max_value/width) rows.
    """
    if width < 1:
        raise ValueError("width must be >= 1")
    return (
        df.select(
            *group_cols,
            F.col(value_col).cast("bigint").alias("__v"),
        )
        .groupBy(
            *group_cols,
            F.expr(f"__v DIV {width}").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantile_est(
    hist: DataFrame,
    group_cols: list[str],
    qs_micro: list[int],
    width: int,
) -> DataFrame:
    """Quantile estimates off an ``equiwidth_hist`` grid: for each
    group and q (micro-units), the smallest bucket whose cumulative
    count reaches rank ceil(q*n/1e6); estimate = that bucket's UPPER
    edge, so ``0 <= est - exact < width`` by construction (the exact
    type-1 quantile lies inside the crossing bucket).

    All arithmetic integer and portable: rank = (n*q + 999999) DIV 1e6
    (truncating division on non-negatives = ceil of the product).  The
    q fan-out is a row-local explode on the grid (never a literal-key
    join — it would constant-fold to BNLJ), and the cumulative window
    runs over <= buckets rows per group.

    Output: group_cols + (q_micro, est bigint).
    """
    from pyspark.sql.window import Window

    qarr = F.array(*[F.lit(int(q)).cast("bigint") for q in qs_micro])
    w_tot = Window.partitionBy(*group_cols)
    fan = (
        hist.withColumn("__n", F.sum("cnt").over(w_tot))
        .withColumn(
            "__cum",
            F.sum("cnt").over(
                Window.partitionBy(*group_cols).orderBy("bucket")
            ),
        )
        .withColumn("q_micro", F.explode(qarr))
    )
    rank = F.expr("(__n * q_micro + 999999) DIV 1000000")
    return (
        fan.filter(F.col("__cum") >= rank)
        .groupBy(*group_cols, "q_micro")
        .agg(
            ((F.min("bucket") + 1) * width).cast("bigint").alias("est")
        )
    )


# --------------------------------------------------------------- AMS F2
# The Alon-Matias-Szegedy tug-of-war sketch (AMS 1996, STOC): each
# replica r keeps ONE int64 counter Z_r = sum over occurrences of a
# +-1 hash of the key; E[Z^2] = F2 = sum_k f_k^2 (the second frequency
# moment = self-join size = the skew mass the salted-agg and AQE
# planners need).  Like every sketch here, the hash family is the
# salted md5 ``stable_hash64`` so a DuckDB oracle replays the exact
# counters and the exact estimate bit-for-bit, and the estimate always
# ships WITH its exact audit column.


def ams_f2(
    df: DataFrame,
    key_col: str,
    reps: int = 16,
    groups: int = 4,
) -> DataFrame:
    """Estimate F2 = Σ f_k² by median-of-means over ``reps`` tug-of-war
    counters, next to the EXACT F2 audit — the self-join-size / skew
    estimator the CMS join-size family lacks (CMS estimates a CROSS
    join's size; AMS estimates a table's own quadratic key mass).

    Estimator convention, all-int64 and engine-exact: ONE md5 per row
    (h = stable_hash64(k)) and sign_r(k) = 1 − 2·bit_r(h) — replica r
    reads BIT r of the 60-bit hash (r < 60 enforced), so for fixed r
    the sign is still an md5-derived hash of the key while the 40-hash
    fan-out collapses to one.  Z_r = Σ sign_r; replicas split into
    ``groups`` consecutive blocks of w = reps/groups; block mean =
    (Σ Z²) DIV w; the reported estimate is the LOWER MEDIAN (rank
    ⌈g/2⌉ by (value, block-id) order) — deterministic, no float ever.

    Scale shape — the measured r11 lesson: the first version expanded
    ``reps`` struct rows per occurrence, each with its OWN salted md5 —
    at sf0.1 that is 24M md5 calls and the query benched 23.3 s, the
    registry's slowest.  This form computes NO Expand and ONE md5:
    ``reps`` shift-and-mask sum aggregates ride a single
    whole-stage-codegen pass (partial state = reps longs per
    partition), and the one-row wide result unpivots via ``stack`` into
    the (r, z) frame the block fold wants.  The exact audit is the one
    key-keyed aggregate.  The two one-row results combine by union +
    re-agg, never a literal cross join (the cms_joinsize BNLJ dodge).
    Z ≤ n ⇒ Z² ≤ n², so int64 holds to n ≈ 3e9 rows; beyond that,
    pre-aggregate per key and feed weighted occurrences.

    Output ONE row: ``(reps, grp_w, f2_est, f2_exact, err_micro)``
    with err_micro = ⌊|est − exact|·1e6 / exact⌋ (decomposed division,
    no intermediate overflow).
    """
    from pyspark.sql.window import Window

    if reps % groups != 0 or groups < 1:
        raise ValueError("reps must be a positive multiple of groups")
    if reps > 60:
        raise ValueError("reps must be <= 60 (one sign bit per hash bit)")
    w = reps // groups
    hashed = df.select(
        stable_hash64(F.col(key_col).cast("string")).alias("__h")
    )
    wide = hashed.agg(
        *[
            F.sum(
                F.lit(1) - F.lit(2) * F.expr(f"shiftright(__h, {r}) & 1")
            )
            .cast("long")
            .alias(f"z_{r}")
            for r in range(reps)
        ]
    )
    stack_args = ", ".join(f"{r}, z_{r}" for r in range(reps))
    z = wide.select(
        F.expr(f"stack({reps}, {stack_args}) AS (r, z)")
    ).select(F.col("r").cast("int").alias("r"), F.col("z"))
    means = z.groupBy(
        (F.col("r") - F.col("r") % w).alias("g")
    ).agg(F.expr(f"sum(z * z) DIV {w}").alias("m"))
    med = (
        means.select(
            "m",
            F.row_number()
            .over(Window.orderBy(F.col("m").asc(), F.col("g").asc()))
            .alias("__rn"),
        )
        .filter(F.col("__rn") == F.lit((groups + 1) // 2))
        .select(F.lit("est").alias("k"), F.col("m").alias("v"))
    )
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * c")).alias("v"))
        .select(F.lit("exact").alias("k"), F.col("v"))
    )
    return (
        med.unionAll(exact)
        .groupBy()
        .agg(
            F.max(F.when(F.col("k") == "est", F.col("v"))).alias("f2_est"),
            F.max(F.when(F.col("k") == "exact", F.col("v"))).alias(
                "f2_exact"
            ),
        )
        .select(
            F.lit(reps).cast("int").alias("reps"),
            F.lit(w).cast("int").alias("grp_w"),
            "f2_est",
            "f2_exact",
            F.expr(
                "abs(f2_est - f2_exact) DIV f2_exact * 1000000"
                " + (abs(f2_est - f2_exact) % f2_exact) * 1000000"
                "   DIV f2_exact"
            )
            .cast("long")
            .alias("err_micro"),
        )
    )
