"""Text-analysis operators for LLM-data pipelines.

All pure `pyspark.sql.functions` column algebra — no Python UDFs — so they
run JVM-side inside WholeStageCodegen and scale linearly with executors.
Deterministic across engines: hashing goes through md5 (see
``mvrepair.functions.stable_hash64``) so a DuckDB oracle reproduces every
value bit-for-bit.

Operators:
- ``tokenize``          whitespace tokens (regex-free fast path: single space)
- ``text_stats``        length / token / distinct-token / stopword metrics
- ``quality_score``     composite quality heuristics
- ``lang_scores``       per-language marker-token hit counts (n-gram-free
                        heuristic language ID; argmax = guessed language)
- ``fingerprint``       md5 + 60-bit stable hash document fingerprints
- ``simhash32``         32-bit SimHash over token multiset
- ``bm25_rank``         Okapi BM25 top-k (driver-side idf artifacts)
- ``heavy_hitters``     corpus-wide frequent-token top-k
- ``tfidf_topterms``    per-doc characteristic terms (integer linear-idf)
- ``token_quantiles``   exact per-group discrete quantiles (integer positions)
- ``rare_token_profile`` corpus-frequency rarity (perplexity-proxy filter)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mvrepair.functions import stable_hash64

# Small fixed stopword list used by the quality metrics (public knowledge).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for"]

# Marker tokens per language for the heuristic language scorer.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "los", "que"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "das", "und", "nicht"],
}


def tokenize(text: Column) -> Column:
    """Whitespace tokenization (single-space fast path)."""
    return F.split(text, " ")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document size/token statistics."""
    toks = tokenize(F.col(text_col))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        stop_cnt.cast("long").alias("stopword_count"),
        (stop_cnt.cast("double") / n_tokens).alias("stopword_ratio"),
        (
            F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
    )


def _quality_score_expr(text_col: str) -> Column:
    """0–3 composite quality score from the raw text column: length band +
    stopword presence + repetition (distinct-token ratio)."""
    toks = tokenize(F.col(text_col))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    return (
        F.when((n_tokens >= 5) & (n_tokens <= 100000), 1).otherwise(0)
        + F.when(stop_cnt > 0, 1).otherwise(0)
        + F.when(dr > 0.2, 1).otherwise(0)
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite quality heuristic: length band + stopword presence +
    repetition (distinct-token ratio).  Flags docs a pretraining pipeline
    would drop."""
    stats = text_stats(df, text_col, id_col)
    dr = F.col("n_distinct_tokens").cast("double") / F.col("n_tokens")
    score = (
        F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1).otherwise(0)
        + F.when(F.col("stopword_ratio") > 0.0, 1).otherwise(0)
        + F.when(dr > 0.2, 1).otherwise(0)
    )
    return stats.select(
        id_col,
        "n_tokens",
        dr.alias("distinct_ratio"),
        F.col("stopword_ratio"),
        score.cast("int").alias("quality_score"),
        (score >= 2).alias("is_quality"),
    )


def quality_filter(df: DataFrame, text_col: str = "text", min_score: int = 2) -> DataFrame:
    """Rows passing the quality gate, all input columns retained.

    Join-free twin of ``quality_score``: the score expressions run inline
    as a pure filter, so the gate costs one map-side pass — recovering the
    text by self-joining ``quality_score`` output back would double-scan
    the corpus at 100 TB.
    """
    return df.filter(_quality_score_expr(text_col) >= min_score)


def lang_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-token hit counts per language + argmax guess.

    The guess breaks ties by language-code order (deterministic).
    """
    toks = tokenize(F.col(text_col))
    cols = [F.col(id_col)]
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        cols.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
            .cast("long")
            .alias(f"{lang}_hits")
        )
    out = df.select(*cols)
    # argmax with deterministic tie-break (alphabetical language order)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"{l}_hits") for l in langs])
    guess = F.coalesce(
        *[F.when(F.col(f"{l}_hits") == best, F.lit(l)) for l in langs]
    )
    return out.withColumn("lang_guess", F.when(best > 0, guess).otherwise(F.lit("und")))


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Corpus composition report: per-(lang, source) doc/token/char totals.

    The dataset card every training run starts from — how much data, in
    what language, from which source, and how long the documents run.
    One hash aggregation; token counts come from per-row array sizes so the
    shuffle carries a handful of longs per group, never text.  The average
    is IEEE double division of two exact integers — bit-identical on any
    engine (decimal division scale rules differ between engines).
    """
    group_cols = group_cols or ["lang", "source"]
    n_tokens = F.size(tokenize(F.col(text_col))).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens).alias("total_tokens"),
            F.sum(n_chars).alias("total_chars"),
            F.min(n_chars).alias("min_chars"),
            F.max(n_chars).alias("max_chars"),
        )
        .withColumn(
            "avg_chars", F.col("total_chars").cast("double") / F.col("n_docs")
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 hex + engine-portable 60-bit hash."""
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("fp_md5"),
        stable_hash64(F.col(text_col)).alias("fp_hash64"),
    )


ROLL_P = 1_000_000_007  # Rabin-Karp modulus: acc*131+255 stays < 2^63
ROLL_BASE = 131
KGRAM = 8

# "BPE-ish" regex tokenizer: letter runs, digit runs, single punctuation —
# the word-splitting pass every byte-pair tokenizer starts from.
BPE_SPLIT_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"
SUBWORD_LEN = 4


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex, subword units.

    ``n_subword_units`` = Σ ceil(len(tok)/4) over regex tokens — the
    fixed-stride upper bound on a BPE vocabulary's token count, computable
    without a learned vocab.  Pure column algebra, codegen-friendly.
    """
    ws = tokenize(F.col(text_col))
    re_toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0))
    subword = F.aggregate(
        re_toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(SUBWORD_LEN)).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(re_toks).cast("long").alias("n_re_tokens"),
        subword.alias("n_subword_units"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rolling-hash document fingerprints.

    - ``fp_roll``: Rabin-Karp polynomial hash over the full character
      stream (base 131, mod 1e9+7) — order-sensitive, one pass, exact in
      any 64-bit engine.
    - ``fp_min_kgram``: winnowing-style fingerprint — minimum stable hash
      over all 8-char grams, robust to local edits (an edit perturbs ≤ 8
      grams, the min usually survives).  Docs shorter than 8 chars fall
      back to the whole-doc hash.
    """
    chars = F.transform(F.split(F.col(text_col), ""), lambda c: F.ascii(c))
    roll = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_BASE + x) % ROLL_P,
    )
    n_grams = F.length(text_col) - (KGRAM - 1)
    gram_hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: stable_hash64(F.substring(F.col(text_col), i, KGRAM)),
    )
    min_kgram = F.when(n_grams >= 1, F.array_min(gram_hashes)).otherwise(
        stable_hash64(F.col(text_col))
    )
    return df.select(
        F.col(id_col),
        roll.alias("fp_roll"),
        min_kgram.alias("fp_min_kgram"),
    )


# Scrub patterns: RE2/Java-compatible (no backslash classes, so the same
# string works in Spark, DuckDB, and any POSIX-ish engine).
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}", "<EMAIL>"),
    ("url", "https?://[^ ]+", "<URL>"),
    ("longnum", "[0-9]{6,}", "<NUM>"),
]


def scrub_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII-style scrubbing: replace emails / URLs / long digit runs with
    placeholder tokens; report per-pattern match counts.

    Counts are taken on the original text, replacements applied
    sequentially in ``SCRUB_PATTERNS`` order.  Pure ``regexp_replace`` /
    ``regexp_extract_all`` column algebra — codegen-friendly, linear scan
    at any scale.
    """
    out = F.col(text_col)
    counts = []
    for name, pat, repl in SCRUB_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
        out = F.regexp_replace(out, pat, repl)
    return df.select(F.col(id_col), out.alias("clean_text"), *counts)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    units: Column | None = None,
) -> DataFrame:
    """SimHash over a multiset of text units (tokens by default).

    Classic scheme: each unit hashes to ``bits`` bits; bit j contributes
    +1/-1 per occurrence; the fingerprint sets bit j where the sum is
    positive.  Implemented as explode → groupBy(doc) with ``bits``
    conditional sums — one shuffle on the doc id, fully JVM-side.  At
    100 TB the explode keeps memory flat (no giant per-row arrays) and the
    aggregation is map-side combined.

    ``units`` overrides the unit array (e.g. ``dedup.shingles(...)`` —
    shingles keep unrelated documents' fingerprints far apart when the
    vocabulary is small).  ``bits`` ≤ 60 (stable_hash64 is a 60-bit space;
    bit 63 would overflow signed int64 anyway).
    """
    assert 1 <= bits <= 60
    arr = units if units is not None else tokenize(F.col(text_col))
    h = stable_hash64(F.col("__unit")) % F.lit(2**bits) if bits < 60 else stable_hash64(F.col("__unit"))
    tok = df.select(
        F.col(id_col), F.explode(arr).alias("__unit")
    ).withColumn("__h", h)
    # Bit-count packing: bit j set ⟺ #set(j) > n/2, so per bit we only need
    # the SET count plus one shared n.  Four 16-bit lanes per int64 pack 4
    # bit-counters into one sum-aggregate: ceil(bits/4)+1 agg buffer slots
    # instead of `bits` — 3.75× less partial-agg state on the map-side
    # combine shuffle, and far smaller generated agg code.  Safe to 32 767
    # units/doc (the top lane's headroom in a signed-64 sum); for larger
    # docs use 2 lanes of 32 bits.
    G = (bits + 3) // 4  # bit j lives in group j % G, lane j // G
    def packed(g: int) -> Column:
        lanes = F.shiftright(F.col("__h"), g).bitwiseAND(F.lit(1))
        for lane in range(1, 4):
            j = g + lane * G
            if j < bits:
                lanes = lanes + F.shiftleft(
                    F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)), 16 * lane
                )
        return lanes
    agg = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(packed(g)).alias(f"__p{g}") for g in range(G)],
    )
    sim = None
    for j in range(bits):
        g, lane = j % G, j // G
        cnt = F.shiftright(F.col(f"__p{g}"), 16 * lane).bitwiseAND(F.lit(0xFFFF))
        term = F.when(cnt * 2 > F.col("__n"), F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    # Runtime guard, not just a comment: beyond 32 767 units a lower lane
    # carries into its neighbour and the top lane's sum can exceed the
    # 16-bit headroom — silently corrupting fingerprints.  Long documents
    # at 100 TB scale WILL hit this, so fail loudly (caller splits the doc
    # or switches to 2×32-bit lanes) instead of emitting garbage.
    guard = F.assert_true(
        F.col("__n") <= F.lit(32767),
        F.lit("simhash: document exceeds 32767 units; 16-bit lane counters would overflow"),
    )
    sim = F.when(guard.isNull(), sim)
    return agg.select(id_col, sim.alias("simhash"))


def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash over the token multiset (see ``simhash``)."""
    return simhash(df, text_col, id_col, bits=32)


# ---------------------------------------------------------------------------
# BM25 ranking (retrieval scoring for training-data curation)
# ---------------------------------------------------------------------------

# One shared SQL template evaluated by BOTH engines (Spark via F.expr, the
# DuckDB oracle verbatim): identical parse → identical IEEE evaluation
# order.  Each per-term contribution is floor-quantized to int64
# micro-units BEFORE the per-doc sum, making the aggregation
# order-independent (exact integer addition) — a float sum across shuffle
# partitions would not be deterministic.
#
# {idf} is the one engine-divergent slot: the JVM's Math.log disagrees
# with libm by 1 ulp on some inputs (observed: ±1 micro-unit score drift
# at sf0.1), so Spark gets the idf as driver-computed Python literals
# (CPython calls the platform libm — bit-identical to DuckDB's ln) while
# the oracle computes ln in-engine.
# Every constant is wrapped CAST(... AS DOUBLE): a bare literal like
# 54.1408 parses as DECIMAL in BOTH engines, and their decimal/double
# promotion paths differ (observed: ±1 micro-unit score drift at sf0.1
# from `dl / 54.1408` going through decimal division in one engine).
# {idf} is an INTEGER micro-idf (micro_log2 of the Robertson ratio —
# see bm25_rank); the remaining float math is only correctly-rounded
# mul/div/add of identical operand values in both engines, so the floor
# is engine- and platform-exact with no libm anywhere.
BM25_CONTRIB_TEMPLATE = (
    "CAST(floor(CAST({idf} AS DOUBLE) * "
    "(cnt * CAST({k1p1} AS DOUBLE) / (cnt + CAST({k1} AS DOUBLE) * "
    "(CAST({omb} AS DOUBLE) + CAST({b} AS DOUBLE) * dl / "
    "CAST({avgdl} AS DOUBLE))))) AS BIGINT)"
)


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k document ranking for a bag of query terms.

    Scale shape: the token explode is filtered to the query terms BEFORE
    any shuffle (only matching (doc, term) rows move); corpus size, average
    doc length, and per-term document frequencies are tiny aggregates
    collected as driver-side artifacts (like the k-means centroids), so the
    scoring pass is a pure map-side expression over the per-(doc, term)
    counts — no join at all; the final top-k plans as
    TakeOrderedAndProject.

    Output: (``id_col``, score_micro) — BM25 score in int64 micro-units,
    descending, ties broken by id.
    """
    empty = df.select(
        F.col(id_col), F.lit(0).cast("long").alias("score_micro")
    ).limit(0)
    # Terms are interpolated into ONE SQL template both engines parse, so
    # they must be literal-safe: double any single quote (standard SQL
    # escaping, identical in Spark and DuckDB) and refuse control chars.
    query_terms = [str(t) for t in query_terms]
    for t in query_terms:
        if any(ord(ch) < 0x20 for ch in t):
            raise ValueError(f"bm25 query term contains control chars: {t!r}")
    if not query_terms:
        return empty

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    toks = F.split(F.col(text_col), " ")
    exploded = df.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    n, sumdl = df.select(
        F.count(F.lit(1)), F.sum(F.size(toks)).cast("long")
    ).first()
    if not n:
        return empty
    avgdl = float(sumdl) / float(n)

    tf = (
        exploded.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dfreq = {
        r["term"]: int(r["df"])
        for r in tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    if not dfreq:  # no term occurs anywhere: an empty CASE won't parse
        return empty
    # idf per term as an INTEGER: micro_log2 of the Robertson ratio
    # (N - df + 0.5)/(df + 0.5) + 1 — the ratio chain is exact-rounded
    # double ops of exact integers (identical in Python and SQL), and
    # py_micro_log2 is the cross-engine-exact quantizer, so the idf the
    # oracle's micro_log2_sql computes is bit-for-bit this literal.
    # (Previously a CPython-libm ln literal vs DuckDB's own ln — equal
    # only while both link the same libm; see exactlog's module
    # docstring for the measured floor-flip risk that retired that.)
    from mvrepair.functions.exactlog import py_micro_log2

    idf_case = (
        "CASE term "
        + " ".join(
            f"WHEN {q(t)} THEN "
            f"{py_micro_log2((n - df + 0.5) / (df + 0.5) + 1)}L"
            for t, df in sorted(dfreq.items())
        )
        + " END"
    )
    contrib = BM25_CONTRIB_TEMPLATE.format(
        idf=idf_case, k1p1=repr(k1 + 1), k1=repr(k1),
        omb=repr(1 - b), b=repr(b), avgdl=repr(avgdl),
    )
    scored = (
        tf.withColumn("c", F.expr(contrib))
        .groupBy(id_col)
        .agg(F.sum("c").alias("score_micro"))
    )
    return scored.orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    ).limit(k)


def heavy_hitters(
    df: DataFrame, k: int = 40, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide frequent-token top-k (vocabulary heavy hitters).

    Scale shape: explode → groupBy(token) with map-side partial
    aggregation, so the shuffle carries one partial (token, count,
    doc-count) row per token per input partition — never the token
    stream — and the final top-k plans as TakeOrderedAndProject (no
    global sort).  ``n_docs`` uses count(distinct ``id_col``), which adds
    one Expand pass; at 100 TB swap in approx_count_distinct if exact doc
    frequencies aren't required.  Deterministic total order: occurrences
    desc, then token asc — the top-k cut is stable across engines.

    Output: (token, n bigint, n_docs bigint).
    """
    exploded = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    counts = exploded.groupBy("token").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col(id_col)).alias("n_docs"),
    )
    return counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)


def tfidf_topterms(
    df: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-N characteristic terms by tf-idf (LINEAR idf).

    The idf factor is the exact rational N/df rather than log(N/df):
    score_micro = floor(tf · N · 1e6 / df) in pure int64 arithmetic, so
    every engine reproduces the ranking bit-for-bit (the BM25 lesson:
    cross-engine libm log differs by 1 ulp; a linear idf keeps the whole
    score integer).  The log damping only changes relative weights, not
    the "rare terms rank high" ordering this surfaces.

    Scale bound: the product tf · N · 1e6 must stay under 2^63, i.e.
    tf · N < ~9.2e12 — fine up to billion-doc corpora with tf in the
    thousands, but past that switch the score to double (and accept the
    1-ulp cross-engine tolerance) or rescale the 1e6 factor; Spark with
    ANSI off would WRAP silently while the DuckDB oracle raises, so the
    two diverge exactly at the overflow point.

    Scale shape: one explode → per-(doc, term) counts with map-side
    combine; per-term document frequencies are a second aggregate over
    that (vocabulary-sized, NOT corpus-sized); the df join is a plain
    equi-join on term — the vocabulary side is orders of magnitude
    smaller than the corpus but too big to broadcast at 100 TB, so it
    stays a shuffle join on the token key.  The per-doc top-N is a
    row_number window over per-doc term lists (tiny partitions).

    Output: (``id_col``, term, tf bigint, score_micro bigint, rank int).
    """
    from pyspark.sql.window import Window

    n_docs = df.select(F.count(F.lit(1))).first()[0]
    exploded = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        F.col("term"),
        F.col("tf"),
        F.expr(f"(tf * {int(n_docs)}L * 1000000L) DIV df").alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "term", "tf", "score_micro", "rank")
    )


def token_quantiles(
    df: DataFrame, text_col: str = "text", group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-group token-length quantiles (p25/p50/p75/p90), DISCRETE
    (type-1) semantics: the value at position ceil(q·n) of the sorted
    group.

    Positions are computed in pure integer arithmetic —
    ``ceil(q·n) = (q_num·n + q_den - 1) div q_den`` — because the float
    route (``ceil(0.9 * n)``) hangs the answer on one double rounding,
    and interpolating quantiles (percentile_cont) adds a second
    cross-engine float hazard.  Integer positions make the result an
    actual data value, hash-stable everywhere.

    Scale shape: one shuffle on ``group_col`` for the row_number window;
    group cardinality = languages (tiny), so per-partition sort dominates
    — the same cost profile as any per-group exact quantile.  At 100 TB
    prefer approx_percentile unless exactness is the point.

    Output: (``group_col``, pct string, n_tokens bigint) — one row per
    (group, quantile), ties to the LOWEST doc id.
    """
    from pyspark.sql.window import Window

    n_tokens = F.size(tokenize(F.col(text_col))).cast("long")
    base = df.select(
        F.col(group_col), F.col(id_col), n_tokens.alias("n_tokens")
    )
    w = Window.partitionBy(group_col).orderBy("n_tokens", id_col)
    wn = Window.partitionBy(group_col)
    ranked = base.select(
        group_col,
        "n_tokens",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    quantiles = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)]
    picks = F.array(
        *[
            F.struct(
                F.lit(label).alias("pct"),
                F.expr(f"(__n * {num} + {den - 1}) DIV {den}").alias("pos"),
            )
            for label, num, den in quantiles
        ]
    )
    return (
        ranked.withColumn("__q", F.explode(picks))
        .filter(F.col("__rn") == F.col("__q.pos"))
        .select(group_col, F.col("__q.pct").alias("pct"), "n_tokens")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top2_max: float = 0.20,
    dup3_max: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality metrics (Rae et al. 2021, MassiveText
    filters): per-document n-gram repetition fractions plus a drop flag.

    - ``dup_token_frac``  fraction of token instances whose token occurs
      more than once in the document (unigram duplication),
    - ``top_2gram_frac``  fraction of 2-gram instances covered by the most
      frequent 2-gram,
    - ``dup_3gram_frac``  fraction of 3-gram instances belonging to any
      repeated 3-gram,
    - ``repetitive``      drop flag: ``top_2gram_frac > top2_max OR
      dup_3gram_frac > dup3_max`` (Gopher's published thresholds are the
      defaults).

    Scale shape: ONE explode over (n, gram) tagged structs for all three
    gram sizes, then two hash aggregations — (doc, n, gram) counts, then
    (doc, n) metrics folded to one row per doc by conditional aggregation.
    Both aggs are map-side combinable and every key includes the doc id,
    so there is no corpus-global skew: the 100 TB cost is the token scan
    itself.  Grams travel as 60-bit ``stable_hash64`` fingerprints, never
    strings — the metrics only need gram IDENTITY (count/max/sum over the
    per-doc histogram), so the raw 2/3-gram text on the wire buys
    nothing.  Measured on the bench corpus: 22% fewer exchanged bytes
    (15.6 -> 12.1 MB) at wall-neutral local cost (the per-gram md5
    roughly offsets the string-shuffle savings on a single host); the
    margin grows with real-text gram lengths, and keeping raw text off
    the exchange is the same convention as ``substring_dup_stats``.  A
    60-bit collision inside one document merges two gram bins —
    vanishingly rare at document scale and reproduced exactly by the
    md5-prefix oracle.
    All fractions are exact integer ratios divided once in double, so a
    SQL oracle reproduces them bit-for-bit.

    Docs too short for an n-gram size contribute no rows for that n; the
    conditional aggregate coalesces those to 0.0 (nothing repeats in a
    document with no 2-grams).
    """
    from mvrepair.functions import stable_hash64
    from mvrepair.operators.dedup import shingles  # deferred: dedup imports text

    def tag(n: int) -> Column:
        # NB: the inner lambda must be unary — a second (defaulted) python
        # parameter would make pyspark pass the ARRAY INDEX into it.
        return F.transform(
            shingles(F.col(text_col), n),
            lambda g: F.struct(F.lit(n).alias("n"), stable_hash64(g).alias("gram")),
        )

    tagged = F.concat(tag(1), tag(2), tag(3))
    grams = df.select(F.col(id_col), F.explode(tagged).alias("g")).select(
        id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram")
    )
    counts = grams.groupBy(id_col, "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    per_n = counts.groupBy(id_col, "n").agg(
        F.max("cnt").alias("top_cnt"),
        F.sum("cnt").alias("tot"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))), F.lit(0)
        ).alias("dup"),
    )

    def pick(n: int, expr: Column) -> Column:
        return F.coalesce(
            F.max(F.when(F.col("n") == n, expr)), F.lit(0.0)
        )

    frac = lambda c: F.col(c).cast("double") / F.col("tot")  # noqa: E731
    out = per_n.groupBy(id_col).agg(
        pick(1, frac("dup")).alias("dup_token_frac"),
        pick(2, frac("top_cnt")).alias("top_2gram_frac"),
        pick(3, frac("dup")).alias("dup_3gram_frac"),
    )
    return out.select(
        id_col,
        "dup_token_frac",
        "top_2gram_frac",
        "dup_3gram_frac",
        (
            (F.col("top_2gram_frac") > top2_max)
            | (F.col("dup_3gram_frac") > dup3_max)
        ).alias("repetitive"),
    )


def quality_funnel(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Pipeline yield report: one row of survivor counts per curation
    stage — the observability artifact a training-data run publishes
    next to the dataset card (``corpus_profile``).

    Stages (each gate applied independently of the others except where
    named): total docs → docs in the token-length band → docs passing the
    composite quality gate (``quality_filter`` semantics) → distinct
    texts (exact-dedup survivors) → distinct texts AMONG quality docs
    (the corpus the pipeline actually ships: gate, then dedup).

    Scale shape: ONE scan of the corpus.  The conditional counts are
    map-side sums; the two count-distincts aggregate md5 digests (never
    text) and share the scan via Spark's expand — at 100 TB the shuffle
    carries one 32-char digest per doc, and only for the distinct legs.
    """
    toks = tokenize(F.col(text_col))
    n_tokens = F.size(toks)
    score = _quality_score_expr(text_col)
    digest = F.md5(F.col(text_col))
    return df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when((n_tokens >= 5) & (n_tokens <= 100000), 1).otherwise(0)
        ).alias("n_len_ok"),
        F.sum(F.when(score >= 2, 1).otherwise(0)).alias("n_quality"),
        F.countDistinct(digest).alias("n_unique"),
        F.countDistinct(F.when(score >= 2, digest)).alias("n_final"),
    )


def rare_token_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_max: int = 2,
    rare_frac_max: float = 0.5,
    rare_max_div: int | None = None,
) -> DataFrame:
    """Corpus-frequency rarity profile — the exact-arithmetic stand-in for
    the CCNet perplexity filter (Wenzek et al. 2020): documents dominated
    by tokens the corpus has barely seen are the ones a unigram LM would
    assign high perplexity (boilerplate hashes, mangled encodings, rare-
    language fragments), and pretraining pipelines route them to the
    drop/review bucket.

    Per doc: ``n_tokens`` (instances), ``n_rare`` (instances whose token
    occurs <= ``rare_max`` times corpus-WIDE), ``rare_frac``,
    ``min_token_count`` (the rarest token's corpus count — 0 for empty
    docs), and ``rare_heavy`` (``rare_frac >= rare_frac_max``).

    Deliberately NOT a log-probability: summing ``ln p(t)`` in double is
    engine-order-dependent and ``Math.log`` vs libm can differ in the
    last ulp, which would make an oracle twin unhashable; every output
    here is an exact integer or a single exact division, so the DuckDB
    twin reproduces it bit-for-bit.  The ranking it induces (docs heavy
    in sub-threshold-frequency tokens) is the same signal the perplexity
    filter thresholds.

    Scale shape — identical to ``substring_dup_stats`` at n=1: tokens
    ship as 60-bit ``stable_hash64`` fingerprints (8 bytes/instance on
    the wire, never strings); corpus frequencies are one map-side-
    combinable groupBy; the instance-to-frequency join reuses the SAME
    hash key as that groupBy (one exchange, reused); the per-doc rollup
    keys on the doc id (no corpus-global skew).  Empty docs re-enter via
    a left join from the pruned id-only base scan.

    ``rare_max_div``: when set, the threshold is corpus-scaled IN-PLAN
    as ``n_docs div rare_max_div`` (exact integer division, so the
    DuckDB twin's ``count(*) // div`` subquery matches bit-for-bit) via
    a true scalar subquery (``DataFrame.scalar()``): Spark runs the
    1-row count aggregate as a separate subquery stage and injects the
    result as a literal — no eager driver-side count at construction,
    no join node in the plan.  ``rare_max`` is ignored then.
    """
    from mvrepair.operators.dedup import shingles  # deferred: dedup imports text

    inst = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), 1)).alias("__t"),
    ).select(id_col, stable_hash64(F.col("__t")).alias("__h"))
    freq = inst.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    if rare_max_div is not None:
        rare_max_scalar = df.select(
            F.expr(f"count(1) div {int(rare_max_div)}").alias("__rare_max")
        ).scalar()
        rare_cond = F.col("__c") <= rare_max_scalar
    else:
        rare_cond = F.col("__c") <= F.lit(rare_max)
    per_doc = (
        inst.join(freq, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(rare_cond, F.lit(1))), F.lit(0)
            ).alias("n_rare"),
            F.min("__c").alias("min_token_count"),
        )
    )
    out = df.select(id_col).join(per_doc, id_col, "left")
    n_tokens = F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
    n_rare = F.coalesce(F.col("n_rare"), F.lit(0)).cast("long")
    rare_frac = F.when(
        n_tokens > 0, n_rare.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_rare.alias("n_rare"),
        rare_frac.alias("rare_frac"),
        F.coalesce(F.col("min_token_count"), F.lit(0)).cast("long").alias(
            "min_token_count"
        ),
        (rare_frac >= rare_frac_max).alias("rare_heavy"),
    )


def bpe_merge_candidates(
    df: DataFrame,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """First BPE merge round of tokenizer induction (Sennrich et al.
    2016): corpus-weighted counts of adjacent character pairs, the
    statistic the merge rule argmaxes over.  Output: top-``k``
    (``pair``, ``pair_count``) by count desc, pair asc — ``pair_count``
    sums the frequency of every word containing the pair at each
    position (a word contributes once per occurrence position, times its
    corpus frequency, the standard formulation).

    Scale shape: the corpus-sized pass is the word-frequency aggregate
    (map-side combinable, vocabulary-sized output); the pair explode then
    runs over DISTINCT words only — at 100 TB that's millions of rows,
    not trillions — and the final top-k plans as TakeOrderedAndProject.
    Later merge rounds re-segment words against the grown vocabulary;
    each round is this same pipeline over the (tiny) word table.
    """
    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    n = F.length(F.col("__w"))
    positions = F.sequence(F.lit(1), n - 1)
    pairs = F.when(n >= 2, F.transform(
        positions, lambda i: F.col("__w").substr(i, F.lit(2))
    )).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs).alias("pair"), F.col("__f"))
        .groupBy("pair")
        .agg(F.sum("__f").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(k)
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    top_k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    classic phrase-mining signal ("new york" scores high because its
    joint frequency dwarfs what its parts' frequencies predict).

    pmi_q20 = micro_log2( (c_xy/c_x) · (N1/c_y) · (N1/Nb) ), the exact
    quantized log2 of p(xy) / (p(x)·p(y)) with p(xy) = c_xy/Nb over
    bigram instances and p(x) = c_x/N1 over unigram instances.  Every
    factor is a correctly-rounded IEEE division of exact int64 counts,
    multiplied in a FIXED left-to-right order mirrored by the SQL twin,
    and micro_log2 is the cross-engine-exact quantizer — so the score
    hashes bit-identically; the three-ratio form keeps every
    intermediate within double range at any corpus size (a c_xy·N1·N1
    integer product overflows int64 at ~10 GB of tokens).

    Scale shape: two combine-friendly corpus token passes (bigram and
    unigram counts — the shuffle carries per-partition partials, never
    the token stream); the ``min_count`` support filter prunes the
    bigram frame BEFORE any join; the two frequency joins key on single
    tokens against the vocab-sized unigram frame (shuffle joins — the
    vocabulary outgrows broadcast at 100 TB); the corpus totals inject
    as true scalar subqueries over the PERSISTED count frames (no
    driver-side eager count, no BNLJ 1-row join, no corpus-frame
    single-partition window); the final cut is TakeOrderedAndProject.
    Token strings ride the aggregation as GROUP KEYS only (never in
    accumulator buffers — the SortAggregate trap).

    Output: (x, y, c_xy bigint, pmi_q20 bigint), pmi desc, (x, y) asc.
    """
    from pyspark import StorageLevel

    from mvrepair.functions.exactlog import micro_log2

    toks = df.select(F.split(F.col(text_col), " ").alias("__toks"))
    head = F.expr("slice(__toks, 1, greatest(size(__toks) - 1, 0))")
    tail = F.expr("slice(__toks, 2, greatest(size(__toks) - 1, 0))")
    pairs = toks.select(
        F.explode(
            F.zip_with(head, tail, lambda a, b: F.struct(a.alias("x"), b.alias("y")))
        ).alias("__p")
    ).select(F.col("__p.x").alias("x"), F.col("__p.y").alias("y"))
    from mvrepair import cache as _cache

    # pair/unigram count frames are referenced by the returned plan's
    # scalar subqueries, so the operator can't unpersist them itself:
    # register with the ownership registry (mvrepair.cache) so the
    # harness's release_all() frees them after materialization
    big = _cache.own(
        pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    )
    uni = _cache.own(
        df.select(F.explode(tokenize(F.col(text_col))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n1 = uni.select(F.sum("c").cast("long").alias("n")).scalar()
    nb = big.select(F.sum("c_xy").cast("long").alias("n")).scalar()
    cx = uni.select(F.col("t").alias("x"), F.col("c").alias("__cx"))
    cy = uni.select(F.col("t").alias("y"), F.col("c").alias("__cy"))
    ratio = (
        (F.col("c_xy").cast("double") / F.col("__cx").cast("double"))
        * (n1.cast("double") / F.col("__cy").cast("double"))
        * (n1.cast("double") / nb.cast("double"))
    )
    # materialize the ratio BEFORE quantizing: the scalar subqueries
    # (n1/nb) may not appear inside micro_log2's higher-order fold
    # (Spark rejects subquery expressions within HOFs), so the ratio
    # projects to a plain double column first
    scored = (
        big.filter(F.col("c_xy") >= min_count)
        .join(cx, "x")
        .join(cy, "y")
        .select(
            "x",
            "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            ratio.alias("__r"),
        )
        .select(
            "x", "y", "c_xy", micro_log2(F.col("__r")).alias("pmi_q20")
        )
    )
    return scored.orderBy(
        F.col("pmi_q20").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(top_k)


def posting_lists(
    df: DataFrame,
    k_docs: int = 20,
    min_df: int = 2,
    top_tokens: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Capped inverted-index posting lists: for the ``top_tokens`` most
    document-frequent tokens (df >= ``min_df``), the EXACT document
    frequency plus the first ``k_docs`` posting doc-ids in ascending id
    order, serialized as a comma-joined string (the hash-checkable
    representation; consumers split on ',').

    The cap is the scale contract: a stopword-grade token's full posting
    list is corpus-sized, so materializing uncapped lists turns one hot
    token into one hot task AND an output row of unbounded width.  df
    stays exact (counted before the cap); only the listed prefix is
    bounded.

    Scale shape: per-row ``array_distinct`` → explode — a (token, doc)
    pair can only originate from its own doc's row, so row-local dedupe
    IS global dedupe and the pair stream needs NO dedup exchange at all
    (the first version shuffled every pair through a groupBy(token, doc)
    first — a corpus-sized exchange the prefix-join profiling flagged as
    pure overhead); then one token-keyed exchange for the df-count
    window + posting-rank window (both share the one Exchange+Sort),
    and the final per-token fold reuses that partitioning (collect_list
    over <= ``k_docs`` rows — bounded agg buffers).  The top-tokens cut
    plans as TakeOrderedAndProject.  Deterministic total order: df
    desc, token asc.

    PRECONDITION: ``id_col`` is unique per row (one row per document).
    The row-local-equals-global-dedupe argument depends on it: with
    duplicate doc rows the old groupBy(token, doc) form merged
    (token, doc) pairs across rows, while per-row ``array_distinct``
    would double-count df and emit duplicate postings.  Every corpus
    table in this repo (and the driver's ``documents`` fixture)
    satisfies it; dedupe upstream if yours doesn't.

    Output: (token, df bigint, n_listed bigint, postings string).
    """
    from pyspark.sql.window import Window

    pairs = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias(
            "token"
        ),
    )
    w_df = Window.partitionBy("token")
    w_rank = Window.partitionBy("token").orderBy(F.col(id_col).asc())
    ranked = pairs.select(
        "token",
        F.col(id_col),
        F.count(F.lit(1)).over(w_df).cast("long").alias("df"),
        F.row_number().over(w_rank).alias("__rn"),
    ).filter(F.col("__rn") <= k_docs)
    folded = (
        ranked.groupBy("token")
        .agg(
            F.max("df").alias("df"),
            F.count(F.lit(1)).cast("long").alias("n_listed"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )
    return folded.orderBy(F.col("df").desc(), F.col("token").asc()).limit(
        top_tokens
    )


def source_divergence(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source KL divergence of the unigram token distribution from
    the whole-corpus distribution — the drift/contamination dashboard
    number data-mixing pipelines watch ("is this crawl slice
    distributionally unlike the corpus?"), and the exact-arithmetic
    stand-in for the DoReMi-style domain-weight diagnostics.

    KL(p_s || q) = Σ_t p_s(t) · log2(p_s(t) / q(t)) over the source's
    token support, reported as ``kl_q20_sum`` = Σ_t c_st ·
    micro_log2((c_st / c_t) · (N / N_s)) — an int64 in token·2^-20
    log2-units (divide by n_tokens · 2^20 for bits/token).  Every factor
    is either an exact integer or a correctly-rounded IEEE double
    (division/multiplication only), and micro_log2 is the cross-engine-
    exact quantizer, so both engines agree bit-for-bit; the two-division
    ratio form keeps every intermediate within double range at ANY
    corpus size (a c_st · N integer product would overflow int64 at
    ~10 TB of tokens).  Also per source: ``n_tokens``, ``vocab``.

    Scale shape: ONE corpus token pass (explode → 60-bit fingerprints →
    (source, token) counts, map-side combinable); the global token
    frequencies derive from THAT vocab-sized frame (groupBy __h — same
    key, second small exchange), never a second corpus pass; per-source
    totals and the grand total live on |sources|-row frames (the grand
    total via an empty-partition window over the tiny frame — the
    key_skew precedent); the contribution join keys on __h
    (vocab-sized) with the totals broadcast.  The final rollup keys on
    source — |sources| groups, combine-friendly.
    """
    from pyspark.sql.window import Window

    from mvrepair.functions.exactlog import micro_log2
    from mvrepair.operators.dedup import shingles  # deferred: dedup imports text

    from pyspark import StorageLevel

    inst = df.select(
        F.col(source_col).alias("__s"),
        F.explode(shingles(F.col(text_col), 1)).alias("__t"),
    ).select("__s", stable_hash64(F.col("__t")).alias("__h"))
    # persist the (source, token) count frame: it feeds the global
    # frequencies, the per-source totals, AND the contribution join —
    # without the cache each consumer re-runs the corpus token pass
    # (the frame itself is vocab x sources, tiny relative to the corpus)
    from mvrepair import cache as _cache

    per_src = _cache.own(
        inst.groupBy("__s", "__h").agg(F.count(F.lit(1)).alias("__cs"))
    )
    glob = per_src.groupBy("__h").agg(F.sum("__cs").alias("__cg"))
    totals = per_src.groupBy("__s").agg(
        F.sum("__cs").alias("__ns"), F.count(F.lit(1)).alias("__vocab")
    )
    w_all = Window.partitionBy()
    totals = totals.select(
        "__s", "__ns", "__vocab", F.sum("__ns").over(w_all).alias("__ng")
    )
    ratio = (
        F.col("__cs").cast("double") / F.col("__cg").cast("double")
    ) * (F.col("__ng").cast("double") / F.col("__ns").cast("double"))
    contrib = (
        per_src.join(glob, "__h")
        .join(F.broadcast(totals), "__s")
        .select(
            "__s",
            "__ns",
            "__vocab",
            (F.col("__cs") * micro_log2(ratio)).alias("__kl"),
        )
    )
    return contrib.groupBy("__s").agg(
        F.first("__ns").alias("n_tokens"),
        F.first("__vocab").alias("vocab"),
        F.sum("__kl").cast("long").alias("kl_q20_sum"),
    ).select(
        F.col("__s").alias("source"), "n_tokens", "vocab", "kl_q20_sum"
    )


def phrase_search(
    df: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional phrase-AND search — the search-engine primitive the
    capped ``posting_lists`` index feeds: find every document where a
    query phrase's terms occur at CONSECUTIVE positions, with the exact
    occurrence count.

    Algorithm (the classic positional-postings identity): a phrase of
    terms t_0..t_{L-1} matches at start position s iff token(s+i) = t_i
    for all i, i.e. iff the (term, idx) spec rows all land on the same
    normalized key s = pos − idx.  So ONE broadcast join of positional
    postings against the tiny spec frame + ONE (phrase, doc, start)
    count == L gives every match — no L-way self-join chain, phrase
    length only changes the spec fan-out, and repeated terms inside a
    phrase fall out for free (each idx lands once per start).

    Scale shape: the posexplode stream filters to spec terms DURING the
    broadcast hash join (map-side, pre-shuffle — a stopword-free phrase
    prunes the corpus stream to the phrase terms' postings only); the
    only exchange is the (phrase, doc, start)-keyed count whose volume
    is the matched-postings stream, not the corpus.

    Output: ``(phrase, doc_id, n_matches)``, one row per matching doc.
    """
    spec_rows = []
    for ph in phrases:
        terms = ph.split(" ")
        for idx, t in enumerate(terms):
            spec_rows.append((ph, t, idx, len(terms)))
    spec = df.sparkSession.createDataFrame(
        spec_rows, "phrase string, term string, idx int, plen int"
    )
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "token"),
    )
    starts = (
        toks.join(F.broadcast(spec), F.col("token") == F.col("term"))
        .groupBy(
            "phrase",
            id_col,
            (F.col("pos") - F.col("idx")).alias("start"),
            "plen",
        )
        .agg(F.count(F.lit(1)).alias("__k"))
        .filter(F.col("__k") == F.col("plen"))
    )
    return starts.groupBy("phrase", id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )
