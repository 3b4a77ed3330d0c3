"""Count-trained bigram language model — train and score in one pipeline.

The canonical LLM-corpus quality filter is an n-gram LM perplexity score
(Wenzek et al., "CCNet", LREC 2020: a KenLM 5-gram scores every crawl
paragraph; low-perplexity ≈ fluent text).  Gradient-free n-gram LMs
train by COUNTING, so — like the Naive-Bayes classifier in
``nbayes.py`` — the whole model is exact-integer arithmetic plus one
cross-engine-exact ``micro_log2`` quantization, making the training run
itself hash-checkable against a SQL oracle.

Model (hashed-bigram, add-one smoothing over the bucket universe):

    b(w)      = stable_hash64(w) mod B        (B hash buckets)
    P(b2|b1)  = (C(b1,b2) + 1) / (C(b1,·) + B)
    w(b1,b2)  = micro_log2(P(b2|b1))          (int64, 2^-20 resolution)

Per document: ``nll_q20`` = -Σ over its bigram instances of w(b1,b2)
(a positive int64 — total log2-loss in q20 units) and ``bpt_q20`` =
nll_q20 DIV n_bigrams (bits-per-token in q20 units, integer division —
the perplexity proxy curation thresholds cut on: perplexity =
2^(bpt_q20 / 2^20)).

Scoring needs no densified grid (unlike nbayes): every bigram a
document can produce was, by construction, observed during training —
the model covers its own corpus exactly, so the model join never
misses.

Scale shape: the corpus is scanned twice and NEVER shuffled at
corpus size —

1. model pass: explode bigram bucket pairs → groupBy(b1,b2) count.
   Map-side combinable; the exchange carries at most B² partial rows
   (B=1024 → ≤1M — a model-sized frame at ANY corpus size, the hashed
   bucketing is what bounds it).  Context totals and smoothing derive
   from THAT frame (window over b1 partitions of a ≤B²-row frame).
2. scoring pass: the same explode map-side-joins the BROADCAST weight
   table (≤B² rows of three int64s, ≈24 MB worst-case at B=1024) and
   partial-aggregates per doc before the only other exchange — keyed
   by doc id, carrying two int64s per doc.

Raw (doc, b1, b2) instances never cross the wire; text never leaves
the scan.  Reference has no LM surface — this is part of the
LLM-data-pipeline extension block (SURVEY §2 "absent surface").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from mvrepair.operators.nbayes import _bucket_expr
from mvrepair.operators.text import tokenize


def _bigram_pairs(text_col: str, buckets: int):
    """Array of (b1, b2) hashed-bucket structs per row — pure array
    expressions, guarded for <2-token texts (``sequence`` would count
    backwards)."""
    toks = tokenize(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            _bucket_expr(F.element_at(toks, i), buckets).alias("b1"),
            _bucket_expr(F.element_at(toks, i + 1), buckets).alias("b2"),
        ),
    )
    return F.when(F.size(toks) >= 2, pairs).otherwise(
        F.array().cast("array<struct<b1:bigint,b2:bigint>>")
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
) -> DataFrame:
    """(id, n_bigrams, nll_q20, bpt_q20) per document with ≥1 bigram:
    total and per-token log2-loss under the corpus's own hashed-bigram
    LM, in exact q20 integer units."""
    inst = df.select(
        F.col(id_col), F.explode(_bigram_pairs(text_col, buckets)).alias("__p")
    ).select(id_col, F.col("__p.b1").alias("__b1"), F.col("__p.b2").alias("__b2"))

    cb = inst.groupBy("__b1", "__b2").agg(F.count(F.lit(1)).alias("__ct"))
    ctx = Window.partitionBy("__b1")
    from mvrepair.functions.exactlog import micro_log2_df

    weights = micro_log2_df(
        cb.select(
            "__b1",
            "__b2",
            (
                (F.col("__ct") + 1).cast("double")
                / (F.sum("__ct").over(ctx) + buckets).cast("double")
            ).alias("__r"),
        ),
        F.col("__r"),
        "__w",
        ["__b1", "__b2"],
    )
    scored = (
        inst.join(F.broadcast(weights), ["__b1", "__b2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("__w")).alias("nll_q20"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "nll_q20",
        F.expr("nll_q20 DIV n_bigrams").alias("bpt_q20"),
    )
