"""Distributed Naive-Bayes text classification — train AND infer as one
declarative pipeline.

Curation pipelines train lightweight classifiers (language ID, quality,
domain) over the corpus itself and then score every document with them.
Gradient-trained models (logistic regression, fastText) need float
iteration loops that no external oracle can reproduce bit-for-bit —
but multinomial Naive Bayes trains by COUNTING, and counts are exact
integers: the entire model (per-class hashed-token counts + class
priors) aggregates map-side-combinably in one pass, and the scoring
weights quantize to int64 micro-units the way bm25/dsir do.  The result
is a classifier whose training run is hash-checkable across engines.

Model: for class c and hash bucket b (``stable_hash64(token) mod B``),

    w(c,b)  = mlog2((ct[c,b]+1) / (T[c]+B))     (add-one smoothing)
    prior(c) = mlog2(n_docs[c] / n_docs)

where ``mlog2`` is the cross-engine-EXACT quantized log2 of
``mvrepair.functions.exactlog`` (2^20 fractional scale, ~the old 1e-6
ln-micro resolution).  The first convention here — ``floor(1e6 *
ln(ratio))`` — was measurably hash-flaky: Java ``Math.log`` and DuckDB
libm ``log`` floor differently on ~1e-3 of boundary-adversarial count
grids (see exactlog's module docstring); mlog2 composes only
IEEE-correctly-rounded ops, so every engine quantizes identically.

score(doc,c) = prior(c) + Σ_tokens w(c, bucket(token)); predicted class
is the argmax, ties broken to the lexicographically smallest class.

The arithmetic lives ONCE, in the private builders below; the fused
trainer (``nb_train_classify``), the standalone model
(``nb_model``) and the reusable scorer (``nb_score``) all compose them,
so the smoothing formula, quantization, and tie-break cannot
desynchronize between the batch and streaming paths (whose oracle
asserts they agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from mvrepair.functions import stable_hash64


def _bucket_expr(tok_col: Column, buckets: int) -> Column:
    # non-nullable bucket: keeps consumer subplans identical so
    # ReuseExchange fires (see dsir_scores)
    return F.coalesce(stable_hash64(tok_col) % buckets, F.lit(0))


def _model_frames(
    class_bucket: DataFrame, class_docs: DataFrame, buckets: int
) -> tuple[DataFrame, DataFrame]:
    """(weights, priors) from pre-aggregated (__lbl, __b, __ct) counts and
    (__lbl, __nd) doc counts.

    The grid is DENSIFIED over classes x all buckets: a class that never
    saw a bucket must score the smoothed zero-count penalty
    mlog2(1/(T+B)), not a silent 0 (= mlog2(1)!) from a missing join
    row.  The ratio is ONE correctly-rounded double division of exact
    integers, so both engines hand micro_log2 the identical double.
    """
    from mvrepair.functions.exactlog import micro_log2_df

    grid = class_docs.select(
        "__lbl",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__b"),
    )
    dense = grid.join(class_bucket, ["__lbl", "__b"], "left").select(
        "__lbl", "__b", F.coalesce(F.col("__ct"), F.lit(0)).alias("__ct")
    )
    per_class = Window.partitionBy("__lbl")
    weights = micro_log2_df(
        dense.select(
            F.col("__lbl").alias("__c"),
            "__b",
            (
                (F.col("__ct") + 1).cast("double")
                / (F.sum("__ct").over(per_class) + buckets)
            ).alias("__r"),
        ),
        F.col("__r"),
        "__w",
        ["__c", "__b"],
    )
    everything = Window.partitionBy()
    priors = micro_log2_df(
        class_docs.select(
            F.col("__lbl").alias("__c"),
            (
                F.col("__nd").cast("double") / F.sum("__nd").over(everything)
            ).alias("__r"),
        ),
        F.col("__r"),
        "__prior",
        ["__c"],
    )
    return weights, priors


def _score_best(
    doc_bucket: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    id_col: str,
) -> DataFrame:
    """(id, pred, score_micro): broadcast-model scoring + per-doc argmax
    over |classes| rows, ties to the lexicographically smallest class."""
    scores = (
        doc_bucket.join(F.broadcast(weights), "__b")
        .groupBy(id_col, "__c")
        .agg(F.sum(F.col("__n") * F.col("__w")).alias("__s"))
        .join(F.broadcast(priors), "__c")
        .select(
            id_col, "__c", (F.col("__s") + F.col("__prior")).alias("__post")
        )
    )
    pick = Window.partitionBy(id_col).orderBy(
        F.col("__post").desc(), F.col("__c").asc()
    )
    return (
        scores.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__c").alias("pred"),
            F.col("__post").alias("score_micro"),
        )
    )


def nb_train_classify(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Train a multinomial NB model on ``label_col`` and classify every
    document with it, in one pipeline.

    Output per doc: ``pred`` (argmax class), ``score_micro`` (winning
    class's log-posterior in micro-units), ``actual`` (the training
    label), ``correct``.

    Scale shape: ONE corpus token pass — the (doc, label, bucket) counts
    feed both the model build (re-aggregated by (label, bucket) —
    classes x buckets rows, with totals via tiny-frame windows) and the
    scoring join; Spark's ReuseExchange collapses the two consumers to a
    single explode+aggregate, exactly the dsir_scores pattern.  The
    model is a broadcast DataFrame (classes x buckets rows — no driver
    artifact); scoring shuffles on (doc, class) where classes is a small
    constant; the argmax is a per-doc window over |classes| rows.
    """
    tok = df.select(
        F.col(id_col),
        F.col(label_col).alias("__lbl"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).select(
        id_col, "__lbl", _bucket_expr(F.col("__tok"), buckets).alias("__b")
    )
    doc_bucket = tok.groupBy(id_col, "__lbl", "__b").agg(
        F.count(F.lit(1)).alias("__n")
    )
    class_bucket = doc_bucket.groupBy("__lbl", "__b").agg(
        F.sum("__n").alias("__ct")
    )
    doc_labels = df.select(F.col(id_col), F.col(label_col).alias("__lbl"))
    class_docs = doc_labels.groupBy("__lbl").agg(
        F.count(F.lit(1)).alias("__nd")
    )
    weights, priors = _model_frames(class_bucket, class_docs, buckets)
    best = _score_best(doc_bucket, weights, priors, id_col)
    return best.join(doc_labels, id_col).select(
        id_col,
        "pred",
        "score_micro",
        F.col("__lbl").alias("actual"),
        (F.col("pred") == F.col("__lbl")).alias("correct"),
    )


def nb_model(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Train the NB model alone: returns ``(weights, priors)`` frames —
    (__c, __b, __w) micro-quantized log-likelihoods over the densified
    class x bucket grid, and (__c, __prior).  Both are classes-sized:
    persist + broadcast them to score any number of downstream frames
    (the streaming scorer does exactly that).  Same builders as
    ``nb_train_classify`` — the arithmetic cannot drift between paths.
    """
    tok = df.select(
        F.col(label_col).alias("__lbl"),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).select("__lbl", _bucket_expr(F.col("__tok"), buckets).alias("__b"))
    class_bucket = tok.groupBy("__lbl", "__b").agg(
        F.count(F.lit(1)).alias("__ct")
    )
    class_docs = df.groupBy(F.col(label_col).alias("__lbl")).agg(
        F.count(F.lit(1)).alias("__nd")
    )
    return _model_frames(class_bucket, class_docs, buckets)


def nb_score(
    df: DataFrame,
    weights: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Score documents against a frozen NB model: (id, pred,
    score_micro).  Map-side token pass + broadcast model join + per-doc
    |classes|-row argmax — the inference half of ``nb_train_classify``,
    reusable per micro-batch against a persisted model.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"),
    ).select(id_col, _bucket_expr(F.col("__tok"), buckets).alias("__b"))
    doc_bucket = tok.groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__n"))
    return _score_best(doc_bucket, weights, priors, id_col)
