"""Training-sequence layout operators: fixed-budget packing and
overlapping chunking.

``pack_sequences`` answers "where does each document land in the packed
token stream a trainer reads": documents are concatenated in a
deterministic order and cut into fixed ``budget``-token sequences
(documents straddle cuts — the standard pretraining layout).  A single
global stream would serialize on one window partition, so the corpus is
first split into independent hash-sharded streams (one per trainer data
rank): the cumulative-sum window runs per shard, giving full parallelism
with one shuffle.  Shard assignment reuses the run-stable md5 hash of
``sources.corpus.shard_id`` — re-running on the same corpus reproduces
byte-identical layout, which checkpoint-resume requires.

``chunk_documents`` is the retrieval-side twin: each document splits into
overlapping fixed-token windows (stride = chunk − overlap), the standard
embedding-pipeline preprocessing.  Pure per-row array algebra — the only
explode emits one row per chunk, and there is no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from mvrepair.operators.text import tokenize
from mvrepair.sources.corpus import shard_id


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    n_streams: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-cut sequence packing: per hash-stream, documents are
    laid out in ascending id order and cut every ``budget`` tokens.

    Output per doc: ``stream`` (which packed token stream), ``seq_id``
    (the sequence its FIRST token lands in), ``seq_offset`` (token offset
    inside that sequence), ``n_tokens``.  A doc with
    ``seq_offset + n_tokens > budget`` straddles into the next
    sequence(s) — the trainer's attention mask, not the layout, handles
    the boundary.

    Scale shape: one shuffle (hash partition on ``stream``), then a
    per-stream ordered window cumsum.  Streams are independent, so
    parallelism = ``n_streams`` — size it to the trainer's data ranks,
    not the cluster (each stream must replay deterministically).
    """
    toks = F.size(tokenize(F.col(text_col))).cast("long")
    base = df.select(
        F.col(id_col),
        shard_id(F.col(id_col), n_streams).alias("stream"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__pos")
    return base.select(
        id_col,
        "stream",
        pos,
        "n_tokens",
    ).select(
        id_col,
        "stream",
        # integer div, not floor(double /): token positions at 100 TB
        # exceed a double's 53-bit exact range
        F.expr(f"__pos div {int(budget)}").cast("long").alias("seq_id"),
        F.pmod(F.col("__pos"), F.lit(budget)).cast("long").alias("seq_offset"),
        "n_tokens",
    )


def chunk_documents(
    df: DataFrame,
    chunk: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-token chunks: windows of ``chunk`` tokens every
    ``stride = chunk - overlap`` tokens, starting at token 1; the final
    window may be short.  One row per (doc, chunk) via a single per-row
    explode — no shuffle, no join.

    Output: (``id_col``, chunk_id, n_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got {chunk=} {overlap=}")
    stride = chunk - overlap
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # chunk starts: 1 + k*stride for k in 0 .. floor((n-1)/stride)
    ks = F.sequence(
        F.lit(0), (((n - 1) - F.pmod(n - 1, stride)) / stride).cast("int")
    )
    chunks: Column = F.transform(
        ks,
        lambda k: F.struct(
            k.cast("long").alias("chunk_id"),
            F.least(F.lit(chunk), n - (k * stride)).cast("long").alias("n_tokens"),
            F.array_join(
                F.slice(toks, k * stride + 1, chunk), " "
            ).alias("chunk_text"),
        ),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def training_order(
    packed: DataFrame,
    seed: str = "epoch0",
    stream_col: str = "stream",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Deterministic global shuffle of packed sequences — the read order a
    trainer consumes for one epoch.

    One row per packed sequence (with ``n_docs``/``seq_tokens`` totals of
    the documents STARTING in it), globally ordered by a seeded content
    hash of the sequence identity: re-running on any cluster or
    partitioning reproduces the identical order, and changing ``seed``
    (e.g. per epoch) yields an independent permutation — no stored
    shuffle file, no RNG state to checkpoint.

    Scale shape: one hash aggregation (map-side combinable) + a
    distributed ORDER BY — Spark samples the key range, range-partitions,
    and sorts per partition.  Deliberately NOT a row_number()-over-
    global-window ordinal, which would funnel every row through a single
    partition; consumers that need an ordinal get it per range-partition
    from the sorted files' natural order.
    """
    from mvrepair.functions import stable_hash64

    seqs = packed.groupBy(stream_col, seq_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )
    key = stable_hash64(
        F.concat_ws(
            ":",
            F.lit(seed),
            F.col(stream_col).cast("string"),
            F.col(seq_col).cast("string"),
        )
    )
    # Tie-break on (stream, seq) after the hash key: on a 60-bit hash
    # collision the colliding sequences would otherwise sort in
    # engine-dependent order, breaking the "deterministic global shuffle"
    # contract (and the harness's order-sensitive oracle compare).
    return seqs.withColumn("shuffle_key", key).orderBy(
        "shuffle_key", stream_col, seq_col
    )
