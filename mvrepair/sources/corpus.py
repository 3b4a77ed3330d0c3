"""Corpus I/O for the training-data pipeline: JSONL/CSV document sources
and a deterministic sharded parquet sink.

Sources
-------
Training corpora arrive as JSONL (one document object per line) or CSV
far more often than parquet.  Both readers take an EXPLICIT schema —
schema inference is a full extra pass over the data, which at 100 TB
doubles the ingest cost and can silently widen types between runs.
Malformed lines are captured, not dropped: PERMISSIVE mode routes them
into a ``_corrupt_record`` column so the pipeline can count/quarantine
them (a silent drop at web scale loses an unknowable amount of data).

Sink
----
``write_training_shards`` materializes a curated corpus as
hash-sharded parquet: a deterministic shard id (md5-based
``stable_hash64`` — NOT ``spark_partition_id``, which depends on the
physical plan and cluster size) partitions the output directory, and
``maxRecordsPerFile`` bounds individual file sizes so downstream
loaders stream fixed-size chunks.  Determinism matters: re-running the
job on the same input must place each document in the same shard, or
incremental consumers re-read everything.

Scale shape: one shuffle (``repartition`` on the shard column) aligns
task outputs with directory partitions, so each shard directory is
written by exactly the tasks owning that shard — without it,
``partitionBy`` makes EVERY task open a file in EVERY shard directory
(tasks × shards small files, the classic object-store metadata
explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from mvrepair.functions import stable_hash64

# The documents fixture schema (TESTDATA.md) — the default contract for
# text-corpus ingest.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """JSONL document source: explicit schema (no inference pass),
    malformed lines preserved in ``_corrupt_record``.

    Note Spark's JSON reader semantics: a malformed line yields NULL for
    every schema column and the raw line in the corrupt column; filtering
    ``_corrupt_record IS NULL`` gives the clean corpus.
    """
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """CSV document source with the same explicit-schema + corrupt-capture
    contract as ``read_jsonl``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", "true" if header else "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "false")
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) — clean rows drop the corrupt column;
    quarantine rows keep the full row (Spark refuses plans whose ONLY
    referenced column from a raw JSON/CSV scan is the corrupt column —
    QUERY_ONLY_CORRUPT_RECORD_COLUMN — so the raw line plus the
    all-NULL schema columns come along, which re-ingest wants anyway)."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def shard_id(key: F.Column, n_shards: int) -> F.Column:
    """Deterministic shard assignment: ``pmod(stable_hash64(key), n)``.
    Engine- and run-stable (md5-based), unlike hashpartitioning or
    ``spark_partition_id`` which change with the physical plan."""
    return F.pmod(stable_hash64(key.cast("string")), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    outdir: str,
    key_col: str = "doc_id",
    n_shards: int = 64,
    max_records_per_file: int | None = None,
    sort_col: str | None = None,
) -> None:
    """Write a curated corpus as hash-sharded parquet:
    ``<outdir>/shard=<k>/part-*.parquet``.

    One shuffle on the shard id aligns tasks with output directories
    (each shard written by its owning tasks only); ``maxRecordsPerFile``
    splits oversized shards into bounded files without another shuffle.

    ``sort_col`` additionally sorts rows WITHIN each shard's task before
    writing (no extra shuffle — ``sortWithinPartitions`` is a local
    sort).  Parquet then records tight, monotone min/max statistics for
    that column per row group, so a later filtered scan on it skips
    whole row groups instead of decoding them — the poor man's Z-order,
    and at 100 TB the difference between reading a shard and reading a
    few megabytes of it.
    """
    sharded = df.withColumn("shard", shard_id(F.col(key_col), n_shards))
    sharded = sharded.repartition("shard")
    if sort_col is not None:
        sharded = sharded.sortWithinPartitions("shard", sort_col)
    writer = sharded.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("shard").parquet(outdir)


def read_training_shards(
    spark: SparkSession, outdir: str, shards: list[int] | None = None
) -> DataFrame:
    """Read back a sharded corpus; ``shards`` prunes to the named shard
    partitions (directory-level pruning — no data files outside the
    selection are opened, visible as ``PartitionFilters`` in the plan)."""
    df = spark.read.parquet(outdir)
    if shards is not None:
        df = df.filter(F.col("shard").isin(shards))
    return df
