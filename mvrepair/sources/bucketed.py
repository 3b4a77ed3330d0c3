"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

At 100 TB the reconcile join (base ⋈ MV on the MV PK) is the dominant
shuffle.  If both scans are written bucketed by the join key with the same
bucket count, Spark's bucketing metadata proves the sides are co-partitioned
and the sort-merge join runs with **no Exchange on either side** — the
shuffle is paid once at write time and amortized over every subsequent run
(the reference re-scans and re-shuffles both tables every run).

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
catalog, not the parquet footer).  ``assert_no_shuffle_join`` is the
self-check used by the tests and available to operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.

    Sorting within buckets lets the subsequent SMJ skip its sort too.
    With ``path`` the table is external (data at ``path``); otherwise it is
    managed under the session warehouse dir.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str], how: str = "full_outer"
) -> DataFrame:
    """Join two same-bucketing tables on their bucket keys.

    With matching bucket specs Catalyst plans this without Exchange
    (verify with ``assert_no_shuffle_join`` / ``.explain``).
    """
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=keys, how=how
    )


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange.

    Used to prove bucketed co-location actually eliminated the join
    shuffle rather than silently falling back.  BroadcastExchange is not a
    shuffle and is allowed.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        line.strip()
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "ReusedExchange" not in line
    ]
    if shuffles:
        raise AssertionError(f"plan contains shuffle Exchange(s):\n{plan}")
