"""Bucketed co-located join (mvrepair.operators.layout.write_bucketed /
bucketed_join).

Pinned structurally, not just by result:
- the join subtree contains NO Exchange and NO Sort — the bucket
  layout satisfies both the HashPartitioning requirement and the sort
  order (one file per bucket via the aligned repartition + the
  SPARK-28595 legacy ordering flag the reader sets);
- each bucket is exactly one file (the condition the ordering trust is
  guarded by);
- results equal the plain unbucketed join bit-for-bit;
- re-writing the same table name is idempotent, including over an
  orphaned warehouse directory whose catalog entry is gone (the
  cross-session LOCATION_ALREADY_EXISTS reconciliation).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mvrepair.operators import layout as LY


def _tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    LY.write_bucketed(li, "t_bkt_li", "l_orderkey", 4)
    LY.write_bucketed(ords, "t_bkt_ord", "o_orderkey", 4)
    return li, ords


def _join_subtree_nodes(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # everything below (and including) the SortMergeJoin line
    lines = plan.splitlines()
    start = next(
        i for i, l in enumerate(lines) if "SortMergeJoin" in l
    )
    return lines[start:]


def test_join_is_shuffle_and_sort_free(spark, sf_dir):
    li, ords = _tables(spark, sf_dir)
    j = LY.bucketed_join(spark, "t_bkt_li", "t_bkt_ord",
                         "l_orderkey", "o_orderkey")
    sub = _join_subtree_nodes(j)
    assert not any("Exchange" in l for l in sub), sub
    assert not any(
        "Sort [" in l for l in sub if "SortMergeJoin" not in l
    ), sub
    assert any("SelectedBucketsCount" in l for l in sub)


def test_one_file_per_bucket(spark, sf_dir):
    _tables(spark, sf_dir)
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t, n in (("t_bkt_li", 4), ("t_bkt_ord", 4)):
        files = [
            f for f in os.listdir(f"{wh}/{t}") if f.endswith(".parquet")
        ]
        assert len(files) == n, (t, files)


def test_matches_plain_join(spark, sf_dir):
    li, ords = _tables(spark, sf_dir)
    j = (
        LY.bucketed_join(spark, "t_bkt_li", "t_bkt_ord",
                         "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    ref = (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    got = {tuple(r) for r in j.collect()}
    want = {tuple(r) for r in ref.collect()}
    assert got == want and got


def test_rewrite_idempotent_over_orphan_location(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    LY.write_bucketed(li, "t_bkt_orphan", "l_orderkey", 2)
    n1 = spark.table("t_bkt_orphan").count()
    # simulate the dead-session orphan: catalog entry dropped, files kept
    from urllib.parse import urlparse
    import shutil

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    saved = f"{wh}/__t_bkt_orphan_saved"
    shutil.copytree(f"{wh}/t_bkt_orphan", saved)
    spark.sql("DROP TABLE t_bkt_orphan")
    shutil.move(saved, f"{wh}/t_bkt_orphan")
    LY.write_bucketed(li, "t_bkt_orphan", "l_orderkey", 2)
    assert spark.table("t_bkt_orphan").count() == n1
