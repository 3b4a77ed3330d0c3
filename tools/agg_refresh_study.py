"""Refresh-vs-recompute study for incremental aggregate maintenance.

The claim under test (operators/maintenance.py): once the view is
materialized, absorbing an insert-only delta costs the delta agg + a
shuffle of (|view| + |delta-groups|) rows — NOT a rescan of the base.
The scale_study harness can't express this (its timed cell includes
everything the op function does, and the view build is recompute-sized
by definition), so this tool separates the phases per factor:

  1. inflate orders to k copies (both orderkey AND custkey shifted, so
     the key space — hence the view — grows with volume),
  2. build + write the view WITHOUT the delta rows (untimed),
  3. time: refresh = view-parquet ∪ agg(delta) → re-agg,
  4. time: full recompute over base ∪ delta (the control),
  both to a noop sink, warm-started, median of 3.

Delta = the copy-0 o_orderkey%13==2 rows — constant-absolute across
factors, the steady-state nightly-increment shape.

Usage: python tools/agg_refresh_study.py [sf_dir] [factors...]
Prints one JSON line {"k": {"refresh": s, "recompute": s}, ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10, 30]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SCALE_MEM", "8g"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mvrepair.operators.maintenance import (
        aggregate_view,
        refresh_aggregate,
    )
    from mvrepair.sources import load_table

    measures = [
        ("n_orders", "count", ""),
        ("sum_price", "sum", "price"),
        ("min_odate_us", "min", "odate_us"),
        ("max_odate_us", "max", "odate_us"),
    ]

    t = load_table(spark, sf_dir, "orders")

    def inflate(k: int):
        parts = [
            t.select(
                (F.col("o_orderkey") + i * 10_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + i * 10_000_000).alias("o_custkey"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
                F.unix_micros("o_orderdate").alias("odate_us"),
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = f"/tmp/mvrepair_aggstudy_base_{k}.parquet"
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def timed(df) -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        return round(statistics.median(runs), 2)

    results: dict[str, dict[str, float]] = {}
    for k in factors:
        base = inflate(k)
        delta_hit = (F.col("o_orderkey") % 13 == 2) & (
            F.col("o_orderkey") < 10_000_000
        )
        vpath = f"/tmp/mvrepair_aggstudy_view_{k}.parquet"
        aggregate_view(
            base.filter(~delta_hit), ["o_custkey"], measures
        ).write.mode("overwrite").parquet(vpath)
        stored = spark.read.parquet(vpath)
        # the delta arrives as its own (small) table in steady state —
        # materialize it so the refresh cell never touches base files
        # (a modulo filter over the inflated base would re-scan
        # everything and measure the scan, not the refresh)
        dpath = f"/tmp/mvrepair_aggstudy_delta_{k}.parquet"
        base.filter(delta_hit).write.mode("overwrite").parquet(dpath)
        delta = spark.read.parquet(dpath)
        results[str(k)] = {
            "refresh": timed(
                refresh_aggregate(stored, delta, ["o_custkey"], measures)
            ),
            "recompute": timed(aggregate_view(base, ["o_custkey"], measures)),
        }
        spark.catalog.clearCache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
