"""Merkle drill cost vs divergence rate at FIXED volume.

The dense/sparse pair in scale_study compares two points; this sweeps
the defect density at one table size (default 30x sf0.1 orders,
~450k rows/side) so the "repair cost follows divergence" claim is a
curve, not an anecdote: replica 2 = orders with o_totalprice perturbed
on ``o_orderkey % m == 3`` for m in the sweep — divergence ≈ n/m keys.
Reported per point: dirty buckets (of 2^depth), drilled rows, and the
wall time of the FULL merkle_repair_keys pipeline (digest stage +
drill), median of 3 after warmup.  The digest stage is
divergence-independent by construction, so the time curve's slope IS
the drill.

Usage: python tools/merkle_divergence_study.py [sf_dir] [k] [mods...]
Prints one JSON line {"m=<mod>": {"dirty_buckets": b, "drilled_rows":
r, "sec": s}, ...}.
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
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    mods = [int(a) for a in sys.argv[3:]] or [16, 64, 256, 1024, 4096, 16384]

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

    import __spark_entry__ as e
    from mvrepair.operators.merkle import (
        TOKEN_BITS,
        merkle_diff,
        merkle_repair_keys,
        with_token_digest,
    )
    from mvrepair.sources import load_table

    t = load_table(spark, sf_dir, "orders")
    parts = [
        t.select(
            (F.col("o_orderkey") + i * 10_000_000).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = f"/tmp/mvrepair_divergence_base_{k}.parquet"
    out.repartition(
        spark.sparkContext.defaultParallelism
    ).write.mode("overwrite").parquet(path)
    base = spark.read.parquet(path)

    KEYS = ["o_custkey", "o_orderkey"]
    VALS = ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    DEPTH = 10

    results: dict[str, dict[str, float]] = {}
    for m in mods:
        mv = base.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % m == 3, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        rb, rm = e._merkle_render(base), e._merkle_render(mv)
        dirty = merkle_diff(rb, rm, KEYS, VALS, DEPTH).select("bucket")
        dirty_ids = [r["bucket"] for r in dirty.collect()]
        rows = with_token_digest(rb, KEYS, VALS).withColumn(
            "bucket", F.shiftright("token", TOKEN_BITS - DEPTH)
        )
        drilled = (
            rows.filter(F.col("bucket").isin(dirty_ids)).count()
            if dirty_ids
            else 0
        )
        runs = []
        for i in range(4):  # first run is the warmup
            t0 = time.monotonic()
            merkle_repair_keys(rb, rm, KEYS, VALS, DEPTH).write.format(
                "noop"
            ).mode("overwrite").save()
            if i:
                runs.append(time.monotonic() - t0)
        results[f"m={m}"] = {
            "dirty_buckets": len(dirty_ids),
            "drilled_rows": int(drilled),
            "sec": round(statistics.median(runs), 2),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
