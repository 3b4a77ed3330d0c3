"""Merkle TREE DEPTH sensitivity: digest-exchange cost vs drill size.

``choose_depth`` (operators/merkle.py) encodes the sizing rule
"depth = ceil(log2(expected_dirty_keys x headroom))" — each expected
dirty key gets its own bucket with headroom, Cassandra's 2^15-leaves
reasoning.  The round-10 divergence sweep measured one depth; this
sweeps depth x divergence so the crossover the docstring claims is a
measured surface:

- depth too SHALLOW for the divergence → buckets are coarse, every
  bucket goes dirty, the drill re-reads a large table fraction (the
  degenerate escape fires at > 50% dirty and runs the full scan);
- depth too DEEP → the drill is minimal but the digest stage
  aggregates and full-outer-joins 2^depth rows per side, and the
  dirty-id collect grows toward divergence size (bounded, but paid).

Per (depth, divergence) point: dirty buckets (of 2^depth), drilled
rows, escape taken?, and the median-of-3 wall time of the full
``merkle_repair_keys`` pipeline (digest stage + drill) after a warmup
run.  Divergence is synthesized exactly like the divergence study:
o_totalprice perturbed on ``o_orderkey % m == 3`` → ~n/m dirty keys.

Usage: python tools/merkle_depth_study.py [sf_dir] [k] [depths...]
``k`` inflates the base table k-fold with shifted order keys (the
divergence study's volume knob) — at raw sf0.1 (150k rows) every
depth finishes in ~1 s and the digest-vs-drill crossover is invisible
in wall time; at 30x (4.5M rows/side) it is measurable.  Prints one
JSON object {div_frac: {depth: {...}}} plus, per divergence, the
measured-fastest depth and ``choose_depth``'s pick.
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
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    depths = [int(a) for a in sys.argv[3:]] or [4, 6, 8, 10, 12, 14, 16]

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
        choose_depth,
        merkle_diff,
        merkle_repair_keys,
        with_token_digest,
    )
    from mvrepair.sources import load_table

    base = load_table(spark, sf_dir, "orders")
    if k > 1:
        parts = [
            base.select(
                (F.col("o_orderkey") + i * 10_000_000).alias("o_orderkey"),
                "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority",
            )
            for i in range(k)
        ]
        out_f = parts[0]
        for p_ in parts[1:]:
            out_f = out_f.unionByName(p_)
        path = f"/tmp/mvrepair_depth_base_{k}.parquet"
        out_f.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        base = spark.read.parquet(path)
    n = base.count()
    KEYS = ["o_custkey", "o_orderkey"]
    VALS = ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]

    # ~0.1% / 1% / 10% of keys dirty
    mods = {0.001: 1000, 0.01: 100, 0.1: 10}

    results: dict[str, dict] = {}
    for frac, m in mods.items():
        mv = base.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % m == 3, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        rb, rm = e._merkle_render(base), e._merkle_render(mv)
        dirty_keys = rb.filter(F.col("o_orderkey").cast("bigint") % m == 3)
        n_dirty = dirty_keys.count()
        row: dict[str, dict] = {}
        for depth in depths:
            dirty_ids = [
                r["bucket"]
                for r in merkle_diff(rb, rm, KEYS, VALS, depth)
                .select("bucket")
                .collect()
            ]
            escape = len(dirty_ids) > 0.5 * (1 << depth)
            rows = with_token_digest(rb, KEYS, VALS).withColumn(
                "bucket", F.shiftright("token", TOKEN_BITS - depth)
            )
            drilled = (
                n
                if escape
                else (
                    rows.filter(F.col("bucket").isin(dirty_ids)).count()
                    if len(dirty_ids) <= 8192
                    else rows.join(
                        F.broadcast(
                            spark.createDataFrame(
                                [(i,) for i in dirty_ids], "bucket bigint"
                            )
                        ),
                        "bucket",
                        "left_semi",
                    ).count()
                )
            )
            runs = []
            for i in range(4):  # first run is the warmup
                t0 = time.monotonic()
                merkle_repair_keys(rb, rm, KEYS, VALS, depth).write.format(
                    "noop"
                ).mode("overwrite").save()
                if i:
                    runs.append(time.monotonic() - t0)
            row[str(depth)] = {
                "dirty_buckets": len(dirty_ids),
                "of_buckets": 1 << depth,
                "escape": escape,
                "drilled_rows": int(drilled),
                "sec": round(statistics.median(runs), 2),
            }
            print(
                f"frac={frac} depth={depth}: {row[str(depth)]}",
                file=sys.stderr,
            )
        best = min(row, key=lambda d: row[d]["sec"])
        results[str(frac)] = {
            "n_dirty_keys": n_dirty,
            "choose_depth": choose_depth(n_dirty),
            "fastest_depth": int(best),
            "by_depth": row,
        }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
