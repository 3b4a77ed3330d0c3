"""Digest refresh vs full tree rebuild across volume.

Same phase separation as agg_refresh_study, applied to the merkle
tree: per factor k, inflate orders, write the STORED digest frame
(untimed), materialize a constant-absolute CDC delta (copy-0
o_orderkey%13==2 rows as inserts, %17==5 of the stored set as deletes,
each its own small table), then time refresh_range_digests (stored
parquet + two delta aggs + the 2^depth combine) against
range_digests over the full final set (the rebuild), median of 3.

Usage: python tools/merkle_refresh_study.py [sf_dir] [factors...]
Prints one JSON line {"k": {"refresh": s, "rebuild": s}, ...}.
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

    import __spark_entry__ as e
    from mvrepair.operators.merkle import range_digests, refresh_range_digests
    from mvrepair.sources import load_table

    KEYS = ["o_custkey", "o_orderkey"]
    VALS = ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    DEPTH = 10

    t = load_table(spark, sf_dir, "orders")

    def timed(df) -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        return round(statistics.median(runs), 2)

    results: dict[str, dict[str, float]] = {}
    for k in factors:
        parts = [
            t.select(
                (F.col("o_orderkey") + i * 10_000_000).alias("o_orderkey"),
                "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority",
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        bpath = f"/tmp/mvrepair_mrstudy_base_{k}.parquet"
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(bpath)
        base = e._merkle_render(spark.read.parquet(bpath))

        kk = F.col("o_orderkey").cast("bigint")
        ins_hit = (kk % 13 == 2) & (kk < 10_000_000)
        s0 = base.filter(~ins_hit)
        del_hit = (kk % 17 == 5) & (kk < 10_000_000)

        spath = f"/tmp/mvrepair_mrstudy_stored_{k}.parquet"
        range_digests(s0, KEYS, VALS, DEPTH).write.mode(
            "overwrite"
        ).parquet(spath)
        stored = spark.read.parquet(spath)
        ipath = f"/tmp/mvrepair_mrstudy_ins_{k}.parquet"
        base.filter(ins_hit).write.mode("overwrite").parquet(ipath)
        dpath = f"/tmp/mvrepair_mrstudy_del_{k}.parquet"
        s0.filter(del_hit).write.mode("overwrite").parquet(dpath)
        ins = spark.read.parquet(ipath)
        dels = spark.read.parquet(dpath)

        final = base.filter(ins_hit | ~del_hit)
        results[str(k)] = {
            "refresh": timed(
                refresh_range_digests(stored, ins, dels, KEYS, VALS, DEPTH)
            ),
            "rebuild": timed(range_digests(final, KEYS, VALS, DEPTH)),
        }
        spark.catalog.clearCache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
