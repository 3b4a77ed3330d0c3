"""Skew-join study: one hot key vs three mitigations, measured.

The 100 TB prompt has two skew levers — salting (static rewrite,
operators/skew.py:salted_join) and AQE's runtime skew-join split
(spark.sql.adaptive.skewJoin) — and until this study the repo had only
the AGGREGATION side measured (events_by_type_salted).  This builds a
deliberately skewed fact (P_HOT of rows on one key, the rest uniform),
joins it against a 100k-key dim with broadcast disabled (the fact-fact
stand-in), and times:

  plain      SMJ, AQE skew-join OFF  — the hot partition serializes
  aqe_skew   SMJ, AQE skew-join ON (thresholds sized to the fixture;
             at production partition sizes the DEFAULTS fire the same
             way — the knob is bytes-per-partition, not a special case)
  salted     operators/skew.py:salted_join (explicit 16-way salt)

Each variant runs the identical count-preserving aggregate; row counts
are asserted equal.  Usage: python tools/skew_join_study.py [rows]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_keys = 100_000
    p_hot_pct = 90

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # fact: p_hot% of rows on key 0, rest uniform over n_keys
    fact = spark.range(n_rows).select(
        F.when(
            F.col("id") % 100 < p_hot_pct, F.lit(0)
        ).otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys))).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    fpath, dpath = "/tmp/mvr_skew_fact.parquet", "/tmp/mvr_skew_dim.parquet"
    fact.repartition(32).write.mode("overwrite").parquet(fpath)
    dim.repartition(4).write.mode("overwrite").parquet(dpath)
    fact = spark.read.parquet(fpath)
    dim = spark.read.parquet(dpath)

    def agg(j):
        return j.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        )

    def run(tag, skew_on, salted):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # fixture-sized thresholds: the hot partition is ~tens of MB, not
        # the production default 256MB — the mechanism, not the constant
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
        )
        if salted:
            from mvrepair.operators.skew import salted_join

            j = salted_join(fact, dim, ["k"], salt=16)
        else:
            j = fact.hint("merge").join(dim, "k")
        t0 = time.monotonic()
        row = agg(j).collect()[0]
        return round(time.monotonic() - t0, 2), (row["n"], row["s"])

    results, checks = {}, set()
    for tag, skew_on, salted in [
        ("plain", False, False),
        ("aqe_skew", True, False),
        ("salted", False, True),
    ]:
        run(tag, skew_on, salted)  # warmup
        times = []
        for _ in range(3):
            t, chk = run(tag, skew_on, salted)
            times.append(t)
            checks.add(chk)
        results[tag] = times
    assert len(checks) == 1, f"variants disagree: {checks}"
    results["rows"] = n_rows
    results["hot_pct"] = p_hot_pct
    print(json.dumps(results))


if __name__ == "__main__":
    main()
