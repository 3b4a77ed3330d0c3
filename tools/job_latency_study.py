"""Scheduler-job fixed-cost study (optimization round 11, guide §1).

The r11 bench detail shows 1,781 Spark jobs across one bench pass and a
cal_job_ms of ~292 — predicted scheduler tax ≈ the whole bench total.
Before optimizing per-query job counts, pin down what one job actually
costs on this boot, broken down by job shape:

- trivial RDD job, 32 tasks (the bench calibration job)
- trivial RDD job, 1 task
- DataFrame noop write of a 32-partition range (no exchange)
- DataFrame noop write with one exchange (AQE on: 2 stage jobs)
- localCheckpoint(eager) of a tiny frame
- collect() of a 1-row aggregate

Usage: python tools/job_latency_study.py [cpus]
Prints one JSON line with medians (ms) per shape.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def timed(fn, n=9):
    runs = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        runs.append((time.monotonic() - t0) * 1000)
    return round(statistics.median(runs), 1)


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("job-latency-study")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warmup
    for _ in range(3):
        sc.parallelize(range(int(cpus)), int(cpus)).count()
        spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().write.format(
            "noop"
        ).mode("overwrite").save()

    out = {}
    out["rdd_32task_ms"] = timed(
        lambda: sc.parallelize(range(int(cpus)), int(cpus)).count()
    )
    out["rdd_1task_ms"] = timed(lambda: sc.parallelize(range(1), 1).count())
    out["df_noop_nox_ms"] = timed(
        lambda: spark.range(0, 32 * 1000, 1, int(cpus))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["df_noop_1x_ms"] = timed(
        lambda: spark.range(0, 32 * 1000, 1, int(cpus))
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    df_tiny = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    out["local_ckpt_ms"] = timed(
        lambda: df_tiny.localCheckpoint(eager=True)
    )
    out["collect_1row_agg_ms"] = timed(
        lambda: spark.range(0, 32 * 1000, 1, int(cpus)).agg(
            F.sum("id")
        ).collect()
    )
    # one exchange, AQE OFF, for the stage-job-multiplication question
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out["df_noop_1x_noaqe_ms"] = timed(
        lambda: spark.range(0, 32 * 1000, 1, int(cpus))
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
