"""Capture .explain('formatted') for named queries to plans/<round>/.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt for each
(round dir defaults to r12).  ``suffix`` is "before" / "after" per the
round deliverable.

Streaming queries (and eager operators) execute driver-side work at
plan-build time; this harness builds each plan the same way bench.py
does (same session configs) but only explains — it does not run the
noop sink, so timings here are irrelevant, only plan shape.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan-capture")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    os.makedirs(f"/root/repo/plans/{rnd}", exist_ok=True)
    qs = e.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/root/repo/plans/{rnd}/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"wrote plans/{rnd}/{name}_{suffix}.txt", file=sys.stderr)
        from mvrepair import cache as _cache

        _cache.release_all()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
