"""CMS width-sizing study: measured overcount vs the 2N/w bound.

The Count-Min guarantee (Cormode & Muthukrishnan 2005): a point
estimate exceeds the true count by at most 2N/w with probability
>= 1 - 2^-d (N = total stream length, w = grid width, d = depth).
Like the Bloom m=8n study, this measures the ACTUAL error of the
shipped grid on the real fixture across a width sweep, so the
production sizing rule is a number, not a hope: pick w from the
tolerable absolute overcount (w ~ 2N / tol), pick d from the failure
probability (2^-d per probe).

Usage: python tools/cms_sizing_study.py [sf_dir] [k_factor...]
Emits one JSON line: per (factor, w, d) cell -> {n_stream, probes,
mean_over, max_over, p_exact, bound_2n_w}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 10]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SCALE_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mvrepair.operators import sketch as SK
    from mvrepair.sources import load_table

    # key domain: l_partkey (~20k distinct at sf0.1) — the fixture's
    # token vocabulary is 31 strings, which never collides at any
    # tested width (measured: overcount 0 across the whole grid sweep);
    # a sizing study needs keys >> w, and the part-key stream provides
    # them with a realistic skewless-ish frequency profile
    base = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("token")
    )

    def tokens(k: int):
        # exact copies: key frequencies scale k x, key set fixed — the
        # stream length N grows while the key set stays put, which is
        # precisely the regime the 2N/w bound prices
        parts = [base] * k
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    results: dict[str, dict] = {}
    for k in factors:
        toks = tokens(k).persist()
        n_stream = toks.count()
        exact = (
            toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("exact_n"))
            .persist()
        )
        n_probes = exact.count()
        for w in (512, 2048, 8192):
            for d in (2, 4):
                grid = SK.cms_counters(toks, "token", w=w, d=d)
                est = SK.cms_estimate(exact, "token", grid, w=w, d=d)
                row = est.select(
                    F.sum(F.col("cms_est") - F.col("exact_n")).alias("tot"),
                    F.max(F.col("cms_est") - F.col("exact_n")).alias("mx"),
                    F.sum(
                        F.when(F.col("cms_est") == F.col("exact_n"), 1)
                        .otherwise(0)
                    ).alias("n_exact"),
                ).collect()[0]
                results[f"k{k}_w{w}_d{d}"] = {
                    "n_stream": n_stream,
                    "probes": n_probes,
                    "mean_over": round(float(row.tot) / n_probes, 1),
                    "max_over": int(row.mx),
                    "p_exact": round(float(row.n_exact) / n_probes, 3),
                    "bound_2n_w": round(2.0 * n_stream / w, 1),
                }
        exact.unpersist()
        toks.unpersist()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
