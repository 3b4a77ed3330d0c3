"""End-to-end stress of the LSH plane-count sizing rule (r8 verdict #8).

The r8 round made ``n_planes`` a first-class knob of the vector pair
join and DOCUMENTED the production sizing rule

    planes ≈ log2(N / target_bucket)

(bucket bits track corpus size the way shuffle partitions do).  This
study makes the rule EVIDENCE instead of advice: one sweep over
1x/3x/10x/30x disjoint-rolled copies of the sf0.1 embeddings fixture
(plus the checked leakage-style near-dup variant per vector, so every
copy carries the same known pair structure) where ``n_planes`` is set
BY THE RULE per cell — never hand-picked — measuring

- wall time (median-of-3, noop sink) — the near-linear claim;
- pair RECALL vs the exact quantized cosine over all pairs — the
  "unchanged recall" claim.  Ground truth is brute-forced at 1x and 3x;
  circular rolling preserves dot products within a copy EXACTLY, so the
  true pair count is k x the 1x count once 3x confirms zero cross-copy
  pairs (asserted, not assumed);
- max/mean bucket occupancy — the mechanism (the rule exists to hold
  occupancy constant as N grows).

Round 10 (r9 verdict #1) adds the PRODUCTION-CONFIG cells the r9 table
lacked: per factor, recall + wall of the full production stack —
rule planes + ``max_bucket=128`` cap + 3-table banding
(``cosine_neardup_pairs_banded``) — alongside the same-config
single-table capped cells, so the recall the banding buys BACK from
the cap/planes is measured at every scale, not just argued.

Usage: python tools/lsh_sizing_study.py [sf_dir] [factors...]
Prints one JSON line; PERF.md records the table.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGET_BUCKET = 16
THRESHOLD = 0.9
DIM = 64
# the production configuration (PERF.md r9: "production sizing is
# therefore rule + cap"; banding is the recall lever on top)
PROD_CAP = 128
PROD_TABLES = 3


def planes_by_rule(n_vectors: int) -> int:
    """planes = round(log2(N / target_bucket)), floored at the checked
    8-plane default so the 1x cell IS the oracle-checked configuration."""
    return max(8, round(math.log2(n_vectors / TARGET_BUCKET)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 3, 10, 30]

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:TieredStopAtLevel=1",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mvrepair.operators import similarity as S
    from mvrepair.sources import load_table

    emb_base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )

    def corpus(k: int):
        """k disjoint rolled copies of (base + near-dup variant) — the
        scale_study embroll doctrine + the leakage fixture's variant.
        The variant is derived from the UNROLLED base and THEN rolled
        with its copy: circular rolling both members of a pair
        preserves their dot product (and per-component quantization)
        exactly, so every copy's true pair set is bit-identical to the
        1x set and true_kx = k * true_1x holds EXACTLY once the 3x
        brute confirms zero cross-copy pairs.  (Deriving the variant
        from the already-rolled vector — the first version — negates a
        DIFFERENT original component per copy: measured, true_3x came
        out 3 pairs short of 3x.)"""
        with_variant = emb_base.select("vec_id", "embedding").unionByName(
            emb_base.select(
                (F.col("vec_id") + 500_000_000).alias("vec_id"),
                F.concat(
                    F.array(-F.element_at("embedding", 1)),
                    F.slice("embedding", 2, DIM - 1),
                ).alias("embedding"),
            )
        )
        parts = []
        for i in range(k):
            emb = (
                F.concat(
                    F.slice("embedding", i + 1, DIM - i),
                    F.slice("embedding", 1, i),
                )
                if i
                else F.col("embedding")
            )
            parts.append(
                with_variant.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    emb.alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = f"/tmp/mvrepair_lshsize_{k}.parquet"
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def brute_count(df) -> int:
        """Exact quantized-cosine pair count over ALL pairs, with the
        operator's own arithmetic (floor(x*1e6) int64 dots, double
        division) replayed in numpy on the driver — a Spark BNLJ with
        interpreted higher-order dot products is ~100x slower and this
        is a study tool over a bounded fixture (<=12k vectors here;
        int64 matmul stays exact: 64 * (1e6)^2 * n << 2^63)."""
        import numpy as np

        vecs = np.array(
            [r["embedding"] for r in df.select("embedding").collect()],
            dtype=np.float64,
        )
        q = np.floor(vecs * 1_000_000).astype(np.int64)
        dots = q @ q.T  # exact int64
        norms = np.sqrt(np.diag(dots).astype(np.float64))
        sims = dots.astype(np.float64) / np.outer(norms, norms)
        iu = np.triu_indices(len(q), k=1)
        return int((sims[iu] >= THRESHOLD).sum())

    def found_count(df, n_planes: int) -> int:
        return S.cosine_neardup_pairs(
            df, dim=DIM, threshold=THRESHOLD, n_planes=n_planes
        ).count()

    def occupancy(df, n_planes: int):
        from mvrepair.operators.similarity import _bucket_from_qv, _quant

        b = df.select(
            _bucket_from_qv(
                _quant(F.col("embedding")), DIM, n_planes=n_planes
            ).alias("__bucket")
        )
        row = (
            b.groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.max("n").alias("mx"),
                F.avg("n").alias("mean"),
                F.count(F.lit(1)).alias("n_buckets"),
            )
            .collect()[0]
        )
        return int(row["mx"]), round(float(row["mean"]), 1), int(row["n_buckets"])

    def wall(df, n_planes: int) -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            S.cosine_neardup_pairs(
                df, dim=DIM, threshold=THRESHOLD, n_planes=n_planes
            ).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        return round(statistics.median(runs), 2)

    # warmup
    wall(corpus(1), 8)

    res: dict[str, dict] = {}
    true_1x = None
    for k in factors:
        df = corpus(k)
        n = df.count()
        planes = planes_by_rule(n)
        w = wall(df, planes)
        found = found_count(df, planes)
        mx, mean, nb = occupancy(df, planes)
        cell: dict = {
            "n_vectors": n,
            "planes": planes,
            "wall_s": w,
            "found": found,
            "bucket_max": mx,
            "bucket_mean": mean,
            "n_buckets": nb,
        }
        # ground truth: brute at 1x and 3x; k x 1x-truth beyond (rolling
        # preserves within-copy cosines exactly; 3x CHECKS cross-copy
        # pairs are zero before the extrapolation is trusted)
        if k <= 3:
            t = brute_count(df)
            cell["true"] = t
            if k == 1:
                true_1x = t
            elif true_1x is not None and t != k * true_1x:
                cell["cross_copy_pairs"] = t - k * true_1x
        elif true_1x is not None:
            cell["true"] = k * true_1x
            cell["true_basis"] = "k x 1x brute (3x verified zero cross-copy)"
        if "true" in cell and cell["true"]:
            cell["recall"] = round(cell["found"] / cell["true"], 4)
        # production-config cells: same rule planes, cap, single-table
        # vs 3-table banded — both operators are EAGER on these paths
        # (persist + count inside), so the timed call includes
        # materialization; unpersist releases the caller-owned frame
        t0 = time.monotonic()
        scap = S.cosine_neardup_pairs(
            df, dim=DIM, threshold=THRESHOLD, n_planes=planes,
            max_bucket=PROD_CAP,
        )
        sfound = scap.count()
        swall = round(time.monotonic() - t0, 2)
        scap.unpersist()
        t0 = time.monotonic()
        banded = S.cosine_neardup_pairs_banded(
            df, dim=DIM, threshold=THRESHOLD, n_tables=PROD_TABLES,
            n_planes=planes, max_bucket=PROD_CAP,
        )
        bfound = banded.count()
        bwall = round(time.monotonic() - t0, 2)
        banded.unpersist()
        cell["capped_1table"] = {"found": sfound, "wall_s": swall}
        cell["capped_banded"] = {
            "found": bfound, "wall_s": bwall, "n_tables": PROD_TABLES,
            "max_bucket": PROD_CAP,
        }
        if "true" in cell and cell["true"]:
            cell["capped_1table"]["recall"] = round(sfound / cell["true"], 4)
            cell["capped_banded"]["recall"] = round(bfound / cell["true"], 4)
        res[str(k)] = cell
        print(k, cell, file=sys.stderr)

    lo, hi = str(factors[-2]), str(factors[-1])
    res["wall_exponent"] = round(
        math.log(res[hi]["wall_s"] / res[lo]["wall_s"])
        / math.log(factors[-1] / factors[-2]),
        2,
    )
    res["banded_wall_exponent"] = round(
        math.log(
            res[hi]["capped_banded"]["wall_s"]
            / res[lo]["capped_banded"]["wall_s"]
        )
        / math.log(factors[-1] / factors[-2]),
        2,
    )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
