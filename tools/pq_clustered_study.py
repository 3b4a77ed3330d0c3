"""PQ recall in its INTENDED regime: clustered embeddings.

The driver fixture embeddings are near-random 64-dim vectors — honest
but PQ-adversarial: product quantization compresses by exploiting
per-subspace cluster structure, and random vectors have none, so ADC
recall collapses (measured 0.02–0.045 in round 10, PERF.md) while the
coarse IVF layer holds.  The round-10 verdict (item #3) asked for a
deterministic CLUSTERED fixture so the compressed path is measured
doing its actual job and the ``pq_recall`` audit's PASS branch is
reachable, not just its honest FAIL.

Fixture: a seeded integer mixture in the ``mv_pair`` arithmetic-
injection style — K=16 centers whose components are fixed integer
hashes mapped into [-1, 1], row i assigned center i % K, jitter a
bounded integer hash of (i, j) in [-0.1, 0.1], all float32.  No RNG:
both engines (and any rerun) see bit-identical vectors.  Written to
``fixtures/clustered_sf{X}/embeddings.parquet`` with the driver
fixture's exact schema (vec_id int64, embedding list<float>, label
int32 = the true center), so every embeddings-only registered query
runs against it by passing the fixture dir as sf_dir.

Measured per corpus (random sf dir vs clustered fixture):
- ivf_recall:   coarse layer only (ann_recall composition)
- pq_recall:    IVF-PQ, seeded coarse (the registered pq_recall)
- pq_trained:   IVF-PQ, TRAINED coarse (pq_topk_trained's config)
each as mean recall@5 over the %50 query set.

Usage: python tools/pq_clustered_study.py [sf_dir] [rows]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K_CENTERS = 16


def center_component(c: int, j: int) -> float:
    """Deterministic center c's component j, in [-1, 1] (q3 grid)."""
    return ((c * 73856093 + j * 19349663) % 2001 - 1000) / 1000.0


def jitter(i: int, j: int) -> float:
    """Bounded per-(row, component) jitter in [-0.1, 0.1] (q3 grid)."""
    return ((i * 2654435761 + j * 40503) % 201 - 100) / 1000.0


def build_fixture(path: str, rows: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    vec_ids, embs, labels = [], [], []
    for i in range(rows):
        c = i % K_CENTERS
        vec_ids.append(i)
        labels.append(c)
        embs.append(
            np.array(
                [center_component(c, j) + jitter(i, j) for j in range(DIM)],
                dtype=np.float32,
            )
        )
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in embs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, path)
    return path


def mean_recall(df) -> float:
    from pyspark.sql import functions as F

    [r] = df.agg(F.avg("recall_micro").alias("m")).collect()
    return round(float(r["m"]) / 1_000_000, 3)


def trained_recall(spark, sf_dir: str):
    """pq_recall with the trained coarse layer (pq_topk_trained's
    exact configuration) — composed here because the registered
    queries keep the two configs separate."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from mvrepair.operators import similarity as S

    emb = e._spread(
        e.load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    brute = S.cosine_topk(emb, queries, k=5)
    books = S.pq_train(emb, dim=DIM, m=e.PQ_M, k=e.PQ_K, iters=e.KMEANS_ITERS)
    coarse = S.train_kmeans(emb, k=K_CENTERS, iters=e.KMEANS_ITERS)
    pq = S.pq_ivf_topk(
        emb, queries, dim=DIM, codebooks=books, k=5,
        n_centroids=K_CENTERS, n_probe=4, coarse=coarse,
    )
    hits = (
        brute.select("query_id", "neighbor_id")
        .join(pq.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    spine = queries.select(F.col("vec_id").alias("query_id"))
    return spine.join(hits, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hits"), F.lit(0)) * 1000000 / 5)
        .cast("long")
        .alias("recall_micro"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fix_dir = os.path.join(repo, "fixtures", f"clustered_{rows}")
    fix_path = os.path.join(fix_dir, "embeddings.parquet")
    if not os.path.exists(fix_path):
        build_fixture(fix_path, rows)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    out: dict[str, dict[str, float]] = {}
    for label, d in [("random", sf_dir), ("clustered", fix_dir)]:
        out[label] = {
            "ivf_recall": mean_recall(e.queries()["ann_recall"](spark, d)),
            "pq_recall": mean_recall(e.queries()["pq_recall"](spark, d)),
            "pq_trained_recall": mean_recall(trained_recall(spark, d)),
        }
        print(label, out[label], file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
