"""Scale-stress study: measure the heavy corpus operators on 1x/3x/10x
inflated copies of the sf0.1 documents table and report the wall-time
scaling exponent per operator.

Inflation rewrites each copy with a copy-specific prefix on EVERY token
("3x<tok>"), so shingle/gram sets are disjoint across copies: each copy
reproduces the originals' internal near-dup structure and nothing else,
keeping output pair density constant per input row — the study measures
throughput scaling of the scan/shuffle pipeline, not an (intentionally)
quadratic growth in output pairs.  (A first version prefixed only ONE
marker token per copy; 3-shingle sets were then ~identical across
copies, LSH buckets held all k copies, and candidate pairs grew ∝k² —
a correct answer to a question the study wasn't asking.)
``dedup_exact`` gets an exact-copy variant, whose output is linear in
copies by construction.

Usage: python tools/scale_study.py [sf_dir] [factors...]
Prints one JSON line: {"op": {"1": sec, ..., "exponent": e}} where e is
the log-log slope between the two LARGEST factors (1.0 = perfectly
linear).  The small factors exist to show the fixed-overhead floor —
at fixture scale per-job scheduling dominates, so the slope is only
meaningful where the data term does (the top factors); every op gets an
untimed warmup run first so JIT/codegen never lands in a timed cell.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _release_owned():
    from mvrepair import cache as _cache

    _cache.release_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(a) for a in sys.argv[2:]] or [1, 3, 10, 30]

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
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:TieredStopAtLevel=1",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mvrepair.operators import dedup as D
    from mvrepair.operators import packing as PK
    from mvrepair.operators import similarity as S
    from mvrepair.operators import text as X
    from mvrepair.operators.sampling import weighted_mix
    from mvrepair.sources import load_table

    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "lang"
    )

    def inflate(k: int, exact: bool):
        parts = [
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.col("text")
                if exact
                else F.regexp_replace(
                    F.col("text"), r"(\S+)", f"{i}x$1"
                ).alias("text"),
                "source",
                "lang",
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # materialize the inflated corpus so each op times its own work,
        # not the union re-scan — and spread it across every core at EVERY
        # factor: a k=1 union writes one file, and one parquet split means
        # the whole text pass runs on 1 of 32 cores, which would make the
        # study measure parallelism growth (more files at higher k), not
        # data-volume scaling.  (First run of this script hit exactly
        # that: factor-1 cells 10x their bench medians, flat tops.)
        path = f"/tmp/mvrepair_scale_{k}_{int(exact)}.parquet"
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def inflate_generic(table, shift_col, k, prefix_col=None, shift_cols=None):
        # copies of an arbitrary table under shifted ids; prefix_col (if
        # given) gets a copy-specific prefix so string-derived structure
        # (fuzzy-variant buckets) is disjoint per copy — constant output
        # density per input row, same doctrine as the documents inflator
        t = load_table(spark, sf_dir, table)
        shifted = list(shift_cols or [shift_col])
        rest = [c for c in t.columns if c not in shifted and c != prefix_col]
        parts = []
        for i in range(k):
            cols = [(F.col(c) + i * 10_000_000).alias(c) for c in shifted]
            if prefix_col:
                cols.append(
                    F.concat(F.lit(f"{i}x"), F.col(prefix_col)).alias(
                        prefix_col
                    )
                )
            parts.append(t.select(*cols, *rest))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = (f"/tmp/mvrepair_scale_{table}_{k}_"
                f"{int(bool(prefix_col))}_{len(shifted)}.parquet")
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    emb_base = load_table(spark, sf_dir, "embeddings")

    def inflate_emb(k: int):
        # embedding copies keep vectors/labels unchanged (centroids and
        # cluster structure stay those of the base corpus) under shifted
        # ids — measures vector-pipeline throughput, not drift
        rest = [c for c in emb_base.columns if c != "vec_id"]
        parts = [
            emb_base.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"), *rest
            )
            for i in range(k)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = f"/tmp/mvrepair_scale_emb_{k}.parquet"
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def inflate_emb_disjoint(k: int):
        # PAIR-producing embedding ops need DISJOINT copies (the same
        # doctrine as the prefixed-token documents inflator): identical
        # vectors under shifted ids would form k² cross-copy near-dup
        # pairs per original — a correct answer to a question the study
        # isn't asking (measured: semantic_leakage "exponent 1.94" on
        # the identical-copy inflator).  Rolling each copy's components
        # by i preserves norms and within-copy pair structure exactly
        # while cross-copy cosines stay far below threshold.
        rest = [c for c in emb_base.columns if c not in ("vec_id", "embedding")]
        parts = []
        for i in range(k):
            emb = (
                F.concat(
                    F.slice("embedding", i + 1, 64 - i),
                    F.slice("embedding", 1, i),
                )
                if i
                else F.col("embedding")
            )
            parts.append(
                emb_base.select(
                    (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                    emb.alias("embedding"),
                    *rest,
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        path = f"/tmp/mvrepair_scale_embroll_{k}.parquet"
        out.repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def _tbf(df, k):
        from mvrepair.operators.sampling import token_budget_fill

        return token_budget_fill(df, budget=800 * k)

    def _dsir(df):
        from mvrepair.operators.sampling import dsir_scores

        return dsir_scores(df, F.col("lang") == "en", buckets=64)

    def _nb_op(df):
        from mvrepair.operators.nbayes import nb_train_classify

        return nb_train_classify(df, buckets=64)

    def _key_skew_op(df):
        from mvrepair.operators.sketch import key_skew_profile

        return key_skew_profile(df, "source")

    def _mutate(df):
        # a "next crawl": ids %10==0 dropped, %10==1 edited, %10==2 re-added
        kept = df.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 1,
                F.concat(F.col("text"), F.lit(" updated")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        added = df.filter(F.col("doc_id") % 10 == 2).select(
            (F.col("doc_id") + 500_000_000).alias("doc_id"), "text"
        )
        return kept.unionByName(added)

    def _diff_op(df):
        from mvrepair.operators.snapshot import snapshot_diff

        return snapshot_diff(df, _mutate(df))

    def _index_upsert_op(df):
        from mvrepair.operators.snapshot import snapshot_diff

        v2 = _mutate(df)
        index = D.signature_bands(D.minhash_signatures(df)).localCheckpoint()
        diff = snapshot_diff(df, v2).localCheckpoint()
        return D.update_band_index(index, diff, v2)

    def _apply_op(df):
        pairs = D.ngram_jaccard_pairs(df, threshold=0.5)
        try:
            clusters = D.connected_components(pairs, df).localCheckpoint()
        finally:
            pairs.unpersist()
        keepers = D.keep_best(clusters, X.quality_score(df)).localCheckpoint()
        return D.apply_keep_decisions(df, clusters, keepers)

    def _keep_best_op(df):
        # the shipped keep-best cost IS the cluster pipeline + argmax:
        # pairs -> components -> join with scores (cold, like the bench)
        pairs = D.ngram_jaccard_pairs(df, threshold=0.5)
        try:
            clusters = D.connected_components(pairs, df)
        finally:
            pairs.unpersist()
        return D.keep_best(clusters, X.quality_score(df))

    def _compact_op(df):
        from mvrepair.operators.repair import compact_repair_log

        cells = df.select(
            "doc_id",
            F.col("lang").alias("column"),
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("__r"),
            F.substring("text", 1, 16).alias("value"),
        ).select(
            "doc_id",
            "column",
            F.lit("text").alias("column_type"),
            "value",
            (F.col("__r") * 1000).cast("long").alias("writetime"),
            F.lit(None).cast("int").alias("ttl"),
            F.lit("ROW_NEW").alias("flavor"),
        )
        return compact_repair_log(cells, ["doc_id"])

    def _nb_stream_op(df):
        from mvrepair.operators.nbayes import nb_model, nb_score

        weights, priors = nb_model(df, buckets=64)
        weights, priors = weights.persist(), priors.persist()
        variant = df.select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"),
            F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        )
        return nb_score(variant, weights, priors, buckets=64)

    def _linkage_op(df):
        from mvrepair.operators.linkage import fuzzy_pairs

        return fuzzy_pairs(df, name_col="c_name", id_col="c_custkey")

    def _basket_op(df):
        from mvrepair.operators.linkage import copurchase_pairs

        return copurchase_pairs(df, k=20)

    def _transitions_op(df):
        from mvrepair.operators.temporal import event_transitions

        return event_transitions(df)

    def _qpct_op(df):
        from mvrepair.operators.sampling import quality_percentiles

        return quality_percentiles(df)

    def _gapfill_op(df):
        from mvrepair.operators.temporal import gapfill_locf

        return gapfill_locf(df, key_col="event_type", ts_col="ts",
                            value_col="value")

    def _cohort_op(df):
        from mvrepair.operators.temporal import cohort_retention

        return cohort_retention(df, period="day")

    def _sdiv_op(df):
        from mvrepair.operators.text import source_divergence

        return source_divergence(df)

    def _edges_of(df):
        items = df.select("l_orderkey", "l_partkey").dropDuplicates()
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_a")
        )
        bb = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_b")
        )
        return (
            a.join(bb, "__b")
            .filter(F.col("item_a") < F.col("item_b"))
            .select("item_a", "item_b")
            .dropDuplicates(["item_a", "item_b"])
        )

    def _triangles_op(df):
        from mvrepair.operators.linkage import triangle_counts

        return triangle_counts(_edges_of(df))

    def _fusion_op(df):
        from mvrepair.operators.linkage import (
            pagerank_micro, rrf_fuse, triangle_counts,
        )

        items = df.select("l_orderkey", "l_partkey").dropDuplicates()
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("src")
        )
        bb = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(bb, "__b")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .dropDuplicates(["src", "dst"])
        )
        nodes = df.select(F.col("l_partkey").alias("id")).dropDuplicates()
        pr = pagerank_micro(edges, nodes, iters=3).select(
            F.col("id").alias("part_id"), F.col("rank_micro").alias("score")
        )
        tri = triangle_counts(_edges_of(df)).select(
            F.col("node").alias("part_id"),
            F.col("n_triangles").cast("long").alias("score"),
        )
        return rrf_fuse(
            [("pagerank", pr), ("triangles", tri)], id_col="part_id", k=100
        )

    def _funnel_op(df):
        from mvrepair.operators.temporal import funnel_steps

        return funnel_steps(df, steps=["view", "click", "purchase"])

    def _anomaly_op(df):
        from mvrepair.operators.temporal import moving_anomaly

        return moving_anomaly(df)

    def _postings_op(df):
        from mvrepair.operators.text import posting_lists

        return posting_lists(df)

    def _colloc_op(df):
        from mvrepair.operators.text import collocations

        return collocations(df)

    def _islands_op(df):
        from mvrepair.operators.temporal import activity_islands

        base = df.select(
            "user_id",
            F.unix_micros("ts").alias("s_us"),
            (
                F.unix_micros("ts")
                + F.floor(
                    F.coalesce(F.col("value"), F.lit(0.0)) * 60_000_000.0
                ).cast("long")
            ).alias("e_us"),
        )
        return activity_islands(
            base, key_col="user_id", start_col="s_us", end_col="e_us"
        )

    def _zorder_op(df):
        from mvrepair.operators.layout import zorder_layout

        return zorder_layout(
            df.select("l_partkey", "l_suppkey"),
            ["l_partkey", "l_suppkey"],
            bits=8,
            bucket_bits=6,
        )

    def _pq_op(df):
        from mvrepair.operators.similarity import pq_ivf_topk, pq_train

        books = pq_train(df, dim=64, m=4, k=16, iters=3)
        # FIXED query workload (base-copy ids only): the scaling question
        # is corpus growth at constant queries — letting the query set
        # grow k x alongside the k x inverted lists would measure a k²
        # candidate product, an artifact of the study not the operator
        queries = df.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10_000_000)
        )
        return pq_ivf_topk(
            df, queries, dim=64, codebooks=books, k=5,
            n_centroids=16, n_probe=4,
        )

    def _pq_trained_op(df):
        from mvrepair.operators.similarity import (
            pq_ivf_topk,
            pq_train,
            train_kmeans,
        )

        books = pq_train(df, dim=64, m=4, k=16, iters=3)
        coarse = train_kmeans(df, k=16, iters=3)
        queries = df.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10_000_000)
        )
        return pq_ivf_topk(
            df, queries, dim=64, codebooks=books, k=5,
            n_centroids=16, n_probe=4, coarse=coarse,
        )

    def _zwrite_op(df):
        # writer + readback: repartitionByRange on the Morton key, write
        # parquet, then the per-file min-max stats frame — the timed
        # cell covers the real write path end to end
        from mvrepair.operators.layout import layout_file_stats, zorder_write

        path = "/tmp/mvrepair_scale_zwrite.parquet"
        zorder_write(
            df.select("l_partkey", "l_suppkey"),
            path,
            ["l_partkey", "l_suppkey"],
            bits=8,
            n_files=64,
        )
        return layout_file_stats(
            df.sparkSession, path, ["l_partkey", "l_suppkey"]
        )

    def _bloom_op(df):
        from mvrepair.operators.sketch import bloom_semijoin

        cust = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        pruned = bloom_semijoin(
            df, "o_custkey", cust, "c_custkey", m_bits=None, k_hashes=4
        )
        return (
            pruned.join(cust, pruned["o_custkey"] == cust["c_custkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_totalprice"),
            )
        )

    def _wsample_grouped_op(df):
        from mvrepair.operators.sampling import weighted_sample_per_group
        from mvrepair.operators.text import tokenize

        return weighted_sample_per_group(
            df, n_per_group=20,
            weight=F.size(tokenize(F.col("text"))), group_col="source",
        )

    def _vocab_kmv_op(df):
        from mvrepair.operators.sketch import kmv_distinct_by
        from mvrepair.operators.text import tokenize

        toks = df.select(
            "source", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        return kmv_distinct_by(toks, "source", "tok", k=64)

    def _nobloom_op(df):
        # control row for orders_bloom_prune: the identical join + agg
        # WITHOUT the bitmap prune — at fixture scale the dim broadcasts,
        # so this prices what the bloom's k md5 tests cost when there is
        # no shuffle to save (the bloom's domain is the
        # non-broadcastable dim)
        cust = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey")
        )
        return (
            df.join(cust, df["o_custkey"] == cust["c_custkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_totalprice"),
            )
        )

    def _sliding_op(df):
        return (
            df.groupBy(
                F.window("ts", "1 hour", "15 minutes").alias("w"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                F.unix_micros(F.col("w.start")).alias("w_start_us"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    def _wsample_op(df):
        from mvrepair.operators.sampling import weighted_sample
        from mvrepair.operators.text import tokenize

        return weighted_sample(
            df, n=100, weight=F.size(tokenize(F.col("text"))),
            keep=["source"],
        )

    def _banded_op(df, k):
        from mvrepair.operators.similarity import cosine_neardup_pairs_banded

        # FULL production config: plane count by the sizing rule
        # (planes ≈ log2(N/target), the _leakage_op convention) AND the
        # max_bucket tail cap — the round-9 lsh_sizing_study measured
        # that plane count alone cannot bound hot buckets on clustered
        # embeddings (near-parallel clusters share a bucket at any plane
        # count, tail ∝ N): uncapped this row measures exponent 2.11
        # (16.2 -> 165.8 s at 10x->30x), exactly the documented
        # intrinsic Σ(tail²); capped it measures banding's own cost.
        n_planes = 8 + max(0, (k - 1)).bit_length()
        return cosine_neardup_pairs_banded(
            df, dim=64, threshold=0.9, n_tables=2, n_planes=n_planes,
            max_bucket=128,
        )

    def _paths_op(df):
        from mvrepair.operators.temporal import event_paths

        return event_paths(
            df.select("event_id", "ts", "user_id", "event_type"), k=25
        )

    def _scd2_op(df):
        from mvrepair.operators.temporal import scd2_history

        return scd2_history(
            df.select("event_id", "ts", "user_id", "event_type")
        )

    def _jac_op(df):
        from mvrepair.operators.dedup import prefix_jaccard_pairs

        corpus = df.select("doc_id", "text").unionByName(
            df.select(
                (F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
            )
        )
        return prefix_jaccard_pairs(corpus, threshold=0.5)

    def _pagerank_op(df):
        from mvrepair.operators.linkage import pagerank_micro

        items = df.select("l_orderkey", "l_partkey").dropDuplicates()
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("src")
        )
        bb = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(bb, "__b")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .dropDuplicates(["src", "dst"])
        )
        nodes = df.select(F.col("l_partkey").alias("id")).dropDuplicates()
        return pagerank_micro(edges, nodes, iters=3)

    def _perplexity_op(df):
        from mvrepair.operators.lm import bigram_lm_scores

        return bigram_lm_scores(df, buckets=1024)

    def _skyline_op(df):
        from mvrepair.operators.dominance import skyline_2d

        return skyline_2d(
            df, x="p_retailprice", y="p_size", keep=["p_partkey", "p_name"]
        )

    def _kcore_op(df):
        from mvrepair.operators.linkage import kcore_peel

        items = df.select("l_orderkey", "l_partkey").dropDuplicates()
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_a")
        )
        bb = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_b")
        )
        edges = (
            a.join(bb, "__b")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("__w"))
            .filter(F.col("__w") >= 2)
            .select("item_a", "item_b")
        )
        return kcore_peel(edges, k=4, rounds=3)

    def _similar_op(df):
        from mvrepair.operators.dedup import prefix_jaccard_pairs

        items = df.select("l_orderkey", "l_partkey").dropDuplicates()
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_a")
        )
        bb = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_b")
        )
        edges = (
            a.join(bb, "__b")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("__w"))
            .filter(F.col("__w") >= 2)
            .select("item_a", "item_b")
        )
        both = edges.select(
            F.col("item_a").alias("node"), F.col("item_b").alias("nb")
        ).unionByName(
            edges.select(
                F.col("item_b").alias("node"), F.col("item_a").alias("nb")
            )
        )
        adj = both.groupBy("node").agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list("nb")),
                    lambda x: x.cast("string"),
                ),
            ).alias("text")
        )
        return prefix_jaccard_pairs(adj, threshold=0.6, id_col="node", n=1)

    def _leakage_op(df, k):
        from mvrepair.operators.sampling import hash_split

        # production sizing: LSH bucket bits track corpus size (planes ≈
        # log2(N / target_bucket)); a FIXED 8-bit space saturates at 30×
        # and the candidate join goes quadratic in bucket occupancy —
        # measured before this knob existed: 2.5 → 2320 s, exponent 1.94
        n_planes = 8 + max(0, (k - 1)).bit_length()
        variant = df.select(
            (F.col("vec_id") + 500_000_000).alias("vec_id"),
            F.concat(
                F.array(-F.element_at("embedding", 1)),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ).alias("embedding"),
        )
        corpus = df.select("vec_id", "embedding").unionByName(variant)
        pairs = S.cosine_neardup_pairs(
            corpus, dim=64, threshold=0.9, n_planes=n_planes
        )
        sp = hash_split(
            corpus.select("vec_id"),
            id_col="vec_id",
            splits=[("train", 0, 80), ("val", 80, 90), ("test", 90, 100)],
        )
        a = sp.select(
            F.col("vec_id").alias("id_a"), F.col("split").alias("__sa")
        )
        bsp = sp.select(
            F.col("vec_id").alias("id_b"), F.col("split").alias("__sb")
        )
        return (
            pairs.join(a, "id_a")
            .join(bsp, "id_b")
            .select(
                F.least("__sa", "__sb").alias("split_a"),
                F.greatest("__sa", "__sb").alias("split_b"),
            )
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
        )

    def _ann_recall_op(df):
        queries = df.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10_000_000)
        )
        brute = S.cosine_topk(df, queries, k=5)
        ivf = S.ivf_topk(df, queries, dim=64, k=5, n_centroids=16, n_probe=4)
        hits = (
            brute.select("query_id", "neighbor_id")
            .join(
                ivf.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        spine = queries.select(F.col("vec_id").alias("query_id"))
        return spine.join(hits, "query_id", "left").select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )

    def _merkle_pair(df, dense: bool):
        # base/MV pair from an inflated orders frame: the standard
        # mv_pair defect derivation when dense (defect count ∝ volume);
        # when sparse, a FIXED-SIZE defect set (copy-0 keys < 2000 only)
        # so divergence stays constant-absolute while the table grows —
        # the merkle claim under test is that the drill stage's cost
        # follows divergence, not volume.  Orphan offset 500M: clear of
        # the 10M copy shift (copy-i keys live in [i*10M, i*10M+~n)).
        base = df.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )
        k = F.col("o_orderkey")
        if dense:
            hit_price, hit_prio, hit_drop, hit_orph = (
                k % 89 == 5, k % 91 == 7, k % 97 == 3, k % 101 == 11,
            )
        else:
            # 64 dirty keys — comfortably below the 1024-bucket tree, so
            # the drill's IN-filter can actually prune (a first cut used
            # 2000 keys, which hash-saturate ~85% of the 1024 buckets:
            # the "sparse" row then measured the dense plan and landed
            # within noise of it — divergence must be sparse RELATIVE TO
            # THE TREE for merkle to pay, which is exactly the operator's
            # documented premise)
            hit_price = (k < 64) & (k % 4 == 0)
            hit_prio = (k < 64) & (k % 4 == 1)
            hit_drop = (k < 64) & (k % 4 == 2)
            hit_orph = (k < 64) & (k % 4 == 3)
        body = (
            base.filter(~hit_drop)
            .withColumn(
                "o_totalprice",
                F.when(hit_price, F.col("o_totalprice") + 1.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .withColumn(
                "o_orderpriority",
                F.when(hit_prio, F.lit("9-REPAIRME")).otherwise(
                    F.col("o_orderpriority")
                ),
            )
        )
        orphans = base.filter(hit_orph).withColumn(
            "o_orderkey", k + 500_000_000
        )
        return base, body.unionByName(orphans)

    def _merkle_op(df, dense=True):
        import __spark_entry__ as e
        from mvrepair.operators.merkle import merkle_repair_keys

        base, mv = _merkle_pair(df, dense)
        return merkle_repair_keys(
            e._merkle_render(base), e._merkle_render(mv),
            ["o_custkey", "o_orderkey"],
            ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
            depth=10,
        )

    def _quorum_op(df):
        import __spark_entry__ as e
        from mvrepair.operators.merkle import merkle_quorum

        base = df.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )
        k = F.col("o_orderkey")
        r2 = base.withColumn(
            "o_totalprice",
            F.when(k % 89 == 5, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        r3 = base.filter(k % 97 != 3).withColumn(
            "o_orderpriority",
            F.when(k % 83 == 7, F.lit("9-REPAIRME")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        return merkle_quorum(
            [e._merkle_render(r) for r in (base, r2, r3)],
            ["o_custkey", "o_orderkey"],
            ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
            depth=10,
        )

    def _pit_op(df):
        from mvrepair.operators.temporal import asof_join, scd2_history

        ev = df.select("event_id", "ts", "user_id", "event_type")
        dim = scd2_history(ev.filter(F.col("event_type") != "purchase"))
        versions = (
            dim.groupBy("user_id", "valid_from_us")
            .agg(F.max(F.struct("run_seq", "value")).alias("w"))
            .select(
                "user_id",
                F.col("valid_from_us").alias("t_us"),
                F.col("w.run_seq").alias("run_seq"),
                F.col("w.value").alias("value"),
            )
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", F.unix_micros("ts").alias("t_us")
        )
        return asof_join(
            purchases, versions, ["user_id"], "t_us",
            ["run_seq", "value", "t_us"], tiebreak_col="run_seq",
        )

    def _merkle_upserts_op(df):
        import __spark_entry__ as e
        from mvrepair.operators.merkle import merkle_repair_keys
        from mvrepair.operators.reconcile import classify
        from mvrepair.operators.repair import plan_upserts
        from mvrepair.plans import mv_pair as MP

        base, mv = _merkle_pair(df, dense=True)
        wt = F.unix_micros(F.col("o_orderdate"))

        def with_companions(d):
            return d.select(
                "*",
                *[wt.alias(f"{c}__writetime") for c in MP.NON_PK],
                *[
                    F.lit(None).cast("int").alias(f"{c}__ttl")
                    for c in MP.NON_PK
                ],
            )

        keys = merkle_repair_keys(
            e._merkle_render(base), e._merkle_render(mv),
            ["o_custkey", "o_orderkey"],
            ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
            depth=10,
        ).localCheckpoint()
        klist = F.broadcast(
            keys.select(
                F.col("o_custkey").cast("bigint").alias("o_custkey"),
                F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            )
        )
        on = ["o_custkey", "o_orderkey"]
        wide = classify(
            with_companions(base).join(klist, on=on, how="left_semi"),
            with_companions(mv).join(klist, on=on, how="left_semi"),
            MP.spec(),
            window=None,
        )
        return plan_upserts(wide, MP.spec())

    def _joinsize_op(df):
        from mvrepair.operators.sketch import join_size_estimate

        orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
        return join_size_estimate(
            orders, "o_orderkey", df.select("l_orderkey"), "l_orderkey"
        )

    def _hll_op(df):
        from mvrepair.operators.sketch import (
            hll_fold,
            hll_registers_with_total,
        )

        regs = hll_registers_with_total(
            df.select("event_type", "event_id"), "event_id", "event_type"
        )
        return hll_fold(regs, ["event_type"])

    def _dq_op(df):
        from mvrepair.operators import dq

        return dq.dq_report(
            df,
            [
                dq.completeness("l_orderkey"),
                dq.completeness("l_quantity"),
                dq.unique(["l_orderkey", "l_linenumber"]),
                dq.satisfies(
                    "quantity_range", F.col("l_quantity").between(1, 50)
                ),
                dq.satisfies(
                    "discount_range", F.col("l_discount").between(0.0, 0.1)
                ),
                dq.satisfies("price_positive", F.col("l_extendedprice") > 0),
            ],
        )

    def _mad_op(df):
        from mvrepair.operators.temporal import mad_anomaly

        return mad_anomaly(df)

    def _hist_q_op(df):
        # the SKETCH path only (no exact audit): at scale the audit is
        # the thing the grid replaces — this row prices the grid alone
        from mvrepair.operators.sketch import equiwidth_hist, hist_quantile_est

        cents = df.select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice").cast("double") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        h = equiwidth_hist(cents, "cents", ["flag"], 12800)
        return hist_quantile_est(h, ["flag"], [500000, 950000], 12800)

    def _label_pca_op(df):
        from mvrepair.operators.decomp import grouped_pca_scores

        return grouped_pca_scores(df, "vec_id", "embedding", "label", 64)

    def _kcenter_op(df):
        from mvrepair.operators.selection import kcenter_select

        return kcenter_select(df.select("vec_id", "embedding"), 6)[1]

    def _drift_op(df):
        from mvrepair.operators.dq import category_drift

        return category_drift(
            df.select("event_type", "ts"), "event_type", "ts"
        )

    def _woe_op(df):
        from mvrepair.operators.dq import woe_iv

        o = df.select(
            F.floor(F.col("o_totalprice").cast("double") * 100)
            .cast("bigint")
            .alias("cents"),
            (F.col("o_orderstatus") == "F").alias("label"),
        )
        return woe_iv(o, "cents", "label", n_bins=8, width=1 << 16)

    def _benford_op(df):
        from mvrepair.operators.dq import benford_report

        o = df.select(
            F.floor(F.col("o_totalprice").cast("double") * 100)
            .cast("bigint")
            .alias("cents")
        )
        return benford_report(o, "cents")

    def _hardneg_op(df):
        from mvrepair.operators.similarity import hard_negative_topk

        return hard_negative_topk(df, dim=64, k=3)

    def _budget_op(df):
        from mvrepair.operators.sampling import budget_apportion

        d = df.select(
            "source", F.size(F.split(F.col("text"), " ")).alias("toks")
        )
        return budget_apportion(d, "source", "toks", 10_007)

    def _attrib_op(df):
        from mvrepair.operators.temporal import linear_attribution

        return linear_attribution(df)

    def _ks_op(df):
        from mvrepair.operators.dq import numeric_drift_ks

        return numeric_drift_ks(
            df.select("value", "ts"), "value", "ts", quant=100
        )

    def _km_op(df):
        from mvrepair.operators.temporal import km_survival

        return km_survival(df)

    def _gini_op(df):
        from mvrepair.operators.dq import gini_concentration

        li = df.select(
            "l_partkey",
            F.floor(F.col("l_extendedprice").cast("double") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        return gini_concentration(li, "l_partkey", "cents")

    def _zipf_op(df):
        from mvrepair.functions.exactlog import micro_log2
        from mvrepair.operators.regression import grouped_trend
        from pyspark.sql.window import Window as W

        freq = df.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("f"))
        ranked = freq.select(
            "f",
            F.row_number()
            .over(W.orderBy(F.col("f").desc(), F.col("l_partkey").asc()))
            .alias("rnk"),
        )
        pts = ranked.select(
            F.lit("zipf").alias("corpus"),
            micro_log2(F.col("rnk").cast("double")).alias("lx"),
            micro_log2(F.col("f").cast("double")).alias("ly"),
        )
        return grouped_trend(pts, "corpus", F.col("lx"), F.col("ly"))

    def _w1_op(df):
        from mvrepair.operators.dq import numeric_drift_w1

        return numeric_drift_w1(
            df.select("value", "ts"), "value", "ts", quant=100
        )

    def _communities_op(df):
        from mvrepair.operators.linkage import label_communities

        items = df.select("l_orderkey", "l_partkey").dropDuplicates(
            ["l_orderkey", "l_partkey"]
        )
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("src")
        )
        b = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("dst")
        )
        edges = (
            a.join(b, "__b")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .dropDuplicates(["src", "dst"])
        )
        nodes = load_table(spark, sf_dir, "part").select("p_partkey")
        return label_communities(edges, nodes, id_col="p_partkey", iters=4)

    def _ams_op(df):
        from mvrepair.operators.sketch import ams_f2

        return ams_f2(df.select("user_id"), "user_id", reps=40, groups=5)

    def _snm_op(df):
        from mvrepair.operators.linkage import snm_pairs

        # prefixed copies ("0xCustomer#...") keep each copy's block
        # space disjoint (the fuzzy-variant doctrine): candidates scale
        # k x, per-block density constant
        return snm_pairs(
            df.select("c_custkey", "c_name"),
            key_col="c_name", id_col="c_custkey",
            block_prefix_len=17, window=4, max_dist=2,
        )

    def _mutual_op(df):
        from mvrepair.operators.similarity import (
            lsh_bucketed_topk,
            mutual_nn_pairs,
        )

        sub = df.filter(F.col("vec_id") % 10 == 0)
        nn = lsh_bucketed_topk(sub, sub, dim=64, k=1).select(
            "query_id", "neighbor_id", "cosine_micro"
        )
        return mutual_nn_pairs(nn)

    def _phrase_op(df):
        from mvrepair.operators.text import phrase_search

        return phrase_search(
            df, ["table part", "fast scan", "row scan slow"]
        )

    def _qnorm_op(df):
        from mvrepair.operators.dq import quantile_normalize

        d = df.select(
            "doc_id", "source", F.length("text").alias("n_chars")
        )
        return quantile_normalize(
            d, value_col="n_chars", group_col="source", id_col="doc_id"
        )

    def _hardneg_scaled_op(df, k):
        import math

        from mvrepair.operators.similarity import hard_negative_topk

        planes = 8 + max(0, math.ceil(math.log2(k)))
        return hard_negative_topk(df, dim=64, k=3, n_planes=planes)

    def _cms_joinsize_op(df):
        from mvrepair.operators.sketch import cms_join_size

        orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
        return cms_join_size(
            orders, "o_orderkey", df.select("l_orderkey"), "l_orderkey",
            w=2048, d=4,
        )

    def _mi_op(df):
        from mvrepair.operators.dq import mi_report

        return mi_report(df, [
            ("o_custkey", "o_orderpriority"),
            ("o_orderdate", "o_orderstatus"),
        ])

    def _textrank_op(df):
        from mvrepair.operators.linkage import pagerank_micro

        toks = df.select(F.split(F.col("text"), " ").alias("__toks"))
        head = F.expr("slice(__toks, 1, greatest(size(__toks) - 1, 0))")
        tail = F.expr("slice(__toks, 2, greatest(size(__toks) - 1, 0))")
        pairs = toks.select(
            F.explode(
                F.zip_with(
                    head, tail,
                    lambda a, b: F.struct(a.alias("x"), b.alias("y")),
                )
            ).alias("__p")
        ).select(F.col("__p.x").alias("x"), F.col("__p.y").alias("y"))
        pairs = pairs.filter(
            (F.length("x") >= 4) & (F.length("y") >= 4)
            & (F.col("x") != F.col("y"))
        )
        edges = (
            pairs.select(F.col("x").alias("src"), F.col("y").alias("dst"))
            .unionByName(
                pairs.select(
                    F.col("y").alias("src"), F.col("x").alias("dst")
                )
            )
            .dropDuplicates(["src", "dst"])
        )
        nodes = edges.select(F.col("src").alias("id")).distinct()
        return pagerank_micro(edges, nodes, id_col="id", iters=3)

    def _cms_op(df):
        from mvrepair.operators import sketch as SK

        toks = df.select(
            F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        return SK.cms_counters(toks, "token", w=2048, d=4)

    def _kmv_overlap_op(df):
        from mvrepair.operators import sketch as SK

        return SK.kmv_overlap(
            df.select("event_type", "user_id"), "event_type", "user_id",
            k=64,
        )

    def _fd_op(df):
        from mvrepair.operators.dq import fd_report

        return fd_report(df, [
            (["o_orderkey"], ["o_custkey"]),
            (["o_custkey"], ["o_orderpriority"]),
        ])

    def _pca_op(df):
        from mvrepair.operators import decomp as DC

        stats = DC.pca_suffstats(df, "embedding", 64).collect()
        v, n, sv = DC.principal_axis(stats, 64)
        return DC.pca_scores(df, "vec_id", "embedding", v, n, sv)

    OPS = {
        "dedup_exact(copies)": (True, lambda df: D.exact_dedup(df)),
        "repetition_stats": (False, lambda df: X.repetition_stats(df)),
        "substring_dup_stats": (False, lambda df: D.substring_dup_stats(df)),
        "neardup_minhash": (
            False,
            lambda df: D.ngram_jaccard_pairs(df, threshold=0.5),
        ),
        "simhash_neardup": (
            False,
            lambda df: D.simhash_candidate_pairs(
                X.simhash(df, bits=60, units=D.shingles(F.col("text"))),
                max_hamming=10,
                n_bands=4,
                band_bits=15,
            ),
        ),
        # round-5 families (exact copies where content is irrelevant:
        # packing/ordering/mix cost is tokenize+hash, not dup structure)
        "pack_sequences(copies)": (
            True,
            lambda df: PK.pack_sequences(df, budget=256, n_streams=8),
        ),
        "training_order(copies)": (
            True,
            lambda df: PK.training_order(
                PK.pack_sequences(df, budget=256, n_streams=8)
            ),
        ),
        "corpus_mix(copies)": (
            True,
            lambda df: weighted_mix(
                df, {"web": 2.4, "books": 1.2}, default_rate=0.1
            ),
        ),
        # prefixed copies: funnel's distinct legs and keep-best's cluster
        # pipeline need per-copy dup density held constant
        "quality_funnel": (False, lambda df: X.quality_funnel(df)),
        "dedup_keep_best": (False, _keep_best_op),
        # round-6 families: span removal needs per-copy dup density held
        # constant (prefixed); dsir cost is tokenize+hash+two aggs, the
        # lang target column survives exact copies unchanged
        "span_dedup": (False, lambda df: D.span_dedup(df)),
        "dsir_scores(copies)": (
            True,
            lambda df: _dsir(df),
        ),
        # budget scaled with volume so the boundary class stays a constant
        # fraction of each source — the naive all-rows window this operator
        # avoids would sort every row regardless
        "token_budget_fill(copies)": (
            True,
            _tbf,
        ),
        # exact copies: the vocabulary (and thus the pair explode) stays
        # constant — only the corpus word-freq pass grows with volume
        "bpe_merges(copies)": (
            True,
            lambda df: X.bpe_merge_candidates(df),
        ),
        "key_skew(copies)": (True, _key_skew_op),
        "corpus_diff(copies)": (True, _diff_op),
        # full refresh pipeline: sign v1, diff v1/v2, maintain the index
        "index_upsert(copies)": (True, _index_upsert_op),
        # exact copies: class/bucket model stays constant-size; only the
        # token pass and the per-doc scoring grow with volume
        "nb_classify(copies)": (True, _nb_op),
        # prefixed: the apply step rides the keep-best pipeline's cost
        # plus two anti-joins; dup density must stay constant per copy
        "dedup_apply": (False, _apply_op),
        # prefixed: disjoint per-copy vocabularies keep every token's
        # corpus frequency (hence rarity classification) exactly that of
        # the base corpus; fixed rare_max so semantics are volume-free
        "rare_tokens": (False, lambda df: X.rare_token_profile(df)),
        # exact copies: 3 retry cells per target, targets grow with
        # volume, group size constant — measures the max_by aggregate
        "repair_log_compact(copies)": (True, _compact_op),
        # exact copies: frozen-model scoring of the variant corpus — the
        # batch equivalent of nb_stream's drained microbatches (model
        # build included, as in the streaming setup)
        "nb_stream(copies)": (True, _nb_stream_op),
        # embedding copies: own-centroid prototypicality, map-side score
        "label_outliers(emb)": ("emb", lambda df: S.label_outliers(df)),
        # embedding copies with a FIXED query set (base-copy ids only):
        # recall measurement throughput as the indexed corpus grows —
        # scaling the query set too would be O(k^2) by construction
        "ann_recall(emb)": ("emb", _ann_recall_op),
        # round-8 families: prefixed customer names keep fuzzy-variant
        # buckets disjoint per copy; shifted orderkeys keep baskets (and
        # pair density) per-copy; shifted user ids keep per-user streams
        "name_linkage(cust)": ("cust", _linkage_op),
        "basket_pairs(li)": ("li", _basket_op),
        "event_transitions(ev)": ("ev", _transitions_op),
        # disjoint graph copies; nodes = the distinct shifted part ids
        "part_pagerank(li2)": ("li2", _pagerank_op),
        # exact copies: same sources/classes, counts x k — the class
        # frame (and the broadcast) stays (sources x 4) at every factor
        "quality_percentiles(copies)": (True, _qpct_op),
        # round-8 wave 2.  events copies (shifted user ids, same 30-day
        # span): gapfill's spine stays types x hours at every factor —
        # only the bucketed agg grows; cohort's matrix stays days^2
        "events_gapfill(ev)": ("ev", _gapfill_op),
        "cohort_retention(ev)": ("ev", _cohort_op),
        # disjoint graph copies: k x nodes/edges/triangles, wedge width
        # per vertex constant
        "part_triangles(li2)": ("li2", _triangles_op),
        # both centrality pipelines + the k-row fusion
        "part_rank_fusion(li2)": ("li2", _fusion_op),
        # prefixed copies: per-copy vocab disjoint, every (source, token)
        # count exactly the base corpus's — the vocab frame grows k x,
        # the KL join stays vocab-sized
        "source_divergence": (False, _sdiv_op),
        # round-8 wave 3.  events copies (shifted user ids): funnel's
        # per-user window partitions stay constant-size, k x users;
        # anomaly's trailing window stays on the types x hours frame
        "event_funnel(ev)": ("ev", _funnel_op),
        "events_anomaly(ev)": ("ev", _anomaly_op),
        # exact doc copies (shifted ids): vocabulary constant, df x k,
        # posting cap bounds the fold at every factor
        "posting_lists(copies)": (True, _postings_op),
        # prefixed copies: per-copy vocab/bigram space disjoint, so both
        # count frames grow k x while per-pair supports stay the base
        # corpus's (constant join fan-in per key)
        "collocations": (False, _colloc_op),
        # prefixed copies: per-copy shingle space disjoint -> prefix
        # buckets and true pairs both scale k x, never k²
        "jaccard_exact": (False, _jac_op),
        # events copies (shifted user ids): per-user interval streams
        # stay constant-size, k x users on one key-keyed shuffle
        "activity_islands(ev)": ("ev", _islands_op),
        # r9 (r8 verdict #5): direct rows for the two entries that rode
        # the event-copy families by argument — k x users, constant
        # per-user stream, one user-keyed exchange each
        "event_paths(ev)": ("ev", _paths_op),
        "scd2_history(ev)": ("ev", _scd2_op),
        # r9 families: map-side Morton interleave + bounded bucket agg;
        # IVF-PQ trains on k x vectors and scores k x queries against
        # k x candidates per probe list — both linear by construction,
        # measured to keep the claim honest
        "zorder_layout(li)": ("li", _zorder_op),
        "pq_topk(embroll)": ("embroll", _pq_op),
        # round 10: trained coarse quantizer — same pipeline + one more
        # driver-looped kmeans chain over the full-dim corpus
        "pq_topk_trained(embroll)": ("embroll", _pq_trained_op),
        # round 10: the Z-order WRITER (range exchange + sort + parquet
        # write + per-file stats readback) — the report's 0.60 exponent
        # covered only the map-side report
        "zorder_write(li)": ("li", _zwrite_op),
        # round 10: bloom semi-join reduction — fact copies grow k x
        # (shifted order keys, SAME custkeys) against a FIXED dim, so
        # the bitmap build is constant and the measured cell is the
        # map-side prune + exact join at constant selectivity
        "orders_bloom_prune(ord)": ("ord", _bloom_op),
        "orders_join_nobloom(ord)": ("ord", _nobloom_op),
        # round 10: grouped forms — prefixed copies keep per-copy token
        # sets disjoint (constant vocab density per row); the group key
        # stays the 20-source set, so per-group state is constant and
        # the WindowGroupLimit pre-cut is the lever under test
        "weighted_sample_by_source(docs)": (False, _wsample_grouped_op),
        "source_vocab_kmv(docs)": (False, _vocab_kmv_op),
        "events_sliding(ev)": ("ev", _sliding_op),
        "weighted_sample(docs)": (False, _wsample_op),
        # note: 2 tables, NO cap — the study corpus is disjoint-rolled so
        # the bucket tail stays bounded; clustered-data tails are the
        # lsh_sizing_study's subject, capped there
        "embedding_neardup_banded(embroll)": ("embroll", _banded_op),
        # round-8 wave 6.  exact copies: the bigram-bucket model frame is
        # B²-bounded at every factor — only the token pass and per-doc
        # scoring grow with volume (the nb_classify doctrine)
        "doc_perplexity(copies)": (True, _perplexity_op),
        # part copies (shifted ids, values unchanged): per-price min and
        # the reduced window frame stay constant-size; survivors x k
        "part_skyline(pt)": ("pt", _skyline_op),
        # disjoint graph copies: k x nodes/edges, peel rounds fixed —
        # measures the per-round degree agg + semi-joins
        "part_kcore(li2)": ("li2", _kcore_op),
        # prefixed copies: per-copy shingle space disjoint -> candidate
        # pairs scale k x; the grid rollup stays <=187 rows
        "minhash_calibration": (False, lambda df: D.minhash_calibration(df)),
        # disjoint graph copies: adjacency sets (and similar pairs) per
        # copy are the base graph's — the prefix join on a k x node set
        "similar_parts(li2)": ("li2", _similar_op),
        # component-rolled embedding copies (disjoint in cosine space):
        # near-dup pairs scale k x — one perturbed variant per vector
        # per copy; identical-copy inflation would measure k² OUTPUT
        "semantic_leakage(embroll)": ("embroll", _leakage_op),
        # round-10 wave 2.  merkle under volume-proportional divergence
        # (the standard mv_pair defect mods: ~4% of rows per copy —
        # every bucket dirty, drill sees everything; honest worst case,
        # expect ~linear) vs FIXED-absolute divergence (2000 copy-0
        # keys: digest stage grows, drill stays constant — the
        # cost-∝-divergence claim, expect the gap between the two rows
        # to widen with k)
        "mv_merkle_dense(ord)": ("ord", lambda df: _merkle_op(df, True)),
        "mv_merkle_sparse(ord)": ("ord", lambda df: _merkle_op(df, False)),
        # events copies: sketch state is 128 registers per type at every
        # factor — the row under test is the scan+partial-agg growth
        "events_hll(ev)": ("ev", _hll_op),
        # 3-replica quorum under volume-proportional divergence (the
        # dense merkle doctrine: every defect class ∝ rows); measures
        # the N-replica digest stage + the checkpointed vote drill
        "mv_quorum(ord)": ("ord", _quorum_op),
        # the composed repair: digest stage + drill + pruned classify +
        # upsert planner, dense divergence (the honest worst case)
        "mv_merkle_upserts(ord)": ("ord", _merkle_upserts_op),
        # two per-key count frames + the key-sized full-outer merge;
        # fact copies against the FIXED orders dim (constant match set)
        "joinsize(li)": ("li", _joinsize_op),
        # events copies (shifted user ids): per-user run encoding and
        # the as-of union+window both ride user-keyed exchanges —
        # constant per-user state, k x users
        "purchase_state_pit(ev)": ("ev", _pit_op),
        # one-pass DQ aggregate; the countDistinct Expand doubles scan
        # rows but stays map-combinable
        "lineitem_dq(li)": ("li", _dq_op),
        # round-10 wave 5.  exact copies: the CMS grid is <= d*w cells at
        # every factor — the row under test is the token Expand + the
        # map-combinable grid agg (token frequencies k x, cell set fixed)
        "cms_grid(copies)": (True, _cms_op),
        # events copies with SHIFTED user ids: distinct users k x under a
        # constant group enum — the distinct pass grows, everything past
        # the WindowGroupLimit bottom-k cut stays sketch-sized
        "user_overlap_kmv(ev)": ("ev", _kmv_overlap_op),
        # orders copies: candidate-FD g3 over k x rows — two map-
        # combinable folds per candidate, group cardinality k x for the
        # key candidate, constant for the drift candidate
        "orders_fd(ord)": ("ord", _fd_op),
        # embedding copies: the full PCA pipeline (suff-stats pass +
        # driver eigen-iteration + projection scan) — stats stay 2,145
        # rows at every factor, iteration cost is volume-independent
        "embedding_pca(emb)": ("emb", _pca_op),
        # fact copies vs the FIXED orders dim (the joinsize twin):
        # grids are <= d*w at every factor, growth is the two md5
        # Expand scans + the constant broadcast zip
        "cms_joinsize(li)": ("li", _cms_joinsize_op),
        # orders copies: joint-group cardinality fixed per candidate
        # (same key domains), growth is the groupBy(X, Y) scan; the
        # micro_log2 ladders run over vocab-sized frames at any volume
        "orders_mi(ord)": ("ord", _mi_op),
        # exact copies: vocabulary and co-occurrence EDGE SET constant
        # (the bpe_merges doctrine) — growth is the bigram pass +
        # distinct-pair dedup; the rank loop runs on the fixed graph
        "textrank(copies)": (True, _textrank_op),
        # events copies (shifted user ids): per-type row count k x —
        # the two rank windows ride one type-keyed exchange each
        "events_mad(ev)": ("ev", _mad_op),
        # embedding copies (labels unchanged): per-label stats stay
        # 2,145 rows, the grouped cell explode grows with volume
        "label_pca(emb)": ("emb", _label_pca_op),
        # round 11.  fact copies: the histogram grid is <= groups x
        # buckets cells at every factor — growth is the one
        # map-combinable count scan; quantile extraction rides the
        # fixed-size grid (the cms_grid doctrine for order statistics)
        "hist_quantiles(li)": ("li", _hist_q_op),
        # embedding copies: k greedy rounds, each ONE scan + ONE
        # TakeOrdered(1) reduce over the incremental mind2 frame —
        # growth is the per-round scan; round count and the driver's
        # center list are volume-independent
        "kcenter(emb)": ("emb", _kcenter_op),
        # events copies (shifted user ids): per-type counts scale kx,
        # everything after the one count pass is a 5-row frame
        "drift_psi(ev)": ("ev", _drift_op),
        # orders copies: the grid and the bin frame are fixed-size;
        # growth is the sketch count pass + the conditional-count pass
        "woe_iv(ord)": ("ord", _woe_op),
        # orders copies: one digit-count pass, 9-row tail
        "benford(ord)": ("ord", _benford_op),
        # DISJOINT (rolled) embedding copies: fixed 256-bucket LSH, so
        # in-bucket density grows kx and candidate pairs k^2 — the
        # documented self-join trade; the plane count is the knob a
        # growing corpus turns (9 planes halve density)
        "hard_negatives(embroll)": ("embroll", _hardneg_op),
        # document copies: token-mass agg scales, apportionment tail is
        # a |sources|-row window stack
        "crawl_budget(docs)": (True, _budget_op),
        # events copies (shifted users): conversions and touches kx,
        # per-user band-join structure constant -> linear
        "attribution(ev)": ("ev", _attrib_op),
        # the fix for the row above: one extra plane per corpus
        # doubling keeps in-bucket density constant — the measured
        # answer to the fixed-bucket k^2 wall
        "hard_negatives_scaled(embroll)": ("embroll", _hardneg_scaled_op),
        # events copies: one conditional-count pass; the cumulative
        # runs over the FIXED 6.4k-unit value-domain frame at any k
        "drift_ks(ev)": ("ev", _ks_op),
        # events copies (shifted users): k x subjects through one
        # user-keyed agg; the life table stays time-domain-sized and
        # the fold is one row
        "km_survival(ev)": ("ev", _km_op),
        # lineitem copies, partkeys UNSHIFTED: the key-domain frame
        # (20k parts) is fixed — growth is the one key-keyed agg
        "gini(li)": ("li", _gini_op),
        "zipf(li)": ("li", _zipf_op),
        # round 11, session 3.  events copies: W1 rides the same fixed
        # 6.4k-unit value-domain frame as KS — one conditional-count
        # pass is the only growing term
        "drift_w1(ev)": ("ev", _w1_op),
        # lineitem copies with partkeys UNSHIFTED: the distinct edge
        # set saturates at the base graph, so the 4 vote rounds run on
        # a fixed frame — growth is the basket self-join/dedup pass
        "communities(li)": ("li", _communities_op),
        # events copies (shifted users): Z state is 40 longs at every
        # factor — growth is the sign Expand + the k x user audit agg
        "ams_f2(ev)": ("ev", _ams_op),
        # prefixed customer copies (disjoint block spaces): candidates
        # k x, per-block window density constant -> expect ~linear
        "snm(cust)": ("cust", _snm_op),
        # disjoint (rolled) embedding copies: fixed 256-bucket LSH, so
        # probe-subset in-bucket density grows — the hard_negatives
        # trade on the retrieval path; mutuality tail is top-1-sized
        "mutual_nn(embroll)": ("embroll", _mutual_op),
        # exact document copies: spec is 3 phrases at any volume —
        # growth is the posexplode + broadcast-join postings stream
        "phrase_match(copies)": (True, _phrase_op),
        # exact document copies: value domain and the 100-row pooled
        # map are fixed — growth is the source-partitioned rank pass
        "quantile_norm(copies)": (True, _qnorm_op),
    }

    # optional focus: comma-separated op names (re-measuring one family
    # shouldn't force the full multi-factor sweep of all ten)
    pick = os.environ.get("SPARK_GRAFT_SCALE_OPS")
    if pick:
        names = {n.strip() for n in pick.split(",")}
        OPS = {k: v for k, v in OPS.items() if k in names}

    def _call(fn, df, k):
        # ops whose parameters must scale with volume (budget fills) take
        # (df, k); the rest are unary
        import inspect

        return fn(df, k) if len(inspect.signature(fn).parameters) == 2 else fn(df)

    def _frame(kind, k):
        # kind: True = exact copies, False = prefixed copies,
        #       "emb"/"cust"/"li"/"ev" = other-table copies
        if kind == "emb":
            return inflate_emb(k)
        if kind == "cust":
            return inflate_generic("customer", "c_custkey", k, "c_name")
        if kind == "li":
            return inflate_generic("lineitem", "l_orderkey", k)
        if kind == "li2":
            # both basket AND item ids shifted: k disjoint copies of the
            # co-purchase GRAPH (same structure, k x nodes and edges)
            return inflate_generic(
                "lineitem", "l_orderkey", k,
                shift_cols=["l_orderkey", "l_partkey"],
            )
        if kind == "ev":
            return inflate_generic("events", "user_id", k)
        if kind == "ord":
            # k x fact rows, custkeys UNSHIFTED: constant join
            # selectivity against the fixed customer dim
            return inflate_generic("orders", "o_orderkey", k)
        if kind == "pt":
            return inflate_generic("part", "p_partkey", k)
        if kind == "embroll":
            return inflate_emb_disjoint(k)
        return inflate(k, bool(kind))

    # untimed warmup: JIT, codegen caches, parquet-footer paths
    for name, (kind, fn) in OPS.items():
        _call(fn, _frame(kind, 1), 1).write.format("noop").mode("overwrite").save()
        _release_owned(); spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {}
    top2 = sorted(factors)[-2:]
    for name, (kind, fn) in OPS.items():
        times: dict[str, float] = {}
        for k in factors:
            df = _frame(kind, k)
            t0 = time.monotonic()
            _call(fn, df, k).write.format("noop").mode("overwrite").save()
            times[str(k)] = round(time.monotonic() - t0, 2)
            _release_owned(); spark.catalog.clearCache()
        lo, hi = str(top2[0]), str(top2[1])
        times["exponent"] = round(
            math.log(times[hi] / times[lo]) / math.log(top2[1] / top2[0]), 2
        )
        results[name] = times
        print(name, times, file=sys.stderr)

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
