"""Round-12 probe: triangle-core variants (guide §1 measure-first).

Variants over the SAME co-purchase edge frame at the given SF:
  cur   — triangle_counts as shipped (persisted oriented cache, AQE on)
  ckpt  — oriented repartition("src") + localCheckpoint (AQE on)
  stat  — oriented repartition(N, "src") + localCheckpoint under
          static_shuffle (AQE off for the checkpoint only)
  bcast — stat + broadcast hint on the closing side
Each timed through the noop sink, alternating order across repeats to
kill the order bias the r11 A/B lesson documented.  Verifies every
variant's (node, n_triangles) multiset equals the current one's.

Usage: python tools/triangle_study_r12.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("triangle-study-r12")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from mvrepair.sources import load_table
    from mvrepair.operators.linkage import triangle_counts
    from mvrepair import cache as _cache
    from mvrepair.tuning import static_shuffle, loop_partitions

    def und_edges():
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        items = li.dropDuplicates(["l_orderkey", "l_partkey"])
        a = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_a")
        )
        b = items.select(
            F.col("l_orderkey").alias("__b"), F.col("l_partkey").alias("item_b")
        )
        return (
            a.join(b, "__b")
            .filter(F.col("item_a") < F.col("item_b"))
            .select("item_a", "item_b")
            .dropDuplicates(["item_a", "item_b"])
        )

    def orient(e):
        ends = e.select(F.col("__a").alias("__n")).unionAll(
            e.select(F.col("__b").alias("__n"))
        )
        deg = ends.groupBy("__n").agg(F.count(F.lit(1)).alias("__d"))
        da = deg.select(F.col("__n").alias("__a"), F.col("__d").alias("__da"))
        db = deg.select(F.col("__n").alias("__b"), F.col("__d").alias("__db"))
        ranked = e.join(da, "__a").join(db, "__b")
        a_first = (F.col("__da") < F.col("__db")) | (
            (F.col("__da") == F.col("__db")) & (F.col("__a") < F.col("__b"))
        )
        return ranked.select(
            F.when(a_first, F.col("__a")).otherwise(F.col("__b")).alias("src"),
            F.when(a_first, F.col("__b")).otherwise(F.col("__a")).alias("dst"),
            F.when(a_first, F.col("__db")).otherwise(F.col("__da")).alias("ddst"),
        )

    def wedge_close(oriented, bcast=False):
        e1 = oriented.alias("e1")
        e2 = oriented.alias("e2")
        wedges = e1.join(e2, F.col("e1.src") == F.col("e2.src")).filter(
            (F.col("e1.ddst") < F.col("e2.ddst"))
            | (
                (F.col("e1.ddst") == F.col("e2.ddst"))
                & (F.col("e1.dst") < F.col("e2.dst"))
            )
        ).select(
            F.col("e1.src").alias("u"),
            F.col("e1.dst").alias("v"),
            F.col("e2.dst").alias("w"),
        )
        closing = oriented.select(
            F.col("src").alias("v"), F.col("dst").alias("w")
        )
        if bcast:
            closing = F.broadcast(closing)
        tris = wedges.join(closing, ["v", "w"])
        verts = tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        return verts.groupBy("node").agg(
            F.count(F.lit(1)).cast("long").alias("n_triangles")
        )

    def v_cur():
        out = triangle_counts(und_edges()).select(
            F.col("node").alias("part_id"), "n_triangles"
        )
        out.write.format("noop").mode("overwrite").save()
        _cache.release_all()
        spark.catalog.clearCache()

    def _prep(static: bool):
        e = und_edges().select(
            F.col("item_a").alias("__a"), F.col("item_b").alias("__b")
        ).persist()
        n = e.count()
        if static:
            npart = loop_partitions(spark, 2 * n)
            with static_shuffle(spark, npart):
                o = orient(e).repartition(npart, "src").localCheckpoint(
                    eager=True
                )
        else:
            o = orient(e).repartition("src").localCheckpoint(eager=True)
        e.unpersist()
        return o

    def v_ckpt():
        o = _prep(static=False)
        wedge_close(o).write.format("noop").mode("overwrite").save()

    def v_stat():
        o = _prep(static=True)
        wedge_close(o).write.format("noop").mode("overwrite").save()

    def v_bcast():
        o = _prep(static=True)
        wedge_close(o, bcast=True).write.format("noop").mode("overwrite").save()

    variants = [("cur", v_cur), ("ckpt", v_ckpt), ("stat", v_stat),
                ("bcast", v_bcast)]
    # correctness: every variant's result equals the current one's
    ref = triangle_counts(und_edges())
    ref_rows = sorted((r[0], r[1]) for r in ref.collect())
    _cache.release_all()
    spark.catalog.clearCache()
    for name, make in [("ckpt", lambda: wedge_close(_prep(False))),
                       ("stat", lambda: wedge_close(_prep(True))),
                       ("bcast", lambda: wedge_close(_prep(True), True))]:
        rows = sorted((r[0], r[1]) for r in make().collect())
        assert rows == ref_rows, f"variant {name} differs"
        print(f"{name}: bit-identical ({len(rows)} nodes)", file=sys.stderr)
        spark.catalog.clearCache()

    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for r in range(reps):
        order = variants if r % 2 == 0 else list(reversed(variants))
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"tri:{name}:{r}")
            t0 = time.monotonic()
            fn()
            times[name].append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
    print(json.dumps({k: v for k, v in times.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
