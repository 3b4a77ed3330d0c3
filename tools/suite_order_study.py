"""Round-11 verdict #1: reproduce the driver's full-suite condition.

Measures repair_log_compact (and bm25_rank, the watch-list control)
at three points: fresh after warmup (the bench position-3 condition),
after a full 156-query pass with clearCache+release ON between
queries (the bench condition), and after a second full pass with NO
clearing (worst-case accumulation).  If suite state/cache pressure
explains the driver's 2.5->6.0 s, the post-suite measurements inflate.
"""
import json, os, sys, time, statistics
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
    .appName("suite-order-study")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .config("spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:TieredStopAtLevel=1")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"

import __spark_entry__ as e
from mvrepair import cache as C
from mvrepair.sources import load_table
from mvrepair.sources.parquet import TABLES

for t in TABLES:
    load_table(spark, sf_dir, t).limit(1).write.format("noop").mode("overwrite").save()
spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").write.format("noop").mode("overwrite").save()
sc = spark.sparkContext

def cal():
    runs = []
    for _ in range(7):
        t0 = time.monotonic(); sc.parallelize(range(32), 32).count()
        runs.append(time.monotonic() - t0)
    return round(statistics.median(runs) * 1000, 1)

def measure(name, n=3, clear=True):
    fn = e.queries()[name]
    runs = []
    for _ in range(n):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.monotonic() - t0, 3))
        if clear:
            C.release_all(); spark.catalog.clearCache()
    return runs

def n_persisted():
    m = sc._jsc.getPersistentRDDs(); return m.size()

out = {"cal_start": cal()}
# phase 1: fresh (bench position-3 condition; positions 0-2 first)
measure("mv_classify", 1); measure("mv_repair_upserts", 1)
out["fresh_repair_log_compact"] = measure("repair_log_compact")
out["fresh_bm25_rank"] = measure("bm25_rank")

# phase 2: full pass, clearing ON (the bench condition)
t0 = time.monotonic()
for name, fn in e.queries().items():
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as ex:
        print("ERR", name, str(ex)[:80], file=sys.stderr)
    C.release_all(); spark.catalog.clearCache()
out["pass_on_secs"] = round(time.monotonic() - t0, 1)
out["cal_after_on"] = cal()
out["persisted_after_on"] = n_persisted()
out["after_on_repair_log_compact"] = measure("repair_log_compact")
out["after_on_bm25_rank"] = measure("bm25_rank")

# phase 3: full pass, clearing OFF (worst-case accumulation)
t0 = time.monotonic()
for name, fn in e.queries().items():
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as ex:
        print("ERR", name, str(ex)[:80], file=sys.stderr)
out["pass_off_secs"] = round(time.monotonic() - t0, 1)
out["cal_after_off"] = cal()
out["persisted_after_off"] = n_persisted()
# measure WITHOUT clearing first (state intact), then with
out["after_off_repair_log_compact"] = measure("repair_log_compact", clear=False)
out["after_off_bm25_rank"] = measure("bm25_rank", clear=False)
C.release_all(); spark.catalog.clearCache()
out["cleared_repair_log_compact"] = measure("repair_log_compact")
out["cal_end"] = cal()
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "suite_order_study_r11.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
spark.stop()
