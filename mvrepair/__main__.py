"""CLI entry point: ``python -m mvrepair [key=value ...]``.

Parity with the reference's fat-jar ``main`` (MvSync.java:43-45;
``mainClass=mvsync.MvSync`` in pom.xml:122-127, invocation recipe
README.md:70): configuration arrives as ``spark.cass.mv.*`` properties on
the Spark conf (``spark-submit --conf spark.cass.mv.keyspace=ks …``), with
optional ``key=value`` CLI overrides using the same setting names
(``cass.mv.*`` or ``spark.cass.mv.*`` — MVSyncSettings.java:122-128 prefix
fallback applies).

Exit code 0 on success (stats line printed to stdout, matching the
reference's ``stats.txt`` single-line format), 1 on any failure — after
bumping the ``JobError`` lifecycle counter, as ``run()`` does
(MvSync.java:51-58).
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    from pyspark.sql import SparkSession

    from mvrepair.config import SyncSettings
    from mvrepair.runner import run

    argv = sys.argv[1:] if argv is None else argv
    overrides: dict[str, str] = {}
    for arg in argv:
        if "=" not in arg:
            print(f"ignoring argument without '=': {arg!r}", file=sys.stderr)
            continue
        k, v = arg.split("=", 1)
        overrides[k] = v

    spark = SparkSession.builder.getOrCreate()
    conf = dict(spark.sparkContext.getConf().getAll())
    conf.update(overrides)
    settings = SyncSettings(conf)

    try:
        stats = run(spark, settings)
    except Exception as exc:  # JobError already counted inside run()
        print(f"mvrepair job failed: {exc}", file=sys.stderr)
        return 1
    print(stats.render())
    return 0


if __name__ == "__main__":
    sys.exit(main())
