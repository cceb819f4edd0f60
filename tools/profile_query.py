"""One-off per-query profiler for the optimization rounds.

Runs named queries (default: a given list) with the SAME session config as
bench.py, times the noop-sink action N times, and optionally writes
``.explain("formatted")`` to plans/<round>/<query>_<tag>.txt.

Usage::

    python -m tools.profile_query [--sf DIR] [--cpus N] [--reps N]
        [--explain-dir plans/r14] [--tag before] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("profile-query")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = dict(entry.queries())
    qs.update(entry.bench_only_queries())

    from spark_timeseries_spark.sources import load_table

    for t in ("events", "documents", "embeddings"):
        try:
            load_table(spark, args.sf, t).count()
        except Exception:
            pass

    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(txt)
            spark.catalog.clearCache()
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        if times:
            print(f"{name}: {times} min={min(times)}")
    spark.stop()


if __name__ == "__main__":
    main()
