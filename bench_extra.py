"""Targeted benchmark harness for optimization work (bench.py is FROZEN
for the driver's measurement; this file exists so individual queries can
be isolated and re-timed without running the full gauntlet).

Same discipline as bench.py: noop sink (computes every column, no
driver materialization), N warmups + N timed runs per query, median +
spread, ContextCleaner drain between runs, labelled jobs.

Usage:  python bench_extra.py q1 q2 ...      # named queries
        python bench_extra.py --plans q1 ... # also dump explain() to
                                             # plans/r06/<q>_current.txt
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_WARMUPS, BENCH_RUNS.
Prints one JSON line {"queries": {...}, "spread": {...}}.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_warm = int(os.environ.get("BENCH_WARMUPS", "2"))
    n_timed = int(os.environ.get("BENCH_RUNS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ocsf-validator-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent

    qs = ent.queries()
    names = args or list(qs)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def drain():
        gc.collect()
        spark._jvm.System.gc()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    timings, spread = {}, {}
    for name in names:
        fn = qs[name]
        if dump_plans:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_current.txt", "w") as fh:
                fh.write(fn(spark, sf_dir)._jdf.queryExecution().toString())
        spark.sparkContext.setJobDescription(name)
        for _ in range(n_warm):
            force(fn(spark, sf_dir))
            drain()
        runs = []
        for _ in range(n_timed):
            t0 = time.time()
            force(fn(spark, sf_dir))
            runs.append(time.time() - t0)
            drain()
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)
    print(json.dumps({"queries": timings, "spread": spread, "sf": sf_dir}))


if __name__ == "__main__":
    main()
