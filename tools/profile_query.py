#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1): time a
registry query in isolation with the noop sink, capture its
``explain("formatted")`` plan, and break the wall clock down by Spark
job/stage via the UI REST API.

Usage:
    python tools/profile_query.py QUERY [--runs N] [--plan-out FILE]
        [--sf-dir DIR] [--stages]

The session mirrors ``session.get_spark`` exactly except that the UI
is enabled (the REST API is the stage-metrics source; bench.py keeps
the UI off). Timings here guide optimization; the driver-comparable
numbers remain bench.py's.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def get_profiling_spark():
    from s3_elasticsearch_data_pipeline_spark.session import (
        DEFAULT_SHUFFLE_PARTITIONS)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = int(os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName("profile-query")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate())


def rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan-out", default=None)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--stages", action="store_true",
                    help="dump per-stage metrics of the LAST timed run")
    args = ap.parse_args()

    from s3_elasticsearch_data_pipeline_spark import registry
    spark = get_profiling_spark()
    spark.sparkContext.setLogLevel("WARN")
    qs = registry.queries()
    if args.query not in qs:
        sys.exit(f"unknown query {args.query!r}")

    # warm: parquet footers + python workers + codegen
    import pandas as pd  # noqa: F401
    spark.range(64).mapInPandas(lambda it: (pdf for pdf in it),
                                "id long").count()

    def one_run(tag):
        spark._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"{args.query}:{tag}")
        t0 = time.perf_counter()
        df = qs[args.query](spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        import gc
        gc.collect()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().valuesIterator()
        while it.hasNext():
            it.next().unpersist(False)
        return dt, df

    times = []
    jobs_before = 0
    for i in range(args.runs):
        if args.stages and i == args.runs - 1:
            jobs_before = len(rest(spark, "/jobs"))
        dt, df = one_run(str(i))
        times.append(dt)
        print(f"run {i}: {dt:.3f}s", file=sys.stderr)

    print(json.dumps({"query": args.query, "runs": [round(t, 3) for t in times],
                      "min": round(min(times), 3)}))

    if args.plan_out:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(args.plan_out, "w") as fh:
            fh.write(f"# {args.query} @ {args.sf_dir} "
                     f"(noop-drained, run min {min(times):.3f}s)\n")
            fh.write(plan)
        print(f"plan -> {args.plan_out}", file=sys.stderr)

    if args.stages:
        jobs = rest(spark, "/jobs")
        new_jobs = [j for j in jobs
                    if j["jobId"] >= jobs_before]
        new_jobs.sort(key=lambda j: j["jobId"])
        stage_info = {s["stageId"]: s for s in rest(spark, "/stages")}
        print("\n# last-run jobs (id, dur_s, desc):", file=sys.stderr)
        for j in new_jobs:
            t0 = j.get("submissionTime", "")
            t1 = j.get("completionTime", "")
            desc = (j.get("description") or j.get("name", ""))[:90]
            from datetime import datetime

            def p(ts):
                return datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f")
            dur = (p(t1) - p(t0)).total_seconds() if t0 and t1 else -1
            print(f"  job {j['jobId']:>4} {dur:7.3f}s  {desc}",
                  file=sys.stderr)
            for sid in sorted(j.get("stageIds", [])):
                s = stage_info.get(sid)
                if not s or s.get("status") == "SKIPPED":
                    continue
                print(f"      stage {sid:>4} {s.get('status','?'):>9} "
                      f"tasks={s.get('numCompleteTasks',0):>3} "
                      f"exec_ms={s.get('executorRunTime',0):>7} "
                      f"cpu_ms={int(s.get('executorCpuTime',0)/1e6):>7} "
                      f"shuf_r={s.get('shuffleReadBytes',0):>10} "
                      f"shuf_w={s.get('shuffleWriteBytes',0):>10} "
                      f"in={s.get('inputBytes',0):>11} "
                      f"{s.get('name','')[:60]}", file=sys.stderr)


if __name__ == "__main__":
    main()
