#!/usr/bin/env python
"""Run a subset of the bench headliners with bench.py's EXACT timing
methodology (same session, warm-up, GC + unpersist discipline, drain)
— for A/B comparisons during optimization without a full bench run.

Usage: python tools/bench_subset.py q1 q2 ... [--runs N]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _drain  # noqa: E402
from s3_elasticsearch_data_pipeline_spark import registry  # noqa: E402
from s3_elasticsearch_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-subset")
    qs = registry.queries()
    for q in args.queries:
        if q not in qs:
            sys.exit(f"unknown query {q!r}")

    _drain(qs["a5_global_count"](spark, sf_dir))
    import pandas as pd  # noqa: F401
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()
    for warm in ("q5_local_supplier_volume", "w_sessionize", "dedup_exact"):
        _drain(qs[warm](spark, sf_dir))

    jsc = spark.sparkContext._jsc.sc()
    out = {}
    for name in args.queries:
        samples = []
        for _ in range(args.runs):
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            _drain(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            gc.collect()
            it = jsc.getPersistentRDDs().valuesIterator()
            while it.hasNext():
                it.next().unpersist(False)
        out[name] = round(min(samples), 3)
        print(f"# {name}: {out[name]:.3f}s  (all: "
              f"{[round(s, 3) for s in samples]})", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
