#!/usr/bin/env python
"""Focused 10x scale smoke for the round-10-OPTIMIZED families: the
margin miners (driver-resident cell-grouped probe scoring + threaded
side builds), the unigram trainer, and the media attach/decode path.
Reuses bench_scale.py's replication and timing machinery verbatim so
the ratios are comparable to the full r9 smoke.

Run AFTER the test suite / bench are idle — the ratios are wall-clock.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_scale  # noqa: E402
from s3_elasticsearch_data_pipeline_spark.session import get_spark  # noqa: E402

NAMES = (
    "sim_margin_bitext_ann",
    "sim_margin_bitext_mine",
    "text_unigram_train",
    "audio_decode_features",
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("bench_scale_r10_subset")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    scratch = tempfile.mkdtemp(prefix="sfx_scale_r10_")
    try:
        base = bench_scale.time_queries(spark, bench_scale.BASE,
                                        names=NAMES)
        bench_scale.replicate(spark, scratch, n)
        scaled = bench_scale.time_queries(spark, scratch, names=NAMES)
        out = {"n": n,
               "base": base, "scaled": scaled,
               "ratios": {k: round(scaled[k] / max(base[k], 1e-3), 2)
                          for k in base}}
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
