#!/usr/bin/env python
"""Focused 10x scale smoke for the round-11-OPTIMIZED families: the
unigram encoder (new shared toks/words checkpoints — the corpus-sized
materialization is exactly what a 10x run must sanity-check), the two
training-set composites (inline split/shuffle assignment), and the PQ
search surface (byte-capped driver path). text_quality_scores rides
along as an untouched control for window drift. Reuses
bench_scale.py's replication and timing machinery verbatim so the
ratios are comparable to the full r9 smoke and the r10 subset.

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
    "text_unigram_encode",
    "corpus_training_set",
    "corpus_training_set_v2",
    "sim_topk_pq",
    "text_quality_scores",  # untouched control
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("bench_scale_r11_subset")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    scratch = tempfile.mkdtemp(prefix="sfx_scale_r11_")
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
