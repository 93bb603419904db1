#!/usr/bin/env python
"""3-point scaling curve for the ``text_repetition_scores`` 10×-smoke
tail (r9, VERDICT item 4): the r8 smoke measured it at 2.8× per 10×
data with no SCALING.md entry. The operator is per-row array algebra
(no explode, no shuffle), so its true work term is the per-document
fold cost Σ(n_distinct_bigrams × n_bigrams) — quadratic in document
length, linear in document count. Run 1×/3×/10× in ONE window,
measure wall AND that work unit (read off the query's own output
columns), and fit log-log exponents. Linear work growth with
wall-per-unit exponent ≤ 0 means the tail is the documented
sub-second-base noise floor, not a plan defect; a positive
wall-per-unit exponent would indict the code.

Run in a CLEAN window:

    PYTHONPATH=/root/repo python tools/bench_text_curve.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from bench_scale import BASE, _drain, replicate  # noqa: E402
from s3_elasticsearch_data_pipeline_spark import registry  # noqa: E402
from s3_elasticsearch_data_pipeline_spark.session import (  # noqa: E402
    get_spark)
from tools.bench_graph_curve import _fit_exponent  # noqa: E402

FAMILY = "text_repetition_scores"
SCALES = (1, 3, 10)
REPS = 3


def work_units(spark, qs, sf_dir: str) -> int:
    """Σ(n_distinct_bigrams × n_bigrams) over the same documents the
    timed query reads — the per-row fold's exact operation count."""
    row = (qs[FAMILY](spark, sf_dir)
           .agg(F.sum(F.col("n_distinct_bigrams").cast("long")
                      * F.col("n_bigrams")).alias("u")).collect()[0])
    return int(row["u"] or 0)


def main() -> None:
    spark = get_spark("bench-text-curve")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    qs = registry.queries()
    dirs, scratch = {1: BASE}, []
    for n in SCALES[1:]:
        d = tempfile.mkdtemp(prefix=f"textcurve-{n}x-")
        replicate(spark, d, n)
        dirs[n] = d
        scratch.append(d)
    try:
        units = {n: work_units(spark, qs, dirs[n]) for n in SCALES}
        for n in SCALES:              # warm (codegen etc.)
            _drain(qs[FAMILY](spark, dirs[n]))
        walls = {n: float("inf") for n in SCALES}
        for _ in range(REPS):         # interleaved best-of-REPS
            for n in SCALES:
                t0 = time.perf_counter()
                _drain(qs[FAMILY](spark, dirs[n]))
                walls[n] = min(walls[n], time.perf_counter() - t0)
        ws = [round(walls[n], 3) for n in SCALES]
        us = [units[n] for n in SCALES]
        for n, w, u in zip(SCALES, ws, us):
            print(json.dumps({"family": FAMILY, "scale": n,
                              "wall_sec": w, "work_units": u}),
                  flush=True)
        we, ue = _fit_exponent(SCALES, ws), _fit_exponent(SCALES, us)
        print(json.dumps({"metric": "text_family_scaling_exponents",
                          "family": FAMILY, "wall_exp": we,
                          "unit_exp": ue,
                          "wall_per_unit_exp": round(we - ue, 2)}),
              flush=True)
    finally:
        for d in scratch:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
