#!/usr/bin/env python
"""3-point scaling curve for the two graph-family 10×-smoke tails
(r8, VERDICT item 6): ``graph_pagerank_trade`` and
``market_basket_lift`` were triaged as densification-by-construction
(``bench_scale.KEYED`` shifts customer/order keys per replica but NOT
supplier/part keys, so node degrees grow with N instead of the graph
splitting). This makes it data: run 1×/3×/10× in ONE window, measure
wall AND the family's work unit (pagerank: distinct trade edges;
basket: per-order co-occurrence pair instances), and fit log-log
exponents. Densifying families should show pair GROWTH up to
super-linear but wall LINEAR PER PAIR — a rising wall-per-pair
exponent (wall_exp − pair_exp ≫ 0) would falsify the triage.

Run in a CLEAN window:

    PYTHONPATH=/root/repo python tools/bench_graph_curve.py

Prints one JSON line per (family, N) and a final summary with fitted
exponents. Walls are best-of-3 interleaved across scales so a noise
burst cannot inflate one scale's whole sample.
"""

from __future__ import annotations

import json
import math
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

FAMILIES = ("graph_pagerank_trade", "market_basket_lift")
SCALES = (1, 3, 10)
REPS = 3


def work_units(spark, sf_dir: str) -> dict[str, int]:
    """The per-family work term, measured on the same data the timed
    query reads: pagerank = |distinct (cust, supp) trade pairs| (the
    undirected edge count is exactly 2× this); basket = |(order,
    part<part) co-occurrence instances| (the self-join's output rows,
    the quadratic-in-basket term everything downstream aggregates)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pr = (orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
          .select("o_custkey", "l_suppkey").distinct().count())
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a, b = baskets.alias("a"), baskets.alias("b")
    mb = (a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
          .where(F.col("a.l_partkey") < F.col("b.l_partkey")).count())
    return {"graph_pagerank_trade": pr, "market_basket_lift": mb}


def _fit_exponent(xs, ys) -> float:
    """Least-squares slope of log(y) on log(x)."""
    lx = [math.log(x) for x in xs]
    ly = [math.log(y) for y in ys]
    mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return round(num / den, 2)


def main() -> None:
    spark = get_spark("bench-graph-curve")
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    qs = registry.queries()
    dirs, scratch = {1: BASE}, []
    for n in SCALES[1:]:
        d = tempfile.mkdtemp(prefix=f"graphcurve-{n}x-")
        replicate(spark, d, n)
        dirs[n] = d
        scratch.append(d)
    try:
        units = {n: work_units(spark, dirs[n]) for n in SCALES}
        for fam in FAMILIES:          # warm (codegen etc.)
            for n in SCALES:
                _drain(qs[fam](spark, dirs[n]))
        walls = {fam: {n: float("inf") for n in SCALES}
                 for fam in FAMILIES}
        for _ in range(REPS):         # interleaved best-of-REPS
            for fam in FAMILIES:
                for n in SCALES:
                    t0 = time.perf_counter()
                    _drain(qs[fam](spark, dirs[n]))
                    walls[fam][n] = min(walls[fam][n],
                                        time.perf_counter() - t0)
        summary = {}
        for fam in FAMILIES:
            ws = [round(walls[fam][n], 3) for n in SCALES]
            us = [units[n][fam] for n in SCALES]
            for n, w, u in zip(SCALES, ws, us):
                print(json.dumps({"family": fam, "scale": n,
                                  "wall_sec": w, "work_units": u}),
                      flush=True)
            we = _fit_exponent(SCALES, ws)
            ue = _fit_exponent(SCALES, us)
            summary[fam] = {"wall_exp": we, "unit_exp": ue,
                            "wall_per_unit_exp": round(we - ue, 2)}
        print(json.dumps({"metric": "graph_family_scaling_exponents",
                          **summary}), flush=True)
    finally:
        for d in scratch:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
