#!/usr/bin/env python
"""Whole-registry robustness audits (SCALING.md):

1. determinism — run every registry query twice in one session at
   sf0.01; canonicalized result sets must be identical.
2. partition invariance — re-run the full oracle comparison with
   spark.sql.shuffle.partitions=8 (vs the default 32): results must
   still hash-match DuckDB, proving physical layout can't leak into
   answers.

Run: python tools/audit_sweeps.py [determinism|invariance]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_elasticsearch_data_pipeline_spark import registry  # noqa: E402

SF = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")


def determinism() -> int:
    from s3_elasticsearch_data_pipeline_spark.session import get_spark
    from tests.oracle import spark_result
    spark = get_spark("audit-determinism")
    bad = 0
    for name, fn in sorted(registry.queries().items()):
        try:
            a = spark_result(fn(spark, SF))
            b = spark_result(fn(spark, SF))
            ok = a == b
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", flush=True)
            bad += 1
            continue
        if not ok:
            bad += 1
            print(f"{name}: NONDETERMINISTIC", flush=True)
    print(f"determinism: {len(registry.queries()) - bad}/"
          f"{len(registry.queries())} stable")
    return bad


def invariance() -> int:
    # at the default SF this doubles as the shuffle-partition
    # invariance audit; with AUDIT_SF_DIR=sf0.1 it is the 10x oracle
    # sweep (partitions stay at 8 — both knobs stress layout at once)
    os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "8"
    from s3_elasticsearch_data_pipeline_spark.session import get_spark
    from tests.oracle import compare, duckdb_conn
    spark = get_spark("audit-invariance")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
    con = duckdb_conn(SF)
    oracles = registry.oracle_sql()
    bad = 0
    for name, fn in sorted(registry.queries().items()):
        if name not in oracles:
            continue
        try:
            # AUDIT_STRICT=0 skips the pandas-dtype mirror (it re-runs
            # each DuckDB oracle a second time — prohibitive at sf0.1
            # where the quadratic twins dominate; values still compare)
            strict = os.environ.get("AUDIT_STRICT", "1") == "1"
            problems = compare(fn(spark, SF), con, oracles[name],
                               strict_dtypes=strict)
        except Exception as e:  # noqa: BLE001
            problems = [str(e)]
        if problems:
            bad += 1
            print(f"{name}: {problems}", flush=True)
    print(f"invariance: {len(oracles) - bad}/{len(oracles)} match at "
          "shuffle.partitions=8")
    return bad


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "determinism"
    sys.exit(1 if {"determinism": determinism,
                   "invariance": invariance}[which]() else 0)
