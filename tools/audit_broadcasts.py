#!/usr/bin/env python
"""Plan audit: flag BroadcastExchange nodes built over checkpoint-backed
RDD scans. localCheckpoint-backed frames report sizes that undershoot
the broadcast threshold, so Spark can pick a corpus-sized frame as a
hash-join build side (driver-serial relation build; driver OOM at real
scale) — the bug class fixed for ngram-Jaccard/containment (r5) and the
incremental-LSH index probe (r6). A broadcast over an RDD scan is not
automatically wrong (query sets and cluster tables are legitimately
small) — this tool surfaces each site for a human scale-judgment.

AQE note: executedPlan() is an AdaptiveSparkPlanExec LEAF — walking its
children sees nothing. The audit therefore parses the plan's printed
tree (which renders the full pre-AQE physical plan) and scopes each
BroadcastExchange's subtree by indentation. That inspects Spark's
STATS-DRIVEN initial decision, which is exactly where the undershoot
class lives; AQE can only re-plan at runtime from the same wrong stats.

Run: PYTHONPATH=/root/repo python tools/audit_broadcasts.py [names...]
Exit code: number of queries with findings or errors (0 = clean).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from s3_elasticsearch_data_pipeline_spark import registry  # noqa: E402
from s3_elasticsearch_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Non-headline surfaces worth auditing (index builds / apply steps).
EXTRA = ("dedup_fuzzy_apply", "dedup_semantic_apply",
         "dedup_embedding_blocked", "dedup_fuzzy_clusters",
         "dedup_incremental_semantic", "sim_margin_bitext",
         "corpus_domain_mixture")

_RDD_SCAN = re.compile(r"Scan ExistingRDD|RDDScan")


def _indent(line: str) -> int:
    """Tree depth of a plan line = width of the tree-drawing prefix
    (spaces, ':', '+', '-'). Anchoring to the prefix rather than the
    first LETTER keeps codegen-stage markers like '*(3) ' from
    inflating a sibling's apparent depth (which would leak the subtree
    scan past a BuildLeft broadcast into the streamed side); section
    headers like '== Initial Plan ==' read as depth 0 and end the scan
    conservatively."""
    return len(line) - len(line.lstrip(" :+-"))


def audit(spark, name: str) -> list[str]:
    df = registry.queries()[name](spark, SF)
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = _indent(line)
        for sub in lines[i + 1:]:
            if _indent(sub) <= d:
                break
            if _RDD_SCAN.search(sub):
                hits.append(line.strip())
                break
    return hits


def main(names) -> int:
    spark = get_spark()
    flagged, errors = 0, 0
    for name in names:
        try:
            hits = audit(spark, name)
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:100]}")
            errors += 1
            continue
        if hits:
            flagged += 1
            print(f"{name}: {len(hits)} broadcast(s) over RDD scans")
            for h in hits:
                print(f"    {h[:140]}")
    print(f"audited {len(names)} queries: {flagged} with RDD-scan "
          f"broadcasts, {errors} errors")
    return flagged + errors


if __name__ == "__main__":
    names = sys.argv[1:] or list(HEADLINE) + list(EXTRA)
    raise SystemExit(main(names))
