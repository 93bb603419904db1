#!/usr/bin/env python
"""Plan audit: flag BroadcastExchange nodes built over checkpoint-backed
RDD scans. localCheckpoint-backed frames report sizes that undershoot
the broadcast threshold, so Spark can pick a corpus-sized frame as a
hash-join build side (driver-serial relation build; driver OOM at real
scale) — the bug class fixed for ngram-Jaccard/containment (r5) and the
incremental-LSH index probe (r6). A broadcast over an RDD scan is not
automatically wrong (query sets and cluster tables are legitimately
small) — this tool surfaces each site for a human scale-judgment.

Run: PYTHONPATH=/root/repo python tools/audit_broadcasts.py [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from s3_elasticsearch_data_pipeline_spark import registry  # noqa: E402
from s3_elasticsearch_data_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Non-headline surfaces worth auditing (index builds / apply steps).
EXTRA = ("dedup_fuzzy_apply", "dedup_semantic_apply",
         "dedup_embedding_blocked", "dedup_fuzzy_clusters")


def _walk(node, depth=0):
    yield node, depth
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i), depth + 1)


def _subtree_has_rdd_scan(node) -> bool:
    return any("RDDScan" in n.nodeName() or "ExistingRDD" in n.nodeName()
               for n, _ in _walk(node))


def audit(spark, name: str) -> list[str]:
    df = registry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan()
    hits = []
    for node, _ in _walk(plan):
        if "BroadcastExchange" in node.nodeName() \
                and _subtree_has_rdd_scan(node):
            hits.append(node.simpleStringWithNodeId())
    return hits


def main(names) -> int:
    spark = get_spark()
    bad = 0
    for name in names:
        try:
            hits = audit(spark, name)
        except Exception as ex:  # noqa: BLE001 — report, keep auditing
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:100]}")
            bad += 1
            continue
        if hits:
            bad += 1
            print(f"{name}: {len(hits)} broadcast(s) over RDD scans")
            for h in hits:
                print(f"    {h[:140]}")
    print(f"audited {len(names)} queries, {bad} with RDD-scan broadcasts")
    return 0


if __name__ == "__main__":
    names = sys.argv[1:] or list(HEADLINE) + list(EXTRA)
    raise SystemExit(main(names))
