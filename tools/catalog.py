#!/usr/bin/env python
"""Generate QUERIES.md — the audited inventory of every registry query:
name, check kind (DuckDB oracle vs rows-only), and the first docstring
line. Run: python tools/catalog.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_elasticsearch_data_pipeline_spark import registry  # noqa: E402

GROUPS = (
    ("Reference parity — scans/sinks (S)", ("s8_", "s10_", "s12_", "source_",
                                            "describe_", "sql_over")),
    ("Reference parity — projections/filters (P)", ("p1_", "p3_", "p5_")),
    ("Reference parity — aggregates (A)", ("a1_", "a4_", "a5_")),
    ("Reference parity — diff joins (J)", ("j1_", "j2_", "j3_", "j4_")),
    ("Sorts / limits (O)", ("o3_",)),
    ("TPC-H archetypes", ("q1_", "q2_", "q3_", "q4_", "q5_", "q6_", "q7_",
                          "q8_", "q9_", "q10_", "q11_", "q12_", "q13_",
                          "q14_", "q15_", "q16_", "q17_", "q18_", "q19_",
                          "q20_", "q21_", "q22_")),
    ("Aggregates & stats", ("agg_", "outlier_", "profile_",
                            "deterministic_sample", "stratified_")),
    ("Window functions", ("w_", "funnel_", "retention_")),
    ("Set operations", ("setop_",)),
    ("Scalar function packs", ("string_", "math_", "date_", "array_",
                               "map_", "json_", "conditional_")),
    ("Joins — temporal/range/skew", ("asof_", "range_", "salted_",
                                     "bucketed_")),
    ("Dedup & corpus curation", ("dedup_", "corpus_", "contamination_",
                                 "text_pii", "text_finger", "text_rolling",
                                 "dataset_split", "pack_sequences")),
    ("Text analysis & search", ("text_", "vocab_")),
    ("Similarity & embeddings", ("sim_", "embedding_")),
    ("Multimodal", ("multimodal_",)),
    ("Graph", ("graph_",)),
    ("Streaming", ("stream_",)),
    ("CDC / quality / layout / ML-prep", ("cdc_", "dq_", "layout_",
                                          "feature_", "impute_",
                                          "timeseries_", "reshape_",
                                          "scd2_")),
    ("UDF extension points", ("udf_",)),
)


def main() -> None:
    qs = registry.queries()
    oracles = registry.oracle_sql()
    seen = set()
    print("# QUERIES — registry inventory "
          f"({len(qs)} queries, {len(oracles)} oracle-checked)\n")
    print("Check legend: **oracle** = DuckDB runs the ANSI-SQL twin on the "
          "same parquet, driver compares row count + schema + value hash; "
          "**rows-only** = engine-specific result (sketches, ANN, binary "
          "plumbing) with pytest recall/equivalence coverage instead.\n")
    for title, prefixes in GROUPS:
        rows = [n for n in sorted(qs)
                if n.startswith(prefixes) and n not in seen]
        if not rows:
            continue
        seen.update(rows)
        print(f"## {title}\n")
        print("| query | check | summary |")
        print("|---|---|---|")
        for n in rows:
            doc = (qs[n].__doc__ or "").strip().splitlines()
            first = doc[0].strip() if doc else ""
            kind = "oracle" if n in oracles else "rows-only"
            print(f"| `{n}` | {kind} | {first} |")
        print()
    rest = [n for n in sorted(qs) if n not in seen]
    if rest:
        print("## Other\n")
        print("| query | check | summary |")
        print("|---|---|---|")
        for n in rest:
            doc = (qs[n].__doc__ or "").strip().splitlines()
            first = doc[0].strip() if doc else ""
            kind = "oracle" if n in oracles else "rows-only"
            print(f"| `{n}` | {kind} | {first} |")
        print()


if __name__ == "__main__":
    main()
