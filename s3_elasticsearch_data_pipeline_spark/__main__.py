"""CLI — one subcommand per reference entry point, so a reference user
can switch script-for-script:

    reference script              →  this CLI
    data-s3-elastic-transfer.py   →  incremental  (month-diff load)
    ID-based-transfer.py          →  reconcile    (id-level repair)
    Partition-script.py           →  backfill     (partitioned rewrite)
    Debug.py                      →  describe     (schema/sample peek)
    (no reference equivalent)     →  rollup, compact, bench-query

Sources/sinks are parquet paths (S3A URIs work unchanged on a cluster
with the hadoop-aws jars; Elasticsearch via the es-hadoop connector
options in sinks/es.py).

Usage examples:
    python -m s3_elasticsearch_data_pipeline_spark describe --path data.parquet
    python -m s3_elasticsearch_data_pipeline_spark incremental \
        --source events.parquet --sink serving --key month --id id
    python -m s3_elasticsearch_data_pipeline_spark reconcile \
        --source events.parquet --sink serving
    python -m s3_elasticsearch_data_pipeline_spark backfill \
        --source monolith.parquet --out layout --partition month
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from s3_elasticsearch_data_pipeline_spark.session import get_spark
    return get_spark("cli")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="s3_elasticsearch_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("incremental", help="month-diff load (entry point A)")
    pi.add_argument("--source", required=True)
    pi.add_argument("--sink", required=True)
    pi.add_argument("--key", default="month")
    pi.add_argument("--id", dest="id_col", default="id")

    pr = sub.add_parser("reconcile", help="id-level repair (entry point B)")
    pr.add_argument("--source", required=True)
    pr.add_argument("--sink", default=None,
                    help="parquet serving table (offline mode)")
    pr.add_argument("--es-url", default=None,
                    help="reconcile against a live index over the wire "
                         "instead of a parquet sink")
    pr.add_argument("--index", default=None)
    pr.add_argument("--key", default="month")
    pr.add_argument("--id", dest="id_col", default="id")

    pb = sub.add_parser("backfill", help="partitioned rewrite (entry point C)")
    pb.add_argument("--source", required=True)
    pb.add_argument("--out", required=True)
    pb.add_argument("--partition", default="month")
    pb.add_argument("--only", default=None)

    pd = sub.add_parser("describe", help="schema/sample peek (Debug.py)")
    pd.add_argument("--path", required=True)

    pq = sub.add_parser("query", help="run a registry query by name")
    pq.add_argument("--name", required=True)
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--limit", type=int, default=20)

    pu = sub.add_parser("rollup", help="maintain the continuous aggregate")
    pu.add_argument("--source", required=True)
    pu.add_argument("--rollup", required=True)
    pu.add_argument("--key", default="month")
    pu.add_argument("--dim", default="event_type")
    pu.add_argument("--value", default="value")

    pc = sub.add_parser("compact", help="bin-pack small files per partition")
    pc.add_argument("--path", required=True)
    pc.add_argument("--key", default="month")
    pc.add_argument("--target-mb", type=int, default=128)
    pc.add_argument("--max-avg-mb", type=float, default=32.0,
                    help="compact partitions averaging under this MB/file")

    pdq = sub.add_parser(
        "dq", help="run the data-quality expectation suite (exit 1 on fail)")
    pdq.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    pt = sub.add_parser(
        "transfer", help="bulk-index a parquet source into Elasticsearch "
                         "over the _bulk wire (the reference's actual job)")
    pt.add_argument("--source", required=True)
    pt.add_argument("--es-url", required=True)
    pt.add_argument("--index", required=True)
    pt.add_argument("--id", dest="id_col", default="id",
                    help="keyed _id column ('' for server-assigned ids)")
    pt.add_argument("--batch-size", type=int, default=50_000)
    pt.add_argument("--checkpoint", default=None,
                    help="enable incremental streaming mode with this "
                         "checkpoint dir (only new files are sent)")
    pt.add_argument("--optimize-for-bulk", action="store_true",
                    help="PUT replicas=0/refresh=30s on the index for "
                         "the duration of the load, restoring prior "
                         "settings after (the reference's pre-load "
                         "tuning; batch mode only)")
    pt.add_argument("--create-index", action="store_true",
                    help="PUT /{index} with field mappings derived "
                         "from the parquet schema before loading (no-op "
                         "if the index already exists — ES mappings are "
                         "immutable on a live index)")

    args = p.parse_args(argv)
    spark = _spark()

    if args.cmd == "incremental":
        from s3_elasticsearch_data_pipeline_spark.plans.incremental import (
            incremental_load)
        rep = incremental_load(spark, spark.read.parquet(args.source),
                               args.sink, key=args.key, id_col=args.id_col)
        print(json.dumps({"partitions_loaded": rep.partitions_loaded,
                          "rows_loaded": rep.rows_loaded}))
    elif args.cmd == "reconcile":
        src = spark.read.parquet(args.source)
        if args.es_url:
            from s3_elasticsearch_data_pipeline_spark.plans.reconcile import (
                reconcile_wire)
            rep = reconcile_wire(spark, src, args.es_url,
                                 args.index or "serving",
                                 key=args.key, id_col=args.id_col)
        else:
            if not args.sink:
                p.error("reconcile requires --sink or --es-url")
            from s3_elasticsearch_data_pipeline_spark.plans.reconcile import (
                reconcile)
            rep = reconcile(spark, src, args.sink,
                            key=args.key, id_col=args.id_col)
        print(json.dumps(rep.__dict__, default=str))
    elif args.cmd == "backfill":
        from s3_elasticsearch_data_pipeline_spark.plans.backfill import (
            backfill_partition)
        rep = backfill_partition(spark, spark.read.parquet(args.source),
                                 args.out, partition_col=args.partition,
                                 only_value=args.only)
        print(json.dumps(rep.__dict__, default=str))
    elif args.cmd == "describe":
        from s3_elasticsearch_data_pipeline_spark.plans.backfill import describe
        print(json.dumps(describe(spark.read.parquet(args.path)),
                         default=str))
    elif args.cmd == "query":
        from s3_elasticsearch_data_pipeline_spark import registry
        df = registry.queries()[args.name](spark, args.sf_dir)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "rollup":
        from s3_elasticsearch_data_pipeline_spark.plans.rollup import (
            maintain_rollup)
        added = maintain_rollup(spark, spark.read.parquet(args.source),
                                args.rollup, partition_key=args.key,
                                dim=args.dim, value_col=args.value)
        print(json.dumps({"partitions_added": added}, default=str))
    elif args.cmd == "compact":
        from pyspark.sql import functions as F
        from s3_elasticsearch_data_pipeline_spark.maintenance import (
            compact_partitions, partition_file_stats)
        stats = partition_file_stats(spark, args.path, args.key)
        todo = [r[0] for r in stats.where(
            (F.col("bytes") / F.col("n_files"))
            < args.max_avg_mb * 1024 * 1024).collect()]
        if todo:
            compact_partitions(spark, args.path, todo, args.key,
                               target_bytes=args.target_mb * 1024 * 1024)
        print(json.dumps({"partitions_compacted": sorted(map(str, todo))}))
    elif args.cmd == "transfer":
        id_col = args.id_col or None
        if args.checkpoint and args.optimize_for_bulk:
            # fail loudly rather than silently skip the tuning the
            # operator asked for: per-epoch settings churn is wrong for
            # a long-lived stream, so the flag is batch-only by design
            print(json.dumps({"error": "--optimize-for-bulk applies to "
                                       "batch mode only (tune the index "
                                       "once around the whole streaming "
                                       "campaign instead)"}))
            return 2
        if args.checkpoint:
            from s3_elasticsearch_data_pipeline_spark.streaming.incremental_stream import (
                incremental_stream_to_es)
            if args.create_index:  # fresh cluster before the campaign
                from s3_elasticsearch_data_pipeline_spark.sinks.es_wire \
                    import create_index
                create_index(args.es_url, args.index,
                             spark.read.parquet(args.source).schema)
            try:
                reports = incremental_stream_to_es(
                    spark, args.source, args.es_url, args.index,
                    args.checkpoint, id_col=id_col,
                    batch_size=args.batch_size)
            except Exception as exc:  # failed epoch: not committed,
                print(json.dumps({"error": str(exc)[:500]}))  # retryable
                return 1
            print(json.dumps([r.__dict__ for r in reports], default=str))
            return 0 if not any(r.batches_failed for r in reports) else 1
        else:
            from s3_elasticsearch_data_pipeline_spark.sinks.es_wire import (
                create_index, write_df)
            src = spark.read.parquet(args.source)
            created = None
            if args.create_index:
                created = create_index(args.es_url, args.index,
                                       src.schema)
            rep = write_df(src, args.es_url,
                           args.index, id_col=id_col,
                           batch_size=args.batch_size,
                           optimize_for_bulk=args.optimize_for_bulk)
            out = dict(rep.__dict__)
            if args.create_index:
                out["index_created"] = created
            print(json.dumps(out, default=str))
            return 0 if rep.batches_failed == 0 else 1
    elif args.cmd == "dq":
        from s3_elasticsearch_data_pipeline_spark.operators.expectations import (
            dq_expectations)
        from s3_elasticsearch_data_pipeline_spark.tables import load_table
        rows = dq_expectations(
            load_table(spark, args.sf_dir, "orders"),
            load_table(spark, args.sf_dir, "customer"),
            load_table(spark, args.sf_dir, "lineitem"),
            load_table(spark, args.sf_dir, "events")).collect()
        for r in rows:
            print(json.dumps(r.asDict()))
        return 0 if all(r["passed"] for r in rows) else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
