"""Sinks (SURVEY.md §2.1 S8–S11).

- ``partitioned`` — hive-partitioned parquet append (S8)
- ``keyed``       — keyed idempotent serving-table writer (S10, the
  offline stand-in for the ES keyed-upsert sink)
- ``es``          — elasticsearch-hadoop connector config builder
  (gated: no live ES or connector jar in this environment)
"""
