"""Query lifecycles (SURVEY.md §3) as composable library functions.

- ``incremental`` — entry point A: month-level diff-and-load
- ``reconcile``   — entry point B: id-level reconciliation
- ``backfill``    — entry point C: partition backfill + describe
"""
