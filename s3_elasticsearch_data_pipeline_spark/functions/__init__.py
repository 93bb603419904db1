"""Scalar/array function packs shared by the extension operators.

- ``vector``  — dot / norm / cosine over ``array<float|double>`` columns
- ``textfns`` — tokenization, normalization, shingling, fingerprints

All are compositions of built-in ``pyspark.sql.functions`` (JVM-side,
codegen-friendly) — no Python UDFs.
"""
