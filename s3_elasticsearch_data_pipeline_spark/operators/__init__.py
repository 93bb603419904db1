"""Operator library — each module is a family from SURVEY.md §2.

- ``projection`` — typed/schema-tolerant projections, validation (P1–P6)
- ``diff``       — the diff-and-load joins (J1–J4): the heart of the pipeline
- ``analytics``  — aggregates + headline analytical queries (A1–A5 + M4)
- ``windows``    — window functions, sessionization, top-k per group
- ``dedup``      — exact + MinHash-LSH + SimHash + n-gram-Jaccard + embedding dedup
- ``similarity`` — brute-force and LSH-bucketed cosine top-k
- ``text``       — language-ID, quality scoring, token counting, fingerprinting
- ``multimodal`` — binary-column plumbing with stubbed decode UDFs
"""
