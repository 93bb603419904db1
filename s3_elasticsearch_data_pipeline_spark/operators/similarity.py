"""Similarity search over the embeddings table (M4 north star).

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; rank-and-filter window per query. The
  correctness baseline.
- ``ann_lsh_topk``     — random-hyperplane LSH bucketing: sign-bit
  sketch → candidates share a bucket → exact rerank within buckets.
  The 100 TB path: corpus is scanned once, shuffled only on compact
  bucket keys, and each query compares against its bucket's candidates
  instead of the whole corpus.

Hyperplanes are deterministic Rademacher (±1) vectors derived from
md5 at PLAN-BUILD time and embedded as array literals — ±1 hyperplanes
are a standard, provably adequate choice for sign-random-projection
LSH, and literal planes keep the per-row work to pure multiply-adds
(no per-row hashing), fully reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.functions.vector import cosine


def _rademacher_plane(plane_id: int, dims: int) -> list[float]:
    """Deterministic ±1 plane: bit d of md5("plane:<id>") bytestream."""
    bits: list[int] = []
    counter = 0
    while len(bits) < dims:
        digest = hashlib.md5(f"plane:{plane_id}:{counter}".encode()).digest()
        for byte in digest:
            for k in range(8):
                bits.append((byte >> k) & 1)
        counter += 1
    return [1.0 if b else -1.0 for b in bits[:dims]]


def brute_force_topk(embeddings: DataFrame, queries: DataFrame,
                     k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (vec_id, embedding) is broadcast — a broadcast
    nested-loop join, so the 100 TB corpus is scanned exactly once with
    no shuffle of the corpus side; the only shuffle is the window's
    partition-by-query ranking over scored candidates.
    """
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec"))
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("embedding").alias("cand_vec"))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("query_vec"), F.col("cand_vec"))
                      .alias("sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim", 6).alias("sim"), "rank"))


def ann_lsh_topk(embeddings: DataFrame, queries: DataFrame,
                 k: int = 10, num_planes: int = 4,
                 num_tables: int = 8) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent sign-sketches (bit
    offsets stagger the planes); query and candidate must collide in at
    least one table. Exact cosine rerank within collisions.

    Approximation is inherent (recall < 1 by design) → no SQL oracle;
    the driver's rows-only check applies, and tests measure recall
    against ``brute_force_topk``.
    """
    # Probe the dimensionality once (plan-build time) so the planes can
    # be embedded as literals.
    dims = len(embeddings.select("embedding").first()[0])

    # Per-table sketches; each table uses its own plane set (the plane
    # index is offset by table so sketches are independent).
    def with_buckets(df, id_alias, vec_alias):
        out = df.select(F.col("vec_id").alias(id_alias),
                        F.col("embedding").cast("array<double>")
                        .alias(vec_alias))
        entries = []
        for t in range(num_tables):
            bucket = F.lit(0).cast("long")
            vec = F.col(vec_alias)
            for p in range(num_planes):
                plane = F.array(*[
                    F.lit(s) for s in
                    _rademacher_plane(t * num_planes + p, dims)])
                proj = F.aggregate(
                    F.zip_with(vec, plane, lambda x, s: x * s),
                    F.lit(0.0), lambda acc, x: acc + x)
                bit = (F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))
                       .cast("long"))
                bucket = bucket + F.shiftleft(bit, p)
            entries.append(F.struct(F.lit(t).alias("tbl"),
                                    bucket.alias("bucket")))
        return (out.select(id_alias, vec_alias,
                           F.explode(F.array(*entries)).alias("e"))
                .select(id_alias, vec_alias, "e.tbl", "e.bucket"))

    cand = with_buckets(embeddings, "neighbor_id", "cand_vec")
    qry = with_buckets(queries, "query_id", "query_vec")
    matched = (cand.join(F.broadcast(qry), ["tbl", "bucket"])
               .where(F.col("neighbor_id") != F.col("query_id"))
               .select("query_id", "neighbor_id", "query_vec", "cand_vec")
               .distinct())
    scored = matched.select(
        "query_id", "neighbor_id",
        cosine(F.col("query_vec"), F.col("cand_vec")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("sim", 6).alias("sim"), "rank"))
