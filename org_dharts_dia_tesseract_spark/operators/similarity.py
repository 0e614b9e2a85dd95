"""Similarity search over embedding columns (array<float>).

Two paths, same results where they overlap:
- `brute_force_topk`: exact cosine top-k. The query set broadcasts; each
  partition scores its shard JVM-side (zip_with/aggregate — whole-stage
  codegen, no Python) and a rank window keeps k. At 100 TB the scan is
  embarrassingly parallel and the only shuffle carries q*k candidate rows.
- `lsh_topk`: random-hyperplane LSH. Hyperplane signs come from the
  portable md5 hash of (plane, dimension) so the planes are deterministic
  and identical across engines with no stored model. Vectors land in a
  bucket per signature; candidates are scored only within the query's
  bucket (optionally +Hamming-1 probes). Sub-linear candidate sets at
  scale; recall traded via n_planes/probes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """NULL for zero-norm inputs (ANSI mode would raise on divide-by-zero;
    a zero vector has no defined direction)."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     q_id_col: str = "q_id", q_emb_col: str = "q_emb") -> DataFrame:
    scored = (embeddings.crossJoin(F.broadcast(queries))
              .where(F.col(id_col) != F.col(q_id_col))
              .select(q_id_col, id_col,
                      cosine(F.col(q_emb_col), F.col(emb_col)).alias("cosine"))
              .where(F.col("cosine").isNotNull()))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= k))


def hyperplane_signature(emb_col: str, n_planes: int, dim: int) -> Column:
    """Deterministic random-hyperplane signature as a bit string.

    Plane p's weight for dimension d is +1/-1 by the parity of the
    portable hash of 'p:d' — no stored random state, reproducible on any
    engine. Sign of the dot product sets bit p."""
    bits = []
    for p in range(n_planes):
        terms = F.zip_with(
            F.col(emb_col),
            F.array(*[
                F.when(
                    F.conv(F.substring(F.md5(F.lit(f"{p}:{d}")), 1, 8), 16, 10)
                    .cast("bigint") % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
                for d in range(dim)]),
            lambda x, w: x.cast("double") * w)
        dot = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, dim: int | None = None,
             id_col: str = "vec_id", emb_col: str = "embedding",
             q_id_col: str = "q_id", q_emb_col: str = "q_emb") -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket.

    The bucket join replaces the cross join — at scale candidates shrink
    by ~2^n_planes while the signature computation stays a narrow map."""
    if dim is None:
        dim = len(embeddings.select(emb_col).first()[0])
    e = embeddings.withColumn("sig", hyperplane_signature(emb_col, n_planes, dim))
    q = queries.withColumn("sig", hyperplane_signature(q_emb_col, n_planes, dim))
    scored = (e.join(F.broadcast(q), "sig")
              .where(F.col(id_col) != F.col(q_id_col))
              .select(q_id_col, id_col,
                      cosine(F.col(q_emb_col), F.col(emb_col)).alias("cosine"))
              .where(F.col("cosine").isNotNull()))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= k))
