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


# -- IVF (inverted-file) index: the scale path past LSH -------------------
#
# Train k coarse centroids (Lloyd iterations, deterministic init = first k
# vectors by id), assign every vector to its nearest centroid ("inverted
# list"), then score queries only against the nprobe nearest lists. At
# 100 TB the assignment is a narrow map over a broadcast (k x dim) model,
# the index can be written partitioned BY list_id so a probe prunes
# partitions at the parquet scan, and nprobe/n_lists trades recall for a
# ~n_lists/nprobe reduction in scored candidates. nprobe == n_lists
# degenerates to exact brute force (used by the parity gate).

def _l2sq(emb: Column, centroid: list[float]) -> Column:
    carr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(emb, carr,
                   lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0), lambda acc, x: acc + x)


def _nearest_list(emb: Column, centroids: list[list[float]]) -> Column:
    """0-based id of the closest centroid; first-index tie-break."""
    dists = F.array(*[_l2sq(emb, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_centroids(embeddings: DataFrame, n_lists: int = 8,
                     n_iters: int = 3, id_col: str = "vec_id",
                     emb_col: str = "embedding") -> list[list[float]]:
    """Deterministic Lloyd k-means. Init = farthest-first traversal
    (k-center): seed 0 is the lowest-id vector, each next seed maximizes
    its distance to the chosen set (ties -> lowest id), so seeds spread
    across the data regardless of id layout. Each init step and each
    Lloyd iteration is one distributed pass; only the (n_lists x dim)
    model ever reaches the driver. Empty lists keep their previous
    centroid."""
    first = (embeddings.orderBy(id_col).limit(1).select(emb_col).collect())
    centroids = [[float(x) for x in first[0][0]]]
    while len(centroids) < n_lists:
        d_min = F.least(*[_l2sq(F.col(emb_col), c) for c in centroids]) \
            if len(centroids) > 1 else _l2sq(F.col(emb_col), centroids[0])
        far = (embeddings.select(F.col(id_col), F.col(emb_col),
                                 d_min.alias("_d"))
               .orderBy(F.col("_d").desc(), F.col(id_col))
               .limit(1).collect())
        centroids.append([float(x) for x in far[0][1]])
    for _ in range(n_iters):
        assigned = embeddings.select(
            _nearest_list(F.col(emb_col), centroids).alias("list_id"),
            F.col(emb_col).alias("_e"))
        means = (assigned
                 .select("list_id", F.posexplode("_e").alias("dim", "val"))
                 .groupBy("list_id", "dim")
                 .agg(F.avg(F.col("val").cast("double")).alias("m"))
                 .collect())
        new = [list(c) for c in centroids]
        for r in means:
            new[r["list_id"]][r["dim"]] = float(r["m"])
        centroids = new
    return centroids


def ivf_assign(embeddings: DataFrame, centroids: list[list[float]],
               emb_col: str = "embedding") -> DataFrame:
    """Build the inverted index: each vector tagged with its list_id.
    Persist with .write.partitionBy('list_id') so probes prune the scan."""
    return embeddings.withColumn(
        "list_id", _nearest_list(F.col(emb_col), centroids))


def _probe_lists(q_emb: Column, centroids: list[list[float]],
                 nprobe: int) -> Column:
    """Array of the nprobe nearest list ids for a query vector."""
    ranked = F.array(*[F.struct(_l2sq(q_emb, c).alias("d"),
                                F.lit(i).cast("int").alias("i"))
                       for i, c in enumerate(centroids)])
    return F.transform(F.slice(F.array_sort(ranked), 1, nprobe),
                       lambda s: s["i"])


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 8, nprobe: int = 2,
             centroids: list[list[float]] | None = None,
             id_col: str = "vec_id", emb_col: str = "embedding",
             q_id_col: str = "q_id", q_emb_col: str = "q_emb") -> DataFrame:
    """Approximate cosine top-k via IVF probing.

    The (q_id, list_id) probe set broadcasts; the index side joins on its
    partition column, so only nprobe/n_lists of the corpus is scored."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_lists=n_lists,
                                     id_col=id_col, emb_col=emb_col)
    index = ivf_assign(embeddings, centroids, emb_col)
    probes = queries.select(
        q_id_col, q_emb_col,
        F.explode(_probe_lists(F.col(q_emb_col), centroids, nprobe))
        .alias("list_id"))
    scored = (index.join(F.broadcast(probes), "list_id")
              .where(F.col(id_col) != F.col(q_id_col))
              .select(q_id_col, id_col,
                      cosine(F.col(q_emb_col), F.col(emb_col)).alias("cosine"))
              .where(F.col("cosine").isNotNull()))
    w = Window.partitionBy(q_id_col).orderBy(F.col("cosine").desc(),
                                             F.col(id_col))
    return (scored.withColumn("rk", F.row_number().over(w).cast("int"))
            .where(F.col("rk") <= k))
