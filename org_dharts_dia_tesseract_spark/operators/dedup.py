"""Deduplication operators over any corpus DataFrame (reusable API; the
parity-checked flat-table versions live in queries.py).

Scale shapes:
- exact: one shuffle on the content hash, map-side combinable.
- minhash_lsh: shingle explode -> per-permutation min-agg -> band keys ->
  self-join per band bucket. Fan-out is bounded by bucket size, never by
  corpus size; the portable md5-derived hash keeps signatures
  deterministic across engines and runs.
- simhash: one explode over 32 bit positions, two aggregations; near-dup
  candidates = equal fingerprints (or Hamming<=d via band rotation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (lowest id wins); adds n_copies."""
    w = Window.partitionBy("__h").orderBy(id_col)
    return (df.withColumn("__h", F.md5(F.col(text_col)))
            .withColumn("__rk", F.row_number().over(w))
            .withColumn("n_copies", F.count("*").over(Window.partitionBy("__h")))
            .where(F.col("__rk") == 1)
            .drop("__h", "__rk"))


def _word_shingles(df: DataFrame, text_col: str, id_col: str,
                   n: int = 3) -> DataFrame:
    # higher-order array fns keep shingling a narrow map — the window-lead
    # formulation would shuffle every word in the corpus first
    parts = ", ".join(f"__ws[i+{k}]" for k in range(n))
    return (df.withColumn("__ws", F.filter(F.split(F.col(text_col), r"\s+"),
                                           lambda w: w != ""))
            .select(id_col, F.explode(F.expr(
                f"CASE WHEN size(__ws) >= {n} THEN "
                f"transform(sequence(0, size(__ws) - {n}), "
                f"i -> concat_ws(' ', {parts})) "
                "ELSE array() END")).alias("shingle")))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    sh = _word_shingles(df, text_col, id_col, shingle_n)
    aggs = [F.min(_h32(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
            .alias(f"mh{i}") for i in range(n_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n_hashes: int = 8,
                           bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n_hashes)
    band_frames = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_frames.append(sig.select(
            F.col(id_col),
            F.md5(F.concat_ws("_", F.lit(b), *cols)).alias("band_key")))
    all_bands = band_frames[0]
    for bf in band_frames[1:]:
        all_bands = all_bands.unionByName(bf)
    a, b = all_bands.alias("a"), all_bands.alias("b")
    return (a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def minhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n_hashes: int = 8,
                  bands: int = 4) -> DataFrame:
    """Drop the higher-id member of every candidate pair (transitively
    safe: survivors are rows that are nobody's id_b)."""
    cand = minhash_lsh_candidates(df, text_col, id_col, n_hashes, bands)
    losers = cand.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Single groupBy with 32 vote-sum columns: map-side combinable, one
    shuffle, no 32x bit-explode of the word stream."""
    wh = (df.select(id_col,
                    F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
          .where(F.col("w") != "")
          .select(id_col, _h32(F.col("w")).alias("h")))
    votes = [F.sum(F.when(F.expr(f"shiftright(h, {j}) % 2") == 1, 1)
                   .otherwise(-1)).alias(f"s{j}") for j in range(32)]
    sums = wh.groupBy(id_col).agg(*votes)
    fp = None
    for j in range(32):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
        fp = term if fp is None else fp + term
    return sums.select(id_col, fp.cast("bigint").alias("simhash"))


def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", block_col: str | None = None,
                  threshold: float = 0.8) -> DataFrame:
    """Word-set Jaccard >= threshold within blocks (pass an LSH band or
    any cheap blocking key as block_col to bound the self-join)."""
    words = (df.select(id_col,
                       *( [block_col] if block_col else [] ),
                       F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
             .where(F.col("w") != "").distinct())
    sizes = words.groupBy(id_col).agg(F.count("*").cast("bigint").alias("n"))
    blocks = words.join(sizes, id_col)
    join_cond = [F.col("a.w") == F.col("b.w"),
                 F.col(f"a.{id_col}") < F.col(f"b.{id_col}")]
    if block_col:
        join_cond.append(F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (a.join(b, join_cond[0] & join_cond[1]
                    if len(join_cond) == 2
                    else join_cond[0] & join_cond[1] & join_cond[2])
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count("*").cast("bigint").alias("common"),
                  F.min("a.n").alias("na"), F.min("b.n").alias("nb")))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (pairs.where(jac >= threshold)
            .select("id_a", "id_b", F.round(jac, 4).alias("jaccard")))
