"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the documents<->spans<->media joins repeat across every
pipeline run; bucketing both sides on the join key at write time
pre-pays the shuffle once. Spark's bucketed scan then satisfies the
join's distribution requirement directly — tests assert the join plan
contains NO shuffle Exchange.

(Iceberg would express the same via a bucket partition transform; this
uses the built-in saveAsTable bucketing since the sandbox has no Iceberg
runtime — same physical property.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                  path: str | None = None) -> None:
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, key).sortBy(key)
         .format("parquet"))
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (no shuffle)."""
    return spark.table(left_table).join(spark.table(right_table), key)
