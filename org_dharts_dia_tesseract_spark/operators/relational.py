"""Relational operators Spark lacks natively, built scale-first.

`asof_join`: for each left row, the latest right row with
right.time <= left.time within the same key. Implemented with the
union + sort + last-non-null window trick: O((L+R) log(L+R)) per key
partition, ONE shuffle, no range fan-out — unlike the naive
join-then-argmax, whose intermediate is |L x R| per key. This is the
standard scale shape for as-of joins (time-series enrichment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, key: str,
              right_value_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Enrich `left` with the most recent `right` row per `key`.

    on: ordering column (numeric or timestamp; compared with <=).
    Ties on `on` resolve right-row-wins (a right row at exactly left.time
    is visible to it).
    """
    if right_value_cols is None:
        right_value_cols = [c for c in right.columns if c not in (on, key)]
    l_tag = (left
             .withColumn("__src", F.lit(1))
             .withColumn("__row", F.struct(*[F.col(c) for c in left.columns])))
    r_tag = right.select(
        F.col(key), F.col(on), F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__rval"))
    unified = (l_tag.select(key, on, "__src", "__row",
                            F.lit(None).cast(r_tag.schema["__rval"].dataType)
                            .alias("__rval"))
               .unionByName(r_tag.select(
                   key, on, "__src",
                   F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
                   "__rval")))
    # right rows (src=0) sort before left rows at equal `on` -> visible
    w = (Window.partitionBy(key).orderBy(on, "__src")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unified.withColumn("__last_r", F.last("__rval", ignorenulls=True).over(w))
    out = filled.where(F.col("__src") == 1)
    cols = [F.col("__row")[c].alias(c) for c in left.columns]
    cols += [F.col("__last_r")[c].alias(c + suffix) for c in right_value_cols]
    return out.select(*cols)
