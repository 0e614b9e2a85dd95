"""Shared Spark-vs-DuckDB parity checker mimicking the driver's gate:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from org_dharts_dia_tesseract_spark.sources.tables import TESTDATA_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_val(v) -> str:
    import numpy as np
    if isinstance(v, (list, tuple, np.ndarray)):
        # The DRIVER's canonicalizer (pandas sort_values over all columns)
        # crashes on array cells ("unhashable type: 'list'"), so the local
        # mirror must go red on them too — no tolerance the driver lacks.
        # Gate queries must emit scalar columns only (explode arrays).
        raise TypeError(
            "unhashable type: 'list' — array-typed gate output; emit "
            "scalar columns (explode / hash the array) instead")
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(bool(v))
    if hasattr(v, "item"):   # numpy scalar
        item = v.item()
        return f"{item:.6g}" if isinstance(item, float) else str(item)
    return str(v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(tuple(_canon_val(v) for v in tup)
                  for tup in df.itertuples(index=False))


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    got = spark_df.toPandas()
    exp = con.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rowcount {len(got)} != {len(exp)}"
    cg, ce = _canon(got), _canon(exp)
    if cg != ce:
        diffs = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
