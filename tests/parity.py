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


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("<null>")
            elif isinstance(v, float):
                row.append(f"{v:.6g}")
            elif isinstance(v, (bool,)):
                row.append(str(bool(v)))
            elif hasattr(v, "item"):   # numpy scalar
                item = v.item()
                row.append(f"{item:.6g}" if isinstance(item, float) else str(item))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


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
