"""Continuous mirror of the driver's DuckDB correctness gate: every
SQL-expressible operator query must match its oracle at sf0.001 (fast;
the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from org_dharts_dia_tesseract_spark.queries import (duckdb_oracles,
                                                    spark_queries)
from parity import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(duckdb_oracles()))
def test_parity(spark, con, name):
    compare(spark_queries()[name](spark, SF), con, duckdb_oracles()[name], name)
