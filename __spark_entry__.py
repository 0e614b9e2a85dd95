"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship OCR-span extraction at sf0.001 — derives the
  interleaved text+media corpus deterministically from the driver's
  documents table ids, renders pages distributed, runs the 3-stage
  extraction pipeline, returns the ordered span table.
- ``queries()`` / ``oracle_sql()``: operator registry with DuckDB parity
  oracles (org_dharts_dia_tesseract_spark.queries) plus rows-only entries
  for the non-SQL-expressible raster pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_PIPELINE_DOC_CAP = 400   # doc budget for per-query raster pipeline runs


def _interleaved_corpus(spark: SparkSession, sf_dir: str, cap: int):
    """Derive the interleaved documents+media tables from the driver's
    flat documents table (doc ids only; content is a pure function of id)."""
    from org_dharts_dia_tesseract_spark.sources import corpus_tables
    from org_dharts_dia_tesseract_spark.sources.tables import load_table
    n = load_table(spark, sf_dir, "documents").count()
    return corpus_tables(spark, min(n, cap))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from org_dharts_dia_tesseract_spark.operators import extract_spans
    docs, media = _interleaved_corpus(spark, _SMOKE_SF_DIR, 10_000)
    return extract_spans(docs, media)


def _ocr_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from org_dharts_dia_tesseract_spark.operators import extract_spans
    docs, media = _interleaved_corpus(spark, sf_dir, _PIPELINE_DOC_CAP)
    return extract_spans(docs, media)


def _ocr_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from org_dharts_dia_tesseract_spark.operators import analyze_documents
    docs, media = _interleaved_corpus(spark, sf_dir, _PIPELINE_DOC_CAP)
    return analyze_documents(docs, media)


def _ocr_layout_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """analyzeLayout mode: no classification (level counts per page)."""
    from org_dharts_dia_tesseract_spark.operators import analyze_documents
    docs, media = _interleaved_corpus(spark, sf_dir, _PIPELINE_DOC_CAP)
    h = analyze_documents(docs, media, recognize=False)
    return (h.groupBy("media_ref", "level")
            .count().withColumnRenamed("count", "n_nodes"))


def _ocr_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline: extract -> quality -> dedup -> keep decision."""
    from org_dharts_dia_tesseract_spark.operators.pipeline import \
        training_corpus
    docs, media = _interleaved_corpus(spark, sf_dir, _PIPELINE_DOC_CAP)
    return training_corpus(docs, media).drop("text")


def _ocr_annotated_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotated-raster sink (examples/BlockAnalysis.java:99 analog)."""
    from org_dharts_dia_tesseract_spark.operators import analyze_documents
    from org_dharts_dia_tesseract_spark.operators.annotate import \
        annotate_pages
    docs, media = _interleaved_corpus(spark, sf_dir, 100)
    h = analyze_documents(docs, media)
    return annotate_pages(h, media).select("media_ref", "width", "height",
                                           "n_boxes")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    from org_dharts_dia_tesseract_spark.queries import spark_queries
    out = dict(spark_queries())
    out["ocr_extract_spans"] = _ocr_extract_spans         # rows-only (raster)
    out["ocr_hierarchy"] = _ocr_hierarchy                 # rows-only (raster)
    out["ocr_layout_only"] = _ocr_layout_only             # rows-only (raster)
    out["ocr_training_corpus"] = _ocr_training_corpus     # rows-only (raster)
    out["ocr_annotated_pages"] = _ocr_annotated_pages     # rows-only (raster)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query; raster
    pipeline ops are omitted -> driver records rows-only checks."""
    from org_dharts_dia_tesseract_spark.queries import duckdb_oracles
    return dict(duckdb_oracles())
