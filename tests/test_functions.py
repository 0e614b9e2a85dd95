"""Unit tests: box column functions + config registry (Spark-light)."""

from __future__ import annotations

import pytest

from org_dharts_dia_tesseract_spark.errors import InvalidParameterError
from org_dharts_dia_tesseract_spark.functions.config import (
    ConfigRegistry, parse_language_spec, read_config_preset)


def test_box_functions(spark):
    from pyspark.sql import functions as F

    from org_dharts_dia_tesseract_spark.functions.boxes import (
        box_area, box_contains, box_intersection, box_intersects,
        box_union, box_union_agg)
    df = spark.createDataFrame(
        [(1, (0, 0, 10, 10), (2, 2, 5, 5)),
         (2, (0, 0, 4, 4), (4, 0, 8, 4)),      # touching edges: disjoint
         (3, (0, 0, 4, 4), (3, 3, 8, 8))],
        "id int, a struct<left:int,top:int,right:int,bottom:int>, "
        "b struct<left:int,top:int,right:int,bottom:int>")
    out = df.select(
        "id",
        box_contains(F.col("a"), F.col("b")).alias("contains"),
        box_intersects(F.col("a"), F.col("b")).alias("intersects"),
        box_intersection(F.col("a"), F.col("b")).alias("inter"),
        box_area(F.col("a")).alias("area")).collect()
    r = {row["id"]: row for row in out}
    assert r[1]["contains"] and r[1]["intersects"]
    assert r[1]["inter"].asDict() == {"left": 2, "top": 2, "right": 5, "bottom": 5}
    assert not r[2]["intersects"] and r[2]["inter"] is None
    assert r[3]["intersects"] and not r[3]["contains"]
    assert r[3]["inter"].asDict() == {"left": 3, "top": 3, "right": 4, "bottom": 4}
    assert r[1]["area"] == 100
    u = df.agg(box_union_agg(F.col("b")).alias("u")).collect()[0]["u"]
    pu = {row["id"]: row["pu"] for row in df.select(
        "id", box_union(F.col("a"), F.col("b")).alias("pu")).collect()}
    assert pu[2].asDict() == {"left": 0, "top": 0, "right": 8, "bottom": 4}
    assert u.asDict() == {"left": 2, "top": 0, "right": 8, "bottom": 8}


def test_config_registry_typed_access():
    reg = ConfigRegistry()
    reg.set("source_resolution", 300)
    assert reg.get("source_resolution", int) == 300
    reg.set("tessedit_create_hocr", "1")       # native bool protocol
    assert reg.get("tessedit_create_hocr", bool) is True
    reg.set("tessedit_zero_rejection", "F")
    assert reg.get("tessedit_zero_rejection", bool) is False
    with pytest.raises(InvalidParameterError):
        reg.set("no_such_variable", 1)         # unknown name throws
    with pytest.raises(InvalidParameterError):
        reg.get("no_such_variable")
    with pytest.raises(InvalidParameterError):
        reg.set("source_resolution", -10)      # ppi<0 throws (:514-517)
    with pytest.raises(InvalidParameterError):
        reg.set("tessedit_create_hocr", "yes")  # bad bool encoding (:68-80)
    with pytest.raises(InvalidParameterError):
        reg.get("source_resolution", bool)     # wrong-type get
    with pytest.raises(InvalidParameterError):
        reg.set("tessedit_pageseg_mode", "NOT_A_MODE")


def test_config_presets():
    digits = read_config_preset("digits")
    assert digits["tessedit_char_whitelist"] == "0123456789-."
    assert digits["tessedit_zero_rejection"] is True
    hocr = read_config_preset("hocr")
    assert hocr["tessedit_create_hocr"] is True
    with pytest.raises(InvalidParameterError):
        read_config_preset("nope")


def test_language_spec_algebra():
    avail = {"eng", "hin", "deu"}
    inc, exc = parse_language_spec("hin+eng", avail)
    assert inc == {"hin", "eng"} and exc == set()
    inc, exc = parse_language_spec("hin+~eng", avail)
    assert inc == {"hin"} and exc == {"eng"}
    with pytest.raises(InvalidParameterError):
        parse_language_spec("fra", avail)


def test_udaf_percentile_matches_native(spark):
    """Grouped-agg pandas UDAF == built-in percentile(0.9) exactly (both
    linear interpolation)."""
    from pyspark.sql import functions as F

    from org_dharts_dia_tesseract_spark.functions.udxf import \
        percentile90_udaf
    from org_dharts_dia_tesseract_spark.sources.tables import load_table
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    p90 = percentile90_udaf()
    a = o.groupBy("o_custkey").agg(p90("o_totalprice").alias("p90u"))
    b = o.groupBy("o_custkey").agg(
        F.expr("percentile(o_totalprice, 0.9)").alias("p90n"))
    assert a.count() > 0
    assert a.join(b, "o_custkey").where(
        F.abs(F.col("p90u") - F.col("p90n")) > 1e-9).count() == 0


def test_udtf_word_split_matches_posexplode(spark):
    """Python UDTF lateral join == posexplode(split()) minus empties,
    via both the DataFrame helper and SQL LATERAL."""
    from pyspark.sql import functions as F

    from org_dharts_dia_tesseract_spark.functions.udxf import (
        word_split_lateral, word_split_udtf)
    from org_dharts_dia_tesseract_spark.sources.tables import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = word_split_lateral(docs)
    native = (docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("word_id", "word"))
        .where(F.col("word") != "")
        .select("doc_id", "word", F.col("word_id").cast("int").alias("word_id")))
    # posexplode keeps pre-filter indices; re-rank both for exact compare
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy("word_id")
    rerank = lambda df: df.withColumn(  # noqa: E731
        "word_id", (F.row_number().over(w) - 1).cast("int"))
    assert rerank(got).exceptAll(rerank(native)).count() == 0
    assert rerank(native).exceptAll(rerank(got)).count() == 0
    spark.udtf.register("word_split", word_split_udtf())
    n = spark.sql(
        "SELECT d.doc_id, s.word, s.word_id FROM {d} d, "
        "LATERAL word_split(d.text) s", d=docs).count()
    assert n == native.count()
