"""Main-content extraction (HTML boilerplate strip + DOM heuristics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from org_dharts_dia_tesseract_spark.operators import boilerplate as B

PAGE = """
<html><head><title>t</title><style>p {color: red}</style>
<script>if (1 < 2) { nav(); }</script></head>
<body>
<nav><a href="/">home</a> <a href="/x">products</a> <a href="/y">blog</a></nav>
<header><h1>Site Name</h1></header>
<!-- tracking pixel -->
<div id="main">
  <p>This is the actual article body with enough length to keep.</p>
  <p>A second paragraph of real content, also long enough to survive.</p>
</div>
<div class="related"><a href="/1">rel one</a> <a href="/2">rel two</a>
 <a href="/3">rel three</a> <a href="/4">rel four</a></div>
<footer>&copy; 2026 Example &amp; Co</footer>
</body></html>
"""


def test_strip_tags_col_removes_boilerplate(spark):
    df = spark.createDataFrame([("a", PAGE)], "doc_id string, html string")
    out = df.select(B.strip_tags_col(F.col("html")).alias("t")).first()["t"]
    assert "actual article body" in out
    assert "second paragraph" in out
    # dropped subtrees: script/style/nav/header/footer/comments/head
    for gone in ("color", "nav()", "home", "Site Name", "2026", "tracking", "t"):
        if len(gone) > 1:
            assert gone not in out, gone
    # the related-links div is NOT a drop element for the regex tier:
    # its anchor text survives the flat strip (the DOM tier handles it)
    assert "rel one" in out
    assert "<" not in out and ">" not in out


def test_strip_entities_and_whitespace(spark):
    df = spark.createDataFrame(
        [("a", "<p>x &amp; y &lt;z&gt;   &quot;q&quot; &#39;s&#39;</p>")],
        "doc_id string, html string")
    out = df.select(B.strip_tags_col(F.col("html")).alias("t")).first()["t"]
    assert out == 'x & y <z> "q" \'s\''


def test_main_content_kernel_link_density_and_length():
    got = B._main_content_of(PAGE, 20, 0.4)
    assert "actual article body" in got
    assert "second paragraph" in got
    assert "rel one" not in got          # link-farm div: high link density
    assert "home" not in got             # nav subtree dropped
    assert "Site Name" not in got        # header subtree dropped
    assert B._main_content_of(None, 20, 0.4) is None
    assert B._main_content_of("<p>short</p>", 20, 0.4) == ""


def test_extract_main_content_stage(spark):
    df = spark.createDataFrame(
        [("a", PAGE), ("b", "<p>short</p>"), ("c", None)],
        "doc_id string, html string")
    out = {r["doc_id"]: r["content"]
           for r in B.extract_main_content(df, "html").collect()}
    assert "actual article body" in out["a"]
    assert out["b"] == ""
    assert out["c"] is None


def test_strip_sql_matches_spark(spark):
    """The DuckDB oracle chain is generated from the same _STRIP_CHAIN —
    pin that they agree on an adversarial page."""
    import duckdb
    page = PAGE.replace("\n", " ")
    df = spark.createDataFrame([(page,)], "html string")
    got = df.select(B.strip_tags_col(F.col("html")).alias("t")).first()["t"]
    sql = B.strip_tags_sql("html")
    exp = duckdb.connect().execute(
        f"SELECT {sql} AS t FROM (SELECT ? AS html)", [page]).fetchone()[0]
    assert got == exp
