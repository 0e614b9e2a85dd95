"""Main-content extraction from HTML: boilerplate strip + DOM heuristics.

The north rule frames this engine as a main-content extraction pipeline
(HTML boilerplate strip, layout parse, DOM heuristics) over interleaved
documents; the raster leg is covered by operators/extract.py, this module
covers the markup leg.

Two tiers, mirroring the raster pipeline's split between declarative and
kernel stages:

- `strip_boilerplate_col` / `strip_tags_col`: pure column expressions
  (regexp chains — JVM-side, whole-stage codegen, no Python). Removes
  non-content elements (script/style/nav/header/footer/aside/form),
  comments, then all tags, decodes the common entities and collapses
  whitespace. Identical regexes run in the DuckDB parity oracle.
- `extract_main_content`: the DOM-heuristic tier (readability/justext
  family): split the page into blocks at structural tags, score each
  block by text length vs link density, keep blocks above threshold.
  Runs as a vectorized `mapInPandas` kernel (no per-row Python at the
  Spark API level); deterministic, order-preserving.

At 100 TB both tiers are narrow maps — no shuffle at all until a
downstream aggregation; filters on doc_id/source still push to the scan
below the projection.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# elements whose entire subtree is boilerplate, never content
# (`<head\b` does not match `<header` — \b needs a non-word char)
_DROP_ELEMENTS = ("script", "style", "nav", "header", "footer",
                  "aside", "form", "noscript", "head")

# (pattern, replacement) chain; (?is) = case-insensitive + dotall so
# multi-line elements drop. Applied in order on both engines.
_STRIP_CHAIN: list[tuple[str, str]] = (
    [(rf"(?is)<{el}\b[^>]*>.*?</{el}>", " ") for el in _DROP_ELEMENTS]
    + [
        (r"(?s)<!--.*?-->", " "),        # comments
        (r"(?s)<[^>]+>", " "),           # any remaining tag
    ]
)

_ENTITIES = [("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
             ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]


def strip_tags_col(col: Column) -> Column:
    """Markup -> plain text as a pure column expression."""
    out = col
    for pat, rep in _STRIP_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_boilerplate_col(col: Column) -> Column:
    """Alias making the two-step intent explicit: the drop-element pass is
    the boilerplate strip; the tag pass is the flatten."""
    return strip_tags_col(col)


def strip_tags_sql(expr: str) -> str:
    """The same chain as DuckDB SQL (parity oracle)."""
    out = expr
    for pat, rep in _STRIP_CHAIN:
        pat_sql = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{pat_sql}', '{rep}', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# -- DOM-heuristic tier ----------------------------------------------------

_BLOCK_SPLIT = re.compile(
    r"(?i)</?(?:p|div|section|article|h[1-6]|li|ul|ol|table|tr|br)\b[^>]*>")
_TAG = re.compile(r"(?s)<[^>]+>")
_LINK_TEXT = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_DROP_RE = [re.compile(rf"(?is)<{el}\b[^>]*>.*?</{el}>")
            for el in _DROP_ELEMENTS]
_COMMENT = re.compile(r"(?s)<!--.*?-->")


def _main_content_of(html: str, min_len: int, max_link_density: float) -> str:
    """Single-page kernel: drop boilerplate subtrees, split at structural
    tags, keep blocks that read like body text (long enough, not mostly
    anchor text). Pure function — safe to vectorize."""
    if html is None:
        return None
    for rx in _DROP_RE:
        html = rx.sub(" ", html)
    html = _COMMENT.sub(" ", html)
    kept: list[str] = []
    for block in _BLOCK_SPLIT.split(html):
        link_chars = sum(len(_TAG.sub("", m)) for m in _LINK_TEXT.findall(block))
        text = _TAG.sub(" ", block)
        for ent, ch in _ENTITIES:
            text = text.replace(ent, ch)
        text = re.sub(r"\s+", " ", text).strip()
        if len(text) < min_len:
            continue
        if link_chars / max(len(text), 1) > max_link_density:
            continue
        kept.append(text)
    return " ".join(kept)


def extract_main_content(df: DataFrame, html_col: str = "html",
                         out_col: str = "content", *,
                         min_block_len: int = 20,
                         max_link_density: float = 0.4) -> DataFrame:
    """DOM-heuristic main-content extraction as an Arrow-batched stage."""
    fields = [f for f in df.schema.fields]
    schema = T.StructType(fields + [T.StructField(out_col, T.StringType(), True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[html_col].map(
                lambda h: _main_content_of(h, min_block_len, max_link_density))
            yield pdf

    return df.mapInPandas(run, schema)
