"""Bounding-box column functions.

The reference declares contains/intersects/intersection/union on
BoundingBox but leaves them unimplemented stubs (BoundingBox.java:39-53);
SURVEY directs the rebuild to implement them properly. Boxes are structs
`{left:int, top:int, right:int, bottom:int}` with half-open extents at
pixel cracks ((0,0) top-left; the box of the top-left pixel is
(0,0)->(1,1) — BoundingBox.java:26-37, LayoutIterator.java:67-83).

All functions are pure Column expressions: they stay inside whole-stage
codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def box_struct(left, top, right, bottom) -> Column:
    return F.struct(
        F.col(left).cast("int").alias("left") if isinstance(left, str) else left.cast("int").alias("left"),
        F.col(top).cast("int").alias("top") if isinstance(top, str) else top.cast("int").alias("top"),
        F.col(right).cast("int").alias("right") if isinstance(right, str) else right.cast("int").alias("right"),
        F.col(bottom).cast("int").alias("bottom") if isinstance(bottom, str) else bottom.cast("int").alias("bottom"),
    )


def box_contains(outer: Column, inner: Column) -> Column:
    """outer fully contains inner (closed on the half-open convention)."""
    return ((outer["left"] <= inner["left"]) & (outer["top"] <= inner["top"])
            & (outer["right"] >= inner["right"])
            & (outer["bottom"] >= inner["bottom"]))


def box_intersects(a: Column, b: Column) -> Column:
    """Non-empty overlap of half-open boxes."""
    return ((a["left"] < b["right"]) & (b["left"] < a["right"])
            & (a["top"] < b["bottom"]) & (b["top"] < a["bottom"]))


def box_intersection(a: Column, b: Column) -> Column:
    """Intersection box, or NULL when disjoint."""
    inter = F.struct(
        F.greatest(a["left"], b["left"]).alias("left"),
        F.greatest(a["top"], b["top"]).alias("top"),
        F.least(a["right"], b["right"]).alias("right"),
        F.least(a["bottom"], b["bottom"]).alias("bottom"),
    )
    return F.when(box_intersects(a, b), inter)


def box_union(a: Column, b: Column) -> Column:
    """Pairwise union: minimal box covering both (BoundingBox.java:51-53's
    declared-but-stubbed union)."""
    return F.struct(
        F.least(a["left"], b["left"]).alias("left"),
        F.least(a["top"], b["top"]).alias("top"),
        F.greatest(a["right"], b["right"]).alias("right"),
        F.greatest(a["bottom"], b["bottom"]).alias("bottom"),
    )


def box_union_agg(box: Column) -> Column:
    """Aggregate: minimal box covering all input boxes (use in agg())."""
    return F.struct(
        F.min(box["left"]).alias("left"),
        F.min(box["top"]).alias("top"),
        F.max(box["right"]).alias("right"),
        F.max(box["bottom"]).alias("bottom"),
    )


def box_area(a: Column) -> Column:
    return ((a["right"] - a["left"]) * (a["bottom"] - a["top"])).cast("long")
