"""Annotated-image sink: draw the analyzed layout back onto page rasters.

Rebuilds the examples layer's rendered output (BlockAnalysis draws block
outlines onto a JPEG, /root/reference/examples/.../BlockAnalysis.java:99;
golden outputs res/examples/output/*.jpg). No codecs here: output is the
same raw row-major uint8 payload convention as input, with box outlines
burned in at configurable grey levels per level.

Implementation: one `mapInPandas` stage joining hierarchy rows back to
their page payload; outlines are drawn with numpy slice assignments
(vectorized, no per-pixel Python).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEVEL_GREY = {"BLOCK": 0, "PARA": 64, "TEXTLINE": 96, "WORD": 128}

ANNOTATED_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("bands", T.IntegerType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("n_boxes", T.IntegerType(), False),
])


def draw_box(img: np.ndarray, left: int, top: int, right: int, bottom: int,
             value: int) -> None:
    """1px rectangle outline, clipped to the raster (in place)."""
    h, w = img.shape[:2]
    l, t = max(left, 0), max(top, 0)
    r, b = min(right, w), min(bottom, h)
    if r <= l or b <= t:
        return
    img[t, l:r] = value
    img[b - 1, l:r] = value
    img[t:b, l] = value
    img[t:b, r - 1] = value


def annotate_pages(hierarchy: DataFrame, media: DataFrame,
                   levels: tuple[str, ...] = ("BLOCK", "TEXTLINE", "WORD")
                   ) -> DataFrame:
    """Per page: payload with outlines of the requested levels burned in."""
    boxes = (hierarchy
             .where(F.col("level").isin(*levels))
             .groupBy("media_ref")
             .agg(F.collect_list(
                 F.struct("level", "left", "top", "right", "bottom"))
                 .alias("boxes")))
    rows = media.join(boxes, "media_ref")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in ANNOTATED_SCHEMA}
            for r in pdf.itertuples(index=False):
                img = np.frombuffer(r.payload, dtype=np.uint8).copy()
                shape = ((r.height, r.width) if r.bands == 1
                         else (r.height, r.width, r.bands))
                img = img.reshape(shape)
                for bx in r.boxes:
                    draw_box(img, bx["left"], bx["top"], bx["right"],
                             bx["bottom"], LEVEL_GREY.get(bx["level"], 0))
                out["media_ref"].append(r.media_ref)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["bands"].append(r.bands)
                out["payload"].append(img.tobytes())
                out["n_boxes"].append(len(r.boxes))
            yield pd.DataFrame(out)

    return rows.mapInPandas(run, ANNOTATED_SCHEMA)
