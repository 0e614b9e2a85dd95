"""Single-process numpy reference implementation (the correctness anchor).

Implements, from scratch, the capabilities the reference delegates to the
native Tesseract DLL (binarization, connected components, XY-cut page
segmentation, baseline fit, reading order, per-region recognition) plus a
faithful cursor with the LayoutIterator traversal semantics
(/root/reference/src/org/dharts/dia/tesseract/LayoutIterator.java:172-254).

The Spark pipeline's per-page Arrow-UDF stages call into the same kernels;
the *oracle* additionally provides the single-process end-to-end span
assembly that tests compare the distributed output against.
"""

from .page import PageResult, analyze_page, document_spans
from .binarize import otsu_binarize
from .iterator import LayoutCursor, RecognitionCursor

__all__ = [
    "PageResult", "analyze_page", "document_spans", "otsu_binarize",
    "LayoutCursor", "RecognitionCursor",
]
