"""PySpark-native document-image-analysis (DIA) / OCR-span extraction engine.

A from-scratch rebuild of the capabilities of the reference
``DART-Services/org.dharts.dia.tesseract`` (a Java/JNA wrapper around the
Tesseract 3.02 native DLL — see /root/reference) as an idiomatic Spark
pipeline:

- ``glyphs`` / ``datagen``: deterministic synthetic corpus (interleaved
  text + media documents; raw-bitmap rendered pages) standing in for the
  10^12-doc production corpus.
- ``oracle``: single-process numpy reference implementation of the page
  analysis stack (Otsu binarization, connected components, XY-cut
  segmentation, baseline fit, reading order, nearest-template recognition)
  plus a faithful ``LayoutIterator``-semantics cursor. This is the
  correctness anchor for span-sequence equality.
- ``operators``: the distributed Spark pipeline — DataFrame ops plus
  vectorized Arrow UDF stages (``mapInPandas``) — and the wider operator
  surface (rollups, window flags, sinks, dedup, similarity, text stats).
- ``sources``: table loading, corpus materialization, checkpoint manifests
  and resume.
- ``functions``: column-level helpers (bounding boxes, text predicates).

No code is copied from the reference; citations in docstrings are
``file:line`` pointers into /root/reference for parity checking only.
"""

__version__ = "0.1.0"
