"""Unit + property tests for the numpy kernels (binarize / cc / segment /
recognize) and the corpus generator's ground-truth equality."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from org_dharts_dia_tesseract_spark import datagen, glyphs
from org_dharts_dia_tesseract_spark.oracle import document_spans, otsu_binarize
from org_dharts_dia_tesseract_spark.oracle.binarize import otsu_threshold, to_grey
from org_dharts_dia_tesseract_spark.oracle.cc import connected_components, fit_baseline


def test_otsu_separates_bimodal():
    rng = np.random.default_rng(7)
    img = rng.integers(datagen.BG_MIN, 256, size=(40, 40)).astype(np.uint8)
    img[10:20, 10:30] = rng.integers(0, datagen.INK_MAX, size=(10, 20))
    ink = otsu_binarize(img)
    assert ink[10:20, 10:30].all()
    assert ink.sum() == 10 * 20


def test_otsu_on_color():
    grey = to_grey(np.full((4, 4, 3), [255, 0, 0], dtype=np.uint8))
    assert grey.shape == (4, 4)
    t = otsu_threshold(np.array([[0, 255]], dtype=np.uint8))
    assert 0 <= t < 255


def test_connected_components_counts_and_boxes():
    ink = np.zeros((20, 20), dtype=np.uint8)
    ink[2:5, 2:5] = 1          # square
    ink[10, 10] = 1            # dot
    ink[11, 11] = 1            # diagonal touch -> same component (8-conn)
    ink[15:16, 0:8] = 1        # bar
    comps = connected_components(ink)
    assert len(comps) == 3
    assert comps[0]["left"] == 2 and comps[0]["right"] == 5
    assert comps[1]["area"] == 2
    assert comps[2]["right"] - comps[2]["left"] == 8


def test_baseline_flat_text():
    img = datagen.render_page(
        datagen.PageSpec(columns=[[datagen.BlockSpec("text", [["mmmm mmmm"]])]]),
        noise_key="bl")
    ink = otsu_binarize(img)
    rows = np.flatnonzero(ink.any(axis=1))
    x1, y1, x2, y2 = fit_baseline(ink, (0, 0, img.shape[1], img.shape[0]))
    # flat baseline at the glyph bottom row (+1 crack)
    assert abs(y1 - (rows[-1] + 1)) <= 1 and abs(y2 - y1) <= 1


def test_glyph_atlas_properties():
    a = glyphs.atlas()
    assert len(a) == len(glyphs.CHARSET)
    mats = list(a.values())
    for g in mats:
        assert g.shape == (7, 5)
        assert (g.sum(axis=0) > 0).all()   # every column inked
        assert (g.sum(axis=1) > 0).all()   # every row inked
    # pairwise separation => unambiguous nearest-template classification
    for i in range(len(mats)):
        for j in range(i + 1, len(mats)):
            assert (mats[i] != mats[j]).sum() >= 6


def test_classify_roundtrip_all_chars():
    a = glyphs.atlas()
    for ch, g in a.items():
        got, conf = glyphs.classify(g)
        assert got == ch and conf == 100.0


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_corpus_spans_match_ground_truth(doc_num):
    """Property: for any generated doc, oracle span sequence equals the
    generator's ground truth on (kind, text, media_ref-prefix, order)."""
    doc, media = datagen.make_doc(f"doc-{doc_num:08d}")
    lookup = {m["media_ref"]: m for m in media}
    spans = document_spans(doc, lambda r: lookup[r])
    exp = []
    for s in sorted(doc["spans"], key=lambda x: x["offset"]):
        if s["kind"] == "text":
            exp.append(("text", s["text"], None))
        else:
            for i, g in enumerate(datagen.ground_truth_blocks(s["media_ref"])):
                if g["kind"] == "text":
                    exp.append(("text", g["text"], s["media_ref"]))
                else:
                    exp.append(("image", None, f"{s['media_ref']}#b{i}"))
    got = [(r["kind"], r["text"], r["media_ref"]) for r in spans]
    assert got == exp
    assert [r["seq"] for r in spans] == list(range(len(spans)))


def test_span_offsets_strictly_increasing_in_docs():
    docs, _ = datagen.make_corpus(20)
    for d in docs:
        offs = [s["offset"] for s in d["spans"]]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        assert 1 <= len(offs) <= 128


def test_detect_justification():
    """ParagraphJustification (PublicTypes.java:281-313 — declared in the
    reference, never wired; implemented here) from line-box alignment."""
    from org_dharts_dia_tesseract_spark.oracle.segment import (
        Node, detect_justification)

    def para(boxes):
        p = Node(level="PARA", box=(0, 0, 100, 40))
        p.children = [Node(level="TEXTLINE", box=b) for b in boxes]
        return p

    # ragged right, flush left
    assert detect_justification(
        para([(0, 0, 80, 10), (1, 12, 60, 22), (0, 24, 90, 34)])) == "LEFT"
    # flush right
    assert detect_justification(
        para([(20, 0, 100, 10), (40, 12, 99, 22)])) == "RIGHT"
    # centered
    assert detect_justification(
        para([(20, 0, 80, 10), (30, 12, 71, 22)])) == "CENTER"
    # nothing aligned
    assert detect_justification(
        para([(0, 0, 50, 10), (20, 12, 100, 22), (10, 24, 80, 34)])) == "UNKNOWN"
    # single line cannot be classified
    assert detect_justification(para([(0, 0, 80, 10)])) == "UNKNOWN"
    # fully justified reads LEFT (tie goes to LEFT)
    assert detect_justification(
        para([(0, 0, 100, 10), (0, 12, 100, 22)])) == "LEFT"
