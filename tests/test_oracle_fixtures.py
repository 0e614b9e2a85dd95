"""Golden-count fixture tests mirroring the reference's test strategy
(LayoutIteratorTests.java:38-72 asserts 3 BLOCKs / 22 TEXTLINEs on
simple_poetry.png; MediatorTests.java:37-84 smoke + text equality)."""

from __future__ import annotations

from org_dharts_dia_tesseract_spark import datagen
from org_dharts_dia_tesseract_spark.oracle import analyze_page


def _rows(name, **kw):
    return analyze_page(datagen.fixture_page(name), **kw).rows()


def test_simple_counts_and_text():
    res = analyze_page(datagen.fixture_page("simple"))
    rows = res.rows()
    by = lambda lv: [r for r in rows if r["level"] == lv]
    assert len(by("BLOCK")) == 1
    assert len(by("PARA")) == 1
    assert len(by("TEXTLINE")) == 1
    assert len(by("WORD")) == 1
    assert res.page_text() == "hello"
    assert res.mean_confidence() == 100


def test_poetry_golden_counts():
    rows = _rows("simple_poetry")
    assert len([r for r in rows if r["level"] == "BLOCK"]) == 3
    assert len([r for r in rows if r["level"] == "TEXTLINE"]) == 22


def test_mixed_blocks_types_and_virtual_children():
    res = analyze_page(datagen.fixture_page("mixed_blocks"))
    types = [b.block_type for b in res.blocks]
    assert types == ["FLOWING_TEXT", "FLOWING_IMAGE", "HORZ_LINE", "FLOWING_TEXT"]
    # non-text block: exactly 1 virtual PARA/LINE/WORD, no SYMBOL
    # (LayoutIterator.java:176-183)
    img_blk = res.blocks[1]
    assert len(img_blk.children) == 1                       # PARA
    assert len(img_blk.children[0].children) == 1           # TEXTLINE
    assert len(img_blk.children[0].children[0].children) == 1   # WORD
    assert img_blk.children[0].children[0].children[0].children == []


def test_two_column_reading_order():
    res = analyze_page(datagen.fixture_page("two_column"))
    assert [b.text for b in res.blocks] == [
        "left top", "left bottom", "right top", "right bottom"]


def test_roi_full_image_coordinates():
    """setRectangle: analysis restricted to ROI, coords stay full-image
    (TesseractHandle.java:525-529; LayoutIterator.java:80-83)."""
    img = datagen.fixture_page("roi_page")
    full = analyze_page(img)
    assert [b.text for b in full.blocks] == ["outside roi", "inside roi"]
    second = full.blocks[1].box
    roi = (0, second[1] - 2, img.shape[1], img.shape[0])
    part = analyze_page(img, roi=roi)
    assert [b.text for b in part.blocks] == ["inside roi"]
    assert part.blocks[0].box == second   # same full-image coordinates


def test_digits_whitelist():
    """tessedit_char_whitelist (tessdata/configs/digits): classification
    restricted to '0123456789-.'."""
    res = analyze_page(datagen.fixture_page("digits_page"),
                       whitelist="0123456789-.")
    assert res.page_text() == "3.14 -42 007"
    for ch in set(res.page_text().replace(" ", "")):
        assert ch in "0123456789-."


def test_psm_single_block():
    """SINGLE_BLOCK forces the whole page into one block
    (PageSegMode, PublicTypes.java:66-120)."""
    res = analyze_page(datagen.fixture_page("simple_poetry"), psm="SINGLE_BLOCK")
    assert len(res.blocks) == 1


def test_layout_only_has_no_text():
    """analyzeLayout skips classification entirely
    (initForAnalysePage, TesseractHandle.java:380-384)."""
    res = analyze_page(datagen.fixture_page("simple"), recognize=False)
    assert res.blocks[0].text is None


def test_baseline_and_boxes_nested():
    rows = _rows("simple_poetry")
    blocks = {r["block_id"]: r for r in rows if r["level"] == "BLOCK"}
    for r in rows:
        if r["level"] == "WORD" and not r["is_virtual"]:
            blk = blocks[r["block_id"]]
            assert blk["left"] <= r["left"] <= r["right"] <= blk["right"]
            assert blk["top"] <= r["top"] <= r["bottom"] <= blk["bottom"]
    lines = [r for r in rows if r["level"] == "TEXTLINE"]
    for ln in lines:
        assert ln["baseline_y1"] is not None
        assert ln["top"] < ln["baseline_y1"] <= ln["bottom"] + 1


def test_deskew_tracks_real_shear():
    """I8 deskew (LayoutIterator.getOrientation:318-354, radians
    anticlockwise, clamped to +-pi/4): a genuinely sheared page yields a
    deskew angle matching the applied slope, per block."""
    import numpy as np

    from org_dharts_dia_tesseract_spark import datagen
    from org_dharts_dia_tesseract_spark.oracle.page import analyze_page

    img = datagen.fixture_page("simple_poetry")

    def shear(im, slope):
        h, w = im.shape
        pad = int(abs(slope) * w) + 1
        out = np.full((h + pad, w), 255, dtype=np.uint8)
        for x in range(w):
            dy = int(round(slope * x))
            out[dy:dy + h, x] = im[:, x]
        return out

    for slope, tol in ((0.03, 0.005), (0.06, 0.01)):
        res = analyze_page(shear(img, slope))
        expect = -np.arctan(slope)
        for blk in res.blocks:
            got = blk.orientation_info["deskew_angle"]
            assert abs(got - expect) <= tol, (slope, got, expect)
    # upright page: (near-)zero deskew on every block
    for blk in analyze_page(img).blocks:
        assert abs(blk.orientation_info["deskew_angle"]) <= 0.01
