"""Cursor semantics tests: the reference's documented worked examples
become unit tests (LayoutIterator.java:194-251), plus lifecycle parity
(LayoutIteratorTests.java:38-139)."""

from __future__ import annotations

import pytest

from org_dharts_dia_tesseract_spark import datagen
from org_dharts_dia_tesseract_spark.errors import InvalidStateError
from org_dharts_dia_tesseract_spark.oracle import analyze_page
from org_dharts_dia_tesseract_spark.oracle.iterator import RecognitionCursor


def _cursor(name: str) -> RecognitionCursor:
    return RecognitionCursor(analyze_page(datagen.fixture_page(name)).blocks)


def test_beginning_of_worked_example():
    """LayoutIterator.java:199-209: at the first symbol of the first word
    of line 3 of para 2 of block 1: BLOCK=false PARA=false TEXTLINE=true
    WORD=true SYMBOL=true."""
    # poetry block 0 has one line per para; use a custom page instead:
    spec = datagen.PageSpec(columns=[[datagen.BlockSpec("text", [
        ["first para line one", "first para line two"],
        ["second para one", "second para two", "second para three"],
    ])]])
    img = datagen.render_page(spec, noise_key="cursor-example")
    cur = RecognitionCursor(analyze_page(img).blocks)
    # advance to para 1 (0-based second paragraph), then to its line 2
    assert cur.next("PARA")
    assert cur.next("TEXTLINE")
    assert cur.next("TEXTLINE")
    assert cur.get_text("TEXTLINE") == "second para three"
    assert not cur.is_at_beginning_of("BLOCK")
    assert not cur.is_at_beginning_of("PARA")
    assert cur.is_at_beginning_of("TEXTLINE")
    assert cur.is_at_beginning_of("WORD")
    assert cur.is_at_beginning_of("SYMBOL")


def test_final_element_worked_example():
    """LayoutIterator.java:224-239 ("bizarre." example): at the last word
    of a paragraph that is not the block's last paragraph:
    isAtFinalElement(PARA, SYMBOL)=False, (PARA, WORD)=True,
    (BLOCK, WORD)=False."""
    spec = datagen.PageSpec(columns=[[datagen.BlockSpec("text", [
        ["starts off innocuously", "quickly turns bizarre."],
        ["guards against confused", "references."],
    ])]])
    img = datagen.render_page(spec, noise_key="final-example")
    cur = RecognitionCursor(analyze_page(img).blocks)
    while cur.get_text("WORD") != "bizarre.":
        assert cur.next("WORD")
    assert cur.is_at_beginning_of("WORD")
    assert not cur.is_at_final_element("PARA", "SYMBOL")
    assert cur.is_at_final_element("PARA", "WORD")
    assert not cur.is_at_final_element("BLOCK", "WORD")
    assert cur.is_at_final_element("TEXTLINE", "WORD")


def test_poetry_counts_via_cursor_and_cloning():
    """testPageIteratorCloning pattern (LayoutIteratorTests.java:38-72):
    two independent cursors over one analysis; 3 blocks / 22 lines."""
    cur = _cursor("simple_poetry")
    clone = cur.copy()
    blocks = 1
    while cur.next("BLOCK"):
        blocks += 1
    assert blocks == 3
    lines = 1
    while clone.next("TEXTLINE"):
        lines += 1
    assert lines == 22
    # original cursor exhausted independently of clone
    assert not cur.next("BLOCK")


def test_symbol_skips_nontext_blocks():
    """next(SYMBOL) skips non-text blocks; other levels visit them once
    (LayoutIterator.java:176-183)."""
    cur = _cursor("mixed_blocks")
    words = 1
    while cur.next("WORD"):
        words += 1
    # 'text above' (2 words) + image (1 virtual) + hline (1 virtual) + 'text below' (2)
    assert words == 6
    cur2 = _cursor("mixed_blocks")
    seen = [cur2.get_text("SYMBOL")]
    while cur2.next("SYMBOL"):
        seen.append(cur2.get_text("SYMBOL"))
    assert "".join(seen) == "textabovetextbelow"


def test_symbol_box_null_under_nontext_block():
    """getBoundingBox may be null when there is no content at that level
    under the cursor (skip contract, examples/BlockAnalysis.java:84-93)."""
    cur = _cursor("mixed_blocks")
    assert cur.next("BLOCK")          # now on the FLOWING_IMAGE block
    assert cur.get_block_type() == "FLOWING_IMAGE"
    assert cur.get_bounding_box("SYMBOL") is None
    assert cur.get_bounding_box("WORD") is not None
    assert cur.get_text("WORD") is None


def test_intermixed_levels():
    cur = _cursor("simple_poetry")
    assert cur.next("TEXTLINE")       # line 2 of para 1? paras are 1-line
    assert cur.next("BLOCK")          # jump to block 2
    assert cur.is_at_beginning_of("BLOCK")
    assert cur.next("WORD")
    assert not cur.is_at_beginning_of("BLOCK")


def test_begin_resets():
    cur = _cursor("simple_poetry")
    first = cur.get_text("WORD")
    assert cur.next("BLOCK")
    cur.begin()
    assert cur.get_text("WORD") == first


def test_post_close_raises_everywhere():
    """testMethodsPostClose (LayoutIteratorTests.java:80-139)."""
    cur = _cursor("simple")
    fired = []
    cur.on_close(lambda c: fired.append(1))
    cur.close()
    cur.close()                        # idempotent; listener fires once
    assert fired == [1]
    for call in [cur.begin, cur.copy,
                 lambda: cur.next("WORD"),
                 lambda: cur.is_at_beginning_of("WORD"),
                 lambda: cur.is_at_final_element("PARA", "WORD"),
                 lambda: cur.get_bounding_box("WORD"),
                 cur.get_block_type,
                 lambda: cur.get_baseline("TEXTLINE"),
                 cur.get_orientation,
                 lambda: cur.get_text("WORD"),
                 lambda: cur.get_confidence("WORD")]:
        with pytest.raises(InvalidStateError):
            call()


def test_orientation_upright():
    cur = _cursor("simple_poetry")
    o = cur.get_orientation()
    assert o["orientation"] == "UP"
    assert o["writing_direction"] == "LTR"
    assert o["textline_order"] == "TTB"
    assert abs(o["deskew_angle"]) < 0.12


def test_word_flags_and_font():
    cur = _cursor("digits_page")
    assert cur.get_text("WORD") == "3.14"
    assert cur.is_numeric()
    assert not cur.is_dictionary_word({"the", "quick"})
    font = cur.get_word_font_attributes()
    assert font["monospace"] is True
    assert font["pointsize"] > 0
