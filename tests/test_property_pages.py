"""Property-based tests: random page geometry -> segmentation +
recognition must reproduce the generator's ground truth exactly
(SURVEY 5.2.5: random glyph grids -> invariants)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from org_dharts_dia_tesseract_spark import datagen
from org_dharts_dia_tesseract_spark.oracle import analyze_page

_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "a", "Zz", "42", "x.y", "Qq",
     "longerword", "mid-size", "(ok)", "end."])
_line = st.lists(_word, min_size=1, max_size=5).map(" ".join)
_para = st.lists(_line, min_size=1, max_size=3)
_text_block = st.lists(_para, min_size=1, max_size=3).map(
    lambda ps: datagen.BlockSpec("text", ps))
_image_block = st.builds(
    lambda w, h: datagen.BlockSpec("image", w=w, h=h),
    st.integers(16, 50), st.integers(8, 24))
_hline_block = st.builds(lambda w: datagen.BlockSpec("hline", w=w),
                         st.integers(30, 80))
_block = st.one_of(_text_block, _text_block, _text_block, _image_block,
                   _hline_block)
_column = st.lists(_block, min_size=1, max_size=3)
_page = st.builds(lambda cols: datagen.PageSpec(columns=cols),
                  st.lists(_column, min_size=1, max_size=2))


@settings(max_examples=40, deadline=None)
@given(_page, st.integers(0, 10_000))
def test_random_page_roundtrip(spec, noise_seed):
    img = datagen.render_page(spec, noise_key=f"prop-{noise_seed}")
    res = analyze_page(img)
    exp_blocks = []
    for b in spec.reading_order_blocks():
        if b.kind == "text":
            exp_blocks.append(("text", "\n".join("\n".join(p) for p in b.paras)))
        else:
            exp_blocks.append(("image", None))
    got = [("text", blk.text) if blk.block_type in
           ("FLOWING_TEXT", "HEADING_TEXT", "PULLOUT_TEXT", "TABLE",
            "VERTICAL_TEXT", "CAPTION_TEXT")
           else ("image", None) for blk in res.blocks]
    assert got == exp_blocks
    # structural invariants: boxes nest, seq strictly monotone
    rows = res.rows()
    assert [r["seq"] for r in rows] == list(range(len(rows)))
    blocks = {r["block_id"]: r for r in rows if r["level"] == "BLOCK"}
    for r in rows:
        if r["level"] != "BLOCK":
            blk = blocks[r["block_id"]]
            assert blk["left"] <= r["left"] <= r["right"] <= blk["right"]
            assert blk["top"] <= r["top"] <= r["bottom"] <= blk["bottom"]


def test_asof_join_unit(spark):
    from org_dharts_dia_tesseract_spark.operators.relational import asof_join
    left = spark.createDataFrame(
        [("u1", 10, "L1"), ("u1", 20, "L2"), ("u2", 5, "L3")],
        "key string, t int, payload string")
    right = spark.createDataFrame(
        [("u1", 8, 1.0), ("u1", 10, 2.0), ("u1", 15, 3.0), ("u3", 1, 9.0)],
        "key string, t int, v double")
    out = asof_join(left, right, on="t", key="key",
                    right_value_cols=["v"]).orderBy("key", "t").collect()
    got = [(r["key"], r["t"], r["v_asof"]) for r in out]
    # t=10: right row at exactly 10 is visible (right-wins tie)
    assert got == [("u1", 10, 2.0), ("u1", 20, 3.0), ("u2", 5, None)]
