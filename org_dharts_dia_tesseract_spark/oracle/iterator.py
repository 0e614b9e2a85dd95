"""Reading-order cursor with the reference LayoutIterator semantics.

Faithful single-process rebuild of LayoutIterator /
RecognitionResultsIterator (/root/reference/src/org/dharts/dia/tesseract/
LayoutIterator.java, RecognitionResultsIterator.java) over the
materialized hierarchy:

- next(level) advances in reading order; False at page end; levels freely
  intermixable; SYMBOL skips non-text blocks; every other level visits a
  non-text block exactly once (virtual single PARA/LINE/WORD chain) —
  LayoutIterator.java:172-189.
- isAtBeginningOf(level): cursor sits on the first leaf of the enclosing
  `level` element — worked example at LayoutIterator.java:194-215.
- isAtFinalElement(level, element): the current `element` is the last of
  its kind within the enclosing `level` element — LayoutIterator.java:
  220-251 ("bizarre." example).
- copy(): independent second cursor over the same analysis
  (LayoutIterator.copy:134-136; proven by LayoutIteratorTests.
  testPageIteratorCloning:38-72).
- close(): any later call raises InvalidStateError
  (LayoutIteratorTests.testMethodsPostClose:80-139). Close listeners fire
  exactly once (CloseListener.java; ListenerRegistration.java).

In the distributed engine these semantics are window functions over `seq`
(SURVEY section 2 I2-I4); this cursor exists for parity tests.
"""

from __future__ import annotations

from typing import Callable

from ..errors import InvalidStateError
from .segment import LEVELS, TEXT_KINDS, Node

_LEVEL_IDX = {lv: i for i, lv in enumerate(LEVELS)}


class LayoutCursor:
    """Cursor over the BLOCK forest of one analyzed page (layout only)."""

    def __init__(self, blocks: list[Node]):
        self._blocks = blocks
        # leaves: one entry per finest-granularity position. Text blocks
        # contribute one leaf per SYMBOL; non-text blocks one leaf (their
        # virtual WORD). Each leaf is (path_nodes, id_vector).
        self._leaves: list[tuple[list[Node], tuple[int, ...]]] = []
        for bi, blk in enumerate(blocks):
            self._collect(blk, [blk], (bi,))
        self._pos = 0
        self._closed = False
        self._close_listeners: list[Callable[["LayoutCursor"], None]] = []

    def _collect(self, node: Node, path: list[Node], ids: tuple[int, ...]) -> None:
        if not node.children:
            self._leaves.append((path, ids))
            return
        for i, c in enumerate(node.children):
            self._collect(c, path + [c], ids + (i,))

    # -- lifecycle ---------------------------------------------------------
    def _check(self) -> None:
        if self._closed:
            raise InvalidStateError("cursor is closed")

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            listeners, self._close_listeners = self._close_listeners, []
            for fn in listeners:
                fn(self)

    def on_close(self, fn: Callable[["LayoutCursor"], None]) -> None:
        self._check()
        self._close_listeners.append(fn)

    def copy(self) -> "LayoutCursor":
        self._check()
        c = self.__class__(self._blocks)
        c._pos = self._pos
        return c

    # -- traversal ---------------------------------------------------------
    def begin(self) -> None:
        self._check()
        self._pos = 0

    def _ids_at(self, pos: int, depth: int) -> tuple[int, ...]:
        """Id-vector prefix identifying the enclosing element at depth."""
        _, ids = self._leaves[pos]
        return ids[: depth + 1]

    def _is_text_leaf(self, pos: int) -> bool:
        path, _ = self._leaves[pos]
        return path[0].block_type in TEXT_KINDS

    def next(self, level: str) -> bool:
        self._check()
        depth = _LEVEL_IDX[level]
        cur = self._ids_at(self._pos, depth)
        p = self._pos + 1
        while p < len(self._leaves):
            if self._ids_at(p, depth) != cur:
                if level == "SYMBOL" and not self._is_text_leaf(p):
                    p += 1          # SYMBOL skips non-text blocks
                    continue
                self._pos = p
                return True
            p += 1
        return False

    def is_at_beginning_of(self, level: str) -> bool:
        self._check()
        depth = _LEVEL_IDX[level]
        if self._pos == 0:
            return True
        return self._ids_at(self._pos - 1, depth) != self._ids_at(self._pos, depth)

    def is_at_final_element(self, level: str, element: str) -> bool:
        self._check()
        ldepth = _LEVEL_IDX[level]
        edepth = _LEVEL_IDX[element]
        cur_elem = self._ids_at(self._pos, edepth)
        cur_encl = self._ids_at(self._pos, ldepth)
        p = self._pos + 1
        while p < len(self._leaves):
            if self._ids_at(p, ldepth) != cur_encl:
                return True         # enclosing element ended first
            if self._ids_at(p, edepth) != cur_elem:
                return False        # another `element` inside the enclosure
            p += 1
        return True

    # -- data access -------------------------------------------------------
    def _node_at(self, level: str) -> Node | None:
        path, _ = self._leaves[self._pos]
        depth = _LEVEL_IDX[level]
        if depth < len(path):
            return path[depth]
        return None   # e.g. SYMBOL under a non-text block: no content (I5 null)

    def get_bounding_box(self, level: str):
        self._check()
        n = self._node_at(level)
        return None if n is None else n.box

    def get_block_type(self) -> str:
        self._check()
        path, _ = self._leaves[self._pos]
        return path[0].block_type

    def get_baseline(self, level: str):
        self._check()
        n = self._node_at(level)
        return None if n is None else n.baseline

    def get_orientation(self) -> dict:
        self._check()
        path, _ = self._leaves[self._pos]
        return getattr(path[0], "orientation_info", {
            "orientation": "UP", "writing_direction": "LTR",
            "textline_order": "TTB", "deskew_angle": 0.0})


class RecognitionCursor(LayoutCursor):
    """LayoutCursor + text/confidence access (RecognitionResultsIterator
    extends LayoutIterator, RecognitionResultsIterator.java:42-63)."""

    def get_text(self, level: str):
        self._check()
        n = self._node_at(level)
        return None if n is None else n.text

    def get_confidence(self, level: str):
        self._check()
        n = self._node_at(level)
        return None if n is None else n.confidence

    def get_word_font_attributes(self):
        self._check()
        n = self._node_at("WORD")
        return None if n is None else getattr(n, "font", None)

    def is_dictionary_word(self, wordlist: set[str]) -> bool:
        self._check()
        n = self._node_at("WORD")
        return bool(n and n.text and n.text.lower() in wordlist)

    def is_numeric(self) -> bool:
        from .recognize import is_numeric
        self._check()
        n = self._node_at("WORD")
        return is_numeric(n.text if n else None)
