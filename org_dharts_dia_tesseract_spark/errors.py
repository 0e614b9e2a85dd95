"""Typed error surface mirroring the reference's exception model.

- DiaError ~ TesseractException (checked base, TesseractException.java:26-51)
- InvalidParameterError ~ InvalidParameterException with its bad-value map
  (InvalidParameterException.java:26-55)
- InvalidStateError ~ InvalidStateException from the handle state machine
  (TesseractHandle.requireState:111-127)
"""

from __future__ import annotations


class DiaError(Exception):
    """Base error for the DIA/OCR engine."""


class InvalidStateError(DiaError):
    """Operation invalid for the object's current lifecycle state
    (e.g. any method on a closed cursor — LayoutIteratorTests.java:80-139)."""


class InvalidParameterError(DiaError):
    """Bad parameter value(s); carries a name->value map like the
    reference's InvalidParameterException."""

    def __init__(self, message: str, bad_values: dict[str, object] | None = None):
        super().__init__(message)
        self.bad_values = dict(bad_values or {})
