"""OCR-confusion text normalization (operator M8 in SURVEY.md §2.2).

Semantics mirror the reference's v1 normalizer
(``issuer_processor_v.py:208-218``): upper-case, map the classic OCR
digit confusions 0→O, 1→I, |→I, 5→S, blank out anything outside
``[A-Z0-9 .,&/-]``, collapse whitespace.  Digits 2/3/4/6/7/8/9 are
deliberately NOT mapped (that's the v2/V3 variant; v1 semantics are
the frozen contract, see SURVEY.md §7.5).
"""

from __future__ import annotations

import re

_NON_ALLOWED = re.compile(r"[^A-Z0-9 .,&/-]")

# str.translate is the vectorization-friendly form of the chained
# .replace() calls in the reference; identical output.
_CONFUSION_MAP = str.maketrans({"0": "O", "1": "I", "|": "I", "5": "S"})


def collapse_ws(text: str) -> str:
    """Whitespace collapse as the reference does it: ``' '.join(s.split())``."""
    return " ".join(text.split())


def clean_text(text: str | None) -> str:
    """Normalize one OCR line; returns ``"XXX"`` for empty input.

    Mirrors ``issuer_processor_v.py:208-218`` step by step.
    """
    if not text:
        return "XXX"
    text = text.upper()
    text = text.translate(_CONFUSION_MAP)
    text = _NON_ALLOWED.sub(" ", text)
    text = collapse_ws(text)
    return text.strip()
