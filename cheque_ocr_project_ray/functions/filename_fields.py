"""Filename-derived field extraction (operator M23, SURVEY.md §2.2).

Mirrors ``custom_csv.py:24-46``: amount = first ``\\d+\\.\\d{2}``,
account = first digit run, date = first 8-digit run.  The reference
falls back to ``datetime.now()`` for a missing date; this engine is
deterministic, so the fallback is the empty string (deviation
documented here and in tests).
"""

from __future__ import annotations

import re

_AMOUNT_RE = re.compile(r"(\d+\.\d{2})")
_NUMBER_RE = re.compile(r"\d+")
_DATE8_RE = re.compile(r"(\d{8})")


def amount_from_filename(filename: str) -> str:
    m = _AMOUNT_RE.search(filename)
    return m.group(1) if m else "0.00"


def account_from_filename(filename: str) -> str:
    numbers = _NUMBER_RE.findall(filename)
    return numbers[0] if numbers else "0"


def date_from_filename(filename: str) -> str:
    matches = _DATE8_RE.findall(filename)
    return matches[0] if matches else ""
