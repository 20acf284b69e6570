"""Deterministic OCR spelling correction (operator M22, SURVEY.md §2.2).

Mirrors ``dbf_processor.py:34-67,117-128`` (the reference's deterministic
replacement for its T5 "AI spelling" path): a fixed misread map, garbage
word removal, ``[^A-Z\\s]`` strip, Title-casing, UNKNOWN fallback.
"""

from __future__ import annotations

import re

SPELLING_CORRECTIONS = {
    "STEELNDUSTRIES": "STEEL INDUSTRIES",
    "STEELHDUSTRIES": "STEEL INDUSTRIES",
    "STEELIHDUSTRIES": "STEEL INDUSTRIES",
    "STEELIINDUSTRIES": "STEEL INDUSTRIES",
    "STEELINDUSTRIES": "STEEL INDUSTRIES",
    "STEL INDUSTWUES": "STEEL INDUSTRIES",
    "DEVAPRLIANGES": "DEV APPLIANCES",
    "APRLIANGES": "APPLIANCES",
    "COAL": "GOAL",
    "SURYA COAL": "SURYA GOAL",
    "ENTENPES": "ENTERPRISES",
    "ENTSEPS": "ENTERPRISES",
    "KISPA": "KIXPA",
    "ARIHANTINEOCOO": "ARIHANT NEOCO",
    "CURUGRAM": "GURUGRAM",
    "FASTNERS": "FASTNERS",
    "NARENDRA FASTNERS": "NARENDRA FASTNERS",
    "HARJEET KAUR": "HARJEET KAUR",
    "SATBANT KAUR": "SATBANT KAUR",
    "NEELAM JINDAL": "NEELAM JINDAL",
    "MOHD QURBAN": "MOHD QURBAN",
    "DUDHI INDUSTRIES": "DUDHI INDUSTRIES",
    "ROHIN": "ROHIT",
    "POLYPLAST": "POLYPLAST PVT LTD",
    "BATRA SCREW": "BATRA SCREW INDUSTRIES",
}

GARBAGE_WORDS = [
    "RUPEES", "WOTFTHO", "BEARER", "QRBEARER", "RQR",
    "XXX", "RUPEE", "RS", "AMOUNT", "TOTAL", "PAY",
    "OR BEARER", "A/C", "ACCOUNT", "BANK", "BRANCH",
    "IFSC", "CODE", "DATE", "VALID", "MONTHS", "FROM",
    "THE", "OF", "ISSUE", "ONLY", "AND", "FOR", "TO",
]

_NON_ALPHA_SPACE = re.compile(r"[^A-Z\s]")


def correct_spelling(name: str | None) -> str:
    """Fixed-map correction + garbage removal (dbf_processor.py:117-128)."""
    if not name:
        return "UNKNOWN"
    name = name.upper()
    for wrong, correct in SPELLING_CORRECTIONS.items():
        name = name.replace(wrong, correct)
    for word in GARBAGE_WORDS:
        name = name.replace(word, "")
    name = " ".join(name.split())
    name = _NON_ALPHA_SPACE.sub("", name)
    return name.title() if len(name) >= 3 else "UNKNOWN"
