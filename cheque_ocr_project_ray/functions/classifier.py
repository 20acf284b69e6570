"""Cheque-type classification (operator M19, SURVEY.md §2.2).

Mirrors ``cheque_classifier.py:122-270``: a fixed priority cascade —
government (cat III → cat II → cat I) → demand draft → manager's
cheque → crossed patterns → SELF → default ORDER.  The marker tables
are the reference's constants (``cheque_classifier.py:73-120``).

Result is a plain NamedTuple instead of the reference's dataclass;
``type`` values are the ``ChequeType`` enum's string values.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

# ChequeType enum values used by the classification cascade
# (cheque_classifier.py:21-45).
BEARER = "BEARER"
ORDER = "ORDER"
CROSSED = "CROSSED"
SELF = "SELF"
GOVT_NEGOTIABLE = "GOVT_NEGOTIABLE"
GOVT_NON_TRANSFERABLE = "GOVT_NON_TRANSFERABLE"
GOVT_GOVT_ACCOUNT = "GOVT_GOVT_ACCOUNT"
DEMAND_DRAFT = "DEMAND_DRAFT"
MANAGERS_CHEQUE = "MANAGERS_CHEQUE"


class Classification(NamedTuple):
    type: str
    subtype: Optional[str]
    confidence: float
    is_government: bool
    government_category: Optional[str]  # 'I' | 'II' | 'III'
    payee_rule: str
    validation_notes: tuple[str, ...]


_GOVT_MARKERS_HIGH = [
    "GOVERNMENT OF INDIA",
    "GOVT OF INDIA",
    "RESERVE BANK OF INDIA",
    "RBI",
    "PAY AND ACCOUNTS OFFICE",
    "PAO",
    "GOVERNMENT ACCOUNT",
]
_GOVT_MARKERS_MEDIUM = [
    "CENTRAL GOVERNMENT",
    "STATE GOVERNMENT",
    "PUBLIC SECTOR BANK",
    "ACCREDITED BANK",
    "NOT TRANSFERABLE",
    "CHEQUE DRAWING DDO",
    "DDO",
    "DRAWING AND DISBURSING OFFICER",
]

_DD_MARKERS = ["DEMAND DRAFT", "DD", "DRAFT", "BANK DRAFT"]
_MC_MARKERS = [
    "MANAGERS CHEQUE", "MANAGER'S CHEQUE", "MC",
    "PAY ORDER", "BANKER'S CHEQUE", "BANKERS CHEQUE",
]

_CROSSED_PATTERNS = [re.compile(p) for p in [
    r"A/C\s*PAYEE",
    r"ACCOUNT\s*PAYEE",
    r"AC\s*PAYEE",
    r"CROSSED",
    r"NON[-\s]NEGOTIABLE",
    r"NOT\s+NEGOTIABLE",
]]

# Indian-bank MICR triplet (cheque_classifier.py:120).
MICR_PATTERN = re.compile(r"(\d{9})\s+(\d{9})\s+(\d{6,9})")

_OFFICER_DESIGNATION_PATTERNS = [re.compile(p) for p in [
    r"SECTION\s+OFFICER[^A-Z]*([A-Z&\s]+)",
    r"ACCOUNTS\s+OFFICER",
    r"DRAWING\s+AND\s+DISBURSING\s+OFFICER",
    r"DDO",
    r"PAY\s+AND\s+ACCOUNTS\s+OFFICER",
    r"PAO",
    r"CHIEF\s+ACCOUNTS\s+OFFICER",
    r"FINANCIAL\s+ADVISOR",
]]


def _extract_officer_designation(text: str) -> Optional[str]:
    """First matching designation pattern (cheque_classifier.py:253-270)."""
    for pat in _OFFICER_DESIGNATION_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(0).strip()
    return None


def _detect_government(text: str) -> tuple[bool, Optional[str]]:
    """(is_government, category) per cheque_classifier.py:172-194."""
    if "GOVERNMENT ACCOUNT" in text or "GOVT ACCOUNT" in text:
        return True, "III"
    if "NOT TRANSFERABLE" in text and any(
        g in text for g in ("GOVT", "GOVERNMENT", "PAO", "DDO")
    ):
        return True, "II"
    for marker in _GOVT_MARKERS_HIGH:
        if marker in text:
            return True, "I"
    for marker in _GOVT_MARKERS_MEDIUM:
        if marker in text:
            return True, "I"
    return False, None


def classify_cheque(ocr_text: str) -> Classification:
    """Classify one cheque from its full OCR text (cheque_classifier.py:122-170)."""
    text = ocr_text.upper()

    is_govt, category = _detect_government(text)
    if is_govt:
        if category == "III":
            return Classification(
                GOVT_GOVT_ACCOUNT, None, 0.98, True, "III",
                "government_account",
                ("Category III - Inter-departmental/Government Account",),
            )
        if category == "II":
            designation = _extract_officer_designation(text)
            return Classification(
                GOVT_NON_TRANSFERABLE, designation, 0.95, True, "II",
                "government_officer",
                ("Category II - Non-Transferable - Salary/Office expenses",),
            )
        return Classification(
            GOVT_NEGOTIABLE, None, 0.92, True, "I",
            "government_contractor",
            ("Category I - Negotiable - Contractors/Suppliers",),
        )

    if any(marker in text for marker in _DD_MARKERS):
        return Classification(
            DEMAND_DRAFT, None, 0.95, False, None, "dd_standard",
            ("Demand Draft - Nationwide clearance",),
        )
    if any(marker in text for marker in _MC_MARKERS):
        return Classification(
            MANAGERS_CHEQUE, None, 0.95, False, None, "mc_standard",
            ("Manager's Cheque - Local clearance only",),
        )
    for pat in _CROSSED_PATTERNS:
        if pat.search(text):
            return Classification(
                CROSSED, None, 0.85, False, None, "account_payee",
                ("Crossed/Account Payee cheque detected",),
            )
    if "SELF" in text and len(text.split()) < 15:
        return Classification(
            SELF, None, 0.8, False, None, "self",
            ("Self cheque for cash withdrawal",),
        )
    return Classification(
        ORDER, None, 0.7, False, None, "standard",
        ("Standard order cheque - default classification",),
    )


def extract_micr(full_text: str) -> str:
    """First MICR triplet in the text, space-joined; '' if absent.

    The reference defines the pattern (cheque_classifier.py:120) but its
    classify() path never populates micr_code; the engine surfaces it as
    a first-class field span.
    """
    m = MICR_PATTERN.search(full_text.upper())
    if not m:
        return ""
    return " ".join(m.groups())
