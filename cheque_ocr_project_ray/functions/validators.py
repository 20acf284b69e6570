"""Junk / garbage / drawer-name validators (operators M9-M14, SURVEY.md §2.2).

Pure predicates with v1 reference semantics:
  - ``is_junk_text``        — ``issuer_processor_v.py:220-242``
  - ``is_garbage``          — ``issuer_processor_v.py:49-55,116-139``
  - ``score_name``          — ``issuer_processor_v.py:142-159``
  - ``contains_bank_keyword`` — ``issuer_processor_v.py:161-166``
  - ``is_valid_drawer``     — ``issuer_processor_v.py:245-349``
  - ``looks_like_real_name`` — ``issuer_processor_v.py:499-550``

The constant term sets ARE the semantics (they come straight from the
reference's class attributes at ``issuer_processor_v.py:18-46``); the
code around them is written fresh, branch-for-branch, because every
branch and its ORDER is observable through the XXX/status outputs.
"""

from __future__ import annotations

import re

JUNK_TERMS = frozenset({
    "NON-CASH TRANSACTION ONLY", "WBO AHMEDNAGAF", "THREE MONTHS", "3 MONTHS",
    "PLEASE SIGN", "SIGN HERE", "SIGN ABOVE", "ROAD", "MUMBAI", "MAHARASHTRA",
    "FARIDABAD", "BEARER", "OR BEARER", "ORDER", "PAY", "NOT OVER", "RS.",
    "RUPEES", "A/C PAYEE", "PAYEE ONLY", "ONLY", "BRANCH", "VIL", "DIST",
    "STATE", "PIN", "CODE", "ADDRESS", "CONTACT", "PHONE", "MOBILE", "EMAIL",
    "GST", "PAN", "TAN", "AUTHORISED", "AUTHORIZED", "SIGNATORY", "SIGNATURE",
    "A/C NO", "Plsse sign aboy", "vigag", "CTS CLEARING", "SAVINGSAC",
    "PROPRIETOR", "CURRENTAC", "A/C", "PAYEE", "NOTOVER", "RS", "ACCOUNT",
    "AMOUNT", "DATE", "CHEQUE", "HDFC BANK LTD", "HDFC BANK", "STATE BANK",
    "SBI", "ICICI", "AXIS", "YES", "IDFC", "KOTAK", "INDUSIND", "PNB",
})

BANK_TERMS = frozenset({
    "BANK", "STATE BANK", "HDFC", "ICICI", "SBI", "AXIS", "IDFC", "KOTAK",
    "INDUSIND", "PNB", "UNION BANK", "CANARA", "HDFC BANK LTD", "IDFC FIRST",
    "RBL", "BOB", "CENTRAL BANK", "CORPORATION BANK", "ALLAHABAD BANK",
})

COMMON_NAME_PARTS = frozenset({
    "KUMAR", "SINGH", "SHARMA", "VERMA", "GUPTA", "PATEL", "SHAH", "MEHTA",
    "JOSHI", "PANDEY", "TIWARI", "MISHRA", "DUBEY", "TRIPATHI", "CHOUDHARY",
    "CHAUDHARY", "YADAV", "JAISWAL", "DAS", "BANERJEE", "CHATTERJEE",
    "MUKHERJEE", "SARKAR", "BOSE", "GHOSH", "RAO", "REDDY", "KUMARI",
    "DEVI", "PRASAD", "RAM", "LAL", "AHMED", "KHAN", "ANSARI", "SIDDIQUI",
    "ALI", "HUSSAIN", "RAJ", "SONI", "JAIN", "AGARWAL", "GOYAL", "MITTAL",
    "MALIK", "KAUR", "GILL", "DHILLON", "BRAR", "SANDHU", "STORE", "STORES",
    "MART", "TRADERS", "ENTERPRISES", "AGENCIES", "BROTHERS", "AND", "CO",
    "COMPANY", "INDUSTRIES", "PHARMA", "MEDICAL", "HOSPITAL", "CLINIC",
    "RESTAURANT", "HOTEL", "GARMENTS", "TEXTILES", "FASHION", "JEWELLERS",
    "FURNITURE", "ELECTRONICS", "AUTOMOBILES", "CONSTRUCTION", "BUILDER",
})

_GARBAGE_PATTERNS = [
    re.compile(r"^[OIZ]{5,}$"),
    re.compile(r"^[A-Z][OIZ]{4,}$"),
    re.compile(r".*[OIZ]{5,}.*"),
    re.compile(r"^[A-Z]{1,2}$"),
    re.compile(r"^[A-Z][\s]*[A-Z]$"),
]

_REPEAT_OIZ = re.compile(r"O{4,}|I{4,}|Z{4,}")
_LETTERS = re.compile(r"[A-Za-z]")
_DIGITS = re.compile(r"[0-9]")

_LOCATION_KEYWORDS = (
    "ROAD", "NAGAR", "COLONY", "MUMBAI", "DELHI",
    "FARIDABAD", "STATE", "DIST", "PIN",
)

_SHORT_NAME_WHITELIST = frozenset({"CO", "LTD", "PVT", "INC", "M/S"})

_SUSPICIOUS_REAL_NAME = (
    "BANK", "IFSC", "BRANCH", "PLEASE", "SIGN",
    "ACCOUNT", "AMOUNT", "RUPEES", "PAYEE",
    "BEARER", "ORDER", "STAMP",
)


def is_junk_text(text: str | None) -> bool:
    """Junk-line predicate (``issuer_processor_v.py:220-242``)."""
    if not text:
        return True
    if len(text) < 3:
        return True
    tu = text.upper()
    for term in JUNK_TERMS:
        if term in tu:
            return True
    if "SIGN" in tu or "SGN" in tu:
        return True
    if "BEARER" in tu or "ORDER" in tu:
        return True
    return False


def is_garbage(text: str | None) -> bool:
    """OCR-garbage predicate (``issuer_processor_v.py:116-139``)."""
    if not text:
        return True
    letters = len(_LETTERS.findall(text))
    digits = len(_DIGITS.findall(text))
    if letters < 3:
        return True
    if digits > letters:
        return True
    if _REPEAT_OIZ.search(text):
        return True
    for pat in _GARBAGE_PATTERNS:
        if pat.match(text):
            return True
    return False


def score_name(text: str) -> float:
    """Name plausibility score, capped at 1.0 (``issuer_processor_v.py:142-159``)."""
    score = 0.0
    words = text.split()
    if 2 <= len(words) <= 5:
        score += 0.3
    if all(w.isalpha() for w in words):
        score += 0.3
    common_matches = sum(1 for w in words if w.upper() in COMMON_NAME_PARTS)
    if common_matches > 0:
        score += 0.2 * common_matches
    return min(score, 1.0)


def contains_bank_keyword(text: str) -> bool:
    """Bank-term membership (``issuer_processor_v.py:161-166``)."""
    tu = text.upper()
    return any(term in tu for term in BANK_TERMS)


def is_valid_drawer(text: str) -> bool:
    """Composite drawer-name validator (``issuer_processor_v.py:245-349``).

    Branch order matters and is preserved exactly; input is expected to
    be the ``clean_text``-normalized (upper-case) line.
    """
    if is_junk_text(text):
        return False
    if contains_bank_keyword(text):
        return False
    if "BANK" in text:
        return False
    if "PLEASE" in text:
        return False
    if text.count(".") > 2 and "M/S" not in text and "M/S." not in text:
        return False
    if any(loc in text for loc in _LOCATION_KEYWORDS):
        return False

    alpha = sum(c.isalpha() for c in text)
    digits = sum(c.isdigit() for c in text)
    total = len(text)
    if total == 0:
        return False
    if digits > alpha and alpha < 4:
        return False
    if total > 6 and alpha / total < 0.45:
        return False
    bank_hits = sum(1 for term in BANK_TERMS if term in text)
    if bank_hits > 0 and alpha < 8:
        return False

    words = text.split()
    if len(text) < 5:
        return False

    digits = sum(c.isdigit() for c in text)
    letters = sum(c.isalpha() for c in text)
    if digits >= 3:
        return False

    if " " not in text and digits == 0 and letters >= 5:
        if not is_garbage(text):
            pass
        else:
            return False
    elif " " not in text and digits > 0:
        return False

    if "NOTOVER" in text:
        return False
    if "NOT OVER" in text:
        return False
    if "RS" in text and len(words) <= 3:
        return False
    if "/" in text and "M/S" not in text and "M/S." not in text:
        return False
    if "-" in text and len(text.split("-")) > 3:
        return False
    if "." in text and not any(c.isalpha() for c in text.replace(".", "")):
        return False

    digits = sum(c.isdigit() for c in text)
    letters = sum(c.isalpha() for c in text)
    if digits > letters:
        return False
    if letters / len(text) < 0.6:
        return False
    if is_garbage(text):
        return False
    return True


def looks_like_real_name(text: str | None) -> bool:
    """Final-gate name validator (``issuer_processor_v.py:499-550``)."""
    if not text or text == "XXX":
        return False

    letters = sum(c.isalpha() for c in text)
    digits = sum(c.isdigit() for c in text)
    total = len(text)

    if digits > letters and letters < 5:
        return False
    if total < 4 and text.upper() not in _SHORT_NAME_WHITELIST:
        return False
    special = sum((not c.isalnum()) and c != " " for c in text)
    if special > 3:
        return False
    if is_garbage(text):
        return False

    tu = text.upper()
    for s in _SUSPICIOUS_REAL_NAME:
        if s in tu and len(s) > len(text) / 2:
            return False

    words = tu.split()
    common_matches = sum(1 for w in words if w in COMMON_NAME_PARTS)
    if common_matches == 0 and len(words) >= 2:
        for w in words:
            if len(w) < 2 or is_garbage(w):
                return False
    elif common_matches == 0 and len(words) == 1:
        if len(text) < 5 or is_garbage(text):
            return False
    return True


# --- V3 lenient business-name validator ------------------------------
# Mirrors IssuerBatchProcessorV3.py:201-257 (is_valid_business_name +
# its is_valid_drawer wrapper).  Used only by the V3 status-ladder
# variant (oracle.v3_status); the junk check reuses the frozen v1
# is_junk_text (SURVEY.md §7.5 freezes one junk-semantic set — V3's
# 45-regex JUNK_PATTERNS variant is a documented deviation).
_V3_BANK_NAMES = (
    "BANK", "STATE BANK", "HDFC", "ICICI", "SBI", "AXIS",
    "YES BANK", "IDFC", "KOTAK", "INDUSIND", "PNB", "CANARA",
    "UNION BANK", "BOB", "BARODA", "SYNDICATE", "CORPORATION",
    "BANK OF INDIA", "BANK OF BARODA", "PUNJAB NATIONAL BANK",
)


def is_valid_business_name_v3(text: str | None) -> bool:
    """V3's composition-based validator (min length 3, bank-dominance
    rejection, alpha-ratio rules) — IssuerBatchProcessorV3.py:201-242."""
    if not text or len(text) < 3:
        return False
    if is_junk_text(text):
        return False

    text_upper = text.upper()
    for bank in _V3_BANK_NAMES:
        if bank in text_upper and len(bank) >= len(text_upper) * 0.7:
            return False

    alpha_count = sum(1 for c in text if c.isalpha())
    digit_count = sum(1 for c in text if c.isdigit())
    if digit_count > 0 and alpha_count == 0:
        return len(text) >= 8  # pure numbers: account-number length only
    total_chars = len(text)
    if alpha_count > 0:
        alpha_ratio = alpha_count / total_chars
        if alpha_ratio < 0.3 and total_chars > 5:
            return digit_count > 5
    return True


def is_valid_drawer_v3(text: str | None) -> bool:
    """V3's is_valid_drawer wrapper (IssuerBatchProcessorV3.py:244-257).

    The reference wrapper re-runs the length and junk checks that
    is_valid_business_name_v3 already performs first, so delegating is
    behavior-identical and skips a redundant junk-regex pass in the
    hot extraction path."""
    return is_valid_business_name_v3(text)
