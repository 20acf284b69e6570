"""Payee normalization + pattern extraction (operators M16-M18, SURVEY.md §2.2).

Semantics mirror the reference's canonical payee path:
  - ``clean_payee``              — ``payee_cleaner.py:101-145``
  - ``extract_payee_from_text``  — ``payee_cleaner.py:147-185``
  - ``extract_all_fields``       — ``payee_cleaner.py:186-210``
  - bank/metadata rejection      — ``payee_cleaner.py:212-233``

The regex tables are the reference's published cleaning rules
(``payee_cleaner.py:28-99``) — they are data, and they ARE the contract.
"""

from __future__ import annotations

import re

# Leading titles/honorifics stripped in order (payee_cleaner.py:28-65).
_TITLE_PATTERNS = [re.compile(p, re.IGNORECASE) for p in [
    r"^DR\.?\s+", r"^DR\s+",
    r"^ADV\.?\s+", r"^ADV\s+",
    r"^CA\.?\s+", r"^CA\s+",
    r"^CS\.?\s+", r"^CS\s+",
    r"^CMA\.?\s+", r"^CMA\s+",
    r"^ICWA\.?\s+", r"^ICWA\s+",
    r"^ENG\.?\s+", r"^ENG\s+",
    r"^ARCH\.?\s+", r"^ARCH\s+",
    r"^PROF\.?\s+", r"^PROF\s+",
    r"^MR\.?\s+", r"^MR\s+",
    r"^MRS\.?\s+", r"^MRS\s+",
    r"^MS\.?\s+", r"^MS\s+",
    r"^MISS\.?\s+", r"^MISS\s+",
    r"^MASTER\.?\s+", r"^MASTER\s+",
    r"^KUM\.?\s+", r"^KUMARI\.?\s+",
    r"^SMT\.?\s+", r"^SMT\s+",
    r"^SHRI\.?\s+", r"^SHRI\s+",
    r"^SHRIMATI\.?\s+", r"^SHRIMATI\s+",
    r"^M/S\.?\s+", r"^M/S\s+", r"^M/S[.]?\s*",
    r"^MESSRS\.?\s+", r"^MESSRS\s+",
    r"^MSME\.?\s+", r"^MSME\s+",
    r"^PT\.?\s+", r"^PANDIT\.?\s+",
    r"^SWAMI\.?\s+",
    r"^MAULVI\.?\s+",
    r"^MAULANA\.?\s+",
    r"^QAZI\.?\s+",
    r"^FATHER\.?\s+", r"^FR\.?\s+",
    r"^BROTHER\.?\s+", r"^BR\.?\s+",
    r"^SISTER\.?\s+", r"^SR\.?\s+",
]]

# Trailing company-form suffixes (payee_cleaner.py:68-85).
_SUFFIX_PATTERNS = [re.compile(p, re.IGNORECASE) for p in [
    r"\s+PVT\.?\s+LTD\.?$", r"\s+PVT\s+LTD\.?$",
    r"\s+PRIVATE\s+LIMITED$",
    r"\s+LTD\.?$", r"\s+LIMITED$",
    r"\s+LLP$", r"\s+LLC$",
    r"\s+INC\.?$", r"\s+INCORPORATED$",
    r"\s+CO\.?$", r"\s+COMPANY$",
    r"\s+CORP\.?$", r"\s+CORPORATION$",
    r"\s+PVT$", r"\s+PRIVATE$",
    r"\s+ENTERPRISES$", r"\s+ENTERPRISE$",
    r"\s+INDUSTRIES$", r"\s+INDUSTRY$",
    r"\s+TRADERS$", r"\s+TRADING$",
    r"\s+CONTRACTORS$", r"\s+CONTRACTOR$",
    r"\s+SUPPLIERS$", r"\s+SUPPLIER$",
    r"\s+WORKS$", r"\s+WORK$",
    r"\s+ASSOCIATES$", r"\s+ASSOCIATE$",
    r"\s+GROUP$", r"\s+HOLDINGS$",
]]

# Special-character spellings (payee_cleaner.py:88-99). Ordered dict
# iteration order matches the reference's literal.
_SPECIAL_CHARS = {
    "&": "AND",
    "＆": "AND",  # full-width ampersand
    "+": "AND",
    "@": "AT",
    "%": "PERCENT",
    "#": "NUMBER",
    "$": "DOLLAR",
    "€": "EURO",
    "£": "POUND",
    "¥": "YEN",
}

_WS = re.compile(r"\s+")
_NON_NAME_CHARS = re.compile(r"[^\w\s\.\-]")

# Payee patterns in reference priority order (payee_cleaner.py:157-175).
_PAYEE_PATTERNS = [re.compile(p) for p in [
    r"PAY\s*TO\s*[:\s]*([A-Z][A-Z\s\.]+?)(?=\s+RUPEES|\s+RS\.?|\s*$)",
    r"ORDER\s*OF\s*[:\s]*([A-Z][A-Z\s\.]+?)(?=\s+RUPEES|\s+RS\.?|\s*$)",
    r"[Pp][Aa][Yy]\s*[:\s]*([A-Z][A-Z\s\.]{2,30})",
    r"BEARER\s*[:\s]*([A-Z][A-Z\s\.]+)",
    r"OR\s*BEARER\s*[:\s]*([A-Z][A-Z\s\.]+)",
    r"FAVOUR\s+OF\s*[:\s]*([A-Z][A-Z\s\.]+)",
    r"FAVOR\s+OF\s*[:\s]*([A-Z][A-Z\s\.]+)",
    r"BENEFICIARY\s*[:\s]*([A-Z][A-Z\s\.]+)",
    r"([A-Z][A-Z\s\.]{3,30})\s+(?:RUPEES|RS\.?)",
    r"^([A-Z][A-Z\s\.]{5,50})$",
]]

_BANKS = (
    "STATE BANK", "SBI", "BANK OF", "CANARA", "PNB",
    "BOB", "HDFC", "ICICI", "AXIS", "KOTAK", "YES BANK",
    "IDBI", "UNION BANK", "INDIAN BANK", "CENTRAL BANK",
)
_METADATA_WORDS = (
    "BRANCH", "IFSC", "MICR", "CODE", "CITY", "DELHI",
    "MUMBAI", "KOLKATA", "CHENNAI", "BANGALORE",
)

_DATE_RE = re.compile(r"Date:\s*(\d{2})[./](\d{2})[./](\d{4})")
_AMOUNT_RE = re.compile(r"[₹Rs\.]*\s*([\d,]+(?:\.\d{2})?)[/\-]?")
_ACCOUNT_RE = re.compile(r"A/C No\.?[\s:]*(\d{10,20})")
_PAYEE_FIELD_RE = re.compile(r"PAY\s+([A-Z\s]+?)(?=\s+RUPEE|\s+Rs|\s+₹|$)")


def is_bank_or_metadata(text: str) -> bool:
    """Reject bank names / location metadata as payees (payee_cleaner.py:212-233)."""
    tu = text.upper()
    for bank in _BANKS:
        if bank in tu:
            return True
    for word in _METADATA_WORDS:
        if word in tu:
            return True
    return False


def clean_payee(raw_payee: str | None) -> str:
    """Full payee cleaning pipeline with XXX fallback (payee_cleaner.py:101-145)."""
    if not raw_payee:
        return "XXX"
    text = raw_payee.upper().strip()
    for pat in _TITLE_PATTERNS:
        text = pat.sub("", text)
    for char, repl in _SPECIAL_CHARS.items():
        if char in text:
            text = text.replace(char, repl)
    for pat in _SUFFIX_PATTERNS:
        text = pat.sub("", text)
    text = _WS.sub(" ", text).strip()
    text = _NON_NAME_CHARS.sub("", text)
    if not text or len(text) < 2:
        return "XXX"
    return text


def extract_payee_from_text(text: str | None) -> str | None:
    """Priority-cascade payee extraction from full OCR text (payee_cleaner.py:147-185)."""
    if not text:
        return None
    tu = text.upper()
    for pat in _PAYEE_PATTERNS:
        m = pat.search(tu)
        if m:
            candidate = m.group(1).strip()
            if not is_bank_or_metadata(candidate):
                return candidate
    return None


def extract_all_fields(text: str) -> dict[str, str]:
    """Regex parse of date/amount/account/payee fields (payee_cleaner.py:186-210).

    Applied to the RAW full text (the ``Date:`` pattern is
    case-sensitive in the reference).
    """
    fields: dict[str, str] = {}
    m = _DATE_RE.search(text)
    if m:
        fields["date"] = f"{m.group(1)}{m.group(2)}{m.group(3)}"
    m = _AMOUNT_RE.search(text)
    if m:
        fields["amount"] = m.group(1).replace(",", "")
    m = _ACCOUNT_RE.search(text)
    if m:
        fields["account"] = m.group(1)
    m = _PAYEE_FIELD_RE.search(text)
    if m:
        fields["payee"] = m.group(1).strip()
    return fields
