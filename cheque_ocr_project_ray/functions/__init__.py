"""Pure per-row semantic operators.

Every function here is a pure function of its inputs (no actor/global
state), so the same code is used by BOTH the row-at-a-time oracle
(``cheque_ocr_project_ray.oracle``) and the Ray Data batch stages —
the pipeline is tested against the oracle's composition order, not
against these leaf functions.
"""

from cheque_ocr_project_ray.functions.textnorm import clean_text, collapse_ws
from cheque_ocr_project_ray.functions.validators import (
    JUNK_TERMS,
    BANK_TERMS,
    COMMON_NAME_PARTS,
    is_junk_text,
    is_garbage,
    is_valid_drawer,
    looks_like_real_name,
    score_name,
    contains_bank_keyword,
)
from cheque_ocr_project_ray.functions.payee import (
    clean_payee,
    extract_payee_from_text,
    extract_all_fields,
)
from cheque_ocr_project_ray.functions.classifier import classify_cheque, extract_micr
from cheque_ocr_project_ray.functions.govt_rules import enforce_payee_rule
from cheque_ocr_project_ray.functions.issuer import (
    extract_issuer,
    resolve_issuer,
    match_name,
)

__all__ = [
    "clean_text",
    "collapse_ws",
    "JUNK_TERMS",
    "BANK_TERMS",
    "COMMON_NAME_PARTS",
    "is_junk_text",
    "is_garbage",
    "is_valid_drawer",
    "looks_like_real_name",
    "score_name",
    "contains_bank_keyword",
    "clean_payee",
    "extract_payee_from_text",
    "extract_all_fields",
    "classify_cheque",
    "extract_micr",
    "enforce_payee_rule",
    "extract_issuer",
    "resolve_issuer",
    "match_name",
]
