"""Deterministic AI-ensemble field scoring (operators A2/A3, SURVEY.md
§2.3 — the reference's EP3 entry point rebuilt without models).

Mirrors ``ai_processor.py`` structurally, replacing each model with a
deterministic rule stand-in (this sandbox has no torch/transformers —
the SAME replacement strategy SURVEY §7.1 applied to PaddleOCR):

* NER candidates      — ``extract_with_ner`` (ai_processor.py:146-186):
  BERT entity spans → rule-scored name phrases; the ±50-char keyword
  context boost (score × 1.5, capped 1.0) is preserved verbatim.
* spelling correction — ``correct_spelling_ai`` (:188-216): T5 →
  the M22 fixed-map corrector; the word-overlap confidence formula
  (matches / len(original_words)) and the <3-char early-out (conf 0.5)
  are the reference's own.
* context score       — ``understand_context`` (:218-243): zero-shot
  BART → a bounded rule score (0.5 neutral baseline, the reference's
  own fallback value, adjusted by name plausibility and junk evidence).
* ensemble            — ``extract_payee_ai``/``extract_issuer_ai``
  (:229-293): conf = ner·0.5 + spelling·0.2 + context·0.3; PAY/FOR
  pattern fallback at conf·0.7 (:294-334); FAILED → 0.1.
* overall             — ``process_cheque`` (:356-361):
  payee·0.4 + issuer·0.4 + ocr·0.2, rounded to 3.

The advertised weight dict {ocr:.3, ner:.4, context:.2, spelling:.1}
(ai_processor.py:73-78) is carried as ``CONFIDENCE_WEIGHTS`` for parity
with the reference's config surface; note the reference's own code
never applies it — its hardcoded per-field formula is the .5/.2/.3
above, which this module reproduces.

Everything here is a pure function of the input text, so the same code
runs in the sequential expected-table generator and the distributed
stage (the pipeline/oracle comparison then checks the composition).
"""

from __future__ import annotations

import re

from cheque_ocr_project_ray.functions.spelling import correct_spelling
from cheque_ocr_project_ray.functions.validators import (
    contains_bank_keyword,
    is_junk_text,
    score_name,
)

CONFIDENCE_WEIGHTS = {"ocr": 0.3, "ner": 0.4, "context": 0.2,
                      "spelling": 0.1}

# ai_processor.py:97-102 — keyword context per entity type.
ENTITY_PATTERNS = {
    "PAYEE": ("PAY", "PAYEE", "ORDER OF", "BENEFICIARY"),
    "ISSUER": ("FOR", "AUTHORISED", "SIGNATORY", "DRAWER"),
    "AMOUNT": ("RUPEES", "RS", "AMOUNT", "TOTAL"),
    "DATE": ("DATE", "DT"),
}

# Candidate span stand-in: maximal runs of >=3-letter alphabetic words
# (what a token-classification NER would tag as entity words in this
# upper-cased OCR text).
_PHRASE = re.compile(r"[A-Z]{3,}(?: [A-Z]{3,})*")

# Words that head field labels, not names — excluded from candidacy so
# the stand-in doesn't "tag" the template text around the real entities.
_LABEL_WORDS = frozenset((
    "PAY", "PAYEE", "ORDER", "BENEFICIARY", "RUPEES", "ONLY", "DATE",
    "FOR", "THE", "AND", "AMOUNT", "TOTAL", "BEARER", "ACCOUNT",
    "HUNDRED", "THOUSAND", "LAKH", "LAKHS", "CRORE", "MILLION",
    "ONE", "TWO", "THREE", "FOUR", "FIVE", "SIX", "SEVEN", "EIGHT",
    "NINE", "TEN", "TWENTY", "THIRTY", "FORTY", "FIFTY", "SIXTY",
    "SEVENTY", "EIGHTY", "NINETY", "FIFTEEN",
))


def ner_candidates(text: str, entity_type: str) -> list[dict]:
    """Rule stand-in for ``extract_with_ner`` (ai_processor.py:146-186).

    Emits ``{text, confidence, position}`` candidates sorted by
    confidence descending (stable — document order on ties, matching
    the reference's stable ``sorted``).  Base confidence is the M13
    name-plausibility score mapped into NER-score space
    (0.35 + 0.6·score_name ∈ [0.35, 0.95] — a deterministic stand-in
    for the softmax confidence); the keyword boost is the reference's:
    ×1.5 capped at 1.0 when an entity keyword appears within the
    ±50-char context window.
    """
    if not text:
        return []
    keywords = ENTITY_PATTERNS.get(entity_type, ())
    tu = text.upper()
    out = []
    for m in _PHRASE.finditer(tu):
        # label words BREAK a phrase (they head template text, they are
        # not part of a name) — never joined across
        sub: list[list[str]] = [[]]
        for w in m.group(0).split():
            if w in _LABEL_WORDS:
                if sub[-1]:
                    sub.append([])
            else:
                sub[-1].append(w)
        for words in sub:
            if not words:
                continue
            cand = " ".join(words)
            if len(cand) < 4 or is_junk_text(cand):
                continue
            score = 0.35 + 0.6 * score_name(cand)
            context = tu[max(0, m.start() - 50):min(len(tu),
                                                    m.end() + 50)]
            for kw in keywords:
                if kw in context:
                    score = min(1.0, score * 1.5)
                    break
            out.append({"text": cand, "confidence": round(score, 6),
                        "position": (m.start(), m.end())})
    out.sort(key=lambda c: c["confidence"], reverse=True)
    return out


def correct_spelling_ai(text: str) -> tuple[str, float]:
    """Stand-in for the T5 leg (ai_processor.py:188-216): the M22
    deterministic corrector supplies the corrected string; the
    confidence is the reference's own word-overlap formula."""
    if len(text) < 3:
        return text, 0.5
    corrected = correct_spelling(text).upper()
    original_words = text.split()
    corrected_words = corrected.split()
    if not original_words:
        return text, 0.5
    matches = sum(1 for o, c in zip(original_words, corrected_words)
                  if o.upper() == c.upper())
    return corrected, matches / len(original_words)


def understand_context(text: str, field: str) -> float:
    """Stand-in for the zero-shot classifier (ai_processor.py:218-243).

    Bounded [0,1]; 0.5 is the reference's own neutral fallback.  The
    rule evidence: name plausibility raises, junk/bank evidence lowers
    ("is this text likely a {field} name on a cheque").
    """
    if not text:
        return 0.5
    score = 0.5 + 0.4 * score_name(text)
    if is_junk_text(text):
        score -= 0.3
    if contains_bank_keyword(text):
        score -= 0.2
    return round(min(1.0, max(0.0, score)), 6)


def _extract_with_fallback(text: str, field_type: str) -> dict:
    """Pattern + "AI" fallback (ai_processor.py:294-334): split on the
    field's anchor keyword, spelling-correct the tail, conf × 0.7."""
    tu = text.upper()
    anchor = "PAY" if field_type == "PAYEE" else "FOR"
    if anchor in tu:
        parts = tu.split(anchor)
        if len(parts) > 1:
            candidate = parts[1].strip()
            corrected, conf = correct_spelling_ai(candidate)
            return {"text": corrected.title(), "raw": candidate,
                    "confidence": round(conf * 0.7, 6),
                    "method": "PATTERN_AI"}
    return {"text": "UNKNOWN", "raw": "", "confidence": 0.1,
            "method": "FAILED"}


def extract_field_ai(text: str, field_type: str) -> dict:
    """``extract_payee_ai`` / ``extract_issuer_ai``
    (ai_processor.py:229-293): top NER candidate → spelling leg →
    context leg → hardcoded .5/.2/.3 ensemble; Title-cased output."""
    candidates = ner_candidates(text, field_type)
    if not candidates:
        return _extract_with_fallback(text, field_type)
    best = candidates[0]
    corrected, spell_conf = correct_spelling_ai(best["text"])
    context_conf = understand_context(corrected, field_type.lower())
    confidence = (best["confidence"] * 0.5
                  + spell_conf * 0.2
                  + context_conf * 0.3)
    return {"text": corrected.title(), "raw": best["text"],
            "confidence": round(confidence, 3), "method": "AI_NER"}


def process_cheque_ai(full_text: str, ocr_confidence: float) -> dict:
    """``process_cheque`` (ai_processor.py:336-381) minus the I/O: the
    flat result row for one document."""
    payee = extract_field_ai(full_text, "PAYEE")
    issuer = extract_field_ai(full_text, "ISSUER")
    overall = (payee["confidence"] * 0.4
               + issuer["confidence"] * 0.4
               + ocr_confidence * 0.2)
    return {
        "payee_ai": payee["text"],
        "payee_conf_ai": payee["confidence"],
        "payee_method": payee["method"],
        "issuer_ai": issuer["text"],
        "issuer_conf_ai": issuer["confidence"],
        "issuer_method": issuer["method"],
        "overall_conf_ai": round(overall, 3),
    }
