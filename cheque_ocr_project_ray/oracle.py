"""Row-at-a-time reference oracle — the judged semantic contract.

``reference_extract(doc, media_lookup, drawer_dict)`` composes the pure
operators in ``functions/`` in exactly the reference's order
(``ocr_engine.py:109-192`` for classify/payee,
``issuer_processor_v.py:450-496,593-664`` for issuer/status) and emits
the fixed-order output span sequence defined in SURVEY.md §7.1:

  offset 0  field:cheque_type   ChequeType value ('' if no text)
  offset 1  field:govt_category 'I'|'II'|'III' or ''
  offset 2  field:payee         cleaned payee (govt rules applied)
  offset 3  field:issuer        issuer[:50]; media_ref = source image span
  offset 4  field:status        'AUTO-UPDATED'|'REJECTED'|'ERROR' (:20)
  offset 5  field:micr          MICR triplet or ''
  offset 6  field:amount        parsed amount or ''
  offset 7  field:date          parsed date DDMMYYYY or ''

Pytest asserts the Ray pipeline's ``spans_out`` equals this oracle's
output per row under span-sequence equality (kind, text, media_ref,
order) — the BASELINE.json per-row invariant.

Document semantics (the Lance-shaped input of BASELINE.json input_hint):
spans are ordered by ``offset``; ``kind='text'`` spans carry zone text,
``kind='image'`` spans reference media whose decoded bytes are the OCR
line list.  ``full_text`` = the text spans' text and the image spans'
OCR line texts, in span order, space-joined (mirrors
``ocr_engine.py:86-96`` which joins OCR lines with ' ').
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Sequence

from cheque_ocr_project_ray.functions.classifier import classify_cheque, extract_micr
from cheque_ocr_project_ray.functions.govt_rules import enforce_payee_rule
from cheque_ocr_project_ray.functions.issuer import (
    OcrLine,
    extract_issuer,
    resolve_issuer,
)
from cheque_ocr_project_ray.functions.payee import (
    clean_payee,
    extract_all_fields,
    extract_payee_from_text,
)

Span = tuple[str, str, str, int]  # (kind, text, media_ref, offset)

FIELD_ORDER = (
    "field:cheque_type",
    "field:govt_category",
    "field:payee",
    "field:issuer",
    "field:status",
    "field:micr",
    "field:amount",
    "field:date",
)


def assemble_document(
    spans: Sequence[Mapping],
    media_lookup: Callable[[str], Sequence[tuple[str, float]]],
) -> tuple[str, list[OcrLine]]:
    """(full_text, ocr_lines) for one document.

    ``media_lookup(media_ref)`` returns the decoded ordered OCR line
    list for an image span (the OCR stand-in, SURVEY.md §7.1).
    """
    ordered = sorted(spans, key=lambda s: s["offset"])
    parts: list[str] = []
    ocr_lines: list[OcrLine] = []
    for span in ordered:
        if span["kind"] == "text":
            if span["text"]:
                parts.append(span["text"])
        elif span["kind"] == "image":
            lines = media_lookup(span["media_ref"])
            for text, conf in lines:
                parts.append(text)
                ocr_lines.append((text, float(conf), span["media_ref"]))
    return " ".join(parts), ocr_lines


# Short names V3 exempts from the REVIEW-SHORT demotion
# (IssuerBatchProcessorV3.py:452).
_V3_SHORT_WHITELIST = ("LTD", "PVT", "INC", "CO.")


def v3_status(issuer: str, conf: float, threshold: float = 0.85,
              *, is_junk=None, is_valid=None) -> tuple[str, str]:
    """The V3 seven-state status ladder (IssuerBatchProcessorV3.py:
    446-473), as a pure per-row function → ``(issuer, status)``.

    ``issuer == "XXX"`` is this engine's NO_VALID_TEXT sentinel.  The
    reference's AUTO-UPDATED vs MATCHED-NO-UPDATE split depends on
    whether the DBF row existed; the engine's join-write always has a
    metadata row per doc, so the matched branch is AUTO-UPDATED (the
    MATCHED-NO-UPDATE state is unreachable by construction — deviation
    documented here).  The validator is V3's own lenient
    ``is_valid_drawer`` (IssuerBatchProcessorV3.py:244-257) — the
    strict v1 validator would make REVIEW-SHORT unreachable (it
    rejects every name under 5 chars).
    """
    from cheque_ocr_project_ray.functions.validators import (
        is_junk_text, is_valid_drawer_v3)
    is_junk = is_junk or is_junk_text
    is_valid = is_valid or is_valid_drawer_v3

    if issuer != "XXX" and is_junk(issuer):
        return issuer, "JUNK-FILTERED"
    if conf >= threshold and issuer and issuer != "XXX":
        if is_valid(issuer):
            if (len(issuer) <= 4 and issuer.isalpha()
                    and issuer not in _V3_SHORT_WHITELIST):
                return issuer, "REVIEW-SHORT"
            return issuer, "AUTO-UPDATED"
        return issuer, "INVALID-TEXT"
    if issuer and issuer != "XXX" and is_valid(issuer):
        return issuer, "REVIEW"
    return "XXX", "NO-TEXT"


def extract_fields(
    full_text: str,
    ocr_lines: Sequence[OcrLine],
    drawer_dict: Sequence[str],
    threshold: float = 0.90,
    match_cache: Optional[dict] = None,
    status_ladder: str = "v1",
) -> dict:
    """Field extraction given assembled text + OCR lines.

    This is the single code path shared by the oracle and the Ray
    extraction stage — the pipeline/oracle comparison tests that the
    DISTRIBUTED composition (batching, actor pools, shuffles,
    checkpoint/resume) preserves it row-for-row.
    """
    # "No text detected" early-out (ocr_engine.py:132-135; V3 labels
    # the same outcome NO-TEXT, IssuerBatchProcessorV3.py:471-473).
    if not ocr_lines and not full_text:
        return {
            "cheque_type": "",
            "is_government": False,
            "govt_category": "",
            "payee_raw": "",
            "payee": "XXX",
            "issuer": "XXX",
            "issuer_conf": 0.0,
            "issuer_src": "",
            "confidence": 0.0,
            "status": "NO-TEXT" if status_ladder == "v3" else "REJECTED",
            "micr": "",
            "amount": "",
            "date": "",
        }

    classification = classify_cheque(full_text)

    payee_raw = extract_payee_from_text(full_text)
    if classification.is_government:
        payee = enforce_payee_rule(classification, payee_raw, full_text)
    else:
        payee = clean_payee(payee_raw) if payee_raw else "XXX"

    confidences = [c for _, c, _ in ocr_lines]
    confidence = sum(confidences) / len(confidences) if confidences else 0.0

    if status_ladder == "v3":
        # V3 variant: v1's scored-candidate machinery (extract_issuer)
        # feeds the V3 SEVEN-STATE ladder.  DOCUMENTED DEVIATION: the
        # reference V3 ranks candidates by raw OCR confidence and
        # fuzzy-matches only the top one at cascaded cutoffs
        # 0.85/0.80/0.75 (IssuerBatchProcessorV3.py:319-355); this
        # engine deliberately keeps ONE candidate selector (v1's
        # score-ranked extract_issuer, single 0.78 cutoff) across both
        # ladders — the frozen-v1-semantics decision of SURVEY §2.10 —
        # so the v3 config varies only the STATUS LADDER, not the
        # selection.  v1's raw-text FOR fast path is still not applied
        # here (V3's process_image has none; :357-393 handles FOR only
        # via remove_prefixes).  The pre-gate candidate is needed
        # because REVIEW vs NO-TEXT is decided on the candidate
        # resolve_issuer would have discarded (ladder: :446-473).
        cand_text, cand_conf, _score, cand_src = extract_issuer(
            ocr_lines, drawer_dict, cache=match_cache)
        issuer, status = v3_status(cand_text, cand_conf,
                                   threshold=threshold)
        issuer_conf = cand_conf if issuer != "XXX" else 0.0
        issuer_src = cand_src if issuer != "XXX" else ""
    else:
        issuer, issuer_conf, issuer_src = resolve_issuer(
            ocr_lines, drawer_dict, threshold=threshold, cache=match_cache
        )
        status = "AUTO-UPDATED" if issuer != "XXX" else "REJECTED"

    fields = extract_all_fields(full_text)

    return {
        "cheque_type": classification.type,
        "is_government": classification.is_government,
        "govt_category": classification.government_category or "",
        "payee_raw": payee_raw or "",
        "payee": payee,
        "issuer": issuer[:50],
        "issuer_conf": issuer_conf,
        "issuer_src": issuer_src,
        "confidence": confidence,
        "status": status[:20],
        "micr": extract_micr(full_text),
        "amount": fields.get("amount", ""),
        "date": fields.get("date", ""),
    }


def fields_to_spans(fields: Mapping) -> list[Span]:
    """Fixed-order output span sequence (SURVEY.md §7.1)."""
    values = (
        fields["cheque_type"],
        fields["govt_category"],
        fields["payee"],
        fields["issuer"],
        fields["status"],
        fields["micr"],
        fields["amount"],
        fields["date"],
    )
    refs = ("", "", "", fields["issuer_src"], "", "", "", "")
    return [
        (kind, str(val), ref, i)
        for i, (kind, val, ref) in enumerate(zip(FIELD_ORDER, values, refs))
    ]


def error_fields() -> dict:
    """Per-row ERROR semantics: an undecodable media span fails the
    whole document deterministically (the reference's per-image
    try/except → error row, ``issuer_processor_v.py:662-664`` /
    ``ocr_engine.py:113-126`` success=False path) instead of failing
    the task."""
    return {
        "cheque_type": "",
        "is_government": False,
        "govt_category": "",
        "payee_raw": "",
        "payee": "XXX",
        "issuer": "XXX",
        "issuer_conf": 0.0,
        "issuer_src": "",
        "confidence": 0.0,
        "status": "ERROR",
        "micr": "",
        "amount": "",
        "date": "",
    }


def reference_extract(
    doc: Mapping,
    media_lookup: Callable[[str], Sequence[tuple[str, float]]],
    drawer_dict: Sequence[str],
    threshold: float = 0.90,
    status_ladder: str = "v1",
) -> list[Span]:
    """The per-row oracle: doc row → output span sequence."""
    try:
        full_text, ocr_lines = assemble_document(doc["spans"], media_lookup)
    except Exception:
        # ANY malformed payload poisons only its row (same contract as
        # OcrStage: bad magic → ValueError, truncated header →
        # struct.error, wrong JSON shape → KeyError/TypeError)
        return fields_to_spans(error_fields())
    fields = extract_fields(full_text, ocr_lines, drawer_dict,
                            threshold=threshold, status_ladder=status_ladder)
    return fields_to_spans(fields)
