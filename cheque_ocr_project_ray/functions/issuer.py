"""Issuer (drawer-name) extraction over ordered OCR lines
(operators M21 + J2 + M24, SURVEY.md §2.2-2.4).

Mirrors the reference's v1 path:
  - fuzzy dictionary match         — ``issuer_processor_v.py:359-375``
  - scored-candidate extraction    — ``issuer_processor_v.py:378-447``
  - FOR fast path + threshold gate — ``issuer_processor_v.py:450-496``

OCR lines are ``(text, conf, src)`` triples in document order; ``src``
is the media_ref of the image span the line was recognized from (the
engine carries provenance so the winning issuer span can point back at
its source image, per SURVEY.md §7.1).  ``src`` never influences
scoring, so parity with the reference is unaffected.

Determinism note (SURVEY.md §7.5): the drawer dictionary is a SORTED
list and ``difflib.get_close_matches`` is given that fixed order, so
ties break identically on every worker.
"""

from __future__ import annotations

import difflib
from typing import Optional, Sequence

from cheque_ocr_project_ray.functions.textnorm import clean_text
from cheque_ocr_project_ray.functions.validators import (
    COMMON_NAME_PARTS,
    is_valid_drawer,
    looks_like_real_name,
)

# Line-level FOR/proprietor markers (issuer_processor_v.py:394-405, 474).
FOR_MARKERS = ("FOR ", "F/O ", "F/ ", "PROP ")

_SUSPICIOUS = (
    "PLEASE", "SIGN", "ABOVE", "BEARER", "ORDER", "CTS CLEARING",
    "SAVINGSAC", "PROPRIETOR", "CURRENTAC", "A/C", "PAYEE", "ONLY",
    "NOTOVER", "NOT OVER", "RS",
)

OcrLine = tuple[str, float, str]  # (raw_text, confidence, src_media_ref)


def match_name(
    text: Optional[str],
    drawer_dict: Sequence[str],
    cache: Optional[dict] = None,
) -> tuple[Optional[str], float]:
    """Exact-then-fuzzy dictionary lookup (issuer_processor_v.py:359-375).

    ``cache`` is an optional per-actor memo (reference's match_cache,
    ``IssuerBatchProcessorV3.py:51``); the function is pure in its
    inputs so memoization never changes results.
    """
    if not text:
        return None, 0.0
    text = text.upper()
    if cache is not None and text in cache:
        return cache[text]

    if text in drawer_dict:
        result: tuple[Optional[str], float] = (text, 1.0)
    else:
        matches = difflib.get_close_matches(text, drawer_dict, n=1, cutoff=0.78)
        if not matches:
            result = (None, 0.0)
        else:
            best = matches[0]
            similarity = difflib.SequenceMatcher(None, text, best).ratio()
            result = (best, similarity)

    if cache is not None:
        cache[text] = result
    return result


def extract_issuer(
    ocr_lines: Sequence[OcrLine],
    drawer_dict: Sequence[str],
    cache: Optional[dict] = None,
) -> tuple[str, float, float, str]:
    """Scored-candidate issuer extraction (issuer_processor_v.py:378-447).

    Returns ``(text, conf, score, src)`` — the reference's triple plus
    line provenance.  ``("XXX", 0.0, -1.0, "")`` when no candidate
    survives.
    """
    if not ocr_lines:
        return "XXX", 0.0, -1.0, ""

    candidates: list[tuple[float, float, str, str]] = []

    for raw_text, conf, src in ocr_lines:
        raw_text = raw_text.strip()
        conf = float(conf)
        text = clean_text(raw_text)

        if "FOR " in text or "F/O " in text or "F/" in text or "PROP " in text:
            for marker in FOR_MARKERS:
                if marker in text:
                    parts = text.split(marker, 1)
                    if len(parts) > 1:
                        potential = parts[1].strip()
                        if is_valid_drawer(potential):
                            candidates.append((conf + 0.3, conf, potential, src))
                            break
            continue

        if not is_valid_drawer(text):
            continue

        matched, similarity = match_name(text, drawer_dict, cache)
        final_text = matched if matched else text
        score = conf
        if matched:
            score += 0.20 + (0.25 * similarity)
        words = final_text.split()
        if 2 <= len(words) <= 4:
            score += 0.15
        common_matches = sum(1 for w in words if w.upper() in COMMON_NAME_PARTS)
        if common_matches > 0:
            score += 0.1 * common_matches
        if any(s in final_text for s in _SUSPICIOUS):
            score -= 0.40
        candidates.append((score, conf, final_text, src))

    if not candidates:
        return "XXX", 0.0, -1.0, ""

    # Stable descending sort on score, ties keep line order — identical
    # to the reference's list.sort(reverse=True, key=score).
    candidates.sort(reverse=True, key=lambda c: c[0])
    best_score, best_conf, best_text, best_src = candidates[0]
    return best_text, best_conf, best_score, best_src


def resolve_issuer(
    ocr_lines: Sequence[OcrLine],
    drawer_dict: Sequence[str],
    threshold: float = 0.90,
    cache: Optional[dict] = None,
) -> tuple[str, float, str]:
    """Full issuer resolution with FOR fast path and strict gates
    (issuer_processor_v.py:450-496, image I/O removed).

    Returns ``(issuer, confidence, src_media_ref)``; ``("XXX", 0.0, "")``
    on rejection.
    """
    if not ocr_lines:
        return "XXX", 0.0, ""

    # FOR fast path over RAW line text (issuer_processor_v.py:468-481):
    # the candidate is taken from the unnormalized line.
    for raw_text, conf, src in ocr_lines:
        text = raw_text.strip()
        tu = text.upper()
        for marker in FOR_MARKERS:
            if marker in tu:
                issuer = text[tu.find(marker) + len(marker):].strip()
                issuer_conf = float(conf)
                if looks_like_real_name(issuer) and issuer_conf >= threshold:
                    return issuer, issuer_conf, src

    best_text, best_conf, _best_score, best_src = extract_issuer(
        ocr_lines, drawer_dict, cache
    )
    if best_text == "XXX":
        return "XXX", 0.0, ""
    if best_conf < threshold:
        return "XXX", 0.0, ""
    if not looks_like_real_name(best_text):
        return "XXX", 0.0, ""
    return best_text, best_conf, best_src
