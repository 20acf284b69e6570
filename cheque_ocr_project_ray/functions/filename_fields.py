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


def filename_fields_batch(batch):
    """Vectorized M23 over an Arrow batch with an ``image_file``
    column — ``pc.extract_regex`` kernels, no Python row loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    files = batch["image_file"]

    def extract(pattern: str, group: str, default: str):
        res = pc.struct_field(
            pc.extract_regex(files, f"(?P<{group}>{pattern})"), group)
        return pc.fill_null(res, default)

    return pa.table({
        "doc_id": batch["doc_id"],
        "image_file": files,
        "amount": extract(r"\d+\.\d{2}", "amount", "0.00"),
        "account": extract(r"\d+", "account", "0"),
        "date": extract(r"\d{8}", "date", ""),
    })
