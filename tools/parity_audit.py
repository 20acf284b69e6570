"""Programmatic semantic-parity audit: diff this engine's rule tables
against the reference's (read-only at /root/reference).

Run: python tools/parity_audit.py
Exits 0 iff every table's symmetric difference is empty (the SURVEY
§8.1 claim).  The reference is studied, never imported or executed.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

REF = Path("/root/reference")
OURS = Path(__file__).resolve().parent.parent / "cheque_ocr_project_ray"


def set_from(src: str, pattern: str) -> set[str]:
    m = re.search(pattern, src, re.S)
    if not m:
        return set()
    return set(re.findall(r"""["']([^"']+)["']""", m.group(1)))


def main() -> None:
    ref_ipv = (REF / "issuer_processor_v.py").read_text()
    our_val = (OURS / "functions" / "validators.py").read_text()
    ref_pc = (REF / "payee_cleaner.py").read_text()
    our_pay = (OURS / "functions" / "payee.py").read_text()
    ref_gr = (REF / "government_payee_rules.py").read_text()
    our_gr = (OURS / "functions" / "govt_rules.py").read_text()
    ref_cc = (REF / "cheque_classifier.py").read_text()
    our_cc = (OURS / "functions" / "classifier.py").read_text()

    checks = [
        ("JUNK_TERMS",
         set_from(ref_ipv, r"JUNK_TERMS\s*=\s*\{(.*?)\}"),
         set_from(our_val, r"JUNK_TERMS\s*=\s*frozenset\(\{(.*?)\}\)")),
        ("BANK_TERMS",
         set_from(ref_ipv, r"BANK_TERMS\s*=\s*\{(.*?)\}"),
         set_from(our_val, r"BANK_TERMS\s*=\s*frozenset\(\{(.*?)\}\)")),
        ("COMMON_NAME_PARTS",
         set_from(ref_ipv, r"COMMON_NAME_PARTS\s*=\s*\{(.*?)\}"),
         set_from(our_val, r"COMMON_NAME_PARTS\s*=\s*frozenset\(\{(.*?)\}\)")),
        ("TITLE_PATTERNS",
         set_from(ref_pc, r"self\.titles\s*=\s*\[(.*?)\n\s*\]"),
         set_from(our_pay, r"_TITLE_PATTERNS\s*=\s*\[(.*?)\n\]")),
        ("COMPANY_SUFFIXES",
         set_from(ref_pc, r"self\.company_suffixes\s*=\s*\[(.*?)\n\s*\]"),
         set_from(our_pay, r"_SUFFIX_PATTERNS\s*=\s*\[(.*?)\n\]")),
        ("GOVT_ENTITIES",
         set_from(ref_gr, r"self\.govt_entities\s*=\s*\[(.*?)\n\s*\]"),
         set_from(our_gr, r"GOVT_ENTITIES\s*=\s*\[(.*?)\n\]")),
        ("OFFICER_DESIGNATIONS",
         set_from(ref_gr, r"self\.officer_designations\s*=\s*\[(.*?)\n\s*\]"),
         set_from(our_gr, r"_DESIGNATIONS\s*=\s*(?:\(|\[)(.*?)(?:\)|\])\n")),
    ]

    failed = 0
    for name, ref_set, our_set in checks:
        diff = ref_set ^ our_set
        status = "OK" if (ref_set and not diff) else "MISMATCH"
        if status != "OK":
            failed += 1
        print(f"{name}: ref={len(ref_set)} ours={len(our_set)} {status}"
              + (f" diff={sorted(diff)[:5]}" if diff else ""))

    micr_ref = re.findall(r"\(\\d\{9\}\)[^'\"]*", ref_cc)
    micr_our = re.findall(r"\(\\d\{9\}\)[^'\"]*", our_cc)
    micr_ok = bool(micr_ref) and micr_ref[0] == (micr_our or [None])[0]
    print(f"MICR_REGEX: {'OK' if micr_ok else 'MISMATCH'}")
    failed += 0 if micr_ok else 1

    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
