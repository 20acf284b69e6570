"""Property-based tests (hypothesis) for the pure semantic core.

These check structural invariants that hold for ANY input — the
table-driven unit tests pin the reference-derived branch behavior,
these pin robustness (no crashes, idempotence, closure properties)
across the whole input space the distributed pipeline can feed them.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cheque_ocr_project_ray.functions.classifier import classify_cheque, extract_micr
from cheque_ocr_project_ray.functions.govt_rules import enforce_payee_rule
from cheque_ocr_project_ray.functions.payee import clean_payee, extract_all_fields
from cheque_ocr_project_ray.functions.textnorm import clean_text
from cheque_ocr_project_ray.functions.validators import is_garbage, is_junk_text
from cheque_ocr_project_ray.oracle import extract_fields, fields_to_spans
from cheque_ocr_project_ray.text.dedup import shingles, simhash64

any_text = st.text(min_size=0, max_size=120)
printable = st.text(alphabet=string.printable, min_size=0, max_size=120)


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_clean_text_idempotent_and_closed(s):
    once = clean_text(s)
    # idempotent except through the reference's empty→XXX fallback
    # (clean_text('') == 'XXX', so an output of '' maps to 'XXX')
    assert clean_text(once) == (once if once else "XXX")
    assert set(once) <= set(string.ascii_uppercase + string.digits + " .,&/-")
    assert "  " not in once                               # collapsed
    assert clean_text("") == "XXX"


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_clean_payee_never_empty(s):
    out = clean_payee(s)
    assert isinstance(out, str) and len(out) >= 2         # XXX fallback


@settings(max_examples=200, deadline=None)
@given(printable)
def test_classifier_total_and_stable(s):
    c = classify_cheque(s)
    assert c.type  # always classified
    assert classify_cheque(s).type == c.type              # deterministic
    if c.is_government:
        assert c.government_category in ("I", "II", "III")
    payee = enforce_payee_rule(c, None, s)
    assert isinstance(payee, str) and payee


@settings(max_examples=200, deadline=None)
@given(printable)
def test_predicates_total(s):
    assert is_junk_text(s) in (True, False)
    assert is_garbage(s) in (True, False)
    micr = extract_micr(s)
    assert isinstance(micr, str)
    f = extract_all_fields(s)
    assert set(f) <= {"date", "amount", "account", "payee"}


@settings(max_examples=100, deadline=None)
@given(printable,
       st.lists(st.tuples(printable,
                          st.floats(0, 1, allow_nan=False)), max_size=6))
def test_extract_fields_contract(full_text, lines):
    ocr_lines = [(t, c, f"ref{i}") for i, (t, c) in enumerate(lines)]
    f = extract_fields(full_text, ocr_lines, ["ACME TRADERS"])
    spans = fields_to_spans(f)
    assert len(spans) == 8
    assert [s[3] for s in spans] == list(range(8))        # offsets fixed
    assert f["status"] in ("AUTO-UPDATED", "REJECTED")
    assert (f["status"] == "AUTO-UPDATED") == (f["issuer"] != "XXX")
    assert 0.0 <= f["confidence"] <= 1.0
    assert len(f["issuer"]) <= 50 and len(f["status"]) <= 20


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_simhash_range_and_shingles(s):
    h = simhash64(s)
    assert -(1 << 63) <= h < (1 << 63)                    # int64-safe
    assert simhash64(s) == h                              # deterministic
    sh = shingles(s, 3)
    assert all(isinstance(x, int) and 0 <= x < (1 << 32) for x in sh)


@settings(max_examples=200, deadline=None)
@given(any_text)
def test_bpe_pattern_covers_every_char(s):
    """The BPE-ish pre-tokenizer must consume the whole string: the
    concatenation of matches reconstructs the input exactly (no char
    is unmatchable), so token counts are a true partition size."""
    import re

    from cheque_ocr_project_ray.text.analysis import BPE_PATTERN
    toks = re.findall(BPE_PATTERN, s)
    assert "".join(toks) == s


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, min_size=0, max_size=200))
def test_winnow_fps_subset_of_gram_hashes(s):
    """Every winnowing fingerprint is the hash of a real k-gram of the
    doc, and the op is deterministic."""
    import hashlib

    import pyarrow as pa

    from cheque_ocr_project_ray.text import analysis
    batch = pa.table({"doc_id": [1], "text": [s]})
    out = analysis.winnow_fingerprints(batch)
    K = analysis.WINNOW_K
    grams = {int.from_bytes(
        hashlib.md5(s[i:i + K].encode("utf-8")).digest()[8:16], "little")
        for i in range(max(0, len(s) - K + 1))}
    fps = set(out.column("fp").to_pylist())
    assert fps <= grams
    if len(s) >= K:
        assert fps  # at least one window fingerprint
    out2 = analysis.winnow_fingerprints(batch)
    assert out.equals(out2)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-10**12, max_value=10**12))
def test_split_stable_and_total(doc_id):
    """Split assignment is a pure function of doc_id and always lands
    in exactly one of train/val/test with bucket < 100."""
    import pyarrow as pa

    from cheque_ocr_project_ray.text import analysis
    batch = pa.table({"doc_id": [doc_id], "text": ["x"]})
    a = analysis.train_split(batch).to_pylist()[0]
    b = analysis.train_split(batch).to_pylist()[0]
    assert a == b
    assert 0 <= a["bucket"] < 100
    assert a["split"] in ("train", "val", "test")
