"""Table-driven unit tests for the pure semantic operators (SURVEY.md §5).

Cases are derived from the reference's constants and branch structure
(file:line citations in each operator's docstring).
"""

import pytest

from cheque_ocr_project_ray.functions.textnorm import clean_text
from cheque_ocr_project_ray.functions.validators import (
    is_garbage,
    is_junk_text,
    is_valid_drawer,
    looks_like_real_name,
    score_name,
)
from cheque_ocr_project_ray.functions.payee import (
    clean_payee,
    extract_all_fields,
    extract_payee_from_text,
)
from cheque_ocr_project_ray.functions.classifier import classify_cheque, extract_micr
from cheque_ocr_project_ray.functions.govt_rules import enforce_payee_rule
from cheque_ocr_project_ray.functions.issuer import extract_issuer, match_name, resolve_issuer
from cheque_ocr_project_ray.functions.spelling import correct_spelling
from cheque_ocr_project_ray.functions.filename_fields import (
    account_from_filename,
    amount_from_filename,
    date_from_filename,
)
from cheque_ocr_project_ray.media import decode_image, encode_image, simulate_inference


# --- M8 clean_text ---------------------------------------------------
@pytest.mark.parametrize("raw,expected", [
    (None, "XXX"),
    ("", "XXX"),
    ("raje5h kumar", "RAJESH KUMAR"),          # 5→S
    ("R0HIT|VERMA", "ROHITIVERMA"),            # 0→O, |→I
    ("A  B\tC", "A B C"),                      # whitespace collapse
    ("M/S. SHAH & CO", "M/S. SHAH & CO"),      # & . / kept
    ("naïve #x", "NA VE X"),                   # disallowed → space
    ("42 STREET", "42 STREET"),                # 2/4 digits survive
])
def test_clean_text(raw, expected):
    assert clean_text(raw) == expected


# --- M9/M10 junk & garbage ------------------------------------------
def test_junk_and_garbage():
    assert is_junk_text("")
    assert is_junk_text("AB")
    assert is_junk_text("PLEASE SIGN HERE")     # junk term
    assert is_junk_text("XYZ BEARER")           # bearer block
    assert is_junk_text("SGNX A")               # fuzzy sign
    assert not is_junk_text("RAMESH KUMAT")     # KUMAT avoids junk terms
    assert is_garbage("")
    assert is_garbage("AB")                     # <3 letters
    assert is_garbage("A1B2C 999")              # digits > letters
    assert is_garbage("WOOOOW")                 # O{4,}
    assert is_garbage("XIZIZ" + "Z" * 5)        # OIZ run
    assert not is_garbage("RAMESH KUMAR")


# --- M13 score_name --------------------------------------------------
def test_score_name():
    assert score_name("RAMESH KUMAR") == pytest.approx(0.8)  # 2 words+alpha+KUMAR
    assert score_name("X1") == pytest.approx(0.0)
    assert score_name("KUMAR SINGH DEVI") == pytest.approx(1.0)  # capped


# --- M11/M12 validators ---------------------------------------------
def test_is_valid_drawer():
    assert is_valid_drawer("RAMESH KUMAT")
    assert not is_valid_drawer("HDFC BANK LTD")       # bank
    assert not is_valid_drawer("NAGAR COLONY WEST")   # location
    assert not is_valid_drawer("AB1 23X")             # digits
    assert not is_valid_drawer("MEHT")                # <5 chars
    assert is_valid_drawer("M/S. SHAH BROS")          # M/S allows /
    assert not is_valid_drawer("A/B TRADING")         # other / rejected


def test_looks_like_real_name():
    assert looks_like_real_name("ANIL KUMAR")
    # The reference's short-form whitelist (CO/LTD/PVT/INC/M/S) is dead
    # code: 2-letter forms die at is_garbage, 3-letter at the final
    # single-word length gate — faithfully reproduced.
    assert not looks_like_real_name("CO")
    assert not looks_like_real_name("LTD")
    assert not looks_like_real_name("XXX")
    assert not looks_like_real_name("A+B+C+D+")       # specials
    assert not looks_like_real_name("OOOOO")          # garbage
    assert not looks_like_real_name("RS")             # suspicious dominates


# --- M16 clean_payee -------------------------------------------------
@pytest.mark.parametrize("raw,expected", [
    (None, "XXX"),
    ("", "XXX"),
    ("DR. ANIL KUMAR", "ANIL KUMAR"),
    ("M/S SHAH & SONS PVT LTD", "SHAH AND SONS"),
    ("ram + shyam traders", "RAM AND SHYAM"),
    ("A", "XXX"),                                # too short after clean
    ("SHRI RAM ENTERPRISES", "RAM"),
])
def test_clean_payee(raw, expected):
    assert clean_payee(raw) == expected


def test_extract_payee_cascade():
    assert extract_payee_from_text("PAY TO : ANIL KUMAR RUPEES TEN") == "ANIL KUMAR"
    assert extract_payee_from_text("ORDER OF : GEETA VERMA RS. 50") == "GEETA VERMA"
    # bank payee rejected at pattern 1; the looser pattern-3 then
    # captures the residue "TO" — faithful reference behavior
    assert extract_payee_from_text("PAY TO : STATE BANK OF INDIA") == "TO"
    assert extract_payee_from_text("") is None
    # fallback: name before RUPEES (greedy from the first capital)
    assert extract_payee_from_text("xx MOHAN LAL RUPEES") == "XX MOHAN LAL"


def test_extract_all_fields():
    text = "Date: 12.03.2026 RS. 1,500.00 A/C No 12345678901 PAY ANIL RUPEES"
    f = extract_all_fields(text)
    assert f["date"] == "12032026"
    assert f["amount"] == "12.03"  # first number match — faithful reference quirk
    assert f["account"] == "12345678901"


# --- M19 classifier --------------------------------------------------
def test_classifier_cascade():
    assert classify_cheque("GOVERNMENT ACCOUNT only").type == "GOVT_GOVT_ACCOUNT"
    c = classify_cheque("NOT TRANSFERABLE DDO")
    assert (c.type, c.government_category) == ("GOVT_NON_TRANSFERABLE", "II")
    assert classify_cheque("PAY AND ACCOUNTS OFFICE").government_category == "I"
    assert classify_cheque("BANK DRAFT x").type == "DEMAND_DRAFT"
    assert classify_cheque("PAY ORDER x").type == "MANAGERS_CHEQUE"
    assert classify_cheque("A/C PAYEE crossed").type == "CROSSED"
    assert classify_cheque("PAY SELF").type == "SELF"
    assert classify_cheque("plain text").type == "ORDER"
    # faithful substring quirks: REDDY contains DD
    assert classify_cheque("PAY TO REDDY").type == "DEMAND_DRAFT"
    # SELF only when < 15 words
    long_text = "SELF " + "w " * 20
    assert classify_cheque(long_text).type == "ORDER"


def test_extract_micr():
    assert extract_micr("x 123456789 987654321 123456 y") == \
        "123456789 987654321 123456"
    assert extract_micr("no digits") == ""


# --- M20 government rules -------------------------------------------
def test_govt_rules():
    cat3 = classify_cheque("GOVERNMENT ACCOUNT")
    assert enforce_payee_rule(cat3, "ANYONE", "") == "GOVERNMENT"
    cat2 = classify_cheque("NOT TRANSFERABLE DDO")
    assert enforce_payee_rule(cat2, None, "TREASURY OFFICER PAYMENT") == \
        "GOVERNMENT - TREASURY OFFICER"
    assert enforce_payee_rule(cat2, None, "nothing") == "GOVERNMENT OFFICER"
    cat1 = classify_cheque("CENTRAL GOVERNMENT")
    assert enforce_payee_rule(cat1, "INCOME TAX DEPARTMENT", "") == "GOVERNMENT"
    assert enforce_payee_rule(cat1, "ANIL KUMAR", "") == "ANIL KUMAR"
    assert enforce_payee_rule(cat1, None, "") == "XXX"


# --- M21/J2 issuer ---------------------------------------------------
DICT = ["ANIL KUMAR", "BATRA SCREW INDUSTRIES", "RAMESH GUPTA"]


def test_match_name():
    assert match_name("ANIL KUMAR", DICT) == ("ANIL KUMAR", 1.0)
    name, sim = match_name("ANIL KUMARR", DICT)
    assert name == "ANIL KUMAR" and sim > 0.9
    assert match_name("ZZZZZZ", DICT) == (None, 0.0)
    cache = {}
    match_name("ANIL KUMARR", DICT, cache)
    assert cache["ANIL KUMARR"][0] == "ANIL KUMAR"


def test_extract_issuer_and_gates():
    lines = [
        ("PLEASE SIGN ABOVE", 0.99, "m1"),
        ("FOR ANIL KUMAR", 0.95, "m1"),
    ]
    text, conf, score, src = extract_issuer(lines, DICT)
    assert (text, src) == ("ANIL KUMAR", "m1")
    assert score == pytest.approx(0.95 + 0.3)

    # FOR fast path beats candidate scoring and keeps RAW text
    issuer, c, src = resolve_issuer(lines, DICT, threshold=0.90)
    assert issuer == "ANIL KUMAR" and c == pytest.approx(0.95)

    # below threshold → XXX
    low = [("RAMESH GUPTA", 0.50, "m2")]
    assert resolve_issuer(low, DICT, threshold=0.90)[0] == "XXX"
    assert resolve_issuer([], DICT)[0] == "XXX"


# --- M24 V3 status ladder (IssuerBatchProcessorV3.py:446-473) --------
def test_v3_status_ladder_unit_table():
    from cheque_ocr_project_ray.oracle import v3_status

    cases = [
        # (issuer, conf, thr) -> (issuer_out, status)
        (("PLEASE SIGN ABOVE", 0.99, 0.85),
         ("PLEASE SIGN ABOVE", "JUNK-FILTERED")),   # junk beats everything
        (("RAMESH GUPTA", 0.95, 0.85),
         ("RAMESH GUPTA", "AUTO-UPDATED")),         # confident + valid
        (("ABC", 0.95, 0.85), ("ABC", "REVIEW-SHORT")),  # short alpha name
        (("LTD", 0.95, 0.85), ("LTD", "AUTO-UPDATED")),  # whitelisted short
        (("1234567", 0.95, 0.85),
         ("1234567", "INVALID-TEXT")),              # 7 pure digits: below
                                                    # V3's 8-digit account rule
        (("HDFC BANK", 0.95, 0.85),
         ("HDFC BANK", "JUNK-FILTERED")),           # bank term = junk (v1 set)
        (("RAMESH GUPTA", 0.50, 0.85),
         ("RAMESH GUPTA", "REVIEW")),               # valid, low confidence
        (("XXX", 0.0, 0.85), ("XXX", "NO-TEXT")),   # no candidate
    ]
    for (issuer, conf, thr), expected in cases:
        assert v3_status(issuer, conf, thr) == expected, (issuer, conf)


# --- M22/M23 ---------------------------------------------------------
def test_spelling_and_filename_fields():
    assert correct_spelling("STEELNDUSTRIES") == "Steel Industries"
    assert correct_spelling(None) == "UNKNOWN"
    assert correct_spelling("RS") == "UNKNOWN"
    assert amount_from_filename("P_123_159899.00.tiff") == "159899.00"
    assert account_from_filename("P_40233770.tiff") == "40233770"
    assert date_from_filename("23022026_x.tiff") == "23022026"
    assert date_from_filename("nodate.tiff") == ""


# --- media codec -----------------------------------------------------
def test_media_codec_roundtrip():
    lines = [("FOR ANIL KUMAR", 0.9512), ("junk", 0.33)]
    payload = encode_image(lines, 1600, 700, 8000, seed=7)
    assert len(payload) == 8000
    out, w, h = decode_image(payload)
    assert (w, h) == (1600, 700)
    assert out == [("FOR ANIL KUMAR", 0.9512), ("junk", 0.33)]
    # deterministic and payload-dependent
    assert simulate_inference(payload, 4) == simulate_inference(payload, 4)
    payload2 = encode_image(lines, 1600, 700, 8000, seed=8)
    assert simulate_inference(payload, 4) != simulate_inference(payload2, 4)
