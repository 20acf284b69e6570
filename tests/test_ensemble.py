"""AI-ensemble stand-in (A2/A3, `functions/ensemble.py`): unit tables
for each leg against the reference formulas (ai_processor.py:146-381),
plus the distributed-composition check — the Ray AI pipeline equals the
sequential per-row function on the sf0.001 corpus."""

import pytest

from cheque_ocr_project_ray.functions.ensemble import (
    correct_spelling_ai,
    extract_field_ai,
    ner_candidates,
    process_cheque_ai,
    understand_context,
)

TEXT = ("PAY TO : DEEPAK MITTAL RUPEES FIVE THOUSAND ONLY "
        "FOR BATRA SCREW Date: 02.08.2026")


def test_ner_candidates_keyword_boost_and_order():
    cands = ner_candidates(TEXT, "PAYEE")
    texts = [c["text"] for c in cands]
    assert "DEEPAK MITTAL" in texts and "BATRA SCREW" in texts
    # descending confidence; both near keywords → boosted ×1.5 cap 1.0
    confs = [c["confidence"] for c in cands]
    assert confs == sorted(confs, reverse=True)
    assert confs[0] == 1.0


def test_ner_candidates_label_words_break_phrases():
    # RUPEES/FIVE/THOUSAND/ONLY separate the two names — never a
    # merged "DEEPAK MITTAL BATRA SCREW" candidate
    merged = [c["text"] for c in ner_candidates(TEXT, "ISSUER")]
    assert all("DEEPAK" not in t or "BATRA" not in t for t in merged)


def test_ner_empty_text():
    assert ner_candidates("", "PAYEE") == []


def test_correct_spelling_ai_reference_formula():
    # <3 chars: early-out at the reference's 0.5
    assert correct_spelling_ai("AB") == ("AB", 0.5)
    # unchanged words → conf 1.0
    corrected, conf = correct_spelling_ai("DEEPAK MITTAL")
    assert corrected == "DEEPAK MITTAL" and conf == 1.0
    # one of two words changed by the M22 map → conf 0.5
    corrected, conf = correct_spelling_ai("DEEPAK ENTENPES")
    assert corrected == "DEEPAK ENTERPRISES" and conf == 0.5


def test_understand_context_bounded():
    for t in ("", "DEEPAK MITTAL", "STATE BANK OF INDIA", "XX12@@"):
        assert 0.0 <= understand_context(t, "payee") <= 1.0
    # a plausible name scores above the neutral 0.5 fallback
    assert understand_context("DEEPAK MITTAL", "payee") > 0.5


def test_extract_field_ai_ensemble_weights():
    r = extract_field_ai(TEXT, "PAYEE")
    assert r["method"] == "AI_NER"
    cand = ner_candidates(TEXT, "PAYEE")[0]
    corrected, spell = correct_spelling_ai(cand["text"])
    ctx = understand_context(corrected, "payee")
    want = round(cand["confidence"] * 0.5 + spell * 0.2 + ctx * 0.3, 3)
    assert r["confidence"] == want
    assert r["text"] == corrected.title()


def test_extract_field_ai_pattern_fallback_and_failed():
    # no candidate phrases, but a PAY anchor → PATTERN_AI at conf·0.7
    r = extract_field_ai("PAY RS 12", "PAYEE")
    assert r["method"] == "PATTERN_AI"
    # nothing at all → FAILED at the reference's 0.1
    r = extract_field_ai("12345", "ISSUER")
    assert r == {"text": "UNKNOWN", "raw": "", "confidence": 0.1,
                 "method": "FAILED"}


def test_process_cheque_ai_overall_weights():
    r = process_cheque_ai(TEXT, 0.9)
    want = round(r["payee_conf_ai"] * 0.4 + r["issuer_conf_ai"] * 0.4
                 + 0.9 * 0.2, 3)
    assert r["overall_conf_ai"] == want


@pytest.fixture(scope="module")
def ai_rows():
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    from cheque_ocr_project_ray.pipelines.cheque import build_ai_pipeline
    fixture = ensure_fixture("/root/testdata/sf0.001")
    df = build_ai_pipeline(fixture).to_pandas()
    return fixture, df.sort_values("doc_id").reset_index(drop=True)


def test_ai_pipeline_matches_sequential(ai_rows):
    """Distributed composition == sequential per-row ensemble (the
    same invariant the span suite asserts for the extract flow)."""
    from cheque_ocr_project_ray.fixtures.expected import ensure_expected
    import pyarrow.parquet as pq

    fixture, df = ai_rows
    exp = pq.read_table(
        f"{ensure_expected('/root/testdata/sf0.001')}/expected.parquet"
    ).to_pandas()
    exp = exp[exp["status"] != "ERROR"].sort_values("doc_id") \
        .reset_index(drop=True)
    assert len(df) == len(exp) > 0
    for col in ("payee_ai", "payee_conf_ai", "payee_method",
                "issuer_ai", "issuer_conf_ai", "issuer_method",
                "overall_conf_ai"):
        assert df[col].tolist() == exp[col].tolist(), col
    assert df["ocr_confidence"].tolist() == exp["confidence"].tolist()


def test_ai_pipeline_drops_failed_docs(ai_rows):
    """AIWriter 'only write successful ones': error docs are absent."""
    from cheque_ocr_project_ray.fixtures.expected import ensure_expected
    import pyarrow.parquet as pq

    fixture, df = ai_rows
    exp = pq.read_table(
        f"{ensure_expected('/root/testdata/sf0.001')}/expected.parquet"
    ).to_pandas()
    errors = set(exp.loc[exp["status"] == "ERROR", "doc_id"])
    assert errors, "fixture should contain at least one ERROR doc"
    assert not errors & set(df["doc_id"])
