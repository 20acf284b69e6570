"""doc_repetition edge cases vs a per-row Counter reference."""

from collections import Counter

import pyarrow as pa

from cheque_ocr_project_ray.text import analysis
from cheque_ocr_project_ray.util import round_half_up


def _ref(text):
    toks = text.strip().split() if text.strip() else [""]
    # regex split of "" yields [""] — mirror _token_lists semantics
    import re
    toks = re.split(r"\s+", text.strip())
    wc = Counter(toks)
    bg = Counter(" ".join(p) for p in zip(toks, toks[1:]))
    n = len(toks)
    top_b = max(bg.values()) if bg else 0
    return (n, max(wc.values()),
            float(round_half_up(max(wc.values()) / n, 4)),
            float(round_half_up(top_b / max(n - 1, 1), 4)))


def test_repetition_matches_counter_reference():
    texts = [
        "a a a a",                      # one word repeated
        "x",                            # single token: bigram frac 0
        "",                             # empty -> [''] single token
        "the cat sat on the cat mat",   # bigram 'the cat' twice
        "u v w x y z",                  # all unique
        "ab ab ab cd cd",               # mixed
        "  padded   text  here  ",      # whitespace handling
    ]
    batch = pa.table({"doc_id": list(range(len(texts))),
                      "text": texts})
    out = analysis.repetition(batch).to_pydict()
    for i, t in enumerate(texts):
        n, top, frac, bfrac = _ref(t)
        assert out["n_tokens"][i] == n, t
        assert out["top_count"][i] == top, t
        assert out["top_frac"][i] == frac, t
        assert out["bigram_top_frac"][i] == bfrac, t


def test_repetition_bigrams_do_not_cross_rows():
    # last token of row 0 + first token of row 1 must NOT form a bigram
    batch = pa.table({"doc_id": [0, 1],
                      "text": ["p q", "q p"]})
    out = analysis.repetition(batch).to_pydict()
    assert out["bigram_top_frac"] == [1.0, 1.0]  # each row's own pair
    batch2 = pa.table({"doc_id": [0, 1],
                       "text": ["p q", "q r s t"]})
    out2 = analysis.repetition(batch2).to_pydict()
    # row 1 has 3 distinct bigrams of 3 -> top frac 1/3
    assert out2["bigram_top_frac"][1] == 0.3333
