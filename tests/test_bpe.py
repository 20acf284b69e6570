"""BPE merge training vs the classic hand-computed example, plus the
deterministic tie-break and corpus smoke run."""

import pandas as pd
import pytest

import ray.data


def _docs(rows):
    return ray.data.from_items(
        [{"doc_id": str(i), "text": t} for i, t in enumerate(rows)])


def test_bpe_classic_example():
    """Sennrich-style toy corpus: low(x5) lower(x2) newest(x6)
    widest(x3).  Hand-computed first merges: (e,s)->es cnt 9,
    (es,t)->est cnt 9, (l,o)->lo cnt 7."""
    from cheque_ocr_project_ray.text.bpe import bpe_merges
    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
              + ["widest"] * 3)
    out = bpe_merges(_docs([" ".join(corpus)]), n_merges=3)
    got = list(zip(out["left"], out["right"], out["cnt"]))
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("l", "o", 7)


def test_bpe_tie_breaks_lexicographic():
    """'ab' and 'ba' pairs tie at count 2 in 'abab' (a-b twice, b-a
    once... use 'ab ab ba ba': (a,b)=2, (b,a)=2 → (a,b) wins)."""
    from cheque_ocr_project_ray.text.bpe import bpe_merges
    out = bpe_merges(_docs(["ab ab ba ba"]), n_merges=1)
    assert (out["left"][0], out["right"][0]) == ("a", "b")


def test_bpe_word_counts_weighting():
    """Pair counts are weighted by word frequency, not word list
    length — 'aa' appearing 3 times counts (a,a) three times."""
    from cheque_ocr_project_ray.text.bpe import bpe_merges
    out = bpe_merges(_docs(["aa aa aa zz"]), n_merges=1)
    assert (out["left"][0], out["right"][0], out["cnt"][0]) == ("a", "a", 3)


def test_bpe_corpus_smoke():
    from cheque_ocr_project_ray.text.queries import corpus_bpe_merges
    out = corpus_bpe_merges("/root/testdata/sf0.001")
    assert len(out) == 5
    assert out["cnt"].is_monotonic_decreasing or len(set(out["cnt"])) > 1
    assert (out["merged"] == out["left"] + out["right"]).all()
    # deterministic across runs
    again = corpus_bpe_merges("/root/testdata/sf0.001")
    assert out.equals(again)


def test_vocab_coverage_tiny():
    """Hand-computable curve: counts a=5 b=3 c=2 → total 10; top-1
    covers 50%, top-2 covers 80%, top-3 covers 100% → k90 = 3;
    vocab < 100 → coverage_100 = 1.0."""
    from cheque_ocr_project_ray.text.bpe import word_counts  # noqa: F401
    import ray.data
    from cheque_ocr_project_ray.text import queries as tq
    import pyarrow.parquet as pq_
    import pyarrow as pa_
    import tempfile, os
    d = tempfile.mkdtemp()
    pq_.write_table(pa_.Table.from_pylist(
        [{"doc_id": "0", "text": "a a a a a b b b c c"}]),
        os.path.join(d, "documents.parquet"))
    out = tq.corpus_vocab_coverage(d)
    row = out.iloc[0]
    assert (row["n_tokens"], row["vocab_size"], row["k90"],
            row["coverage_100"]) == (10, 3, 3, 1.0)
