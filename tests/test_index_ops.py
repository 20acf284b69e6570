"""Unit tests for TF-IDF / postings / decontamination
(`text/index.py`) against hand-computed ground truth."""

import math

import numpy as np
import pytest
import ray.data

from cheque_ocr_project_ray.text import dedup, index


@pytest.fixture(scope="module")
def docs():
    rows = [
        {"doc_id": 0, "text": "apple banana apple cherry"},
        {"doc_id": 1, "text": "banana cherry cherry date"},
        {"doc_id": 2, "text": "apple apple apple egg"},
        {"doc_id": 3, "text": ""},
    ]
    return ray.data.from_items(rows)


def test_doc_frequency(docs):
    df = {r["term"]: r["df"]
          for r in index.doc_frequency(docs).take_all()}
    assert df == {"apple": 2, "banana": 2, "cherry": 2, "date": 1,
                  "egg": 1}


def test_tfidf_topk_matches_manual(docs):
    out = index.tfidf_topk(docs, k=2).to_pandas()
    n = 4

    def idf(dfreq):
        return math.log((1 + n) / (1 + dfreq)) + 1

    # doc 0: apple tf2*idf(2), banana 1, cherry 1 -> top2 = apple,
    # then banana (tie with cherry broken by term asc)
    d0 = out[out.doc_id == 0].sort_values("rnk")
    assert list(d0.term) == ["apple", "banana"]
    assert d0.iloc[0].tfidf == pytest.approx(2 * idf(2), abs=1e-4)
    # doc 3 (empty) contributes no rows
    assert (out.doc_id == 3).sum() == 0
    # every doc has at most k rows, ranks 1..k
    assert out.groupby("doc_id").rnk.max().le(2).all()


def test_postings_sample_capped_and_sorted(docs):
    out = {r["term"]: r for r in index.postings(docs).take_all()}
    assert out["apple"]["df"] == 2
    assert out["apple"]["total_tf"] == 5
    assert out["apple"]["sample_docs"] == "0,2"
    assert out["date"]["sample_docs"] == "1"


def test_postings_sample_cap_across_batches():
    rows = [{"doc_id": i, "text": "zebra"} for i in range(50)]
    ds = ray.data.from_items(rows).repartition(5)
    out = index.postings(ds).take_all()
    assert len(out) == 1
    assert out[0]["df"] == 50
    assert out[0]["sample_docs"] == "0,1,2,3,4"


def test_decontam_flags_overlap_only():
    # doc 0 is benchmark (0 % 97 == 0); doc 97 also benchmark.
    # doc 1 shares a 3-gram with doc 0; doc 2 shares nothing.
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 97, "text": "omega psi chi phi"},
        {"doc_id": 1, "text": "prefix alpha beta gamma suffix"},
        {"doc_id": 2, "text": "totally unrelated words here"},
        {"doc_id": 3, "text": "omega psi chi phi"},  # exact dup of 97
    ]
    out = {r["doc_id"]: r["n_hits"]
           for r in index.decontaminate(ray.data.from_items(rows))
           .take_all()}
    assert 0 not in out and 97 not in out   # benchmark rows excluded
    assert out[1] == 1                      # one shared 3-gram
    assert 2 not in out
    assert out[3] == 2                      # both 3-grams of the dup


def test_decontam_counts_match_shingle_sets():
    rows = [{"doc_id": 0, "text": "a b c d e f"},
            {"doc_id": 5, "text": "c d e f g h"}]
    out = index.decontaminate(ray.data.from_items(rows)).take_all()
    expect = len(dedup.shingles("a b c d e f", 3)
                 & dedup.shingles("c d e f g h", 3))
    assert out == [{"doc_id": 5, "n_hits": expect}]


def test_tfidf_pairs_planted_near_identical(tmp_path):
    """Two near-identical docs in the rare-term space must pair with
    cos near 1; an unrelated doc pairs with neither.  The DF cap drops
    the shared hot term from the similarity space."""
    import pandas as pd
    import ray.data
    from cheque_ocr_project_ray.text.index import tfidf_pairs

    shared = "common " * 5      # hot everywhere: df above the cap
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [shared + "alpha beta gamma delta",
                 shared + "alpha beta gamma epsilon",
                 shared + "zulu yankee xray whiskey",
                 shared + "quebec papa oscar november"]})
    ds = ray.data.from_arrow(
        __import__("pyarrow").Table.from_pandas(docs))
    out = tfidf_pairs(ds, df_cap=3, threshold=0.5).to_pandas()
    assert list(zip(out["doc_a"], out["doc_b"])) == [(0, 1)]
    # 3 shared rare terms (df=2) + 1 unique (df=1) per doc, smooth idf
    import numpy as np
    idf2 = np.log(5.0 / 3.0) + 1.0
    idf1 = np.log(5.0 / 2.0) + 1.0
    expect = round(3 * idf2 ** 2 / (3 * idf2 ** 2 + idf1 ** 2), 5)
    assert out["cos"].iloc[0] == expect


def test_ngram_novelty_ordering_and_conventions(tmp_path):
    """First doc is fully novel; an exact restatement is fully stale;
    a half-overlap scores in between; a single-token doc uses the
    whole-text shingle convention; empty docs emit no row."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from cheque_ocr_project_ray.text.index import ngram_novelty

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b c d",           # grams: ab bc cd — all first
                 "a b c d",           # same — zero novel
                 "a b x y",           # ab stale; bx xy novel -> 2/3
                 "solo",              # single-token shingle, novel
                 "   "]})             # no tokens -> absent
    ds = ray.data.from_arrow(pa.Table.from_pandas(docs))
    out = ngram_novelty(ds).to_pandas()
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    assert list(out["n_grams"]) == [3, 3, 3, 1]
    assert list(out["n_novel"]) == [3, 0, 2, 1]
    assert list(out["novelty"]) == [1.0, 0.0, 0.6667, 1.0]


def test_doc_hybrid_search_blend_identity():
    """Hybrid = 0.5·bm25 + 0.5·cos (pre-rounded inputs), sorted desc,
    and candidates come from the BM25 top-k."""
    import numpy as np
    from cheque_ocr_project_ray.text.queries import (doc_bm25_topk,
                                                     doc_hybrid_search)
    from cheque_ocr_project_ray.util import round_half_up

    sf = "/root/testdata/sf0.001"
    out = doc_hybrid_search(sf)
    assert list(out.columns) == ["doc_id", "bm25", "cos", "hybrid"]
    assert 0 < len(out) <= 10
    blend = round_half_up(
        out["bm25"].to_numpy() * 0.5 + out["cos"].to_numpy() * 0.5, 6)
    assert np.array_equal(out["hybrid"].to_numpy(), blend)
    h = out["hybrid"].to_numpy()
    assert (np.diff(h) <= 0).all()
    cand = set(doc_bm25_topk(sf).to_pandas()["doc_id"])
    assert set(out["doc_id"]).issubset(cand)
