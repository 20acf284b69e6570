"""Sequence packing (distributed prefix sum) + bigram heavy-hitters."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cheque_ocr_project_ray.text.analysis import bigram_counts
from cheque_ocr_project_ray.text.pack import pack_documents


def _docs_ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_pack_matches_sequential_cumsum():
    rng = np.random.default_rng(17)
    texts = [" ".join(["w"] * int(n))
             for n in rng.integers(1, 40, 300)]
    ds = _docs_ds(texts)
    out = pack_documents(ds, budget=64, n_buckets=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    n = np.array([len(t.split()) for t in texts])
    excl = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert (out["n_tokens"].to_numpy() == n).all()
    assert (out["pack_id"].to_numpy() == excl // 64).all()
    # packs are contiguous runs in doc_id order
    assert (np.diff(out["pack_id"].to_numpy()) >= 0).all()


def test_pack_sparse_nonzero_ids():
    # doc_ids with gaps and a high max exercise empty range buckets:
    # offsets must still line up across the occupied ones
    ids = [5, 100, 101, 900, 901, 9000]
    texts = ["a b c", "d e", "f", "g h i j", "k", "l m"]
    ds = _docs_ds(texts, ids)
    out = pack_documents(ds, budget=4, n_buckets=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    n = np.array([3, 2, 1, 4, 1, 2])
    excl = np.concatenate([[0], np.cumsum(n)[:-1]])
    assert (out["pack_id"].to_numpy() == excl // 4).all()


def test_bigram_counts_kernel():
    batch = pa.table({"doc_id": [0, 1],
                      "text": ["x y x y", "y x"]})
    out = bigram_counts(batch).to_pydict()
    got = dict(zip(out["bigram"], out["n"]))
    assert got == {"x y": 2, "y x": 2}


def test_top_bigrams_query(tmp_path):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["p q p q p q", "p q r", "r s"],
    })
    df.to_parquet(tmp_path / "documents.parquet")
    from cheque_ocr_project_ray.text.queries import corpus_top_bigrams
    out = corpus_top_bigrams(str(tmp_path)).to_pandas()
    assert out.iloc[0]["bigram"] == "p q" and out.iloc[0]["n"] == 4
    got = dict(zip(out["bigram"], out["n"]))
    assert got["q p"] == 2 and got["q r"] == 1 and got["r s"] == 1
