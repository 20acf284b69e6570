"""Unit checks for the token-window family (segment dedup, chunking,
unigram LM scoring, label centroids) — edge semantics plus the
broadcast-vs-distributed path equivalence the oracle sweep never
exercises (it always stays under the winner bound)."""

import numpy as np
import pyarrow as pa

import ray.data

from cheque_ocr_project_ray.text import analysis
from cheque_ocr_project_ray.text import queries as tq
from cheque_ocr_project_ray.vector import queries as vq

SF = "/root/testdata/sf0.001"


def _tbl(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_windows_tiling_and_overlap():
    batch = _tbl([7], ["a b c d e f g"])
    seg = analysis.segment_rows(batch)
    # SEG_LEN=10 > 7 tokens → one segment, the whole doc
    assert seg.column("seg").to_pylist() == ["a b c d e f g"]
    parent, win_no, wlen, text = analysis._token_windows(batch, 4, 2)
    assert text.to_pylist() == ["a b c d", "c d e f", "e f g", "g"]
    assert wlen.tolist() == [4, 4, 3, 1]
    assert win_no.tolist() == [0, 1, 2, 3]


def test_token_windows_empty_and_multirow():
    batch = _tbl([1, 2, 3], ["", "x y", "p q r s t"])
    parent, win_no, wlen, text = analysis._token_windows(batch, 3, 3)
    # empty text tokenizes to [''] (SQL parity) → one empty window
    assert parent.tolist() == [0, 1, 2, 2]
    assert text.to_pylist() == ["", "x y", "p q r", "s t"]


def test_segment_dedup_keep_first_semantics():
    docs = ray.data.from_arrow(_tbl(
        [1, 2, 3],
        ["a b c", "a b c", "a b c x"]))
    # SEG_LEN=10: each doc is one segment; docs 2 drops entirely,
    # doc 3 differs (extra token) and survives
    out = tq.doc_segment_dedup.__wrapped__ if hasattr(
        tq.doc_segment_dedup, "__wrapped__") else tq.doc_segment_dedup
    # run via the library entry on a temp parquet dir
    import tempfile
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            _tbl([1, 2, 3], ["a b c", "a b c", "a b c x"]),
            f"{d}/documents.parquet")
        df = out(d).to_pandas().sort_values("doc_id")
        assert df["doc_id"].tolist() == [1, 3]
        assert df.loc[df["doc_id"] == 1, "dedup_text"].iloc[0] == "a b c"


def test_segment_dedup_fallback_matches_broadcast():
    a = tq.doc_segment_dedup(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = tq.doc_segment_dedup(SF, bound=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = b[a.columns]
    assert a.equals(b)


def test_chunk_rows_counts():
    df = tq.doc_chunk(SF).to_pandas()
    assert (df["n_tokens"] >= 1).all()
    assert (df["n_tokens"] <= analysis.CHUNK_W).all()
    # every doc's chunk_ids are 0..k-1
    g = df.groupby("doc_id")["chunk_id"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.size()).all()


def test_unigram_logprob_bounds():
    df = tq.doc_unigram_logprob(SF).to_pandas()
    assert (df["logprob"] < 0).all()  # probabilities < 1
    assert len(df) == df["doc_id"].nunique()


def test_quality_score_monotone_in_features():
    df = tq.doc_quality_score(SF).to_pandas()
    assert ((df["score"] > 0) & (df["score"] < 1)).all()
    assert set(df["keep"].unique()) <= {0, 1}
    assert (df["keep"] == (df["score"] >= 0.5).astype(int)).all()


def test_mix_sample_respects_quotas():
    df = tq.corpus_mix_sample(SF).to_pandas()
    src_idx = df["source"].str[3:].astype(int)
    quota = np.where(src_idx % 2 == 0, analysis.MIX_QUOTA_EVEN,
                     analysis.MIX_QUOTA_ODD)
    assert (df["bucket"].to_numpy() < quota).all()
    # deterministic: a second run keeps the identical doc set
    df2 = tq.corpus_mix_sample(SF).to_pandas()
    assert sorted(df["doc_id"]) == sorted(df2["doc_id"])


def test_label_centroids_match_numpy():
    import pyarrow.parquet as pq
    df = vq.label_centroids(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["label", "embedding"])
    labels = np.asarray(t["label"].to_numpy(zero_copy_only=False),
                        dtype=np.int64)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    one = df[(df["label"] == labels[0]) & (df["dim"] == 1)]["mean"]
    expect = m[labels == labels[0], 0].mean()
    assert abs(one.iloc[0] - expect) < 1e-6
    assert len(df) == len(np.unique(labels)) * m.shape[1]
