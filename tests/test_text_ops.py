"""Text analysis + dedup operator tests (synthetic planted duplicates)."""

import hashlib

import pandas as pd
import pytest

import ray.data

from cheque_ocr_project_ray.text import analysis, dedup


def docs_ds(rows):
    return ray.data.from_items(rows)


BASE = ("the quick brown fox jumps over a lazy dog near the old river "
        "bank while a cold wind blows through the tall dry grass").split()


def make_text(drop=None, swap=None):
    ws = list(BASE)
    if drop is not None:
        del ws[drop]
    if swap is not None:
        i, j = swap
        ws[i], ws[j] = ws[j], ws[i]
    return " ".join(ws)


@pytest.fixture(scope="module")
def corpus():
    rows = [
        {"doc_id": 0, "text": make_text()},
        {"doc_id": 1, "text": make_text()},              # exact dup of 0
        {"doc_id": 2, "text": make_text(drop=5)},        # near dup of 0
        {"doc_id": 3, "text": make_text(swap=(2, 10))},  # near dup of 0
        {"doc_id": 4, "text": "completely different words here entirely "
                              "unrelated content nothing shared at all"},
        {"doc_id": 5, "text": "another standalone document with its own "
                              "unique vocabulary and no overlap either"},
    ]
    return rows


def test_exact_dedup_keeps_min_doc_id(corpus):
    out = dedup.exact_dedup(docs_ds(corpus)).to_pandas()
    assert len(out) == 5  # 6 docs, one exact dup pair
    dup_hash = hashlib.md5(corpus[0]["text"].encode()).hexdigest()
    row = out[out["text_hash"] == dup_hash].iloc[0]
    assert row["doc_id"] == 0 and row["n_dups"] == 2


def test_minhash_finds_planted_near_dups(corpus):
    pairs = dedup.minhash_dedup_pairs(docs_ds(corpus),
                                      threshold=0.6).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # the exact dup and both near dups of doc 0 must surface
    assert (0, 1) in found
    assert (0, 2) in found or (1, 2) in found
    # unrelated docs never pair with the dup cluster
    assert not any(4 in p or 5 in p for p in found)
    exact = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)]
    assert exact["jaccard"].iloc[0] == 1.0


def test_simhash_properties(corpus):
    out = dedup.simhash_docs(docs_ds(corpus)).to_pandas()
    by_id = dict(zip(out["doc_id"], out["simhash"]))
    assert by_id[0] == by_id[1]          # identical text → identical hash
    # near dup → small hamming distance; unrelated → large
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(by_id[0], by_id[2]) < 12
    assert ham(by_id[0], by_id[4]) > 12
    # deterministic across calls
    out2 = dedup.simhash_docs(docs_ds(corpus)).to_pandas()
    assert dict(zip(out2["doc_id"], out2["simhash"])) == by_id


def test_simhash_near_pairs(corpus):
    out = dedup.simhash_near_pairs(docs_ds(corpus), max_hamming=3).to_pandas()
    found = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in found                      # identical → hamming 0
    row = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]
    assert row["hamming"].iloc[0] == 0
    # unrelated docs never pair at hamming<=3
    assert not any(4 in p or 5 in p for p in found)


def test_degenerate_bucket_star_pairs():
    """5k identical docs: every LSH bucket is one giant cluster.  The
    bucket cap must keep the pair step LINEAR (star pairs), not
    O(bucket²) ≈ 12.5M pairs, and verification must stay distributed."""
    n = 5000
    rows = [{"doc_id": i, "text": make_text()} for i in range(n)]
    pairs = dedup.minhash_dedup_pairs(
        docs_ds(rows), threshold=0.6, bucket_cap=256).to_pandas()
    # star pairing: exactly (n-1) pairs, all anchored at doc 0
    assert len(pairs) == n - 1
    assert (pairs["doc_a"] == 0).all()
    assert (pairs["jaccard"] == 1.0).all()

    sim = dedup.simhash_near_pairs(
        docs_ds(rows), max_hamming=3, bucket_cap=256).to_pandas()
    assert len(sim) == n - 1
    assert (sim["doc_a"] == 0).all()
    assert (sim["hamming"] == 0).all()


def test_simhash_clean_corpus_keeps_schema():
    """A corpus with band collisions but NO pair within the hamming
    bound must still yield a typed (doc_a, doc_b, hamming) result —
    the untyped-empty-frame version produced a schemaless 0-column
    dataset and out['doc_a'] raised KeyError."""
    rows = [{"doc_id": i,
             "text": " ".join(f"w{i}x{j}" for j in range(30))}
            for i in range(800)]  # 800 distinct docs → band collisions
    out = dedup.simhash_near_pairs(docs_ds(rows), max_hamming=3)
    # Dataset-level schema must be typed even when empty (to_pandas()
    # of an empty Dataset drops columns — a Ray quirk, so assert on
    # the schema, which is what downstream unions/joins consume)
    assert set(out.schema().names) == {"doc_a", "doc_b", "hamming"}
    pdf = out.to_pandas()
    assert len(pdf) == 0 or (pdf["hamming"] <= 3).all()


def test_quality_and_token_stats():
    import pyarrow as pa
    batch = pa.table({
        "doc_id": [1], "text": ["the cat and the hat sat"]})
    ts = analysis.token_stats(batch)
    assert ts.column("n_tokens")[0].as_py() == 6
    assert ts.column("n_chars")[0].as_py() == len("the cat and the hat sat")
    q = analysis.quality_counts(batch)
    assert q.column("stop_hits")[0].as_py() == 2          # 'the' twice
    assert q.column("distinct_tokens")[0].as_py() == 5
    lang = analysis.lang_id(batch)
    assert lang.column("pred_lang")[0].as_py() == "en"
    und = analysis.lang_id(pa.table({"doc_id": [2], "text": ["xyz qqq"]}))
    assert und.column("pred_lang")[0].as_py() == "und"


def test_prefix_dedup(corpus):
    # 25-char prefix = "the quick brown fox jumps": 0,1 identical; 2 drops
    # word 5 ("over", beyond char 25) so still matches; 3 swaps word 2
    # ("brown", inside the prefix) so it does not.
    out = dedup.prefix_dedup(docs_ds(corpus), prefix_len=25).to_pandas()
    pref = corpus[0]["text"][:25]
    row = out[out["prefix"] == pref].iloc[0]
    assert row["doc_id"] == 0 and row["n_dups"] == 3


def test_bpe_token_count_matches_duckdb():
    import duckdb
    rows = [{"doc_id": 0, "text": "I'll say don't, it's 42 degrees!"},
            {"doc_id": 1, "text": "hello   world... re-do 3.14 x"},
            {"doc_id": 2, "text": make_text()}]
    out = analysis.bpe_token_count(
        ray.data.from_items(rows).take_batch(10, batch_format="pyarrow"))
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["n_bpe_tokens"].to_pylist()))
    pat = analysis.BPE_PATTERN.replace("'", "''")
    for r in rows:
        t = r["text"].replace("'", "''")
        n = duckdb.sql(
            f"SELECT len(regexp_extract_all('{t}', '{pat}'))").fetchone()[0]
        assert got[r["doc_id"]] == n, r


def test_train_split_deterministic_and_complete():
    rows = [{"doc_id": i, "text": "x"} for i in range(1000)]
    out = docs_ds(rows).map_batches(
        analysis.train_split, batch_format="pyarrow").to_pandas()
    assert len(out) == 1000
    counts = out["split"].value_counts()
    # 90/5/5 within generous tolerance on 1000 uniform hashes
    assert 820 <= counts["train"] <= 960
    assert (out["bucket"] == out["doc_id"].map(
        lambda i: dedup._stable64(str(i)) % 100)).all()
    out2 = docs_ds(rows).map_batches(
        analysis.train_split, batch_format="pyarrow").to_pandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True))


def test_span_explode_and_stats():
    import pyarrow as pa
    from cheque_ocr_project_ray import spans as sp
    batch = pa.table({
        "doc_id": ["d1", "d2"],
        "spans": pa.array([
            [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0},
             {"kind": "image", "text": "", "media_ref": "m1", "offset": 1}],
            [{"kind": "text", "text": "ab", "media_ref": "", "offset": 0},
             {"kind": "text", "text": "cde", "media_ref": "", "offset": 1},
             {"kind": "image", "text": "", "media_ref": "m2", "offset": 2}],
        ]),
    })
    flat = sp.explode_spans_batch(batch)
    assert flat.num_rows == 5
    assert flat.column("doc_id").to_pylist() == ["d1", "d1", "d2", "d2", "d2"]
    assert flat.column("kind").to_pylist() == [
        "text", "image", "text", "text", "image"]
    st = sp.span_stats_batch(batch).to_pylist()
    assert st[0] == {"doc_id": "d1", "n_spans": 2, "n_text_spans": 1,
                     "n_image_spans": 1, "text_chars": 5}
    assert st[1] == {"doc_id": "d2", "n_spans": 3, "n_text_spans": 2,
                     "n_image_spans": 1, "text_chars": 5}


def test_winnow_fingerprints_edges():
    import numpy as np
    import pyarrow as pa
    batch = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["short",                      # < K chars: no fingerprints
                 "exactly8",                   # n=1 hash, one window
                 "a" * 30,                     # uniform text: 1 distinct fp
                 "the quick brown fox jumps over the dog"],
    })
    out = analysis.winnow_fingerprints(batch)
    ids = out.column("doc_id").to_pylist()
    assert 1 not in ids                        # too short
    assert ids.count(2) == 1
    assert ids.count(3) == 1                   # all grams identical
    assert ids.count(4) >= 1
    # deterministic
    out2 = analysis.winnow_fingerprints(batch)
    assert out.equals(out2)
    # every fp is a real gram hash of its doc (spot-check doc 4)
    import hashlib
    text = batch.column("text")[3].as_py()
    grams = {int.from_bytes(
        hashlib.md5(text[i:i + analysis.WINNOW_K].encode()).digest()[8:16],
        "little") for i in range(len(text) - analysis.WINNOW_K + 1)}
    got = {f for d, f in zip(ids, out.column("fp").to_pylist()) if d == 4}
    assert got <= grams


def test_winnow_dedup_paths_agree():
    """Driver-adaptive and distributed winnow-dedup paths must emit
    identical pairs (bound=0 forces the distributed groupby)."""
    rows = [{"doc_id": i, "text": make_text(drop=i % 5)} for i in range(12)]
    fast = dedup.winnow_dedup_pairs(docs_ds(rows), min_shared=3)\
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    dist = dedup.winnow_dedup_pairs(docs_ds(rows), min_shared=3, bound=0)\
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, dist)


def test_final_merge_sums_paths_agree():
    """Driver Arrow merge and distributed-groupby fallback of
    util.final_merge_sums must produce identical finals."""
    import pyarrow as pa
    from cheque_ocr_project_ray.util import final_merge_sums
    rows = [{"k": i % 7, "n": 1, "v": float(i)} for i in range(500)]
    ds = ray.data.from_items(rows)
    fast = final_merge_sums(ds, ["k"], ["n", "v"]).to_pandas()
    dist = final_merge_sums(ds, ["k"], ["n", "v"], bound=0).to_pandas()
    fast = fast.sort_values("k").reset_index(drop=True)
    dist = dist.sort_values("k").reset_index(drop=True)
    assert len(fast) == 7
    pd.testing.assert_frame_equal(fast, dist[fast.columns])


def test_char_entropy_known_values_and_unicode():
    """Hand-checked entropies; multi-byte code points count as single
    characters (len semantics, matching SQL's len/string_split)."""
    import numpy as np
    import pyarrow as pa
    from cheque_ocr_project_ray.text.analysis import char_entropy

    t = pa.table({"doc_id": [0, 1, 2, 3, 4],
                  "text": ["aaaa", "abab", "abcd", "", "é é"]})
    out = char_entropy(t).to_pandas()
    assert list(out["n_chars"]) == [4, 4, 4, 0, 3]
    assert list(out["entropy"])[:4] == [0.0, 1.0, 2.0, 0.0]
    # "é é": counts {é:2, ' ':1}, H = log2(3) - (2·log2 2)/3
    expect = round(np.log2(3) - 2.0 / 3.0, 6)
    assert out["entropy"].iloc[4] == expect


def test_quality_percentile_matches_pandas(tmp_path):
    """percent_rank semantics: ties share the min rank; a single-doc
    language gets pr = 0."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import doc_quality_percentile

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a a a a", "a a a a",          # identical -> tie
                 "the cat sat on the mat quietly today",
                 "b",                            # short, low score
                 "lone doc in its own language"],
        "lang": ["en", "en", "en", "en", "xx"],
        "source": "s0", "n_chars": 1})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = doc_quality_percentile(str(tmp_path)).to_pandas()
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4]
    en = out[out["lang"] == "en"].set_index("doc_id")
    ref = docs[docs["lang"] == "en"].copy()
    scores = en["score"]
    # pandas percent_rank equivalent: (rank(method='min')-1)/(n-1)
    pr = (scores.rank(method="min") - 1) / (len(scores) - 1)
    assert (en["pr"].round(6) == pr.round(6)).all()
    assert out.loc[out["lang"] == "xx", "pr"].iloc[0] == 0.0
    assert en.loc[0, "pr"] == en.loc[1, "pr"]     # tie shares rank


def test_dedup_incremental_flags(tmp_path):
    """Old-shard hit, within-new dup, and fresh doc each get the right
    flags; split = floor(0.8·(max+1))."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import dedup_incremental

    # max_id 9 -> split 8: docs 8, 9 are the new shard
    pad = "x" * 50
    docs = pd.DataFrame({
        "doc_id": [0, 1, 8, 9],
        "text": ["old-A " + pad, "old-B " + pad,
                 "old-A " + pad,            # 8: dup of old doc 0
                 "fresh-content " + pad],   # 9: brand new
        "lang": "en", "source": "s0", "n_chars": 1})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = dedup_incremental(str(tmp_path)).to_pandas()
    assert list(out["doc_id"]) == [8, 9]
    assert list(out["dup_old"]) == [1, 0]
    assert list(out["dup_new"]) == [0, 0]
    assert list(out["keep"]) == [0, 1]

    # add a within-new duplicate of doc 9
    docs2 = pd.concat([docs, pd.DataFrame([{
        "doc_id": 10, "text": "fresh-content " + pad, "lang": "en",
        "source": "s0", "n_chars": 1}])])
    docs2.to_parquet(tmp_path / "documents.parquet")
    out2 = dedup_incremental(str(tmp_path)).to_pandas()
    row10 = out2[out2["doc_id"] == 10].iloc[0]
    assert row10["dup_old"] == 0 and row10["dup_new"] == 1 \
        and row10["keep"] == 0


def test_doc_code_score_flags_and_density(tmp_path):
    """Symbol counting, the 6dp-rounded threshold and the exact-int
    density must match a direct python reference."""
    import numpy as np
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import (CODE_RATIO_TAU,
                                                     CODE_SYMBOLS,
                                                     doc_code_score)
    from cheque_ocr_project_ray.util import round_half_up

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "source": ["web", "web", "code", "code"],
        "text": ["plain prose with no symbols at all",
                 "x = (a < b); y = arr[i];",
                 "def f(x):\n    return {k: v for k, v in x}",
                 "just words here"],
        "lang": ["en"] * 4, "n_chars": [0] * 4})
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    out = doc_code_score(str(tmp_path)).to_pandas().reset_index(drop=True)

    rows = []
    for src, g in docs.groupby("source"):
        syms = g["text"].map(
            lambda t: sum(t.count(s) for s in CODE_SYMBOLS)).to_numpy()
        chars = g["text"].str.len().to_numpy()
        ratio = round_half_up(syms / chars, 6)
        rows.append({
            "source": src, "n_docs": len(g),
            "n_code_like": int((ratio >= CODE_RATIO_TAU).sum()),
            "sym_per_kchar": float(round_half_up(
                syms.sum() * 1000.0 / chars.sum(), 4))})
    ref = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_code_like"] = out["n_code_like"].astype("int64")
    ref["n_docs"] = ref["n_docs"].astype("int64")
    ref["n_code_like"] = ref["n_code_like"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)


def test_containment_catches_subset_jaccard_misses():
    """A short doc quoted verbatim inside a much longer one has
    containment 1.0 but tiny Jaccard; both verify paths (broadcast
    and double hash join, forced with broadcast_doc_limit=0) must
    agree and find the planted pair."""
    short = make_text()                       # whole BASE text
    filler = " ".join(f"tok{i} pad{i} filler{i}" for i in range(120))
    rows = [
        {"doc_id": 0, "text": short},
        {"doc_id": 1, "text": short + " " + filler},   # contains doc 0
        {"doc_id": 2, "text": " ".join(f"other{i}" for i in range(60))},
    ]
    got = dedup.containment_dedup_pairs(
        docs_ds(rows), min_shared=1, threshold=0.9) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert list(got["doc_a"]) == [0] and list(got["doc_b"]) == [1]
    assert got["containment"].iloc[0] == 1.0
    # the same pair is invisible to Jaccard at any sane threshold
    jac = dedup.minhash_dedup_pairs(docs_ds(rows), shingle_k=3,
                                    threshold=0.5).to_pandas()
    assert len(jac) == 0 or not (
        ((jac["doc_a"] == 0) & (jac["doc_b"] == 1)).any())
    dist = dedup.containment_dedup_pairs(
        docs_ds(rows), min_shared=1, threshold=0.9,
        broadcast_doc_limit=0) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, dist)


def test_doc_readability_planted(tmp_path, ray_session):
    """Hand-counted doc: 'The cat sat. It ran!' = 5 words, 2
    sentences, 5 vowel groups -> wps 2.5, spw 1.0, flesch
    206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975; a zero-word doc is
    dropped, a no-punctuation doc floors sentences at 1."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import doc_readability
    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["a", "a", "b"],
        "text": ["The cat sat. It ran!", "123 456 !!!", "go go"],
        "lang": ["en"] * 3, "n_chars": [20, 11, 5]})
    df.to_parquet(tmp_path / "documents.parquet")
    out = doc_readability(str(tmp_path))
    a = out[out["source"] == "a"].iloc[0]
    assert a["n_docs"] == 1                      # zero-word doc dropped
    assert a["words_per_sentence"] == 2.5
    assert a["syllables_per_word"] == 1.0
    assert a["flesch"] == 119.6975
    b = out[out["source"] == "b"].iloc[0]
    assert b["words_per_sentence"] == 2.0        # sentence floor = 1


def test_doc_length_quantiles_definition(tmp_path, ray_session):
    """n=4 lengths [10,20,30,40]: pos(q) = (n-1)*q//100 + 1 gives
    p25 -> pos 1 -> 10, p50 -> pos 2 -> 20, p75 -> pos 3 -> 30,
    p95 -> pos 3 -> 30 (NOT interpolated)."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import doc_length_quantiles
    df = pd.DataFrame({
        "doc_id": range(4), "source": ["s"] * 4, "lang": ["en"] * 4,
        "text": ["x"] * 4, "n_chars": [40, 10, 30, 20]})
    df.to_parquet(tmp_path / "documents.parquet")
    out = doc_length_quantiles(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_docs"], r["p25"], r["p50"], r["p75"], r["p95"]) \
        == (4, 10, 20, 30, 30)


def test_doc_ttr_planted(tmp_path, ray_session):
    """'x x y' = 3 tokens / 2 types (ttr 2/3); a whitespace-only doc
    tokenizes to [''] = 1/1 (the shared empty-doc convention), so
    source a: agg 3/4, mean (2/3 + 1)/2."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import doc_ttr
    pd.DataFrame({
        "doc_id": [0, 1, 2], "source": ["a", "a", "b"],
        "text": ["x x y", "   ", "z"],
        "lang": ["en"] * 3, "n_chars": [5, 3, 1]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = doc_ttr(str(tmp_path))
    a = out[out["source"] == "a"].iloc[0]
    assert (a["n_docs"], a["sum_tokens"], a["sum_types"]) == (2, 4, 3)
    assert a["agg_ttr"] == 0.75
    assert a["mean_ttr"] == 0.833333
    b = out[out["source"] == "b"].iloc[0]
    assert (b["sum_tokens"], b["sum_types"], b["agg_ttr"]) \
        == (1, 1, 1.0)


def test_word_length_histogram_planted(tmp_path, ray_session):
    """Vocabulary {aa: 2, bb: 1, ccc: 1} (case-folded, [a-z]+ runs)
    -> length 2: 2 distinct words / 3 tokens, length 3: 1 / 1."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import \
        corpus_word_length_histogram
    pd.DataFrame({"doc_id": [1, 2],
                  "text": ["aa bb ccc", "Aa!"]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = corpus_word_length_histogram(str(tmp_path))
    assert out["wlen"].tolist() == [2, 3]
    assert out["n_words"].tolist() == [2, 1]
    assert out["n_tokens"].tolist() == [3, 1]


def test_bigram_entropy_planted(tmp_path, ray_session):
    """Corpus 'a b', 'a b', 'a c': bigrams {a b: 2, a c: 1}, c1(a)=3.
    H = -(2/3)ln(2/3) - (1/3)ln(1/3)."""
    import math
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import \
        corpus_bigram_entropy
    pd.DataFrame({"doc_id": [1, 2, 3],
                  "text": ["a b", "a b", "a c"]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = corpus_bigram_entropy(str(tmp_path))
    assert out["n_bigrams"].tolist() == [3]
    assert out["n_unique_bigrams"].tolist() == [2]
    h = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert abs(out["entropy"].iloc[0] - h) < 1e-6
    assert abs(out["perplexity"].iloc[0] - math.exp(h)) < 1e-4


def test_lang_source_matrix_planted(tmp_path, ray_session):
    """Two cells: (en, web) with docs of 10+20 chars, (fr, book)
    with one 7-char doc."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import \
        corpus_lang_source_matrix
    pd.DataFrame({"lang": ["en", "en", "fr"],
                  "source": ["web", "web", "book"],
                  "n_chars": [10, 20, 7]}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = corpus_lang_source_matrix(str(tmp_path))
    assert out["lang"].tolist() == ["en", "fr"]
    assert out["n_docs"].tolist() == [2, 1]
    assert out["total_chars"].tolist() == [30, 7]
    assert out["avg_chars"].tolist() == [15.0, 7.0]
