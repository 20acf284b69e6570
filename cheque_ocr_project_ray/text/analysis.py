"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All are ``map_batches(batch_format="pyarrow")``
stages over the ``documents`` table; each has a DuckDB-expressible
twin in ``text/queries.py`` so the driver's correctness gate covers
them.

Vectorization: tokenization is an Arrow regex-split kernel; per-token
counting (stopword hits, distinct tokens, language markers) runs on
the FLATTENED token array with ``list_parent_indices`` + numpy
``bincount`` — no Python loop over rows or tokens.  Only the md5
fingerprint is a per-row loop (hashlib has no batch API).

These are engine capabilities beyond the reference's own inventory
(per the build brief): at 10^12 docs each stage is a stateless
streaming map — no shuffle, no materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from cheque_ocr_project_ray.util import round_half_up

# Language marker words (tiny stopword profiles). The heuristic is
# argmax of marker hits with a FIXED priority order for ties — the
# same rule is expressed in SQL so both engines agree deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "los"),
    "fr": ("le", "les", "des"),
}
LANG_PRIORITY = ("en", "es", "fr")
STOPWORDS = ("a", "the")


def _token_lists(text) -> pa.ChunkedArray:
    """Tokenize matching the SQL twin's ``regexp_split_to_array(trim(
    text), '\\s+')`` semantics: an empty/whitespace-only text yields
    the single empty token [''] (NOT []), so ratio denominators are
    never zero and both engines agree on empty docs."""
    return pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                  pattern=r"\s+")


def _marker_hits(flat: pa.Array, parent: np.ndarray, n_rows: int,
                 markers) -> np.ndarray:
    """Per-row count of tokens in ``markers`` — one is_in kernel plus
    one bincount over the flattened token array."""
    mask = pc.is_in(flat, value_set=pa.array(markers)).to_numpy(
        zero_copy_only=False)
    return np.bincount(parent[mask], minlength=n_rows)


def token_stats(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    toks = _token_lists(text)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
    })


def _prep(batch: pa.Table):
    """Shared tokenization state: (toks, flat, parent) — computed ONCE
    and reused by every per-token signal in a combined stage."""
    toks = _token_lists(batch.column("text")).combine_chunks()
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy()
    return toks, flat, parent


def _quality_arrays(toks, flat, parent, n):
    n_tokens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    stop_hits = _marker_hits(flat, parent, n, STOPWORDS)
    # distinct tokens per row: dictionary-encode the flat tokens, then
    # count unique (parent, code) pairs — vectorized, no per-row sets
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_codes = int(codes.max()) + 1 if len(codes) else 1
    pair_keys = np.unique(parent.astype(np.int64) * n_codes + codes)
    distinct = np.bincount(pair_keys // n_codes, minlength=n)
    return n_tokens, stop_hits, distinct


def _lang_array(flat, parent, n) -> np.ndarray:
    hits = {lang: _marker_hits(flat, parent, n, markers)
            for lang, markers in LANG_MARKERS.items()}
    en, es, fr = hits["en"], hits["es"], hits["fr"]
    # argmax with fixed priority order on ties (matches the SQL CASE)
    pred = np.full(n, "und", dtype=object)
    en_best = (en >= es) & (en >= fr)
    es_best = ~en_best & (es >= fr)
    fr_best = ~en_best & ~es_best
    any_hit = (en + es + fr) > 0
    pred[any_hit & en_best] = "en"
    pred[any_hit & es_best] = "es"
    pred[any_hit & fr_best] = "fr"
    return pred


def quality_counts(batch: pa.Table) -> pa.Table:
    n = len(batch)
    toks, flat, parent = _prep(batch)
    n_tokens, stop_hits, distinct = _quality_arrays(toks, flat, parent, n)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "stop_hits": pa.array(stop_hits, pa.int64()),
        "distinct_tokens": pa.array(distinct, pa.int64()),
        "stop_ratio": pa.array(round_half_up(stop_hits / n_tokens, 4)),
        "ttr": pa.array(round_half_up(distinct / n_tokens, 4)),
    })


def repetition(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals: fraction of the document taken
    by its most frequent word and most frequent bigram.  High values
    mark boilerplate/spam for corpus filtering.  Fully vectorized:
    tokens are dictionary-encoded once; per-(row, code) and
    per-(row, code-pair) counts come from one ``np.unique`` each, and
    the per-row maxima from ``np.maximum.at`` — no Python loop over
    rows or tokens."""
    n = len(batch)
    toks, flat, parent = _prep(batch)
    n_tokens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_codes = int(codes.max()) + 1 if len(codes) else 1
    parent = parent.astype(np.int64)

    keys, counts = np.unique(parent * n_codes + codes,
                             return_counts=True)
    top_word = np.zeros(n, np.int64)
    np.maximum.at(top_word, keys // n_codes, counts)

    # bigram = adjacent code pair within the same row; the pair key is
    # re-densified (np.unique inverse) before combining with the row so
    # the combined key stays ~rows×tokens — parent*(n_codes²) would
    # overflow int64 for big batches over a large vocabulary and
    # silently write counts into wrong rows
    same = parent[:-1] == parent[1:] if len(parent) else \
        np.zeros(0, bool)
    bparent = parent[:-1][same]
    bkey = codes[:-1][same] * n_codes + codes[1:][same]
    _, bdense = np.unique(bkey, return_inverse=True)
    nb_codes = int(bdense.max()) + 1 if len(bdense) else 1
    bkeys, bcounts = np.unique(
        bparent * nb_codes + bdense, return_counts=True)
    top_bigram = np.zeros(n, np.int64)
    np.maximum.at(top_bigram, bkeys // nb_codes, bcounts)

    nb = np.maximum(n_tokens - 1, 1)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "top_count": pa.array(top_word, pa.int64()),
        "top_frac": pa.array(round_half_up(top_word / n_tokens, 4)),
        "bigram_top_frac": pa.array(
            round_half_up(top_bigram / nb, 4)),
    })


def bigram_counts(batch: pa.Table) -> pa.Table:
    """Per-batch bigram frequencies (combiner for the corpus
    heavy-hitters query): adjacent same-row token pairs joined with
    one Arrow element-wise kernel, counted with one group_by."""
    _, flat, parent = _prep(batch)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) < 2:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    bg = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    bg = bg.filter(pa.array(parent[:-1] == parent[1:]))
    t = pa.table({"bigram": bg,
                  "n": pa.array(np.ones(len(bg), np.int64))})
    return t.group_by("bigram").aggregate([("n", "sum")]) \
        .rename_columns(["bigram", "n"])


def lang_id(batch: pa.Table) -> pa.Table:
    _, flat, parent = _prep(batch)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(_lang_array(flat, parent, len(batch)),
                              pa.string()),
    })


def lang_quality(batch: pa.Table) -> pa.Table:
    """pred_lang + quality signals from ONE tokenization pass — the
    combined form composite pipelines (corpus_curation) use so the
    regex-split kernel doesn't run twice per batch."""
    n = len(batch)
    toks, flat, parent = _prep(batch)
    n_tokens, stop_hits, distinct = _quality_arrays(toks, flat, parent, n)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(_lang_array(flat, parent, n), pa.string()),
        "stop_ratio": pa.array(round_half_up(stop_hits / n_tokens, 4)),
        "ttr": pa.array(round_half_up(distinct / n_tokens, 4)),
    })


def text_md5(texts) -> list[str]:
    """One md5-hex per text — the SINGLE implementation behind
    fingerprinting, exact dedup, and curation (all must agree with the
    SQL ``md5()`` oracles)."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def fingerprint(batch: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fp": pa.array(text_md5(batch.column("text").to_pylist()),
                       pa.string()),
    })


# GPT-2-style pre-tokenizer, restricted to constructs with IDENTICAL
# semantics in python re and DuckDB's RE2 (no \p classes, no
# lookahead): contraction suffixes, space-prefixed letter/digit runs,
# space-prefixed punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
import re as _re  # noqa: E402
_BPE_RE = _re.compile(BPE_PATTERN)  # once per worker process


def bpe_token_count(batch: pa.Table) -> pa.Table:
    """Per-doc BPE-ish token count (the ~cost-model input for LLM
    training-data budgeting).  The regex scan is per-document but
    C-level; the work is inherent — every byte is scanned once."""
    counts = [len(_BPE_RE.findall(t))
              for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": pa.array(counts, pa.int64()),
    })


WINNOW_K = 8    # char-gram width
WINNOW_W = 16   # winnowing window (fingerprint = min hash per window)


def winnow_fingerprints(batch: pa.Table) -> pa.Table:
    """Winnowing fingerprints (Schleimer et al., MOSS): hash every
    k-char gram, keep the min hash of each w-window, emit the distinct
    set per doc.  The gram hash is md5 bytes 8..16 LE == DuckDB
    ``md5_number_lower``, so the whole op has a pure-SQL oracle
    (window min over generate_series positions).  Output: one row per
    (doc_id, fp) — the inverted-index shape a fingerprint-match join
    consumes."""
    import hashlib

    ids_out, fps_out = [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        n = len(text) - WINNOW_K + 1
        if n <= 0:
            continue
        # slice by CHARACTERS (DuckDB substr semantics), encode per gram
        hs = np.fromiter(
            (int.from_bytes(
                hashlib.md5(text[i:i + WINNOW_K].encode("utf-8"))
                .digest()[8:16], "little") for i in range(n)),
            dtype=np.uint64, count=n)
        if n <= WINNOW_W:
            fps = np.unique(hs.min(keepdims=True))
        else:
            wins = np.lib.stride_tricks.sliding_window_view(hs, WINNOW_W)
            fps = np.unique(wins.min(axis=1))
        ids_out.extend([doc_id] * len(fps))
        fps_out.append(fps)
    fp_arr = np.concatenate(fps_out) if fps_out else \
        np.array([], dtype=np.uint64)
    return pa.table({
        "doc_id": pa.array(ids_out, pa.int64()),
        "fp": pa.array(fp_arr, pa.uint64()),
    })


# train/val/test assignment: bucket = md5-low-64(str(doc_id)) % 100 —
# deterministic, uniform, and reproducible in SQL via
# md5_number_lower (the same hash _stable64 uses).
SPLIT_BUCKETS = (("train", 90), ("val", 95), ("test", 100))


# Fixed logistic quality-classifier weights (documented stand-in for
# a trained fastText/logreg quality model — the SCORING stage shape is
# what matters; weights are arbitrary but frozen for the oracle).
QUALITY_W = (-1.0, -8.0, 3.0, 0.2)  # bias, stop_ratio, ttr, ln(n_tokens)


def quality_score(batch: pa.Table) -> pa.Table:
    """Model-based quality scoring: logistic over the 4dp-ROUNDED
    quality signals (both engines feed the identical rounded doubles
    into the identical closed form, so 6dp output rounding compares
    stable digits)."""
    q = quality_counts(batch)
    w0, w1, w2, w3 = QUALITY_W
    z = w0 + w1 * q.column("stop_ratio").to_numpy() \
        + w2 * q.column("ttr").to_numpy() \
        + w3 * np.log(q.column("n_tokens").to_numpy())
    score = round_half_up(1.0 / (1.0 + np.exp(-z)), 6)
    return pa.table({
        "doc_id": q.column("doc_id"),
        "score": pa.array(score),
        "keep": pa.array((score >= 0.5).astype(np.int64)),
    })


# Per-source sampling quotas (percent kept): even-indexed sources are
# majority-kept, odd downsampled — the data-mixing shape (deterministic
# per-doc hash, so any re-run/resume keeps the same docs).
MIX_QUOTA_EVEN, MIX_QUOTA_ODD = 80, 30


def mix_sample(batch: pa.Table) -> pa.Table:
    """Deterministic mixture sampling: keep doc iff
    stable64(doc_id) % 100 < quota(source), quota by source index
    parity.  Same hash family as the train/val/test split."""
    from cheque_ocr_project_ray.text.dedup import _stable64
    ids = batch.column("doc_id").to_pylist()
    buckets = np.array([_stable64(str(i)) % 100 for i in ids],
                       np.int64)
    src_idx = pc.cast(pc.utf8_slice_codeunits(
        batch.column("source"), 3, 32), pa.int64()).to_numpy()
    quota = np.where(src_idx % 2 == 0, MIX_QUOTA_EVEN, MIX_QUOTA_ODD)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "source": batch.column("source"),
        "bucket": pa.array(buckets, pa.int64()),
    }).filter(pa.array(buckets < quota))


SEG_LEN = 10     # tiling segment width (segment-level dedup)
CHUNK_W = 64     # training-window width (token chunking)
CHUNK_S = 32     # training-window stride (50% overlap)


def _token_windows(batch: pa.Table, window: int, stride: int):
    """Sliding token windows over every row, fully vectorized.

    Returns ``(parent_row, win_no, win_len, win_text)`` where each
    window covers tokens ``[win_no*stride, win_no*stride+window)`` of
    its row (clipped at the row end) and ``win_text`` is the
    space-joined window — the same construction as the SQL twin's
    ``toks[j*stride+1 : j*stride+window]`` slice.  Window COUNT per
    row is ``ceil(n/stride)`` (every start strictly inside the row),
    so ``stride == window`` degenerates to exact tiling.  One
    ``take`` + one ``binary_join`` — no Python loop over rows,
    windows, or tokens."""
    toks = _token_lists(batch.column("text")).combine_chunks()
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    off = np.asarray(toks.offsets, dtype=np.int64)
    n = np.diff(off)                        # ≥1: empty text → ['']
    nw = np.ceil(n / stride).astype(np.int64)
    tot = int(nw.sum())
    win_no = np.arange(tot) - np.repeat(np.cumsum(nw) - nw, nw)
    start = np.repeat(off[:-1], nw) + win_no * stride
    wlen = np.minimum(window, np.repeat(off[1:], nw) - start)
    idx = np.repeat(start, wlen) + \
        (np.arange(int(wlen.sum())) - np.repeat(np.cumsum(wlen) - wlen,
                                                wlen))
    offsets = np.concatenate([[0], np.cumsum(wlen)])
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                  flat.take(pa.array(idx)))
    return (np.repeat(np.arange(len(batch), dtype=np.int64), nw),
            win_no, wlen, pc.binary_join(la, " "))


def segment_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, seg_no, seg) tiling segmentation — the unit the
    corpus-level segment dedup keys on."""
    parent, seg_no, _, seg = _token_windows(batch, SEG_LEN, SEG_LEN)
    return pa.table({
        "doc_id": batch.column("doc_id").take(pa.array(parent)),
        "seg_no": pa.array(seg_no, pa.int64()),
        "seg": seg,
    })


def chunk_rows(batch: pa.Table) -> pa.Table:
    """Overlapping training windows (width CHUNK_W, stride CHUNK_S)
    per doc — the fixed-context chunking a tokenize-and-pack training
    pipeline emits."""
    parent, win_no, wlen, text = _token_windows(batch, CHUNK_W, CHUNK_S)
    return pa.table({
        "doc_id": batch.column("doc_id").take(pa.array(parent)),
        "chunk_id": pa.array(win_no, pa.int64()),
        "n_tokens": pa.array(wlen, pa.int64()),
        "chunk": text,
    })


def token_counts(batch: pa.Table) -> pa.Table:
    """Per-batch corpus unigram counts (combiner for the LM-scoring
    query): one flatten + one group_by."""
    _, flat, _ = _prep(batch)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    t = pa.table({"tok": flat,
                  "n": pa.array(np.ones(len(flat), np.int64))})
    return t.group_by("tok").aggregate([("n", "sum")]) \
        .rename_columns(["tok", "n"])


def doc_token_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, tok, tf) over the SAME tokenization as
    :func:`token_counts` — the probe stream of the LM-scoring join
    fallback.  Final (not partial) counts: one row is one whole
    document."""
    _, flat, parent = _prep(batch)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    t = pa.table({
        "doc_id": pa.array(ids[parent.astype(np.int64)], pa.int64()),
        "tok": flat,
        "tf": pa.array(np.ones(len(flat), np.int64))})
    return t.group_by(["doc_id", "tok"]).aggregate([("tf", "sum")]) \
        .rename_columns(["doc_id", "tok", "tf"])


def unigram_logprob(batch: pa.Table, vocab: np.ndarray,
                    logp: np.ndarray) -> pa.Table:
    """Mean unigram log-probability per doc against the broadcast
    corpus LM (``vocab`` sorted, ``logp[i] = ln(count_i/total)``).
    The vocabulary is built from the same corpus, so every token
    resolves; per-doc means come from one searchsorted + bincount."""
    n = len(batch)
    toks, flat, parent = _prep(batch)
    fl = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=vocab.dtype)
    pos = np.searchsorted(vocab, fl)
    per_doc = np.bincount(parent, weights=logp[pos], minlength=n)
    n_tokens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "logprob": pa.array(round_half_up(per_doc / n_tokens, 6)),
    })


def doc_bigram_pairs(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, bigram, tf) over the SAME bigram formation
    as :func:`bigram_counts` — the bigram-LM join fallback's probe
    stream.  Final counts: one row is one whole document."""
    _, flat, parent = _prep(batch)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "bigram": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64())})
    if len(flat) < 2:
        return empty
    bg = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    keep = parent[:-1] == parent[1:]
    bg = bg.filter(pa.array(keep))
    if len(bg) == 0:
        return empty
    bparent = parent[:-1][keep].astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids[bparent], pa.int64()),
                  "bigram": bg,
                  "tf": pa.array(np.ones(len(bg), np.int64))})
    return t.group_by(["doc_id", "bigram"]).aggregate([("tf", "sum")]) \
        .rename_columns(["doc_id", "bigram", "tf"])


def bigram_logprob(batch: pa.Table, bvocab: np.ndarray,
                   bscore: np.ndarray) -> pa.Table:
    """Mean add-one-smoothed bigram log-probability per doc against a
    broadcast corpus bigram LM (``bvocab`` sorted bigram strings,
    ``bscore[i] = ln((c(w1,w2)+1)/(c(w1)+V))``).  The LM is built from
    the same corpus, so every doc bigram resolves; docs with <2 tokens
    have no bigrams and are dropped (both engines agree)."""
    n = len(batch)
    _, flat, parent = _prep(batch)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_bigrams": pa.array([], pa.int64()),
                      "logprob": pa.array([], pa.float64())})
    if len(flat) < 2:
        return empty
    bg = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    keep = parent[:-1] == parent[1:]
    bg = bg.filter(pa.array(keep))
    if len(bg) == 0:
        return empty
    bparent = parent[:-1][keep]
    fl = np.asarray(bg.to_numpy(zero_copy_only=False),
                    dtype=bvocab.dtype)
    pos = np.searchsorted(bvocab, fl)
    sums = np.bincount(bparent, weights=bscore[pos], minlength=n)
    counts = np.bincount(bparent, minlength=n)
    m = counts > 0
    return pa.table({
        "doc_id": pa.array(ids[m], pa.int64()),
        "n_bigrams": pa.array(counts[m], pa.int64()),
        "logprob": pa.array(round_half_up(sums[m] / counts[m], 6)),
    })


def train_split(batch: pa.Table) -> pa.Table:
    from cheque_ocr_project_ray.text.dedup import _stable64
    ids = batch.column("doc_id").to_pylist()
    buckets = [_stable64(str(i)) % 100 for i in ids]
    splits = [next(name for name, hi in SPLIT_BUCKETS if b < hi)
              for b in buckets]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "bucket": pa.array(buckets, pa.int64()),
        "split": pa.array(splits, pa.string()),
    })


def char_entropy(batch: pa.Table) -> pa.Table:
    """Per-doc character-level Shannon entropy (code points) — the
    gibberish / compressibility signal (low-entropy = repeated-char
    spam, high-entropy = random noise; prose sits ~4-4.5 bits).

    Vectorized end-to-end: the batch's utf8 payload decodes ONCE from
    the Arrow data buffer (no per-row Python), code points land in one
    numpy array keyed by ``row·0x110000 + cp``, and per-(row, char)
    run lengths come from a single sort + diff.  Entropy uses the
    ``log2(L) − Σ k·log2 k / L`` form — the SQL twin computes the
    identical expression so 6dp rounding compares stable digits."""
    arr = pc.fill_null(batch.column("text").combine_chunks(), "")
    n = len(arr)
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int32)[arr.offset:
                                           arr.offset + n + 1]
    payload = bufs[2].to_pybytes()[off[0]:off[-1]] if n else b""
    cp = np.frombuffer(payload.decode("utf-8").encode("utf-32-le"),
                       np.uint32).astype(np.int64)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    key = row * 0x110000 + cp
    key.sort()
    starts = np.concatenate([[0], np.flatnonzero(np.diff(key)) + 1]) \
        if len(key) else np.empty(0, np.int64)
    counts = np.diff(np.concatenate([starts, [len(key)]])) \
        if len(key) else np.empty(0, np.int64)
    krow = (key[starts] // 0x110000) if len(key) else starts
    row_sum = np.zeros(n, np.float64)
    np.add.at(row_sum, krow, counts * np.log2(counts))
    L = np.maximum(lens, 1).astype(np.float64)
    ent = np.where(lens > 0, np.log2(L) - row_sum / L, 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(lens, pa.int64()),
        "entropy": pa.array(round_half_up(ent, 6), pa.float64()),
    })
