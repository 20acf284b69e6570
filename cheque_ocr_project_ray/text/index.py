"""Corpus indexing operators: TF-IDF term scoring, inverted-index
postings, and benchmark decontamination — the retrieval/cleaning side
of a training-data pipeline, built combiner-first.

Scale shape (all three):
- Statistics passes emit per-batch PARTIALS (vocabulary-keyed, already
  reduced within the batch), merged by the repo's bounded-adaptive
  path (`util.final_merge_sums` / a driver Arrow merge when the
  partial stream is small, distributed groupby beyond the bound) —
  the corpus itself is never shuffled.
- Document-frequency / IDF tables are VOCABULARY-sized, not
  corpus-sized; under the adaptive bound they broadcast once via
  ``ray.put`` and every scoring actor reads them zero-copy.  Past the
  bound (a vocabulary beyond the object store) the scoring joins run
  as term-keyed distributed hash joins (``_tfidf_topk_join`` /
  ``_normalized_postings_join``) — implemented, bound=0-tested.
- Decontamination broadcasts the BENCHMARK shingle set (benchmarks
  are tiny by definition) and streams the corpus through a membership
  filter — the canonical decontam shape (e.g. GPT-3 appendix C /
  Dodge et al. 2021, C4 analysis).

Tokenization matches the text family's SQL convention (non-empty
whitespace tokens); shingles reuse ``dedup.shingles`` (crc32 word
k-grams) so engine and SQL agree set-wise exactly as documented for
the MinHash oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from cheque_ocr_project_ray.text import dedup
from cheque_ocr_project_ray.text.extraction import _filtered_tokens
from cheque_ocr_project_ray.util import (collect_table, final_merge_sums,
                                         map_pool, round_half_up,
                                         shuffle_partitions)

TFIDF_K = 3
POSTING_SAMPLE = 5
DECONTAM_MODULUS = 97
DECONTAM_K = 3


def _pair_counts(batch: pa.Table) -> pa.Table:
    """Per-batch (doc_id, term, tf) — one Arrow group_by over the
    flattened token stream.  Rows are whole documents, so per-batch
    term frequencies are final, never partial."""
    flat, counts = _filtered_tokens(batch.column("text"))
    doc_ids = batch.column("doc_id").to_numpy()
    rep = np.repeat(doc_ids, counts)
    t = pa.table({"doc_id": pa.array(rep), "term": flat})
    g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    return g.rename_columns(["doc_id", "term", "tf"])


def _df_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (term, df) partials: distinct docs per term within
    the batch — exact partials because a document is one row."""
    g = _pair_counts(batch).group_by("term").aggregate(
        [([], "count_all")])
    return g.rename_columns(["term", "df"])


def doc_frequency(docs_ds, np_: int = 0, bound: int = 2_000_000):
    """Corpus document frequency per term (combiner partials +
    bounded-adaptive merge)."""
    partials = docs_ds.map_batches(_df_partials, batch_format="pyarrow")
    return final_merge_sums(partials, ["term"], ["df"], np_=np_,
                            bound=bound)


def _idf_dataset(df_ds, n_docs: int):
    """(term, idf) as a DATASET — the smooth idf is row-local given
    the scalar doc count, so the vocabulary never leaves the
    cluster."""
    def with_idf(t: pa.Table) -> pa.Table:
        idf = np.log((1.0 + n_docs)
                     / (1.0 + t.column("df").to_numpy(
                         zero_copy_only=False))) + 1.0
        return pa.table({"term": t.column("term"),
                         "idf": pa.array(idf, pa.float64())})

    return df_ds.map_batches(with_idf, batch_format="pyarrow")


def tfidf_topk(docs_ds, k: int = TFIDF_K, np_: int = 0,
               bound: int = 2_000_000):
    """Top-k TF-IDF terms per document (smooth idf:
    ln((1+N)/(1+df)) + 1, sklearn's convention), deterministic
    tie-break by term.

    Two passes over the pruned (doc_id, text) columns: pass 1 reduces
    document frequencies; under ``bound`` pass 2 scores per-doc terms
    against the broadcast IDF table and takes the per-row top-k
    locally — no shuffle of per-term rows at any point.  Past it (the
    r5 vocabulary-join fallback) the IDF table stays a Dataset: docs
    explode to (doc_id, term, tf), one term-keyed ``hash_join``
    attaches idf, and the per-doc top-k runs in a doc-keyed
    ``groupby().map_groups`` — two honest shuffles, no vocab on the
    driver."""
    df_ds = doc_frequency(docs_ds, np_=np_, bound=bound).materialize()
    n_docs = docs_ds.count()
    nv = df_ds.count()
    if nv == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "tfidf": pa.array([], pa.float64()),
            "rnk": pa.array([], pa.int64())}))
    if nv > bound:
        return _tfidf_topk_join(docs_ds, df_ds, n_docs, k, np_)
    df_t = collect_table(df_ds)
    vocab = df_t.column("term").combine_chunks()
    idf = np.log((1.0 + n_docs)
                 / (1.0 + df_t.column("df").to_numpy())) + 1.0
    idf_ref = ray.put((vocab, idf))

    class ScoreTopK:
        def __init__(self):
            self.vocab, self.idf = ray.get(idf_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = _pair_counts(batch)
            if g.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "tfidf": pa.array([], pa.float64()),
                    "rnk": pa.array([], pa.int64())})
            idx = pc.index_in(g.column("term"),
                              value_set=self.vocab).to_numpy(
                zero_copy_only=False).astype(np.int64)
            tfidf = g.column("tf").to_numpy() * self.idf[idx]
            scored = g.append_column("tfidf", pa.array(tfidf))
            order = pc.sort_indices(
                scored, sort_keys=[("doc_id", "ascending"),
                                   ("tfidf", "descending"),
                                   ("term", "ascending")])
            s = scored.take(order)
            doc = s.column("doc_id").to_numpy()
            pos = np.arange(len(doc))
            seg_start = np.r_[True, doc[1:] != doc[:-1]]
            rnk = pos - np.maximum.accumulate(
                np.where(seg_start, pos, 0)) + 1
            s = s.append_column("rnk", pa.array(rnk.astype(np.int64)))
            s = s.filter(pa.array(rnk <= k))
            return s.set_column(
                s.schema.get_field_index("tfidf"), "tfidf",
                pa.array(round_half_up(s.column("tfidf").to_numpy(), 4)))

    return docs_ds.map_batches(ScoreTopK,
                               concurrency=(2, map_pool()),
                               batch_format="pyarrow")


def _tfidf_topk_join(docs_ds, df_ds, n_docs: int, k: int, np_: int):
    """tfidf_topk's past-bound path: term-keyed idf join + doc-keyed
    grouped top-k.  Split out so the broadcast path above stays the
    measured common case."""
    from cheque_ocr_project_ray.relational.joins import hash_join

    pairs = docs_ds.map_batches(_pair_counts, batch_format="pyarrow")
    j = hash_join(pairs, _idf_dataset(df_ds, n_docs), on="term",
                  num_partitions=np_ or None)

    def scored(t: pa.Table) -> pa.Table:
        tfidf = t.column("tf").to_numpy(
            zero_copy_only=False).astype(np.float64) \
            * t.column("idf").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": t.column("doc_id"),
                         "term": t.column("term"),
                         "tf": pc.cast(t.column("tf"), pa.int64()),
                         "tfidf": pa.array(tfidf, pa.float64())})

    def topk_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("doc_id", "ascending"),
                              ("tfidf", "descending"),
                              ("term", "ascending")])
        s = group.take(order)
        doc = s.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.arange(len(doc))
        seg_start = np.r_[True, doc[1:] != doc[:-1]]
        rnk = pos - np.maximum.accumulate(
            np.where(seg_start, pos, 0)) + 1
        s = s.append_column("rnk", pa.array(rnk.astype(np.int64)))
        s = s.filter(pa.array(rnk <= k))
        return s.set_column(
            s.schema.get_field_index("tfidf"), "tfidf",
            pa.array(round_half_up(s.column("tfidf").to_numpy(), 4)))

    return j.map_batches(scored, batch_format="pyarrow") \
        .groupby("doc_id", num_partitions=np_ or None) \
        .map_groups(topk_group, batch_format="pyarrow")


def _posting_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (term, df, total_tf, ids) partials, the ids list
    already capped at the POSTING_SAMPLE smallest doc ids — first-N
    of a union of first-Ns is the global first-N, so capped partials
    merge losslessly."""
    g = _pair_counts(batch)
    if g.num_rows == 0:
        return pa.table({
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "total_tf": pa.array([], pa.int64()),
            "ids": pa.array([], pa.list_(pa.int64()))})
    order = pc.sort_indices(g, sort_keys=[("term", "ascending"),
                                          ("doc_id", "ascending")])
    s = g.take(order)
    terms = s.column("term")
    term_np = terms.to_numpy(zero_copy_only=False)
    seg = np.r_[True, term_np[1:] != term_np[:-1]]
    starts = np.flatnonzero(seg)
    ends = np.r_[starts[1:], len(term_np)] if len(starts) else starts
    cnt = ends - starts
    lens = np.minimum(cnt, POSTING_SAMPLE)
    out_off = np.zeros(len(starts) + 1, np.int64)
    np.cumsum(lens, out=out_off[1:])
    local = np.arange(out_off[-1]) - np.repeat(out_off[:-1], lens)
    take_idx = np.repeat(starts, lens) + local
    ids = pa.ListArray.from_arrays(
        pa.array(out_off, type=pa.int32()),
        s.column("doc_id").take(pa.array(take_idx)).combine_chunks())
    tf_sums = np.zeros(len(starts), np.int64)
    np.add.at(tf_sums, np.repeat(np.arange(len(starts)), cnt),
              s.column("tf").to_numpy())
    return pa.table({"term": terms.take(pa.array(starts)),
                     "df": pa.array(cnt.astype(np.int64)),
                     "total_tf": pa.array(tf_sums),
                     "ids": ids})


def _merge_posting_frame(pdf):
    """Pandas merge of posting partials grouped by term."""
    import pandas as pd

    def merge(group):
        ids = sorted({i for lst in group["ids"] for i in lst})
        return pd.Series({
            "df": int(group["df"].sum()),
            "total_tf": int(group["total_tf"].sum()),
            "sample_docs": ",".join(
                str(i) for i in ids[:POSTING_SAMPLE])})

    out = pdf.groupby("term", sort=False).apply(
        merge, include_groups=False).reset_index()
    out["df"] = out["df"].astype("int64")
    out["total_tf"] = out["total_tf"].astype("int64")
    return out


def postings(docs_ds, np_: int = 0, bound: int = 2_000_000):
    """Inverted-index postings: per term, document frequency, total
    term frequency, and the first POSTING_SAMPLE doc ids (ascending)
    as a comma string.

    Vocabulary-keyed partials (ids pre-capped per batch) merge on the
    driver when bounded — one pandas groupby over a vocabulary-sized
    frame — or via a distributed groupby(term).map_groups beyond the
    bound (the shape that scales when a tokenizer explodes the
    vocabulary)."""
    partials = docs_ds.map_batches(_posting_partials,
                                   batch_format="pyarrow")
    part = partials.materialize()
    if part.count() <= bound:
        t = collect_table(part)
        if t is None:
            return ray.data.from_arrow(pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "total_tf": pa.array([], pa.int64()),
                "sample_docs": pa.array([], pa.string())}))
        return ray.data.from_arrow(
            pa.Table.from_pandas(_merge_posting_frame(t.to_pandas()),
                                 preserve_index=False)
            .replace_schema_metadata(None))

    return part.groupby("term",
                        num_partitions=np_ or shuffle_partitions()) \
        .map_groups(_merge_posting_frame, batch_format="pandas")


def decontaminate(docs_ds, modulus: int = DECONTAM_MODULUS,
                  k: int = DECONTAM_K):
    """Benchmark decontamination: docs sharing any word k-gram with
    the benchmark subset (doc_id % modulus == 0 — the stand-in for an
    external eval set) are flagged with their distinct-shingle overlap
    count.  Benchmark shingles broadcast once; the corpus streams
    through a vectorized membership filter."""
    def bench_shingles(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        sel = batch.filter(pa.array(d % modulus == 0))
        out = set()
        for txt in sel.column("text").to_pylist():
            out |= dedup.shingles(txt, k)
        return pa.table({"sh": pa.array(sorted(out), pa.int64())})

    bench = collect_table(
        docs_ds.map_batches(bench_shingles,
                            batch_format="pyarrow").materialize())
    bench_arr = (np.unique(bench.column("sh").to_numpy())
                 if bench is not None else np.array([], np.int64))
    bench_ref = ray.put(bench_arr)

    class Flag:
        def __init__(self):
            self.bench = ray.get(bench_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, hits = [], []
            d = batch.column("doc_id").to_numpy()
            for did, txt in zip(d, batch.column("text").to_pylist()):
                if did % modulus == 0:
                    continue
                sh = np.fromiter(dedup.shingles(txt, k), np.int64)
                if sh.size == 0 or self.bench.size == 0:
                    continue
                pos = np.searchsorted(self.bench, sh)
                pos[pos == self.bench.size] = 0
                n = int((self.bench[pos] == sh).sum())
                if n:
                    ids.append(int(did))
                    hits.append(n)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_hits": pa.array(hits, pa.int64())})

    return docs_ds.map_batches(Flag, concurrency=(2, map_pool()),
                               batch_format="pyarrow")


PAIRS_DF_CAP = 100
PAIRS_THRESHOLD = 0.5


def tfidf_pairs(docs_ds, df_cap: int = PAIRS_DF_CAP,
                threshold: float = PAIRS_THRESHOLD, np_: int = 0,
                bound: int = 2_000_000):
    """Sparse TF-IDF cosine doc-doc similarity pairs — the
    all-pairs-similar-documents join, DF-capped so it scales.

    Semantics: cosine over the term subspace with ``df ≤ df_cap``
    (weights, norms, AND dot products all live in the capped space —
    an exact cosine there, not an approximation of the full one).
    The cap is what makes the sparse join tractable: a term's posting
    list is ≤ df_cap rows, so per-term pair generation is O(df_cap²)
    regardless of corpus size, and hot (stopword-like) terms — which
    contribute near-zero IDF weight anyway — never explode the join.

    Scale shape: pass 1 reduces exact DFs (combiner + bounded merge);
    under ``bound`` the capped-vocab IDF table broadcasts once (same
    convention as :func:`tfidf_topk`) and pass 2 emits L2-normalized
    postings locally (norms are exact per batch — docs are whole
    rows).  Past it (the r5 term-partitioned fallback the docstring
    used to promise) the capped IDF table stays a Dataset: a
    term-keyed ``hash_join`` attaches idf (the inner join IS the
    df-cap filter), per-doc squared norms reduce through the
    doc-keyed merge, and a doc-keyed join divides them back in.
    Either way ``groupby(term)`` then generates within-posting pair
    products and the per-pair dot reduces through
    ``final_merge_sums``.  Emitted: (doc_a, doc_b, cos) with
    ``round(cos, 5) ≥ threshold``, the rounded-compare convention
    shared with ``ann_range_search``."""
    df_ds = doc_frequency(docs_ds, np_=np_, bound=bound).materialize()
    n_docs = docs_ds.count()
    nv = df_ds.count()
    if nv == 0:
        return ray.data.from_arrow(_EMPTY_DOC_PAIRS)
    if nv > bound:
        posts = _normalized_postings_join(docs_ds, df_ds, n_docs,
                                          df_cap, np_, bound)
        return _pairs_from_postings(posts, threshold, np_, bound)
    df_t = collect_table(df_ds)
    df_t = df_t.filter(pc.less_equal(df_t.column("df"),
                                     pa.scalar(df_cap)))
    vocab = df_t.column("term").combine_chunks()
    idf = np.log((1.0 + n_docs)
                 / (1.0 + df_t.column("df").to_numpy())) + 1.0
    idf_ref = ray.put((vocab, idf))

    class NormalizedPostings:
        def __init__(self):
            self.vocab, self.idf = ray.get(idf_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = _pair_counts(batch)
            idx = pc.index_in(g.column("term"), value_set=self.vocab)
            g = g.filter(pc.is_valid(idx))
            if g.num_rows == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "wn": pa.array([], pa.float64())})
            idx = pc.index_in(g.column("term"),
                              value_set=self.vocab).to_numpy(
                zero_copy_only=False).astype(np.int64)
            w = g.column("tf").to_numpy().astype(np.float64) \
                * self.idf[idx]
            doc = g.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            # per-doc L2 norm over the capped terms, dense within batch
            _, dense = np.unique(doc, return_inverse=True)
            sq = np.zeros(dense.max() + 1, np.float64)
            np.add.at(sq, dense, w * w)
            wn = w / np.sqrt(sq)[dense]
            return pa.table({"term": g.column("term"),
                             "doc_id": pa.array(doc, pa.int64()),
                             "wn": pa.array(wn, pa.float64())})

    posts = docs_ds.map_batches(NormalizedPostings,
                                concurrency=(2, map_pool()),
                                batch_format="pyarrow")
    return _pairs_from_postings(posts, threshold, np_, bound)


def _pairs_from_postings(posts, threshold: float, np_: int,
                         bound: int = 2_000_000):
    """Shared tail of :func:`tfidf_pairs`: within-posting pair
    products via ``groupby(term)``, per-pair dot reduction, threshold
    + deterministic ordering."""
    def pair_gen(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        w = group.column("wn").to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, w = d[order], w[order]
        ii, jj = np.triu_indices(len(d), 1)
        return pa.table({"doc_a": pa.array(d[ii], pa.int64()),
                         "doc_b": pa.array(d[jj], pa.int64()),
                         "dot": pa.array(w[ii] * w[jj], pa.float64())})

    pairs = posts.groupby("term").map_groups(pair_gen,
                                             batch_format="pyarrow")
    agg = final_merge_sums(pairs, ["doc_a", "doc_b"], ["dot"],
                           np_=np_, bound=bound)

    def shape(batch: pa.Table) -> pa.Table:
        cos = round_half_up(batch.column("dot").to_numpy(
            zero_copy_only=False), 5)
        t = pa.table({"doc_a": batch.column("doc_a"),
                      "doc_b": batch.column("doc_b"),
                      "cos": pa.array(cos, pa.float64())})
        return t.filter(pc.greater_equal(t.column("cos"),
                                         pa.scalar(threshold)))

    out = agg.map_batches(shape, batch_format="pyarrow") \
        .sort(["doc_a", "doc_b"]).materialize()
    # a zero-pair corpus (every shared term above df_cap, or nothing
    # past the threshold — the sf0.1 tier does this) must still be a
    # TYPED empty: Ray's to_pandas drops columns on ANY empty Dataset,
    # so hand back the typed Arrow table instead.  The materialize is
    # ~free — sort is already an all-to-all barrier on this bounded,
    # threshold-filtered pair set.
    if out.count() == 0:
        return _EMPTY_DOC_PAIRS
    return out


def _normalized_postings_join(docs_ds, df_ds, n_docs: int,
                              df_cap: int, np_: int,
                              bound: int = 2_000_000):
    """tfidf_pairs' past-bound postings: the capped (term, idf) table
    stays a Dataset.  The term-keyed INNER join both attaches idf and
    enforces the df-cap; per-doc squared norms reduce through the
    doc-keyed merge and a second doc-keyed join divides them back
    in."""
    from cheque_ocr_project_ray.relational.joins import hash_join

    def capped(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t.column("df"),
                                      pa.scalar(df_cap)))

    idf_ds = _idf_dataset(df_ds.map_batches(capped,
                                            batch_format="pyarrow"),
                          n_docs)
    pairs = docs_ds.map_batches(_pair_counts, batch_format="pyarrow")
    jw = hash_join(pairs, idf_ds, on="term",
                   num_partitions=np_ or None)

    def weighted(t: pa.Table) -> pa.Table:
        w = t.column("tf").to_numpy(
            zero_copy_only=False).astype(np.float64) \
            * t.column("idf").to_numpy(zero_copy_only=False)
        return pa.table({"term": t.column("term"),
                         "doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "w": pa.array(w, pa.float64())})

    wtbl = jw.map_batches(weighted, batch_format="pyarrow") \
        .materialize()

    def sq_partial(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        g = pa.table({"doc_id": t.column("doc_id"),
                      "sq": pa.array(w * w, pa.float64())}) \
            .group_by("doc_id").aggregate([("sq", "sum")])
        return g.rename_columns(["doc_id", "sq"])

    norms = final_merge_sums(
        wtbl.map_batches(sq_partial, batch_format="pyarrow"),
        ["doc_id"], ["sq"], np_=np_, bound=bound)
    jn = hash_join(wtbl, norms, on="doc_id",
                   num_partitions=np_ or None)

    def normalized(t: pa.Table) -> pa.Table:
        wn = t.column("w").to_numpy(zero_copy_only=False) \
            / np.sqrt(t.column("sq").to_numpy(zero_copy_only=False))
        return pa.table({"term": t.column("term"),
                         "doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "wn": pa.array(wn, pa.float64())})

    return jn.map_batches(normalized, batch_format="pyarrow")


_EMPTY_DOC_PAIRS = pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})


def _doc_bigrams(batch: pa.Table) -> pa.Table:
    """Distinct (doc_id, g) word-bigram shingles per doc — the engine
    side of the ``_shingle_ctes(2)`` SQL convention: non-empty tokens,
    adjacent pairs joined with ' ', docs with a single token keep that
    token as their one shingle, docs with no tokens emit nothing.
    Exact per batch (a document is one row)."""
    flat, counts = _filtered_tokens(batch.column("text"))
    n = len(batch)
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    doc_ids = batch.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    same = parent[:-1] == parent[1:] if len(parent) else \
        np.zeros(0, bool)
    mask = pa.array(np.concatenate([same, [False]])) if len(parent) \
        else pa.array([], pa.bool_())
    lead = flat.filter(mask)
    trail = flat.filter(pa.array(np.concatenate([[False], same]))
                        if len(parent) else pa.array([], pa.bool_()))
    g = pc.binary_join_element_wise(lead, trail, " ")
    grow = parent[:-1][same] if len(parent) else parent
    single = counts == 1
    if single.any():
        first_pos = np.concatenate([[0], np.cumsum(counts)[:-1]])
        srow = np.flatnonzero(single)
        g = pa.concat_arrays([g, flat.take(pa.array(first_pos[srow]))])
        grow = np.concatenate([grow, srow])
    t = pa.table({"doc_id": pa.array(doc_ids[grow], pa.int64()),
                  "g": g})
    return t.group_by(["doc_id", "g"]).aggregate([]) \
        .select(["doc_id", "g"])


def ngram_novelty(docs_ds, np_: int = 0):
    """Per-doc n-gram novelty — the streaming-curation freshness
    signal: the fraction of a doc's distinct bigram shingles whose
    FIRST corpus occurrence (min doc_id) is the doc itself.  Near-1 ⇒
    fresh content; near-0 ⇒ the doc restates earlier material (the
    within-corpus contamination complement of ``decontaminate``).

    Scale shape: two streaming passes over the shingle pairs — pass 1
    reduces per-gram min doc_id through combiner partials + the
    bounded-adaptive merge; pass 2 hash-joins the pairs against the
    winner table on the gram (both sides corpus-scale — never a
    broadcast) and folds per-doc novel/total counts through
    ``final_merge_sums``.  Docs with no tokens emit no row (the SQL
    ``sh`` convention)."""
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import final_merge_min

    pairs = docs_ds.map_batches(_doc_bigrams, batch_format="pyarrow")

    def min_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("g").aggregate([("doc_id", "min")])
        return g.rename_columns(["g", "first_doc"])

    winners = final_merge_min(
        pairs.map_batches(min_partial, batch_format="pyarrow"),
        ["g"], ["first_doc"], np_=np_)
    joined = hash_join(pairs, winners, on="g", num_partitions=np_ or None)

    def count_partial(batch: pa.Table) -> pa.Table:
        novel = pc.cast(pc.equal(batch.column("first_doc"),
                                 batch.column("doc_id")), pa.int64())
        t = pa.table({"doc_id": batch.column("doc_id"),
                      "n_grams": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "n_novel": novel})
        g = t.group_by("doc_id").aggregate([("n_grams", "sum"),
                                            ("n_novel", "sum")])
        return g.rename_columns(["doc_id", "n_grams", "n_novel"])

    agg = final_merge_sums(
        joined.map_batches(count_partial, batch_format="pyarrow"),
        ["doc_id"], ["n_grams", "n_novel"], np_=np_)

    def shape(batch: pa.Table) -> pa.Table:
        ng = batch.column("n_grams").to_numpy(zero_copy_only=False)
        nv = batch.column("n_novel").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_grams": batch.column("n_grams"),
            "n_novel": batch.column("n_novel"),
            "novelty": pa.array(round_half_up(nv / ng, 4),
                                pa.float64())})

    return agg.map_batches(shape, batch_format="pyarrow").sort("doc_id")
