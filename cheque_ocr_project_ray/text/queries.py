"""Driver-facing text queries over the ``documents`` table, with
DuckDB oracles where SQL can express the same deterministic rule.

Every entry is oracled, including the dedup family: SimHash is
re-derived bit-for-bit in SQL (md5_number_lower word hashes, 64
majority aggregates), and the MinHash-LSH pair output is checked
against brute-force all-pairs shingle Jaccard — see the docstrings on
the SQL builders for exactly what each equality does and doesn't
assert.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import ray.data

from cheque_ocr_project_ray.text import analysis, dedup, extraction, index


def _docs(sf_dir: str):
    return ray.data.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                                 columns=["doc_id", "text"])


def corpus_vocab_coverage(sf_dir: str, np_: int = 0,
                          bound: int = 2_000_000):
    """Vocabulary coverage curve summary: total token mass, vocab
    size, the smallest k whose top-k words cover ≥90% of tokens
    (exact-int test cum·10 ≥ total·9), and the coverage of the top
    100 — the tokenizer-budget sizing numbers.  Word counts reduce
    distributedly (combiner + bounded-adaptive merge); under ``bound``
    the cumsum folds over the collected vocab on the driver.  Past it
    (the r5 vocabulary-rank fallback) the count table stays
    distributed: one global sort on (n DESC, word) + the two-phase
    block prefix scan — ``block_prefix_offsets`` gives each block its
    exclusive rank/mass offsets, each block probes its own k90 hit
    and rank-100 cum in a Ray task, and the driver folds n_blocks
    3-tuples.  Exact integer arithmetic end-to-end, so both branches
    are bit-identical to the SQL window."""
    import numpy as np
    import pandas as pd
    import ray as _ray
    from cheque_ocr_project_ray.text.bpe import word_counts
    from cheque_ocr_project_ray.util import (block_prefix_offsets,
                                             collect_table,
                                             round_half_up)

    wc = word_counts(_docs(sf_dir), np_=np_, bound=bound).materialize()
    vocab = wc.count()
    if vocab == 0:
        return pd.DataFrame({"n_tokens": pd.Series([], dtype="int64"),
                             "vocab_size": pd.Series([], dtype="int64"),
                             "k90": pd.Series([], dtype="int64"),
                             "coverage_100": pd.Series([],
                                                       dtype="float64")})
    if vocab <= bound:
        t = collect_table(wc)
        df = t.to_pandas().sort_values(["n", "word"],
                                       ascending=[False, True])
        n = df["n"].to_numpy()
        cum = n.cumsum()
        total = int(cum[-1])
        k90 = int(np.argmax(cum * 10 >= total * 9)) + 1
        cov100 = 1.0 if len(cum) < 100 else float(cum[99]) / float(total)
        return pd.DataFrame([{
            "n_tokens": total,
            "vocab_size": int(len(df)),
            "k90": k90,
            "coverage_100": float(round_half_up(cov100, 6))}])
    # vocabulary past driver memory: distributed rank via sort +
    # two-phase prefix scan (the orders_pareto shape)
    refs = wc.sort(["n", "word"], descending=[True, False]) \
        .materialize().to_arrow_refs()
    rows, row_off, sums, sum_off = block_prefix_offsets(refs, "n")
    total = int(sums.sum())

    @_ray.remote
    def probe(t, roff: int, coff: int, total: int):
        if t.num_columns == 0 or t.num_rows == 0:
            return (0, -1)
        cum = coff + np.cumsum(
            t.column("n").to_numpy(zero_copy_only=False))
        hit = np.nonzero(cum * 10 >= total * 9)[0]
        k90 = int(roff + hit[0] + 1) if len(hit) else 0
        i = 99 - roff   # global rank 100 lives at local index i
        c100 = int(cum[i]) if 0 <= i < len(cum) else -1
        return (k90, c100)

    probes = _ray.get([probe.remote(r, int(ro), int(co), total)
                       for r, ro, co in zip(refs, row_off, sum_off)])
    k90 = min(p[0] for p in probes if p[0] > 0)
    c100 = next((p[1] for p in probes if p[1] >= 0), -1)
    cov100 = 1.0 if c100 < 0 else float(c100) / float(total)
    return pd.DataFrame([{
        "n_tokens": total,
        "vocab_size": int(vocab),
        "k90": int(k90),
        "coverage_100": float(round_half_up(cov100, 6))}])


CORPUS_VOCAB_COVERAGE_SQL = """
WITH w AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents),
c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
tot AS (SELECT sum(n) AS t, count(*) AS v FROM c),
r AS (SELECT n,
             row_number() OVER (ORDER BY n DESC, word) AS rk,
             sum(n) OVER (ORDER BY n DESC, word
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM c)
SELECT CAST((SELECT t FROM tot) AS BIGINT) AS n_tokens,
       CAST((SELECT v FROM tot) AS BIGINT) AS vocab_size,
       CAST((SELECT min(rk) FROM r
             WHERE cum * 10 >= (SELECT t FROM tot) * 9) AS BIGINT)
           AS k90,
       round(coalesce(
           (SELECT CAST(cum AS DOUBLE) FROM r WHERE rk = 100)
           / (SELECT CAST(t AS DOUBLE) FROM tot), 1.0), 6)
           AS coverage_100
"""


def corpus_bpe_merges(sf_dir: str):
    """First 5 BPE merge rules trained on the corpus word-frequency
    table (`text/bpe.py`) — the tokenizer-training operator.
    Rows-only: the fixed-point merge loop is not reasonably
    SQL-expressible; a classic hand-computed example pytests it."""
    from cheque_ocr_project_ray.text.bpe import bpe_merges
    return bpe_merges(_docs(sf_dir), n_merges=5)


def doc_token_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.token_stats,
                                     batch_format="pyarrow")


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text)                                   AS n_chars
FROM documents
"""


def doc_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.quality_counts,
                                     batch_format="pyarrow")


QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> x IN ('a', 'the'))) AS stop_hits,
       len(list_distinct(toks)) AS distinct_tokens,
       round(len(list_filter(toks, x -> x IN ('a', 'the'))) * 1.0
             / len(toks), 4) AS stop_ratio,
       round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr
FROM t
"""


PACK_BUDGET = 512


def doc_pack(sf_dir: str):
    """Greedy fixed-budget sequence packing — a distributed global
    prefix sum over doc_id order (see ``text/pack.py``); pack_id =
    exclusive cumulative token count // budget, i.e. the SQL running
    window below."""
    from cheque_ocr_project_ray.text.pack import pack_documents
    return pack_documents(_docs(sf_dir), budget=PACK_BUDGET)


PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
            // {PACK_BUDGET} AS BIGINT) AS pack_id
FROM t
"""


TOP_BIGRAMS_K = 25


def corpus_top_bigrams(sf_dir: str):
    """Global top-k bigrams by corpus frequency — the heavy-hitters
    shape: per-batch bigram counts (one dictionary-encode + np.unique,
    same kernel as doc_repetition), merged through the bounded-adaptive
    sum path, then a tiny sort+limit.  Ties break lexicographically so
    both engines cut the same k."""
    from cheque_ocr_project_ray.util import final_merge_sums

    ds = _docs(sf_dir)
    counts = final_merge_sums(
        ds.map_batches(analysis.bigram_counts, batch_format="pyarrow"),
        ["bigram"], ["n"])
    return counts.sort(["n", "bigram"], descending=[True, False]) \
        .limit(TOP_BIGRAMS_K)


TOP_BIGRAMS_SQL = f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), b AS (
  SELECT unnest(list_transform(toks[1:len(toks)-1],
                               (x, i) -> x || ' ' || toks[i + 1])) AS bigram
  FROM t
)
SELECT bigram, count(*) AS n FROM b
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {TOP_BIGRAMS_K}
"""


def doc_repetition(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.repetition,
                                     batch_format="pyarrow")


REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS w FROM t
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w
), wm AS (
  SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n
  FROM wc GROUP BY doc_id
), b AS (
  SELECT doc_id,
         unnest(list_transform(toks[1:len(toks)-1],
                               (x, i) -> x || ' ' || toks[i + 1])) AS bg
  FROM t
), bc AS (
  SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg
), bm AS (
  SELECT doc_id, max(c) AS top_bc FROM bc GROUP BY doc_id
)
SELECT wm.doc_id, n AS n_tokens,
       CAST(top_c AS BIGINT) AS top_count,
       round(top_c * 1.0 / n, 4) AS top_frac,
       round(coalesce(top_bc * 1.0 / nullif(n - 1, 0), 0), 4)
           AS bigram_top_frac
FROM wm LEFT JOIN bm USING (doc_id)
"""


def doc_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.lang_id,
                                     batch_format="pyarrow")


def _lang_id_sql(extra: str = "") -> tuple[str, str]:
    """ONE source for the lang-ID heuristic's SQL — marker word lists
    come from ``analysis.LANG_MARKERS`` and the tie-break CASE is a
    single literal — so ``LANG_ID_SQL`` and ``LANG_CONFUSION_SQL``
    cannot silently drift from each other or from ``analysis.lang_id``
    when the heuristic changes (ADVICE r4).  ``extra`` adds
    pass-through columns (e.g. ``", lang"``)."""
    def words(lang: str) -> str:
        return ", ".join(f"'{w}'" for w in analysis.LANG_MARKERS[lang])
    ctes = f"""WITH t AS (
  SELECT doc_id{extra},
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), hits AS (
  SELECT doc_id{extra},
         len(list_filter(toks, x -> x IN ({words('en')})))  AS en,
         len(list_filter(toks, x -> x IN ({words('es')}))) AS es,
         len(list_filter(toks, x -> x IN ({words('fr')}))) AS fr
  FROM t
)"""
    case = """CASE WHEN en = 0 AND es = 0 AND fr = 0 THEN 'und'
            WHEN en >= es AND en >= fr THEN 'en'
            WHEN es >= fr THEN 'es'
            ELSE 'fr' END AS pred_lang"""
    return ctes, case


_LID_CTES, _LID_CASE = _lang_id_sql()
LANG_ID_SQL = f"""
{_LID_CTES}
SELECT doc_id,
       {_LID_CASE}
FROM hits
"""


def doc_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.fingerprint,
                                     batch_format="pyarrow")


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


def doc_bpe_tokens(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.bpe_token_count,
                                     batch_format="pyarrow")


# the SQL literal needs the leading quote of the pattern doubled
BPE_TOKENS_SQL = (
    "SELECT doc_id, CAST(len(regexp_extract_all(text, '"
    + analysis.BPE_PATTERN.replace("'", "''")
    + "')) AS BIGINT) AS n_bpe_tokens FROM documents"
)


def doc_split(sf_dir: str):
    """Deterministic hash-based train/val/test assignment (90/5/5):
    the standard reproducible corpus split — bucket is a pure function
    of doc_id, so re-runs, resumes and incremental additions land each
    doc in the same split on any cluster."""
    return _docs(sf_dir).map_batches(analysis.train_split,
                                     batch_format="pyarrow")


SPLIT_SQL = """
WITH b AS (
  SELECT doc_id,
         CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT)
             AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def doc_winnow(sf_dir: str):
    """Winnowing (rolling-hash) fingerprints per doc — the MOSS-style
    near-dup index primitive; (doc_id, fp) inverted rows."""
    return _docs(sf_dir).map_batches(analysis.winnow_fingerprints,
                                     batch_format="pyarrow")


WINNOW_SQL = f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(
             1, length(text) - {analysis.WINNOW_K} + 1)) AS i
  FROM documents
  WHERE length(text) >= {analysis.WINNOW_K}
), h AS (
  SELECT doc_id, i,
         md5_number_lower(substr(text, i, {analysis.WINNOW_K})) AS hv,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM pos
), w AS (
  SELECT doc_id, i, n,
         min(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW
                       AND {analysis.WINNOW_W - 1} FOLLOWING) AS mh
  FROM h
)
SELECT DISTINCT doc_id, mh AS fp
FROM w
WHERE i <= greatest(n - {analysis.WINNOW_W} + 1, 1)
"""


def dedup_winnow(sf_dir: str):
    """Near-dup pairs sharing >= 3 winnowing fingerprints (after the
    df<=50 stopword-gram cap)."""
    return dedup.winnow_dedup_pairs(_docs(sf_dir), min_shared=3,
                                    max_df=50)


DEDUP_WINNOW_SQL = f"""
WITH w AS ({WINNOW_SQL}),
wf AS (
  SELECT * FROM w
  WHERE fp IN (SELECT fp FROM w GROUP BY fp HAVING count(*) <= 50)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM wf a JOIN wf b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 3
"""


def doc_main_content(sf_dir: str):
    """HTML boilerplate strip (the tier's named extraction operator):
    deterministic HTML rendering of each doc → the generic vectorized
    main-content extractor (script/style drop, block segmentation,
    tag/class heuristics, word mass, link density).  The oracle
    derives the expected output directly from the source text —
    an independent derivation, so equality checks the whole
    parse → strip → filter → reassemble path."""
    return _docs(sf_dir) \
        .map_batches(extraction.synthesize_html, batch_format="pyarrow") \
        .map_batches(extraction.extract_main_content,
                     batch_format="pyarrow")


MAIN_CONTENT_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), d AS (
  SELECT doc_id, ws, len(ws) AS n,
         CAST(ceil(len(ws) / 2.0) AS BIGINT) AS n1
  FROM w
)
SELECT doc_id,
       CAST({extraction.RENDERED_BLOCKS} AS BIGINT) AS n_blocks,
       CAST(CASE WHEN n1 >= {extraction.MIN_WORDS} THEN 1 ELSE 0 END
            + CASE WHEN n - n1 >= {extraction.MIN_WORDS} THEN 1
                   ELSE 0 END AS BIGINT) AS n_kept,
       CAST(CASE WHEN n1 >= {extraction.MIN_WORDS} THEN n1 ELSE 0 END
            + CASE WHEN n - n1 >= {extraction.MIN_WORDS} THEN n - n1
                   ELSE 0 END AS BIGINT) AS words_kept,
       concat_ws(chr(10),
           CASE WHEN n1 >= {extraction.MIN_WORDS}
                THEN array_to_string(ws[1:n1], ' ') END,
           CASE WHEN n - n1 >= {extraction.MIN_WORDS}
                THEN array_to_string(ws[n1 + 1:n], ' ') END
       ) AS main_text
FROM d
"""


def doc_redact(sf_dir: str):
    """PII/URL scrubbing: deterministic PII augmentation (pure
    function of (doc_id, text), mirrored in the SQL) → the generic
    vectorized redactor.  Counts + scrubbed text, exact-oracled
    (Arrow and DuckDB both use RE2, so the patterns mean the same
    thing on both sides)."""
    return _docs(sf_dir) \
        .map_batches(extraction.inject_pii, batch_format="pyarrow") \
        .map_batches(extraction.redact_pii, batch_format="pyarrow")


REDACT_SQL = ("""
WITH aug AS (
  SELECT doc_id,
         text || ' Contact alice' || CAST(doc_id % 10 AS VARCHAR)
              || '@example.com or https://site'
              || CAST(doc_id % 5 AS VARCHAR)
              || '.example/page-' || CAST(doc_id AS VARCHAR)
              || ' or call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || '.' AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '""" + extraction.URL_RE + """'))
            AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(t, '""" + extraction.EMAIL_RE + """'))
            AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '""" + extraction.PHONE_RE + """'))
            AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(
           t, '""" + extraction.URL_RE + """', '<URL>', 'g'),
           '""" + extraction.EMAIL_RE + """', '<EMAIL>', 'g'),
           '""" + extraction.PHONE_RE + """', '<PHONE>', 'g')
           AS clean_text
FROM aug
""")


def dedup_exact(sf_dir: str):
    return dedup.exact_dedup(_docs(sf_dir))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_dups
FROM documents
GROUP BY md5(text)
"""


def dedup_prefix(sf_dir: str):
    return dedup.prefix_dedup(_docs(sf_dir), prefix_len=40)


DEDUP_PREFIX_SQL = """
SELECT substr(text, 1, 40) AS prefix, min(doc_id) AS doc_id,
       count(*) AS n_dups
FROM documents
GROUP BY substr(text, 1, 40)
"""


_INCR_SENT = 1 << 62


def dedup_incremental(sf_dir: str, np_: int = 0):
    """Incremental-crawl dedup: the newest 20% of the corpus (doc_id ≥
    ⌊0.8·(max_id+1)⌋, the id-ordered ingest convention) is checked
    against everything already processed — a new doc is kept iff its
    40-char prefix key (the ``dedup_prefix`` convention) was never seen
    in the old corpus AND it is the first holder of that key within
    the new shard.

    Scale shape: per-key (min_old, min_new) winners reduce through
    combiner partials + the bounded-adaptive min merge (sentinel 2^62
    marks 'absent on this side', so ONE min-merge serves both sides);
    the new shard then hash-joins the winner table — both sides
    corpus-scale, no broadcast, and the old corpus is never re-read
    beyond the shared winner pass."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import final_merge_min

    ids = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"), columns=["doc_id"])
    split = int(np.floor(0.8 * (ids.max("doc_id") + 1)))

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "k": pc.utf8_slice_codeunits(batch.column("text"), 0, 40)})

    docs = _docs(sf_dir).map_batches(keyed, batch_format="pyarrow")

    def win_partial(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id")
        old = pc.less(doc, pa.scalar(split))
        sent = pa.scalar(_INCR_SENT, pa.int64())
        t = pa.table({"k": batch.column("k"),
                      "min_old": pc.if_else(old, doc, sent),
                      "min_new": pc.if_else(old, sent, doc)})
        g = t.group_by("k").aggregate([("min_old", "min"),
                                       ("min_new", "min")])
        return g.rename_columns(["k", "min_old", "min_new"])

    winners = final_merge_min(
        docs.map_batches(win_partial, batch_format="pyarrow"),
        ["k"], ["min_old", "min_new"], np_=np_)

    new = docs.filter(expr=f"doc_id >= {split}")
    joined = hash_join(new, winners, on="k",
                       num_partitions=np_ or None)

    def shape(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id")
        dup_old = pc.not_equal(batch.column("min_old"),
                               pa.scalar(_INCR_SENT, pa.int64()))
        dup_new = pc.less(batch.column("min_new"), doc)
        keep = pc.and_(pc.invert(dup_old),
                       pc.equal(batch.column("min_new"), doc))
        return pa.table({"doc_id": doc,
                         "dup_old": pc.cast(dup_old, pa.int64()),
                         "dup_new": pc.cast(dup_new, pa.int64()),
                         "keep": pc.cast(keep, pa.int64())})

    return joined.map_batches(shape, batch_format="pyarrow") \
        .sort("doc_id")


DEDUP_INCREMENTAL_SQL = """
WITH s AS (
  SELECT CAST(floor(0.8 * (max(doc_id) + 1)) AS BIGINT) AS split
  FROM documents
), d AS (
  SELECT doc_id, substr(text, 1, 40) AS k FROM documents
), w AS (
  SELECT k,
         min(CASE WHEN doc_id < s.split THEN doc_id END) AS min_old,
         min(CASE WHEN doc_id >= s.split THEN doc_id END) AS min_new
  FROM d, s GROUP BY k
)
SELECT d.doc_id,
       CAST(w.min_old IS NOT NULL AS BIGINT) AS dup_old,
       CAST(w.min_new < d.doc_id AS BIGINT) AS dup_new,
       CAST(w.min_old IS NULL AND w.min_new = d.doc_id AS BIGINT)
           AS keep
FROM d JOIN w USING (k), s
WHERE d.doc_id >= s.split
ORDER BY d.doc_id
"""


def dedup_minhash(sf_dir: str):
    return dedup.minhash_dedup_pairs(_docs(sf_dir), threshold=0.6)


def dedup_ngram_jaccard(sf_dir: str):
    return dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                     threshold=0.5)


def dedup_components(sf_dir: str):
    """Connected components over the n-gram-Jaccard near-dup pairs:
    (doc_id, rep) with rep = smallest doc_id in the transitive
    closure — the canonical keep/drop rule downstream of any pair
    dedup.  Oracled against a recursive-CTE closure in SQL."""
    from cheque_ocr_project_ray.text.cluster import components_from_pairs
    pairs = dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                      threshold=0.5)
    return components_from_pairs(pairs)


def dedup_canonical(sf_dir: str, bound: int = 2_000_000):
    """Near-dup cluster canonicalization — the keep/drop decision a
    curation run makes AFTER pair-finding and clustering: within each
    connected component of the n-gram-Jaccard near-dup graph, keep the
    member with the HIGHEST quality score (tie → smallest doc_id).

    Output per multi-doc cluster: (rep, keep_doc_id, n_members,
    best_score).  Scale shape: components and quality scores are both
    corpus-streamed; they meet in one partitioned hash join (the
    component table is corpus-sized in the worst case — never
    broadcast), and the per-cluster argmax reduces associatively as a
    packed-int min (``(1e6 - score·1e6) << 32 | doc_id`` — same
    pack-argmin convention as ``min_cost_supplier``; assumes doc_id <
    2^32, this corpus's id convention) through combiner partials and
    the bounded-adaptive final merge."""
    import numpy as np
    import pyarrow as pa

    from ray.data.aggregate import Min as RayMin
    from ray.data.aggregate import Sum as RaySum

    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.text.cluster import components_from_pairs
    from cheque_ocr_project_ray.util import collect_table

    pairs = dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                      threshold=0.5)
    comps = components_from_pairs(pairs)                  # (doc_id, rep)
    scored = _docs(sf_dir).map_batches(
        analysis.quality_score, batch_format="pyarrow") \
        .select_columns(["doc_id", "score"])
    joined = hash_join(comps, scored, on="doc_id")

    def packed_partial(batch: pa.Table) -> pa.Table:
        # score is 6dp-rounded, so score·1e6 is within float ulps of an
        # integer — np.rint and SQL round(x, 0) agree (no .5 fractions)
        qi = np.rint(batch.column("score").to_numpy(zero_copy_only=False)
                     * 1_000_000).astype(np.int64)
        doc = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        packed = ((1_000_000 - qi) << 32) | doc
        t = pa.table({"rep": batch.column("rep"),
                      "packed": pa.array(packed, pa.int64()),
                      "n_members": pa.array(np.ones(len(doc), np.int64))})
        g = t.group_by("rep").aggregate([("packed", "min"),
                                         ("n_members", "sum")])
        return g.rename_columns(["rep", "packed", "n_members"])

    def unpack(t: pa.Table) -> pa.Table:
        packed = t.column("packed").to_numpy(zero_copy_only=False)
        qi = 1_000_000 - (packed >> np.int64(32))
        return pa.table({
            "rep": t.column("rep"),
            "keep_doc_id": pa.array(packed & np.int64(0xFFFFFFFF),
                                    pa.int64()),
            "n_members": t.column("n_members"),
            "best_score": pa.array(qi.astype(np.float64) / 1_000_000.0,
                                   pa.float64())})

    partials = joined.map_batches(packed_partial,
                                  batch_format="pyarrow").materialize()
    if partials.count() <= bound:
        t = collect_table(partials)
        if t is None or t.num_rows == 0:
            return ray.data.from_arrow(pa.table({
                "rep": pa.array([], pa.int64()),
                "keep_doc_id": pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64()),
                "best_score": pa.array([], pa.float64())}))
        g = t.group_by("rep").aggregate([("packed", "min"),
                                         ("n_members", "sum")]) \
            .rename_columns(["rep", "packed", "n_members"])
        merged = ray.data.from_arrow(unpack(g))
    else:
        merged = partials.groupby("rep").aggregate(
            RayMin("packed", alias_name="packed"),
            RaySum("n_members", alias_name="n_members")) \
            .map_batches(unpack, batch_format="pyarrow")
    return merged.sort("rep")


def _components_sql(k: int, threshold: float) -> str:
    """Transitive closure of the exact all-pairs Jaccard edge list via
    a recursive CTE; min reachable label == component representative.
    Equality vs the engine asserts the union-find / label-propagation
    result against an independent closure construction."""
    return f"""
WITH RECURSIVE {_shingle_ctes(k)}, sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE i * 1.0 / (na.n + nb.n - i) >= {threshold}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT DISTINCT a AS doc, a AS lab FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.doc
)
SELECT doc AS doc_id, min(lab) AS rep FROM reach GROUP BY doc
"""


def doc_simhash(sf_dir: str):
    return dedup.simhash_docs(_docs(sf_dir))


def dedup_simhash(sf_dir: str):
    return dedup.simhash_near_pairs(_docs(sf_dir), max_hamming=3)


def _shingle_ctes(k: int) -> str:
    """The shared word-k-gram CTEs (``words``, ``sh``): distinct
    shingles per doc with the engine's short-doc convention (fewer
    than k tokens → the whole text is the single shingle).  Raw
    string shingles here vs crc32-hashed in the engine — same SETS
    absent collisions, as documented on the Jaccard oracle."""
    return f"""words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           CASE WHEN len(ws) < {k} THEN array_to_string(ws, ' ')
                ELSE array_to_string(ws[i.gen:i.gen + {k - 1}], ' ')
           END AS g
    FROM words,
         LATERAL (SELECT unnest(generate_series(
                      1, greatest(len(ws) - {k - 1}, 1))) AS gen) i
    WHERE len(ws) > 0
  )
)"""


def doc_tfidf_topk(sf_dir: str, np_: int = 0,
                   bound: int = 2_000_000):
    """Top-3 TF-IDF terms per doc (smooth sklearn idf), deterministic
    term tie-break; DF pass merges bounded-adaptively, the IDF table
    broadcasts once under ``bound`` and becomes a term-keyed hash
    join + doc-keyed grouped top-k past it."""
    return index.tfidf_topk(_docs(sf_dir), np_=np_, bound=bound)


TFIDF_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, t.w AS term FROM w, LATERAL unnest(ws) AS t(w)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
), n AS (
  SELECT count(*) AS n FROM documents
), scored AS (
  SELECT doc_id, term, tf,
         tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) AS tfidf,
         row_number() OVER (
             PARTITION BY doc_id
             ORDER BY tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0)
                      DESC, term ASC) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, round(tfidf, 4) AS tfidf,
       CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= {index.TFIDF_K}
"""


def doc_tfidf_pairs(sf_dir: str, np_: int = 0,
                    bound: int = 2_000_000):
    """All-pairs similar documents by TF-IDF cosine in the DF-capped
    term space — the sparse similarity join (see
    :func:`index.tfidf_pairs` for the bounded per-term pair shape and
    the past-``bound`` term-partitioned join postings)."""
    return index.tfidf_pairs(_docs(sf_dir), np_=np_, bound=bound)


TFIDF_PAIRS_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, t.w AS term FROM w, LATERAL unnest(ws) AS t(w)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
  HAVING count(DISTINCT doc_id) <= {index.PAIRS_DF_CAP}
), n AS (
  SELECT count(*) AS n FROM documents
), wgt AS (
  SELECT doc_id, term,
         tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nm FROM wgt GROUP BY doc_id
), prs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM wgt a JOIN wgt b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(p.dot / (na.nm * nb.nm), 5) AS cos
FROM prs p
JOIN nrm na ON na.doc_id = p.doc_a
JOIN nrm nb ON nb.doc_id = p.doc_b
WHERE round(p.dot / (na.nm * nb.nm), 5) >= {index.PAIRS_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def doc_ngram_novelty(sf_dir: str):
    """Fraction of each doc's distinct bigram shingles first seen in
    the doc itself (min doc_id ordering) — the within-corpus novelty /
    staleness signal for streaming curation."""
    return index.ngram_novelty(_docs(sf_dir))


def _ngram_novelty_sql() -> str:
    return f"""
WITH {_shingle_ctes(2)}, firstseen AS (
  SELECT g, min(doc_id) AS first_doc FROM sh GROUP BY g
)
SELECT s.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             * 1.0 / count(*), 4) AS novelty
FROM sh s JOIN firstseen f USING (g)
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


def doc_postings(sf_dir: str):
    """Inverted-index postings: per term df, total tf, first-5 doc-id
    sample — vocabulary-keyed partials, bounded-adaptive merge."""
    return index.postings(_docs(sf_dir))


POSTINGS_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, t.w AS term FROM w, LATERAL unnest(ws) AS t(w)
)
SELECT term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS total_tf,
       array_to_string(
           list_sort(list(DISTINCT doc_id))[1:{index.POSTING_SAMPLE}],
           ',') AS sample_docs
FROM tok GROUP BY term
"""


def doc_decontam(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any word
    3-gram with the benchmark subset (doc_id % 97 == 0), with the
    distinct-overlap count.  Benchmark shingles broadcast once."""
    return index.decontaminate(_docs(sf_dir))


DECONTAM_SQL = f"""
WITH {_shingle_ctes(index.DECONTAM_K)},
bench AS (
  SELECT DISTINCT g FROM sh WHERE doc_id % {index.DECONTAM_MODULUS} = 0
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM sh s JOIN bench b USING (g)
WHERE s.doc_id % {index.DECONTAM_MODULUS} <> 0
GROUP BY s.doc_id
"""


def doc_chunk(sf_dir: str):
    """Overlapping fixed-width training windows (CHUNK_W tokens,
    CHUNK_S stride) per doc — the tokenize-and-chunk stage of an LLM
    training-data pipeline, as a stateless streaming map (one take +
    one binary_join per batch, no shuffle)."""
    return _docs(sf_dir).map_batches(analysis.chunk_rows,
                                     batch_format="pyarrow")


CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), c AS (
  SELECT doc_id,
         unnest(list_transform(
             range(CAST(ceil(len(toks) / {analysis.CHUNK_S}.0) AS BIGINT)),
             j -> struct_pack(
                 chunk_id := j,
                 n_tokens := least({analysis.CHUNK_W},
                                   len(toks) - j * {analysis.CHUNK_S}),
                 chunk := array_to_string(
                     toks[j * {analysis.CHUNK_S} + 1 :
                          j * {analysis.CHUNK_S} + {analysis.CHUNK_W}],
                     ' ')))) AS s
  FROM t
)
SELECT doc_id, s.chunk_id AS chunk_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens, s.chunk AS chunk
FROM c
"""


_SEG_SHIFT = 20  # packed order key: doc_id * 2^20 + seg_no


def doc_segment_dedup(sf_dir: str, bound: int = 2_000_000):
    """Corpus-level segment dedup with reassembly (the C4/RefinedWeb
    duplicate-span removal shape): every doc tiles into SEG_LEN-token
    segments, only the globally FIRST occurrence of each distinct
    segment (by (doc_id, seg_no)) survives, and each doc is rebuilt
    from its surviving segments in order.  Docs whose every segment
    appeared earlier vanish entirely.

    Two-level argmin: batches emit per-segment min packed order keys
    (combiner), merged by the bounded-adaptive min path.  The keep
    decision is a broadcast lookup while the winner set fits
    (``bound``); beyond it the segments hash-join the winner table on
    the segment text and reassembly moves into a distributed per-doc
    groupby — the only shape that scales to corpus-size segment
    cardinality.  Assumes doc_id < 2^43 (packed key fits int64)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min, map_pool)

    docs = _docs(sf_dir)

    def seg_min_partial(batch: pa.Table) -> pa.Table:
        seg = analysis.segment_rows(batch)
        packed = pc.add(
            pc.multiply(seg.column("doc_id"),
                        pa.scalar(1 << _SEG_SHIFT, pa.int64())),
            seg.column("seg_no"))
        t = pa.table({"seg": seg.column("seg"), "packed": packed})
        return t.group_by("seg").aggregate([("packed", "min")]) \
            .rename_columns(["seg", "packed"])

    winners = final_merge_min(
        docs.map_batches(seg_min_partial, batch_format="pyarrow"),
        ["seg"], ["packed"], bound=bound).materialize()
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_segments": pa.array([], pa.int64()),
        "n_kept": pa.array([], pa.int64()),
        "dedup_text": pa.array([], pa.string())}))
    n_winners = winners.count()
    if n_winners == 0:
        return empty

    if n_winners <= bound:
        wt = collect_table(winners)
        seg_np = np.array(wt.column("seg").to_pylist(), dtype=object)
        order = np.argsort(seg_np)
        state_ref = ray.put((seg_np[order],
                             wt.column("packed").to_numpy()[order]))

        class KeepStage:
            def __init__(self):
                self.segs, self.win = ray.get(state_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                n = len(batch)
                parent, seg_no, _, seg = analysis._token_windows(
                    batch, analysis.SEG_LEN, analysis.SEG_LEN)
                ids = batch.column("doc_id").to_numpy()
                packed = (ids[parent] << _SEG_SHIFT) + seg_no
                pos = np.searchsorted(
                    self.segs,
                    np.array(seg.to_pylist(), dtype=object))
                keep = packed == self.win[pos]
                counts = np.bincount(parent[keep], minlength=n)
                offsets = np.concatenate([[0], np.cumsum(counts)])
                joined = pc.binary_join(pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    seg.filter(pa.array(keep))), " ")
                out = pa.table({
                    "doc_id": batch.column("doc_id"),
                    "n_segments": pa.array(
                        np.bincount(parent, minlength=n), pa.int64()),
                    "n_kept": pa.array(counts, pa.int64()),
                    "dedup_text": joined})
                return out.filter(pc.greater(out.column("n_kept"), 0))

        return docs.map_batches(KeepStage, batch_format="pyarrow",
                                concurrency=(1, map_pool()))

    # corpus-scale winner set: distributed join + per-doc regroup
    from cheque_ocr_project_ray.relational.joins import hash_join

    def seg_with_meta(batch: pa.Table) -> pa.Table:
        n = len(batch)
        parent, seg_no, _, seg = analysis._token_windows(
            batch, analysis.SEG_LEN, analysis.SEG_LEN)
        ids = batch.column("doc_id").to_numpy()
        nseg = np.bincount(parent, minlength=n)
        return pa.table({
            "doc_id": pa.array(ids[parent], pa.int64()),
            "seg_no": pa.array(seg_no, pa.int64()),
            "n_segments": pa.array(nseg[parent], pa.int64()),
            "packed": pa.array((ids[parent] << _SEG_SHIFT) + seg_no,
                               pa.int64()),
            "seg": seg})

    segs = docs.map_batches(seg_with_meta, batch_format="pyarrow")
    joined = hash_join(
        segs, winners.map_batches(
            lambda t: t.rename_columns(["seg", "win"]),
            batch_format="pyarrow"), on="seg")
    kept = joined.map_batches(
        lambda t: t.filter(pc.equal(t.column("packed"),
                                    t.column("win"))),
        batch_format="pyarrow")

    def rebuild(g):
        g = g.sort_values("seg_no", kind="mergesort")
        import pandas as pd
        return pd.DataFrame({
            "doc_id": [g["doc_id"].iloc[0]],
            "n_segments": [np.int64(g["n_segments"].iloc[0])],
            "n_kept": [np.int64(len(g))],
            "dedup_text": [" ".join(g["seg"])]})

    return kept.groupby("doc_id").map_groups(rebuild,
                                             batch_format="pandas")


SEGMENT_DEDUP_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), seg AS (
  SELECT doc_id,
         unnest(list_transform(
             range(CAST(ceil(len(toks) / {analysis.SEG_LEN}.0) AS BIGINT)),
             j -> struct_pack(
                 seg_no := j,
                 seg := array_to_string(
                     toks[j * {analysis.SEG_LEN} + 1 :
                          (j + 1) * {analysis.SEG_LEN}], ' ')))) AS s
  FROM t
), f AS (
  SELECT doc_id, s.seg_no AS seg_no, s.seg AS seg FROM seg
), r AS (
  SELECT doc_id, seg_no, seg,
         row_number() OVER (PARTITION BY seg
                            ORDER BY doc_id, seg_no) AS rn
  FROM f
), k AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_no) AS dedup_text
  FROM r WHERE rn = 1 GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_segments FROM f GROUP BY doc_id
)
SELECT k.doc_id AS doc_id, n_segments, n_kept, dedup_text
FROM k JOIN tot ON k.doc_id = tot.doc_id
"""


def doc_unigram_logprob(sf_dir: str, np_: int = 0,
                        bound: int = 2_000_000):
    """Mean unigram log-likelihood per doc under the corpus's own
    unigram LM — the classic cheap quality/outlier signal (CCNet-style
    LM filtering, with the corpus itself as the model).  Pass 1
    reduces to the (bounded) vocabulary through the combiner; under
    ``bound`` the sorted vocab + log-probs broadcast once and pass 2
    is a stateless lookup + bincount mean.  Past it (the r5
    vocabulary-join fallback — a vocabulary beyond driver/actor
    memory) nothing broadcasts: the (tok, logp) table stays a
    Dataset, the docs explode to per-doc (doc_id, tok, tf) rows over
    the SAME tokenization, one token-keyed ``hash_join`` attaches the
    log-probs, and the per-doc mean reduces back through the
    doc-keyed merge — two honest shuffles, no driver table."""
    import numpy as np
    import pyarrow as pa
    import ray
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool,
                                             round_half_up)

    docs = _docs(sf_dir)
    counts = final_merge_sums(
        docs.map_batches(analysis.token_counts, batch_format="pyarrow"),
        ["tok"], ["n"], np_=np_, bound=bound).materialize()
    vocab_n = counts.count()
    if vocab_n == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "logprob": pa.array([], pa.float64())}))
    if vocab_n <= bound:
        ct = collect_table(counts)
        tok = np.array(ct.column("tok").to_pylist(), dtype=object)
        n = ct.column("n").to_numpy()
        order = np.argsort(tok)
        total = float(n.sum())
        state_ref = ray.put((tok[order], np.log(n[order] / total)))

        class Score:
            def __init__(self):
                self.vocab, self.logp = ray.get(state_ref)

            def __call__(self, batch):
                return analysis.unigram_logprob(batch, self.vocab,
                                                self.logp)

        return docs.map_batches(Score, batch_format="pyarrow",
                                concurrency=(1, map_pool()))
    # vocabulary-join fallback
    from cheque_ocr_project_ray.relational.joins import hash_join
    import pyarrow.compute as pc_
    total = float(counts.sum("n"))

    def with_logp(t: pa.Table) -> pa.Table:
        lp = np.log(t.column("n").to_numpy(
            zero_copy_only=False).astype(np.float64) / total)
        return pa.table({"tok": t.column("tok"),
                         "logp": pa.array(lp, pa.float64())})

    lm = counts.map_batches(with_logp, batch_format="pyarrow")
    pairs = docs.map_batches(analysis.doc_token_pairs,
                             batch_format="pyarrow")
    j = hash_join(pairs, lm, on="tok", num_partitions=np_ or None)

    def doc_partial(t: pa.Table) -> pa.Table:
        w = pc_.multiply(pc_.cast(t.column("tf"), pa.float64()),
                         t.column("logp"))
        g = pa.table({"doc_id": t.column("doc_id"), "wl": w,
                      "n_tokens": t.column("tf")}) \
            .group_by("doc_id").aggregate([("wl", "sum"),
                                           ("n_tokens", "sum")])
        return g.rename_columns(["doc_id", "wl", "n_tokens"])

    per_doc = final_merge_sums(
        j.map_batches(doc_partial, batch_format="pyarrow"),
        ["doc_id"], ["wl", "n_tokens"], np_=np_, bound=bound)

    def finish(t: pa.Table) -> pa.Table:
        wl = t.column("wl").to_numpy(zero_copy_only=False)
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc_.cast(t.column("n_tokens"), pa.int64()),
            "logprob": pa.array(round_half_up(wl / nt, 6),
                                pa.float64())})

    return per_doc.map_batches(finish, batch_format="pyarrow")


UNIGRAM_LOGPROB_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), c AS (
  SELECT tok, count(*) AS n FROM w GROUP BY tok
), tot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS total FROM c
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(n / total)), 6) AS logprob
FROM w JOIN c USING (tok), tot
GROUP BY doc_id
"""


def doc_quality_score(sf_dir: str):
    """Logistic quality-classifier scoring per doc — the model-scoring
    stage shape (stateless vectorized map; a trained model would slot
    into the same stage)."""
    return _docs(sf_dir).map_batches(analysis.quality_score,
                                     batch_format="pyarrow")


QUALITY_SCORE_SQL = f"""
WITH q AS ({QUALITY_SQL}),
z AS (
  SELECT doc_id,
         {analysis.QUALITY_W[0]} + {analysis.QUALITY_W[1]} * stop_ratio
         + {analysis.QUALITY_W[2]} * ttr
         + {analysis.QUALITY_W[3]} * ln(n_tokens) AS z
  FROM q
)
SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
       CAST(round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS BIGINT) AS keep
FROM z
"""


def _dedup_canonical_sql() -> str:
    """Independent SQL re-derivation of :func:`dedup_canonical`: the
    recursive-CTE closure (as ``dedup_components``) joined to the
    quality-score subquery, with the SAME packed-int argmin so the
    tie-break and 6dp score survive the round trip bit-for-bit."""
    return f"""
WITH RECURSIVE {_shingle_ctes(2)}, sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), prs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE i * 1.0 / (na.n + nb.n - i) >= 0.5
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
), reach AS (
  SELECT DISTINCT a AS doc, a AS lab FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON e.b = r.doc
), comp AS (
  SELECT doc AS doc_id, min(lab) AS rep FROM reach GROUP BY doc
), qs AS ({QUALITY_SCORE_SQL}
), j AS (
  SELECT c.rep,
         (1000000 - CAST(round(q.score * 1000000, 0) AS BIGINT))
             * 4294967296 + c.doc_id AS packed
  FROM comp c JOIN qs q ON q.doc_id = c.doc_id
), m AS (
  SELECT rep, min(packed) AS packed, count(*) AS n_members
  FROM j GROUP BY rep
)
SELECT rep, packed % 4294967296 AS keep_doc_id, n_members,
       CAST(1000000 - packed // 4294967296 AS DOUBLE) / 1000000.0
           AS best_score
FROM m
ORDER BY rep
"""


def doc_char_entropy(sf_dir: str):
    """Per-doc character Shannon entropy — the gibberish /
    compressibility filter signal (stateless vectorized map; see
    :func:`analysis.char_entropy` for the single-decode kernel)."""
    return _docs(sf_dir).map_batches(analysis.char_entropy,
                                     batch_format="pyarrow") \
        .sort("doc_id")


CHAR_ENTROPY_SQL = """
WITH cnt AS (
  SELECT doc_id, c, count(*) AS k FROM (
    SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
  GROUP BY doc_id, c
), h AS (
  SELECT doc_id, sum(k * log2(k)) AS s, sum(k) AS L
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars,
       round(CASE WHEN h.L IS NULL OR h.L = 0 THEN 0.0
                  ELSE log2(h.L) - h.s / h.L END, 6) AS entropy
FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def doc_length_quantiles(sf_dir: str, np_: int = 0):
    """Per-language document-length quantiles (p25/p50/p75/p95) for
    corpus curation dashboards, computed EXACTLY — the discrete
    "element at 1-based position floor((n−1)·q)+1 of the sorted
    multiset" definition, spelled out identically in the SQL twin so
    neither engine's built-in percentile interpolation is in play.
    The corpus is never sorted: lengths are small integers, so
    per-batch (lang, n_chars) counts reduce through the
    bounded-adaptive merge and the quantile pick is one
    cumsum+searchsorted per language over the count grid (class b:
    langs × distinct lengths).  All-int output, bit-deterministic."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    ds = ray.data.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                               columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch.column("lang"),
                      "L": batch.column("n_chars"),
                      "k": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by(["lang", "L"]).aggregate([("k", "sum")]) \
            .rename_columns(["lang", "L", "k"])

    grid = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "L"], ["k"], np_=np_).materialize())
    if grid is None or grid.num_rows == 0:
        return pd.DataFrame({
            "lang": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "p25": pd.Series([], dtype="int64"),
            "p50": pd.Series([], dtype="int64"),
            "p75": pd.Series([], dtype="int64"),
            "p95": pd.Series([], dtype="int64")})
    df = grid.to_pandas().sort_values(["lang", "L"])
    rows = []
    for lang, g in df.groupby("lang", sort=True):
        k = g["k"].to_numpy(np.int64)
        lv = g["L"].to_numpy(np.int64)
        cum = np.cumsum(k)
        n = int(cum[-1])

        def pick(p: int) -> int:
            pos = (n - 1) * p // 100 + 1
            return int(lv[np.searchsorted(cum, pos)])

        rows.append({"lang": lang, "n_docs": n, "p25": pick(25),
                     "p50": pick(50), "p75": pick(75),
                     "p95": pick(95)})
    out = pd.DataFrame(rows).reset_index(drop=True)
    for c in ("n_docs", "p25", "p50", "p75", "p95"):
        out[c] = out[c].astype("int64")
    return out


DOC_LENGTH_QUANTILES_SQL = """
WITH c AS (
  SELECT lang, n_chars, count(*) AS k FROM documents GROUP BY 1, 2
), w AS (
  SELECT lang, n_chars, k,
         sum(k) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
         sum(k) OVER (PARTITION BY lang) AS n
  FROM c
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN cum >= ((n - 1) * 25) // 100 + 1
                     THEN n_chars END) AS BIGINT) AS p25,
       CAST(min(CASE WHEN cum >= ((n - 1) * 50) // 100 + 1
                     THEN n_chars END) AS BIGINT) AS p50,
       CAST(min(CASE WHEN cum >= ((n - 1) * 75) // 100 + 1
                     THEN n_chars END) AS BIGINT) AS p75,
       CAST(min(CASE WHEN cum >= ((n - 1) * 95) // 100 + 1
                     THEN n_chars END) AS BIGINT) AS p95
FROM w GROUP BY lang ORDER BY lang
"""


def doc_readability(sf_dir: str):
    """Per-source Flesch-reading-ease profile — the audience-level /
    formality signal quality pipelines mix with Gopher rules when
    balancing a pretraining corpus.  Three RE2 counts per doc, all
    vectorized (``pc.count_substring_regex``): letter runs (words),
    terminal-punctuation runs (sentences, floored at 1), vowel-group
    runs (the classic syllable proxy).  Per-source partial sums fold
    on the driver (sources are a bounded domain, class b); the per-doc
    score expression is IDENTICAL on both engines, so 4dp rounding
    absorbs only float-sum order noise."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import collect_table, round_half_up

    ds = ray.data.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                               columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        w = pc.cast(pc.count_substring_regex(txt, pattern="[A-Za-z]+"),
                    pa.int64())
        s = pc.max_element_wise(
            pc.cast(pc.count_substring_regex(txt, pattern="[.!?]+"),
                    pa.int64()),
            pa.scalar(1, pa.int64()))
        syl = pc.cast(
            pc.count_substring_regex(txt, pattern="[aeiouyAEIOUY]+"),
            pa.int64())
        t = pa.table({"source": batch.column("source"),
                      "w": w, "s": s, "syl": syl}) \
            .filter(pc.greater(w, 0))
        wn = t.column("w").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sn = t.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        yn = t.column("syl").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        wps = wn / sn
        spw = yn / wn
        score = 206.835 - 1.015 * wps - 84.6 * spw
        out = pa.table({
            "source": t.column("source"),
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "wps": pa.array(wps, pa.float64()),
            "spw": pa.array(spw, pa.float64()),
            "score": pa.array(score, pa.float64())})
        return out.group_by("source").aggregate(
            [("n", "sum"), ("wps", "sum"), ("spw", "sum"),
             ("score", "sum")]) \
            .rename_columns(["source", "n", "wps", "spw", "score"])

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow").materialize())
    if parts is None:
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "words_per_sentence": pd.Series([], dtype="float64"),
            "syllables_per_word": pd.Series([], dtype="float64"),
            "flesch": pd.Series([], dtype="float64")})
    g = parts.group_by("source").aggregate(
        [("n", "sum"), ("wps", "sum"), ("spw", "sum"),
         ("score", "sum")])
    df = g.to_pandas().sort_values("source").reset_index(drop=True)
    n = df["n_sum"].to_numpy(np.float64)
    return pd.DataFrame({
        "source": df["source"],
        "n_docs": df["n_sum"].astype("int64"),
        "words_per_sentence": round_half_up(
            df["wps_sum"].to_numpy(np.float64) / n, 4),
        "syllables_per_word": round_half_up(
            df["spw_sum"].to_numpy(np.float64) / n, 4),
        "flesch": round_half_up(
            df["score_sum"].to_numpy(np.float64) / n, 4)})


DOC_READABILITY_SQL = """
WITH d AS (
  SELECT source,
         len(regexp_extract_all(text, '[A-Za-z]+')) AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
         len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS syl
  FROM documents
), f AS (
  SELECT source, w::DOUBLE / s AS wps, syl::DOUBLE / w AS spw,
         206.835 - 1.015 * (w::DOUBLE / s)
                 - 84.6 * (syl::DOUBLE / w) AS score
  FROM d WHERE w > 0
)
SELECT source, count(*) AS n_docs,
       round(sum(wps) / count(*), 4) AS words_per_sentence,
       round(sum(spw) / count(*), 4) AS syllables_per_word,
       round(sum(score) / count(*), 4) AS flesch
FROM f GROUP BY source ORDER BY source
"""


def corpus_mix_sample(sf_dir: str):
    """Deterministic per-source mixture sampling (data mixing): keep
    each doc with a per-source quota decided by a stable doc_id hash —
    re-runs, resumes, and incremental additions sample identically."""
    return ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["doc_id", "source"]) \
        .map_batches(analysis.mix_sample, batch_format="pyarrow")


MIX_SAMPLE_SQL = f"""
WITH b AS (
  SELECT doc_id, source,
         CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS BIGINT)
             AS bucket,
         CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
              THEN {analysis.MIX_QUOTA_EVEN}
              ELSE {analysis.MIX_QUOTA_ODD} END AS quota
  FROM documents
)
SELECT doc_id, source, bucket FROM b WHERE bucket < quota
"""


def _jaccard_pairs_sql(k: int, threshold: float) -> str:
    """Exact all-pairs shingle-Jaccard in SQL — the oracle for the
    MinHash-LSH dedup output.

    The engine emits (doc_a, doc_b, exact-Jaccard) for every pair its
    LSH candidates produce; this SQL computes the same from first
    principles with NO LSH: every pair of docs sharing a word k-gram,
    kept when Jaccard >= threshold.  Equality therefore asserts BOTH
    no-false-positives (the engine verifies candidates exactly) AND
    100% recall of the banding on this corpus — verified to hold on
    the driver's deterministic sf0.01 table (seeded hashes, fixed
    data; checked by tools/check_oracle.py).  Two deliberate deltas
    from the engine's internals, both value-neutral here: shingles are
    hashed strings in the engine (crc32) but raw strings in SQL (same
    SETS absent collisions — none on this corpus), and docs with
    zero tokens never pair (none exist).
    """
    return f"""
WITH {_shingle_ctes(k)}, sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (na.n + nb.n - i), 4) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE i * 1.0 / (na.n + nb.n - i) >= {threshold}
"""


def _simhash_sql() -> str:
    """The 64-bit SimHash signature re-derived in pure SQL.

    The engine's word hash is md5 bytes 8..16 little-endian — exactly
    DuckDB's ``md5_number_lower`` (dedup._stable64) — so the whole
    signature is 64 per-bit majority aggregates over the unnested word
    multiset (occurrences count, like the engine's word list)."""
    bit_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(64))
    return f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, md5_number_lower(t.w) AS h
  FROM words, LATERAL unnest(ws) AS t(w)
), usig AS (
  SELECT doc_id, {bit_terms} AS u
  FROM tok GROUP BY doc_id
), sig AS (
  SELECT doc_id,
         CAST(CASE WHEN u >= {1 << 63} THEN u - {1 << 64} ELSE u END
              AS BIGINT) AS simhash
  FROM usig
)
"""


def doc_simhash_sql() -> str:
    # zero-token docs hash to 0 in the engine; LEFT JOIN keeps them
    return _simhash_sql() + """
SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sig s USING (doc_id)
"""


def dedup_simhash_sql(max_hamming: int = 3) -> str:
    """All pairs within the Hamming bound, from the SQL-derived
    signatures.  The engine's 4x16-bit banding is provably complete
    for hamming <= 3 (pigeonhole) and verifies exactly in-group, so
    engine == this brute-force SQL whenever no bucket exceeds the
    degenerate-bucket cap (none does on the driver corpus).  Pairs
    come from the COALESCED signature set (zero-token docs hash to 0
    in the engine and pair with each other at hamming 0)."""
    return _simhash_sql() + f"""
, sig_all AS (
  SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig_all a JOIN sig_all b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def corpus_curation(sf_dir: str):
    """Composite training-data curation pipeline: language-ID +
    quality scoring → keep English docs with sane stopword/TTR ratios
    → exact-dedup keep-min-doc_id → surviving doc ids.

    One streaming pass computes all per-doc signals (no separate
    scans); the only shuffle is the dedup groupby over (hash, doc_id)
    pairs."""
    from ray.data.aggregate import Min

    def signals(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        sig = analysis.lang_quality(batch)  # ONE tokenization pass
        keep = pc.and_(
            pc.and_(pc.equal(sig.column("pred_lang"), "en"),
                    pc.greater_equal(sig.column("stop_ratio"), 0.05)),
            pc.greater_equal(sig.column("ttr"), 0.3))
        kept = batch.filter(keep)
        return pa.table({
            "text_hash": pa.array(
                analysis.text_md5(kept.column("text").to_pylist()),
                pa.string()),
            "doc_id": kept.column("doc_id"),
        })

    hashed = _docs(sf_dir).map_batches(signals, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id")).drop_columns(["text_hash"])


CURATION_SQL = """
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), sig AS (
  SELECT doc_id, text,
         len(list_filter(toks, x -> x IN ('the', 'a', 'of'))) AS en,
         len(list_filter(toks, x -> x IN ('el', 'la', 'los'))) AS es,
         len(list_filter(toks, x -> x IN ('le', 'les', 'des'))) AS fr,
         round(len(list_filter(toks, x -> x IN ('a', 'the'))) * 1.0
               / len(toks), 4) AS stop_ratio,
         round(len(list_distinct(toks)) * 1.0 / len(toks), 4) AS ttr
  FROM t
), kept AS (
  SELECT doc_id, text FROM sig
  WHERE NOT (en = 0 AND es = 0 AND fr = 0)
    AND en >= es AND en >= fr
    AND stop_ratio >= 0.05 AND ttr >= 0.3
)
SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
"""


def corpus_pipeline(sf_dir: str):
    """The end-to-end training-data shape, composed from the family:
    curate (lang+quality filters) → exact-dedup keep-min-doc_id →
    hash-split assignment → BPE-token budget per split.

    Scale shape: one signals pass over the corpus (one tokenization),
    one (hash, doc_id) shuffle for the dedup, then a hash JOIN of the
    surviving ids against the per-doc (split, tokens) pass — the
    survivor set is corpus-sized at 100 TB, so it is joined, never
    broadcast.  Final rollup is 3 groups."""
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from cheque_ocr_project_ray.relational.joins import hash_join

    kept = corpus_curation(sf_dir)  # Dataset[doc_id] of survivors

    def split_tokens(batch: pa.Table) -> pa.Table:
        s = analysis.train_split(batch)
        b = analysis.bpe_token_count(batch)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "split": s.column("split"),
            "n_bpe_tokens": b.column("n_bpe_tokens"),
        })

    per_doc = _docs(sf_dir).map_batches(split_tokens,
                                        batch_format="pyarrow")
    joined = hash_join(kept, per_doc, on="doc_id")
    return joined.groupby("split", num_partitions=1).aggregate(
        Count(alias_name="n_docs"),
        Sum("n_bpe_tokens", alias_name="total_tokens"))


CORPUS_PIPELINE_SQL = f"""
WITH kept AS ({CURATION_SQL}),
s AS (
  SELECT doc_id,
         CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90
              THEN 'train'
              WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 95
              THEN 'val' ELSE 'test' END AS split,
         len(regexp_extract_all(text,
             '{analysis.BPE_PATTERN.replace("'", "''")}')) AS toks
  FROM documents
)
SELECT split, count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_tokens
FROM kept JOIN s USING (doc_id)
GROUP BY split
"""


KEYWORD_TERMS = ("hash", "join", "merge")


def doc_keyword_search(sf_dir: str):
    """Boolean AND keyword search over the corpus: docs containing
    EVERY query term, with the total hit count — the retrieval
    primitive the inverted index (doc_postings) serves.  Entirely
    row-local (one is_in kernel + bitmask per batch), so it streams
    with the scan; no shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    terms = pa.array(list(KEYWORD_TERMS))
    full_mask = (1 << len(KEYWORD_TERMS)) - 1

    def search(batch: pa.Table) -> pa.Table:
        toks = analysis._token_lists(batch.column("text"))
        flat = pc.list_flatten(toks).combine_chunks()
        n = batch.num_rows
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n), lens)
        idx = pc.index_in(flat, value_set=terms)
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        ti = pc.fill_null(idx, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hits = np.bincount(parent[valid], minlength=n)
        bits = np.zeros(n, np.int64)
        np.bitwise_or.at(bits, parent[valid],
                         np.int64(1) << ti[valid])
        keep = bits == full_mask
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "total_hits": pa.array(hits[keep], pa.int64())})

    return _docs(sf_dir).map_batches(search, batch_format="pyarrow")


KEYWORD_SEARCH_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, t.w AS term FROM w, LATERAL unnest(ws) AS t(w)
)
SELECT doc_id, count(*) AS total_hits
FROM tok
WHERE term IN ({", ".join(f"'{t}'" for t in KEYWORD_TERMS)})
GROUP BY doc_id
HAVING count(DISTINCT term) = {len(KEYWORD_TERMS)}
"""


def source_token_budget(sf_dir: str):
    """Per-source corpus budget: docs, chars, BPE tokens, and the
    chars-per-token compression ratio — the table a training-mix
    planner reads.  One combiner pass (group_by source per batch),
    bounded merge."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import (final_merge_sums,
                                             round_half_up,
                                             strip_schema_metadata)

    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["source", "text"]) \
        .map_batches(strip_schema_metadata, batch_format="pyarrow",
                     zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        b = analysis.bpe_token_count(
            batch.append_column("doc_id",
                                pa.array(np.zeros(batch.num_rows,
                                                  np.int64))))
        t = pa.table({
            "source": batch.column("source"),
            "n_docs": pa.array(np.ones(batch.num_rows, np.int64)),
            "total_chars": pc.cast(pc.utf8_length(batch.column("text")),
                                   pa.int64()),
            "total_bpe_tokens": b.column("n_bpe_tokens")})
        g = t.group_by("source").aggregate(
            [("n_docs", "sum"), ("total_chars", "sum"),
             ("total_bpe_tokens", "sum")])
        return g.rename_columns(
            ["source", "n_docs", "total_chars", "total_bpe_tokens"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "total_chars", "total_bpe_tokens"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["chars_per_token"] = round_half_up(
            b["total_chars"].astype(np.float64) / b["total_bpe_tokens"], 4)
        return b

    return agg.map_batches(finish, batch_format="pandas")


SOURCE_BUDGET_SQL = (
    "SELECT source, count(*) AS n_docs, "
    "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
    "CAST(sum(len(regexp_extract_all(text, '"
    + analysis.BPE_PATTERN.replace("'", "''")
    + "'))) AS BIGINT) AS total_bpe_tokens, "
    "round(CAST(sum(length(text)) AS DOUBLE) "
    "      / sum(len(regexp_extract_all(text, '"
    + analysis.BPE_PATTERN.replace("'", "''")
    + "'))), 4) AS chars_per_token "
    "FROM documents GROUP BY source"
)


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def doc_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval for the fixed keyword set — the scoring
    rung above boolean search (doc_keyword_search) on the same
    tokenizer.  Pass 1 reduces to per-term document frequencies and
    the mean doc length (combiner partials, bounded merge); the tiny
    (df, idf, avgdl) state broadcasts; pass 2 scores per batch
    (one is_in + bincounts), keeps a local top-k, and a tiny global
    sort finishes.  Every float op mirrors the SQL expression order;
    scores round to 6dp with doc_id tie-breaks."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool)

    docs = _docs(sf_dir)
    terms = list(KEYWORD_TERMS)

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = analysis._token_lists(batch.column("text"))
        flat = pc.list_flatten(toks).combine_chunks()
        n = batch.num_rows
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n), lens)
        rows = [("\x00total", int(lens.sum())), ("\x00docs", n)]
        idx = pc.index_in(flat, value_set=pa.array(terms))
        valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        ti = pc.fill_null(idx, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        for t_i, term in enumerate(terms):
            hits = np.bincount(parent[valid & (ti == t_i)], minlength=n)
            rows.append((term, int(np.count_nonzero(hits))))
        return pa.table({"key": pa.array([r[0] for r in rows]),
                         "n": pa.array([r[1] for r in rows],
                                       pa.int64())})

    st = collect_table(final_merge_sums(
        docs.map_batches(stats_partial, batch_format="pyarrow"),
        ["key"], ["n"]).materialize())
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if st is None:
        import ray.data as _rd
        return _rd.from_arrow(empty)
    stats = dict(zip(st.column("key").to_pylist(),
                     st.column("n").to_pylist()))
    n_docs = float(stats["\x00docs"])
    avgdl = stats["\x00total"] / n_docs
    # BM25 idf with the +1 floor (Robertson-Sparck-Jones, as in Lucene)
    idf = np.array([np.log(1.0 + (n_docs - stats.get(t, 0) + 0.5)
                           / (stats.get(t, 0) + 0.5))
                    for t in terms])
    state_ref = ray.put((np.array(terms, dtype=object), idf, avgdl))

    class Score:
        def __init__(self):
            self.terms, self.idf, self.avgdl = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = analysis._token_lists(batch.column("text"))
            flat = pc.list_flatten(toks).combine_chunks()
            n = batch.num_rows
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False).astype(np.int64)
            parent = np.repeat(np.arange(n), lens)
            idx = pc.index_in(flat, value_set=pa.array(list(self.terms)))
            valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            ti = pc.fill_null(idx, -1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            score = np.zeros(n, np.float64)
            dl = lens.astype(np.float64)
            norm = BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / self.avgdl))
            for t_i in range(len(self.terms)):
                tf = np.bincount(parent[valid & (ti == t_i)],
                                 minlength=n).astype(np.float64)
                score += self.idf[t_i] * (tf * (BM25_K1 + 1.0)) \
                    / (tf + norm)
            from cheque_ocr_project_ray.util import round_half_up
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            keep = score > 0
            t = pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                          "score": pa.array(round_half_up(score[keep], 6),
                                            pa.float64())})
            k = pc.select_k_unstable(
                t, BM25_TOPK, [("score", "descending"),
                               ("doc_id", "ascending")])
            return t.take(k)

    return docs.map_batches(Score, batch_format="pyarrow",
                            concurrency=(1, map_pool())) \
        .sort(["score", "doc_id"], descending=[True, False]) \
        .limit(BM25_TOPK)


BM25_TOPK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws,
         len(regexp_split_to_array(trim(text), '\\s+')) AS dl
  FROM documents
), tok AS (
  SELECT doc_id, dl, tt.w AS term FROM t, LATERAL unnest(ws) AS tt(w)
  WHERE tt.w IN ({", ".join(f"'{x}'" for x in KEYWORD_TERMS)})
), tf AS (
  SELECT doc_id, any_value(dl) AS dl, term, count(*) AS tf
  FROM tok GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
         (SELECT sum(len(regexp_split_to_array(trim(text), '\\s+')))
          / CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * ({BM25_K1}::DOUBLE + 1.0))
             / (tf.tf + {BM25_K1}::DOUBLE * (1.0 - {BM25_B}::DOUBLE
                + {BM25_B}::DOUBLE * (tf.dl / stats.avgdl)))) AS score
  FROM tf JOIN df USING (term), stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT {BM25_TOPK}
"""


CODE_SYMBOLS = ["{", "}", "[", "]", "(", ")", ";", "=", "<", ">"]
CODE_RATIO_TAU = 0.02


def doc_code_score(sf_dir: str):
    """Code-likeness profiling per source — the curation signal that
    separates prose from code/markup before LM training (C4/Gopher
    drop or route code-heavy docs).  Per-doc symbol density
    ``round(symbols/chars, 6) >= tau`` flags code-like docs; the
    per-source rollup reduces through exact-int combiner partials
    (sym and char totals), so the density output is a single float
    division — bit-equal to the SQL twin.

    Vectorized: ten ``pc.count_substring`` passes per batch (one per
    symbol), no Python row loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import (final_merge_sums,
                                             round_half_up)

    docs = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        chars = pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.int64)
        syms = np.zeros(batch.num_rows, np.int64)
        for s in CODE_SYMBOLS:
            syms += pc.count_substring(text, s).to_numpy(
                zero_copy_only=False)
        ok = chars > 0
        ratio = round_half_up(
            syms[ok].astype(np.float64) / chars[ok], 6)
        t = pa.table({
            "source": pc.filter(batch.column("source"),
                                pa.array(ok)),
            "n_docs": pa.array(np.ones(int(ok.sum()), np.int64)),
            "n_code_like": pa.array(
                (ratio >= CODE_RATIO_TAU).astype(np.int64)),
            "syms": pa.array(syms[ok]),
            "chars": pa.array(chars[ok])})
        g = t.group_by("source").aggregate(
            [("n_docs", "sum"), ("n_code_like", "sum"),
             ("syms", "sum"), ("chars", "sum")])
        return g.rename_columns(
            ["source", "n_docs", "n_code_like", "syms", "chars"])

    agg = final_merge_sums(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "n_code_like", "syms", "chars"])

    def finish(b: pa.Table) -> pa.Table:
        dens = round_half_up(
            pc.divide(pc.multiply(pc.cast(b.column("syms"),
                                          pa.float64()),
                                  pa.scalar(1000.0)),
                      pc.cast(b.column("chars"), pa.float64()))
            .to_numpy(zero_copy_only=False), 4)
        return pa.table({"source": b.column("source"),
                         "n_docs": b.column("n_docs"),
                         "n_code_like": b.column("n_code_like"),
                         "sym_per_kchar": pa.array(dens, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort("source")


_CODE_SYM_SQL = " + ".join(
    f"(length(text) - length(replace(text, '{s}', '')))"
    for s in CODE_SYMBOLS)

CODE_SCORE_SQL = f"""
WITH d AS (
  SELECT source, length(text) AS chars,
         {_CODE_SYM_SQL} AS syms
  FROM documents
  WHERE length(text) > 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN round(CAST(syms AS DOUBLE) / chars, 6)
                          >= {CODE_RATIO_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_code_like,
       round((CAST(sum(syms) AS DOUBLE) * 1000.0)
             / CAST(sum(chars) AS DOUBLE), 4) AS sym_per_kchar
FROM d
GROUP BY source
ORDER BY source
"""


HYBRID_K = 10
HYBRID_W_LEX = 0.5
HYBRID_W_VEC = 0.5


def doc_hybrid_search(sf_dir: str):
    """Two-stage hybrid retrieval — the standard RAG-corpus stack:
    the distributed BM25 scorer (stage 1, ``doc_bm25_topk``) produces
    a BOUNDED lexical candidate list, which is re-ranked by embedding
    cosine against the corpus probe vector (``vec_id = 0`` — the
    ``ann_cosine_topk`` convention; ``vec_id`` is 1:1 with ``doc_id``).

    Scale shape: stage 1 streams the whole corpus through combiner
    partials + per-batch top-k (no full sort); stage 2 touches exactly
    the ≤``BM25_TOPK`` candidate embedding rows via a predicate-
    pushdown read — never an embedding scan.  Both scores are rounded
    before the (0.5, 0.5) blend so the float ops mirror the SQL twin
    exactly."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as _pq

    from cheque_ocr_project_ray.util import round_half_up

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "bm25": pd.Series([], dtype="float64"),
                          "cos": pd.Series([], dtype="float64"),
                          "hybrid": pd.Series([], dtype="float64")})
    cand = doc_bm25_topk(sf_dir).to_pandas()   # bounded: ≤ BM25_TOPK rows
    if cand.empty:
        return empty
    ids = [int(x) for x in cand["doc_id"]]
    emb_path = str(Path(sf_dir) / "embeddings.parquet")
    t = _pq.read_table(emb_path, columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in", ids)])
    if t.num_rows == 0:
        return empty
    qt = _pq.read_table(emb_path, columns=["embedding"],
                        filters=[("vec_id", "=", 0)])
    q = np.asarray(qt["embedding"].to_pylist()[0], dtype=np.float64)
    q = q / np.linalg.norm(q)
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    cos = round_half_up((m @ q) / np.where(norms == 0, 1, norms), 5)
    rerank = pd.DataFrame({
        "doc_id": t["vec_id"].to_numpy(zero_copy_only=False)
        .astype("int64"),
        "cos": cos})
    out = cand.merge(rerank, on="doc_id", how="inner") \
        .rename(columns={"score": "bm25"})
    out["hybrid"] = round_half_up(
        out["bm25"].to_numpy() * HYBRID_W_LEX
        + out["cos"].to_numpy() * HYBRID_W_VEC, 6)
    out = out.sort_values(["hybrid", "doc_id"],
                          ascending=[False, True]).head(HYBRID_K)
    return out[["doc_id", "bm25", "cos", "hybrid"]] \
        .reset_index(drop=True)


# The scoring CTEs mirror BM25_TOPK_SQL exactly (same tokenizer, idf,
# norm and 6dp rounding); the rerank joins the bounded candidate list
# to embeddings and blends the pre-rounded scores.
HYBRID_SEARCH_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'),
                     x -> x <> '') AS ws,
         len(regexp_split_to_array(trim(text), '\\s+')) AS dl
  FROM documents
), tok AS (
  SELECT doc_id, dl, tt.w AS term FROM t, LATERAL unnest(ws) AS tt(w)
  WHERE tt.w IN ({", ".join(f"'{x}'" for x in KEYWORD_TERMS)})
), tf AS (
  SELECT doc_id, any_value(dl) AS dl, term, count(*) AS tf
  FROM tok GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
         (SELECT sum(len(regexp_split_to_array(trim(text), '\\s+')))
          / CAST(count(*) AS DOUBLE) FROM documents) AS avgdl
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         sum(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * ({BM25_K1}::DOUBLE + 1.0))
             / (tf.tf + {BM25_K1}::DOUBLE * (1.0 - {BM25_B}::DOUBLE
                + {BM25_B}::DOUBLE * (tf.dl / stats.avgdl)))) AS score
  FROM tf JOIN df USING (term), stats
  GROUP BY tf.doc_id
), cand AS (
  SELECT doc_id, round(score, 6) AS bm25
  FROM scored
  ORDER BY round(score, 6) DESC, doc_id
  LIMIT {BM25_TOPK}
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
), rr AS (
  SELECT c.doc_id, c.bm25,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv),
               5) AS cos
  FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
)
SELECT doc_id, bm25, cos,
       round(bm25 * {HYBRID_W_LEX}::DOUBLE
             + cos * {HYBRID_W_VEC}::DOUBLE, 6) AS hybrid
FROM rr
ORDER BY hybrid DESC, doc_id
LIMIT {HYBRID_K}
"""


def doc_bigram_logprob(sf_dir: str, np_: int = 0,
                       bound: int = 2_000_000):
    """Mean add-one-smoothed BIGRAM log-likelihood per doc under the
    corpus's own bigram LM — the next rung above unigram LM filtering
    (sequence-aware perplexity, still trained on the corpus itself).
    Pass 1 reduces to the bigram+unigram vocabularies through the
    combiner; under ``bound`` the per-bigram smoothed scores broadcast
    once and pass 2 is a stateless lookup + bincount mean.  Past it
    (the r5 bigram-LM join fallback) nothing broadcasts: c1 attaches
    to the distributed bigram table via one token-keyed ``hash_join``
    (w1 split per batch), the smoothed score is row-local given the
    scalar V, docs explode to per-doc (doc_id, bigram, tf) rows over
    the SAME bigram formation, a bigram-keyed join attaches the
    scores, and the per-doc mean reduces through the doc-keyed merge
    — three honest shuffles, no LM on the driver."""
    import numpy as np
    import pyarrow as pa
    import ray
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool,
                                             round_half_up)

    docs = _docs(sf_dir)
    uni_ds = final_merge_sums(
        docs.map_batches(analysis.token_counts, batch_format="pyarrow"),
        ["tok"], ["n"], np_=np_, bound=bound).materialize()
    big_ds = final_merge_sums(
        docs.map_batches(analysis.bigram_counts, batch_format="pyarrow"),
        ["bigram"], ["n"], np_=np_, bound=bound).materialize()
    un, bn = uni_ds.count(), big_ds.count()
    if un == 0 or bn == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "logprob": pa.array([], pa.float64())}))
    vsize = float(un)
    if un <= bound and bn <= bound:
        uni = collect_table(uni_ds)
        big = collect_table(big_ds)
        utok = np.array(uni.column("tok").to_pylist(), dtype=object)
        ucnt = uni.column("n").to_numpy()
        uorder = np.argsort(utok)
        utok, ucnt = utok[uorder], ucnt[uorder]
        bg = np.array(big.column("bigram").to_pylist(), dtype=object)
        bcnt = big.column("n").to_numpy()
        border = np.argsort(bg)
        bg, bcnt = bg[border], bcnt[border]
        w1 = np.array([b.split(" ", 1)[0] for b in bg], dtype=object)
        c1 = ucnt[np.searchsorted(utok, w1)]
        # ln((c2 + 1) / (c1 + V)) — op order mirrors the SQL expression
        score = np.log((bcnt + 1) / (c1 + vsize))
        state_ref = ray.put((bg, score))

        class Score:
            def __init__(self):
                self.bvocab, self.bscore = ray.get(state_ref)

            def __call__(self, batch):
                return analysis.bigram_logprob(batch, self.bvocab,
                                               self.bscore)

        return docs.map_batches(Score, batch_format="pyarrow",
                                concurrency=(1, map_pool()))
    # bigram-LM join fallback
    from cheque_ocr_project_ray.relational.joins import hash_join
    import pyarrow.compute as pc_

    def with_w1(t: pa.Table) -> pa.Table:
        w1 = pc_.list_element(
            pc_.split_pattern(t.column("bigram"), " ", max_splits=1), 0)
        return pa.table({"bigram": t.column("bigram"),
                         "c2": pc_.cast(t.column("n"), pa.int64()),
                         "tok": w1})

    def as_c1(t: pa.Table) -> pa.Table:
        return pa.table({"tok": t.column("tok"),
                         "c1": pc_.cast(t.column("n"), pa.int64())})

    jb = hash_join(big_ds.map_batches(with_w1, batch_format="pyarrow"),
                   uni_ds.map_batches(as_c1, batch_format="pyarrow"),
                   on="tok", num_partitions=np_ or None)

    def with_score(t: pa.Table) -> pa.Table:
        c2 = t.column("c2").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "bigram": t.column("bigram"),
            "score": pa.array(np.log((c2 + 1) / (c1 + vsize)),
                              pa.float64())})

    lm = jb.map_batches(with_score, batch_format="pyarrow")
    pairs = docs.map_batches(analysis.doc_bigram_pairs,
                             batch_format="pyarrow")
    j = hash_join(pairs, lm, on="bigram", num_partitions=np_ or None)

    def doc_partial(t: pa.Table) -> pa.Table:
        w = pc_.multiply(pc_.cast(t.column("tf"), pa.float64()),
                         t.column("score"))
        g = pa.table({"doc_id": t.column("doc_id"), "wl": w,
                      "n_bigrams": t.column("tf")}) \
            .group_by("doc_id").aggregate([("wl", "sum"),
                                           ("n_bigrams", "sum")])
        return g.rename_columns(["doc_id", "wl", "n_bigrams"])

    per_doc = final_merge_sums(
        j.map_batches(doc_partial, batch_format="pyarrow"),
        ["doc_id"], ["wl", "n_bigrams"], np_=np_, bound=bound)

    def finish(t: pa.Table) -> pa.Table:
        wl = t.column("wl").to_numpy(zero_copy_only=False)
        nb = t.column("n_bigrams").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bigrams": pc_.cast(t.column("n_bigrams"), pa.int64()),
            "logprob": pa.array(round_half_up(wl / nb, 6),
                                pa.float64())})

    return per_doc.map_batches(finish, batch_format="pyarrow")


BIGRAM_LOGPROB_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), uc AS (
  SELECT tok, count(*) AS c1 FROM w GROUP BY tok
), v AS (
  SELECT CAST(count(*) AS DOUBLE) AS vsize FROM uc
), b AS (
  SELECT doc_id, unnest(list_transform(toks[1:len(toks)-1],
                                       (x, i) -> x || ' ' || toks[i + 1]))
             AS bigram
  FROM t
), bc AS (
  SELECT bigram, count(*) AS c2 FROM b GROUP BY bigram
), s AS (
  SELECT doc_id, ln((c2 + 1) / (c1 + vsize)) AS sc
  FROM b
  JOIN bc USING (bigram)
  JOIN uc ON uc.tok = split_part(b.bigram, ' ', 1), v
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(sc), 6) AS logprob
FROM s GROUP BY doc_id
"""


def doc_quality_filter_p75(sf_dir: str):
    """Percentile-threshold curation: keep docs scoring ABOVE their
    language's 75th percentile — the statistical filter real curation
    runs use instead of fixed cutoffs.  Both passes STREAM (pass 2
    re-scores rather than materializing a corpus-sized scored table —
    recompute is cheaper than a 100-TB spill); the per-language
    thresholds
    are exact: per-(lang, score) counts reduce through the combiner
    (scores are 6dp-rounded, so the distinct grid is bounded), and the
    driver replicates quantile_cont's interpolation bit-for-bit
    ((CRN−RN)·a + (RN−FRN)·b — Ray's own Quantile aggregate orders the
    same math differently and drifts ~1e-6, which a > filter cannot
    tolerate).  Thresholds broadcast into the final filter."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             strip_schema_metadata)

    def score_batch(batch: pa.Table) -> pa.Table:
        s = analysis.quality_score(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "score": s.column("score")})

    def scored():
        return ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"),
            columns=["doc_id", "text", "lang"]) \
            .map_batches(strip_schema_metadata, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .map_batches(score_batch, batch_format="pyarrow")

    def grid_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch.column("lang"),
                      "score": batch.column("score"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["lang", "score"]).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "score", "n"])

    grid = collect_table(final_merge_sums(
        scored().map_batches(grid_partial, batch_format="pyarrow"),
        ["lang", "score"], ["n"]).materialize())
    from cheque_ocr_project_ray.util import quantile_cont_from_grid
    thr_map = {}
    if grid is not None:
        gdf = grid.to_pandas().sort_values(["lang", "score"])
        for lang, g in gdf.groupby("lang", sort=False):
            thr_map[lang] = quantile_cont_from_grid(
                g["score"].to_numpy(), g["n"].to_numpy(), 0.75)
    thr_ref = ray.put(thr_map)

    class Filter:
        def __init__(self):
            self.thr = ray.get(thr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            langs = batch.column("lang").to_pandas()
            t = langs.map(self.thr).to_numpy(dtype=np.float64)
            keep = batch.column("score").to_numpy(
                zero_copy_only=False) > t
            return batch.filter(pa.array(keep))

    from cheque_ocr_project_ray.util import map_pool
    return scored().map_batches(Filter, batch_format="pyarrow",
                                concurrency=(1, map_pool()))


QUALITY_FILTER_P75_SQL = """
WITH q AS ({QUALITY}),
z AS (
  SELECT doc_id,
         {W0} + {W1} * stop_ratio + {W2} * ttr
         + {W3} * ln(n_tokens) AS z
  FROM q),
s AS (
  SELECT d.doc_id, d.lang, round(1.0 / (1.0 + exp(-z)), 6) AS score
  FROM z JOIN documents d USING (doc_id)),
t AS (SELECT lang, quantile_cont(score, 0.75) AS thr FROM s
      GROUP BY lang)
SELECT s.doc_id, s.lang, s.score
FROM s JOIN t USING (lang)
WHERE s.score > t.thr
"""


def doc_quality_percentile(sf_dir: str):
    """Per-language percent_rank normalization of the quality score —
    the corpus-wide ECDF scaling real curation uses so thresholds are
    comparable across languages.

    Exact and distributed the same way as ``doc_quality_filter_p75``:
    per-(lang, 6dp-score) counts reduce through combiner partials (the
    score grid is bounded by the rounding, not the corpus), the driver
    folds the grid into the SQL ``percent_rank`` definition
    ``(# scores < s) / (n_lang − 1)`` (0 when a language has a single
    doc), and the tiny (lang, score)→pr map broadcasts into one
    labeling pass."""
    import numpy as np
    import pyarrow as pa
    import ray

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool,
                                             round_half_up,
                                             strip_schema_metadata)

    def score_batch(batch: pa.Table) -> pa.Table:
        s = analysis.quality_score(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "score": s.column("score")})

    def scored():
        return ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"),
            columns=["doc_id", "text", "lang"]) \
            .map_batches(strip_schema_metadata, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .map_batches(score_batch, batch_format="pyarrow")

    def grid_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch.column("lang"),
                      "score": batch.column("score"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["lang", "score"]).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "score", "n"])

    grid = collect_table(final_merge_sums(
        scored().map_batches(grid_partial, batch_format="pyarrow"),
        ["lang", "score"], ["n"]).materialize())
    pr_map = {}
    if grid is not None:
        gdf = grid.to_pandas().sort_values(["lang", "score"])
        for lang, g in gdf.groupby("lang", sort=False):
            n = g["n"].to_numpy()
            total = int(n.sum())
            below = np.concatenate([[0], np.cumsum(n)[:-1]])
            denom = max(total - 1, 1)
            for s, b in zip(g["score"].to_numpy(), below):
                pr_map[(lang, float(s))] = float(round_half_up(
                    b / denom, 6)) if total > 1 else 0.0
    pr_ref = ray.put(pr_map)

    class Label:
        def __init__(self):
            self.pr = ray.get(pr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            langs = batch.column("lang").to_pylist()
            scores = batch.column("score").to_numpy(
                zero_copy_only=False)
            pr = np.fromiter(
                (self.pr[(lg, float(s))]
                 for lg, s in zip(langs, scores)),
                dtype=np.float64, count=len(langs))
            return batch.append_column("pr",
                                       pa.array(pr, pa.float64()))

    return scored().map_batches(Label, batch_format="pyarrow",
                                concurrency=(1, map_pool())) \
        .sort("doc_id")


QUALITY_PERCENTILE_SQL = """
WITH q AS ({QUALITY}),
z AS (
  SELECT doc_id,
         {W0} + {W1} * stop_ratio + {W2} * ttr
         + {W3} * ln(n_tokens) AS z
  FROM q),
s AS (
  SELECT d.doc_id, d.lang, round(1.0 / (1.0 + exp(-z)), 6) AS score
  FROM z JOIN documents d USING (doc_id))
SELECT doc_id, lang, score,
       round(percent_rank() OVER (PARTITION BY lang ORDER BY score), 6)
           AS pr
FROM s
ORDER BY doc_id
"""


HASH_DIMS = 64


def doc_feature_hashing(sf_dir: str):
    """The hashing trick: every doc becomes a signed-count vector in
    a fixed 64-dim space (dim = md5(token) mod 64, sign from an
    independent hash bit) — the vectorizer that needs NO vocabulary
    pass and therefore no shuffle at all.  Long-form output
    (doc_id, dim, weight) with EXACT integer weights; the word hash
    is the proven md5_number_lower convention, so the whole op has a
    pure-SQL oracle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.text.dedup import _stable64

    def vectorize(batch: pa.Table) -> pa.Table:
        toks = analysis._token_lists(batch.column("text"))
        flat = pc.list_flatten(toks).combine_chunks()
        n = batch.num_rows
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(n), lens)
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""          # SQL's list_filter(x -> x <> '')
        words, parent = words[keep], parent[keep]
        if len(words) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.int64())})
        h = np.fromiter((_stable64(w) for w in words),
                        dtype=np.uint64, count=len(words))
        dim = (h % HASH_DIMS).astype(np.int64)
        sign = (((h >> np.uint64(6)) & np.uint64(1)).astype(np.int64)
                * 2 - 1)
        acc = np.zeros(n * HASH_DIMS, np.int64)
        np.add.at(acc, parent * HASH_DIMS + dim, sign)
        nz = np.flatnonzero(acc)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[nz // HASH_DIMS], pa.int64()),
            "dim": pa.array(nz % HASH_DIMS, pa.int64()),
            "weight": pa.array(acc[nz], pa.int64())})

    return _docs(sf_dir).map_batches(vectorize, batch_format="pyarrow")


FEATURE_HASHING_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
h AS (SELECT doc_id, md5_number_lower(tok) AS h FROM w),
g AS (
  SELECT doc_id, CAST(h % {HASH_DIMS} AS BIGINT) AS dim,
         CAST(sum(CASE WHEN (h // 64) % 2 = 1 THEN 1 ELSE -1 END)
              AS BIGINT) AS weight
  FROM h GROUP BY doc_id, dim)
SELECT doc_id, dim, weight FROM g WHERE weight <> 0
"""


def corpus_zipf_slope(sf_dir: str, np_: int = 0,
                      bound: int = 2_000_000):
    """Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) over
    the corpus vocabulary — the classic sanity check that a text
    corpus is natural-language-shaped (slope ≈ −1) rather than
    synthetic or corrupted.  One vocabulary-bounded combiner merge;
    under ``bound`` the regression folds from exact moment sums on
    the driver, mirroring the SQL formula op-for-op.  Past it (the
    r5 vocabulary-rank fallback): rank needs global order, so the
    count table sorts distributedly on (n DESC, tok) and each block
    computes its OLS moment partials (k, Σx, Σy, Σxy, Σx²) from its
    ``block_prefix_offsets`` rank seed — the driver folds n_blocks
    5-float rows, never a term."""
    import numpy as np
    import pandas as pd
    import ray as _ray

    from cheque_ocr_project_ray.util import (block_prefix_offsets,
                                             collect_table,
                                             final_merge_sums,
                                             round_half_up)

    docs = _docs(sf_dir)
    counts = final_merge_sums(
        docs.map_batches(analysis.token_counts, batch_format="pyarrow"),
        ["tok"], ["n"], np_=np_, bound=bound).materialize()
    n_terms = counts.count()
    if n_terms == 0:
        return pd.DataFrame({"n_terms": pd.Series([], dtype="int64"),
                             "slope": pd.Series([], dtype="float64"),
                             "intercept": pd.Series([], dtype="float64")})
    if n_terms <= bound:
        df = collect_table(counts).to_pandas()
        # rank = row_number ordered by (freq DESC, token ASC) — ties
        # get deterministic distinct ranks in both engines
        df = df.sort_values(["n", "tok"],
                            ascending=[False, True]).reset_index(drop=True)
        x = np.log(np.arange(1, len(df) + 1, dtype=np.float64))
        y = np.log(df["n"].to_numpy(np.float64))
        k = float(len(df))
        sx, sy = x.sum(), y.sum()
        sxy, sxx = (x * y).sum(), (x * x).sum()
    else:
        refs = counts.sort(["n", "tok"], descending=[True, False]) \
            .materialize().to_arrow_refs()
        rows, row_off, _, _ = block_prefix_offsets(refs)

        @_ray.remote
        def moments(t, roff: int):
            if t.num_columns == 0 or t.num_rows == 0:
                return (0.0, 0.0, 0.0, 0.0, 0.0)
            x = np.log(np.arange(roff + 1, roff + t.num_rows + 1,
                                 dtype=np.float64))
            y = np.log(t.column("n").to_numpy(
                zero_copy_only=False).astype(np.float64))
            return (float(t.num_rows), float(x.sum()), float(y.sum()),
                    float((x * y).sum()), float((x * x).sum()))

        parts = _ray.get([moments.remote(r, int(ro))
                          for r, ro in zip(refs, row_off)])
        k = sum(p[0] for p in parts)
        sx = sum(p[1] for p in parts)
        sy = sum(p[2] for p in parts)
        sxy = sum(p[3] for p in parts)
        sxx = sum(p[4] for p in parts)
    slope = (sxy / k - (sx / k) * (sy / k)) \
        / (sxx / k - (sx / k) * (sx / k))
    intercept = sy / k - slope * (sx / k)
    return pd.DataFrame({"n_terms": [int(n_terms)],
                         "slope": [float(round_half_up(slope, 6))],
                         "intercept": [float(round_half_up(intercept,
                                                           6))]})


ZIPF_SLOPE_SQL = """
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
c AS (SELECT tok, count(*) AS n FROM w GROUP BY tok),
r AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, tok) AS DOUBLE))
             AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM c),
s AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM r)
SELECT CAST(k AS BIGINT) AS n_terms,
       round((sxy / k - (sx / k) * (sy / k))
             / (sxx / k - (sx / k) * (sx / k)), 6) AS slope,
       round(sy / k - ((sxy / k - (sx / k) * (sy / k))
                       / (sxx / k - (sx / k) * (sx / k))) * (sx / k), 6)
           AS intercept
FROM s
"""


def doc_charset_profile(sf_dir: str):
    """Character-class profile per doc (digit / space / letter counts
    and ratios) — the cleaning signal that catches OCR garbage, code,
    and tables masquerading as text.  Pure vectorized regex-strip
    arithmetic, identical kernels in both engines; fully streaming."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import round_half_up

    def profile(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        total = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        def count_of(pattern):
            stripped = pc.utf8_length(pc.replace_substring_regex(
                text, pattern=pattern, replacement="")).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return total - stripped
        digits = count_of(r"[0-9]")
        spaces = count_of(r"[ ]")
        letters = count_of(r"[A-Za-z]")
        safe = np.where(total == 0, 1, total)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(total, pa.int64()),
            "n_digits": pa.array(digits, pa.int64()),
            "n_letters": pa.array(letters, pa.int64()),
            "digit_ratio": pa.array(round_half_up(digits / safe, 6)),
            "space_ratio": pa.array(round_half_up(spaces / safe, 6))})

    return _docs(sf_dir).map_batches(profile, batch_format="pyarrow")


CHARSET_PROFILE_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
           AS n_digits,
       length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           AS n_letters,
       round((length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g')))
             / CAST(greatest(length(text), 1) AS DOUBLE), 6)
           AS digit_ratio,
       round((length(text)
              - length(regexp_replace(text, '[ ]', '', 'g')))
             / CAST(greatest(length(text), 1) AS DOUBLE), 6)
           AS space_ratio
FROM documents
"""


STOPWORD_K = 20


def corpus_stopword_discovery(sf_dir: str, np_: int = 0,
                              bound: int = 2_000_000):
    """Automatic stopword discovery: the STOPWORD_K highest-document-
    frequency terms with df, total tf, and idf — the data-driven
    replacement for hand-curated stopword lists.  One vocabulary-
    bounded merge; deterministic (df DESC, term ASC) ordering.  Past
    ``bound`` (the r5 vocabulary-rank fallback) the merged count
    table stays distributed and every block emits only its own top
    STOPWORD_K candidates — the global winner set is a subset of the
    K·n_blocks candidate rows (each global top row lives in SOME
    block and tops it), so the driver re-rank is block-bounded, the
    standard per-batch-top-k + tiny-global-re-rank shape."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    docs = _docs(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        from cheque_ocr_project_ray.text.index import _pair_counts
        g = _pair_counts(batch)   # (term, doc_id, tf) within batch
        t = g.group_by("term").aggregate([("tf", "sum"),
                                          ("doc_id", "count")])
        return t.rename_columns(["term", "total_tf", "df"])

    merged = final_merge_sums(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["term"], ["total_tf", "df"], np_=np_,
        bound=bound).materialize()
    if merged.count() > bound:
        # term-unique stream: keep only each block's top-K candidates
        def block_topk(b: pd.DataFrame) -> pd.DataFrame:
            return b.sort_values(["df", "term"],
                                 ascending=[False, True]) \
                .head(STOPWORD_K)

        merged = merged.map_batches(
            block_topk, batch_format="pandas").materialize()
    ct = collect_table(merged)
    if ct is None or ct.num_rows == 0:
        return pd.DataFrame({"term": pd.Series([], dtype="object"),
                             "df": pd.Series([], dtype="int64"),
                             "total_tf": pd.Series([], dtype="int64"),
                             "idf": pd.Series([], dtype="float64")})
    import pyarrow.parquet as pq_
    from pathlib import Path
    n_docs = pq_.ParquetFile(
        str(Path(sf_dir) / "documents.parquet")).metadata.num_rows
    df = ct.to_pandas().sort_values(
        ["df", "term"], ascending=[False, True]).head(STOPWORD_K)
    return pd.DataFrame({
        "term": df["term"],
        "df": df["df"],
        "total_tf": df["total_tf"],
        "idf": round_half_up(
            np.log(float(n_docs) / df["df"].to_numpy(np.float64)), 6)})


STOPWORD_DISCOVERY_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
c AS (
  SELECT tok AS term, count(DISTINCT doc_id) AS df,
         count(*) AS total_tf
  FROM w GROUP BY tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
SELECT term, CAST(df AS BIGINT) AS df,
       CAST(total_tf AS BIGINT) AS total_tf,
       round(ln(n.nd / df), 6) AS idf
FROM c, n
ORDER BY df DESC, term
LIMIT {STOPWORD_K}
"""


HASH_SIM_K = 20


def doc_hash_similarity(sf_dir: str):
    """Similarity search over the HASHED doc vectors: top-20 docs by
    cosine to doc 0 — text → vectorize → search with no vocabulary,
    no embedding model, and no shuffle (the 64-dim query vector
    broadcasts; every float op starts from exact integer dot products
    and norms, so the cosine is bit-equal to the SQL twin's)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from cheque_ocr_project_ray.text.dedup import _stable64
    from cheque_ocr_project_ray.util import map_pool, round_half_up

    def _hash_vec(text: str) -> np.ndarray:
        words = [w for w in
                 __import__("re").split(r"\s+", text.strip()) if w]
        acc = np.zeros(HASH_DIMS, np.int64)
        for w in words:
            h = _stable64(w)
            acc[h % HASH_DIMS] += 1 if (h >> 6) & 1 else -1
        return acc

    import pyarrow.parquet as pq_
    from pathlib import Path
    q_text = pq_.read_table(str(Path(sf_dir) / "documents.parquet"),
                            columns=["doc_id", "text"],
                            filters=[("doc_id", "=", 0)])
    qv = _hash_vec(q_text["text"].to_pylist()[0])
    qq = float(np.sqrt((qv * qv).sum()))
    q_ref = ray.put((qv, qq))

    class Score:
        def __init__(self):
            self.qv, self.qq = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            toks = analysis._token_lists(batch.column("text"))
            flat = pc.list_flatten(toks).combine_chunks()
            n = batch.num_rows
            lens = pc.list_value_length(toks).to_numpy(
                zero_copy_only=False).astype(np.int64)
            parent = np.repeat(np.arange(n), lens)
            words = flat.to_numpy(zero_copy_only=False)
            keep = words != ""
            words, parent = words[keep], parent[keep]
            acc = np.zeros(n * HASH_DIMS, np.int64)
            if len(words):
                h = np.fromiter((_stable64(w) for w in words),
                                dtype=np.uint64, count=len(words))
                dim = (h % HASH_DIMS).astype(np.int64)
                sign = (((h >> np.uint64(6)) & np.uint64(1))
                        .astype(np.int64) * 2 - 1)
                np.add.at(acc, parent * HASH_DIMS + dim, sign)
            m = acc.reshape(n, HASH_DIMS)
            dp = m @ self.qv                       # exact int64
            dd = np.sqrt((m * m).sum(axis=1).astype(np.float64))
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            ok = (dd > 0) & (ids != 0)
            cos = round_half_up(dp[ok] / (self.qq * dd[ok]), 5)
            t = pa.table({"doc_id": pa.array(ids[ok], pa.int64()),
                          "cos": pa.array(cos, pa.float64())})
            k = pc.select_k_unstable(
                t, HASH_SIM_K, [("cos", "descending"),
                                ("doc_id", "ascending")])
            return t.take(k)

    return _docs(sf_dir).map_batches(Score, batch_format="pyarrow",
                                     concurrency=(1, map_pool())) \
        .sort(["cos", "doc_id"], descending=[True, False]) \
        .limit(HASH_SIM_K)


HASH_SIMILARITY_SQL = f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
h AS (SELECT doc_id, md5_number_lower(tok) AS h FROM w),
g AS (
  SELECT doc_id, CAST(h % {HASH_DIMS} AS BIGINT) AS dim,
         CAST(sum(CASE WHEN (h // 64) % 2 = 1 THEN 1 ELSE -1 END)
              AS BIGINT) AS weight
  FROM h GROUP BY doc_id, dim),
q AS (SELECT dim, weight FROM g WHERE doc_id = 0),
qn AS (SELECT sqrt(CAST(sum(weight * weight) AS DOUBLE)) AS qq FROM q),
d AS (SELECT doc_id,
             sqrt(CAST(sum(weight * weight) AS DOUBLE)) AS dd
      FROM g GROUP BY doc_id),
dot AS (
  SELECT g.doc_id, CAST(sum(g.weight * q.weight) AS BIGINT) AS dp
  FROM g JOIN q USING (dim) GROUP BY g.doc_id)
SELECT d.doc_id, round(dp / (qn.qq * d.dd), 5) AS cos
FROM dot JOIN d USING (doc_id), qn
WHERE d.doc_id <> 0 AND d.dd > 0
ORDER BY round(dp / (qn.qq * d.dd), 5) DESC, d.doc_id
LIMIT {HASH_SIM_K}
"""


JSD_SRC_A, JSD_SRC_B = "src0", "src1"


def doc_source_jsd(sf_dir: str, np_: int = 0,
                   bound: int = 2_000_000):
    """Jensen-Shannon divergence between two sources' unigram
    distributions — the corpus-mix drift monitor (are two slices of
    the corpus statistically the same text?).  Per-batch (token,
    count_a, count_b) partials, one bounded vocabulary merge, then a
    vectorized driver fold; counts stay integers until the final
    probability divisions.  Past ``bound`` (the r5 vocabulary
    fallback) the merged table stays distributed: the KL integrand is
    per-token-local given the two scalar totals, so each block folds
    its own Σkl partials and the driver sums n_blocks 2-float rows —
    no sort, no join, no vocab on the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up,
                                             strip_schema_metadata)

    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["source", "text"]) \
        .map_batches(strip_schema_metadata, batch_format="pyarrow",
                     zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("source"),
                        value_set=pa.array([JSD_SRC_A, JSD_SRC_B]))
        b = batch.filter(keep)
        if b.num_rows == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        toks = analysis._token_lists(b.column("text"))
        flat = pc.list_flatten(toks).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        is_a = pc.equal(b.column("source"), JSD_SRC_A).to_numpy(
            zero_copy_only=False)
        row_a = np.repeat(is_a.astype(np.int64), lens)
        t = pa.table({"tok": flat,
                      "na": pa.array(row_a, pa.int64()),
                      "nb": pa.array(1 - row_a, pa.int64())})
        g = t.group_by("tok").aggregate([("na", "sum"), ("nb", "sum")])
        return g.rename_columns(["tok", "na", "nb"])

    merged = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["tok"], ["na", "nb"], np_=np_, bound=bound).materialize()
    n_terms = merged.count()
    if n_terms == 0:
        return pd.DataFrame({"jsd": pd.Series([], dtype="float64"),
                             "n_tokens_a": pd.Series([], dtype="int64"),
                             "n_tokens_b": pd.Series([], dtype="int64")})

    def _fold(na, nb, ta, tb):
        pa_ = na / ta
        pb_ = nb / tb
        m = (pa_ + pb_) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            kl_a = np.where(pa_ > 0, pa_ * np.log(pa_ / m), 0.0)
            kl_b = np.where(pb_ > 0, pb_ * np.log(pb_ / m), 0.0)
        return 0.5 * kl_a.sum() + 0.5 * kl_b.sum()

    if n_terms <= bound:
        t = collect_table(merged)
        na = t.column("na").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nb = t.column("nb").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ta, tb = na.sum(), nb.sum()
        jsd = _fold(na, nb, ta, tb)
    else:
        ta = float(merged.sum("na"))
        tb = float(merged.sum("nb"))

        def kl_partial(t: pa.Table) -> pa.Table:
            na = t.column("na").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            nb = t.column("nb").to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            return pa.table({"kl": pa.array([_fold(na, nb, ta, tb)],
                                            pa.float64())})

        jsd = float(merged.map_batches(
            kl_partial, batch_format="pyarrow").sum("kl"))
    return pd.DataFrame({"jsd": [float(round_half_up(jsd, 6))],
                         "n_tokens_a": [int(ta)],
                         "n_tokens_b": [int(tb)]})


SOURCE_JSD_SQL = f"""
WITH w AS (
  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+'))
             AS tok
  FROM documents
  WHERE source IN ('{JSD_SRC_A}', '{JSD_SRC_B}')),
c AS (
  SELECT tok,
         sum(CASE WHEN source = '{JSD_SRC_A}' THEN 1 ELSE 0 END)
             AS na,
         sum(CASE WHEN source = '{JSD_SRC_B}' THEN 1 ELSE 0 END)
             AS nb
  FROM w GROUP BY tok),
t AS (SELECT CAST(sum(na) AS DOUBLE) AS ta,
             CAST(sum(nb) AS DOUBLE) AS tb FROM c),
p AS (
  SELECT na / t.ta AS pa, nb / t.tb AS pb,
         (na / t.ta + nb / t.tb) / 2.0 AS m, t.ta, t.tb
  FROM c, t)
SELECT round(0.5 * sum(CASE WHEN pa > 0 THEN pa * ln(pa / m)
                       ELSE 0 END)
             + 0.5 * sum(CASE WHEN pb > 0 THEN pb * ln(pb / m)
                         ELSE 0 END), 6) AS jsd,
       CAST(any_value(ta) AS BIGINT) AS n_tokens_a,
       CAST(any_value(tb) AS BIGINT) AS n_tokens_b
FROM p
"""


def doc_source_dup_rate(sf_dir: str, bound: int = 2_000_000):
    """Per-source exact-duplicate contamination rate — the dedup
    QA report a curation run ends with.  Pass 1 reduces to
    (fingerprint, count) partials (bounded-adaptive merge) and
    filters to the >1 fingerprints DISTRIBUTEDLY, so what reaches the
    driver is proportional to DUPLICATES, never corpus size.  Under
    ``bound`` the dup set broadcasts into pass 2's vectorized lookup;
    past it the lookup becomes a LEFT OUTER ``hash_join`` on the
    fingerprint — the round-5 audit fallback (previously promised in
    prose only), same semantics, one more exchange."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool,
                                             round_half_up,
                                             strip_schema_metadata)

    def _read():
        return ray.data.read_parquet(
            str(Path(sf_dir) / "documents.parquet"),
            columns=["source", "text"]) \
            .map_batches(strip_schema_metadata, batch_format="pyarrow",
                         zero_copy_batch=True)

    def fp_partial(batch: pa.Table) -> pa.Table:
        fps = analysis.text_md5(batch.column("text").to_pylist())
        t = pa.table({"fp": pa.array(fps, pa.string()),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("fp").aggregate([("n", "sum")])
        return g.rename_columns(["fp", "n"])

    counts_ds = final_merge_sums(
        _read().map_batches(fp_partial, batch_format="pyarrow"),
        ["fp"], ["n"], bound=bound).materialize()
    dup_ds = counts_ds.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"),
                                      pa.scalar(1, pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    empty = pd.DataFrame({"source": pd.Series([], dtype="object"),
                          "n_docs": pd.Series([], dtype="int64"),
                          "n_dups": pd.Series([], dtype="int64"),
                          "dup_rate": pd.Series([], dtype="float64")})
    if counts_ds.count() == 0:
        return empty

    if dup_ds.count() <= bound:
        dup = collect_table(dup_ds)
        dup_fps_arr = dup.column("fp").combine_chunks() \
            if dup is not None else pa.array([], pa.string())
        dup_ref = ray.put(dup_fps_arr)

        class Rollup:
            def __init__(self):
                self.dup_fps = ray.get(dup_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                fps = pa.array(analysis.text_md5(
                    batch.column("text").to_pylist()), pa.string())
                is_dup = pc.cast(pc.fill_null(
                    pc.is_in(fps, value_set=self.dup_fps), False),
                    pa.int64())
                t = pa.table({"source": batch.column("source"),
                              "n_docs": pa.array(np.ones(
                                  batch.num_rows, np.int64)),
                              "n_dups": is_dup})
                g = t.group_by("source").aggregate(
                    [("n_docs", "sum"), ("n_dups", "sum")])
                return g.rename_columns(["source", "n_docs", "n_dups"])

        agg = final_merge_sums(
            _read().map_batches(Rollup, batch_format="pyarrow",
                                concurrency=(1, map_pool())),
            ["source"], ["n_docs", "n_dups"])
    else:
        # dup set past broadcast: LEFT OUTER hash join on fp — a null
        # count marks a non-duplicate (round-5 audit fallback)
        from cheque_ocr_project_ray.relational.joins import hash_join

        def with_fp(batch: pa.Table) -> pa.Table:
            return pa.table({
                "source": batch.column("source"),
                "fp": pa.array(analysis.text_md5(
                    batch.column("text").to_pylist()), pa.string())})

        j = hash_join(_read().map_batches(with_fp,
                                          batch_format="pyarrow"),
                      dup_ds, on="fp", how="left")

        def rollup_joined(batch: pa.Table) -> pa.Table:
            is_dup = pc.cast(pc.is_valid(batch.column("n")), pa.int64())
            t = pa.table({"source": batch.column("source"),
                          "n_docs": pa.array(np.ones(
                              batch.num_rows, np.int64)),
                          "n_dups": is_dup})
            g = t.group_by("source").aggregate(
                [("n_docs", "sum"), ("n_dups", "sum")])
            return g.rename_columns(["source", "n_docs", "n_dups"])

        agg = final_merge_sums(
            j.map_batches(rollup_joined, batch_format="pyarrow"),
            ["source"], ["n_docs", "n_dups"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["dup_rate"] = round_half_up(
            b["n_dups"].astype(np.float64) / b["n_docs"], 4)
        return b

    return agg.map_batches(finish, batch_format="pandas")


SOURCE_DUP_RATE_SQL = """
WITH h AS (SELECT source, md5(text) AS fp FROM documents),
c AS (SELECT fp, count(*) AS cnt FROM h GROUP BY fp)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dups,
       round(CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS dup_rate
FROM h JOIN c USING (fp)
GROUP BY source
"""


def dedup_triangles(sf_dir: str):
    """Triangle count + global clustering coefficient of the
    n-gram-Jaccard near-dup graph — the transitivity audit for dedup
    quality (high clustering = pair threshold induces coherent
    clusters; low = chains of borderline pairs that over-merge under
    closure).  Same edge source as ``dedup_components``.

    Distributed shape: edges are kept (a < b)-ordered, wedges come
    from ONE partitioned hash join (e1.b = e2.a → a<b<c wedge rows,
    each triangle generated exactly once), and closure is a second
    hash join of wedges against edges on a packed "a,c" key — never an
    adjacency broadcast, never a driver edge list.  Per-node wedge
    fanout is degree² — the hub-cap assumption the pair sources
    already enforce (``bucket_cap`` star fallback bounds degrees).
    Degrees reduce via combiner partials; only scalar sums reach the
    driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import pandas as pd

    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import final_merge_sums

    pairs = dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                      threshold=0.5)
    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    n_edges = edges.count()

    def _result(t: int, e: int, nodes: int, wedges: int) -> pd.DataFrame:
        from cheque_ocr_project_ray.util import round_half_up
        clustering = (float(round_half_up(3.0 * t / wedges, 6))
                      if wedges > 0 else 0.0)
        return pd.DataFrame({"n_triangles": [np.int64(t)],
                             "n_edges": [np.int64(e)],
                             "n_nodes": [np.int64(nodes)],
                             "clustering": [clustering]})

    if n_edges == 0:
        return _result(0, 0, 0, 0)

    def as_ab(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("doc_a"),
                         "b": batch.column("doc_b")})

    def as_bc(batch: pa.Table) -> pa.Table:
        return pa.table({"b": batch.column("doc_a"),
                         "c": batch.column("doc_b")})

    e1 = edges.map_batches(as_ab, batch_format="pyarrow")
    e2 = edges.map_batches(as_bc, batch_format="pyarrow")
    wedges_ds = hash_join(e1, e2, on="b")  # (a,b,c) with a<b<c

    def pack_ac(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(a.astype("U20"), ","),
                          c.astype("U20"))
        return pa.table({"key": pa.array(key.tolist(), pa.string())})

    def pack_edge(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(a.astype("U20"), ","),
                          b.astype("U20"))
        return pa.table({"key": pa.array(key.tolist(), pa.string()),
                         "hit": pa.array(np.ones(len(a), np.int64))})

    closed = hash_join(wedges_ds.map_batches(pack_ac,
                                             batch_format="pyarrow"),
                       edges.map_batches(pack_edge,
                                         batch_format="pyarrow"),
                       on="key")
    n_triangles = closed.count()

    def deg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"v": pa.concat_arrays([
            batch.column("doc_a").combine_chunks(),
            batch.column("doc_b").combine_chunks()]),
            "d": pa.array(np.ones(2 * batch.num_rows, np.int64))})
        return t.group_by("v").aggregate([("d", "sum")]) \
            .rename_columns(["v", "d"])

    deg = final_merge_sums(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["v"], ["d"])

    def wedge_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("d").to_numpy(zero_copy_only=False)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())],
                                       pa.int64()),
                         "nodes": pa.array([len(d)], pa.int64())})

    sums = deg.map_batches(wedge_partial, batch_format="pyarrow") \
        .sum(["w", "nodes"])
    return _result(n_triangles, n_edges,
                   int(sums["sum(nodes)"]), int(sums["sum(w)"]))


def _triangles_sql() -> str:
    return f"""
WITH e AS (
  SELECT doc_a AS a, doc_b AS b
  FROM ({_jaccard_pairs_sql(k=2, threshold=0.5)})),
deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
  GROUP BY v),
tri AS (
  SELECT count(*) AS t
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
wed AS (SELECT sum(d * (d - 1) // 2) AS w FROM deg)
SELECT CAST(t AS BIGINT) AS n_triangles,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       round(CASE WHEN w > 0 THEN 3.0 * t / w ELSE 0 END, 6)
           AS clustering
FROM tri, wed
"""


def dedup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-size histogram: (cluster_size, n_clusters)
    over the connected components of the n-gram-Jaccard pair graph —
    the dedup-impact summary a curation report leads with (how much of
    the corpus is 2-packs vs giant templates).  Components reduce to
    (doc, rep); two bounded groupbys finish."""
    from cheque_ocr_project_ray.text.cluster import components_from_pairs
    from cheque_ocr_project_ray.util import final_merge_sums

    import numpy as np
    import pyarrow as pa

    pairs = dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                      threshold=0.5)
    comp = components_from_pairs(pairs)

    def size_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"rep": batch.column("rep"),
                      "n": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by("rep").aggregate([("n", "sum")]) \
            .rename_columns(["rep", "n"])

    sizes = final_merge_sums(
        comp.map_batches(size_partial, batch_format="pyarrow"),
        ["rep"], ["n"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"cluster_size": batch.column("n"),
                      "n_clusters": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by("cluster_size") \
            .aggregate([("n_clusters", "sum")]) \
            .rename_columns(["cluster_size", "n_clusters"])

    return final_merge_sums(
        sizes.map_batches(hist_partial, batch_format="pyarrow"),
        ["cluster_size"], ["n_clusters"])


def dedup_degree_histogram(sf_dir: str):
    """Near-dup graph degree distribution: (degree, n_docs) over the
    n-gram-Jaccard pair graph — the hub diagnostic run BEFORE
    transitive dedup (a fat-tailed degree histogram predicts template
    storms whose connected components would swallow half the corpus).
    Each pair credits BOTH endpoints; per-doc degrees reduce through
    the bounded-adaptive merge, then the histogram is a second merge
    over the degree domain (bounded by the pair source's bucket
    caps).  Nothing adjacency-shaped ever reaches the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import collect_table, final_merge_sums

    pairs = dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                      threshold=0.5)

    def deg_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate([
            batch.column("doc_a").to_numpy(zero_copy_only=False),
            batch.column("doc_b").to_numpy(zero_copy_only=False)])
        t = pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                      "degree": pa.array(np.ones(len(ids), np.int64))})
        return t.group_by("doc_id").aggregate([("degree", "sum")]) \
            .rename_columns(["doc_id", "degree"])

    degs = final_merge_sums(
        pairs.map_batches(deg_partial, batch_format="pyarrow"),
        ["doc_id"], ["degree"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"degree": batch.column("degree"),
                      "n_docs": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by("degree").aggregate([("n_docs", "sum")]) \
            .rename_columns(["degree", "n_docs"])

    hist = collect_table(final_merge_sums(
        degs.map_batches(hist_partial, batch_format="pyarrow"),
        ["degree"], ["n_docs"]).materialize())
    if hist is None or hist.num_rows == 0:
        return pd.DataFrame({"degree": pd.Series([], dtype="int64"),
                             "n_docs": pd.Series([], dtype="int64")})
    df = hist.to_pandas().sort_values("degree").reset_index(drop=True)
    return pd.DataFrame({"degree": df["degree"].astype(np.int64),
                         "n_docs": df["n_docs"].astype(np.int64)})


DEGREE_HISTOGRAM_SQL = f"""
SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
  FROM (
    SELECT unnest([doc_a, doc_b]) AS doc_id
    FROM ({_jaccard_pairs_sql(2, 0.5)})
  ) GROUP BY doc_id
) GROUP BY degree ORDER BY degree
"""


CLUSTER_SIZES_SQL = f"""
SELECT size AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM (
  SELECT rep, CAST(count(*) AS BIGINT) AS size
  FROM ({_components_sql(2, 0.5)})
  GROUP BY rep)
GROUP BY size
"""


def corpus_dedup_savings(sf_dir: str):
    """Exact-dedup impact report (one row): distinct texts, total
    docs, duplicate docs, and the characters a keep-first dedup pass
    saves — identical texts have identical length, so saved_chars =
    Σ (count−1)·n_chars per text group, exact integers end to end.
    The text-hash groupby is corpus-distributed; only per-group
    scalars reach the final fold."""
    from cheque_ocr_project_ray.text.analysis import text_md5
    from cheque_ocr_project_ray.util import collect_table

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count, Min

    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["doc_id", "text", "n_chars"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": pa.array(
                text_md5(batch.column("text").to_pylist()), pa.string()),
            "n_chars": batch.column("n_chars")})

    groups = ds.map_batches(hash_batch, batch_format="pyarrow") \
        .groupby("text_hash").aggregate(
            Count(alias_name="c"), Min("n_chars", alias_name="nc"))

    def fold(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        nc = batch.column("nc").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_distinct_texts": pa.array([len(c)], pa.int64()),
            "n_docs": pa.array([int(c.sum())], pa.int64()),
            "dup_docs": pa.array([int((c - 1).sum())], pa.int64()),
            "saved_chars": pa.array([int(((c - 1) * nc).sum())],
                                    pa.int64())})

    t = collect_table(
        groups.map_batches(fold, batch_format="pyarrow").materialize())
    if t is None:
        return pd.DataFrame({
            "n_distinct_texts": pd.Series([0], dtype="int64"),
            "n_docs": pd.Series([0], dtype="int64"),
            "dup_docs": pd.Series([0], dtype="int64"),
            "saved_chars": pd.Series([0], dtype="int64")})
    df = t.to_pandas()
    return pd.DataFrame([df.sum()]).astype("int64")


DEDUP_SAVINGS_SQL = """
WITH h AS (
  SELECT md5(text) AS th, count(*) AS c, min(n_chars) AS nc
  FROM documents GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_distinct_texts,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(sum(c - 1) AS BIGINT) AS dup_docs,
       CAST(sum((c - 1) * nc) AS BIGINT) AS saved_chars
FROM h
"""


def doc_lang_confusion(sf_dir: str):
    """Language-ID quality eval: confusion matrix of the n-gram
    heuristic's ``pred_lang`` against the corpus ground-truth ``lang``
    column — (true_lang, pred_lang, n).  The matrix is |langs|² —
    driver-tiny at any corpus size — and the counts combine per batch
    before the merge, so no raw doc rows shuffle."""
    from cheque_ocr_project_ray.util import final_merge_sums

    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["doc_id", "text", "lang"])

    def partial(batch):
        import numpy as np
        import pyarrow as pa
        pred = analysis.lang_id(batch)
        t = pa.table({
            "true_lang": batch.column("lang"),
            "pred_lang": pred.column("pred_lang"),
            "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by(["true_lang", "pred_lang"]) \
            .aggregate([("n", "sum")]) \
            .rename_columns(["true_lang", "pred_lang", "n"])

    return final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["true_lang", "pred_lang"], ["n"])


# built from the SAME snippet as LANG_ID_SQL (see _lang_id_sql)
_LIDC_CTES, _ = _lang_id_sql(", lang")
LANG_CONFUSION_SQL = f"""
{_LIDC_CTES}
SELECT lang AS true_lang,
       {_LID_CASE},
       count(*) AS n
FROM hits
GROUP BY 1, 2
"""


def corpus_hapax_ratio(sf_dir: str, np_: int = 0,
                       bound: int = 2_000_000):
    """Hapax-legomena ratio per source: the fraction of each source's
    vocabulary occurring exactly ONCE in that source — the
    lexical-diversity / noise diagnostic (OCR junk and random strings
    spike the hapax share; templated boilerplate collapses it).
    100-TB shape: per-batch (source, tok, n) combiner partials merge
    through the bounded-adaptive ``final_merge_sums`` (vocabulary ×
    sources keys — distributed groupby past ``bound``); the merged
    per-key counts then reduce per (source, block), so the driver
    only ever folds a sources × n_blocks grid (class b).  Same
    whitespace tokenization as the rest of the corpus family
    (``analysis._prep``)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    docs = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, parent = analysis._prep(batch)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        src = batch.column("source").combine_chunks().take(
            pa.array(parent, pa.int64()))
        t = pa.table({"source": src, "tok": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        return t.group_by(["source", "tok"]).aggregate([("n", "sum")]) \
            .rename_columns(["source", "tok", "n"])

    counts = final_merge_sums(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source", "tok"], ["n"], np_=np_, bound=bound)

    def roll(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "source": batch.column("source"),
            "n_hapax": pc.cast(pc.equal(batch.column("n"), 1),
                               pa.int64()),
            "n_terms": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by("source").aggregate(
            [("n_hapax", "sum"), ("n_terms", "sum")]) \
            .rename_columns(["source", "n_hapax", "n_terms"])

    agg = collect_table(final_merge_sums(
        counts.map_batches(roll, batch_format="pyarrow"),
        ["source"], ["n_hapax", "n_terms"], np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_terms": pd.Series([], dtype="int64"),
            "n_hapax": pd.Series([], dtype="int64"),
            "hapax_ratio": pd.Series([], dtype="float64")})
    df = agg.to_pandas().sort_values("source").reset_index(drop=True)
    return pd.DataFrame({
        "source": df["source"],
        "n_terms": df["n_terms"].astype(np.int64),
        "n_hapax": df["n_hapax"].astype(np.int64),
        "hapax_ratio": round_half_up(
            df["n_hapax"].to_numpy(np.float64)
            / df["n_terms"].to_numpy(np.float64), 6)})


def corpus_source_overlap(sf_dir: str, np_: int = 0,
                          bound: int = 2_000_000):
    """Vocabulary-overlap matrix between sources: for every source
    pair, the intersection / union / Jaccard of their DISTINCT word
    sets — the corpus-mixing diagnostic (two "different" crawls with
    0.9 vocabulary Jaccard are one source for mixture-weighting
    purposes).  100-TB shape: distinct (source, tok) rows reduce
    through the bounded-adaptive min-merge, the pair counts come from
    a token-keyed partitioned ``hash_join`` of that stream with
    itself (per-token fan-out ≤ |sources|², never a vocabulary
    broadcast), and everything the driver touches is the |sources|²
    grid (class b)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min,
                                             final_merge_sums,
                                             round_half_up)

    docs = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["source", "text"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        _, flat, parent = analysis._prep(batch)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        src = batch.column("source").combine_chunks().take(
            pa.array(parent, pa.int64()))
        t = pa.table({"source": src, "tok": flat,
                      "one": pa.array(np.ones(len(flat), np.int64))})
        return t.group_by(["source", "tok"]).aggregate([("one", "min")]) \
            .rename_columns(["source", "tok", "one"])

    distinct = final_merge_min(
        docs.map_batches(distinct_partial, batch_format="pyarrow"),
        ["source", "tok"], ["one"], np_=np_, bound=bound)

    def size_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch.column("source"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by("source").aggregate([("n", "sum")]) \
            .rename_columns(["source", "n"])

    sizes = collect_table(final_merge_sums(
        distinct.map_batches(size_partial, batch_format="pyarrow"),
        ["source"], ["n"], np_=np_).materialize())
    empty = pd.DataFrame({
        "source_a": pd.Series([], dtype="object"),
        "source_b": pd.Series([], dtype="object"),
        "inter": pd.Series([], dtype="int64"),
        "uni": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64")})
    if sizes is None or sizes.num_rows == 0:
        return empty

    def side(name: str):
        return distinct.map_batches(
            lambda b, n=name: pa.table({"tok": b.column("tok"),
                                        n: b.column("source")}),
            batch_format="pyarrow")

    joined = hash_join(side("source_a"), side("source_b"), on="tok",
                       num_partitions=np_ or None)

    def pair_partial(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("source_a"),
                       batch.column("source_b"))
        b = batch.filter(keep)
        t = pa.table({"source_a": b.column("source_a"),
                      "source_b": b.column("source_b"),
                      "inter": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by(["source_a", "source_b"]) \
            .aggregate([("inter", "sum")]) \
            .rename_columns(["source_a", "source_b", "inter"])

    pairs = collect_table(final_merge_sums(
        joined.map_batches(pair_partial, batch_format="pyarrow"),
        ["source_a", "source_b"], ["inter"], np_=np_).materialize())
    if pairs is None or pairs.num_rows == 0:
        return empty
    df = pairs.to_pandas().sort_values(["source_a", "source_b"]) \
        .reset_index(drop=True)
    nmap = dict(zip(sizes.column("source").to_pylist(),
                    sizes.column("n").to_pylist()))
    na = df["source_a"].map(nmap).to_numpy(np.int64)
    nb = df["source_b"].map(nmap).to_numpy(np.int64)
    inter = df["inter"].to_numpy(np.int64)
    uni = na + nb - inter
    return pd.DataFrame({
        "source_a": df["source_a"],
        "source_b": df["source_b"],
        "inter": inter,
        "uni": uni,
        "jaccard": round_half_up(inter * 1.0 / uni, 6)})


SOURCE_OVERLAP_SQL = """
WITH w AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source,
           unnest(list_filter(regexp_split_to_array(trim(text),
                                                    '\\s+'),
                              x -> x <> '')) AS tok
    FROM documents)),
s AS (SELECT source, count(*) AS n FROM w GROUP BY source),
i AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS inter
  FROM w a JOIN w b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(na.n + nb.n - inter AS BIGINT) AS uni,
       round(inter * 1.0 / (na.n + nb.n - inter), 6) AS jaccard
FROM i
JOIN s na ON na.source = source_a
JOIN s nb ON nb.source = source_b
ORDER BY source_a, source_b
"""


HAPAX_RATIO_SQL = """
WITH w AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
c AS (SELECT source, tok, count(*) AS n FROM w GROUP BY source, tok)
SELECT source,
       count(*) AS n_terms,
       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
       round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS hapax_ratio
FROM c GROUP BY source ORDER BY source
"""


CONTAINMENT_TAU = 0.3


def dedup_containment(sf_dir: str):
    """Subset/quote near-dup pairs by shingle containment
    |A∩B| / min(|A|, |B|) >= {tau} over the winnow-fingerprint
    candidates (same blocking as ``dedup_winnow``, so the oracle
    re-derives the candidate set identically and equality checks the
    verify math, not blocking recall) — the asymmetric duplication
    Jaccard structurally misses."""
    return dedup.containment_dedup_pairs(_docs(sf_dir), shingle_k=3,
                                         min_shared=3, max_df=50,
                                         threshold=CONTAINMENT_TAU)


DEDUP_CONTAINMENT_SQL = f"""
WITH wn AS ({WINNOW_SQL}),
wf AS (
  SELECT * FROM wn
  WHERE fp IN (SELECT fp FROM wn GROUP BY fp HAVING count(*) <= 50)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM wf a JOIN wf b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 3
), {_shingle_ctes(3)}, sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.g = b.g
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(coalesce(i.i, 0) * 1.0 / least(na.n, nb.n), 4)
           AS containment
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes na ON na.doc_id = c.doc_a
JOIN sizes nb ON nb.doc_id = c.doc_b
WHERE coalesce(i.i, 0) * 1.0 / least(na.n, nb.n)
      >= {CONTAINMENT_TAU}
ORDER BY c.doc_a, c.doc_b
"""


PMI_K = 25
PMI_MIN_C12 = 5


def corpus_pmi_bigrams(sf_dir: str, np_: int = 0,
                       bound: int = 2_000_000):
    """Top-k collocations by pointwise mutual information with a
    min-count floor — the classic collocation extractor (Church &
    Hanks 1990's association ratio) that count-ranked
    :func:`corpus_top_bigrams` cannot express: PMI surfaces
    *associated* pairs (observed co-occurrence over the independence
    expectation), not merely frequent ones.  Unigram and bigram
    vocabularies reduce through the combiner + bounded-adaptive
    merge; the two scalar masses are distributed sums.  Under
    ``bound`` the c1/c2 attach is one driver searchsorted pair; past
    it nothing broadcasts: w1/w2 split per batch and two token-keyed
    ``hash_join``s attach the unigram counts, the PMI is row-local
    given the scalars, and the global top-k is per-block top-k + a
    K·n_blocks driver re-rank (every global winner tops its own
    block).  Both engines rank the 6dp-ROUNDED pmi (ties break on
    the unique bigram), so the k-cut is cross-engine stable."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "bigram": pd.Series([], dtype="object"),
            "c12": pd.Series([], dtype="int64"),
            "pmi": pd.Series([], dtype="float64")})

    docs = _docs(sf_dir)
    uni_ds = final_merge_sums(
        docs.map_batches(analysis.token_counts, batch_format="pyarrow"),
        ["tok"], ["n"], np_=np_, bound=bound).materialize()
    big_ds = final_merge_sums(
        docs.map_batches(analysis.bigram_counts, batch_format="pyarrow"),
        ["bigram"], ["n"], np_=np_, bound=bound).materialize()
    un, bn = uni_ds.count(), big_ds.count()
    if un == 0 or bn == 0:
        return _empty()
    nt = float(uni_ds.sum("n"))
    nb = float(big_ds.sum("n"))

    def floor_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n"), PMI_MIN_C12))

    big_f = big_ds.map_batches(floor_filter, batch_format="pyarrow")

    if un <= bound and bn <= bound:
        uni = collect_table(uni_ds)
        big = collect_table(big_f.materialize())
        if big is None or big.num_rows == 0:
            return _empty()
        utok = np.array(uni.column("tok").to_pylist(), dtype=object)
        ucnt = uni.column("n").to_numpy().astype(np.float64)
        uorder = np.argsort(utok)
        utok, ucnt = utok[uorder], ucnt[uorder]
        bg = np.array(big.column("bigram").to_pylist(), dtype=object)
        c12 = big.column("n").to_numpy().astype(np.float64)
        # tokens contain no whitespace, so the one-split halves ARE
        # the unigrams
        w1 = np.array([b.split(" ", 1)[0] for b in bg], dtype=object)
        w2 = np.array([b.split(" ", 1)[1] for b in bg], dtype=object)
        c1 = ucnt[np.searchsorted(utok, w1)]
        c2 = ucnt[np.searchsorted(utok, w2)]
        # op order mirrors the SQL: ln((c12/nb) * (nt/c1) * (nt/c2))
        pmi = round_half_up(np.log((c12 / nb) * (nt / c1) * (nt / c2)),
                            6)
        order = np.lexsort((bg, -pmi))[:PMI_K]
        return pd.DataFrame({"bigram": bg[order],
                             "c12": c12[order].astype(np.int64),
                             "pmi": pmi[order]})

    # join fallback: two token-keyed attaches, nothing vocabulary-
    # scale touches the driver
    from cheque_ocr_project_ray.relational.joins import hash_join

    def with_w1(t: pa.Table) -> pa.Table:
        halves = pc.split_pattern(t.column("bigram"), " ", max_splits=1)
        return pa.table({"bigram": t.column("bigram"),
                         "c12": pc.cast(t.column("n"), pa.int64()),
                         "tok": pc.list_element(halves, 0),
                         "w2": pc.list_element(halves, 1)})

    def as_count(name):
        def conv(t: pa.Table) -> pa.Table:
            return pa.table({"tok": t.column("tok"),
                             name: pc.cast(t.column("n"), pa.int64())})
        return conv

    j1 = hash_join(big_f.map_batches(with_w1, batch_format="pyarrow"),
                   uni_ds.map_batches(as_count("c1"),
                                      batch_format="pyarrow"),
                   on="tok", num_partitions=np_ or None)

    def rekey_w2(t: pa.Table) -> pa.Table:
        return pa.table({"bigram": t.column("bigram"),
                         "c12": t.column("c12"),
                         "c1": t.column("c1"),
                         "tok": t.column("w2")})

    j2 = hash_join(j1.map_batches(rekey_w2, batch_format="pyarrow"),
                   uni_ds.map_batches(as_count("c2"),
                                      batch_format="pyarrow"),
                   on="tok", num_partitions=np_ or None)

    def score_topk(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return _empty()
        c12 = b["c12"].to_numpy(np.float64)
        c1 = b["c1"].to_numpy(np.float64)
        c2 = b["c2"].to_numpy(np.float64)
        pmi = round_half_up(np.log((c12 / nb) * (nt / c1) * (nt / c2)),
                            6)
        out = pd.DataFrame({"bigram": b["bigram"],
                            "c12": b["c12"].astype("int64"),
                            "pmi": pmi})
        return out.sort_values(["pmi", "bigram"],
                               ascending=[False, True]).head(PMI_K)

    cand = j2.map_batches(score_topk,
                          batch_format="pandas").materialize()
    ct = collect_table(cand)
    if ct is None or ct.num_rows == 0:
        return _empty()
    df = ct.to_pandas().sort_values(
        ["pmi", "bigram"], ascending=[False, True]).head(PMI_K)
    return pd.DataFrame({"bigram": df["bigram"].to_numpy(),
                         "c12": df["c12"].to_numpy(),
                         "pmi": df["pmi"].to_numpy()})


PMI_BIGRAMS_SQL = f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), w AS (SELECT unnest(toks) AS tok FROM t),
uc AS (SELECT tok, count(*) AS c FROM w GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS nt FROM uc),
b AS (
  SELECT unnest(list_transform(toks[1:len(toks)-1],
                               (x, i) -> x || ' ' || toks[i + 1]))
             AS bigram
  FROM t
), bc AS (SELECT bigram, count(*) AS c12 FROM b GROUP BY bigram),
btot AS (SELECT CAST(sum(c12) AS DOUBLE) AS nb FROM bc),
s AS (
  SELECT bigram, c12,
         round(ln((c12 / nb) * (nt / u1.c) * (nt / u2.c)), 6) AS pmi
  FROM bc, tot, btot
  JOIN uc u1 ON u1.tok = split_part(bc.bigram, ' ', 1)
  JOIN uc u2 ON u2.tok = split_part(bc.bigram, ' ', 2)
  WHERE c12 >= {PMI_MIN_C12}
)
SELECT bigram, CAST(c12 AS BIGINT) AS c12, pmi
FROM s ORDER BY pmi DESC, bigram LIMIT {PMI_K}
"""


BURST_K = 25
BURST_MIN_DF = 5


def corpus_burstiness(sf_dir: str, np_: int = 0,
                      bound: int = 2_000_000):
    """Top-k bursty terms by the Church–Gale variance-to-mean ratio
    of per-document tf among the documents that CONTAIN the term —
    the lexical statistic that separates topical content words (one
    doc mentions them many times) from function words (evenly
    sprinkled), which raw frequency and idf both miss.  Per-term
    (df, Σtf, Σtf²) moments are additive, so they reduce through the
    combiner + bounded-adaptive merge; the VMR is row-local, and the
    global top-k is per-block top-k + a K·n_blocks driver re-rank —
    scale-safe by construction at ANY vocabulary size (no collect of
    the merged table is ever needed).  Both engines rank the
    6dp-ROUNDED vmr (ties break on the unique term)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "tok": pd.Series([], dtype="object"),
            "df": pd.Series([], dtype="int64"),
            "total_tf": pd.Series([], dtype="int64"),
            "vmr": pd.Series([], dtype="float64")})

    def moments(batch: pa.Table) -> pa.Table:
        t = analysis.doc_token_pairs(batch)
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        m = pa.table({"tok": t.column("tok"),
                      "df": pa.array(np.ones(len(t), np.int64)),
                      "s1": pa.array(tf),
                      "s2": pa.array(tf * tf)})
        return m.group_by("tok").aggregate([("df", "sum"),
                                            ("s1", "sum"),
                                            ("s2", "sum")]) \
            .rename_columns(["tok", "df", "s1", "s2"])

    merged = final_merge_sums(
        _docs(sf_dir).map_batches(moments, batch_format="pyarrow"),
        ["tok"], ["df", "s1", "s2"], np_=np_, bound=bound)

    def score_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["df"] >= BURST_MIN_DF]
        if b.empty:
            return _empty()
        df = b["df"].to_numpy(np.float64)
        s1 = b["s1"].to_numpy(np.float64)
        s2 = b["s2"].to_numpy(np.float64)
        # op order mirrors the SQL: (s2/df - (s1/df)*(s1/df)) / (s1/df)
        vmr = round_half_up(
            (s2 / df - (s1 / df) * (s1 / df)) / (s1 / df), 6)
        out = pd.DataFrame({"tok": b["tok"],
                            "df": b["df"].astype("int64"),
                            "total_tf": b["s1"].astype("int64"),
                            "vmr": vmr})
        return out.sort_values(["vmr", "tok"],
                               ascending=[False, True]).head(BURST_K)

    cand = merged.map_batches(score_topk,
                              batch_format="pandas").materialize()
    ct = collect_table(cand)
    if ct is None or ct.num_rows == 0:
        return _empty()
    df = ct.to_pandas().sort_values(
        ["vmr", "tok"], ascending=[False, True]).head(BURST_K)
    return pd.DataFrame({"tok": df["tok"].to_numpy(),
                         "df": df["df"].to_numpy(),
                         "total_tf": df["total_tf"].to_numpy(),
                         "vmr": df["vmr"].to_numpy()})


BURSTINESS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), w AS (
  SELECT doc_id, unnest(toks) AS tok FROM t
), dtf AS (
  SELECT doc_id, tok, count(*) AS tf FROM w GROUP BY doc_id, tok
), c AS (
  SELECT tok, CAST(count(*) AS DOUBLE) AS df,
         CAST(sum(tf) AS DOUBLE) AS s1,
         CAST(sum(tf * tf) AS DOUBLE) AS s2,
         CAST(count(*) AS BIGINT) AS df_i,
         CAST(sum(tf) AS BIGINT) AS s1_i
  FROM dtf GROUP BY tok
)
SELECT tok, df_i AS df, s1_i AS total_tf,
       round((s2 / df - (s1 / df) * (s1 / df)) / (s1 / df), 6) AS vmr
FROM c WHERE df_i >= {BURST_MIN_DF}
ORDER BY vmr DESC, tok LIMIT {BURST_K}
"""


def doc_ttr(sf_dir: str, np_: int = 0):
    """Per-source type-token-ratio profile: each doc's lexical
    diversity (distinct tokens / total tokens over the shared
    whitespace tokenization, ``analysis._prep``), rolled up per source
    as doc count, exact integer token/type sums, the aggregate TTR
    (Σtypes/Σtokens — exact-int ratio), and the mean per-doc TTR —
    the boilerplate-vs-natural-text diagnostic that pairs with
    ``corpus_hapax_ratio`` (which is corpus-grain; this is doc-grain,
    so templated near-identical docs depress it without inflating the
    vocabulary).

    100-TB shape: distinct-per-doc is ROW-LOCAL (a doc is one row),
    so the whole query is one combiner pass — per-batch (source,
    n_docs, Σtokens, Σtypes, Σttr) partials through the
    bounded-adaptive merge; only the sources-bounded grid reaches the
    driver (class a).  The two ratios derive from exact ints; the
    mean per-doc TTR is a float partial sum over the identical
    per-doc expression on both engines (the ``doc_readability``
    convention), 6dp-rounded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    docs = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks, flat, parent = analysis._prep(batch)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_rows = batch.num_rows
        total = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dd = pa.table({"p": pa.array(parent, pa.int64()),
                       "t": flat}).group_by(["p", "t"]).aggregate([])
        types = np.bincount(
            dd.column("p").to_numpy(zero_copy_only=False),
            minlength=n_rows)
        t = pa.table({
            "source": batch.column("source"),
            "n_docs": pa.array(np.ones(n_rows, np.int64)),
            "sum_tokens": pa.array(total, pa.int64()),
            "sum_types": pa.array(types, pa.int64()),
            "sum_ttr": pa.array(types / total.astype(np.float64),
                                pa.float64())})
        return t.group_by("source").aggregate(
            [("n_docs", "sum"), ("sum_tokens", "sum"),
             ("sum_types", "sum"), ("sum_ttr", "sum")]) \
            .rename_columns(["source", "n_docs", "sum_tokens",
                             "sum_types", "sum_ttr"])

    agg = collect_table(final_merge_sums(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "sum_tokens", "sum_types", "sum_ttr"],
        np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "sum_tokens": pd.Series([], dtype="int64"),
            "sum_types": pd.Series([], dtype="int64"),
            "agg_ttr": pd.Series([], dtype="float64"),
            "mean_ttr": pd.Series([], dtype="float64")})
    df = agg.to_pandas().sort_values("source").reset_index(drop=True)
    return pd.DataFrame({
        "source": df["source"],
        "n_docs": df["n_docs"].astype("int64"),
        "sum_tokens": df["sum_tokens"].astype("int64"),
        "sum_types": df["sum_types"].astype("int64"),
        "agg_ttr": round_half_up(
            df["sum_types"].to_numpy(np.float64)
            / df["sum_tokens"].to_numpy(np.float64), 6),
        "mean_ttr": round_half_up(
            df["sum_ttr"].to_numpy(np.float64)
            / df["n_docs"].to_numpy(np.float64), 6)})


DOC_TTR_SQL = r"""
WITH d AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '\s+')) AS total,
         len(list_distinct(
             regexp_split_to_array(trim(text), '\s+'))) AS types
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(total) AS BIGINT) AS sum_tokens,
       CAST(sum(types) AS BIGINT) AS sum_types,
       round(sum(types) / (1.0 * sum(total)), 6) AS agg_ttr,
       round(sum(types / (1.0 * total)) / count(*), 6) AS mean_ttr
FROM d GROUP BY source ORDER BY source
"""


def corpus_word_length_histogram(sf_dir: str, np_: int = 0,
                                 bound: int = 2_000_000):
    """Word-length histogram over the corpus vocabulary: for each
    length, the distinct-word count and the total token mass — the
    subword-budget / tokenizer-fertility profile that pairs with
    ``doc_length_quantiles`` (doc grain) and ``corpus_zipf_slope``
    (rank grain); a long-tail of 20+-char 'words' is a boilerplate /
    URL-noise signal.

    100-TB shape: word counts reduce distributedly through
    ``word_counts`` (combiner + bounded-adaptive merge; distributed
    groupby past ``bound``); the length rollup is a second combiner
    pass over the vocabulary stream (length is row-local) and only
    the length grid (≤ max word length, a domain) reaches the driver
    (class a+b).  All-int output, bit-deterministic; both engines
    share the ``[a-z]+``-on-lowercased-text word definition."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.text.bpe import word_counts
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    wc = word_counts(_docs(sf_dir), np_=np_, bound=bound)

    def len_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table({"wlen": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        t = pa.table({
            "wlen": pc.utf8_length(batch.column("word"))
                      .cast(pa.int64()),
            "n_words": pa.array(np.ones(batch.num_rows, np.int64)),
            "n_tokens": batch.column("n")})
        return t.group_by("wlen").aggregate(
            [("n_words", "sum"), ("n_tokens", "sum")]) \
            .rename_columns(["wlen", "n_words", "n_tokens"])

    agg = collect_table(final_merge_sums(
        wc.map_batches(len_partial, batch_format="pyarrow"),
        ["wlen"], ["n_words", "n_tokens"], np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({"wlen": pd.Series([], dtype="int64"),
                             "n_words": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64")})
    df = agg.to_pandas().sort_values("wlen").reset_index(drop=True)
    return pd.DataFrame({"wlen": df["wlen"].astype("int64"),
                         "n_words": df["n_words"].astype("int64"),
                         "n_tokens": df["n_tokens"].astype("int64")})


CORPUS_WORD_LENGTH_SQL = """
WITH wc AS (
  SELECT word, count(*) AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
    FROM documents)
  GROUP BY word
)
SELECT CAST(length(word) AS BIGINT) AS wlen,
       count(*) AS n_words,
       CAST(sum(n) AS BIGINT) AS n_tokens
FROM wc GROUP BY wlen ORDER BY wlen
"""


def corpus_bigram_entropy(sf_dir: str, np_: int = 0,
                          bound: int = 2_000_000):
    """Corpus conditional bigram entropy H = -Σ (c₂/N)·ln(c₂/c₁) and
    its perplexity — the sequence-predictability scalar behind
    ``doc_bigram_logprob`` (doc grain) and ``corpus_zipf_slope``
    (unigram grain): boilerplate-heavy corpora score low, natural
    prose high, so the drift of this number across snapshots is a
    mixing-regression alarm.

    100-TB shape: unigram and bigram counts reduce through the
    bounded-adaptive merges (distributed groupby past ``bound``); c₁
    then attaches to the DISTRIBUTED bigram table via one token-keyed
    ``hash_join`` (w1 split per batch — the ``doc_bigram_logprob``
    join fallback shape, used unconditionally here since the output
    is one row), the per-row entropy term is row-local given the
    scalar N, and the driver folds n_blocks float partials (class
    a+b).  Both engines spell the identical per-row expression;
    6dp/4dp rounding absorbs only sum-order noise."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    docs = _docs(sf_dir)
    uni_ds = final_merge_sums(
        docs.map_batches(analysis.token_counts, batch_format="pyarrow"),
        ["tok"], ["n"], np_=np_, bound=bound).materialize()
    big_ds = final_merge_sums(
        docs.map_batches(analysis.bigram_counts,
                         batch_format="pyarrow"),
        ["bigram"], ["n"], np_=np_, bound=bound).materialize()
    n_unique = big_ds.count()
    if n_unique == 0 or uni_ds.count() == 0:
        return pd.DataFrame({
            "n_bigrams": pd.Series([], dtype="int64"),
            "n_unique_bigrams": pd.Series([], dtype="int64"),
            "entropy": pd.Series([], dtype="float64"),
            "perplexity": pd.Series([], dtype="float64")})
    n_total = int(big_ds.sum("n"))
    nb = float(n_total)

    def with_w1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "bigram" not in t.column_names:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "c2": pa.array([], pa.int64()),
                             "tok": pa.array([], pa.string())})
        w1 = pc.list_element(
            pc.split_pattern(t.column("bigram"), " ", max_splits=1), 0)
        return pa.table({"bigram": t.column("bigram"),
                         "c2": pc.cast(t.column("n"), pa.int64()),
                         "tok": w1})

    def as_c1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table({"tok": pa.array([], pa.string()),
                             "c1": pa.array([], pa.int64())})
        return pa.table({"tok": t.column("tok"),
                         "c1": pc.cast(t.column("n"), pa.int64())})

    jb = hash_join(big_ds.map_batches(with_w1, batch_format="pyarrow"),
                   uni_ds.map_batches(as_c1, batch_format="pyarrow"),
                   on="tok", num_partitions=np_ or None)

    def ent_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c2" not in t.column_names:
            return pa.table({"s": pa.array([], pa.float64())})
        c2 = t.column("c2").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # per-row op order mirrors the SQL: (c2 / nb) * ln(c2 / c1)
        return pa.table({"s": pa.array(
            [float(np.sum((c2 / nb) * np.log(c2 / c1)))],
            pa.float64())})

    parts = collect_table(
        jb.map_batches(ent_partial, batch_format="pyarrow")
        .materialize())
    s = float(pc.sum(parts.column("s")).as_py()) if parts is not None \
        else 0.0
    entropy = -s
    return pd.DataFrame({
        "n_bigrams": pd.Series([n_total], dtype="int64"),
        "n_unique_bigrams": pd.Series([n_unique], dtype="int64"),
        "entropy": pd.Series([float(round_half_up(entropy, 6))],
                             dtype="float64"),
        "perplexity": pd.Series(
            [float(round_half_up(float(np.exp(entropy)), 4))],
            dtype="float64")})


CORPUS_BIGRAM_ENTROPY_SQL = r"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), w AS (
  SELECT unnest(toks) AS tok FROM t
), uc AS (
  SELECT tok, count(*) AS c1 FROM w GROUP BY tok
), b AS (
  SELECT unnest(list_transform(toks[1:len(toks)-1],
                               (x, i) -> x || ' ' || toks[i + 1]))
             AS bigram
  FROM t
), bc AS (
  SELECT bigram, count(*) AS c2 FROM b GROUP BY bigram
), n AS (
  SELECT CAST(sum(c2) AS DOUBLE) AS nb FROM bc
)
SELECT CAST((SELECT sum(c2) FROM bc) AS BIGINT) AS n_bigrams,
       (SELECT count(*) FROM bc) AS n_unique_bigrams,
       round(-sum((c2 / nb) * ln(c2 / c1)), 6) AS entropy,
       round(exp(-sum((c2 / nb) * ln(c2 / c1))), 4) AS perplexity
FROM bc
JOIN uc ON uc.tok = split_part(bc.bigram, ' ', 1), n
"""


def corpus_lang_source_matrix(sf_dir: str, np_: int = 0):
    """Language × source composition matrix: doc count, exact char
    mass and mean doc length per cell — the corpus-mixing dashboard
    that decides sampling weights before training (a source whose
    'en' cell collapses between snapshots is a crawler regression).

    100-TB shape: pure one-pass combiner — per-batch (lang, source,
    n, Σchars) partials through the bounded-adaptive merge; only the
    |langs| × |sources| grid reaches the driver (class b).  Mean is a
    single division of exact ints on both engines."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)

    docs = ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"),
        columns=["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch.column("lang"),
                      "source": batch.column("source"),
                      "n_docs": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "total_chars": batch.column("n_chars")})
        return t.group_by(["lang", "source"]).aggregate(
            [("n_docs", "sum"), ("total_chars", "sum")]) \
            .rename_columns(["lang", "source", "n_docs",
                             "total_chars"])

    agg = collect_table(final_merge_sums(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang", "source"], ["n_docs", "total_chars"],
        np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({
            "lang": pd.Series([], dtype="object"),
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "total_chars": pd.Series([], dtype="int64"),
            "avg_chars": pd.Series([], dtype="float64")})
    df = agg.to_pandas().sort_values(["lang", "source"]) \
        .reset_index(drop=True)
    return pd.DataFrame({
        "lang": df["lang"], "source": df["source"],
        "n_docs": df["n_docs"].astype("int64"),
        "total_chars": df["total_chars"].astype("int64"),
        "avg_chars": round_half_up(
            df["total_chars"].to_numpy(np.float64)
            / df["n_docs"].to_numpy(np.float64), 4)})


CORPUS_LANG_SOURCE_SQL = """
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(sum(n_chars) / (1.0 * count(*)), 4) AS avg_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def text_queries() -> dict[str, Callable]:
    return {
        "doc_token_stats": doc_token_stats,
        "corpus_bpe_merges": corpus_bpe_merges,
        "corpus_vocab_coverage": corpus_vocab_coverage,
        "doc_quality": doc_quality,
        "doc_repetition": doc_repetition,
        "corpus_top_bigrams": corpus_top_bigrams,
        "doc_pack": doc_pack,
        "doc_lang_id": doc_lang_id,
        "doc_lang_confusion": doc_lang_confusion,
        "dedup_triangles": dedup_triangles,
        "dedup_cluster_sizes": dedup_cluster_sizes,
        "dedup_degree_histogram": dedup_degree_histogram,
        "corpus_dedup_savings": corpus_dedup_savings,
        "doc_fingerprint": doc_fingerprint,
        "doc_bpe_tokens": doc_bpe_tokens,
        "doc_split": doc_split,
        "doc_winnow": doc_winnow,
        "doc_main_content": doc_main_content,
        "doc_redact": doc_redact,
        "doc_tfidf_topk": doc_tfidf_topk,
        "doc_postings": doc_postings,
        "doc_decontam": doc_decontam,
        "dedup_winnow": dedup_winnow,
        "dedup_exact": dedup_exact,
        "dedup_prefix": dedup_prefix,
        "dedup_minhash": dedup_minhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_components": dedup_components,
        "dedup_canonical": dedup_canonical,
        "dedup_incremental": dedup_incremental,
        "doc_char_entropy": doc_char_entropy,
        "doc_readability": doc_readability,
        "doc_length_quantiles": doc_length_quantiles,
        "doc_ttr": doc_ttr,
        "corpus_word_length_histogram": corpus_word_length_histogram,
        "corpus_bigram_entropy": corpus_bigram_entropy,
        "corpus_lang_source_matrix": corpus_lang_source_matrix,
        "doc_tfidf_pairs": doc_tfidf_pairs,
        "doc_ngram_novelty": doc_ngram_novelty,
        "doc_quality_percentile": doc_quality_percentile,
        "doc_simhash": doc_simhash,
        "dedup_simhash": dedup_simhash,
        "corpus_curation": corpus_curation,
        "corpus_pipeline": corpus_pipeline,
        "doc_chunk": doc_chunk,
        "doc_segment_dedup": doc_segment_dedup,
        "doc_unigram_logprob": doc_unigram_logprob,
        "doc_quality_score": doc_quality_score,
        "corpus_mix_sample": corpus_mix_sample,
        "doc_keyword_search": doc_keyword_search,
        "source_token_budget": source_token_budget,
        "doc_source_dup_rate": doc_source_dup_rate,
        "doc_bigram_logprob": doc_bigram_logprob,
        "doc_bm25_topk": doc_bm25_topk,
        "doc_hybrid_search": doc_hybrid_search,
        "doc_code_score": doc_code_score,
        "doc_source_jsd": doc_source_jsd,
        "doc_quality_filter_p75": doc_quality_filter_p75,
        "doc_feature_hashing": doc_feature_hashing,
        "doc_hash_similarity": doc_hash_similarity,
        "corpus_zipf_slope": corpus_zipf_slope,
        "corpus_hapax_ratio": corpus_hapax_ratio,
        "corpus_pmi_bigrams": corpus_pmi_bigrams,
        "corpus_burstiness": corpus_burstiness,
        "dedup_containment": dedup_containment,
        "corpus_source_overlap": corpus_source_overlap,
        "doc_charset_profile": doc_charset_profile,
        "corpus_stopword_discovery": corpus_stopword_discovery,
    }


def text_oracle_sql() -> dict[str, str]:
    return {
        "doc_token_stats": TOKEN_STATS_SQL,
        "corpus_vocab_coverage": CORPUS_VOCAB_COVERAGE_SQL,
        "doc_quality": QUALITY_SQL,
        "doc_repetition": REPETITION_SQL,
        "corpus_top_bigrams": TOP_BIGRAMS_SQL,
        "doc_pack": PACK_SQL,
        "doc_lang_id": LANG_ID_SQL,
        "doc_lang_confusion": LANG_CONFUSION_SQL,
        "dedup_triangles": _triangles_sql(),
        "dedup_cluster_sizes": CLUSTER_SIZES_SQL,
        "dedup_degree_histogram": DEGREE_HISTOGRAM_SQL,
        "corpus_dedup_savings": DEDUP_SAVINGS_SQL,
        "doc_fingerprint": FINGERPRINT_SQL,
        "doc_bpe_tokens": BPE_TOKENS_SQL,
        "doc_split": SPLIT_SQL,
        "doc_winnow": WINNOW_SQL,
        "doc_main_content": MAIN_CONTENT_SQL,
        "doc_redact": REDACT_SQL,
        "doc_tfidf_topk": TFIDF_SQL,
        "doc_postings": POSTINGS_SQL,
        "doc_decontam": DECONTAM_SQL,
        "dedup_winnow": DEDUP_WINNOW_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "dedup_prefix": DEDUP_PREFIX_SQL,
        "corpus_curation": CURATION_SQL,
        "corpus_pipeline": CORPUS_PIPELINE_SQL,
        "dedup_minhash": _jaccard_pairs_sql(k=3, threshold=0.6),
        "dedup_ngram_jaccard": _jaccard_pairs_sql(k=2, threshold=0.5),
        "dedup_components": _components_sql(k=2, threshold=0.5),
        "dedup_canonical": _dedup_canonical_sql(),
        "dedup_incremental": DEDUP_INCREMENTAL_SQL,
        "doc_char_entropy": CHAR_ENTROPY_SQL,
        "doc_readability": DOC_READABILITY_SQL,
        "doc_length_quantiles": DOC_LENGTH_QUANTILES_SQL,
        "doc_ttr": DOC_TTR_SQL,
        "corpus_word_length_histogram": CORPUS_WORD_LENGTH_SQL,
        "corpus_bigram_entropy": CORPUS_BIGRAM_ENTROPY_SQL,
        "corpus_lang_source_matrix": CORPUS_LANG_SOURCE_SQL,
        "doc_tfidf_pairs": TFIDF_PAIRS_SQL,
        "doc_ngram_novelty": _ngram_novelty_sql(),
        "doc_simhash": doc_simhash_sql(),
        "dedup_simhash": dedup_simhash_sql(max_hamming=3),
        "doc_chunk": CHUNK_SQL,
        "doc_segment_dedup": SEGMENT_DEDUP_SQL,
        "doc_unigram_logprob": UNIGRAM_LOGPROB_SQL,
        "doc_quality_score": QUALITY_SCORE_SQL,
        "corpus_mix_sample": MIX_SAMPLE_SQL,
        "doc_keyword_search": KEYWORD_SEARCH_SQL,
        "source_token_budget": SOURCE_BUDGET_SQL,
        "doc_source_dup_rate": SOURCE_DUP_RATE_SQL,
        "doc_bigram_logprob": BIGRAM_LOGPROB_SQL,
        "doc_bm25_topk": BM25_TOPK_SQL,
        "doc_hybrid_search": HYBRID_SEARCH_SQL,
        "doc_code_score": CODE_SCORE_SQL,
        "doc_source_jsd": SOURCE_JSD_SQL,
        "doc_feature_hashing": FEATURE_HASHING_SQL,
        "doc_hash_similarity": HASH_SIMILARITY_SQL,
        "corpus_zipf_slope": ZIPF_SLOPE_SQL,
        "corpus_hapax_ratio": HAPAX_RATIO_SQL,
        "corpus_pmi_bigrams": PMI_BIGRAMS_SQL,
        "corpus_burstiness": BURSTINESS_SQL,
        "dedup_containment": DEDUP_CONTAINMENT_SQL,
        "corpus_source_overlap": SOURCE_OVERLAP_SQL,
        "doc_charset_profile": CHARSET_PROFILE_SQL,
        "corpus_stopword_discovery": STOPWORD_DISCOVERY_SQL,
        "doc_quality_filter_p75": QUALITY_FILTER_P75_SQL.format(
            QUALITY=QUALITY_SQL, W0=analysis.QUALITY_W[0],
            W1=analysis.QUALITY_W[1], W2=analysis.QUALITY_W[2],
            W3=analysis.QUALITY_W[3]),
        "doc_quality_percentile": QUALITY_PERCENTILE_SQL.format(
            QUALITY=QUALITY_SQL, W0=analysis.QUALITY_W[0],
            W1=analysis.QUALITY_W[1], W2=analysis.QUALITY_W[2],
            W3=analysis.QUALITY_W[3]),
    }
