"""Driver-facing text queries over the ``documents`` table, with
DuckDB oracles where SQL can express the same deterministic rule.

MinHash/SimHash/Jaccard entries are genuinely non-SQL-expressible
(seeded hash families) → rows-only checks, as the contract allows.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import ray.data

from cheque_ocr_project_ray.text import analysis, dedup


def _docs(sf_dir: str):
    return ray.data.read_parquet(str(Path(sf_dir) / "documents.parquet"),
                                 columns=["doc_id", "text"])


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


def doc_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.lang_id,
                                     batch_format="pyarrow")


LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), hits AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN ('the', 'a', 'of')))  AS en,
         len(list_filter(toks, x -> x IN ('el', 'la', 'los'))) AS es,
         len(list_filter(toks, x -> x IN ('le', 'les', 'des'))) AS fr
  FROM t
)
SELECT doc_id,
       CASE WHEN en = 0 AND es = 0 AND fr = 0 THEN 'und'
            WHEN en >= es AND en >= fr THEN 'en'
            WHEN es >= fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM hits
"""


def doc_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(analysis.fingerprint,
                                     batch_format="pyarrow")


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


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


def dedup_minhash(sf_dir: str):
    return dedup.minhash_dedup_pairs(_docs(sf_dir), threshold=0.6)


def dedup_ngram_jaccard(sf_dir: str):
    return dedup.ngram_jaccard_pairs(_docs(sf_dir), shingle_k=2,
                                     threshold=0.5)


def doc_simhash(sf_dir: str):
    return dedup.simhash_docs(_docs(sf_dir))


def dedup_simhash(sf_dir: str):
    return dedup.simhash_near_pairs(_docs(sf_dir), max_hamming=3)


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


def text_queries() -> dict[str, Callable]:
    return {
        "doc_token_stats": doc_token_stats,
        "doc_quality": doc_quality,
        "doc_lang_id": doc_lang_id,
        "doc_fingerprint": doc_fingerprint,
        "dedup_exact": dedup_exact,
        "dedup_prefix": dedup_prefix,
        "dedup_minhash": dedup_minhash,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "doc_simhash": doc_simhash,
        "dedup_simhash": dedup_simhash,
        "corpus_curation": corpus_curation,
    }


def text_oracle_sql() -> dict[str, str]:
    return {
        "doc_token_stats": TOKEN_STATS_SQL,
        "doc_quality": QUALITY_SQL,
        "doc_lang_id": LANG_ID_SQL,
        "doc_fingerprint": FINGERPRINT_SQL,
        "dedup_exact": DEDUP_EXACT_SQL,
        "dedup_prefix": DEDUP_PREFIX_SQL,
        "corpus_curation": CURATION_SQL,
        # dedup_minhash / dedup_ngram_jaccard / doc_simhash: seeded
        # hash families — not SQL-expressible → rows-only checks.
    }
