"""Text analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All are vectorized ``map_batches`` stages over the
``documents`` table; each has a DuckDB-expressible twin in
``text/queries.py`` so the driver's correctness gate covers them.

These are engine capabilities beyond the reference's own inventory
(per the build brief): at 10^12 docs each stage is a stateless
streaming map — no shuffle, no materialization.
"""

from __future__ import annotations

import hashlib

import pandas as pd

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


def _tokens(batch: pd.DataFrame) -> pd.Series:
    """Tokenize matching the SQL twin's ``regexp_split_to_array(trim(
    text), '\\s+')`` semantics: an empty/whitespace-only text yields
    the single empty token [''] (NOT []), so ratio denominators are
    never zero and both engines agree on empty docs."""
    return batch["text"].map(lambda t: t.split() or [""])


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    toks = _tokens(batch)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": toks.str.len().astype("int64"),
        "n_chars": batch["text"].str.len().astype("int64"),
    })


def quality_counts(batch: pd.DataFrame) -> pd.DataFrame:
    toks = _tokens(batch)
    n_tokens = toks.str.len().astype("int64")
    stop_hits = toks.map(
        lambda ws: sum(w in STOPWORDS for w in ws)).astype("int64")
    distinct = toks.map(lambda ws: len(set(ws))).astype("int64")
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": n_tokens,
        "stop_hits": stop_hits,
        "distinct_tokens": distinct,
        "stop_ratio": round_half_up(stop_hits / n_tokens, 4),
        "ttr": round_half_up(distinct / n_tokens, 4),  # type-token ratio
    })


def lang_id(batch: pd.DataFrame) -> pd.DataFrame:
    toks = _tokens(batch)

    def predict(ws) -> str:
        hits = {lang: sum(w in markers for w in ws)
                for lang, markers in LANG_MARKERS.items()}
        best = max(LANG_PRIORITY, key=lambda l: (hits[l], -LANG_PRIORITY.index(l)))
        return best if hits[best] > 0 else "und"

    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "pred_lang": toks.map(predict),
    })


def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "fp": batch["text"].map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()),
    })
