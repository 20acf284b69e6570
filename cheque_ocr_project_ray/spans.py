"""Span-level operators over the interleaved text+media table.

The corpus rows are (doc_id, spans:list<struct<kind,text,media_ref,
offset>>) — the BASELINE.json input_hint shape.  Downstream tooling
constantly needs the two span-native primitives:

- ``explode_spans``: one row per span, document id carried along
  (the relational view of an interleaved document — filter/join/group
  at span granularity).  Vectorized: ``pyarrow.compute.list_flatten``
  + ``list_parent_indices``; no per-row python.
- ``span_stats``: per-document span-composition stats (text vs image
  counts, text length) — pure Arrow kernels per batch, no shuffle.

Both carry DuckDB oracles (``unnest`` over the same parquet), so the
engine's nested-type semantics are driver-verified, not just assumed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans").combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    return pa.table({
        "doc_id": pc.take(batch.column("doc_id"), parent),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    })


def span_stats_batch(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans").combine_chunks()
    n = len(batch)
    parent = pc.list_parent_indices(spans).to_numpy()
    flat = pc.list_flatten(spans)
    import numpy as np

    is_text = pc.equal(flat.field("kind"), "text").to_numpy(
        zero_copy_only=False)
    text_len = pc.utf8_length(flat.field("text")).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)

    n_spans = np.bincount(parent, minlength=n).astype("int64")
    n_text = np.bincount(parent, weights=is_text.astype("float64"),
                         minlength=n).astype("int64")
    text_chars = np.bincount(parent, weights=text_len.astype("float64"),
                             minlength=n).astype("int64")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_spans": pa.array(n_spans, pa.int64()),
        "n_text_spans": pa.array(n_text, pa.int64()),
        "n_image_spans": pa.array(n_spans - n_text, pa.int64()),
        "text_chars": pa.array(text_chars, pa.int64()),
    })


def explode_spans(cheques_ds):
    return cheques_ds.map_batches(explode_spans_batch,
                                  batch_format="pyarrow")


def span_stats(cheques_ds):
    return cheques_ds.map_batches(span_stats_batch, batch_format="pyarrow")


def assemble_spans(flat_ds):
    """Inverse of :func:`explode_spans`: span rows → one document row
    per doc_id with the span list rebuilt in offset order.

    Shape: groupby(doc_id).map_groups — the partitioning assumption is
    one document's spans fit one group (they do by construction; a
    10^12-doc corpus has bounded spans per doc, and doc_id hashing
    spreads groups evenly)."""
    import pandas as pd

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("offset")
        spans = [{"kind": k, "text": t, "media_ref": r, "offset": int(o)}
                 for k, t, r, o in zip(g["kind"], g["text"],
                                       g["media_ref"], g["offset"])]
        return pd.DataFrame({"doc_id": [g["doc_id"].iloc[0]],
                             "spans": [spans]})

    return flat_ds.groupby("doc_id").map_groups(rebuild,
                                                batch_format="pandas")


def spans_json_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) → (doc_id, spans_json) canonical serialization
    (same format as fixtures.expected.spans_to_json)."""
    from cheque_ocr_project_ray.fixtures.expected import spans_to_json

    return pa.table({
        "doc_id": batch.column("doc_id"),
        "spans_json": pa.array(
            [spans_to_json(s) for s in batch.column("spans").to_pylist()],
            pa.string()),
    })


def span_roundtrip_sql(cheques_glob: str) -> str:
    """Canonical spans_json straight from the raw table — the oracle
    for explode→reassemble: a lossless round trip must reproduce
    exactly this serialization.  The JSON escaping chain (backslash
    then quote) mirrors json.dumps for the corpus's character set
    (ASCII, no control characters — generated fixture invariant)."""
    # chr()-based escape expression avoids SQL-literal backslash pain;
    # a doc with spans == [] has no unnested rows and drops from BOTH
    # sides of the round trip (consistent by construction)
    def e(col: str) -> str:
        return ("replace(replace(" + col +
                ", chr(92), chr(92) || chr(92)), chr(34), "
                "chr(92) || chr(34))")
    return f"""
SELECT doc_id,
       '[' || string_agg(
           '["' || {e('s.kind')} || '","' || {e('s.text')} || '","' ||
           {e('s.media_ref')} || '",' || s."offset" || ']',
           ',' ORDER BY s."offset") || ']' AS spans_json
FROM (SELECT doc_id, unnest(spans) AS s
      FROM read_parquet('{cheques_glob}'))
GROUP BY doc_id
"""


def span_explode_sql(cheques_glob: str) -> str:
    return f"""
SELECT doc_id, s.kind AS kind, s.text AS text,
       s.media_ref AS media_ref, s."offset" AS "offset"
FROM (SELECT doc_id, unnest(spans) AS s
      FROM read_parquet('{cheques_glob}'))
"""


def span_stats_sql(cheques_glob: str) -> str:
    # LEFT JOIN back to the doc list: a doc with spans == [] has no
    # unnested rows but the engine still emits its all-zero stats row
    return f"""
WITH g AS (
  SELECT doc_id,
         count(*) AS n_spans,
         CAST(sum(CASE WHEN s.kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text_spans,
         CAST(sum(CASE WHEN s.kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_image_spans,
         CAST(sum(CASE WHEN s.kind = 'text' THEN length(s.text) ELSE 0 END)
              AS BIGINT) AS text_chars
  FROM (SELECT doc_id, unnest(spans) AS s
        FROM read_parquet('{cheques_glob}'))
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(g.n_spans, 0) AS n_spans,
       coalesce(g.n_text_spans, 0) AS n_text_spans,
       coalesce(g.n_image_spans, 0) AS n_image_spans,
       coalesce(g.text_chars, 0) AS text_chars
FROM read_parquet('{cheques_glob}') d LEFT JOIN g USING (doc_id)
"""
