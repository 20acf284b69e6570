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
    # mask by kind='text' and null-fill, like the SQL oracle: an image
    # span with non-empty (or null) text must not count toward
    # text_chars on an external corpus (the generated fixture happens
    # to guarantee text=='' on image spans; don't rely on it)
    text_len = pc.fill_null(
        pc.utf8_length(flat.field("text")).cast(pa.int64()), 0) \
        .to_numpy(zero_copy_only=False)

    n_spans = np.bincount(parent, minlength=n).astype("int64")
    n_text = np.bincount(parent, weights=is_text.astype("float64"),
                         minlength=n).astype("int64")
    text_chars = np.bincount(
        parent, weights=text_len.astype("float64") * is_text,
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


def _hash_part_batch(batch: pa.Table, num_groups: int) -> pa.Table:
    """Append ``part = crc32(doc_id) % num_groups`` — the same stable
    hash the checkpoint partitioner uses.  Hashing runs over the
    batch's UNIQUE doc_ids (dictionary encode), not per row."""
    import zlib
    import numpy as np

    batch = batch.combine_chunks()
    col = batch.column("doc_id")
    darr = col.chunk(0) if col.num_chunks else pa.array([], type=col.type)
    enc = darr.dictionary_encode()
    uniq_hash = np.array(
        [zlib.crc32(u.encode("utf-8")) % num_groups
         for u in enc.dictionary.to_pylist()], np.int64)
    codes = enc.indices.to_numpy(zero_copy_only=False)
    part = uniq_hash[codes] if len(codes) else np.array([], np.int64)
    return batch.append_column("part", pa.array(part, pa.int64()))


def _rebuild_group(group: pa.Table) -> pa.Table:
    """Vectorized within-group span-list reassembly — the exact inverse
    of :func:`explode_spans_batch`: sort by (doc_id, offset), find run
    boundaries, rebuild the list column with ``ListArray.from_arrays``
    over the sorted struct rows.  No per-document dispatch, no pandas."""
    import numpy as np

    group = group.drop_columns(["part"])
    if group.num_rows == 0:
        return group  # schemaless empty groups are dropped downstream
    idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending"),
                                            ("offset", "ascending")])
    t = group.take(idx).combine_chunks()

    def arr(name):
        c = t.column(name)
        return c.chunk(0) if c.num_chunks else pa.array([], type=c.type)

    codes = arr("doc_id").dictionary_encode().indices.to_numpy(
        zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, np.diff(codes) != 0])
    offsets = np.append(starts, len(codes)).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [arr("kind"), arr("text"), arr("media_ref"), arr("offset")],
        names=["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table({"doc_id": arr("doc_id").take(pa.array(starts)),
                     "spans": spans})


def assemble_spans(flat_ds, num_groups: int | None = None):
    """Inverse of :func:`explode_spans`: span rows → one document row
    per doc_id with the span list rebuilt in offset order.

    Shape: hash-repartition by ``crc32(doc_id) % num_groups`` (ONE
    bounded-cardinality groupby — group dispatch cost is num_groups ×
    ~50 µs, not one dispatch per document) followed by a fully
    vectorized within-group reassembly (Arrow sort + run-boundary
    ``ListArray.from_arrays``).  Partitioning assumption (documented):
    all spans of one doc hash to one group by construction, and
    total_rows / num_groups must fit a worker's heap — size
    ``num_groups`` to the corpus when calling at scale (default:
    cluster shuffle parallelism)."""
    from cheque_ocr_project_ray.util import shuffle_partitions

    p = num_groups or max(shuffle_partitions(), 8)
    return flat_ds.map_batches(
        lambda b: _hash_part_batch(b, p), batch_format="pyarrow") \
        .groupby("part").map_groups(_rebuild_group, batch_format="pyarrow")


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
