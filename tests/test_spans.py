"""Span-level operators: explode/stats (unit forms covered in
test_text_ops) and the explode→assemble lossless round trip."""

import pyarrow as pa

import ray.data

from cheque_ocr_project_ray import spans as sp
from cheque_ocr_project_ray.fixtures.expected import spans_to_json


def _doc(doc_id, span_tuples):
    return {"doc_id": doc_id,
            "spans": [{"kind": k, "text": t, "media_ref": r, "offset": o}
                      for k, t, r, o in span_tuples]}


def test_explode_assemble_roundtrip_lossless():
    docs = [
        _doc("a", [("text", "hello", "", 0), ("image", "", "m1", 1)]),
        # adversarial text: quotes, backslash, unicode — the engine
        # round trip must be byte-lossless regardless of corpus
        _doc("b", [("text", 'say "hi" \\ twice', "", 0),
                   ("text", "café ≠ cafe", "", 2),
                   ("image", "", "m2", 1)]),
        _doc("c", [("text", "only one", "", 5)]),
    ]
    ds = ray.data.from_items(docs)
    flat = sp.explode_spans(ds)
    back = sp.assemble_spans(flat).map_batches(sp.spans_json_batch,
                                               batch_format="pyarrow")
    got = dict(zip(back.to_pandas()["doc_id"],
                   back.to_pandas()["spans_json"]))
    for d in docs:
        # the round trip canonicalizes to offset order (the semantic
        # span order; matches the SQL oracle's ORDER BY "offset")
        canonical = sorted(d["spans"], key=lambda s: s["offset"])
        assert got[d["doc_id"]] == spans_to_json(canonical), d["doc_id"]


def test_explode_preserves_row_multiplicity():
    docs = [_doc("x", [("text", "t", "", 0)] )] * 1
    flat = sp.explode_spans(ray.data.from_items(docs)).to_pandas()
    assert len(flat) == 1
    assert flat.iloc[0]["kind"] == "text"
