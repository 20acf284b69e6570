"""Field-extraction actor-pool stage (SURVEY.md §2.2 M8-M24 composed).

A callable class: the broadcast drawer dictionary (SURVEY.md §2.4 J2 —
small side shipped via ``ray.put``, NOT a shuffle join) and the
per-actor fuzzy-match memo cache (§2.3 A5) are bound once in
``__init__``; ``__call__`` applies ``oracle.extract_fields`` — the
exact code path the oracle uses — to every row of an Arrow batch and
emits the fixed-order ``spans_out`` sequence plus flat field columns.

The per-row body is Python because the semantics are a per-row regex
cascade with early exits (the reference's contract); the heavy lifting
(media bytes, OCR decode) happened upstream, and columns stay Arrow
end-to-end.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from cheque_ocr_project_ray.oracle import (
    error_fields,
    extract_fields,
    fields_to_spans,
)


def _spans_as_dicts(fields: dict) -> list[dict]:
    """The oracle's span assembly, in Arrow-dict form — ONE source of
    truth for field order / refs (oracle.fields_to_spans)."""
    return [{"kind": k, "text": t, "media_ref": r, "offset": o}
            for k, t, r, o in fields_to_spans(fields)]

SPANS_OUT_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))


class FieldExtractStage:
    def __init__(self, drawer_ref, threshold: float = 0.90,
                 status_ladder: str = "v1"):
        # drawer_ref: ray.ObjectRef of the sorted drawer dictionary, or
        # a plain list when called outside Ray (unit tests).
        if isinstance(drawer_ref, ray.ObjectRef):
            self.drawer_dict = ray.get(drawer_ref)
        else:
            self.drawer_dict = drawer_ref
        self.threshold = threshold
        self.status_ladder = status_ladder
        self.match_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        full_texts = batch.column("full_text").to_pylist()
        texts = batch.column("ocr_texts").to_pylist()
        confs = batch.column("ocr_confs").to_pylist()
        srcs = batch.column("ocr_srcs").to_pylist()

        errors = batch.column("ocr_error").to_pylist() \
            if "ocr_error" in batch.column_names else [False] * len(full_texts)

        rows = []
        spans_out = []
        for ft, lt, lc, ls, err in zip(full_texts, texts, confs, srcs, errors):
            if err:
                # undecodable media → deterministic ERROR row (matches
                # oracle.reference_extract's except path)
                f = error_fields()
            else:
                f = extract_fields(ft, list(zip(lt, lc, ls)),
                                   self.drawer_dict,
                                   threshold=self.threshold,
                                   match_cache=self.match_cache,
                                   status_ladder=self.status_ladder)
            rows.append(f)
            spans_out.append(_spans_as_dicts(f))

        def col(name, typ):
            return pa.array([r[name] for r in rows], typ)

        return pa.table({
            "doc_id": batch.column("doc_id"),
            "spans_out": pa.array(spans_out, SPANS_OUT_TYPE),
            "cheque_type": col("cheque_type", pa.string()),
            "is_government": col("is_government", pa.bool_()),
            "govt_category": col("govt_category", pa.string()),
            "payee_raw": col("payee_raw", pa.string()),
            "payee": col("payee", pa.string()),
            "issuer": col("issuer", pa.string()),
            "issuer_conf": col("issuer_conf", pa.float64()),
            "confidence": col("confidence", pa.float64()),
            "status": col("status", pa.string()),
            "micr": col("micr", pa.string()),
            "amount": col("amount", pa.string()),
            "date": col("date", pa.string()),
            "media_bytes": batch.column("media_bytes"),
            "cost_ms": batch.column("cost_ms"),
        })
