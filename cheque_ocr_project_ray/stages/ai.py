"""AI-ensemble scoring stage (A2/A3 — ai_processor.py's EP3 flow).

A plain batch function, not an actor pool: the ensemble stand-in is
pure regex/dict work with module-level compiled state, so there is
nothing to pin per actor (the reference pins BERT/T5/BART weights —
its analogue of this engine's OcrStage media store).  Docs whose OCR
failed are dropped, mirroring ``AIWriter.write_batch``'s "only write
successful ones" (ai_processor.py:471-477).
"""

from __future__ import annotations

import pyarrow as pa

from cheque_ocr_project_ray.functions.ensemble import process_cheque_ai


def ai_ensemble_batch(batch: pa.Table) -> pa.Table:
    """OcrStage output batch → one AI-scored row per successful doc."""
    full_texts = batch.column("full_text").to_pylist()
    confs = batch.column("ocr_confs").to_pylist()
    errors = batch.column("ocr_error").to_pylist() \
        if "ocr_error" in batch.column_names else [False] * len(full_texts)

    doc_ids = batch.column("doc_id").to_pylist()
    rows: list[dict] = []
    keep_ids: list[str] = []
    for doc_id, ft, lc, err in zip(doc_ids, full_texts, confs, errors):
        if err:
            continue
        # identical float-op order to oracle.extract_fields' mean — the
        # expected table stores the same value as `confidence`
        ocr_conf = sum(lc) / len(lc) if lc else 0.0
        r = process_cheque_ai(ft, ocr_conf)
        r["ocr_confidence"] = ocr_conf
        rows.append(r)
        keep_ids.append(doc_id)

    def col(name, typ):
        return pa.array([r[name] for r in rows], typ)

    return pa.table({
        "doc_id": pa.array(keep_ids, pa.string()),
        "payee_ai": col("payee_ai", pa.string()),
        "payee_conf_ai": col("payee_conf_ai", pa.float64()),
        "payee_method": col("payee_method", pa.string()),
        "issuer_ai": col("issuer_ai", pa.string()),
        "issuer_conf_ai": col("issuer_conf_ai", pa.float64()),
        "issuer_method": col("issuer_method", pa.string()),
        "overall_conf_ai": col("overall_conf_ai", pa.float64()),
        "ocr_confidence": col("ocr_confidence", pa.float64()),
    })
