"""OCR actor-pool stage (SURVEY.md §2.3 A1 → actor pool).

``OcrStage`` is a callable class passed to ``map_batches(OcrStage,
concurrency=N, batch_size=B, batch_format="pyarrow")``: the media
store client (the stand-in for pinned model weights) is built once per
actor in ``__init__``; ``__call__`` handles one Arrow batch.

Replaces the reference's per-200-image engine re-init memory hack
(``issuer_processor_v.py:622-629``) with Ray actor lifecycle + the
store's LRU bound.

Per batch:
  1. gather media_refs from image spans → one batched, bucket-grouped
     fetch (no shuffle; the store is content-addressed)
  2. decode each payload → ordered (text, conf) OCR lines; burn the
     deterministic inference cost (media.simulate_inference)
  3. assemble full_text + flattened OCR line columns per document in
     span order (oracle.assemble_document semantics, vectorized at the
     batch level)

Output adds: full_text, ocr_texts/ocr_confs/ocr_srcs (parallel lists),
media_bytes (per-doc payload size — the skew/lineage metric).
"""

from __future__ import annotations

import pyarrow as pa

from cheque_ocr_project_ray.media import decode_image, preprocess_meta, simulate_inference
from cheque_ocr_project_ray.sources.io import MediaStore


class OcrStage:
    def __init__(self, media_dir: str, work_passes: int = 12,
                 target_long_side: int = 1200, max_buckets: int = 4):
        self.store = MediaStore(media_dir, max_buckets=max_buckets)
        self.work_passes = work_passes
        self.target_long_side = target_long_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()

        # 1. one batched fetch for every image span in the batch
        refs = [s["media_ref"]
                for spans in spans_col for s in spans if s["kind"] == "image"]
        payloads = self.store.get_many(refs)

        # 2. decode once per distinct ref; burn proportional compute.
        # A failed decode poisons its documents (per-row ERROR
        # semantics, oracle.error_fields) — never the task.
        decoded: dict[str, list] = {}
        failed: set[str] = set()
        for ref, payload in payloads.items():
            if payload is None:  # ref missing from the media store
                failed.add(ref)
                decoded[ref] = []
                continue
            try:
                lines, w, h = decode_image(payload)
            except Exception:
                # ANY malformed payload (bad magic → ValueError, but a
                # truncated header raises struct.error and a wrong JSON
                # shape KeyError/TypeError) must poison only its rows —
                # the per-row ERROR contract, never the task
                failed.add(ref)
                decoded[ref] = []
                continue
            preprocess_meta(payload, w, h, self.target_long_side)
            simulate_inference(payload, self.work_passes)
            decoded[ref] = lines

        # 3. per-document assembly in span order
        full_texts: list[str] = []
        ocr_texts: list[list[str]] = []
        ocr_confs: list[list[float]] = []
        ocr_srcs: list[list[str]] = []
        media_bytes: list[int] = []
        ocr_errors: list[bool] = []
        for spans in spans_col:
            parts: list[str] = []
            texts: list[str] = []
            confs: list[float] = []
            srcs: list[str] = []
            nbytes = 0
            doc_failed = False
            for span in sorted(spans, key=lambda s: s["offset"]):
                if span["kind"] == "text":
                    if span["text"]:
                        parts.append(span["text"])
                elif span["kind"] == "image":
                    ref = span["media_ref"]
                    nbytes += len(payloads[ref] or b"")
                    if ref in failed:
                        doc_failed = True
                    for text, conf in decoded[ref]:
                        parts.append(text)
                        texts.append(text)
                        confs.append(float(conf))
                        srcs.append(ref)
            full_texts.append(" ".join(parts))
            ocr_texts.append(texts)
            ocr_confs.append(confs)
            ocr_srcs.append(srcs)
            media_bytes.append(nbytes)
            ocr_errors.append(doc_failed)

        # deterministic per-doc processing-cost surface (G3): the exact
        # quantity simulate_inference burns, in ms — the engine's
        # stand-in for the reference's per-cheque wall-clock time_ms
        # (fast_ai_processor.py:286-293), SQL-re-derivable from
        # media_bytes × work_passes
        cost_ms = [b * self.work_passes / 1000.0 for b in media_bytes]

        return pa.table({
            "doc_id": batch.column("doc_id"),
            "full_text": pa.array(full_texts, pa.string()),
            "ocr_texts": pa.array(ocr_texts, pa.list_(pa.string())),
            "ocr_confs": pa.array(ocr_confs, pa.list_(pa.float64())),
            "ocr_srcs": pa.array(ocr_srcs, pa.list_(pa.string())),
            "media_bytes": pa.array(media_bytes, pa.int64()),
            "cost_ms": pa.array(cost_ms, pa.float64()),
            "ocr_error": pa.array(ocr_errors, pa.bool_()),
        })
