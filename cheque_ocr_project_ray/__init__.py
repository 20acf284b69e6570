"""cheque_ocr_project_ray — a Ray-Data-native cheque field-extraction engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference ``mjitdevelopers/cheque-ocr-project``:
streaming `ray.data.Dataset` pipelines of ``map_batches`` over
zero-copy Arrow batches, actor pools for the stateful OCR stage,
explicit doc_id-hash partitioning, per-partition checkpoint/lineage,
and a per-row span-sequence-equality contract against a row-at-a-time
oracle (``cheque_ocr_project_ray.oracle``).

Layout:
  functions/   pure per-row semantic operators (M8-M24 in SURVEY.md §2)
  fixtures/    deterministic Lance-shaped synthetic corpus generator
  sources/     readers/writers (parquet stand-in for the Lance table)
  stages/      map_batches stages (decode, OCR actor pool, extraction)
  pipelines/   end-to-end pipeline assembly + metrics
  state/       broadcast state (drawer dict) + checkpoint/resume
  text/        large-scale text ops (dedup, lang-id, quality, tokens)
  vector/      embedding similarity search (brute-force + LSH-bucketed)
  multimodal/  binary-column image plumbing (decode stage stubs)
  relational/  relational pipelines over the TPC-H-ish test tables
"""

__version__ = "0.1.0"
