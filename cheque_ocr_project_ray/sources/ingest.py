"""Ingest: raw image directory + batch manifest → the Lance-shaped
span table (SURVEY.md §2.1 S1/S6 — how a reference user's existing
inputs enter this engine).

The reference's job input is a directory of TIFFs plus a CSV-ish
manifest (``F_23022026_010/23022026.txt``: date,account,inst_no,
sort_code,amount,filename) and a master DBF.  Here:

    ray.data.read_binary_files(image_dir)      # distributed listing+read
      → map_batches(build_rows)                # doc_id from stem,
                                               #   spans, media_bytes
      → write_parquet(out/cheques)             # fragment-per-block

Media is NOT copied or re-bucketed: spans carry ``file:<path>`` refs
and ``MediaStore`` reads them in place — at 100 TB, re-shuffling image
bytes through an ingest job would double the I/O for nothing.  The
manifest (small) is broadcast and joined batch-local into the metadata
side table.

S1 semantics preserved: the reference's extension filter
(``run_production.py:24-33`` — tif/tiff/jpg/jpeg/png, case-insensitive)
and sorted order (deterministic doc ordering for ``--limit``).
"""

from __future__ import annotations

import csv
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

IMAGE_EXTS = {".tif", ".tiff", ".jpg", ".jpeg", ".png"}

MANIFEST_FIELDS = ("date", "account", "inst_no", "sort_code", "amount",
                   "filename")


def read_manifest(manifest_path: str | Path) -> dict[str, dict]:
    """Manifest rows keyed by lower-cased filename stem (join key J1)."""
    rows: dict[str, dict] = {}
    with open(manifest_path, newline="") as f:
        for rec in csv.reader(f):
            if len(rec) < len(MANIFEST_FIELDS):
                continue
            row = dict(zip(MANIFEST_FIELDS, (c.strip() for c in rec)))
            stem = Path(row["filename"]).stem.lower()
            rows[stem] = row
    return rows


def ingest_directory(image_dir: str | Path, out_dir: str | Path,
                     manifest_path: str | Path | None = None) -> Path:
    """Build ``out_dir/cheques`` (+ ``meta`` if a manifest is given)
    from a directory of images.  Returns ``out_dir``.

    Each image becomes one doc: an image span (``file:`` ref) plus,
    when the manifest knows the file, text spans for the manifest's
    date/amount zones (the zone text the reference reads from the
    manifest rather than OCR).
    """
    image_dir = Path(image_dir).resolve()
    out_dir = Path(out_dir)
    (out_dir / "cheques").mkdir(parents=True, exist_ok=True)

    manifest = read_manifest(manifest_path) if manifest_path else {}
    manifest_ref = ray.put(manifest)

    files = ray.data.read_binary_files(str(image_dir), include_paths=True)

    class _BuildRows:
        def __init__(self):
            self.manifest = ray.get(manifest_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_ids, spans_col, media_bytes = [], [], []
            for path, data in zip(batch.column("path").to_pylist(),
                                  batch.column("bytes").to_pylist()):
                p = Path(path)
                if p.suffix.lower() not in IMAGE_EXTS:
                    continue
                doc_id = p.stem
                row = self.manifest.get(doc_id.lower())
                spans = []
                offset = 0
                if row:
                    # manifest dates are DDMMYYYY; the date zone the
                    # extractor parses uses separators (custom_csv.py
                    # date format)
                    d = row["date"]
                    if len(d) == 8 and d.isdigit():
                        d = f"{d[:2]}/{d[2:4]}/{d[4:]}"
                    spans.append({"kind": "text",
                                  "text": f"Date: {d}",
                                  "media_ref": "", "offset": offset})
                    offset += 1
                    spans.append({"kind": "text",
                                  "text": f"RS. {row['amount']}",
                                  "media_ref": "", "offset": offset})
                    offset += 1
                spans.append({"kind": "image", "text": "",
                              "media_ref": f"file:{path}",
                              "offset": offset})
                doc_ids.append(doc_id)
                spans_col.append(spans)
                media_bytes.append(len(data))
            from cheque_ocr_project_ray.fixtures.gen import SPAN_TYPE
            return pa.table({
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": pa.array(spans_col, SPAN_TYPE),
                "media_bytes": pa.array(media_bytes, pa.int64()),
            })

    files.map_batches(_BuildRows, batch_format="pyarrow", batch_size=64,
                      concurrency=(1, 4)) \
        .write_parquet(str(out_dir / "cheques"))

    if manifest:
        (out_dir / "meta").mkdir(parents=True, exist_ok=True)
        meta_rows = [{
            "doc_id": Path(r["filename"]).stem,
            "date": r["date"],
            "account": r["account"],
            "inst_no": r["inst_no"],
            "sort_code": r["sort_code"],
            "amount": float(r["amount"] or 0),
            "image_file": r["filename"],
            "file_mark": False,
            "file_name": r["filename"],
            "drawer_nm": "",
            "cat_code": 0,
            "opr_no": "",
        } for r in manifest.values()]
        pq.write_table(pa.Table.from_pylist(meta_rows),
                       out_dir / "meta" / "meta.parquet")
    return out_dir
