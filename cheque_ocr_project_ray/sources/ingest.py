"""Ingest: raw image directory + batch manifest → the Lance-shaped
span table (SURVEY.md §2.1 S1/S6 — how a reference user's existing
inputs enter this engine).

The reference's job input is a directory of TIFFs plus a CSV-ish
manifest (``F_23022026_010/23022026.txt``: date,account,inst_no,
sort_code,amount,filename) and a master DBF.  Here:

    filesystem listing (metadata only — names + sizes, NO byte reads)
      → ray.data.from_items(file records)
      → map_batches(build_rows)              # doc_id from stem,
                                             #   spans, media_bytes
      → write_parquet(out/cheques)           # fragment-per-block

Media is NOT copied, re-bucketed, or even READ at ingest time: spans
carry ``file:<path>`` refs and ``MediaStore`` reads them lazily at OCR
time; ``media_bytes`` (the skew hint) comes from listing metadata.  At
100 TB, pulling image bytes through an ingest job would double the
corpus I/O for nothing.  The manifest (small) is broadcast and joined
batch-local; the metadata side table is always written (empty when no
manifest) so downstream join-back and drawer-dict builds work.

S1 semantics preserved: the reference's extension filter
(``run_production.py:24-33`` — tif/tiff/jpg/jpeg/png, case-insensitive)
and sorted order (deterministic doc ordering for ``--limit``).
Re-running into the same ``out_dir`` replaces the previous fragments
(idempotent), never appends duplicates.
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

META_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("date", pa.string()),
    ("account", pa.string()), ("inst_no", pa.string()),
    ("sort_code", pa.string()), ("amount", pa.float64()),
    ("image_file", pa.string()), ("file_mark", pa.bool_()),
    ("file_name", pa.string()), ("drawer_nm", pa.string()),
    ("cat_code", pa.int64()), ("opr_no", pa.string()),
])


def read_manifest(manifest_path: str | Path) -> dict[str, dict]:
    """Manifest rows keyed by lower-cased filename stem (join key J1).

    Rows whose amount field doesn't parse as a number (headers,
    comma-shifted records) are skipped rather than crashing the job.
    """
    rows: dict[str, dict] = {}
    with open(manifest_path, newline="") as f:
        for rec in csv.reader(f):
            if len(rec) < len(MANIFEST_FIELDS):
                continue
            row = dict(zip(MANIFEST_FIELDS, (c.strip() for c in rec)))
            try:
                float(row["amount"] or 0)
            except ValueError:
                continue
            stem = Path(row["filename"]).stem.lower()
            rows[stem] = row
    return rows


def _list_images(image_dir: Path) -> list[dict]:
    """Sorted (path, size) records from filesystem METADATA — no file
    contents are read; size feeds the media_bytes skew hint."""
    from pyarrow import fs as pafs
    local = pafs.LocalFileSystem()
    infos = local.get_file_info(
        pafs.FileSelector(str(image_dir), recursive=True))
    out = []
    for info in infos:
        if info.type != pafs.FileType.File:
            continue
        p = Path(info.path)
        if p.suffix.lower() in IMAGE_EXTS:
            out.append({"path": str(p), "size": int(info.size)})
    return sorted(out, key=lambda r: r["path"])


def ingest_directory(image_dir: str | Path, out_dir: str | Path,
                     manifest_path: str | Path | None = None) -> Path:
    """Build ``out_dir/cheques`` + ``out_dir/meta`` from a directory of
    images.  Returns ``out_dir``.

    Each image becomes one doc: an image span (``file:`` ref) plus,
    when the manifest knows the file, text spans for the manifest's
    date/amount zones (the zone text the reference reads from the
    manifest rather than OCR).
    """
    image_dir = Path(image_dir).resolve()
    out_dir = Path(out_dir)
    cheques_dir = out_dir / "cheques"
    cheques_dir.mkdir(parents=True, exist_ok=True)
    for stale in cheques_dir.glob("*.parquet"):
        stale.unlink()  # idempotent re-run: replace, never append

    manifest = read_manifest(manifest_path) if manifest_path else {}
    manifest_ref = ray.put(manifest)

    listed = _list_images(image_dir)
    # stems shared by several files (scan1.tif + scan1.png, or the
    # same name in two subdirectories of the recursive listing) would
    # give colliding doc_ids and one file's results would be dropped
    # by the replay-dedup guard — disambiguate those docs by their
    # dir-relative path (slashes flattened), which is unique by
    # construction; plain stems stay the common-case doc_id
    from collections import Counter
    stem_counts = Counter(Path(r["path"]).stem for r in listed)
    dup_stems = frozenset(s for s, n in stem_counts.items() if n > 1)
    dup_ref = ray.put(dup_stems)
    root_str = str(image_dir)

    def doc_id_for(path: str, dups) -> str:
        p = Path(path)
        if p.stem not in dups:
            return p.stem
        rel = str(Path(path).resolve())
        if rel.startswith(root_str):
            rel = rel[len(root_str):].lstrip("/\\")
        return rel.replace("/", "__").replace("\\", "__")

    files = ray.data.from_items(listed)

    class _BuildRows:
        def __init__(self):
            self.manifest = ray.get(manifest_ref)
            self.dups = ray.get(dup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_ids, spans_col, media_bytes = [], [], []
            for path, size in zip(batch.column("path").to_pylist(),
                                  batch.column("size").to_pylist()):
                doc_id = doc_id_for(path, self.dups)
                row = self.manifest.get(Path(path).stem.lower())
                spans = []
                offset = 0
                if row:
                    # manifest dates are DDMMYYYY; the date zone the
                    # extractor parses uses separators (custom_csv.py
                    # date format)
                    d = row["date"]
                    if len(d) == 8 and d.isdigit():
                        d = f"{d[:2]}/{d[2:4]}/{d[4:]}"
                    spans.append({"kind": "text", "text": f"Date: {d}",
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
                media_bytes.append(size)
            from cheque_ocr_project_ray.fixtures.gen import SPAN_TYPE
            return pa.table({
                "doc_id": pa.array(doc_ids, pa.string()),
                "spans": pa.array(spans_col, SPAN_TYPE),
                "media_bytes": pa.array(media_bytes, pa.int64()),
            })

    from cheque_ocr_project_ray.util import map_pool
    files.map_batches(_BuildRows, batch_format="pyarrow", batch_size=256,
                      concurrency=(1, map_pool())) \
        .write_parquet(str(cheques_dir))

    # metadata side table — ALWAYS written, with a row for EVERY listed
    # file (the reference's master DBF has one row per cheque; a row
    # absent from the manifest still gets its on-disk filename so the
    # final join-back never silently drops a processed doc).  doc_id
    # uses the ON-DISK naming (same rule as the cheques table) so the
    # J1 join key always matches.
    (out_dir / "meta").mkdir(parents=True, exist_ok=True)
    meta_rows = []
    for rec in listed:
        p = Path(rec["path"])
        row = manifest.get(p.stem.lower()) or {}
        meta_rows.append({
            "doc_id": doc_id_for(rec["path"], dup_stems),
            "date": row.get("date", ""),
            "account": row.get("account", ""),
            "inst_no": row.get("inst_no", ""),
            "sort_code": row.get("sort_code", ""),
            "amount": float(row.get("amount") or 0),
            "image_file": row.get("filename", p.name),
            "file_mark": False,
            "file_name": row.get("filename", p.name),
            "drawer_nm": "",
            "cat_code": 0,
            "opr_no": "",
        })
    pq.write_table(pa.Table.from_pylist(meta_rows, schema=META_SCHEMA),
                   out_dir / "meta" / "meta.parquet")
    return out_dir
