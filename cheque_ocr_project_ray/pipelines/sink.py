"""Final sinks: metadata join-back + DBF-equivalent output table
(SURVEY.md §2.1 K3/K4, §2.4 J1, §7.3 milestone 5).

The reference writes results three ways per cheque: append to an
output DBF (``issuer_processor_v.py:578-591``), update the original
master DBF by a per-image linear scan (``:552-576`` — O(N·M)), and
append a CSV row (``:653-656``).  Here all three collapse into ONE
join of the results dataset to the metadata table on ``doc_id``
followed by a projection that applies the reference's truncation
semantics; the master-table "update" becomes an output column set
(``drawer_nm_new``/``opr_no``/``file_mark``) instead of an in-place
mutation.

Join strategy mirrors §2.4: the metadata side is broadcast when small
(one object-store copy, zero shuffle); at corpus scale pass
``broadcast=False`` for Ray Data's native hash-partitioned join.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

from cheque_ocr_project_ray.relational.joins import broadcast_join, hash_join
from cheque_ocr_project_ray.util import round_half_up_arrow
from cheque_ocr_project_ray.sources.io import read_meta

# Output-DBF field widths (issuer_processor_v.py:186-190): IMAGE_FILE
# C(50); DRAWER_NM C(100); OPR_NO C(20); CONFIDENCE N(6,4); STATUS
# C(20).  Master-update truncation DRAWER_NM[:50] (:562) and constants
# OPR_NO='AS601', FILE_MARK=False (:569-571).
_TRUNC = {"image_file": 50, "drawer_nm_out": 100, "status": 20,
          "drawer_nm_new": 50}
_OPR_NO = "AS601"


def join_results_to_meta(results_ds, fixture_dir: str | Path,
                         broadcast: bool = True):
    """Results ⨝ metadata on doc_id (J1) with DBF-width projection.

    LEFT join: a processed doc with no metadata row (possible for
    ingest corpora whose manifest was partial before the meta table
    covered every file; defensive for any external corpus) still gets
    its output row — the reference appends an output-DBF row for every
    processed cheque — with the metadata columns empty.
    """
    meta_cols = ["doc_id", "account", "sort_code", "amount", "image_file",
                 "drawer_nm", "file_mark"]
    results = results_ds.select_columns([
        "doc_id", "issuer", "issuer_conf", "confidence", "status",
        "cheque_type"])
    if broadcast:
        import pyarrow.parquet as pq
        small = pq.read_table(str(Path(fixture_dir) / "meta"),
                              columns=meta_cols)
        joined = broadcast_join(results, small, on="doc_id",
                                how="left outer")
    else:
        joined = hash_join(results, read_meta(fixture_dir, meta_cols),
                           on="doc_id", how="left")

    def project(batch: pa.Table) -> pa.Table:
        def trunc(col, width):
            return pc.utf8_slice_codeunits(col, 0, width)

        # unmatched meta side → typed blanks (DBF empty-field semantics)
        def meta_s(name):
            return pc.fill_null(batch[name], "")

        image_file = pc.fill_null(
            batch["image_file"],
            # reconstruct a name from the doc id when meta is absent
            pc.binary_join_element_wise(
                batch["doc_id"],
                pa.array(["tiff"] * batch.num_rows), "."))
        file_mark = pc.fill_null(batch["file_mark"], False)

        accepted = pc.equal(batch["status"], "AUTO-UPDATED")
        out = pa.table({
            "doc_id": batch["doc_id"],
            # K3 output-DBF row
            "image_file": trunc(image_file, _TRUNC["image_file"]),
            "drawer_nm_out": trunc(batch["issuer"],
                                   _TRUNC["drawer_nm_out"]),
            # round_half_up (DuckDB round() semantics): the driver's
            # final-join oracle re-derives this column in SQL, and
            # pc.round's half-to-even diverges on exact halves
            "confidence": round_half_up_arrow(batch["issuer_conf"], 4),
            "status": trunc(batch["status"], _TRUNC["status"]),
            # K4 master-table update columns (applied only when the
            # status ladder accepted the issuer, as the reference gates
            # the DBF write on validation)
            "drawer_nm_new": pc.if_else(
                accepted, trunc(batch["issuer"], _TRUNC["drawer_nm_new"]),
                trunc(meta_s("drawer_nm"), _TRUNC["drawer_nm_new"])),
            "opr_no": pc.if_else(accepted, _OPR_NO, ""),
            # reference clears FILE_MARK on update; untouched rows keep
            # their master-table value (issuer_processor_v.py:571)
            "file_mark": pc.if_else(
                accepted, pa.scalar(False), file_mark),
            # carried metadata for the bank CSV export (custom_csv.py)
            "account": meta_s("account"),
            "sort_code": meta_s("sort_code"),
            "amount": batch["amount"],
            "cheque_type": batch["cheque_type"],
        })
        return out

    return joined.map_batches(project, batch_format="pyarrow")


def write_final(results_ds, fixture_dir: str | Path, out_dir: str | Path,
                broadcast: bool = True) -> None:
    """Join-back + partitioned parquet write (resumable layout is the
    checkpoint module's job; this is the terminal export)."""
    final = join_results_to_meta(results_ds, fixture_dir, broadcast)
    final.write_parquet(str(out_dir))


def to_canonical_csv(results_ds, fixture_dir: str | Path | None = None):
    """Project results to the reference's canonical 12-column CSV
    schema (``csv_handler.py:23-36``) for human export via
    ``.write_csv``.  PROCESS_DATE/TIME are data-derived placeholders
    (the reference stamps wall-clock; a distributed run stamps at the
    driver if needed) so output stays deterministic.

    Pass ``fixture_dir`` to report the REAL on-disk filename from the
    metadata table (ingest accepts jpg/png too); without it the name
    is reconstructed as ``<doc_id>.tiff``."""

    if fixture_dir is not None:
        import pyarrow.parquet as pq
        names = pq.read_table(str(Path(fixture_dir) / "meta"),
                              columns=["doc_id", "image_file"])
        results_ds = broadcast_join(results_ds, names, on="doc_id",
                                    how="left outer")

    def project(batch: pa.Table) -> pa.Table:
        empty = pa.nulls(batch.num_rows, pa.string())
        fallback = pc.binary_join_element_wise(
            batch["doc_id"], pa.array(["tiff"] * batch.num_rows), ".")
        filename = pc.fill_null(batch["image_file"], fallback) \
            if "image_file" in batch.column_names else fallback
        return pa.table({
            "IMAGE_ID": batch["doc_id"],
            "FILENAME": filename,
            "CHEQUE_TYPE": batch["cheque_type"],
            "IS_GOVERNMENT": batch["is_government"],
            "GOVT_CATEGORY": batch["govt_category"],
            "PAYEE_RAW": batch["payee_raw"],
            "PAYEE_CLEANED": batch["payee"],
            "CONFIDENCE": round_half_up_arrow(batch["confidence"], 4),
            "PROCESS_DATE": empty,
            "PROCESS_TIME_MS": pa.nulls(batch.num_rows, pa.float64()),
            "STATUS": batch["status"],
            "ERROR_MESSAGE": empty,
        })

    return results_ds.map_batches(project, batch_format="pyarrow")


def write_csv_export(results_ds, out_dir: str | Path,
                     fixture_dir: str | Path | None = None) -> None:
    """Human-inspection CSV export (K1) — parquet remains the real sink."""
    to_canonical_csv(results_ds, fixture_dir).write_csv(str(out_dir))


def to_bank_csv(results_ds, fixture_dir: str | Path,
                include_doc_id: bool = False):
    """The 7-column bank CSV format (K2, ``custom_csv.py:48-81``):
    ``payee, date, account, reference, sort_code, amount, filename``.

    Per the reference: payee = the cleaned payee ('XXX' fallback is the
    engine's own sentinel, already in the column); date/account/amount
    are the M23 filename regexes (the missing-date fallback is '' — the
    deterministic deviation documented in functions/filename_fields);
    reference and sort_code are the literal "0" constants the reference
    writes (custom_csv.py:61-62 — NOT the metadata columns); only
    successful docs are written (write_batch keeps ``success`` rows).

    ``include_doc_id`` adds the id for driver comparison; the exported
    file format is the exact 7 reference columns.
    """
    import pyarrow.parquet as pq

    from cheque_ocr_project_ray.functions.filename_fields import (
        filename_fields_batch)

    names = pq.read_table(str(Path(fixture_dir) / "meta"),
                          columns=["doc_id", "image_file"])
    ok = results_ds.filter(expr="status != 'ERROR'") \
        .select_columns(["doc_id", "payee"])
    joined = broadcast_join(ok, names, on="doc_id", how="left outer")

    def project(batch: pa.Table) -> pa.Table:
        fallback = pc.binary_join_element_wise(
            batch["doc_id"], pa.array(["tiff"] * batch.num_rows), ".")
        filename = pc.fill_null(batch["image_file"], fallback)
        derived = filename_fields_batch(pa.table({
            "doc_id": batch["doc_id"], "image_file": filename}))
        zeros = pa.array(["0"] * batch.num_rows, pa.string())
        cols = {
            "payee": batch["payee"],
            "date": derived["date"],
            "account": derived["account"],
            "reference": zeros,
            "sort_code": zeros,
            "amount": derived["amount"],
            "filename": filename,
        }
        if include_doc_id:
            cols = {"doc_id": batch["doc_id"], **cols}
        return pa.table(cols)

    return joined.map_batches(project, batch_format="pyarrow")


def to_issuer_dbf(results_ds, fixture_dir: str | Path,
                  real_procdt: bool = False):
    """The second output-DBF schema (``parallel_processor.py:186-213``):
    ``ISSUER C(100); FNAME C(50); CONFID N(5,2); PROCDT C(19)``.

    Reference semantics preserved: successful docs only (:279), issuer
    fallback "UNKNOWN" (:293-294 — the engine's XXX sentinel maps to
    it), ISSUER[:100] / FNAME C(50) truncation, CONFID = OCR mean
    confidence rounded to 2 (N(5,2)).  PROCDT is ``datetime.now()`` in
    the reference (``parallel_processor.py:191``) — deterministically
    '' here by default (same deviation as the canonical CSV's
    PROCESS_DATE) so the oracle hash stays stable; pass
    ``real_procdt=True`` to stamp the reference's
    ``strftime('%Y-%m-%d %H:%M:%S')`` wall-clock format (captured ONCE
    on the driver at build time so every row of a run carries one
    consistent stamp — the distributed analogue of the reference's
    per-row ``now()``).  The reference's per-filename dedup guard
    (:198-201) is subsumed by unique doc_ids.
    """
    import pyarrow.parquet as pq

    if real_procdt:
        from datetime import datetime
        procdt_stamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    else:
        procdt_stamp = ""
    names = pq.read_table(str(Path(fixture_dir) / "meta"),
                          columns=["doc_id", "image_file"])
    ok = results_ds.filter(expr="status != 'ERROR'") \
        .select_columns(["doc_id", "issuer", "confidence"])
    joined = broadcast_join(ok, names, on="doc_id", how="left outer")

    def project(batch: pa.Table) -> pa.Table:
        fallback = pc.binary_join_element_wise(
            batch["doc_id"], pa.array(["tiff"] * batch.num_rows), ".")
        filename = pc.fill_null(batch["image_file"], fallback)
        issuer = pc.if_else(pc.equal(batch["issuer"], "XXX"),
                            "UNKNOWN", batch["issuer"])
        return pa.table({
            "doc_id": batch["doc_id"],
            "issuer_out": pc.utf8_slice_codeunits(issuer, 0, 100),
            "fname": pc.utf8_slice_codeunits(filename, 0, 50),
            "confid": round_half_up_arrow(batch["confidence"], 2),
            "procdt": pa.array([procdt_stamp] * batch.num_rows,
                               pa.string()),
        })

    return joined.map_batches(project, batch_format="pyarrow")
