"""Sequentially-materialized oracle outputs for the cheque corpus.

The cheque extraction semantics (regex cascade + fuzzy dictionary
resolve, SURVEY.md §2.2) are not SQL-expressible, so the driver's
DuckDB gate cannot re-derive them from the raw corpus.  What it CAN do
is compare the Ray pipeline against an INDEPENDENTLY EXECUTED
materialization of the row-at-a-time oracle (``oracle.py`` — the same
sequential composition the pytest span-equality suite trusts, itself
anchored to the reference by ``tools/parity_audit.py``'s byte-parity
tables).

This module runs that oracle with NO Ray involvement — a plain Python
loop over the fixture parquet, sequential media decode, per-doc
``extract_fields`` — and writes ``expected/expected.parquet`` under
the fixture dir.  The cheque-family ``oracle_sql()`` entries are then
real SQL over this table (aggregations, joins to the meta table,
projections), so a green CORRECTNESS row states: the distributed
composition (skew-split reads, OCR actor pools, unions, broadcast
joins, checkpointed writes) reproduces the sequential oracle
row-for-row AND the SQL-side derivation of every aggregate matches.

What this does NOT claim: that ``extract_fields`` itself is correct —
that is the parity audit's and the unit tables' job
(``tests/test_oracle_units.py``).  The docstring states this honestly
so the two verification layers aren't conflated.

Caching: keyed by (FIXTURE_VERSION, EXPECTED_VERSION, thresholds);
bump EXPECTED_VERSION whenever oracle semantics or this table's
derived columns change.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from cheque_ocr_project_ray.fixtures.gen import FIXTURE_VERSION
from cheque_ocr_project_ray.functions.ensemble import process_cheque_ai
from cheque_ocr_project_ray.functions.spelling import correct_spelling
from cheque_ocr_project_ray.media import decode_image
from cheque_ocr_project_ray.oracle import (
    assemble_document,
    error_fields,
    extract_fields,
    fields_to_spans,
)
from cheque_ocr_project_ray.state.drawer_dict import build_drawer_dict

EXPECTED_VERSION = 3  # v3: + AI-ensemble columns (functions/ensemble.py)
# Must mirror the driver-query configs: cheque_* queries run
# DEFAULT_CONFIG (v1, threshold .90); the v3 variant runs .85
# (IssuerBatchProcessorV3.py:519 default).
V1_THRESHOLD = 0.90
V3_THRESHOLD = 0.85

EXPECTED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("cheque_type", pa.string()),
    ("is_government", pa.bool_()),
    ("govt_category", pa.string()),
    ("payee_raw", pa.string()),
    ("payee", pa.string()),
    ("issuer", pa.string()),
    ("issuer_conf", pa.float64()),
    ("confidence", pa.float64()),
    ("status", pa.string()),
    ("micr", pa.string()),
    ("amount", pa.string()),
    ("date", pa.string()),
    ("media_bytes", pa.int64()),
    ("spans_json", pa.string()),
    ("status_v3", pa.string()),
    ("issuer_v3", pa.string()),
    ("issuer_conf_v3", pa.float64()),
    ("issuer_fixed", pa.string()),
    # AI-ensemble columns (functions/ensemble.py; '' / 0.0 on ERROR
    # rows — the AI query drops failed docs like AIWriter does)
    ("payee_ai", pa.string()),
    ("payee_conf_ai", pa.float64()),
    ("payee_method", pa.string()),
    ("issuer_ai", pa.string()),
    ("issuer_conf_ai", pa.float64()),
    ("issuer_method", pa.string()),
    ("overall_conf_ai", pa.float64()),
])


def spans_to_json(spans) -> str:
    """Canonical JSON for a span sequence — the ONE serialization both
    the Ray ``cheque_spans_json`` query and this table use, so the
    driver's hash compares span VALUES, not formatting accidents.

    Accepts ``(kind, text, media_ref, offset)`` tuples or the Arrow
    struct-dict form.
    """
    rows = []
    for s in spans:
        if isinstance(s, dict):
            rows.append([s["kind"], s["text"], s["media_ref"],
                         int(s["offset"])])
        else:
            k, t, r, o = s
            rows.append([k, t, r, int(o)])
    return json.dumps(rows, ensure_ascii=False, separators=(",", ":"))


def _media_decoder(fixture_dir: Path):
    """media_ref → ordered OCR line list, decoding each payload at most
    once (sequential stand-in for the OCR stage's bucket-LRU store)."""
    payloads: dict[str, bytes] = {}
    for f in sorted((fixture_dir / "media").rglob("*.parquet")):
        t = pq.read_table(f, columns=["media_ref", "data"])
        for ref, data in zip(t.column("media_ref").to_pylist(),
                             t.column("data").to_pylist()):
            payloads[ref] = data
    cache: dict[str, list] = {}

    def lookup(ref: str):
        if ref not in cache:
            lines, _w, _h = decode_image(payloads[ref])  # raises on corrupt
            cache[ref] = lines
        return cache[ref]

    return lookup


def _semantic_core_digest() -> str:
    """Hash of the source files that define the oracle semantics —
    part of the cache key so a semantic change regenerates the
    expected table AUTOMATICALLY (a stale table would silently turn
    the driver's cheque oracles into comparisons against old
    semantics; EXPECTED_VERSION remains for layout changes)."""
    import hashlib

    root = Path(__file__).resolve().parent.parent
    files = sorted([root / "oracle.py", root / "media.py",
                    root / "state" / "drawer_dict.py",   # dict semantics
                    Path(__file__).resolve(),            # this generator
                    *(root / "functions").glob("*.py")])
    h = hashlib.sha256()
    for f in files:
        h.update(f.name.encode())
        h.update(f.read_bytes())
    return h.hexdigest()[:16]


def generate_expected(fixture_dir: str | Path) -> Path:
    fixture_dir = Path(fixture_dir)
    out_dir = fixture_dir / "expected"
    manifest_path = out_dir / "_EXPECTED_MANIFEST.json"
    key = {"fixture_version": FIXTURE_VERSION,
           "expected_version": EXPECTED_VERSION,
           "v1_threshold": V1_THRESHOLD, "v3_threshold": V3_THRESHOLD,
           "semantic_core": _semantic_core_digest()}
    if manifest_path.exists():
        try:
            if json.loads(manifest_path.read_text()) == key:
                return out_dir
        except (ValueError, OSError):
            pass

    lookup = _media_decoder(fixture_dir)
    drawer_dict = build_drawer_dict(fixture_dir)
    cache_v1: dict = {}
    cache_v3: dict = {}

    rows: list[dict] = []
    for f in sorted((fixture_dir / "cheques").glob("*.parquet")):
        t = pq.read_table(f)
        for doc in t.to_pylist():
            ai = {"payee_ai": "", "payee_conf_ai": 0.0,
                  "payee_method": "", "issuer_ai": "",
                  "issuer_conf_ai": 0.0, "issuer_method": "",
                  "overall_conf_ai": 0.0}
            try:
                full_text, ocr_lines = assemble_document(doc["spans"], lookup)
            except Exception:
                # same per-row poisoning contract as OcrStage: ANY
                # undecodable media span → deterministic ERROR row
                f1 = error_fields()
                f3 = error_fields()
            else:
                f1 = extract_fields(full_text, ocr_lines, drawer_dict,
                                    threshold=V1_THRESHOLD,
                                    match_cache=cache_v1,
                                    status_ladder="v1")
                f3 = extract_fields(full_text, ocr_lines, drawer_dict,
                                    threshold=V3_THRESHOLD,
                                    match_cache=cache_v3,
                                    status_ladder="v3")
                ai = process_cheque_ai(full_text, f1["confidence"])
            rows.append({
                "doc_id": doc["doc_id"],
                "cheque_type": f1["cheque_type"],
                "is_government": f1["is_government"],
                "govt_category": f1["govt_category"],
                "payee_raw": f1["payee_raw"],
                "payee": f1["payee"],
                "issuer": f1["issuer"],
                "issuer_conf": f1["issuer_conf"],
                "confidence": f1["confidence"],
                "status": f1["status"],
                "micr": f1["micr"],
                "amount": f1["amount"],
                "date": f1["date"],
                "media_bytes": doc["media_bytes"],
                "spans_json": spans_to_json(fields_to_spans(f1)),
                "status_v3": f3["status"],
                "issuer_v3": f3["issuer"],
                "issuer_conf_v3": f3["issuer_conf"],
                "issuer_fixed": correct_spelling(f1["issuer"]),
                **ai,
            })

    out_dir.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=EXPECTED_SCHEMA),
                   out_dir / "expected.parquet")
    manifest_path.write_text(json.dumps(key))
    return out_dir


def ensure_expected(sf_dir: str) -> Path:
    """Expected table for an sf tier (generates the fixture too if
    needed); returns the directory holding ``expected.parquet``."""
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    return generate_expected(ensure_fixture(sf_dir))
