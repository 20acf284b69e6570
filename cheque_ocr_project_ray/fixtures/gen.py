"""Deterministic Lance-shaped synthetic cheque corpus (FIXTURES.md §1-3).

Every row is a pure function of ``(seed, doc_index)`` so any tier is
reproducible and any partition independently regenerable.  The layout
mirrors a Lance dataset logically (fragment-per-file Parquet with the
exact input_hint schema) — see SURVEY.md preamble for why Parquet
stands in for Lance in this sandbox.

Tables written under the tier directory:
  cheques/part-NNNNN.parquet   (doc_id:string,
                                spans:list<struct<kind,text,media_ref,offset>>)
  meta/meta.parquet            DBF-mirror side table (FIXTURES.md §2)
  media/bucket=BBB/data.parquet  content-addressed media store
                                (media_ref, data:binary, width, height)
  _MANIFEST.json               {seed, n_docs, version} cache key

Content generators cover every semantic branch of the reference (the
FIXTURES.md §1 checklist): titles/suffixes/&-payees, government
categories I/II/III, DD/MC/crossed/SELF markers, MICR triplets,
FOR/F/O/PROP issuer lines, junk/garbage/bank lines, OCR-confusable
digits, fuzzy near-misses of drawer-dictionary names, empty docs, and
oversized media for the skew path.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from cheque_ocr_project_ray.media import encode_image

FIXTURE_VERSION = 8  # v8: no_text docs can have truly EMPTY spans
DEFAULT_SEED = 42
FIXTURE_ROOT = Path("/tmp/cheque_ray_fixtures")

# sf tier → corpus size (FIXTURES.md §5 tiers, scaled for this sandbox)
TIER_DOCS = {"sf0.001": 600, "sf0.01": 4000, "sf0.1": 16000}

SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

CHEQUES_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", SPAN_TYPE),
    # per-doc media payload size — the stored skew-routing hint
    # (SURVEY.md §7.3: the routing key is generated with the table
    # so the pipeline can split the read by predicate pushdown
    # instead of re-scanning and filtering)
    ("media_bytes", pa.int64()),
])

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("data", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

_FIRST = [
    "RAJESH", "SUNIL", "ANITA", "VIKRAM", "POOJA", "AMIT", "SUNITA",
    "RAHUL", "DEEPAK", "KAVITA", "MANOJ", "NISHA", "SANJAY", "RITU",
    "ARUN", "GEETA", "VIJAY", "SEEMA", "ASHOK", "REKHA",
]
_LAST = [
    "KUMAR", "SINGH", "SHARMA", "VERMA", "GUPTA", "PATEL", "MEHTA",
    "JOSHI", "YADAV", "KHAN", "JAIN", "AGARWAL", "MITTAL", "RAO", "SONI",
]
_BIZ_SUFFIX = [
    "TRADERS", "ENTERPRISES", "INDUSTRIES", "TEXTILES", "ELECTRONICS",
    "GARMENTS", "STORES", "AGENCIES", "PHARMA", "FURNITURE",
]

_JUNK_LINES = [
    "PLEASE SIGN ABOVE", "AUTHORISED SIGNATORY", "A/C PAYEE ONLY",
    "NOT OVER RUPEES", "SIGN HERE", "CTS CLEARING",
]
_GARBAGE_LINES = ["OOOOOOO", "A1", "IIIII X", "ZZZZZZZ Q", "B2 9 77"]
_BANK_LINES = ["HDFC BANK LTD", "STATE BANK OF INDIA", "ICICI BANK KARNAL"]

_GOVT_ENTITY_PAYEES = [
    "INCOME TAX DEPARTMENT", "MUNICIPAL CORPORATION", "ELECTRICITY BOARD",
    "PUBLIC WORKS DEPARTMENT", "GRAM PANCHAYAT",
]
_DESIGNATIONS = ["ACCOUNTS OFFICER", "TREASURY OFFICER", "SECTION OFFICER X"]


def _drawer_pool(seed: int) -> list[str]:
    """Fixed pool of master-DBF drawer names (pure function of seed)."""
    rng = random.Random(seed * 7919 + 17)
    pool = []
    for i in range(140):
        kind = i % 3
        if kind == 0:
            name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
        elif kind == 1:
            name = f"{rng.choice(_LAST)} {rng.choice(_BIZ_SUFFIX)}"
        else:
            name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)} {rng.choice(_BIZ_SUFFIX)}"
        pool.append(name)
    return sorted(set(pool))


def _perturb(rng: random.Random, name: str) -> str:
    """A near-miss of a dictionary name (exercises the 0.78 fuzzy cutoff)."""
    mode = rng.randrange(3)
    chars = list(name)
    pos = rng.randrange(max(1, len(chars) - 1))
    if mode == 0 and len(chars) > 6:
        del chars[pos]
    elif mode == 1:
        chars[pos] = rng.choice("ABCDEFGHIKLMNOPRSTU")
    else:
        chars.insert(pos, rng.choice("AEIOU"))
    return "".join(chars)


def _confuse(rng: random.Random, name: str) -> str:
    """Inject OCR digit confusions that clean_text (M8) reverses."""
    out = []
    for c in name:
        if c == "O" and rng.random() < 0.5:
            out.append("0")
        elif c == "I" and rng.random() < 0.5:
            out.append("1")
        elif c == "S" and rng.random() < 0.5:
            out.append("5")
        else:
            out.append(c)
    return "".join(out)


_SCENARIOS = [
    "order_plain", "order_title", "order_amp", "order_suffix", "bank_payee",
    "no_payee", "govt_cat3", "govt_cat2", "govt_cat1_high", "govt_cat1_med",
    "demand_draft", "managers_cheque", "crossed", "self_cheque",
    "for_issuer_hi", "for_issuer_lo", "fo_issuer", "prop_issuer",
    "dict_exact", "dict_near", "garbage_only", "no_text", "oversized",
    "corrupt_media",
]


def make_doc(seed: int, idx: int, bucket: int) -> tuple[dict, dict, list[tuple]]:
    """(cheque_row, meta_row, media_rows) for one document — pure in
    (seed, idx, bucket).  ``bucket`` is the media bucket this doc's
    images live in: the caller assigns CONSECUTIVE docs to the same
    bucket (Lance-style row/media co-location) so an OCR batch of
    adjacent docs touches ~1 bucket instead of all of them — the
    difference between each worker reading its slice of the media
    store and every worker reading the whole corpus."""
    rng = random.Random((seed << 34) ^ (idx * 2654435761))
    pool = _drawer_pool(seed)
    doc_id = f"P_{40200000000000000 + idx:017d}"

    scenario = _SCENARIOS[idx % len(_SCENARIOS)] if idx < 4 * len(_SCENARIOS) \
        else rng.choice(_SCENARIOS)

    person = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
    business = f"{rng.choice(_LAST)} {rng.choice(_BIZ_SUFFIX)}"
    dict_name = rng.choice(pool)

    text_spans: list[str] = []
    issuer_lines: list[tuple[str, float]] = []
    aux_lines: list[tuple[str, float]] = []

    def conf(lo=0.30, hi=0.99):
        return round(rng.uniform(lo, hi), 4)

    # --- payee zone -------------------------------------------------
    if scenario == "order_plain":
        text_spans.append(f"PAY TO : {person} RUPEES FIVE THOUSAND ONLY")
    elif scenario == "order_title":
        title = rng.choice(["DR. ", "SHRI ", "M/S ", "SMT. ", "ADV "])
        text_spans.append(f"PAY TO : {title}{person} RUPEES TWO HUNDRED")
    elif scenario == "order_amp":
        text_spans.append(
            f"ORDER OF : {rng.choice(_LAST)} AND {rng.choice(_LAST)} TRADERS RUPEES")
    elif scenario == "order_suffix":
        suffix = rng.choice(["PVT LTD", "LIMITED", "ENTERPRISES", "INDUSTRIES"])
        text_spans.append(f"PAY TO : {business} {suffix} RUPEES ONE LAKH")
    elif scenario == "bank_payee":
        text_spans.append("PAY TO : STATE BANK OF INDIA RUPEES TEN")
    elif scenario == "no_payee":
        text_spans.append("the quick brown fox memo line")
    elif scenario == "govt_cat3":
        text_spans.append("GOVERNMENT ACCOUNT CREDIT ONLY")
        text_spans.append(f"PAY TO : {person} RUPEES")
    elif scenario == "govt_cat2":
        text_spans.append("NOT TRANSFERABLE DDO SALARY")
        if rng.random() < 0.6:
            text_spans.append(rng.choice(_DESIGNATIONS))
    elif scenario == "govt_cat1_high":
        text_spans.append("PAY AND ACCOUNTS OFFICE NEW BLOCK")
        payee = rng.choice([person, rng.choice(_GOVT_ENTITY_PAYEES)])
        text_spans.append(f"PAY TO : {payee} RUPEES")
    elif scenario == "govt_cat1_med":
        text_spans.append("CENTRAL GOVERNMENT SCHEME")
        text_spans.append(f"PAY TO : {person} RUPEES")
    elif scenario == "demand_draft":
        text_spans.append("DEMAND DRAFT PAYABLE AT PAR")
        text_spans.append(f"PAY TO : {business} RUPEES")
    elif scenario == "managers_cheque":
        text_spans.append("PAY ORDER LOCAL CLEARING")
        text_spans.append(f"PAY TO : {person} RUPEES")
    elif scenario == "crossed":
        text_spans.append("ACCOUNT PAYEE NOT NEGOTIABLE")
        text_spans.append(f"PAY TO : {person} RUPEES")
    elif scenario == "self_cheque":
        text_spans.append("PAY SELF")
    elif scenario != "no_text":
        text_spans.append(f"PAY TO : {person} RUPEES THREE THOUSAND")

    # --- MICR / date / amount zones --------------------------------
    if scenario != "no_text":
        if rng.random() < 0.7:
            micr = (f"{rng.randrange(10**8, 10**9)} "
                    f"{rng.randrange(10**8, 10**9)} {rng.randrange(10**5, 10**6)}")
            text_spans.append(micr)
        if rng.random() < 0.6:
            d, m, y = rng.randrange(1, 29), rng.randrange(1, 13), rng.randrange(2024, 2027)
            sep = rng.choice([".", "/"])
            text_spans.append(f"Date: {d:02d}{sep}{m:02d}{sep}{y}")
        if rng.random() < 0.6:
            text_spans.append(f"RS. {rng.randrange(1, 999)},{rng.randrange(100, 999)}.00/-")

    # --- issuer zone OCR lines -------------------------------------
    if scenario == "for_issuer_hi":
        issuer_lines.append((f"FOR {dict_name}", conf(0.92, 0.99)))
    elif scenario == "for_issuer_lo":
        issuer_lines.append((f"FOR {dict_name}", conf(0.30, 0.89)))
    elif scenario == "fo_issuer":
        issuer_lines.append((f"F/O {person}", conf(0.90, 0.99)))
    elif scenario == "prop_issuer":
        issuer_lines.append((f"PROP {business}", conf(0.85, 0.99)))
    elif scenario == "dict_exact":
        issuer_lines.append((_confuse(rng, dict_name), conf(0.60, 0.99)))
    elif scenario == "dict_near":
        issuer_lines.append((_perturb(rng, dict_name), conf(0.60, 0.99)))
    elif scenario == "garbage_only":
        issuer_lines.append((rng.choice(_GARBAGE_LINES), conf()))
    elif scenario in ("no_text",):
        pass
    else:
        r = rng.random()
        if r < 0.4:
            issuer_lines.append((dict_name, conf(0.50, 0.99)))
        elif r < 0.7:
            issuer_lines.append((person, conf(0.50, 0.99)))

    for _ in range(rng.randrange(0, 3)):
        aux_lines.append((rng.choice(_JUNK_LINES + _GARBAGE_LINES + _BANK_LINES),
                          conf()))

    # --- media spans ------------------------------------------------
    media_rows: list[tuple] = []
    spans: list[dict] = []
    offset = 0
    # ~30% of no_text docs have ZERO spans entirely (spans == []):
    # the empty-document branch of the §1 checklist — exercises the
    # NO-TEXT/REJECTED path with no media at all, the span_stats
    # LEFT-JOIN row, and explode/assemble's empty-doc drop semantics
    n_images = 0 if scenario == "no_text" and rng.random() < 0.3 else \
        rng.randrange(1, 4)
    if scenario == "no_text":
        image_line_sets: list[list] = [[] for _ in range(n_images)]
        text_spans = []
    else:
        image_line_sets = [[] for _ in range(n_images)]
        # issuer lines go on the first image; aux spread over the rest
        image_line_sets[0].extend(issuer_lines)
        for j, line in enumerate(aux_lines):
            image_line_sets[j % n_images].append(line)

    # Interleave text and image spans deterministically.
    t_spans = list(text_spans)
    total_slots = len(t_spans) + n_images
    img_positions = set()
    if n_images:
        step = max(1, total_slots // n_images)
        img_positions = {min(total_slots - 1, i * step + step // 2)
                         for i in range(n_images)}
        while len(img_positions) < n_images:
            img_positions.add(rng.randrange(total_slots))
    ti, ii = 0, 0
    for slot in range(total_slots):
        if slot in img_positions and ii < n_images:
            size = rng.randrange(200_000, 400_000) if scenario == "oversized" \
                else rng.randrange(3_000, 24_000)
            w = rng.randrange(1200, 2600)
            h = rng.randrange(500, 1200)
            ref = f"b{bucket:03d}/{doc_id}_{ii}"
            if scenario == "corrupt_media" and ii == 0:
                # undecodable payload (no CHQ1 magic): exercises the
                # per-row ERROR path (SURVEY.md §4 "retries" row)
                payload = bytes(rng.randrange(256) for _ in range(256))
                payload = b"RAW0" + payload
            else:
                payload = encode_image(image_line_sets[ii], w, h, size,
                                       seed=(seed << 20) ^ (idx * 31 + ii))
            media_rows.append((ref, payload, w, h))
            spans.append({"kind": "image", "text": "", "media_ref": ref,
                          "offset": offset})
            ii += 1
        elif ti < len(t_spans):
            spans.append({"kind": "text", "text": t_spans[ti], "media_ref": "",
                          "offset": offset})
            ti += 1
        offset += 1

    meta = {
        "doc_id": doc_id,
        "date": f"{rng.randrange(1, 29):02d}{rng.randrange(1, 13):02d}2026",
        "account": f"{rng.randrange(10**13, 10**14)}",
        "inst_no": f"{rng.randrange(10**5, 10**6)}",
        "sort_code": f"{rng.randrange(10**8, 10**9)}",
        "amount": round(rng.uniform(10, 5_000_000), 2),
        "image_file": f"{doc_id}.tiff",
        "file_mark": False,
        "file_name": f"{doc_id}.tiff",
        "drawer_nm": rng.choice(pool),
        "cat_code": rng.randrange(0, 99),
        "opr_no": "",
    }
    total_media = sum(len(payload) for _, payload, _, _ in media_rows)
    return ({"doc_id": doc_id, "spans": spans, "media_bytes": total_media},
            meta, media_rows)


def tier_for_sf_dir(sf_dir: str) -> tuple[str, int]:
    name = Path(sf_dir).name
    return name, TIER_DOCS.get(name, 600)


def generate_fixture(out_dir: Path, n_docs: int, seed: int = DEFAULT_SEED,
                     docs_per_file: int = 250) -> Path:
    """Write the corpus; idempotent via the manifest cache key."""
    out_dir = Path(out_dir)
    manifest_path = out_dir / "_MANIFEST.json"
    key = {"seed": seed, "n_docs": n_docs, "version": FIXTURE_VERSION}
    if manifest_path.exists():
        try:
            if json.loads(manifest_path.read_text()) == key:
                return out_dir
        except (ValueError, OSError):
            pass

    n_buckets = max(8, n_docs // 500)
    (out_dir / "cheques").mkdir(parents=True, exist_ok=True)
    (out_dir / "meta").mkdir(parents=True, exist_ok=True)

    meta_rows: list[dict] = []
    media_by_bucket: dict[int, list[tuple]] = {}
    part = 0
    for start in range(0, n_docs, docs_per_file):
        chunk_docs = []
        for idx in range(start, min(start + docs_per_file, n_docs)):
            doc, meta, media_rows = make_doc(seed, idx, idx * n_buckets // n_docs)
            chunk_docs.append(doc)
            meta_rows.append(meta)
            for ref, payload, w, h in media_rows:
                # parse up to the '/' — int(ref[1:4]) would truncate
                # 4+-digit buckets (n_buckets > 999 at large n_docs)
                bucket = int(ref.split("/", 1)[0][1:])
                media_by_bucket.setdefault(bucket, []).append((ref, payload, w, h))
        table = pa.Table.from_pylist(chunk_docs, schema=CHEQUES_SCHEMA)
        # Fragment-per-file, small row groups: at corpus scale there are
        # thousands of fragments, and block-per-fragment is what feeds
        # the actor pools — 8 giant files would cap OCR parallelism at 8
        # tasks (observed: 4x slowdown).
        pq.write_table(table, out_dir / "cheques" / f"part-{part:05d}.parquet",
                       row_group_size=125)
        part += 1

    meta_table = pa.Table.from_pylist(meta_rows)
    pq.write_table(meta_table, out_dir / "meta" / "meta.parquet")

    for bucket, rows in sorted(media_by_bucket.items()):
        bdir = out_dir / "media" / f"bucket={bucket:03d}"
        bdir.mkdir(parents=True, exist_ok=True)
        refs, payloads, ws, hs = zip(*sorted(rows))
        table = pa.Table.from_arrays(
            [pa.array(refs), pa.array(payloads, pa.binary()),
             pa.array(ws, pa.int32()), pa.array(hs, pa.int32())],
            schema=MEDIA_SCHEMA)
        pq.write_table(table, bdir / "data.parquet")

    manifest_path.write_text(json.dumps(key))
    return out_dir


def ensure_fixture(sf_dir: str, seed: int = DEFAULT_SEED,
                   n_docs: int | None = None) -> Path:
    """Cached fixture tier for an sf directory name (e.g. .../sf0.01)."""
    tier, default_docs = tier_for_sf_dir(sf_dir)
    n = n_docs or default_docs
    out = FIXTURE_ROOT / f"{tier}-{seed}-{n}"
    return generate_fixture(out, n, seed=seed)
