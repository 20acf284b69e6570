"""Tests pinning the self-review fixes: missing-media ERROR semantics,
half-away Arrow rounding, empty-text analysis parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cheque_ocr_project_ray.sources.io import MediaStore
from cheque_ocr_project_ray.stages.ocr import OcrStage
from cheque_ocr_project_ray.text import analysis
from cheque_ocr_project_ray.util import round_half_up, round_half_up_arrow

SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32())]))


def test_media_store_missing_refs(tmp_path):
    store = MediaStore(tmp_path, max_buckets=2)
    out = store.get_many(["b000/none", "b001/also_none",
                          f"file:{tmp_path}/missing.tif"])
    assert set(out.values()) == {None}
    # the file: scheme reads in-place payloads
    (tmp_path / "real.bin").write_bytes(b"CHQ-ish bytes")
    got = store.get_many([f"file:{tmp_path}/real.bin"])
    assert list(got.values()) == [b"CHQ-ish bytes"]


def test_ocr_stage_missing_media_is_per_row_error(tmp_path):
    # empty media store: every image ref is missing
    batch = pa.Table.from_pydict({
        "doc_id": ["d1", "d2"],
        "spans": pa.array([
            [{"kind": "image", "text": "", "media_ref": "b000/gone",
              "offset": 0},
             {"kind": "text", "text": "PAY TO : A B", "media_ref": "",
              "offset": 1}],
            [{"kind": "text", "text": "PAY TO : C D", "media_ref": "",
              "offset": 0}],
        ], SPAN_TYPE),
        "media_bytes": [100, 0],
    })
    out = OcrStage(media_dir=str(tmp_path), work_passes=1)(batch)
    d = out.to_pydict()
    assert d["ocr_error"] == [True, False]   # only the doc with the ref
    assert d["full_text"][1] == "PAY TO : C D"


def test_round_half_up_arrow_matches_numpy():
    vals = [0.03125, -0.03125, 1.00005, 2.5e-5, 0.0, 12.34565, -12.34565]
    arr = pa.array(vals, pa.float64())
    got = round_half_up_arrow(arr, 4).to_pylist()
    expected = round_half_up(np.array(vals), 4).tolist()
    assert got == pytest.approx(expected)
    # the half case that pc.round gets wrong (banker's): 0.03125 → 0.0313
    assert got[0] == pytest.approx(0.0313)


def test_text_analysis_empty_doc_semantics():
    import pyarrow as pa
    batch = pa.table({"doc_id": [1, 2], "text": ["", "   "]})
    q = analysis.quality_counts(batch).to_pandas()
    # regexp_split_to_array(trim('')) yields [''] → 1 token, ratios 0/1
    assert (q["n_tokens"] == 1).all()
    assert (q["stop_ratio"] == 0.0).all() and (q["ttr"] == 1.0).all()
    t = analysis.token_stats(batch).to_pandas()
    assert t["n_tokens"].tolist() == [1, 1]
    lang = analysis.lang_id(batch).to_pandas()
    assert (lang["pred_lang"] == "und").all()


def test_skew_profile_bounded_and_accurate(tmp_path):
    """skew_profile must (a) never scan more than the sample bound,
    (b) detect big-doc existence exactly via row-group statistics,
    (c) estimate the byte share accurately on a uniform layout."""
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.sources.io import skew_profile

    d = tmp_path / "cheques"
    d.mkdir()
    # 20 files x 4 row groups x 25 rows; every 10th doc is "big"
    idx = 0
    for f in range(20):
        sizes = []
        for _ in range(100):
            sizes.append(300_000 if idx % 10 == 0 else 10_000)
            idx += 1
        t = pa.table({"doc_id": [f"d{f}_{i}" for i in range(100)],
                      "spans": [[{"kind": "text"}]] * 100,
                      "media_bytes": pa.array(sizes, pa.int64())})
        pq.write_table(t, d / f"part-{f:05d}.parquet", row_group_size=25)

    # (a) bounded scan: count actual row-group READS (metadata-only
    # access is free and unlimited; the bound is on data reads)
    import cheque_ocr_project_ray.sources.io as io_mod
    reads = {"n": 0}
    real_pf = io_mod.pq.ParquetFile

    class CountingPF(real_pf):
        def read_row_group(self, *a, **k):
            reads["n"] += 1
            return super().read_row_group(*a, **k)

    orig = io_mod.pq.ParquetFile
    io_mod.pq.ParquetFile = CountingPF
    try:
        share, n_big = skew_profile(d, 150_000, max_sample_groups=16)
    finally:
        io_mod.pq.ParquetFile = orig
    assert reads["n"] <= 16, reads["n"]

    true_share = (200 * 300_000) / (200 * 300_000 + 1800 * 10_000)
    assert abs(share - true_share) < 0.1
    assert abs(n_big - 200) <= 40  # extrapolated from the sample

    # no docs above threshold -> statistics alone say so (0 sample work)
    share0, n0 = skew_profile(d, 500_000)
    assert share0 == 0.0 and n0 == 0


def test_skew_profile_finds_clustered_big_docs(tmp_path):
    """Big docs concentrated in the LAST row groups must still be
    found: the stratified sample targets groups whose max statistic
    exceeds the threshold, so an even stride can't skip them (the
    uniform-stride version silently returned 0.0 here and disabled
    skew routing)."""
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.sources.io import skew_profile

    d = tmp_path / "cheques"
    d.mkdir()
    # 129 files x 1 group; only the last file holds big docs — a
    # stride of 2 over 129 groups samples even indices and misses it
    for f in range(129):
        big = f == 128
        sizes = [300_000] * 25 if big else [10_000] * 25
        t = pa.table({"doc_id": [f"d{f}_{i}" for i in range(25)],
                      "media_bytes": pa.array(sizes, pa.int64())})
        pq.write_table(t, d / f"part-{f:05d}.parquet", row_group_size=25)

    share, n_big = skew_profile(d, 150_000, max_sample_groups=64)
    assert n_big == 25                      # the big stratum is exact here
    true_share = (25 * 300_000) / (25 * 300_000 + 128 * 25 * 10_000)
    assert abs(share - true_share) < 0.05
