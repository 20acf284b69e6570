"""Ingest path: image directory + manifest → span table → pipeline."""

from pathlib import Path

import pytest

from cheque_ocr_project_ray.config import DEFAULT_CONFIG
from cheque_ocr_project_ray.media import encode_image
from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
from cheque_ocr_project_ray.sources.ingest import ingest_directory, read_manifest


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_images")
    rows = []
    for i in range(6):
        name = f"P_4020000000000{i:04d}.tiff"
        payload = encode_image(
            [(f"FOR ACME TRADERS", 0.95)], 1600, 700, 8000, seed=i)
        (d / name).write_bytes(payload)
        rows.append(f"23022026,0007035000{i:04d},543843,400259041,"
                    f"2500{i}.00,{name}")
    # a non-image file that the S1 extension filter must skip
    (d / "notes.txt").write_text("not an image")
    # an image the manifest does not know
    (d / "P_99999999999999999.tiff").write_bytes(
        encode_image([("PAY TO : RAVI KUMAR RUPEES", 0.9)],
                     1400, 650, 6000, seed=99))
    manifest = d / "23022026.txt"
    manifest.write_text("\n".join(rows) + "\n")
    return d, manifest


def test_ingest_and_extract(raw_dir, tmp_path):
    image_dir, manifest = raw_dir
    out = ingest_directory(image_dir, tmp_path / "corpus", manifest)
    assert (out / "cheques").exists() and (out / "meta").exists()

    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=2)
    pdf = build_cheque_pipeline(out, cfg).to_pandas()
    assert len(pdf) == 7                      # 6 manifest + 1 unknown
    assert "notes" not in set(pdf["doc_id"])  # extension filter (S1)
    by_id = pdf.set_index("doc_id")
    # manifest-known doc: date/amount text spans made it into full_text
    known = by_id.loc["P_40200000000000000"]
    assert known["date"] == "23022026"        # parsed from "Date: ..."
    assert known["issuer"] == "ACME TRADERS"  # FOR-prefix from the image
    # file: refs decoded in place — no media copy happened
    assert not (out / "media").exists()
    unknown = by_id.loc["P_99999999999999999"]
    assert unknown["payee"] == "RAVI KUMAR"


def test_read_manifest(raw_dir):
    _, manifest = raw_dir
    rows = read_manifest(manifest)
    assert len(rows) == 6
    r = rows["p_40200000000000000"]
    assert r["account"].endswith("0000") and r["sort_code"] == "400259041"


def test_read_manifest_skips_header(tmp_path):
    m = tmp_path / "m.txt"
    m.write_text("date,account,inst_no,sort_code,amount,filename\n"
                 "23022026,0007,543843,400259041,2500.00,P_1.tiff\n")
    rows = read_manifest(m)
    assert list(rows) == ["p_1"]  # header row skipped (amount not numeric)


def test_ingest_without_manifest(raw_dir, tmp_path):
    image_dir, _ = raw_dir
    out = ingest_directory(image_dir, tmp_path / "corpus2")
    # meta exists (empty) so the drawer-dict build and pipeline work
    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=2)
    pdf = build_cheque_pipeline(out, cfg).to_pandas()
    assert len(pdf) == 7


def test_ingest_rerun_is_idempotent(raw_dir, tmp_path):
    image_dir, manifest = raw_dir
    out = ingest_directory(image_dir, tmp_path / "corpus3", manifest)
    out = ingest_directory(image_dir, tmp_path / "corpus3", manifest)
    import pyarrow.parquet as pq
    n = pq.read_table(out / "cheques").num_rows
    assert n == 7  # re-run replaced fragments, no duplicates


def test_ingest_meta_covers_all_files_and_stem_collisions(tmp_path):
    """Every listed file gets a meta row (no processed doc can be
    dropped by the final join-back), and same-stem files keep distinct
    doc_ids instead of colliding into one."""
    import pyarrow.parquet as pq

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "scan1.tif").write_bytes(
        encode_image([("FOR A ONE", 0.9)], 1200, 600, 4000, seed=1))
    (d / "scan1.png").write_bytes(
        encode_image([("FOR B TWO", 0.9)], 1200, 600, 4000, seed=2))
    (d / "scan2.jpg").write_bytes(
        encode_image([("FOR C THREE", 0.9)], 1200, 600, 4000, seed=3))
    out = ingest_directory(d, tmp_path / "corpus")

    cheq = pq.read_table(out / "cheques")
    ids = sorted(cheq["doc_id"].to_pylist())
    assert ids == ["scan1.png", "scan1.tif", "scan2"]  # collision → full name
    meta = pq.read_table(out / "meta")
    assert sorted(meta["doc_id"].to_pylist()) == ids  # one row per FILE
    by_id = dict(zip(meta["doc_id"].to_pylist(),
                     meta["image_file"].to_pylist()))
    assert by_id["scan2"] == "scan2.jpg"  # real on-disk name, not .tiff

    # the pipeline + final join keep all three docs
    from cheque_ocr_project_ray.pipelines.sink import join_results_to_meta
    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=2)
    final = join_results_to_meta(
        build_cheque_pipeline(out, cfg), out).to_pandas()
    assert sorted(final["doc_id"]) == ids
    assert set(final["image_file"]) == {"scan1.tif", "scan1.png",
                                        "scan2.jpg"}


def test_schema_evolution_union_null_fill():
    """Union-by-name read: shard B's missing ts is null-filled with
    the TARGET type, shard A's missing channel likewise, and no row is
    lost or duplicated across the drifted shards."""
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.sources.formats import read_events_evolved
    sf = "/root/testdata/sf0.001"
    ds = read_events_evolved(sf)
    df = ds.to_pandas()
    src = pq.read_table(f"{sf}/events.parquet",
                        columns=["event_id"]).to_pandas()
    assert sorted(df["event_id"]) == sorted(src["event_id"])
    even = df["event_id"] % 2 == 0
    assert df.loc[even, "ts"].notna().all()
    assert df.loc[~even, "ts"].isna().all()
    assert (df.loc[~even, "channel"] == "web").all()
    assert df.loc[even, "channel"].isna().all()
    assert str(df["ts"].dtype).startswith("datetime64")


def test_derived_format_cache_stable_across_processes():
    """The /tmp derived-CSV cache key must be a stable digest: two
    FRESH python processes (different PYTHONHASHSEED) must resolve the
    same source file to the SAME cached path, so derived copies are
    reused instead of accumulating one per process."""
    import subprocess
    import sys

    prog = ("from cheque_ocr_project_ray.sources.formats import _derived;"
            "print(_derived('/root/testdata/sf0.001', 'csv'))")
    paths = set()
    for seed in ("0", "12345"):
        out = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True,
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin",
                 "PYTHONPATH": "/root/repo", "HOME": "/root"},
            check=True)
        paths.add(out.stdout.strip())
    assert len(paths) == 1
    import os
    assert os.path.exists(paths.pop())
