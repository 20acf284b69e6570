"""Checkpoint/resume lineage + metadata join-back sink tests
(SURVEY.md §5 "resume test" and §7.3 milestones 4-5)."""

import json
from pathlib import Path

import pytest

from cheque_ocr_project_ray.config import DEFAULT_CONFIG
from cheque_ocr_project_ray.fixtures.gen import generate_fixture
from cheque_ocr_project_ray.pipelines.checkpoint import (
    completed_partitions,
    partition_of,
    read_checkpoint,
    rollup_metrics,
    write_checkpointed,
)
from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
from cheque_ocr_project_ray.pipelines.sink import join_results_to_meta

N_DOCS = 150
N_PARTS = 8
CFG = DEFAULT_CONFIG.with_overrides(ocr_work_passes=4,  # fast tests
                                    num_partitions=N_PARTS)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ckpt_corpus") / "tier"
    return generate_fixture(out, N_DOCS)


def test_checkpoint_write_and_read(fixture_dir, tmp_path):
    out = tmp_path / "ckpt"
    lineage = write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                                 out, num_partitions=N_PARTS)
    assert sum(rec["rows"] for rec in lineage) == N_DOCS
    assert completed_partitions(out) == {rec["partition"] for rec in lineage}
    back = read_checkpoint(out).to_pandas()
    assert len(back) == N_DOCS
    assert back["doc_id"].is_unique
    # lineage sidecars parse and carry the doc ranges
    for d in Path(out).glob("part=*"):
        rec = json.loads((d / "_SUCCESS.json").read_text())
        assert rec["doc_id_min"] <= rec["doc_id_max"]
    roll = rollup_metrics(out)
    assert roll["rows"] == N_DOCS and roll["duplicates_dropped"] == 0


def test_resume_after_partial_failure(fixture_dir, tmp_path):
    out = tmp_path / "ckpt"
    full = write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                              out, num_partitions=N_PARTS)
    reference = read_checkpoint(out).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    # simulate a crash: two partitions never committed, one has a
    # partial file without its _SUCCESS marker
    victims = sorted(rec["partition"] for rec in full)[:2]
    for pid in victims:
        d = Path(out) / f"part={pid:04d}"
        (d / "_SUCCESS.json").unlink()
        if pid == victims[0]:
            (d / "data.parquet").rename(d / ".data.parquet.tmp")

    done_before = completed_partitions(out)
    assert len(done_before) == N_PARTS - 2

    # restart: only docs of the missing partitions are recomputed —
    # the filter applies at the read (resume_from), before OCR
    remaining = build_cheque_pipeline(fixture_dir, CFG, resume_from=out)
    n_remaining = remaining.count()
    assert 0 < n_remaining < N_DOCS
    write_checkpointed(remaining, out, num_partitions=N_PARTS, resume=True)

    assert completed_partitions(out) == done_before | set(victims)
    resumed = read_checkpoint(out).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(resumed) == N_DOCS and resumed["doc_id"].is_unique
    assert resumed["doc_id"].equals(reference["doc_id"])
    assert resumed["status"].equals(reference["status"])
    assert resumed["issuer"].equals(reference["issuer"])


def test_layout_mismatch_rejected_only_when_resuming(fixture_dir, tmp_path):
    """Resuming into a different partition count mis-routes docs →
    ValueError; a FRESH run wipes everything anyway, so it may change
    the layout and must update _LAYOUT.json."""
    import json
    out = tmp_path / "ckpt"
    write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                       out, num_partitions=N_PARTS)
    with pytest.raises(ValueError, match="num_partitions"):
        write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                           out, num_partitions=N_PARTS * 2, resume=True)
    # fresh run with a new count: allowed, relaid out, manifest updated
    write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                       out, num_partitions=N_PARTS * 2)
    assert json.loads((out / "_LAYOUT.json").read_text()) == \
        {"num_partitions": N_PARTS * 2}
    assert len(list(out.glob("part=*"))) == N_PARTS * 2


def test_fresh_rerun_wipes_stale_partitions(fixture_dir, tmp_path):
    """A non-resume re-run into the same out dir must not mix stale
    committed partitions from the previous run into the result."""
    out = tmp_path / "ckpt"
    write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                       out, num_partitions=N_PARTS)
    assert rollup_metrics(out)["rows"] == N_DOCS
    # second FRESH run over a 10-doc subset: old partitions must go
    limited = DEFAULT_CONFIG.with_overrides(ocr_work_passes=2, limit=10,
                                            num_partitions=N_PARTS)
    write_checkpointed(build_cheque_pipeline(fixture_dir, limited),
                       out, num_partitions=N_PARTS)
    assert rollup_metrics(out)["rows"] == 10
    assert len(read_checkpoint(out).to_pandas()) == 10


def test_resume_filter_rejects_layout_mismatch(fixture_dir, tmp_path):
    from cheque_ocr_project_ray.pipelines.checkpoint import resume_filter
    out = tmp_path / "ckpt"
    write_checkpointed(build_cheque_pipeline(fixture_dir, CFG),
                       out, num_partitions=N_PARTS)
    ds = build_cheque_pipeline(fixture_dir, CFG)
    with pytest.raises(ValueError, match="num_partitions"):
        resume_filter(ds, out, num_partitions=N_PARTS * 2)


def test_read_checkpoint_empty(tmp_path):
    empty = read_checkpoint(tmp_path / "nothing_here")
    assert empty.count() == 0


def test_resume_filter_partition_math(fixture_dir, tmp_path):
    # every doc routes to exactly one partition, stable across calls
    ids = [f"P_{i:017d}" for i in range(100)]
    parts = [partition_of(d, N_PARTS) for d in ids]
    assert parts == [partition_of(d, N_PARTS) for d in ids]
    assert set(parts) <= set(range(N_PARTS))


def test_sink_join_back(fixture_dir):
    results = build_cheque_pipeline(fixture_dir, CFG)
    final = join_results_to_meta(results, fixture_dir).to_pandas()
    assert len(final) == N_DOCS
    # truncation semantics (issuer_processor_v.py:562,580-591)
    assert final["image_file"].str.len().max() <= 50
    assert final["drawer_nm_out"].str.len().max() <= 100
    assert final["status"].str.len().max() <= 20
    assert final["drawer_nm_new"].str.len().max() <= 50
    accepted = final[final["status"] == "AUTO-UPDATED"]
    rejected = final[final["status"] != "AUTO-UPDATED"]
    assert len(accepted) > 0 and len(rejected) > 0
    # K4 update columns: opr_no/file_mark set only on accepted rows
    assert (accepted["opr_no"] == "AS601").all()
    assert (~accepted["file_mark"]).all()
    assert (rejected["opr_no"] == "").all()
    # accepted rows carry the extracted issuer (truncated)
    assert (accepted["drawer_nm_new"]
            == accepted["drawer_nm_out"].str.slice(0, 50)).all()
