"""Determinism under different physical configurations (SURVEY.md §5).

The contract: identical extraction output regardless of batch sizes,
pool sizes or partitioning.  The full two-process num_cpus=8-vs-32
comparison runs in `bench.py --scaling`; inside the 4-CPU test session
we vary every physical knob that changes task/batch boundaries and
require byte-identical sorted results.
"""

import pandas as pd
import pytest

from cheque_ocr_project_ray.config import DEFAULT_CONFIG
from cheque_ocr_project_ray.fixtures.gen import generate_fixture
from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
from cheque_ocr_project_ray.pipelines.sink import to_canonical_csv

N_DOCS = 120


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("det_corpus") / "tier"
    return generate_fixture(out, N_DOCS)


def run(fixture_dir, **overrides):
    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=4, **overrides)
    pdf = build_cheque_pipeline(fixture_dir, cfg).to_pandas()
    pdf = pdf.drop(columns=["spans_out"])
    return pdf.sort_values("doc_id").reset_index(drop=True)


def test_output_invariant_to_physical_config(fixture_dir):
    a = run(fixture_dir)
    b = run(fixture_dir, ocr_batch_size=7, extract_batch_size=13,
            ocr_concurrency=2, skew_batch_size=1)
    c = run(fixture_dir, ocr_batch_size=128, extract_batch_size=1000,
            skew_bytes_threshold=10_000)  # different skew routing
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)


def test_csv_projection_deterministic(fixture_dir):
    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=4)
    a = to_canonical_csv(build_cheque_pipeline(fixture_dir, cfg)).to_pandas()
    b = to_canonical_csv(build_cheque_pipeline(fixture_dir, cfg)).to_pandas()
    key = "IMAGE_ID"
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert list(a.columns) == [
        "IMAGE_ID", "FILENAME", "CHEQUE_TYPE", "IS_GOVERNMENT",
        "GOVT_CATEGORY", "PAYEE_RAW", "PAYEE_CLEANED", "CONFIDENCE",
        "PROCESS_DATE", "PROCESS_TIME_MS", "STATUS", "ERROR_MESSAGE"]
