"""The sequentially-materialized expected table (fixtures/expected.py)
is the base of the driver's cheque-family oracles — pin its contract:

1. it equals the Ray pipeline's flat output row-for-row (v1 columns),
2. its spans_json matches the pipeline's serialized spans_out,
3. its v3 column matches the pipeline under the v3 ladder config,
4. generation is cached (manifest hit on second call).
"""

import json

import pyarrow.parquet as pq
import pytest

from cheque_ocr_project_ray.config import DEFAULT_CONFIG
from cheque_ocr_project_ray.fixtures.expected import (
    generate_expected,
    spans_to_json,
)
from cheque_ocr_project_ray.fixtures.gen import generate_fixture
from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline

N_DOCS = 120  # ≥ len(_SCENARIOS): every semantic branch appears


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("expcorpus") / "tier"
    return generate_fixture(out, N_DOCS)


@pytest.fixture(scope="module")
def expected(fixture_dir):
    out = generate_expected(fixture_dir)
    return pq.read_table(out / "expected.parquet").to_pandas()


def test_expected_matches_pipeline_v1(fixture_dir, expected):
    got = build_cheque_pipeline(fixture_dir).to_pandas()
    assert len(got) == len(expected) == N_DOCS
    exp = expected.set_index("doc_id")
    got = got.set_index("doc_id")
    flat_cols = ["cheque_type", "is_government", "govt_category",
                 "payee_raw", "payee", "issuer", "issuer_conf",
                 "confidence", "status", "micr", "amount", "date",
                 "media_bytes"]
    for doc_id in exp.index:
        e, g = exp.loc[doc_id], got.loc[doc_id]
        for c in flat_cols:
            assert e[c] == g[c], (doc_id, c, e[c], g[c])
        assert e["spans_json"] == spans_to_json(g["spans_out"])
        # spans_json round-trips to the 8-field contract
        assert len(json.loads(e["spans_json"])) == 8


def test_expected_matches_pipeline_v3(fixture_dir, expected):
    cfg = DEFAULT_CONFIG.with_overrides(status_ladder="v3", threshold=0.85)
    got = build_cheque_pipeline(fixture_dir, cfg=cfg).to_pandas()
    by_id = dict(zip(got["doc_id"], got["status"]))
    for doc_id, status_v3 in zip(expected["doc_id"], expected["status_v3"]):
        assert by_id[doc_id] == status_v3, doc_id


def test_expected_generation_cached(fixture_dir):
    out = generate_expected(fixture_dir)
    mtime = (out / "expected.parquet").stat().st_mtime_ns
    out2 = generate_expected(fixture_dir)
    assert out2 == out
    assert (out / "expected.parquet").stat().st_mtime_ns == mtime
