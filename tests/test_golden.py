"""End-to-end golden test (SURVEY.md §5): a committed digest of the
full extraction output for a fixed (seed=42, N=80) corpus.

The per-row oracle test proves pipeline == oracle; this digest catches
the case where pipeline AND oracle drift together.  If a semantic
change is INTENTIONAL, regenerate with:

    python - <<'PY'
    import ray, hashlib, tempfile
    from pathlib import Path
    ray.init(address="local", num_cpus=4, include_dashboard=False)
    from cheque_ocr_project_ray.fixtures.gen import generate_fixture
    from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
    from cheque_ocr_project_ray.config import DEFAULT_CONFIG
    fx = generate_fixture(Path(tempfile.mkdtemp())/"tier", 80)
    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=4)
    pdf = build_cheque_pipeline(fx, cfg).to_pandas().drop(columns=["spans_out"])
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    print(hashlib.md5(pdf.to_csv(index=False, float_format="%.6f").encode()).hexdigest())
    PY
"""

import hashlib

import pytest

from cheque_ocr_project_ray.config import DEFAULT_CONFIG
from cheque_ocr_project_ray.fixtures.gen import generate_fixture
from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline

# regenerated for the cost_ms column (G3 latency surface, round 3)
GOLDEN_MD5 = "cbd745c346387eb5a07e33f6e26d2309"


def test_golden_digest(tmp_path):
    fx = generate_fixture(tmp_path / "tier", 80)
    cfg = DEFAULT_CONFIG.with_overrides(ocr_work_passes=4)
    pdf = build_cheque_pipeline(fx, cfg).to_pandas().drop(
        columns=["spans_out"])
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    blob = pdf.to_csv(index=False, float_format="%.6f").encode()
    assert hashlib.md5(blob).hexdigest() == GOLDEN_MD5
