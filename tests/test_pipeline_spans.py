"""Per-row oracle test — the BASELINE.json invariant.

The Ray pipeline's spans_out must equal the row-at-a-time oracle's
span sequence under span-sequence equality (kind, text, media_ref,
order) for EVERY row of the synthetic corpus (SURVEY.md §5).
"""

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from cheque_ocr_project_ray.fixtures.gen import generate_fixture
from cheque_ocr_project_ray.media import decode_image
from cheque_ocr_project_ray.oracle import reference_extract
from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
from cheque_ocr_project_ray.state.drawer_dict import build_drawer_dict

N_DOCS = 400  # ≥ 4×len(_SCENARIOS): every semantic branch covered


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus") / "tier"
    return generate_fixture(out, N_DOCS)


@pytest.fixture(scope="module")
def media_lookup(fixture_dir):
    media = {}
    for p in (Path(fixture_dir) / "media").rglob("data.parquet"):
        t = pq.read_table(p)
        for ref, data in zip(t["media_ref"].to_pylist(), t["data"].to_pylist()):
            media[ref] = data

    def lookup(ref):
        lines, _, _ = decode_image(media[ref])
        return lines

    return lookup


def spans_as_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_pipeline_matches_oracle_per_row(fixture_dir, media_lookup):
    drawer_dict = build_drawer_dict(fixture_dir)
    result = build_cheque_pipeline(fixture_dir).to_pandas()
    assert len(result) == N_DOCS
    by_id = {row.doc_id: row for row in result.itertuples()}

    docs = pq.read_table(Path(fixture_dir) / "cheques").to_pylist()
    assert len(docs) == N_DOCS
    mismatches = 0
    for doc in docs:
        expected = reference_extract(doc, media_lookup, drawer_dict)
        got = spans_as_tuples(by_id[doc["doc_id"]].spans_out)
        if got != [tuple(s) for s in expected]:
            mismatches += 1
            if mismatches <= 3:
                print("MISMATCH", doc["doc_id"], "\n got", got, "\n exp", expected)
    assert mismatches == 0


def test_v3_ladder_pipeline_matches_oracle(fixture_dir, media_lookup):
    """The V3 status-ladder variant must also hold span equality
    row-for-row (oracle and pipeline share the ladder code path but
    the distributed composition — actor pools, skew routing — must
    preserve it)."""
    from cheque_ocr_project_ray.config import DEFAULT_CONFIG
    cfg = DEFAULT_CONFIG.with_overrides(status_ladder="v3", threshold=0.85)
    drawer_dict = build_drawer_dict(fixture_dir)
    result = build_cheque_pipeline(fixture_dir, cfg=cfg).to_pandas()
    by_id = {row.doc_id: row for row in result.itertuples()}

    docs = pq.read_table(Path(fixture_dir) / "cheques").to_pylist()
    statuses = set()
    for doc in docs:
        expected = reference_extract(doc, media_lookup, drawer_dict,
                                     threshold=0.85, status_ladder="v3")
        got = spans_as_tuples(by_id[doc["doc_id"]].spans_out)
        assert got == [tuple(s) for s in expected], doc["doc_id"]
        statuses.add(got[4][1])
    # the ladder's main states must actually occur on the corpus
    assert {"AUTO-UPDATED", "REVIEW", "NO-TEXT", "ERROR"} <= statuses
    assert statuses <= {"AUTO-UPDATED", "REVIEW", "REVIEW-SHORT",
                        "JUNK-FILTERED", "INVALID-TEXT", "NO-TEXT", "ERROR"}


def test_statuses_and_types_present(fixture_dir):
    ds = build_cheque_pipeline(fixture_dir)
    pdf = ds.to_pandas()
    assert set(pdf["status"]) <= {"AUTO-UPDATED", "REJECTED", "ERROR"}
    # branch coverage sanity: all statuses (incl. the corrupt-media
    # ERROR path) and several types occur
    assert len(set(pdf["status"])) == 3
    assert {"ORDER", "GOVT_GOVT_ACCOUNT", "DEMAND_DRAFT"} <= set(pdf["cheque_type"])


def test_cheque_type_profile_totals(ray_session):
    """The per-type grid partitions the corpus: counts sum to the doc
    count and the field-hit counters are bounded by each row's n."""
    import __ray_entry__ as entry
    out = entry.queries()["cheque_type_profile"](
        "/root/testdata/sf0.001")
    df = out.to_pandas()
    assert df["n"].sum() == 600
    assert (df["n_government"] <= df["n"]).all()
    assert (df["n_with_amount"] <= df["n"]).all()
    assert (df["n_with_date"] <= df["n"]).all()
    # ERROR-status docs carry confidence 0, so a type whose docs all
    # error can legitimately average 0
    assert ((df["mean_confidence"] >= 0)
            & (df["mean_confidence"] <= 1)).all()
