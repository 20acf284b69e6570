"""Bank CSV (K2, custom_csv.py) + second DBF schema
(parallel_processor.py:186-213) + G3 latency stats: projection
semantics on the sf0.001 corpus."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def fixture_and_results():
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
    fixture = ensure_fixture("/root/testdata/sf0.001")
    return fixture, build_cheque_pipeline(fixture)


def test_bank_csv_columns_and_constants(fixture_and_results):
    from cheque_ocr_project_ray.pipelines.sink import to_bank_csv
    fixture, results = fixture_and_results
    df = to_bank_csv(results, fixture).to_pandas()
    # the exact 7 reference columns, in the reference's order
    assert list(df.columns) == ["payee", "date", "account", "reference",
                                "sort_code", "amount", "filename"]
    assert (df["reference"] == "0").all()
    assert (df["sort_code"] == "0").all()
    assert len(df) > 0
    # filename-derived fields agree with M23 row-by-row
    from cheque_ocr_project_ray.functions.filename_fields import (
        account_from_filename, amount_from_filename, date_from_filename)
    for _, r in df.head(50).iterrows():
        assert r["account"] == account_from_filename(r["filename"])
        assert r["amount"] == amount_from_filename(r["filename"])
        assert r["date"] == date_from_filename(r["filename"])


def test_bank_csv_drops_failed_docs(fixture_and_results):
    from cheque_ocr_project_ray.pipelines.sink import to_bank_csv
    fixture, results = fixture_and_results
    status = results.select_columns(["doc_id", "status"]).to_pandas()
    n_ok = (status["status"] != "ERROR").sum()
    df = to_bank_csv(results, fixture, include_doc_id=True).to_pandas()
    assert len(df) == n_ok
    errs = set(status.loc[status["status"] == "ERROR", "doc_id"])
    assert errs and not errs & set(df["doc_id"])


def test_issuer_dbf_widths_and_fallback(fixture_and_results):
    from cheque_ocr_project_ray.pipelines.sink import to_issuer_dbf
    fixture, results = fixture_and_results
    df = to_issuer_dbf(results, fixture).to_pandas()
    assert list(df.columns) == ["doc_id", "issuer_out", "fname",
                                "confid", "procdt"]
    assert df["issuer_out"].str.len().max() <= 100
    assert df["fname"].str.len().max() <= 50
    assert (df["procdt"] == "").all()
    # XXX sentinel → the reference's UNKNOWN fallback; never leaks
    assert not (df["issuer_out"] == "XXX").any()
    assert (df["issuer_out"] == "UNKNOWN").any()
    # N(5,2): two-decimal confidence in [0, 1] (round is a fixpoint)
    assert (df["confid"].round(2) == df["confid"]).all()
    assert df["confid"].between(0, 1).all()


def test_latency_stats_matches_pandas(fixture_and_results):
    from cheque_ocr_project_ray.pipelines.metrics import latency_stats
    fixture, results = fixture_and_results
    out = latency_stats(results, work_passes=256)
    pdf = results.select_columns(["media_bytes", "status"]).to_pandas()
    ok = pdf[pdf["status"] != "ERROR"]["media_bytes"]
    cost = ok * 256 / 1000.0
    row = out.iloc[0]
    assert row["n_docs"] == len(ok)
    assert row["min_ms"] == round(cost.min(), 4)
    assert row["max_ms"] == round(cost.max(), 4)
    # outputs are rounded to 4dp — compare within half an ulp of that
    assert abs(row["mean_ms"] - cost.mean()) <= 5.1e-5
    assert abs(row["median_ms"] - cost.median()) <= 5.1e-5
    assert abs(row["total_s"] - cost.sum() / 1000.0) <= 5.1e-5


def test_latency_stats_empty():
    import ray.data
    import pyarrow as pa
    from cheque_ocr_project_ray.pipelines.metrics import latency_stats
    ds = ray.data.from_arrow(pa.table({
        "media_bytes": pa.array([], pa.int64()),
        "status": pa.array([], pa.string())}))
    out = latency_stats(ds)
    assert len(out) == 0
    assert list(out.columns) == ["n_docs", "mean_ms", "median_ms",
                                 "min_ms", "max_ms", "total_s"]


def test_issuer_dbf_real_procdt_flag(fixture_and_results):
    """Opt-in escape hatch for export consumers: real_procdt=True
    emits the reference's strftime('%Y-%m-%d %H:%M:%S') wall-clock
    stamp (parallel_processor.py:191), one consistent value per run;
    default stays '' so oracles remain deterministic."""
    import re
    from cheque_ocr_project_ray.pipelines.sink import to_issuer_dbf
    fixture, results = fixture_and_results
    df = to_issuer_dbf(results, fixture, real_procdt=True).to_pandas()
    stamps = df["procdt"].unique()
    assert len(stamps) == 1
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", stamps[0])


def test_ladder_diff_marginals(fixture_and_results):
    """The v1×v3 agreement matrix must be consistent: cells sum to the
    corpus size and the v1 marginal equals the v1 status histogram."""
    import __ray_entry__ as e
    out = e.queries()["cheque_ladder_diff"](
        "/root/testdata/sf0.001").to_pandas()
    _, results = fixture_and_results
    status = results.select_columns(["status"]).to_pandas()
    assert out["n"].sum() == len(status)
    v1_marginal = out.groupby("status_v1")["n"].sum()
    ref = status["status"].value_counts()
    for s, n in v1_marginal.items():
        assert ref[s] == n
