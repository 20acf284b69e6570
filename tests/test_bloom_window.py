"""Bloom semi-join + rolling-window / stratified / z-score tests."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from cheque_ocr_project_ray.relational import joins


def test_bloom_semi_join_equals_exact_semi_join():
    left = ray.data.from_items(
        [{"k": i % 40, "v": i} for i in range(400)])
    keys = ray.data.from_items([{"kk": k} for k in (3, 7, 11, 39)])
    out = joins.bloom_semi_join(left, keys, on_left="k",
                                on_right="kk").to_pandas()
    assert sorted(out["k"].unique()) == [3, 7, 11, 39]
    assert len(out) == 40  # 10 rows per matching key
    assert set(out.columns) == {"k", "v"}


def test_bloom_no_false_negatives_tiny_filter():
    # deliberately undersized filter: false POSITIVES abound, but the
    # exact phase removes them; every true match must survive
    rng = np.random.default_rng(3)
    key_vals = rng.integers(0, 10_000, 200).tolist()
    left = ray.data.from_items(
        [{"k": int(k), "v": 1} for k in rng.integers(0, 10_000, 2000)])
    keys = ray.data.from_items([{"k2": int(k)} for k in set(key_vals)])
    out = joins.bloom_semi_join(left, keys, on_left="k", on_right="k2",
                                m_bits=1 << 8, k_hashes=2).to_pandas()
    expect = [r for r in left.take_all() if r["k"] in set(key_vals)]
    assert len(out) == len(expect)
    assert sorted(out["k"].tolist()) == sorted(r["k"] for r in expect)


def test_bloom_prefilter_is_selective():
    # with a well-sized filter, non-matching rows are dropped BEFORE
    # the exact join: probe the filter directly
    keys = np.array([5, 6, 7], np.int64)
    m_bits, kh = 1 << 16, 4
    bits = np.zeros(m_bits // 64, np.uint64)
    for i in range(kh):
        idx = joins._bloom_indices(keys, i, m_bits)
        np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    probe = np.arange(10_000, dtype=np.int64)
    ok = np.ones(len(probe), bool)
    for i in range(kh):
        idx = joins._bloom_indices(probe, i, m_bits)
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        ok &= (word >> (idx & np.uint64(63))) & np.uint64(1) == 1
    assert ok[[5, 6, 7]].all()          # no false negatives
    assert ok.sum() <= 10               # ~zero false positives


def test_rolling_window_matches_pandas(tmp_path):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "event_id": np.arange(300),
        "user_id": rng.integers(0, 7, 300),
        "ts": pd.to_datetime(rng.integers(0, 10**6, 300), unit="s"),
        "value": rng.uniform(0, 100, 300).round(2),
    })
    df.to_parquet(tmp_path / "events.parquet")
    from cheque_ocr_project_ray.relational.queries import \
        events_user_rolling
    out = events_user_rolling(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"])
    g = ref.groupby("user_id")["value"]
    ref = ref.assign(
        roll_mean3=g.transform(
            lambda v: v.rolling(3, min_periods=1).mean()),
        delta=g.transform(lambda v: v.diff().fillna(0.0))) \
        .sort_values("event_id").reset_index(drop=True)
    assert np.allclose(out["roll_mean3"], ref["roll_mean3"], atol=1e-3)
    assert np.allclose(out["delta"], ref["delta"], atol=1e-3)


def test_stratified_sample_balances_strata(tmp_path):
    rng = np.random.default_rng(5)
    n = 6000
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "event_type": np.repeat(["big", "mid", "small"],
                                [4000, 1500, 500]),
        "user_id": rng.integers(0, 50, n),
        "value": rng.uniform(0, 10, n),
    })
    df.to_parquet(tmp_path / "events.parquet")
    from cheque_ocr_project_ray.relational.queries import \
        events_stratified_sample
    out = events_stratified_sample(str(tmp_path)).to_pandas()
    sizes = out.groupby("event_type").size()
    # every stratum lands near the smallest stratum's size
    assert sizes["small"] == pytest.approx(500, rel=0.15)
    assert sizes["big"] == pytest.approx(500, rel=0.15)
    assert sizes["mid"] == pytest.approx(500, rel=0.15)
    # determinism: rerun keeps the identical membership
    out2 = events_stratified_sample(str(tmp_path)).to_pandas()
    assert sorted(out2["event_id"]) == sorted(out["event_id"])


def test_zscore_moments(tmp_path):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "event_id": np.arange(2000),
        "event_type": np.tile(["a", "b"], 1000),
        "value": rng.uniform(0, 50, 2000),
    })
    df.to_parquet(tmp_path / "events.parquet")
    from cheque_ocr_project_ray.relational.queries import \
        events_value_zscore
    out = events_value_zscore(str(tmp_path)).to_pandas()
    m = out.merge(df, on="event_id")
    for t, grp in m.groupby("event_type_x"):
        assert grp["z"].mean() == pytest.approx(0.0, abs=1e-3)
        assert grp["z"].std(ddof=0) == pytest.approx(1.0, abs=1e-3)
