"""HLL sketch: unit accuracy + merge semantics + query vs exact."""

import numpy as np

from cheque_ocr_project_ray.sketch import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_partial,
)


def test_hll_estimate_accuracy():
    for n in (100, 1_000, 50_000):
        keys = np.arange(n, dtype=np.int64) * 7919 + 13
        est = hll_estimate(hll_partial(keys))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union():
    a = np.arange(0, 2_000, dtype=np.int64)
    b = np.arange(1_000, 3_000, dtype=np.int64)  # overlapping halves
    merged = hll_merge([hll_partial(a).tobytes(), hll_partial(b).tobytes()])
    est = hll_estimate(merged)
    assert abs(est - 3_000) / 3_000 < 0.05
    # merge is idempotent and order-insensitive
    m2 = hll_merge([hll_partial(b).tobytes(), hll_partial(a).tobytes(),
                    hll_partial(a).tobytes()])
    assert np.array_equal(merged, m2)


def test_hll_deterministic_across_batching():
    keys = np.arange(10_000, dtype=np.int64)
    whole = hll_partial(keys)
    split = hll_merge([hll_partial(keys[:3_333]).tobytes(),
                       hll_partial(keys[3_333:]).tobytes()])
    assert np.array_equal(whole, split)
    assert whole.shape == (HLL_M,)


def test_events_user_count_approx_matches_exact(ray_session):
    from cheque_ocr_project_ray.relational.queries import (
        events_user_count, events_user_count_approx)
    sf = "/root/testdata/sf0.001"
    exact = events_user_count(sf).to_pandas().set_index("event_type")
    approx = events_user_count_approx(sf).to_pandas().set_index("event_type")
    assert set(exact.index) == set(approx.index)
    for et in exact.index:
        n, a = exact.loc[et, "n_users"], approx.loc[et, "n_users_approx"]
        assert abs(a - n) / max(n, 1) < 0.05, (et, n, a)
