"""Unit references for the statistical operators added late in
round 2 — the oracle sweep cross-checks DuckDB; these pin the math
against hand-computable cases."""

import numpy as np
import pandas as pd
import pytest


def _events(tmp_path, values, users=None, types=None, ts=None):
    n = len(values)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": ts if ts is not None else
        pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.arange(n), unit="m"),
        "user_id": users if users is not None else np.zeros(n, np.int64),
        "event_type": types if types is not None else ["a"] * n,
        "value": values,
        "props": "{}"})
    df.to_parquet(tmp_path / "events.parquet")
    return df


def test_gini_extremes(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_value_gini
    # type 'eq': perfectly equal -> gini 0; 'uneq': one holder of
    # everything (others at 0.01 to stay positive) -> gini near 1
    vals = [5.0] * 4 + [0.01, 0.01, 0.01, 100.0]
    types = ["eq"] * 4 + ["uneq"] * 4
    _events(tmp_path, vals, types=types)
    out = events_value_gini(str(tmp_path)) \
        .sort_values("event_type").reset_index(drop=True)
    assert out.loc[0, "event_type"] == "eq"
    assert out.loc[0, "gini"] == 0.0
    assert out.loc[1, "gini"] > 0.7


def test_winsorized_mean_clips(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_value_winsorized
    # one huge outlier: the winsorized mean must sit far below the
    # arithmetic mean
    vals = [10.0] * 19 + [10000.0]
    _events(tmp_path, vals)
    out = events_value_winsorized(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["winsorized_mean"].iloc[0] < 600.0
    assert out["p95"].iloc[0] < 10000.0


def test_session_stats_numbering(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_session_stats
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:10",   # session 1 (2 events)
        "2024-01-01 02:00",                        # session 2 (gap > 30m)
        "2024-01-01 02:20", "2024-01-01 02:40"])   # still session 2
    _events(tmp_path, [1.0, 2.0, 4.0, 8.0, 16.0], ts=ts)
    out = events_session_stats(str(tmp_path)).to_pandas() \
        .sort_values("session_id").reset_index(drop=True)
    assert list(out["session_id"]) == [1, 2]
    assert list(out["n_events"]) == [2, 3]
    assert np.allclose(out["sum_value"], [3.0, 28.0])
    assert np.allclose(out["duration_s"], [600.0, 2400.0])


def test_benford_uniform_digits(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_benford
    # 9 values with distinct leading digits, one each
    _events(tmp_path, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0])
    out = events_benford(str(tmp_path)).to_pandas()
    assert list(out["digit"]) == list(range(1, 10))
    assert (out["n"] == 1).all()
    assert np.isclose(out["benford_p"].sum(), 1.0, atol=1e-4)


def test_supplier_scorecard_distincts(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import \
        supplier_scorecard
    d0 = pd.to_datetime("1996-01-01")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": [d0, d0],
        "o_custkey": 0, "o_orderstatus": "F",
        "o_totalprice": 1.0, "o_orderpriority": "1-URGENT",
    }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({
        # supplier 7: 3 items over 2 distinct parts, 1 late
        "l_orderkey": [1, 1, 2],
        "l_suppkey": [7, 7, 7],
        "l_partkey": [100, 100, 200],
        "l_shipdate": [d0 + pd.Timedelta(days=10),
                       d0 + pd.Timedelta(days=100),
                       d0 + pd.Timedelta(days=20)],
        "l_extendedprice": [10.0, 20.0, 30.0],
        "l_discount": [0.0, 0.0, 0.5],
    }).to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({
        "s_suppkey": [7], "s_name": ["s7"],
        "s_nationkey": 0, "s_acctbal": 0.0,
    }).to_parquet(tmp_path / "supplier.parquet")
    out = supplier_scorecard(str(tmp_path)).to_pandas()
    assert list(out["n_items"]) == [3]
    assert list(out["n_parts"]) == [2]
    assert np.allclose(out["revenue"], [10.0 + 20.0 + 15.0])
    assert np.allclose(out["late_rate"], [1 / 3], atol=1e-6)


def test_customer_rfm_path_parity(tmp_path):
    """The distributed Sum+Min fallback must produce exactly the
    bounded driver path's result (bound=0 forces the fallback)."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        customer_rfm
    rng = np.random.default_rng(13)
    n = 400
    pd.DataFrame({
        "o_orderkey": np.arange(n),
        "o_custkey": rng.integers(0, 40, n),
        "o_orderstatus": "O",
        "o_orderdate": pd.to_datetime("1999-01-01")
        + pd.to_timedelta(rng.integers(0, 900, n), unit="D"),
        "o_totalprice": rng.uniform(10, 900, n).round(2),
        "o_orderpriority": "1-URGENT",
    }).to_parquet(tmp_path / "orders.parquet")
    a = customer_rfm(str(tmp_path)).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    b = customer_rfm(str(tmp_path), bound=0).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_entropy_path_parity(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_user_entropy
    rng = np.random.default_rng(17)
    _events(tmp_path, rng.uniform(1, 10, 300).round(2),
            users=rng.integers(0, 12, 300),
            types=rng.choice(["a", "b", "c"], 300).tolist())
    a = events_user_entropy(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    b = events_user_entropy(str(tmp_path), bound=0).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_q15_distributed_max_path(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import \
        q15_top_supplier
    li = pd.DataFrame({
        "l_suppkey": [1, 2, 2, 3],
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 4),
        "l_extendedprice": [100.0, 60.0, 40.0, 50.0],
        "l_discount": [0.0] * 4})
    sup = pd.DataFrame({"s_suppkey": [1, 2, 3],
                        "s_name": ["s1", "s2", "s3"],
                        "s_nationkey": 0, "s_acctbal": 0.0})
    li.to_parquet(tmp_path / "lineitem.parquet")
    sup.to_parquet(tmp_path / "supplier.parquet")
    a = q15_top_supplier(str(tmp_path)).to_pandas()
    b = q15_top_supplier(str(tmp_path), bound=0).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    assert sorted(a["s_suppkey"]) == [1, 2]   # tie at 100.0


def test_events_decay_score_matches_pandas(tmp_path):
    """Decay weights against a direct pandas computation: the newest
    event weighs 1.0, a 7-day-old event weighs 0.5."""
    import numpy as np
    import pandas as pd
    from cheque_ocr_project_ray.relational.analytics_extra import (
        events_decay_score)

    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        [0, 7, 14, 3, 7], unit="D")
    ev = pd.DataFrame({
        "event_id": range(5), "ts": ts,
        "user_id": [1, 1, 1, 2, 2],
        "event_type": "click",
        "value": [10.0, 10.0, 10.0, 4.0, 8.0],
        "props": "{}"})
    ev.to_parquet(tmp_path / "events.parquet")

    out = events_decay_score(str(tmp_path)).to_pandas()
    tmax = ts.max()
    w = 0.5 ** ((tmax - ts).total_seconds().to_numpy()
                / (7 * 86400.0))
    ref = pd.DataFrame({"user_id": ev["user_id"], "dv": w * ev["value"]}) \
        .groupby("user_id")["dv"].sum().round(4)
    assert list(out["user_id"]) == [1, 2]
    assert out["decayed_value"].to_numpy() == pytest.approx(
        ref.to_numpy())
    assert list(out["n_events"]) == [3, 2]
    # newest event for user 1 is 14 days old at weight 0.25; check one
    # hand value: 10*0.25 + 10*0.5 + 10*1.0 = 17.5
    assert out.loc[out["user_id"] == 1, "decayed_value"].iloc[0] == 17.5


def test_events_heavy_hitters_candidate_guarantee(tmp_path):
    """A key that is never locally dominant in any one batch but
    globally heavy must still be found (pigeonhole guarantees it IS
    locally heavy somewhere); light keys are excluded exactly."""
    import numpy as np
    import pandas as pd
    from cheque_ocr_project_ray.relational.analytics_extra import (
        events_heavy_hitters, HH_M)

    rng = np.random.default_rng(9)
    # user 7: 2% of 6000 events = 120 > 6000/120 = 50 -> heavy
    # user 8: exactly 50 events -> 50*120 = 6000 NOT > 6000 -> excluded
    users = np.concatenate([
        np.full(120, 7), np.full(50, 8),
        rng.integers(100, 4000, 5830)])   # long light tail
    rng.shuffle(users)
    ev = pd.DataFrame({
        "event_id": np.arange(len(users)),
        "ts": pd.to_datetime("2024-01-01"),
        "user_id": users, "event_type": "click",
        "value": 1.0, "props": "{}"})
    ev.to_parquet(tmp_path / "events.parquet")
    out = events_heavy_hitters(str(tmp_path))
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    assert 7 in set(out["user_id"])
    assert 8 not in set(out["user_id"])
    assert int(out.loc[out["user_id"] == 7, "n_events"].iloc[0]) == 120
    # exactness: every reported count matches a pandas groupby
    ref = ev.groupby("user_id").size()
    for _, r in out.iterrows():
        assert ref[r["user_id"]] == r["n_events"]
        assert r["n_events"] * HH_M > len(ev)


def test_lineitem_discount_slope_matches_polyfit(tmp_path):
    """Moment-sum slope equals numpy's least-squares slope on clean
    synthetic data with a known linear relationship."""
    import numpy as np
    import pandas as pd
    from cheque_ocr_project_ray.relational.analytics_extra import (
        lineitem_discount_slope)

    rng = np.random.default_rng(5)
    n = 4000
    disc = rng.integers(0, 1001, n) / 10000.0   # 0.0000..0.1000
    flag = rng.choice(["A", "N", "R"], n)
    # quantity depends linearly on discount with per-flag slopes
    true_slope = {"A": 80.0, "N": -40.0, "R": 0.0}
    qty = np.array([10 + true_slope[f] * d for f, d in zip(flag, disc)])
    qty = np.round(qty + rng.integers(-2, 3, n))  # integer quantities
    li = pd.DataFrame({"l_returnflag": flag, "l_discount": disc,
                       "l_quantity": qty})
    li.to_parquet(tmp_path / "lineitem.parquet")

    out = lineitem_discount_slope(str(tmp_path)).to_pandas() \
        .set_index("l_returnflag")
    for f in ["A", "N", "R"]:
        m = flag == f
        ref = np.polyfit(disc[m], qty[m], 1)[0]
        assert abs(out.loc[f, "slope"] - ref) < 1e-4
        # noise is +/-2 uniform: fitted slope lands near the truth
        assert abs(out.loc[f, "slope"] - true_slope[f]) < 12.0


def test_events_hourly_autocorr_alternating_series(tmp_path):
    """A strictly alternating hourly count series has lag-1
    autocorrelation -1; gaps are zero-filled into the dense grid."""
    import numpy as np
    import pandas as pd
    from cheque_ocr_project_ray.relational.analytics_extra import (
        events_hourly_autocorr)

    # hours 0..9 alternate 30/10 events; hour 4 left EMPTY (dense fill
    # puts a 0 there, breaking perfect alternation detectably)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for h in range(10):
        if h == 4:
            continue
        cnt = 30 if h % 2 == 0 else 10
        for i in range(cnt):
            rows.append(base + pd.Timedelta(hours=h, seconds=i))
    ev = pd.DataFrame({"ts": rows})
    ev["event_id"] = np.arange(len(ev))
    ev["user_id"] = 0
    ev["event_type"] = "view"
    ev["value"] = 1.0
    ev["props"] = "{}"
    ev.to_parquet(tmp_path / "events.parquet")

    out = events_hourly_autocorr(str(tmp_path))
    assert out["n_hours"].iloc[0] == 10
    assert out["n_pairs"].iloc[0] == 9
    dense = np.array([30, 10, 30, 10, 0, 10, 30, 10, 30, 10], float)
    ref = np.corrcoef(dense[:-1], dense[1:])[0, 1]
    assert abs(out["autocorr"].iloc[0] - ref) < 1e-6


def test_rolling_aov_planted_window(tmp_path, ray_session):
    """Three known months: the 3-month trailing mean must fold exact
    int cents with the widening-window edge (1-, 2-, then 3-row)."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        orders_rolling_aov
    df = pd.DataFrame({
        "o_orderdate": pd.to_datetime(
            ["2024-01-10", "2024-01-20", "2024-02-05", "2024-03-01"]),
        "o_totalprice": [100.0, 200.0, 50.0, 10.0]})
    df.to_parquet(tmp_path / "orders.parquet")
    out = orders_rolling_aov(str(tmp_path))
    assert out["ym"].tolist() == [202401, 202402, 202403]
    assert out["n_orders"].tolist() == [2, 1, 1]
    assert out["revenue"].tolist() == [300.0, 50.0, 10.0]
    assert out["aov"].tolist() == [150.0, 50.0, 10.0]
    # widening window: 300/1, (300+50)/2, (300+50+10)/3
    assert out["roll3_revenue"].tolist() == [300.0, 175.0, 120.0]


def test_degree_histogram_handshake(ray_session):
    """Sum(degree x n_docs) == 2 x |pairs| (handshake lemma) against
    the SAME pair source the histogram consumes."""
    from cheque_ocr_project_ray.text.queries import (
        dedup_degree_histogram, dedup_ngram_jaccard)
    sf = "/root/testdata/sf0.001"
    hist = dedup_degree_histogram(sf)
    n_pairs = dedup_ngram_jaccard(sf).count()
    assert int((hist["degree"] * hist["n_docs"]).sum()) == 2 * n_pairs
    assert (hist["degree"] > 0).all() and (hist["n_docs"] > 0).all()


def test_interarrival_planted_gaps(tmp_path, ray_session):
    """Known gaps: 3, 7, 14 days (duplicate same-day order ignored);
    single-order customers contribute nothing."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        orders_interarrival
    df = pd.DataFrame({
        "o_custkey": [1, 1, 1, 1, 1, 2],
        "o_orderdate": pd.to_datetime(
            ["2024-01-01", "2024-01-04", "2024-01-11", "2024-01-11",
             "2024-01-25", "2024-06-01"])})
    df.to_parquet(tmp_path / "orders.parquet")
    out = orders_interarrival(str(tmp_path))
    assert out["week_bucket"].tolist() == [0, 1, 2]
    assert out["n_gaps"].tolist() == [1, 1, 1]
    assert out["sum_gap_days"].tolist() == [3, 7, 14]
    assert out["avg_gap_days"].tolist() == [3.0, 7.0, 14.0]


def test_fulfillment_span_planted(tmp_path, ray_session):
    """Order 1 ships over 4 days (min 01-01, max 01-05), order 2 all
    on one day -> histogram {0: 1, 4: 1}."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        order_fulfillment_span
    df = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2],
        "l_shipdate": pd.to_datetime(
            ["2024-01-01", "2024-01-05", "2024-01-03", "2024-02-01"])})
    df.to_parquet(tmp_path / "lineitem.parquet")
    out = order_fulfillment_span(str(tmp_path))
    assert out["span_days"].tolist() == [0, 4]
    assert out["n_orders"].tolist() == [1, 1]


def test_shipping_latency_planted(tmp_path, ray_session):
    """URGENT order placed 01-01 ships +2 and +4 days (mean 3, pop
    std 1); MEDIUM order placed 01-10 ships +5 (std 0) — exact
    integer moments through the post-join shift identity."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        shipping_latency_by_priority
    pd.DataFrame({
        "l_orderkey": [1, 1, 2],
        "l_shipdate": pd.to_datetime(
            ["2024-01-03", "2024-01-05", "2024-01-15"])}) \
        .to_parquet(tmp_path / "lineitem.parquet")
    pd.DataFrame({
        "o_orderkey": [1, 2],
        "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-10"]),
        "o_orderpriority": ["1-URGENT", "3-MEDIUM"]}) \
        .to_parquet(tmp_path / "orders.parquet")
    out = shipping_latency_by_priority(str(tmp_path))
    u = out[out["o_orderpriority"] == "1-URGENT"].iloc[0]
    assert (u["n_lines"], u["sum_days"], u["sumsq_days"]) == (2, 6, 20)
    assert (u["avg_days"], u["std_days"]) == (3.0, 1.0)
    m = out[out["o_orderpriority"] == "3-MEDIUM"].iloc[0]
    assert (m["n_lines"], m["sum_days"], m["avg_days"],
            m["std_days"]) == (1, 5, 5.0, 0.0)


def test_returns_by_month_planted(tmp_path, ray_session):
    """Two months: Jan has 2 lines / 1 returned (rate 0.5, value
    10.00), Feb 1 line / 0 returned."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        lineitem_returns_by_month
    pd.DataFrame({
        "l_shipdate": pd.to_datetime(
            ["2024-01-03", "2024-01-20", "2024-02-01"]),
        "l_returnflag": ["R", "N", "A"],
        "l_extendedprice": [10.0, 99.0, 7.5]}) \
        .to_parquet(tmp_path / "lineitem.parquet")
    out = lineitem_returns_by_month(str(tmp_path))
    assert out["ym"].tolist() == [202401, 202402]
    assert out["n_lines"].tolist() == [2, 1]
    assert out["n_returned"].tolist() == [1, 0]
    assert out["returned_value"].tolist() == [10.0, 0.0]
    assert out["return_rate"].tolist() == [0.5, 0.0]


def test_activity_histogram_planted(tmp_path, ray_session):
    """Users 1 and 2 emit one event each, user 3 emits two ->
    count-of-counts {1: 2 users, 2: 1 user}."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_activity_histogram
    pd.DataFrame({"user_id": [1, 2, 3, 3]}) \
        .to_parquet(tmp_path / "events.parquet")
    out = events_activity_histogram(str(tmp_path))
    assert out["n_events"].tolist() == [1, 2]
    assert out["n_users"].tolist() == [2, 1]


def test_trade_balance_planted(tmp_path, ray_session):
    """Nation A's customer buys 100.00; nation B's supplier sells
    50.00 at 10% discount (45.00). A: buy 100 / sell 0 / balance
    -100; B: buy 0 / sell 45 / +45; C: all zero (zero-filled)."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        nation_trade_balance
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_name": ["A", "B", "C"]}) \
        .to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame({"c_custkey": [10], "c_nationkey": [0]}) \
        .to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame({"s_suppkey": [20], "s_nationkey": [1]}) \
        .to_parquet(tmp_path / "supplier.parquet")
    pd.DataFrame({"o_custkey": [10], "o_totalprice": [100.0]}) \
        .to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({"l_suppkey": [20], "l_extendedprice": [50.0],
                  "l_discount": [0.10]}) \
        .to_parquet(tmp_path / "lineitem.parquet")
    out = nation_trade_balance(str(tmp_path))
    assert out["n_name"].tolist() == ["A", "B", "C"]
    assert out["buy_revenue"].tolist() == [100.0, 0.0, 0.0]
    assert out["sell_revenue"].tolist() == [0.0, 45.0, 0.0]
    assert out["balance"].tolist() == [-100.0, 45.0, 0.0]


def test_segment_profile_planted(tmp_path, ray_session):
    """Segment A: two customers (bal 10.00 / -5.00 -> avg 2.50, min
    -5, max 10), one with two orders totalling 30.00; segment B: one
    customer, no orders (zero-filled activity)."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        customer_segment_profile
    pd.DataFrame({"c_custkey": [1, 2, 3],
                  "c_mktsegment": ["A", "A", "B"],
                  "c_acctbal": [10.0, -5.0, 7.0]}) \
        .to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame({"o_custkey": [1, 1],
                  "o_totalprice": [10.0, 20.0]}) \
        .to_parquet(tmp_path / "orders.parquet")
    out = customer_segment_profile(str(tmp_path))
    assert out["segment"].tolist() == ["A", "B"]
    assert out["n_customers"].tolist() == [2, 1]
    assert out["avg_balance"].tolist() == [2.5, 7.0]
    assert out["min_balance"].tolist() == [-5.0, 7.0]
    assert out["max_balance"].tolist() == [10.0, 7.0]
    assert out["n_orders"].tolist() == [2, 0]
    assert out["revenue"].tolist() == [30.0, 0.0]


def test_discount_quantity_grid_planted(tmp_path, ray_session):
    """Quantity 1: two lines at 5% and 10% discount (avg 0.075),
    prices 10 and 20 (avg 15); quantity 3: one line, 0%, 99.99."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        lineitem_discount_quantity_grid
    pd.DataFrame({"l_quantity": [1.0, 1.0, 3.0],
                  "l_discount": [0.05, 0.10, 0.0],
                  "l_extendedprice": [10.0, 20.0, 99.99]}) \
        .to_parquet(tmp_path / "lineitem.parquet")
    out = lineitem_discount_quantity_grid(str(tmp_path))
    assert out["qty"].tolist() == [1, 3]
    assert out["n_lines"].tolist() == [2, 1]
    assert out["avg_discount"].tolist() == [0.075, 0.0]
    assert out["avg_price"].tolist() == [15.0, 99.99]


def test_region_profile_planted(tmp_path, ray_session):
    """Region R1 holds nations 0 (1 customer, bal 10.00; 2 suppliers)
    and 1 (empty); region R2 holds nation 2 (1 customer bal -2.50)."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        region_profile
    pd.DataFrame({"r_regionkey": [0, 1],
                  "r_name": ["R1", "R2"]}) \
        .to_parquet(tmp_path / "region.parquet")
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_regionkey": [0, 0, 1]}) \
        .to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame({"c_nationkey": [0, 2],
                  "c_acctbal": [10.0, -2.5]}) \
        .to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame({"s_nationkey": [0, 0]}) \
        .to_parquet(tmp_path / "supplier.parquet")
    out = region_profile(str(tmp_path))
    assert out["r_name"].tolist() == ["R1", "R2"]
    assert out["n_nations"].tolist() == [2, 1]
    assert out["n_customers"].tolist() == [1, 1]
    assert out["n_suppliers"].tolist() == [2, 0]
    assert out["total_balance"].tolist() == [10.0, -2.5]


def test_orders_status_profile_planted(tmp_path, ray_session):
    """Status F: orders 10.00 + 20.01 (revenue 30.01, aov 15.005);
    status O: one 5.00 order."""
    from cheque_ocr_project_ray.relational.analytics_extra import \
        orders_status_profile
    pd.DataFrame({"o_orderstatus": ["F", "F", "O"],
                  "o_totalprice": [10.0, 20.01, 5.0]}) \
        .to_parquet(tmp_path / "orders.parquet")
    out = orders_status_profile(str(tmp_path))
    assert out["o_orderstatus"].tolist() == ["F", "O"]
    assert out["n_orders"].tolist() == [2, 1]
    assert out["revenue"].tolist() == [30.01, 5.0]
    assert out["aov"].tolist() == [15.005, 5.0]
