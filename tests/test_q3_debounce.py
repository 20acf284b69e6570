"""Three-way star join + event debounce tests."""

import numpy as np
import pandas as pd

from cheque_ocr_project_ray.relational.queries import (events_debounce,
                                                       q3_shipping_priority)


def test_q3_matches_pandas(tmp_path):
    rng = np.random.default_rng(31)
    nc, no, nl = 50, 400, 1600
    cust = pd.DataFrame({
        "c_custkey": np.arange(nc),
        "c_name": [f"c{i}" for i in range(nc)],
        "c_nationkey": rng.integers(0, 5, nc),
        "c_acctbal": rng.uniform(0, 100, nc).round(2),
        "c_mktsegment": rng.choice(["BUILDING", "AUTO"], nc),
    })
    orders = pd.DataFrame({
        "o_orderkey": np.arange(no),
        "o_custkey": rng.integers(0, nc, no),
        "o_orderstatus": "O",
        "o_totalprice": rng.uniform(10, 100, no).round(2),
        "o_orderdate": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 300, no), unit="D"),
        "o_orderpriority": "1-URGENT",
    })
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, no, nl),
        "l_extendedprice": rng.uniform(10, 5000, nl).round(2),
        "l_discount": (rng.integers(0, 11, nl) / 100.0),
    })
    cust.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    li.to_parquet(tmp_path / "lineitem.parquet")

    out = q3_shipping_priority(str(tmp_path)).to_pandas()
    bkeys = set(cust.loc[cust["c_mktsegment"] == "BUILDING",
                         "c_custkey"])
    okeys = set(orders.loc[orders["o_custkey"].isin(bkeys),
                           "o_orderkey"])
    m = li[li["l_orderkey"].isin(okeys)].copy()
    m["rev"] = (np.rint(m["l_extendedprice"] * 100)
                * (100 - np.rint(m["l_discount"] * 100))) / 10000.0
    ref = m.groupby("l_orderkey")["rev"].sum().sort_values(
        ascending=False).head(10)
    assert len(out) == min(10, len(ref))
    assert np.allclose(sorted(out["revenue"], reverse=True),
                       sorted(ref.to_numpy(), reverse=True), atol=1e-6)


def test_debounce_lag_semantics(tmp_path):
    # events at t=0, 30, 61, 200, 230 per user: lag-gap rule keeps
    # t=0 (first), drops 30 (gap 30), keeps 61 (gap 31 <= 60? no:
    # gap from PREVIOUS EVENT 61-30=31 -> dropped), keeps 200, drops 230
    ts = pd.to_datetime([0, 30, 61, 200, 230], unit="s")
    df = pd.DataFrame({
        "event_id": np.arange(5),
        "user_id": [1] * 5,
        "ts": ts,
        "event_type": "click",
        "value": 1.0,
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = events_debounce(str(tmp_path)).to_pandas()
    assert sorted(out["event_id"]) == [0, 3]
