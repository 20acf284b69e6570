"""Semantic pins for the scan-line family (SQL-twin equality runs in
tools/check_oracle.py; these verify against independent brute-force
pandas/numpy recomputations)."""

import numpy as np
import pandas as pd

from cheque_ocr_project_ray.relational import scanline as sl

SF = "/root/testdata/sf0.001"


def _brute_streaks():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    day = (ev["ts"].astype("int64") // (86_400 * 1_000_000))
    out = {}
    for uid, g in day.groupby(ev["user_id"]):
        d = np.unique(g.to_numpy())
        best = cur = 1
        for i in range(1, len(d)):
            cur = cur + 1 if d[i] == d[i - 1] + 1 else 1
            best = max(best, cur)
        out[uid] = (len(d), best)
    return out


def test_streaks_match_bruteforce():
    df = sl.events_user_streak(SF).to_pandas()
    truth = _brute_streaks()
    assert len(df) == len(truth)
    for row in df.itertuples():
        ad, ls = truth[row.user_id]
        assert (row.active_days, row.longest_streak) == (ad, ls)


def test_backlog_matches_interval_stabbing():
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    last = li.groupby("l_orderkey")["l_shipdate"].max()
    sp = od.set_index("o_orderkey").join(last, how="inner")
    m0 = sp["o_orderdate"].dt.year * 12 + sp["o_orderdate"].dt.month - 1
    m1 = (sp["l_shipdate"].dt.year * 12
          + sp["l_shipdate"].dt.month - 1).clip(lower=m0)

    df = sl.orders_backlog_running(SF).to_pandas()
    # running count at each reported month == brute interval stabbing
    for row in df.itertuples():
        m = (row.ym // 100) * 12 + (row.ym % 100) - 1
        assert row.open_orders == int(((m0 <= m) & (m1 >= m)).sum())
    # delta months cover every open/close+1 boundary
    months = set((df["ym"] // 100) * 12 + (df["ym"] % 100) - 1)
    assert set(m0).issubset(months) and set(m1 + 1).issubset(months)
    # backlog drains to zero after the last close
    assert df["open_orders"].iloc[-1] == 0


def test_weighted_sample_is_topk_by_priority():
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"])
    h = (ev["event_id"].to_numpy() * 2654435761) & 0xFFFFFFFF
    u = (h.astype(np.float64) + 1.0) / 2.0 ** 32
    key = -np.log(u) / (np.abs(ev["value"].to_numpy()) + 1.0)
    order = np.lexsort((ev["event_id"].to_numpy(), key))
    want = set(ev["event_id"].to_numpy()[order[:sl.SAMPLE_K]])

    df = sl.events_weighted_sample(SF).to_pandas()
    assert len(df) == min(sl.SAMPLE_K, len(ev))
    assert set(df["event_id"]) == want
    assert df["event_id"].is_unique  # without replacement


def test_weighted_sample_prefers_heavy_rows():
    # sanity: the sample's mean |value| exceeds the population's —
    # weighting by |value|+1 must tilt the draw toward heavy rows
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    df = sl.events_weighted_sample(SF).to_pandas()
    assert df["value"].abs().mean() > ev["value"].abs().mean()
