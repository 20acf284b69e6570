"""Pivot / dense-rank / intersect / correlated-avg / rollup tests."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from cheque_ocr_project_ray.relational.queries import (
    events_type_pivot, events_users_both, events_value_dense_rank,
    orders_above_avg, orders_rollup)


@pytest.fixture()
def events_dir(tmp_path):
    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "user_id": rng.integers(0, 60, n),
        "event_type": rng.choice(
            ["click", "error", "purchase", "signup", "view"], n),
        "value": rng.uniform(0, 100, n).round(2),
    })
    df.to_parquet(tmp_path / "events.parquet")
    return str(tmp_path), df


@pytest.fixture()
def orders_dir(tmp_path):
    rng = np.random.default_rng(22)
    n = 3000
    df = pd.DataFrame({
        "o_orderkey": np.arange(n),
        "o_custkey": rng.integers(0, 200, n),
        "o_orderstatus": rng.choice(["O", "F", "P"], n),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM"], n),
        "o_totalprice": rng.uniform(100, 10_000, n).round(2),
    })
    df.to_parquet(tmp_path / "orders.parquet")
    return str(tmp_path), df


def test_pivot_matches_pandas(events_dir):
    d, df = events_dir
    out = events_type_pivot(d).to_pandas().sort_values("hour") \
        .reset_index(drop=True)
    ref = df.assign(hour=df["ts"].dt.hour).pivot_table(
        index="hour", columns="event_type", values="value",
        aggfunc="sum", fill_value=0.0)
    for t in ("click", "error", "purchase", "signup", "view"):
        assert np.allclose(out[f"sum_{t}"].to_numpy(),
                           ref[t].round(2).to_numpy(), atol=0.02)


def test_dense_rank_with_forced_ties(tmp_path):
    # quantized values guarantee many ties: dense_rank must be dense
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "event_id": np.arange(1000),
        "value": (rng.integers(0, 50, 1000) / 10.0),
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = events_value_dense_rank(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ref = df["value"].rank(method="dense").astype(np.int64)
    assert (out["drank"].to_numpy() == ref.to_numpy()).all()
    assert out["drank"].max() == df["value"].nunique()


def test_users_both_equals_set_intersection(events_dir):
    d, df = events_dir
    out = events_users_both(d).to_pandas()
    p = set(df.loc[df["event_type"] == "purchase", "user_id"])
    e = set(df.loc[df["event_type"] == "error", "user_id"])
    assert sorted(out["user_id"]) == sorted(p & e)


def test_orders_above_avg_matches_pandas(orders_dir):
    d, df = orders_dir
    out = orders_above_avg(d).to_pandas()
    mean = df.groupby("o_custkey")["o_totalprice"].transform("mean")
    expect = df.loc[df["o_totalprice"] > mean.round(6), "o_orderkey"]
    assert sorted(out["o_orderkey"]) == sorted(expect)


def test_rollup_matches_duckdb(orders_dir):
    d, df = orders_dir
    out = orders_rollup(d).to_pandas().sort_values(
        ["o_orderpriority", "o_orderstatus"]).reset_index(drop=True)
    ref = duckdb.sql("""
        SELECT coalesce(o_orderpriority,'ALL') AS o_orderpriority,
               coalesce(o_orderstatus,'ALL') AS o_orderstatus,
               round(sum(o_totalprice),2) AS total_price,
               count(*) AS n_orders
        FROM df GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority, o_orderstatus
    """).df()
    assert len(out) == len(ref)
    assert (out["o_orderpriority"] == ref["o_orderpriority"]).all()
    assert (out["o_orderstatus"] == ref["o_orderstatus"]).all()
    assert np.allclose(out["total_price"], ref["total_price"],
                       atol=0.02)
    assert (out["n_orders"].to_numpy()
            == ref["n_orders"].to_numpy()).all()
    # the three levels must be internally consistent
    total = out.loc[(out["o_orderpriority"] == "ALL"), "n_orders"]
    assert int(total.iloc[0]) == len(df)
