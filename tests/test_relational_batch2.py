"""Unit checks for the Q13/Q17/Q18/first-touch/user-types/Q22 family
(the SQL-twin equality runs in tools/check_oracle.py; these pin the
semantic edges the oracle sweep can't see by construction)."""

import numpy as np
import pandas as pd

from cheque_ocr_project_ray.relational import queries as rq

SF = "/root/testdata/sf0.001"


def test_q13_includes_zero_order_customers():
    df = rq.q13_customer_distribution(SF).to_pandas()
    # distribution accounts for EVERY customer exactly once
    import pyarrow.parquet as pq
    n_cust = pq.read_metadata(f"{SF}/customer.parquet").num_rows
    assert int(df["custdist"].sum()) == n_cust
    assert (df["c_count"] >= 0).all()


def test_q17_single_scalar_row():
    df = rq.q17_small_qty_revenue(SF).to_pandas()
    assert list(df.columns) == ["avg_yearly"]
    assert len(df) == 1 and df["avg_yearly"].iloc[0] > 0


def test_q18_threshold_enforced():
    df = rq.q18_large_orders(SF).to_pandas()
    assert (df["sum_qty"] > rq.Q18_MIN_QTY).all()
    # join-back keys are unique per order
    assert df["o_orderkey"].is_unique
    # descending by price with the deterministic tie-break
    p = df["o_totalprice"].to_numpy()
    assert (np.diff(p) <= 0).all()


def test_first_touch_one_row_per_user_and_is_min():
    df = rq.events_first_touch(SF).to_pandas()
    assert df["user_id"].is_unique
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    true_min = ev.groupby("user_id")["ts"].min()
    got = df.set_index("user_id")["ts"]
    assert (got.sort_index() == true_min.sort_index()).all()


def test_user_types_sorted_distinct():
    df = rq.events_user_types(SF).to_pandas()
    for types, n in zip(df["types"], df["n_types"]):
        parts = types.split(",")
        assert parts == sorted(set(parts))
        assert len(parts) == n


def test_q7_only_cross_nation_pairs():
    # sf0.001 has no cross-nation flow between the two nations —
    # the result must still be a TYPED empty (Dataset schema intact;
    # Ray's to_pandas drops columns on any empty dataset)
    ds0 = rq.q7_volume_shipping(SF)
    assert ds0.schema().names == ["supp_nation", "cust_nation", "yr",
                                  "revenue"]
    assert ds0.count() == 0
    df = rq.q7_volume_shipping("/root/testdata/sf0.01").to_pandas()
    pairs = set(zip(df["supp_nation"], df["cust_nation"]))
    allowed = {(rq.Q7_NATIONS[0], rq.Q7_NATIONS[1]),
               (rq.Q7_NATIONS[1], rq.Q7_NATIONS[0])}
    assert pairs and pairs <= allowed
    assert (df["revenue"] > 0).all()


def test_revenue_by_region_covers_all_orders():
    df = rq.revenue_by_region(SF).to_pandas()
    import pyarrow.parquet as pq
    n_orders = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    assert int(df["n_orders"].sum()) == n_orders
    assert len(df) == 5


def test_hour_value_stats_corr_bounds():
    df = rq.events_hour_value_stats(SF).to_pandas()
    assert (df["corr"].abs() <= 1.0).all()
    assert len(df) == df["event_type"].nunique()


def test_idle_rich_excludes_urgent_customers():
    df = rq.customers_idle_rich(SF).to_pandas()
    assert (df["numcust"] > 0).all()
    ev = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderpriority"])
    cust = pd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])
    urgent = set(ev.loc[ev["o_orderpriority"] == "1-URGENT",
                        "o_custkey"])
    pos = cust.loc[cust["c_acctbal"] > 0, "c_acctbal"]
    thr = (pos * 100).round().astype(np.int64).sum() / len(pos) / 100
    manual = cust[(cust["c_acctbal"] > thr)
                  & (~cust["c_custkey"].isin(urgent))]
    assert int(df["numcust"].sum()) == len(manual)


def test_full_outer_coverage_sides():
    """All three full-outer sides surface: matched, left-only,
    right-only — on the real sf0.001 tables."""
    from cheque_ocr_project_ray.relational.analytics_extra import (
        user_customer_coverage)
    df = user_customer_coverage("/root/testdata/sf0.001").to_pandas()
    sides = set(df["side"])
    assert "both" in sides and "orders_only" in sides
    # unmatched rows carry zero-filled counters, never nulls
    assert df["n_events"].notna().all() and df["n_orders"].notna().all()
    assert (df.loc[df["side"] == "orders_only", "n_events"] == 0).all()
    assert df["key"].is_unique


def test_quartile_bands_balanced():
    """Quantile bucketing yields 4 near-equal bands whose min/max
    respect the thresholds' ordering."""
    from cheque_ocr_project_ray.relational.analytics_extra import (
        orders_quartile_bands)
    df = orders_quartile_bands("/root/testdata/sf0.001")
    assert df["quartile"].tolist() == [1, 2, 3, 4]
    n = df["n"].sum()
    assert (df["n"] >= n // 4 - 2).all() and (df["n"] <= n // 4 + 3).all()
    # bands are ordered and non-overlapping
    assert (df["max_value"].to_numpy()[:-1]
            <= df["min_value"].to_numpy()[1:]).all()


def test_table_profile_values():
    """Profile invariants on the real table: exact distinct counts,
    zero nulls, numeric bounds only for numeric columns."""
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.relational.analytics_extra import (
        events_table_profile)
    df = events_table_profile("/root/testdata/sf0.001") \
        .set_index("column")
    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    assert (df["n"] == t.num_rows).all()
    assert (df["n_null"] == 0).all()
    import pyarrow.compute as pc
    for c in ("event_id", "user_id", "event_type", "ts", "value"):
        assert df.loc[c, "n_distinct"] == pc.count_distinct(
            t.column(c)).as_py(), c
    assert df.loc["event_id", "min_num"] == float(
        pc.min(t.column("event_id")).as_py())
    import numpy as np
    assert np.isnan(df.loc["event_type", "min_num"])
    assert np.isnan(df.loc["ts", "max_num"])


def test_broadcast_join_rejects_right_and_full_outer():
    """Per-batch broadcast semantics would duplicate unmatched
    small-side rows once per large-side batch — the helper must refuse
    instead of silently emitting wrong results."""
    import pyarrow as pa
    import pytest
    import ray.data
    from cheque_ocr_project_ray.relational.joins import broadcast_join

    small = pa.table({"k": [1, 2], "v": ["a", "b"]})
    large = ray.data.from_items([{"k": 1}, {"k": 3}])
    for how in ("right outer", "full outer", "right", "outer"):
        with pytest.raises(ValueError, match="use hash_join"):
            broadcast_join(large, small, on="k", how=how)
