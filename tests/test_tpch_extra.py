"""Second-wave TPC-H family vs pandas references on synthetic tables."""

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    for name, df in tables.items():
        df.to_parquet(tmp_path / f"{name}.parquet")


def test_q4_exists_semantics(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import q4_late_orders
    rng = np.random.default_rng(7)
    n_orders = 300
    odates = pd.to_datetime("1996-01-01") + pd.to_timedelta(
        rng.integers(0, 360, n_orders), unit="D")
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders),
        "o_custkey": 0, "o_orderstatus": "O", "o_totalprice": 1.0,
        "o_orderdate": odates,
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH"], n_orders)})
    n_li = 1200
    ok = rng.integers(0, n_orders, n_li)
    li = pd.DataFrame({
        "l_orderkey": ok,
        "l_shipdate": odates.values[ok] + pd.to_timedelta(
            rng.integers(0, 150, n_li), unit="D")})
    _write(tmp_path, orders=orders, lineitem=li)

    out = q4_late_orders(str(tmp_path)).to_pandas() \
        .sort_values("o_orderpriority").reset_index(drop=True)

    late = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late = late[late["l_shipdate"]
                > late["o_orderdate"] + pd.Timedelta(days=75)]
    ref = late.drop_duplicates("o_orderkey") \
        .groupby("o_orderpriority").size().reset_index(name="order_count") \
        .sort_values("o_orderpriority").reset_index(drop=True)
    assert len(out) == len(ref)
    assert (out["o_orderpriority"] == ref["o_orderpriority"]).all()
    assert (out["order_count"].to_numpy()
            == ref["order_count"].to_numpy()).all()


def test_q15_keeps_ties(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import q15_top_supplier
    # suppliers 1 and 2 tie exactly at the max; 3 trails
    li = pd.DataFrame({
        "l_suppkey": [1, 1, 2, 3],
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 4),
        "l_extendedprice": [100.0, 100.0, 200.0, 50.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0]})
    supplier = pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["s1", "s2", "s3"],
        "s_nationkey": 0, "s_acctbal": 0.0})
    _write(tmp_path, lineitem=li, supplier=supplier)

    out = q15_top_supplier(str(tmp_path)).to_pandas()
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["s_name"]) == ["s1", "s2"]
    assert np.allclose(out["total_revenue"], [200.0, 200.0])


def test_q21_sole_late_logic(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import \
        q21_sole_late_supplier
    d0 = pd.to_datetime("1996-01-01")
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4],
        "o_orderstatus": ["F", "F", "F", "O"],
        "o_orderdate": [d0] * 4,
        "o_custkey": 0, "o_totalprice": 1.0,
        "o_orderpriority": "1-URGENT"})
    late, ontime = d0 + pd.Timedelta(days=100), d0 + pd.Timedelta(days=10)
    li = pd.DataFrame({
        # order 1: suppliers 10 (late), 11 (on time) -> supplier 10 counts
        # order 2: suppliers 10, 11 both late -> nobody counts
        # order 3: single supplier 10 late -> not multi-supplier
        # order 4: status O -> excluded even though sole-late shape
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4],
        "l_suppkey": [10, 11, 10, 11, 10, 10, 11],
        "l_shipdate": [late, ontime, late, late, late, late, ontime]})
    supplier = pd.DataFrame({
        "s_suppkey": [10, 11], "s_name": ["sa", "sb"],
        "s_nationkey": 0, "s_acctbal": 0.0})
    _write(tmp_path, orders=orders, lineitem=li, supplier=supplier)

    out = q21_sole_late_supplier(str(tmp_path)).to_pandas()
    assert list(out["s_suppkey"]) == [10]
    assert list(out["numwait"]) == [1]


def test_suppliers_per_parttype_distinct(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import \
        suppliers_per_parttype
    rng = np.random.default_rng(3)
    part = pd.DataFrame({
        "p_partkey": np.arange(30),
        "p_name": "x", "p_brand": "Brand#1",
        "p_type": rng.choice(["A", "B", "C"], 30),
        "p_size": 1, "p_retailprice": 1.0})
    li = pd.DataFrame({
        "l_partkey": rng.integers(0, 30, 500),
        "l_suppkey": rng.integers(0, 8, 500)})
    _write(tmp_path, part=part, lineitem=li)

    out = suppliers_per_parttype(str(tmp_path)).to_pandas() \
        .sort_values("p_type").reset_index(drop=True)
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    ref = m.groupby("p_type").agg(
        n_suppliers=("l_suppkey", "nunique"),
        n_parts=("l_partkey", "nunique")).reset_index()
    assert (out["p_type"] == ref["p_type"]).all()
    assert (out["n_suppliers"].to_numpy()
            == ref["n_suppliers"].to_numpy()).all()
    assert (out["n_parts"].to_numpy() == ref["n_parts"].to_numpy()).all()


def test_min_cost_supplier_argmin_tiebreak(tmp_path):
    """Cheapest ASIA offer per part type; exact price ties break to
    the smallest suppkey (the packed lexicographic min)."""
    from cheque_ocr_project_ray.relational.tpch_extra import (
        min_cost_supplier)
    region = pd.DataFrame({"r_regionkey": [0, 1],
                           "r_name": ["ASIA", "EUROPE"]})
    nation = pd.DataFrame({"n_nationkey": [0, 1],
                           "n_name": ["N0", "N1"],
                           "n_regionkey": [0, 1]})
    supplier = pd.DataFrame({
        "s_suppkey": [1, 2, 3],
        "s_name": ["SA", "SB", "SEU"],
        "s_nationkey": [0, 0, 1]})          # 3 is outside ASIA
    part = pd.DataFrame({"p_partkey": [10, 20],
                         "p_type": ["PROMO", "SMALL"]})
    li = pd.DataFrame({
        "l_partkey": [10, 10, 10, 20],
        "l_suppkey": [2, 1, 3, 1],          # 3's cheaper offer excluded
        "l_extendedprice": [5.00, 5.00, 1.00, 7.50]})
    _write(tmp_path, region=region, nation=nation,
           supplier=supplier, part=part, lineitem=li)
    out = min_cost_supplier(str(tmp_path)).to_pandas() \
        .sort_values("p_type").reset_index(drop=True)
    assert out["p_type"].tolist() == ["PROMO", "SMALL"]
    assert out["min_price"].tolist() == [5.00, 7.50]
    assert out["s_suppkey"].tolist() == [1, 1]  # tie -> smallest key


def test_supplier_value_share_above_average(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import (
        supplier_value_share)
    li = pd.DataFrame({
        "l_suppkey": [1, 2, 3],
        "l_extendedprice": [10.0, 20.0, 60.0]})  # avg = 30
    _write(tmp_path, lineitem=li)
    out = supplier_value_share(str(tmp_path)).to_pandas()
    assert out["s_suppkey"].tolist() == [3]
    assert out["total_value"].tolist() == [60.0]


def test_promo_part_suppliers_threshold(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import (
        promo_part_suppliers)
    part = pd.DataFrame({"p_partkey": [10, 20],
                         "p_type": ["PROMO", "SMALL"]})
    supplier = pd.DataFrame({"s_suppkey": [1, 2],
                             "s_name": ["SA", "SB"],
                             "s_nationkey": [0, 0]})
    li = pd.DataFrame({
        "l_partkey": [10, 10, 20],
        "l_suppkey": [1, 2, 2],
        # supplier 1 ships 30 promo, 2 ships 10 (avg 20; 1.05*avg=21);
        # the SMALL row must not count toward supplier 2
        "l_quantity": [30.0, 10.0, 500.0]})
    _write(tmp_path, part=part, supplier=supplier, lineitem=li)
    out = promo_part_suppliers(str(tmp_path)).to_pandas()
    assert out["s_suppkey"].tolist() == [1]
    assert out["promo_qty"].tolist() == [30.0]


def test_min_cost_supplier_distributed_path(tmp_path):
    """bound=0 forces the packed-min merge onto the distributed
    branch — identical argmin/tie-break results."""
    from cheque_ocr_project_ray.relational.tpch_extra import (
        min_cost_supplier)
    region = pd.DataFrame({"r_regionkey": [0], "r_name": ["ASIA"]})
    nation = pd.DataFrame({"n_nationkey": [0], "n_name": ["N0"],
                           "n_regionkey": [0]})
    supplier = pd.DataFrame({"s_suppkey": [1, 2],
                             "s_name": ["SA", "SB"],
                             "s_nationkey": [0, 0]})
    part = pd.DataFrame({"p_partkey": [10], "p_type": ["PROMO"]})
    li = pd.DataFrame({"l_partkey": [10, 10],
                       "l_suppkey": [2, 1],
                       "l_extendedprice": [5.0, 5.0]})
    _write(tmp_path, region=region, nation=nation,
           supplier=supplier, part=part, lineitem=li)
    a = min_cost_supplier(str(tmp_path)).to_pandas()
    b = min_cost_supplier(str(tmp_path), bound=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["s_suppkey"].tolist() == [1]


def test_q12_band_and_priority_counts(tmp_path):
    """FAST/SLOW banding at the 30-day boundary (<= is FAST) and the
    high/low priority partition must match a pandas reference."""
    from cheque_ocr_project_ray.relational.tpch_extra import (
        q12_ship_delay_priority)
    rng = np.random.default_rng(12)
    n_orders = 200
    odates = pd.to_datetime("1996-01-01") + pd.to_timedelta(
        rng.integers(0, 300, n_orders), unit="D")
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders),
        "o_custkey": 0, "o_orderstatus": "O", "o_totalprice": 1.0,
        "o_orderdate": odates,
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"], n_orders)})
    n_li = 900
    ok = rng.integers(0, n_orders, n_li)
    delays = rng.integers(0, 61, n_li)   # 30 lands exactly on the edge
    li = pd.DataFrame({
        "l_orderkey": ok,
        "l_shipdate": odates.values[ok] + pd.to_timedelta(delays, "D")})
    _write(tmp_path, orders=orders, lineitem=li)

    out = q12_ship_delay_priority(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)

    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j = j[(j["l_shipdate"] >= "1996-01-01")
          & (j["l_shipdate"] < "1997-01-01")]
    j["delay_band"] = np.where(
        j["l_shipdate"] <= j["o_orderdate"] + pd.Timedelta(days=30),
        "FAST", "SLOW")
    j["high"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    ref = j.groupby("delay_band").agg(
        high_line_count=("high", "sum"),
        low_line_count=("high", lambda s: (~s).sum())).reset_index()
    ref = ref.sort_values("delay_band").reset_index(drop=True)
    assert (out["delay_band"] == ref["delay_band"]).all()
    assert (out["high_line_count"].to_numpy()
            == ref["high_line_count"].to_numpy()).all()
    assert (out["low_line_count"].to_numpy()
            == ref["low_line_count"].to_numpy()).all()


def test_q22_threshold_and_antijoin(tmp_path):
    """Above-average-positive-balance filter is exact-int
    (cents·n > total) and the NOT EXISTS drops exactly the customers
    with an urgent order."""
    from cheque_ocr_project_ray.relational.tpch_extra import (
        q22_global_sales_opportunity)
    rng = np.random.default_rng(22)
    n = 120
    cust = pd.DataFrame({
        "c_custkey": np.arange(n),
        "c_nationkey": rng.integers(0, 3, n),
        "c_acctbal": np.round(rng.uniform(-500, 5000, n), 2)})
    nation = pd.DataFrame({"n_nationkey": [0, 1, 2],
                           "n_name": ["NA", "NB", "NC"]})
    # half the customers get an urgent order, some get only non-urgent
    ok = rng.integers(0, n, 200)
    orders = pd.DataFrame({
        "o_custkey": ok,
        "o_orderpriority": rng.choice(
            ["1-URGENT", "3-MEDIUM"], 200, p=[0.5, 0.5])})
    _write(tmp_path, customer=cust, nation=nation, orders=orders)

    out = q22_global_sales_opportunity(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)

    cents = np.round(cust["c_acctbal"] * 100).astype("int64")
    pos = cents[cents > 0]
    rich = cust[cents * len(pos) > pos.sum()]
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                            "o_custkey"])
    keep = rich[~rich["c_custkey"].isin(urgent)]
    ref = keep.merge(nation, left_on="c_nationkey",
                     right_on="n_nationkey") \
        .groupby("n_name") \
        .agg(numcust=("c_custkey", "size"), cents=("c_acctbal", lambda
             s: np.round(s * 100).astype("int64").sum())) \
        .reset_index().rename(columns={"n_name": "nation"})
    ref["totacctbal"] = ref["cents"] / 100.0
    ref = ref[["nation", "numcust", "totacctbal"]] \
        .sort_values("nation").reset_index(drop=True)
    out["numcust"] = out["numcust"].astype("int64")
    pd.testing.assert_frame_equal(out, ref)
