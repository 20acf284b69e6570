"""Four-way star join vs a pandas reference."""

import numpy as np
import pandas as pd

from cheque_ocr_project_ray.relational.queries import profit_by_nation_year


def test_profit_star_matches_pandas(tmp_path):
    rng = np.random.default_rng(41)
    part = pd.DataFrame({
        "p_partkey": np.arange(40),
        "p_name": [f"p{i}" for i in range(40)],
        "p_brand": rng.choice(["Brand#1", "Brand#2"], 40),
        "p_type": "t", "p_size": 1, "p_retailprice": 1.0,
    })
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(10),
        "s_name": [f"s{i}" for i in range(10)],
        "s_nationkey": rng.integers(0, 3, 10),
        "s_acctbal": 0.0,
    })
    nation = pd.DataFrame({
        "n_nationkey": np.arange(3),
        "n_name": ["AAA", "BBB", "CCC"],
        "n_regionkey": 0,
    })
    n = 2000
    li = pd.DataFrame({
        "l_partkey": rng.integers(0, 40, n),
        "l_suppkey": rng.integers(0, 10, n),
        "l_shipdate": pd.to_datetime("1998-01-01")
        + pd.to_timedelta(rng.integers(0, 1000, n), unit="D"),
        "l_extendedprice": rng.uniform(10, 900, n).round(2),
        "l_discount": rng.integers(0, 11, n) / 100.0,
    })
    for name, df in [("part", part), ("supplier", supplier),
                     ("nation", nation), ("lineitem", li)]:
        df.to_parquet(tmp_path / f"{name}.parquet")

    out = profit_by_nation_year(str(tmp_path)).to_pandas() \
        .sort_values(["n_name", "yr"]).reset_index(drop=True)

    b1 = set(part.loc[part["p_brand"] == "Brand#1", "p_partkey"])
    m = li[li["l_partkey"].isin(b1)].copy()
    sn = supplier.merge(nation, left_on="s_nationkey",
                        right_on="n_nationkey")
    m = m.merge(sn[["s_suppkey", "n_name"]], left_on="l_suppkey",
                right_on="s_suppkey")
    m["du"] = (np.rint(m["l_extendedprice"] * 100)
               * (100 - np.rint(m["l_discount"] * 100)))
    m["yr"] = m["l_shipdate"].dt.year
    ref = (m.groupby(["n_name", "yr"])["du"].sum() / 10000.0) \
        .reset_index().rename(columns={"du": "profit"}) \
        .sort_values(["n_name", "yr"]).reset_index(drop=True)
    assert len(out) == len(ref)
    assert (out["n_name"] == ref["n_name"]).all()
    assert (out["yr"].to_numpy() == ref["yr"].to_numpy()).all()
    assert np.array_equal(out["profit"].to_numpy(),
                          ref["profit"].to_numpy())
