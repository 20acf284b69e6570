"""Semantic pins for embedding_mmr_topk and parts_top_per_nation
(SQL-twin equality runs in tools/check_oracle.py)."""

import numpy as np
import pandas as pd

from cheque_ocr_project_ray.relational.analytics_extra import \
    parts_top_per_nation
from cheque_ocr_project_ray.vector.queries import (MMR_K, MMR_LAMBDA,
                                                   embedding_mmr_topk)

SF = "/root/testdata/sf0.001"


def test_mmr_shape_and_first_pick():
    df = embedding_mmr_topk(SF)
    assert list(df.columns) == ["rnk", "vec_id", "rel", "mmr"]
    assert list(df["rnk"]) == list(range(1, MMR_K + 1))
    assert df["vec_id"].is_unique
    # first pick is the global relevance argmax → its mmr is λ·rel
    assert df["mmr"].iloc[0] == np.round(MMR_LAMBDA * df["rel"].iloc[0], 5)
    assert df["rel"].iloc[0] == df["rel"].max()
    # each later pick pays a diversity penalty: mmr < λ·rel
    later = df.iloc[1:]
    assert (later["mmr"] <= MMR_LAMBDA * later["rel"] + 1e-12).all()


def test_mmr_diversifies_vs_plain_topk():
    """The MMR set's max pairwise similarity must not exceed the plain
    top-k set's (that is the whole point of the re-rank)."""
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.vector import ann
    from cheque_ocr_project_ray.vector.queries import _emb, _query_vec

    mmr_ids = set(embedding_mmr_topk(SF)["vec_id"])
    top_ids = set(ann.brute_force_topk(_emb(SF), _query_vec(SF),
                                       k=MMR_K).to_pandas()["vec_id"])

    def max_pairwise(ids):
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "in", sorted(ids))])
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = m @ m.T
        np.fill_diagonal(s, -1)
        return s.max()

    assert max_pairwise(mmr_ids) <= max_pairwise(top_ids) + 1e-12


def test_parts_top_per_nation_ranks():
    df = parts_top_per_nation(SF).to_pandas()
    for _, g in df.groupby("n_name"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert len(g) <= 3
        r = g["revenue"].to_numpy()
        assert (np.diff(r) <= 1e-9).all()  # descending within nation

    # rank-1 revenue equals the brute-force per-nation max
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey",
                                  "l_extendedprice", "l_discount"])
    sup = pd.read_parquet(f"{SF}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(f"{SF}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey") \
          .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    cents = np.round(j["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    dc = np.round(j["l_discount"].to_numpy() * 100).astype(np.int64)
    j["du"] = cents * (100 - dc)
    best = j.groupby(["n_name", "l_partkey"])["du"].sum() \
            .groupby("n_name").max() / 10000.0
    got = df[df["rnk"] == 1].set_index("n_name")["revenue"]
    assert (got.sort_index() == best.sort_index()).all()
