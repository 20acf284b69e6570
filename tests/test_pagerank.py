"""trade_pagerank vs a dense numpy power iteration on a handcrafted
bipartite graph, plus invariants (probability mass, determinism)."""

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    for name, df in tables.items():
        df.to_parquet(tmp_path / f"{name}.parquet")


def _tiny_graph(tmp_path):
    # customers 0,1,2; suppliers 0,1.  Edges: (0,0) (0,1) (1,0) (2,1)
    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12, 13, 14],
        "o_custkey": [0, 0, 1, 2, 0]})      # order 14 dups edge (0,1)
    li = pd.DataFrame({
        "l_orderkey": [10, 11, 12, 13, 14],
        "l_suppkey": [0, 1, 0, 1, 1]})
    _write(tmp_path, orders=orders, lineitem=li)


def _numpy_pagerank(edges, rounds=2, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(rounds):
        nxt = np.full(n, 0.15 / n)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / deg[idx[a]]
            nxt[idx[a]] += d * r[idx[b]] / deg[idx[b]]
        r = nxt
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy(tmp_path):
    from cheque_ocr_project_ray.relational.pagerank import trade_pagerank
    _tiny_graph(tmp_path)
    out = trade_pagerank(str(tmp_path)).to_pandas()
    # duplicate (0,1) order must not double the edge
    assert len(out) == 5
    edges = [(2 * 0, 2 * 0 + 1), (2 * 0, 2 * 1 + 1),
             (2 * 1, 2 * 0 + 1), (2 * 2, 2 * 1 + 1)]
    ref = _numpy_pagerank(edges)
    for _, row in out.iterrows():
        node = 2 * int(row["key"]) + (1 if row["node_type"] == "supplier"
                                      else 0)
        assert abs(row["rank"] - ref[node]) < 1e-5, row
    # rank is a probability distribution after every synchronous round
    assert abs(out["rank"].sum() - 1.0) < 1e-4


def test_pagerank_deterministic(tmp_path):
    from cheque_ocr_project_ray.relational.pagerank import trade_pagerank
    _tiny_graph(tmp_path)
    a = trade_pagerank(str(tmp_path)).to_pandas()
    b = trade_pagerank(str(tmp_path)).to_pandas()
    assert a.equals(b)


def test_pagerank_distributed_path_matches(tmp_path):
    """bound=0 forces every bounded-adaptive merge onto the
    distributed-groupby branch — results must be identical."""
    from cheque_ocr_project_ray.relational.pagerank import trade_pagerank
    _tiny_graph(tmp_path)
    a = trade_pagerank(str(tmp_path)).to_pandas()
    b = trade_pagerank(str(tmp_path), bound=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)
