"""Fixed-round PageRank over the customer↔supplier trade graph — the
join-based iterative-propagation operator shape.

k-means (vector/kmeans.py) shows the BROADCAST-iterative shape (tiny
model state shipped to every task each round); PageRank is its
complement: the model state (one rank per node) is itself corpus-sized,
so every round is a partitioned hash join of the edge list against the
rank table plus a combiner-merged re-aggregation — nothing is ever
broadcast or driver-collected except the final result stream.  This is
the shape iterative graph algorithms must take at 10^12-node scale.

Graph: nodes are customers and suppliers (disjoint id spaces via
2c / 2s+1 parity encoding); an undirected edge links c and s when any
lineitem ships from s inside an order placed by c.  Damping 0.85,
uniform init, a fixed number of synchronous rounds — deterministic,
and exactly re-derivable by the unrolled SQL twin.

Float parity: per-node neighbor sums accumulate in engine-merge order
vs DuckDB scan order (drift ~1e-16 relative), so ranks are rounded to
6 dp in both engines — far above the drift, far below the rank scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from cheque_ocr_project_ray.relational.joins import hash_join
from cheque_ocr_project_ray.relational.queries import _hash_shuffled, _pq
from cheque_ocr_project_ray.util import final_merge_sums, round_half_up

DAMPING = 0.85
ROUNDS = 2


def _distinct_edges(sf_dir: str, np_: int, bound: int = 2_000_000):
    """Distinct (custkey, suppkey) trade pairs: one fact-fact hash join
    on the order key, then per-batch pair dedup partials merged through
    the bounded-adaptive pipeline (distributed groupby past the bound)."""
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    j = hash_join(li.rename_columns({"l_orderkey": "o_orderkey"}),
                  orders, on="o_orderkey", num_partitions=np_ or None)

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"c": batch.column("o_custkey"),
                      "s": batch.column("l_suppkey"),
                      "n": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["c", "s"]).aggregate([("n", "sum")])
        return g.rename_columns(["c", "s", "n"])

    return final_merge_sums(
        j.map_batches(pairs, batch_format="pyarrow"),
        ["c", "s"], ["n"], np_=np_, bound=bound).drop_columns(["n"])


@_hash_shuffled
def trade_pagerank(sf_dir: str, np_: int = 0, rounds: int = ROUNDS,
                   bound: int = 2_000_000):
    """PageRank after ``rounds`` synchronous updates from uniform init.

    Output: (node_type, key, rank@6dp) — one row per customer or
    supplier that traded at all.
    """
    edges = _distinct_edges(sf_dir, np_, bound).materialize()

    def symmetric(batch: pa.Table) -> pa.Table:
        c = pc_cast_i64(batch.column("c"))
        s = pc_cast_i64(batch.column("s"))
        u = pa.chunked_array([pa.array(
            np.concatenate([2 * c.to_numpy(), 2 * s.to_numpy() + 1]))])
        v = pa.chunked_array([pa.array(
            np.concatenate([2 * s.to_numpy() + 1, 2 * c.to_numpy()]))])
        return pa.table({"u": u, "v": v})

    sym = edges.map_batches(symmetric, batch_format="pyarrow") \
        .materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"node": batch.column("u"),
                      "deg": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("node").aggregate([("deg", "sum")])
        return g.rename_columns(["node", "deg"])

    deg = final_merge_sums(
        sym.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], ["deg"], np_=np_, bound=bound).materialize()
    n_nodes = deg.count()
    if n_nodes == 0:
        return pd.DataFrame({"node_type": pd.Series([], dtype="object"),
                             "key": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})
    r0 = 1.0 / n_nodes
    base = 0.15 / n_nodes  # (1 - DAMPING)/N, written as the literal
    #                        0.15 in the SQL twin — same float op

    # ranks: Dataset[node, deg, r]
    def with_init(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "r", pa.array(np.full(batch.num_rows, r0)))

    ranks = deg.map_batches(with_init, batch_format="pyarrow")

    for _ in range(rounds):
        def contrib(batch: pa.Table) -> pa.Table:
            w = pa.compute.divide(
                batch.column("r"),
                pa.compute.cast(batch.column("deg"), pa.float64()))
            return pa.table({"u": batch.column("node"), "w": w})

        prop = hash_join(sym, ranks.map_batches(
            contrib, batch_format="pyarrow"),
            on="u", num_partitions=np_ or None)

        def sum_in(batch: pa.Table) -> pa.Table:
            t = pa.table({"node": batch.column("v"),
                          "w": batch.column("w")})
            g = t.group_by("node").aggregate([("w", "sum")])
            return g.rename_columns(["node", "w"])

        agg = final_merge_sums(
            prop.map_batches(sum_in, batch_format="pyarrow"),
            ["node"], ["w"], np_=np_, bound=bound)

        def update(batch: pa.Table) -> pa.Table:
            r = pa.compute.add(
                pa.scalar(base),
                pa.compute.multiply(pa.scalar(DAMPING),
                                    batch.column("w")))
            return pa.table({"node": batch.column("node"), "r": r})

        # re-attach deg for the next round's contribution
        ranks = hash_join(
            agg.map_batches(update, batch_format="pyarrow"),
            deg, on="node", num_partitions=np_ or None).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        is_sup = (node % 2).astype(bool)
        return pa.table({
            "node_type": pa.array(
                np.where(is_sup, "supplier", "customer")),
            "key": pa.array(node >> 1),
            "rank": pa.array(round_half_up(
                batch.column("r").to_numpy(zero_copy_only=False), 6)),
        })

    return ranks.map_batches(finish, batch_format="pyarrow") \
        .sort(["node_type", "key"])


def pc_cast_i64(col):
    import pyarrow.compute as pc
    return pc.cast(col, pa.int64())


TRADE_PAGERANK_SQL = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
sym AS (
  SELECT 2 * c AS u, 2 * s + 1 AS v FROM edges
  UNION ALL
  SELECT 2 * s + 1 AS u, 2 * c AS v FROM edges),
deg AS (SELECT u AS node, count(*) AS d FROM sym GROUP BY u),
n AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS (SELECT node, d, 1.0 / (SELECT n_nodes FROM n) AS r FROM deg),
p1 AS (
  SELECT sym.v AS node, sum(r0.r / r0.d) AS w
  FROM sym JOIN r0 ON sym.u = r0.node GROUP BY sym.v),
r1 AS (
  SELECT p1.node, deg.d,
         0.15 / (SELECT n_nodes FROM n) + 0.85 * p1.w AS r
  FROM p1 JOIN deg ON p1.node = deg.node),
p2 AS (
  SELECT sym.v AS node, sum(r1.r / r1.d) AS w
  FROM sym JOIN r1 ON sym.u = r1.node GROUP BY sym.v),
r2 AS (
  SELECT node, 0.15 / (SELECT n_nodes FROM n) + 0.85 * w AS r
  FROM p2)
SELECT CASE WHEN node % 2 = 1 THEN 'supplier' ELSE 'customer' END
           AS node_type,
       node // 2 AS key,
       round(r, 6) AS "rank"
FROM r2
ORDER BY node_type, key
"""
