"""Second wave of TPC-H-shaped relational pipelines — the query
families round 1 left uncovered, adapted to the tables this corpus
actually has (no partsupp; lineitem carries shipdate but not
commit/receipt dates, so "late" means shipped long after the order
date).  Every query here is oracled in DuckDB.

Scale notes (the shapes these queries are built to keep at 100 TB):
- EXISTS / semi-join families (Q4, Q21) reduce to per-key flag
  aggregation: one partitioned hash join on the order key, then
  combiner partials merged with the bounded-adaptive
  ``final_merge_sums`` (driver Arrow group_by while the partial
  stream is bounded, distributed groupby beyond — the same exchange
  either way at corpus scale).
- Dimension hops (part, supplier, nation, region) are broadcast
  lookups (``ray.put`` once, ``pc.index_in`` per batch) — never a
  shuffle.
- Top-k outputs (Q10, Q15) take per-batch local top-k before the
  tiny global sort; no full sort of the fact stream.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count as RayCount
from ray.data.aggregate import Sum as RaySum

from cheque_ocr_project_ray.relational.joins import hash_join
from cheque_ocr_project_ray.relational.queries import _hash_shuffled, _pq
from cheque_ocr_project_ray.util import (collect_table, final_merge_min,
                                         final_merge_sums, map_pool,
                                         money_units, round_half_up)


def _ts_us(y: int, m: int, d: int) -> int:
    """Naive-timestamp epoch microseconds (the tables store
    timestamp[us] without timezone)."""
    return int((datetime(y, m, d) - datetime(1970, 1, 1))
               .total_seconds()) * 1_000_000


_DAY_US = 86_400 * 1_000_000


def _ts_col_us(col) -> pa.ChunkedArray:
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def _du(batch: pa.Table) -> pa.Int64Array:
    """Exact discounted revenue in 1e-4 money units (int64)."""
    cents = money_units(batch.column("l_extendedprice"))
    return pc.multiply(cents, pc.subtract(
        pa.scalar(100, pa.int64()),
        money_units(batch.column("l_discount"))))


# --- Q4: orders with at least one late lineitem, by priority ---------
@_hash_shuffled
def q4_late_orders(sf_dir: str, np_: int = 0):
    """TPC-H Q4 adapted: EXISTS(late lineitem) per order in a one-year
    window, counted by priority.  The EXISTS collapses to: join →
    flag → distinct (order, priority) → count.  Distinctness is a
    min-merge over the pair key (bounded-adaptive; distributed
    groupby past the bound)."""
    lo, hi = _ts_us(1996, 1, 1), _ts_us(1997, 1, 1)

    def ofilter(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("o_orderdate"))
        keep = pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                       pc.less(us, pa.scalar(hi)))
        b = batch.filter(keep)
        return pa.table({"l_orderkey": b.column("o_orderkey"),
                         "o_orderpriority": b.column("o_orderpriority"),
                         "o_date_us": _ts_col_us(b.column("o_orderdate"))})

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(ofilter, batch_format="pyarrow")
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = hash_join(li, orders, on="l_orderkey",
                       num_partitions=np_ or None)

    def late_pairs(batch: pa.Table) -> pa.Table:
        ship = _ts_col_us(batch.column("l_shipdate"))
        late = pc.greater(ship, pc.add(batch.column("o_date_us"),
                                       pa.scalar(75 * _DAY_US)))
        b = batch.filter(late)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "o_orderpriority": b.column("o_orderpriority"),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["l_orderkey", "o_orderpriority"]).aggregate(
            [("one", "min")])
        return g.rename_columns(["l_orderkey", "o_orderpriority", "one"])

    distinct = final_merge_min(
        joined.map_batches(late_pairs, batch_format="pyarrow"),
        ["l_orderkey", "o_orderpriority"], ["one"], np_=np_)

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_orderpriority").aggregate([("one", "sum")])
        return g.rename_columns(["o_orderpriority", "order_count"])

    return final_merge_sums(
        distinct.map_batches(count_partial, batch_format="pyarrow"),
        ["o_orderpriority"], ["order_count"], np_=np_)


Q4_LATE_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 75 DAY)
GROUP BY o_orderpriority
"""


# --- Q5: local supplier volume within one region ----------------------
@_hash_shuffled
def q5_local_supplier_volume(sf_dir: str, np_: int = 0):
    """TPC-H Q5: revenue where the customer and the supplier share a
    nation inside one region.  The fact-to-fact edges (orders→customer
    on custkey, then →lineitem on orderkey) are partitioned hash
    joins; supplier/nation/region stay broadcast lookups."""
    nation = pq.read_table(str(Path(sf_dir) / "nation.parquet"))
    region = pq.read_table(str(Path(sf_dir) / "region.parquet"))
    rkey = region.filter(pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey")
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=rkey))
    nat_names = dict(zip(nat.column("n_nationkey").to_pylist(),
                         nat.column("n_name").to_pylist()))
    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey"])
    dims_ref = ray.put((nat.column("n_nationkey").combine_chunks(),
                        supplier.column("s_suppkey").combine_chunks(),
                        supplier.column("s_nationkey").combine_chunks()))

    lo, hi = _ts_us(1997, 1, 1), _ts_us(1998, 1, 1)

    def ofilter(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("o_orderdate"))
        keep = pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                       pc.less(us, pa.scalar(hi)))
        b = batch.filter(keep)
        return pa.table({"c_custkey": b.column("o_custkey"),
                         "o_orderkey": b.column("o_orderkey")})

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ofilter, batch_format="pyarrow")
    customer = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    oc = hash_join(orders, customer, on="c_custkey",
                   num_partitions=np_ or None)

    class RegionFilter:
        def __init__(self):
            self.region_nat, _, _ = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = pc.fill_null(pc.is_in(batch.column("c_nationkey"),
                                         value_set=self.region_nat), False)
            b = batch.filter(keep)
            return pa.table({"l_orderkey": b.column("o_orderkey"),
                             "c_nationkey": b.column("c_nationkey")})

    oc = oc.map_batches(RegionFilter, batch_format="pyarrow",
                        concurrency=(1, map_pool()))
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = hash_join(li, oc, on="l_orderkey", num_partitions=np_ or None)

    class LocalVolume:
        def __init__(self):
            _, self.skeys, self.snat = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            si = pc.index_in(batch.column("l_suppkey"),
                             value_set=self.skeys)
            s_nat = self.snat.take(si)
            keep = pc.fill_null(
                pc.equal(pc.cast(s_nat, pa.int64()),
                         pc.cast(batch.column("c_nationkey"), pa.int64())),
                False)
            b = batch.filter(keep)
            t = pa.table({"n_nationkey": pc.cast(s_nat.filter(keep),
                                                 pa.int64()),
                          "du": _du(b)})
            g = t.group_by("n_nationkey").aggregate([("du", "sum")])
            return g.rename_columns(["n_nationkey", "du"])

    agg = final_merge_sums(
        joined.map_batches(LocalVolume, batch_format="pyarrow",
                           concurrency=(1, map_pool())),
        ["n_nationkey"], ["du"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_name": [nat_names[int(k)] for k in b["n_nationkey"]],
            "revenue": b["du"] / 10000.0})

    return agg.map_batches(finish, batch_format="pandas")


Q5_LOCAL_VOLUME_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- Q10: top customers by returned-item revenue ----------------------
@_hash_shuffled
def q10_returned_revenue(sf_dir: str, np_: int = 0, k: int = 20):
    """TPC-H Q10: revenue lost to returns per customer over a 6-month
    order window, top 20.  Hash join on the order key, combiner
    partials per customer, customer/nation attributes broadcast onto
    the (bounded) aggregate, local top-k then a tiny global sort."""
    lo, hi = _ts_us(1996, 1, 1), _ts_us(1996, 7, 1)

    def ofilter(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("o_orderdate"))
        keep = pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                       pc.less(us, pa.scalar(hi)))
        b = batch.filter(keep)
        return pa.table({"l_orderkey": b.column("o_orderkey"),
                         "o_custkey": b.column("o_custkey")})

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ofilter, batch_format="pyarrow")

    def li_returned(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "du": _du(b)})

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_returnflag", "l_extendedprice",
              "l_discount"]) \
        .map_batches(li_returned, batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey",
                       num_partitions=np_ or None)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([("du", "sum")])
        return g.rename_columns(["o_custkey", "du"])

    agg = final_merge_sums(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], ["du"], np_=np_)

    customer = pq.read_table(str(Path(sf_dir) / "customer.parquet"),
                             columns=["c_custkey", "c_name", "c_acctbal",
                                      "c_nationkey"])
    nation = pq.read_table(str(Path(sf_dir) / "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    dim = customer.join(nation.rename_columns(["c_nationkey", "n_name"]),
                        keys="c_nationkey") \
        .select(["c_custkey", "c_name", "c_acctbal", "n_name"]) \
        .rename_columns(["o_custkey", "c_name", "c_acctbal", "n_name"])
    dim_ref = ray.put(dim)

    class Decorate:
        def __init__(self):
            self.dim = ray.get(dim_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            j = batch.join(self.dim, keys="o_custkey", join_type="inner")
            idx = pc.select_k_unstable(
                j, k, [("du", "descending"), ("o_custkey", "ascending")])
            return j.take(idx)

    top = agg.map_batches(Decorate, batch_format="pyarrow",
                          concurrency=(1, map_pool())) \
        .sort(["du", "o_custkey"], descending=[True, False]).limit(k)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"o_custkey": "c_custkey"})
        b["revenue"] = b["du"] / 10000.0
        return b[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]

    return top.map_batches(finish, batch_format="pandas")


Q10_RETURNED_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q14: promo revenue share (conditional-aggregate ratio) -----------
@_hash_shuffled
def q14_promo_revenue(sf_dir: str, np_: int = 0):
    """TPC-H Q14: share of revenue from PROMO parts in one ship year.
    Part is a broadcast lookup; the whole query is one combiner pass
    plus a single-row merge."""
    part = pq.read_table(str(Path(sf_dir) / "part.parquet"),
                         columns=["p_partkey", "p_type"])
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        pc.equal(part.column("p_type"),
                                 "PROMO").combine_chunks()))
    lo, hi = _ts_us(1997, 1, 1), _ts_us(1998, 1, 1)

    class Partial:
        def __init__(self):
            self.pkeys, self.is_promo = ray.get(part_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            us = _ts_col_us(batch.column("l_shipdate"))
            keep = pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                           pc.less(us, pa.scalar(hi)))
            b = batch.filter(keep)
            pi = pc.index_in(b.column("l_partkey"), value_set=self.pkeys)
            promo = pc.fill_null(self.is_promo.take(pi), False)
            du = _du(b)
            promo_du = pc.sum(pc.if_else(promo, du,
                                         pa.scalar(0, pa.int64())))
            return pa.table({
                "k": pa.array([0], pa.int64()),
                "promo_du": pa.array([promo_du.as_py() or 0], pa.int64()),
                "total_du": pa.array([pc.sum(du).as_py() or 0],
                                     pa.int64())})

    agg = final_merge_sums(
        _pq(sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(Partial, batch_format="pyarrow",
                     concurrency=(1, map_pool())),
        ["k"], ["promo_du", "total_du"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        promo = b["promo_du"] / 10000.0
        total = b["total_du"] / 10000.0
        return pd.DataFrame({
            "promo_pct": round_half_up(100.0 * promo / total, 4),
            "promo_revenue": promo, "total_revenue": total})

    return agg.map_batches(finish, batch_format="pandas")


Q14_PROMO_SQL = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE), 4) AS promo_pct,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                ELSE 0 END) AS DOUBLE) AS promo_revenue,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
"""


# --- Q15: top supplier(s) by windowed revenue --------------------------
@_hash_shuffled
def q15_top_supplier(sf_dir: str, np_: int = 0,
                     bound: int = 2_000_000):
    """TPC-H Q15: revenue per supplier over one quarter; keep the
    max-revenue supplier(s), ties included.  Exact integer money units
    make the max/tie comparison deterministic.  Within ``bound`` the
    argmax runs on the driver; past it the global max comes from a
    distributed aggregate and the tie filter runs distributed too —
    only the (tiny) tie set is ever collected."""
    lo, hi = _ts_us(1996, 1, 1), _ts_us(1996, 4, 1)

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("l_shipdate"))
        keep = pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                       pc.less(us, pa.scalar(hi)))
        b = batch.filter(keep)
        t = pa.table({"l_suppkey": b.column("l_suppkey"), "du": _du(b)})
        g = t.group_by("l_suppkey").aggregate([("du", "sum")])
        return g.rename_columns(["l_suppkey", "du"])

    agg = final_merge_sums(
        _pq(sf_dir, "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"], ["du"], np_=np_)

    agg = agg.materialize()
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "total_revenue": pa.array([], pa.float64())})
    if agg.count() <= bound:
        t = collect_table(agg)
        if t is None or t.num_rows == 0:
            return ray.data.from_arrow(empty)
        mx = pc.max(t.column("du"))
        best = t.filter(pc.equal(t.column("du"), mx))
    else:
        mx_val = agg.max("du")
        best = collect_table(agg.filter(
            expr=f"du == {int(mx_val)}").materialize())
        if best is None or best.num_rows == 0:
            return ray.data.from_arrow(empty)
    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_name"])
    out = best.rename_columns(["s_suppkey", "du"]).join(
        supplier, keys="s_suppkey", join_type="inner") \
        .sort_by("s_suppkey")
    return ray.data.from_arrow(pa.table({
        "s_suppkey": out.column("s_suppkey"),
        "s_name": out.column("s_name"),
        "total_revenue": pa.array(out.column("du").to_numpy() / 10000.0)}))


Q15_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total = (SELECT max(total) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q19: disjunctive brand/size/quantity predicate --------------------
@_hash_shuffled
def q19_disjunctive_revenue(sf_dir: str, np_: int = 0):
    """TPC-H Q19: revenue under a three-arm OR of brand × size ×
    quantity ranges — the vectorized-predicate showcase.  Part
    attributes are broadcast; the three arms evaluate as Arrow
    boolean kernels per batch."""
    part = pq.read_table(str(Path(sf_dir) / "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_brand").combine_chunks(),
                        part.column("p_size").combine_chunks()))
    ARMS = [("Brand#12", 1, 11, 1, 5),
            ("Brand#23", 10, 20, 1, 10),
            ("Brand#15", 20, 30, 1, 15)]

    class Partial:
        def __init__(self):
            self.pkeys, self.brand, self.size = ray.get(part_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pi = pc.index_in(batch.column("l_partkey"),
                             value_set=self.pkeys)
            brand = self.brand.take(pi)
            size = pc.cast(self.size.take(pi), pa.int64())
            qty = batch.column("l_quantity")
            keep = pa.array(np.zeros(batch.num_rows, bool))
            for b_name, qlo, qhi, slo, shi in ARMS:
                arm = pc.and_(
                    pc.and_(pc.equal(brand, b_name),
                            pc.and_(pc.greater_equal(size,
                                                     pa.scalar(slo)),
                                    pc.less_equal(size, pa.scalar(shi)))),
                    pc.and_(pc.greater_equal(qty, pa.scalar(float(qlo))),
                            pc.less_equal(qty, pa.scalar(float(qhi)))))
                keep = pc.or_(keep, pc.fill_null(arm, False))
            b = batch.filter(keep)
            du = _du(b)
            return pa.table({
                "k": pa.array([0], pa.int64()),
                "du": pa.array([pc.sum(du).as_py() or 0], pa.int64()),
                "n_items": pa.array([b.num_rows], pa.int64())})

    agg = final_merge_sums(
        _pq(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(Partial, batch_format="pyarrow",
                     concurrency=(1, map_pool())),
        ["k"], ["du", "n_items"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": b["du"] / 10000.0,
                             "n_items": b["n_items"]})

    return agg.map_batches(finish, batch_format="pandas")


Q19_DISJUNCTIVE_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


# --- Q21: sole late supplier in multi-supplier orders -------------------
@_hash_shuffled
def q21_sole_late_supplier(sf_dir: str, np_: int = 0):
    """TPC-H Q21 adapted (late = shipped >75 days after the order
    date): suppliers who were the ONLY late shipper in a
    multi-supplier finished order.  The double-EXISTS collapses to
    per-(order, supplier) late flags, then per-order counts — three
    bounded-adaptive merges around one partitioned hash join, all
    combiner-first (``sum(late × suppkey)`` recovers the lone late
    supplier without carrying rows)."""
    def ofilter(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("o_orderstatus"), "F"))
        return pa.table({"l_orderkey": b.column("o_orderkey"),
                         "o_date_us": _ts_col_us(b.column("o_orderdate"))})

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderstatus", "o_orderdate"]) \
        .map_batches(ofilter, batch_format="pyarrow")
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_shipdate"])
    joined = hash_join(li, orders, on="l_orderkey",
                       num_partitions=np_ or None)

    def flag_partial(batch: pa.Table) -> pa.Table:
        ship = _ts_col_us(batch.column("l_shipdate"))
        late = pc.cast(pc.greater(
            ship, pc.add(batch.column("o_date_us"),
                         pa.scalar(75 * _DAY_US))), pa.int64())
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "l_suppkey": batch.column("l_suppkey"),
                      "late_cnt": late})
        g = t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("late_cnt", "sum")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "late_cnt"])

    flags = final_merge_sums(
        joined.map_batches(flag_partial, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"], ["late_cnt"], np_=np_)

    def order_partial(batch: pa.Table) -> pa.Table:
        late = pc.cast(pc.greater(batch.column("late_cnt"),
                                  pa.scalar(0, pa.int64())), pa.int64())
        t = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "ns": pa.array(np.ones(batch.num_rows, np.int64)),
            "nl": late,
            "lsk": pc.multiply(late, batch.column("l_suppkey"))})
        g = t.group_by("l_orderkey").aggregate(
            [("ns", "sum"), ("nl", "sum"), ("lsk", "sum")])
        return g.rename_columns(["l_orderkey", "ns", "nl", "lsk"])

    per_order = final_merge_sums(
        flags.map_batches(order_partial, batch_format="pyarrow"),
        ["l_orderkey"], ["ns", "nl", "lsk"], np_=np_)

    def count_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch.column("ns"),
                                        pa.scalar(2, pa.int64())),
                       pc.equal(batch.column("nl"),
                                pa.scalar(1, pa.int64())))
        b = batch.filter(keep)
        t = pa.table({"s_suppkey": b.column("lsk"),
                      "numwait": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by("s_suppkey").aggregate([("numwait", "sum")])
        return g.rename_columns(["s_suppkey", "numwait"])

    agg = final_merge_sums(
        per_order.map_batches(count_partial, batch_format="pyarrow"),
        ["s_suppkey"], ["numwait"], np_=np_)

    t = collect_table(agg.materialize())
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "numwait": pa.array([], pa.int64())})
    if t is None or t.num_rows == 0:
        return ray.data.from_arrow(empty)
    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_name"])
    out = t.join(supplier, keys="s_suppkey", join_type="inner") \
        .sort_by("s_suppkey")
    return ray.data.from_arrow(out.select(
        ["s_suppkey", "s_name", "numwait"]))


Q21_SOLE_LATE_SQL = """
WITH flags AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
             THEN 1 ELSE 0 END) AS late
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
per_order AS (
  SELECT l_orderkey, count(*) AS ns,
         sum(late) AS nl, sum(late * l_suppkey) AS lsk
  FROM flags GROUP BY 1)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM per_order
JOIN supplier ON s_suppkey = lsk
WHERE ns >= 2 AND nl = 1
GROUP BY s_suppkey, s_name
ORDER BY s_suppkey
"""


# --- distinct-count-per-group: suppliers and parts per part type -------
@_hash_shuffled
def suppliers_per_parttype(sf_dir: str, np_: int = 0):
    """COUNT(DISTINCT) per group, the two-stage way that scales: batch
    pre-dedup → min-merge per (group, member) → counted per group.
    No per-group row materialization — the 100-TB shape for distinct
    counting (exact; the HLL sketch family covers the approximate
    side)."""
    part = pq.read_table(str(Path(sf_dir) / "part.parquet"),
                         columns=["p_partkey", "p_type"])
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_type").combine_chunks()))

    class Pairs:
        def __init__(self):
            self.pkeys, self.ptype = ray.get(part_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pi = pc.index_in(batch.column("l_partkey"),
                             value_set=self.pkeys)
            t = pa.table({"p_type": self.ptype.take(pi),
                          "l_suppkey": batch.column("l_suppkey"),
                          "l_partkey": batch.column("l_partkey"),
                          "one": pa.array(np.ones(batch.num_rows,
                                                  np.int64))})
            s = t.group_by(["p_type", "l_suppkey"]).aggregate(
                [("one", "min")]).rename_columns(
                ["p_type", "member", "one"])
            p = t.group_by(["p_type", "l_partkey"]).aggregate(
                [("one", "min")]).rename_columns(
                ["p_type", "member", "one"])
            s = s.append_column("kind", pa.array(["s"] * s.num_rows))
            p = p.append_column("kind", pa.array(["p"] * p.num_rows))
            return pa.concat_tables([s, p])

    pairs = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(Pairs, batch_format="pyarrow",
                     concurrency=(1, map_pool()))
    distinct = final_merge_min(pairs, ["p_type", "member", "kind"],
                               ["one"], np_=np_)

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["p_type", "kind"]).aggregate([("one", "sum")])
        return g.rename_columns(["p_type", "kind", "n"])

    counts = final_merge_sums(
        distinct.map_batches(count_partial, batch_format="pyarrow"),
        ["p_type", "kind"], ["n"], np_=np_)

    t = collect_table(counts.materialize())
    if t is None or t.num_rows == 0:
        return ray.data.from_arrow(pa.table({
            "p_type": pa.array([], pa.string()),
            "n_suppliers": pa.array([], pa.int64()),
            "n_parts": pa.array([], pa.int64())}))
    df = t.to_pandas().pivot(index="p_type", columns="kind",
                             values="n").reset_index()
    return ray.data.from_pandas(pd.DataFrame({
        "p_type": df["p_type"],
        "n_suppliers": df["s"].astype(np.int64),
        "n_parts": df["p"].astype(np.int64)}))


SUPPLIERS_PER_PARTTYPE_SQL = """
SELECT p_type,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts
FROM lineitem
JOIN part ON p_partkey = l_partkey
GROUP BY p_type
"""


# --- Q6: forecasting revenue change (pure filter + scalar aggregate) --
@_hash_shuffled
def q6_forecast_revenue(sf_dir: str, np_: int = 0):
    """TPC-H Q6: one-table predicate (ship year, discount band,
    quantity cap) and a single exact revenue sum — the minimal
    filter→aggregate shape; no join, no per-key shuffle at all."""
    lo, hi = _ts_us(1996, 1, 1), _ts_us(1997, 1, 1)

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("l_shipdate"))
        disc_u = money_units(batch.column("l_discount"))
        keep = pc.and_(
            pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                    pc.less(us, pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(disc_u,
                                         pa.scalar(5, pa.int64())),
                        pc.less_equal(disc_u, pa.scalar(7, pa.int64()))),
                pc.less(batch.column("l_quantity"), pa.scalar(24.0))))
        b = batch.filter(keep)
        rev = pc.multiply(money_units(b.column("l_extendedprice")),
                          money_units(b.column("l_discount")))
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "du": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_items": pa.array([b.num_rows], pa.int64())})

    agg = final_merge_sums(
        _pq(sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["k"], ["du", "n_items"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": b["du"] / 10000.0,
                             "n_items": b["n_items"]})

    return agg.map_batches(finish, batch_format="pandas")


Q6_FORECAST_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- Q8: national market share within one region ----------------------
Q8_NATION = "NATION_2"
Q8_REGION = "ASIA"


@_hash_shuffled
def q8_market_share(sf_dir: str, np_: int = 0):
    """TPC-H Q8: the share of one supplier nation's revenue in a
    region's customer market, by order year.  Orders (filtered to the
    region's customers via a broadcast key set) hash-join lineitem;
    the supplier-nation flag is a broadcast lookup; the share is a
    ratio of two exact integer sums per year."""
    nation = pq.read_table(str(Path(sf_dir) / "nation.parquet"))
    region = pq.read_table(str(Path(sf_dir) / "region.parquet"))
    rkey = region.filter(pc.equal(region.column("r_name"), Q8_REGION)) \
        .column("r_regionkey")
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=rkey))
    customer = pq.read_table(str(Path(sf_dir) / "customer.parquet"),
                             columns=["c_custkey", "c_nationkey"])
    cust_keys = customer.filter(pc.is_in(
        customer.column("c_nationkey"),
        value_set=nat.column("n_nationkey"))).column("c_custkey")
    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey"])
    target_nk = nation.filter(pc.equal(nation.column("n_name"),
                                       Q8_NATION)).column("n_nationkey")
    dims_ref = ray.put((cust_keys.combine_chunks(),
                        supplier.column("s_suppkey").combine_chunks(),
                        pc.is_in(supplier.column("s_nationkey"),
                                 value_set=target_nk).combine_chunks()))

    class OrderFilter:
        def __init__(self):
            self.ckeys, _, _ = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            b = batch.filter(pc.is_in(batch.column("o_custkey"),
                                      value_set=self.ckeys))
            return pa.table({
                "l_orderkey": b.column("o_orderkey"),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                                  pa.int64())})

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(OrderFilter, batch_format="pyarrow",
                     concurrency=(1, map_pool()))
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    joined = hash_join(li, orders, on="l_orderkey",
                       num_partitions=np_ or None)

    class SharePartial:
        def __init__(self):
            _, self.skeys, self.is_target = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            si = pc.index_in(batch.column("l_suppkey"),
                             value_set=self.skeys)
            target = pc.fill_null(self.is_target.take(si), False)
            du = _du(batch)
            t = pa.table({
                "o_year": batch.column("o_year"),
                "nation_du": pc.if_else(target, du,
                                        pa.scalar(0, pa.int64())),
                "total_du": du})
            g = t.group_by("o_year").aggregate(
                [("nation_du", "sum"), ("total_du", "sum")])
            return g.rename_columns(["o_year", "nation_du", "total_du"])

    agg = final_merge_sums(
        joined.map_batches(SharePartial, batch_format="pyarrow",
                           concurrency=(1, map_pool())),
        ["o_year"], ["nation_du", "total_du"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        nat_rev = b["nation_du"] / 10000.0
        tot_rev = b["total_du"] / 10000.0
        return pd.DataFrame({
            "o_year": b["o_year"],
            "mkt_share": round_half_up(nat_rev / tot_rev, 6),
            "total_revenue": tot_rev})

    return agg.map_batches(finish, batch_format="pandas")


Q8_MARKET_SHARE_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN sn.n_name = '{Q8_NATION}'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE), 6) AS mkt_share,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE r_name = '{Q8_REGION}'
GROUP BY o_year
"""


# --- market-basket co-occurrence (distributed self-join) --------------
@_hash_shuffled
def part_type_basket(sf_dir: str, np_: int = 0):
    """Part types bought together: distinct (order, type) pairs
    SELF-JOIN on the order key → unordered type pairs with
    co-occurrence counts and support.  The self-join is the same
    partitioned hash exchange as any large-large join; the pair
    matrix is |types|² — driver-tiny."""
    part = pq.read_table(str(Path(sf_dir) / "part.parquet"),
                         columns=["p_partkey", "p_type"])
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_type").combine_chunks()))

    class OrderTypes:
        def __init__(self):
            self.pkeys, self.ptype = ray.get(part_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pi = pc.index_in(batch.column("l_partkey"),
                             value_set=self.pkeys)
            t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                          "p_type": self.ptype.take(pi),
                          "one": pa.array(np.ones(batch.num_rows,
                                                  np.int64))})
            g = t.group_by(["l_orderkey", "p_type"]).aggregate(
                [("one", "min")])
            return g.rename_columns(["l_orderkey", "p_type", "one"])

    pairs_src = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(OrderTypes, batch_format="pyarrow",
                     concurrency=(1, map_pool()))
    distinct = final_merge_min(pairs_src, ["l_orderkey", "p_type"],
                               ["one"], np_=np_).drop_columns(["one"])
    right = distinct.map_batches(
        lambda b: b.rename_columns(["l_orderkey", "type_b"]),
        batch_format="pyarrow")
    joined = hash_join(distinct, right, on="l_orderkey",
                       num_partitions=np_ or None)

    def pair_partial(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch.column("p_type"), batch.column("type_b"))
        b = batch.filter(keep)
        t = pa.table({"type_a": b.column("p_type"),
                      "type_b": b.column("type_b"),
                      "n_orders": pa.array(np.ones(b.num_rows,
                                                   np.int64))})
        g = t.group_by(["type_a", "type_b"]).aggregate(
            [("n_orders", "sum")])
        return g.rename_columns(["type_a", "type_b", "n_orders"])

    n_total = pq.ParquetFile(
        str(Path(sf_dir) / "orders.parquet")).metadata.num_rows

    agg = final_merge_sums(
        joined.map_batches(pair_partial, batch_format="pyarrow"),
        ["type_a", "type_b"], ["n_orders"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["support"] = round_half_up(
            b["n_orders"].astype(np.float64) / n_total, 6)
        return b

    return agg.map_batches(finish, batch_format="pandas")


PART_TYPE_BASKET_SQL = """
WITH ot AS (
  SELECT DISTINCT l_orderkey, p_type
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT a.p_type AS type_a, b.p_type AS type_b,
       count(*) AS n_orders,
       round(CAST(count(*) AS DOUBLE)
             / (SELECT count(*) FROM orders), 6) AS support
FROM ot a JOIN ot b
  ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
GROUP BY 1, 2
"""


# --- distribution of group sizes (lineitems per order) ----------------
@_hash_shuffled
def order_size_histogram(sf_dir: str, np_: int = 0):
    """How many lineitems does an order have?  The group-size
    distribution: per-order counts reduce through the combiner
    (bounded-adaptive merge over the order-keyed partials), then the
    histogram of those counts folds driver-side.  Exact integers
    end-to-end."""
    from cheque_ocr_project_ray.util import collect_table
    import ray.data as _rd

    ds = _pq(sf_dir, "lineitem", ["l_orderkey"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("l_orderkey").aggregate([("n", "sum")])
        return g.rename_columns(["l_orderkey", "n"])

    per_order = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"], ["n"], np_=np_)

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"order_size": batch.column("n"),
                      "n_orders": pa.array(np.ones(batch.num_rows,
                                                   np.int64))})
        g = t.group_by("order_size").aggregate([("n_orders", "sum")])
        return g.rename_columns(["order_size", "n_orders"])

    # second merge keyed by the SIZE (tiny domain): the histogram
    # never needs the per-order table on the driver at any scale
    return final_merge_sums(
        per_order.map_batches(hist_partial, batch_format="pyarrow"),
        ["order_size"], ["n_orders"], np_=np_)


ORDER_SIZE_HISTOGRAM_SQL = """
WITH c AS (
  SELECT l_orderkey, count(*) AS order_size
  FROM lineitem GROUP BY l_orderkey)
SELECT order_size, count(*) AS n_orders
FROM c GROUP BY order_size
"""


# --- entity-360 profile: supplier scorecard ---------------------------
@_hash_shuffled
def supplier_scorecard(sf_dir: str, np_: int = 0):
    """Multi-metric supplier profile in one pass over the joined fact
    stream: exact revenue, item count, DISTINCT part count (two-stage
    dedup), and late-shipment rate (>75 days after the order date).
    One partitioned hash join feeds two combiner reductions (the
    distinct-part stream reduces to one count per supplier through a
    second merge — the raw pair stream never hits the driver);
    supplier names decorate the (supplier-bounded) result."""
    from cheque_ocr_project_ray.util import collect_table
    import ray.data as _rd

    def ofilter(batch: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": batch.column("o_orderkey"),
                         "o_date_us": _ts_col_us(
                             batch.column("o_orderdate"))})

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(ofilter, batch_format="pyarrow")
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_partkey", "l_shipdate",
              "l_extendedprice", "l_discount"])
    joined = hash_join(li, orders, on="l_orderkey",
                       num_partitions=np_ or None).materialize()

    def metric_partial(batch: pa.Table) -> pa.Table:
        ship = _ts_col_us(batch.column("l_shipdate"))
        late = pc.cast(pc.greater(
            ship, pc.add(batch.column("o_date_us"),
                         pa.scalar(75 * _DAY_US))), pa.int64())
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "n_items": pa.array(np.ones(batch.num_rows,
                                                  np.int64)),
                      "du": _du(batch), "n_late": late})
        g = t.group_by("l_suppkey").aggregate(
            [("n_items", "sum"), ("du", "sum"), ("n_late", "sum")])
        return g.rename_columns(["l_suppkey", "n_items", "du",
                                 "n_late"])

    metrics = collect_table(final_merge_sums(
        joined.map_batches(metric_partial, batch_format="pyarrow"),
        ["l_suppkey"], ["n_items", "du", "n_late"], np_=np_)
        .materialize())

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "l_partkey": batch.column("l_partkey"),
                      "one": pa.array(np.ones(batch.num_rows,
                                              np.int64))})
        g = t.group_by(["l_suppkey", "l_partkey"]).aggregate(
            [("one", "min")])
        return g.rename_columns(["l_suppkey", "l_partkey", "one"])

    distinct_pairs = final_merge_min(
        joined.map_batches(pair_partial, batch_format="pyarrow"),
        ["l_suppkey", "l_partkey"], ["one"], np_=np_)

    def count_parts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("l_suppkey").aggregate([("one", "sum")])
        return g.rename_columns(["l_suppkey", "n_parts"])

    # the (supplier, part) stream never hits the driver: a second
    # supplier-keyed merge reduces it to one count per supplier
    pairs = collect_table(final_merge_sums(
        distinct_pairs.map_batches(count_parts, batch_format="pyarrow"),
        ["l_suppkey"], ["n_parts"], np_=np_).materialize())

    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "n_items": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64()),
                      "n_parts": pa.array([], pa.int64()),
                      "late_rate": pa.array([], pa.float64())})
    if metrics is None or metrics.num_rows == 0:
        return _rd.from_arrow(empty)
    mdf = metrics.to_pandas()
    np_counts = pairs.to_pandas().set_index("l_suppkey")["n_parts"] \
        if pairs is not None else pd.Series(dtype="int64")
    mdf["n_parts"] = mdf["l_suppkey"].map(np_counts).fillna(0) \
        .astype(np.int64)
    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_name"]).to_pandas()
    out = mdf.merge(supplier, left_on="l_suppkey",
                    right_on="s_suppkey", how="inner")
    return _rd.from_pandas(pd.DataFrame({
        "s_suppkey": out["s_suppkey"],
        "s_name": out["s_name"],
        "n_items": out["n_items"],
        "revenue": out["du"] / 10000.0,
        "n_parts": out["n_parts"],
        "late_rate": round_half_up(
            out["n_late"].astype(np.float64) / out["n_items"], 6)}))


SUPPLIER_SCORECARD_SQL = """
WITH j AS (
  SELECT l_suppkey, l_partkey,
         CAST(l_extendedprice AS DECIMAL(18,2))
         * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
per AS (
  SELECT l_suppkey, count(*) AS n_items,
         CAST(sum(rev) AS DOUBLE) AS revenue,
         CAST(sum(late) AS BIGINT) AS n_late,
         count(DISTINCT l_partkey) AS n_parts
  FROM j GROUP BY l_suppkey)
SELECT s_suppkey, s_name, n_items, revenue, n_parts,
       round(CAST(n_late AS DOUBLE) / n_items, 6) AS late_rate
FROM per JOIN supplier ON s_suppkey = l_suppkey
"""


# --- Q2 shape: per-group minimum-cost supplier (correlated min) --------
@_hash_shuffled
def min_cost_supplier(sf_dir: str, np_: int = 0,
                      bound: int = 2_000_000):
    """TPC-H Q2 adapted to this corpus (no partsupp): for each part
    type, the cheapest line-item offer from an ASIA supplier, ties to
    the smallest suppkey.

    Shape: part/supplier/nation/region are broadcast lookups; ONE scan
    of the fact computes per-type lexicographic-min partials by packing
    (price_cents, suppkey) into one int64 (cents < 2^31 — prices are
    bounded by the money domain — and suppkey < 2^32; at a corpus
    whose supplier keys exceed 32 bits, widen the pack to two-column
    min-then-semijoin, the Q2 correlated-subquery shape).  The min of
    the packed value IS argmin-with-tiebreak, so partials merge
    associatively through ``final_merge_min``.
    """
    part = pq.read_table(str(Path(sf_dir) / "part.parquet"),
                         columns=["p_partkey", "p_type"])
    types = pc.unique(part.column("p_type")).sort()
    type_ids = pc.index_in(part.column("p_type"), value_set=types)
    nation = pq.read_table(str(Path(sf_dir) / "nation.parquet"))
    region = pq.read_table(str(Path(sf_dir) / "region.parquet"))
    rkey = region.filter(pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey")
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=rkey)).column("n_nationkey")
    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_nationkey", "s_name"])
    asia_sup = supplier.filter(pc.is_in(supplier.column("s_nationkey"),
                                        value_set=nat))
    dims_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        pc.cast(type_ids, pa.int64()).combine_chunks(),
                        asia_sup.column("s_suppkey").combine_chunks()))

    class Offers:
        def __init__(self):
            self.pkeys, self.ptype, self.skeys = ray.get(dims_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = pc.fill_null(pc.is_in(batch.column("l_suppkey"),
                                         value_set=self.skeys), False)
            b = batch.filter(keep)
            pi = pc.index_in(b.column("l_partkey"), value_set=self.pkeys)
            tid = pc.cast(self.ptype.take(pi), pa.int64())
            cents = money_units(b.column("l_extendedprice"))
            packed = pc.add(
                pc.multiply(cents, pa.scalar(1 << 32, pa.int64())),
                pc.cast(b.column("l_suppkey"), pa.int64()))
            t = pa.table({"tid": tid, "packed": packed})
            g = t.group_by("tid").aggregate([("packed", "min")])
            return g.rename_columns(["tid", "packed"])

    agg = final_merge_min(
        _pq(sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(Offers, batch_format="pyarrow",
                     concurrency=(1, map_pool())),
        ["tid"], ["packed"], np_=np_, bound=bound)

    snames = dict(zip(supplier.column("s_suppkey").to_pylist(),
                      supplier.column("s_name").to_pylist()))
    tnames = types.to_pylist()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        packed = b["packed"].to_numpy().astype(np.int64)
        cents = packed >> 32
        supp = packed & ((1 << 32) - 1)
        out = pd.DataFrame({
            "p_type": [tnames[int(t)] for t in b["tid"]],
            "min_price": cents / 100.0,
            "s_suppkey": supp.astype("int64"),
            "s_name": [snames[int(s)] for s in supp]})
        return out.sort_values("p_type").reset_index(drop=True)

    return agg.map_batches(finish, batch_format="pandas")


MIN_COST_SUPPLIER_SQL = """
WITH offers AS (
  SELECT p_type, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'),
best AS (SELECT p_type, min(price) AS min_price
         FROM offers GROUP BY p_type),
pick AS (SELECT o.p_type, b.min_price, min(o.l_suppkey) AS s_suppkey
         FROM offers o
         JOIN best b ON o.p_type = b.p_type AND o.price = b.min_price
         GROUP BY o.p_type, b.min_price)
SELECT p.p_type, CAST(p.min_price AS DOUBLE) AS min_price,
       p.s_suppkey, s.s_name
FROM pick p JOIN supplier s USING (s_suppkey)
ORDER BY p.p_type
"""


# --- Q11 shape: group share vs a global aggregate -----------------------
@_hash_shuffled
def supplier_value_share(sf_dir: str, np_: int = 0):
    """TPC-H Q11 adapted (no partsupp): suppliers whose total shipped
    value exceeds the AVERAGE per-supplier value — a per-key aggregate
    filtered against a global aggregate of itself.

    Shape: combiner partials → bounded-adaptive merge → the global
    total and group count come from a SECOND pass over the merged agg
    (never the raw fact stream), and the comparison is exact-int:
    ``value_cents · n_suppliers > total_cents`` ⟺ value > avg, no
    float threshold to drift.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"s_suppkey": batch.column("l_suppkey"),
                      "cents": money_units(
                          batch.column("l_extendedprice"))})
        g = t.group_by("s_suppkey").aggregate([("cents", "sum")])
        return g.rename_columns(["s_suppkey", "cents"])

    agg = final_merge_sums(
        _pq(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["s_suppkey"], ["cents"], np_=np_).materialize()

    roll = agg.aggregate(RaySum("cents", alias_name="total"),
                         RayCount(alias_name="n"))
    total, n = int(roll["total"]), int(roll["n"])

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(batch.column("cents"), pa.scalar(n, pa.int64())),
            pa.scalar(total, pa.int64()))
        b = batch.filter(keep)
        return pa.table({
            "s_suppkey": b.column("s_suppkey"),
            "total_value": pc.divide(
                pc.cast(b.column("cents"), pa.float64()),
                pa.scalar(100.0))})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["total_value", "s_suppkey"], descending=[True, False])


SUPPLIER_VALUE_SHARE_SQL = """
WITH v AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem GROUP BY l_suppkey)
SELECT s_suppkey, CAST(val AS DOUBLE) AS total_value
FROM v
WHERE val * (SELECT count(*) FROM v) > (SELECT sum(val) FROM v)
ORDER BY total_value DESC, s_suppkey
"""


# --- Q20 shape: semi-join chain + threshold vs global average ----------
@_hash_shuffled
def promo_part_suppliers(sf_dir: str, np_: int = 0):
    """TPC-H Q20 adapted (no partsupp): suppliers whose shipped
    quantity of PROMO-type parts exceeds 1.05× the average per-supplier
    PROMO quantity (selective at every tier — "half the average", Q20's
    literal multiplier, passes everyone on this corpus).  Semi-join
    chain: the qualifying partkey set comes from a pruned part scan
    broadcast once; the threshold is exact-int
    (``qty_units · 20 · n > 21 · total_units``; quantities carried in
    1e-2 units so fractional quantities stay exact).
    """
    part = pq.read_table(str(Path(sf_dir) / "part.parquet"),
                         columns=["p_partkey", "p_type"])
    promo = part.filter(pc.equal(part.column("p_type"), "PROMO")) \
        .column("p_partkey").combine_chunks()
    promo_ref = ray.put(promo)

    class PromoQty:
        def __init__(self):
            self.promo = ray.get(promo_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = pc.fill_null(pc.is_in(batch.column("l_partkey"),
                                         value_set=self.promo), False)
            b = batch.filter(keep)
            t = pa.table({"s_suppkey": b.column("l_suppkey"),
                          "units": money_units(b.column("l_quantity"))})
            g = t.group_by("s_suppkey").aggregate([("units", "sum")])
            return g.rename_columns(["s_suppkey", "units"])

    agg = final_merge_sums(
        _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(PromoQty, batch_format="pyarrow",
                     concurrency=(1, map_pool())),
        ["s_suppkey"], ["units"], np_=np_).materialize()

    roll = agg.aggregate(RaySum("units", alias_name="total"),
                         RayCount(alias_name="n"))
    total, n = int(roll["total"]), int(roll["n"])

    supplier = pq.read_table(str(Path(sf_dir) / "supplier.parquet"),
                             columns=["s_suppkey", "s_name"])
    snames = dict(zip(supplier.column("s_suppkey").to_pylist(),
                      supplier.column("s_name").to_pylist()))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["units"].astype(np.int64) * 20 * n > 21 * total
        b = b[keep]
        out = pd.DataFrame({
            "s_suppkey": b["s_suppkey"].astype("int64"),
            "s_name": [snames[int(s)] for s in b["s_suppkey"]],
            "promo_qty": b["units"].astype(np.int64) / 100.0})
        return out.sort_values("s_suppkey").reset_index(drop=True)

    return agg.map_batches(finish, batch_format="pandas") \
        .sort("s_suppkey")


PROMO_PART_SUPPLIERS_SQL = """
WITH q AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
  GROUP BY l_suppkey)
SELECT q.s_suppkey, s.s_name, CAST(q.qty AS DOUBLE) AS promo_qty
FROM q JOIN supplier s USING (s_suppkey)
WHERE q.qty * 20 * (SELECT count(*) FROM q)
      > 21 * (SELECT sum(qty) FROM q)
ORDER BY q.s_suppkey
"""


# --- Q12: shipping-band vs order priority -----------------------------
@_hash_shuffled
def q12_ship_delay_priority(sf_dir: str, np_: int = 0):
    """TPC-H Q12 adapted to this corpus's columns (no
    l_shipmode/receiptdate): lineitems shipped in 1996 classify into a
    FAST (≤30 days after order date) vs SLOW delay band — the stand-in
    for ship mode — counting critical- (1-URGENT/2-HIGH) vs
    lower-priority lines per band.

    Shape: read-time year filter on the fact side, one partitioned
    hash join on the order key, then the per-band conditional counts
    reduce entirely through combiner partials (2-row final merge)."""
    lo, hi = _ts_us(1996, 1, 1), _ts_us(1997, 1, 1)

    def lfilter(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("l_shipdate"))
        keep = pc.and_(pc.greater_equal(us, pa.scalar(lo)),
                       pc.less(us, pa.scalar(hi)))
        b = batch.filter(keep)
        return pa.table({"l_orderkey": b.column("l_orderkey"),
                         "l_ship_us": _ts_col_us(b.column("l_shipdate"))})

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]) \
        .map_batches(lfilter, batch_format="pyarrow")
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                    "o_orderpriority"]) \
        .map_batches(lambda b: pa.table({
            "l_orderkey": b.column("o_orderkey"),
            "o_date_us": _ts_col_us(b.column("o_orderdate")),
            "o_orderpriority": b.column("o_orderpriority")}),
            batch_format="pyarrow")
    joined = hash_join(li, orders, on="l_orderkey",
                       num_partitions=np_ or None)

    def band_partial(batch: pa.Table) -> pa.Table:
        fast = pc.less_equal(
            batch.column("l_ship_us"),
            pc.add(batch.column("o_date_us"), pa.scalar(30 * _DAY_US)))
        band = pc.if_else(fast, "FAST", "SLOW")
        high = pc.is_in(batch.column("o_orderpriority"),
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        hi_i = pc.cast(high, pa.int64())
        t = pa.table({"delay_band": band, "high_line_count": hi_i,
                      "low_line_count": pc.subtract(
                          pa.scalar(1, pa.int64()), hi_i)})
        g = t.group_by("delay_band").aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")])
        return g.rename_columns(["delay_band", "high_line_count",
                                 "low_line_count"])

    out = final_merge_sums(
        joined.map_batches(band_partial, batch_format="pyarrow"),
        ["delay_band"], ["high_line_count", "low_line_count"], np_=np_)
    return out.sort("delay_band")


Q12_SHIP_DELAY_SQL = """
SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
            THEN 'FAST' ELSE 'SLOW' END AS delay_band,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


# --- Q22 shape: anti-join + global-average threshold + dim rollup ------
@_hash_shuffled
def q22_global_sales_opportunity(sf_dir: str, np_: int = 0):
    """TPC-H Q22 adapted (no phone column — the country-code predicate
    becomes the nation dimension): customers with an above-average
    positive account balance and NO urgent orders, rolled up per
    nation (every customer in this corpus has *some* order, so Q22's
    "no orders at all" is vacuous — the urgent-priority predicate
    keeps the anti-join selective at every tier, same adaptation as
    ``customers_without_orders``).

    Shape (100 TB-safe):
    - pass 1 over customer: one-row combiner partials → global
      (sum_cents, n) of positive balances; the average threshold is
      applied as the exact-int cross-multiplication
      ``cents · n > total_cents`` — no float threshold to drift.
    - the NOT EXISTS is the distributed anti-join: per-batch distinct
      order custkeys (combiner) → native left-outer hash join → keep
      nulls.  Never a driver-side custkey set.
    - nation is a broadcast decorate on the (bounded) per-nation
      aggregate."""
    customer = _pq(sf_dir, "customer",
                   ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("c_acctbal"))
        pos = pc.greater(cents, pa.scalar(0, pa.int64()))
        kept = cents.filter(pos) if isinstance(cents, pa.ChunkedArray) \
            else pc.filter(cents, pos)
        return pa.table({
            "cents": pa.array([pc.sum(kept).as_py() or 0], pa.int64()),
            "n": pa.array([len(kept)], pa.int64())})

    roll = customer.map_batches(bal_partial, batch_format="pyarrow") \
        .aggregate(RaySum("cents", alias_name="total"),
                   RaySum("n", alias_name="n"))
    total, n = int(roll["total"]), int(roll["n"])

    def rich(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("c_acctbal"))
        keep = pc.greater(
            pc.multiply(cents, pa.scalar(n, pa.int64())),
            pa.scalar(total, pa.int64()))
        b = batch.filter(keep)
        return pa.table({"c_custkey": b.column("c_custkey"),
                         "c_nationkey": b.column("c_nationkey"),
                         "cents": pc.filter(money_units(
                             batch.column("c_acctbal")), keep)})

    rich_ds = customer.map_batches(rich, batch_format="pyarrow")

    def order_keys(batch: pa.Table) -> pa.Table:
        urgent = batch.filter(
            pc.equal(batch.column("o_orderpriority"), "1-URGENT"))
        keys = pc.unique(urgent.column("o_custkey"))
        return pa.table({"c_custkey": keys,
                         "__has": pa.array([1] * len(keys), pa.int64())})

    keys = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(order_keys, batch_format="pyarrow")
    joined = rich_ds.join(keys, join_type="left_outer",
                          num_partitions=np_ or 8, on=("c_custkey",))

    def nation_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_null(batch.column("__has")))
        t = pa.table({"c_nationkey": b.column("c_nationkey"),
                      "numcust": pa.array([1] * b.num_rows, pa.int64()),
                      "cents": b.column("cents")})
        g = t.group_by("c_nationkey").aggregate(
            [("numcust", "sum"), ("cents", "sum")])
        return g.rename_columns(["c_nationkey", "numcust", "cents"])

    agg = final_merge_sums(
        joined.map_batches(nation_partial, batch_format="pyarrow"),
        ["c_nationkey"], ["numcust", "cents"], np_=np_)

    nation = pq.read_table(str(Path(sf_dir) / "nation.parquet"),
                           columns=["n_nationkey", "n_name"]) \
        .rename_columns(["c_nationkey", "nation"])
    nation_ref = ray.put(nation)

    class Decorate:
        def __init__(self):
            self.dim = ray.get(nation_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            j = batch.join(self.dim, keys="c_nationkey",
                           join_type="inner")
            return pa.table({
                "nation": j.column("nation"),
                "numcust": j.column("numcust"),
                "totacctbal": pc.divide(
                    pc.cast(j.column("cents"), pa.float64()),
                    pa.scalar(100.0))})

    return agg.map_batches(Decorate, batch_format="pyarrow",
                           concurrency=(1, map_pool())).sort("nation")


Q22_GLOBAL_SALES_SQL = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer),
pos AS (
  SELECT sum(bal) AS total, count(*) AS n FROM c WHERE bal > 0)
SELECT n_name AS nation,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(c.bal) AS DOUBLE) AS totacctbal
FROM c JOIN nation ON c_nationkey = n_nationkey, pos
WHERE c.bal * pos.n > pos.total
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY n_name
ORDER BY n_name
"""


def tpch_extra_queries():
    return {
        "q4_late_orders": q4_late_orders,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q10_returned_revenue": q10_returned_revenue,
        "q14_promo_revenue": q14_promo_revenue,
        "q15_top_supplier": q15_top_supplier,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "q21_sole_late_supplier": q21_sole_late_supplier,
        "suppliers_per_parttype": suppliers_per_parttype,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q8_market_share": q8_market_share,
        "part_type_basket": part_type_basket,
        "order_size_histogram": order_size_histogram,
        "supplier_scorecard": supplier_scorecard,
        "min_cost_supplier": min_cost_supplier,
        "supplier_value_share": supplier_value_share,
        "promo_part_suppliers": promo_part_suppliers,
        "q12_ship_delay_priority": q12_ship_delay_priority,
        "q22_global_sales_opportunity": q22_global_sales_opportunity,
    }


def tpch_extra_oracle_sql():
    return {
        "q4_late_orders": Q4_LATE_ORDERS_SQL,
        "q5_local_supplier_volume": Q5_LOCAL_VOLUME_SQL,
        "q10_returned_revenue": Q10_RETURNED_SQL,
        "q14_promo_revenue": Q14_PROMO_SQL,
        "q15_top_supplier": Q15_TOP_SUPPLIER_SQL,
        "q19_disjunctive_revenue": Q19_DISJUNCTIVE_SQL,
        "q21_sole_late_supplier": Q21_SOLE_LATE_SQL,
        "suppliers_per_parttype": SUPPLIERS_PER_PARTTYPE_SQL,
        "q6_forecast_revenue": Q6_FORECAST_SQL,
        "q8_market_share": Q8_MARKET_SHARE_SQL,
        "part_type_basket": PART_TYPE_BASKET_SQL,
        "order_size_histogram": ORDER_SIZE_HISTOGRAM_SQL,
        "supplier_scorecard": SUPPLIER_SCORECARD_SQL,
        "min_cost_supplier": MIN_COST_SUPPLIER_SQL,
        "supplier_value_share": SUPPLIER_VALUE_SHARE_SQL,
        "promo_part_suppliers": PROMO_PART_SUPPLIERS_SQL,
        "q12_ship_delay_priority": Q12_SHIP_DELAY_SQL,
        "q22_global_sales_opportunity": Q22_GLOBAL_SALES_SQL,
    }
