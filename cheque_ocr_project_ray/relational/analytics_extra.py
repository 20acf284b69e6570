"""Event-analytics additions: grouped histogram, per-user lag deltas,
and multi-quantile profiles — the remaining window/profile shapes the
round-1 set did not cover.  All oracled.

Scale shapes:
- histogram: pure combiner (per-batch group_by on (type, bin)) +
  bounded merge — one pass, no shuffle of raw rows.
- lag deltas: groupby(user).map_groups — the per-user-ordered window
  family (same partitioning assumption as sessionization: one user
  fits one group; salt by day first for ultra-hot users).
- quantiles: Ray's exact Quantile aggregate per group; swap in a
  t-digest partial for 100-TB-scale value gathering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from cheque_ocr_project_ray.relational.queries import _hash_shuffled, _pq
from cheque_ocr_project_ray.relational.tpch_extra import (_DAY_US,
                                                          _ts_col_us)
from cheque_ocr_project_ray.util import (block_prefix_offsets,
                                         final_merge_sums, money_units,
                                         round_half_up)

BIN_WIDTH = 50.0


@_hash_shuffled
def events_value_histogram(sf_dir: str, np_: int = 0):
    """Fixed-width value histogram per event type: bin index, row
    count, and an EXACT integer-cent value sum per (type, bin)."""
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        bins = pc.cast(pc.floor(pc.divide(batch.column("value"),
                                          pa.scalar(BIN_WIDTH))),
                       pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "bin": bins,
                      "cents": money_units(batch.column("value")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["event_type", "bin"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return g.rename_columns(["event_type", "bin", "cents", "n_events"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bin"], ["cents", "n_events"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_value"] = b["cents"] / 100.0
        return b.drop(columns=["cents"])

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(floor(value / {BIN_WIDTH}) AS BIGINT) AS bin,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, bin
"""


@_hash_shuffled
def events_lag_delta(sf_dir: str, np_: int = 0):
    """Per-user consecutive value deltas (LAG window): delta count,
    mean delta, and max |delta| per user with ≥2 events.  Deltas are
    exact integer cents, so the stats are order-independent and match
    the DECIMAL oracle bit-for-bit."""
    import pyarrow.parquet as pq_
    from pathlib import Path
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        # hash-shuffle groupby finalize dies on an all-empty input
        # (schemaless partition sort) — answer from metadata instead
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "n_deltas": pd.Series([], dtype="int64"),
            "avg_delta": pd.Series([], dtype="float64"),
            "max_abs_delta": pd.Series([], dtype="float64")})
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def deltas(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        if len(cents) < 2:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_deltas": pd.Series([], dtype="int64"),
                "avg_delta": pd.Series([], dtype="float64"),
                "max_abs_delta": pd.Series([], dtype="float64")})
        d = np.diff(cents)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_deltas": [len(d)],
            # op order mirrors the SQL: CAST(sum AS DOUBLE) / count
            "avg_delta": round_half_up(
                (float(d.sum()) / 100.0) / len(d), 4),
            "max_abs_delta": [np.abs(d).max() / 100.0]})

    return ds.groupby("user_id", num_partitions=np_).map_groups(
        deltas, batch_format="pandas")


EVENTS_LAG_DELTA_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,2))
         - lag(CAST(value AS DECIMAL(18,2)))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events)
SELECT user_id, count(delta) AS n_deltas,
       round(CAST(sum(delta) AS DOUBLE) / count(delta), 4) AS avg_delta,
       CAST(max(abs(delta)) AS DOUBLE) AS max_abs_delta
FROM d GROUP BY user_id
HAVING count(delta) >= 1
"""


@_hash_shuffled
def events_quantiles_by_type(sf_dir: str, np_: int = 0):
    """Exact multi-quantile profile (p25/p50/p75/p90) per event type —
    linear interpolation, matching quantile_cont."""
    from ray.data.aggregate import Quantile
    ds = _pq(sf_dir, "events", ["event_type", "value"])
    agg = ds.groupby("event_type", num_partitions=1).aggregate(
        Quantile("value", q=0.25, alias_name="p25"),
        Quantile("value", q=0.5, alias_name="p50"),
        Quantile("value", q=0.75, alias_name="p75"),
        Quantile("value", q=0.9, alias_name="p90"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("p25", "p50", "p75", "p90"):
            b[c] = round_half_up(b[c], 4)
        return b

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.5),  4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.9),  4) AS p90
FROM events
GROUP BY event_type
"""


RANGE_JOIN_PROBE_USERS = 50
RANGE_JOIN_WINDOW_US = 2 * 3600 * 1_000_000
_HOUR_US = 3600 * 1_000_000


@_hash_shuffled
def events_range_join(sf_dir: str, np_: int = 0):
    """Interval (range) join — the non-equi join Ray Data has no
    native operator for, built the banded way that scales: each
    window expands to the hour BUCKETS it overlaps (driver-side, the
    window side is probe-bounded here; at corpus scale the expansion
    is a flat_map), each event maps to exactly ONE bucket, and the
    band key turns the non-equi join into a partitioned hash join +
    a vectorized containment filter.  No event duplication, so no
    dedup pass.  Skew note: a bucket holding a hot hour can be salted
    by minute exactly like hot users in sessionization.

    Windows: per probe user (user_id < 50), [first event ts, +2 h).
    Output: events (any user) inside each window, counted and
    value-summed exactly."""
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min)

    def probe_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch.column("user_id"),
                                 pa.scalar(RANGE_JOIN_PROBE_USERS)))
        t = pa.table({"window_id": b.column("user_id"),
                      "t0_us": pc.cast(pc.cast(b.column("ts"),
                                               pa.timestamp("us")),
                                       pa.int64())})
        g = t.group_by("window_id").aggregate([("t0_us", "min")])
        return g.rename_columns(["window_id", "t0_us"])

    probes = final_merge_min(
        _pq(sf_dir, "events", ["user_id", "ts"])
        .map_batches(probe_partial, batch_format="pyarrow"),
        ["window_id"], ["t0_us"], np_=np_)
    wt = collect_table(probes.materialize())
    empty = pa.table({"window_id": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "sum_value": pa.array([], pa.float64())})
    if wt is None or wt.num_rows == 0:
        import ray.data as _rd
        return _rd.from_arrow(empty)

    wid = wt.column("window_id").to_numpy(zero_copy_only=False)
    t0 = wt.column("t0_us").to_numpy(zero_copy_only=False)
    t1 = t0 + RANGE_JOIN_WINDOW_US
    b_lo, b_hi = t0 // _HOUR_US, (t1 - 1) // _HOUR_US
    reps = (b_hi - b_lo + 1).astype(np.int64)
    bucket = np.repeat(b_lo, reps) + (
        np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps))
    expanded = pa.table({
        "bucket": pa.array(bucket, pa.int64()),
        "window_id": pa.array(np.repeat(wid, reps), pa.int64()),
        "t0_us": pa.array(np.repeat(t0, reps), pa.int64()),
        "t1_us": pa.array(np.repeat(t1, reps), pa.int64())})
    import ray.data as _rd
    w_ds = _rd.from_arrow(expanded)

    def ev_prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        return pa.table({
            "bucket": pc.divide(us, pa.scalar(_HOUR_US, pa.int64())),
            "ts_us": us,
            "cents": money_units(batch.column("value"))})

    ev = _pq(sf_dir, "events", ["ts", "value"]) \
        .map_batches(ev_prep, batch_format="pyarrow")
    joined = hash_join(ev, w_ds, on="bucket", num_partitions=np_ or None)

    def contained_partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch.column("ts_us"), batch.column("t0_us")),
            pc.less(batch.column("ts_us"), batch.column("t1_us")))
        b = batch.filter(keep)
        t = pa.table({"window_id": b.column("window_id"),
                      "n_events": pa.array(np.ones(b.num_rows, np.int64)),
                      "cents": b.column("cents")})
        g = t.group_by("window_id").aggregate(
            [("n_events", "sum"), ("cents", "sum")])
        return g.rename_columns(["window_id", "n_events", "cents"])

    agg = final_merge_sums(
        joined.map_batches(contained_partial, batch_format="pyarrow"),
        ["window_id"], ["n_events", "cents"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_value"] = b["cents"] / 100.0
        return b.drop(columns=["cents"])

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_RANGE_JOIN_SQL = f"""
WITH w AS (
  SELECT user_id AS window_id, min(ts) AS t0,
         min(ts) + INTERVAL 2 HOUR AS t1
  FROM events WHERE user_id < {RANGE_JOIN_PROBE_USERS}
  GROUP BY user_id)
SELECT window_id, count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events e JOIN w ON e.ts >= w.t0 AND e.ts < w.t1
GROUP BY window_id
"""


@_hash_shuffled
def orders_cube(sf_dir: str, np_: int = 0):
    """Full CUBE over (priority, status): all four grouping sets
    derived from ONE finest-level aggregate — the shuffle runs once;
    the coarser sets are a driver fold over the (tiny) merged table.
    Exact integer-cent money keeps every level bit-equal to SQL."""
    ds = _pq(sf_dir, "orders",
             ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                      "o_orderstatus": batch.column("o_orderstatus"),
                      "cents": money_units(batch.column("o_totalprice")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return g.rename_columns(
            ["o_orderpriority", "o_orderstatus", "cents", "n_orders"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"], ["cents", "n_orders"],
        np_=np_)

    def fold_cube(b: pd.DataFrame) -> pd.DataFrame:
        fine = b.copy()
        by_p = fine.groupby("o_orderpriority", as_index=False)[
            ["cents", "n_orders"]].sum().assign(o_orderstatus="ALL")
        by_s = fine.groupby("o_orderstatus", as_index=False)[
            ["cents", "n_orders"]].sum().assign(o_orderpriority="ALL")
        total = pd.DataFrame({
            "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
            "cents": [fine["cents"].sum()],
            "n_orders": [fine["n_orders"].sum()]})
        out = pd.concat([fine, by_p, by_s, total], ignore_index=True)
        out["total_price"] = out["cents"] / 100.0
        return out[["o_orderpriority", "o_orderstatus", "n_orders",
                    "total_price"]]

    return agg.repartition(1).map_batches(fold_cube,
                                          batch_format="pandas",
                                          batch_size=None)


ORDERS_CUBE_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       coalesce(o_orderstatus, 'ALL')   AS o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


@_hash_shuffled
def lineitem_weighted_discount(sf_dir: str, np_: int = 0):
    """Revenue-weighted vs plain average discount per return flag —
    the weighted-mean aggregate shape, exact integer units end-to-end
    (numerator in 1e-4 price×discount units, denominators in cents /
    row counts), so the ratios divide the SAME integers as the
    DECIMAL oracle."""
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("l_extendedprice"))
        du = money_units(batch.column("l_discount"))
        t = pa.table({"l_returnflag": batch.column("l_returnflag"),
                      "wnum": pc.multiply(cents, du),
                      "wden": cents, "dsum": du,
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("l_returnflag").aggregate(
            [("wnum", "sum"), ("wden", "sum"), ("dsum", "sum"),
             ("n", "sum")])
        return g.rename_columns(["l_returnflag", "wnum", "wden",
                                 "dsum", "n"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"], ["wnum", "wden", "dsum", "n"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"],
            # op order mirrors the SQL: CAST-to-double sums, then divide
            "wavg_discount": round_half_up(
                (b["wnum"] / 10000.0) / (b["wden"] / 100.0), 6),
            "avg_discount": round_half_up(
                (b["dsum"] / 100.0) / b["n"], 6)})

    return agg.map_batches(finish, batch_format="pandas")


WEIGHTED_DISCOUNT_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE), 6) AS wavg_discount,
       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 6) AS avg_discount
FROM lineitem
GROUP BY l_returnflag
"""


def events_value_quantile_sketch(sf_dir: str):
    """Approximate per-type quantiles via the mergeable fixed-grid
    sketch (sketch.py) — the 100-TB replacement for the exact
    Quantile aggregate in :func:`events_quantiles_by_type`: partials
    are constant-size int64 histograms that merge by SUM, so the
    estimate is bit-deterministic under any block order.  Absolute
    error ≤ QSK_WIDTH (tested).  Rows-only (approximate by design;
    pytest asserts the error bound against the exact quantiles)."""
    from cheque_ocr_project_ray.sketch import (qsketch_merge,
                                               qsketch_partial,
                                               qsketch_quantile)
    from cheque_ocr_project_ray.util import collect_table

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [(t, qsketch_partial(g["value"].to_numpy()).tobytes(),
                 len(g))
                for t, g in batch.groupby("event_type", sort=True)]
        return pd.DataFrame(rows, columns=["event_type", "sketch", "n"])

    parts = collect_table(
        ds.map_batches(partial, batch_format="pandas").materialize())
    if parts is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "p50_est": pd.Series([], dtype="float64"),
                             "p90_est": pd.Series([], dtype="float64")})
    pdf = parts.to_pandas()
    rows = []
    for t, g in pdf.groupby("event_type", sort=True):
        counts = qsketch_merge(list(g["sketch"]))
        rows.append((t, int(g["n"].sum()),
                     qsketch_quantile(counts, 0.5),
                     qsketch_quantile(counts, 0.9)))
    return pd.DataFrame(rows, columns=["event_type", "n",
                                       "p50_est", "p90_est"])


@_hash_shuffled
def events_type_markov(sf_dir: str, np_: int = 0):
    """First-order event-type transition matrix: consecutive-event
    (from, to) counts per user, merged globally, with row-normalized
    transition probabilities — the sequence-model feature extractor.
    Per-user ordering happens inside groupby(user).map_groups (the
    sessionization partitioning assumption); the matrix itself is
    |types|² — driver-tiny at any corpus size."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id",
                                "event_type"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({
                "from_type": pd.Series([], dtype="object"),
                "to_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"from_type": t[:-1], "to_type": t[1:]}) \
            .groupby(["from_type", "to_type"]).size() \
            .reset_index(name="n")

    partials = ds.groupby("user_id", num_partitions=np_).map_groups(
        pairs, batch_format="pandas")
    agg = final_merge_sums(partials, ["from_type", "to_type"], ["n"],
                           np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        totals = b.groupby("from_type")["n"].transform("sum")
        b["prob"] = round_half_up(
            b["n"].astype(np.float64) / totals, 6)
        return b

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


EVENTS_MARKOV_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS n,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type), 6) AS prob
FROM s WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@_hash_shuffled
def events_anomaly_mad(sf_dir: str, np_: int = 0):
    """Robust outlier report per event type: exact median, median
    absolute deviation (both via the exact Quantile aggregate —
    linear interpolation, matching quantile_cont), and the count of
    values beyond 5 MADs.  Three cheap grouped passes; the per-type
    (median, MAD) table broadcasts into the final counting map."""
    from ray.data.aggregate import Quantile

    def med_of(col_ds, alias):
        return col_ds.groupby("event_type", num_partitions=1).aggregate(
            Quantile("v", q=0.5, alias_name=alias))

    base = _pq(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda b: pa.table({"event_type": b.column("event_type"),
                            "v": b.column("value")}),
        batch_format="pyarrow")
    med = med_of(base, "med").to_pandas()
    med_map = dict(zip(med["event_type"], med["med"]))

    def absdev(batch: pa.Table) -> pa.Table:
        t = batch.column("event_type").to_pandas()
        m = t.map(med_map).to_numpy(dtype=np.float64)
        return pa.table({
            "event_type": batch.column("event_type"),
            "v": pa.array(np.abs(
                batch.column("v").to_numpy(zero_copy_only=False) - m))})

    mad = med_of(base.map_batches(absdev, batch_format="pyarrow"),
                 "mad").to_pandas()
    mad_map = dict(zip(mad["event_type"], mad["mad"]))

    def count_outliers(batch: pa.Table) -> pa.Table:
        tp = batch.column("event_type").to_pandas()
        v = batch.column("v").to_numpy(zero_copy_only=False)
        m = tp.map(med_map).to_numpy(dtype=np.float64)
        s = tp.map(mad_map).to_numpy(dtype=np.float64)
        out = (np.abs(v - m) > 5.0 * s).astype(np.int64)
        t = pa.table({"event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64)),
                      "n_outliers": pa.array(out)})
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("n_outliers", "sum")])
        return g.rename_columns(["event_type", "n", "n_outliers"])

    agg = final_merge_sums(
        base.map_batches(count_outliers, batch_format="pyarrow"),
        ["event_type"], ["n", "n_outliers"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["median_value"] = round_half_up(
            b["event_type"].map(med_map).astype(np.float64), 4)
        b["mad"] = round_half_up(
            b["event_type"].map(mad_map).astype(np.float64), 4)
        return b[["event_type", "n", "median_value", "mad",
                  "n_outliers"]]

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_ANOMALY_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type,
         quantile_cont(abs(e.value - med.med), 0.5) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY e.event_type)
SELECT e.event_type, count(*) AS n,
       round(any_value(med.med), 4) AS median_value,
       round(any_value(mad.mad), 4) AS mad,
       CAST(sum(CASE WHEN abs(e.value - med.med) > 5.0 * mad.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e
JOIN med USING (event_type)
JOIN mad ON mad.event_type = e.event_type
GROUP BY e.event_type
"""


@_hash_shuffled
def orders_yoy_growth(sf_dir: str, np_: int = 0):
    """Yearly revenue with year-over-year growth % — the
    window-over-aggregate shape: the shuffle reduces to |years| rows,
    the LAG window folds on the driver."""
    ds = _pq(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"yr": pc.cast(pc.year(batch.column("o_orderdate")),
                                    pa.int64()),
                      "cents": money_units(batch.column("o_totalprice")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("yr").aggregate([("cents", "sum"), ("n", "sum")])
        return g.rename_columns(["yr", "cents", "n_orders"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["yr"], ["cents", "n_orders"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("yr").reset_index(drop=True)
        b["revenue"] = b["cents"] / 100.0
        prev = b["revenue"].shift(1)
        b["yoy_pct"] = round_half_up(
            (b["revenue"] - prev) / prev * 100.0, 4)
        return b[["yr", "n_orders", "revenue", "yoy_pct"]]

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


ORDERS_YOY_SQL = """
WITH y AS (
  SELECT year(o_orderdate) AS yr,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT yr, n_orders, revenue,
       round((revenue - lag(revenue) OVER (ORDER BY yr))
             / lag(revenue) OVER (ORDER BY yr) * 100, 4) AS yoy_pct
FROM y
"""


@_hash_shuffled
def customer_rfm(sf_dir: str, np_: int = 0,
                 bound: int = 2_000_000):
    """RFM (recency / frequency / monetary) customer segmentation
    with fixed deterministic thresholds.  One combiner pass emits
    per-customer (count, exact cents, latest-order) partials — the
    max-merge rides the min-reducer on the negated timestamp — and
    merge bounded-adaptively: one driver Arrow group_by while the
    partial stream fits, a REAL distributed groupby (Sum+Min
    aggregates) past the bound, with only the global max-date and the
    final vectorized segmentation on the driver/finish side."""
    from cheque_ocr_project_ray.util import collect_table
    import ray.data as _rd

    ds = _pq(sf_dir, "orders",
             ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        us = _ts_col_us(batch.column("o_orderdate"))
        t = pa.table({"c_custkey": batch.column("o_custkey"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64)),
                      "cents": money_units(batch.column("o_totalprice")),
                      "neg_last": pc.negate(us)})
        g = t.group_by("c_custkey").aggregate(
            [("n", "sum"), ("cents", "sum"), ("neg_last", "min")])
        return g.rename_columns(["c_custkey", "n", "cents", "neg_last"])

    empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                      "n_orders": pa.array([], pa.int64()),
                      "monetary": pa.array([], pa.float64()),
                      "recency_days": pa.array([], pa.int64()),
                      "segment": pa.array([], pa.string())})
    part = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if part.count() <= bound:
        t = collect_table(part)
        if t is None or t.num_rows == 0:
            return _rd.from_arrow(empty)
        g = t.group_by("c_custkey").aggregate(
            [("n", "sum"), ("cents", "sum"), ("neg_last", "min")])
        merged = _rd.from_arrow(g.rename_columns(
            ["c_custkey", "n", "cents", "neg_last"]))
    else:
        from ray.data.aggregate import Min, Sum
        merged = part.groupby("c_custkey",
                              num_partitions=np_ or None).aggregate(
            Sum("n", alias_name="n"), Sum("cents", alias_name="cents"),
            Min("neg_last", alias_name="neg_last"))
    mx = merged.min("neg_last")
    if mx is None:
        return _rd.from_arrow(empty)
    max_us = -int(mx)

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        cents = b.column("cents").to_numpy(zero_copy_only=False)
        last_us = -b.column("neg_last").to_numpy(zero_copy_only=False)
        recency = (max_us - last_us) // _DAY_US
        seg = np.where(
            (recency <= 180) & (n >= 12), "champion",
            np.where(recency <= 180, "active",
                     np.where(recency <= 540, "cooling", "lapsed")))
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "n_orders": pa.array(n, pa.int64()),
            "monetary": pa.array(cents / 100.0, pa.float64()),
            "recency_days": pa.array(recency, pa.int64()),
            "segment": pa.array(seg.tolist(), pa.string())})

    return merged.map_batches(finish, batch_format="pyarrow")


CUSTOMER_RFM_SQL = """
WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
c AS (
  SELECT o_custkey AS c_custkey, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS monetary,
         max(o_orderdate) AS last_order
  FROM orders GROUP BY 1)
SELECT c_custkey, n_orders, monetary,
       CAST(date_diff('day', last_order, mx.mxd) AS BIGINT)
           AS recency_days,
       CASE WHEN date_diff('day', last_order, mx.mxd) <= 180
                 AND n_orders >= 12 THEN 'champion'
            WHEN date_diff('day', last_order, mx.mxd) <= 180
                 THEN 'active'
            WHEN date_diff('day', last_order, mx.mxd) <= 540
                 THEN 'cooling'
            ELSE 'lapsed' END AS segment
FROM c, mx
"""


@_hash_shuffled
def events_ab_test(sf_dir: str, np_: int = 0):
    """Two-sample experiment readout (assignment = user_id parity):
    per event type, group means and the Welch t-statistic.  Sums and
    sums-of-squares accumulate as EXACT integers (cents / cents²), so
    the moments match the DECIMAL oracle bit-for-bit; only the final
    t arithmetic is float, mirrored op-for-op."""
    ds = _pq(sf_dir, "events", ["event_type", "user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("value"))
        grp = pc.cast(pc.bit_wise_and(batch.column("user_id"),
                                      pa.scalar(1, pa.int64())),
                      pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "grp": grp,
                      "n": pa.array(np.ones(batch.num_rows, np.int64)),
                      "s": cents,
                      "ss": pc.multiply(cents, cents)})
        g = t.group_by(["event_type", "grp"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["event_type", "grp", "n", "s", "ss"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "grp"], ["n", "s", "ss"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in b.groupby("event_type", sort=True):
            g = g.set_index("grp")
            if 0 not in g.index or 1 not in g.index:
                continue
            out = {}
            for k in (0, 1):
                n = float(g.loc[k, "n"])
                mean = (g.loc[k, "s"] / 100.0) / n
                # sample variance from exact moments:
                # (ss/1e4 - n*mean^2) / (n-1)
                var = (g.loc[k, "ss"] / 10000.0 - n * mean * mean) \
                    / (n - 1.0)
                out[k] = (n, mean, var)
            n0, m0, v0 = out[0]
            n1, m1, v1 = out[1]
            tstat = (m1 - m0) / np.sqrt(v1 / n1 + v0 / n0)
            rows.append((et, int(n0), float(round_half_up(m0, 4)),
                         int(n1), float(round_half_up(m1, 4)),
                         float(round_half_up(tstat, 4))))
        return pd.DataFrame(rows, columns=[
            "event_type", "n_control", "mean_control",
            "n_treat", "mean_treat", "t_stat"])

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


EVENTS_AB_TEST_SQL = """
WITH g AS (
  SELECT event_type, CAST(user_id % 2 AS BIGINT) AS grp,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,2))
                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type, grp, n, s / n AS mean,
         (ss - n * (s / n) * (s / n)) / (n - 1.0) AS var
  FROM g)
SELECT c.event_type,
       c.n AS n_control, round(c.mean, 4) AS mean_control,
       t.n AS n_treat,   round(t.mean, 4) AS mean_treat,
       round((t.mean - c.mean)
             / sqrt(t.var / t.n + c.var / c.n), 4) AS t_stat
FROM m c JOIN m t ON c.event_type = t.event_type
WHERE c.grp = 0 AND t.grp = 1
"""


@_hash_shuffled
def events_values_except(sf_dir: str, np_: int = 0):
    """EXCEPT set op over a HIGH-cardinality key: distinct values
    observed in 'click' events but never in 'view' events — the
    set-difference twin of events_users_both (INTERSECT; a user-level
    difference is vacuously empty on this dense corpus).  Keys travel
    as exact integer cents; per-batch flag partials, one bounded
    merge, one vectorized mask."""
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["click", "view"]))
        b = batch.filter(keep)
        is_a = pc.cast(pc.equal(b.column("event_type"), "click"),
                       pa.int64())
        t = pa.table({"cents": money_units(b.column("value")),
                      "n_a": is_a,
                      "n_b": pc.subtract(pa.scalar(1, pa.int64()), is_a)})
        g = t.group_by("cents").aggregate(
            [("n_a", "sum"), ("n_b", "sum")])
        return g.rename_columns(["cents", "n_a", "n_b"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cents"], ["n_a", "n_b"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["n_a"] > 0) & (b["n_b"] == 0)
        return pd.DataFrame({"value": b.loc[keep, "cents"] / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_VALUES_EXCEPT_SQL = """
SELECT DISTINCT value FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT value FROM events WHERE event_type = 'view'
"""


@_hash_shuffled
def events_weekday_profile(sf_dir: str, np_: int = 0):
    """Weekday seasonality: per (event type, ISO weekday) event count
    and exact value sum — one combiner pass over the calendar
    dimension."""
    ds = _pq(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # ISO weekday (Mon=1..Sun=7), matching DuckDB isodow():
        # pyarrow day_of_week counts Mon=0, so +1
        dow = pc.add(pc.cast(pc.day_of_week(
            batch.column("ts").cast(pa.timestamp("us"))), pa.int64()),
            pa.scalar(1, pa.int64()))
        t = pa.table({"event_type": batch.column("event_type"),
                      "isodow": dow,
                      "n": pa.array(np.ones(batch.num_rows, np.int64)),
                      "cents": money_units(batch.column("value"))})
        g = t.group_by(["event_type", "isodow"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["event_type", "isodow", "n_events",
                                 "cents"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "isodow"], ["n_events", "cents"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_value"] = b["cents"] / 100.0
        return b.drop(columns=["cents"])

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_WEEKDAY_SQL = """
SELECT event_type, CAST(isodow(ts) AS BIGINT) AS isodow,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


@_hash_shuffled
def orders_pareto(sf_dir: str, np_: int = 0,
                  bound: int = 2_000_000):
    """Pareto concentration: the smallest set of top customers whose
    revenue covers ≥50% of the total, with each one's cumulative
    share.  Per-customer exact cents reduce through the combiner.
    Under ``bound`` the sort+cumsum folds over the aggregate on the
    driver; past it (customer cardinality beyond driver memory) the
    fallback is a DISTRIBUTED global sort plus a two-phase prefix
    sum — per-block totals (n_blocks ints) make the exclusive block
    offsets, each block finishes its own cumsum/cut in a Ray task,
    and the kept rows return as a Dataset via ``from_arrow_refs``
    (never through the driver; a uniform revenue distribution keeps
    ~half the customers, so even the RESULT must stay distributed).
    The coverage cut compares INTEGERS ((cum − own) × 2 < total), so
    the kept set is bit-deterministic and identical to the DECIMAL
    oracle's on both branches."""
    from cheque_ocr_project_ray.util import collect_table
    import ray.data as _rd

    ds = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": batch.column("o_custkey"),
                      "cents": money_units(batch.column("o_totalprice"))})
        g = t.group_by("c_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["c_custkey", "cents"])

    agg_ds = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c_custkey"], ["cents"], np_=np_, bound=bound).materialize()
    empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64()),
                      "cum_share": pa.array([], pa.float64())})
    if agg_ds.count() <= bound:
        agg = collect_table(agg_ds)
        if agg is None or agg.num_rows == 0:
            return _rd.from_arrow(empty)
        cust = agg.column("c_custkey").to_numpy(zero_copy_only=False)
        cents = agg.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((cust, -cents))
        cust, cents = cust[order], cents[order]
        cum = np.cumsum(cents)
        total = int(cum[-1])
        keep = (cum - cents) * 2 < total
        share = round_half_up((cum[keep] / 100.0) / (total / 100.0), 6)
        return _rd.from_arrow(pa.table({
            "c_custkey": pa.array(cust[keep], pa.int64()),
            "revenue": pa.array(cents[keep] / 100.0, pa.float64()),
            "cum_share": pa.array(share, pa.float64())}))
    # distributed fallback: sort is the one honest all-to-all here;
    # the prefix sum needs block ORDER, which the Dataset API does not
    # expose — the documented raw-task last resort
    sorted_ds = agg_ds.sort(["cents", "c_custkey"],
                            descending=[True, False]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_total(t: pa.Table) -> int:
        return int(pc.sum(t.column("cents")).as_py() or 0)

    sums = ray.get([block_total.remote(r) for r in refs])
    total = int(sum(sums))
    if total == 0:
        return _rd.from_arrow(empty)
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def block_cut(t: pa.Table, off: int, total: int) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        cum = off + np.cumsum(cents)
        keep = (cum - cents) * 2 < total
        share = round_half_up((cum[keep] / 100.0) / (total / 100.0), 6)
        return pa.table({
            "c_custkey": pa.array(
                t.column("c_custkey").to_numpy(
                    zero_copy_only=False)[keep], pa.int64()),
            "revenue": pa.array(cents[keep] / 100.0, pa.float64()),
            "cum_share": pa.array(share, pa.float64())})

    out_refs = [block_cut.remote(r, int(o), total)
                for r, o in zip(refs, offs)]
    return _rd.from_arrow_refs(out_refs)


ORDERS_PARETO_SQL = """
WITH c AS (
  SELECT o_custkey AS c_custkey,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1),
t AS (SELECT sum(rev) AS total FROM c),
w AS (
  SELECT c_custkey, rev,
         sum(rev) OVER (ORDER BY rev DESC, c_custkey) AS cum
  FROM c)
SELECT c_custkey, CAST(rev AS DOUBLE) AS revenue,
       round(CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
           AS cum_share
FROM w, t
WHERE (cum - rev) * 2 < t.total
"""


KS_TYPE_A, KS_TYPE_B = "click", "view"


@_hash_shuffled
def events_ks_drift(sf_dir: str, np_: int = 0):
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two event types — the distribution-drift monitor.
    Per-batch partials reduce to (value, count_a, count_b); the ECDF
    cumsum + max-gap folds over the (value-bounded) merged grid on
    the driver.  Counts stay integers until the final two divisions,
    so the statistic is bit-deterministic."""
    from cheque_ocr_project_ray.util import collect_table

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array([KS_TYPE_A, KS_TYPE_B]))
        b = batch.filter(keep)
        is_a = pc.cast(pc.equal(b.column("event_type"), KS_TYPE_A),
                       pa.int64())
        t = pa.table({"cents": money_units(b.column("value")),
                      "na": is_a,
                      "nb": pc.subtract(pa.scalar(1, pa.int64()), is_a)})
        g = t.group_by("cents").aggregate([("na", "sum"), ("nb", "sum")])
        return g.rename_columns(["cents", "na", "nb"])

    t = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cents"], ["na", "nb"], np_=np_).materialize())
    if t is None or t.num_rows == 0:
        return pd.DataFrame({"ks": pd.Series([], dtype="float64"),
                             "n_a": pd.Series([], dtype="int64"),
                             "n_b": pd.Series([], dtype="int64")})
    cents = t.column("cents").to_numpy(zero_copy_only=False)
    na = t.column("na").to_numpy(zero_copy_only=False)
    nb = t.column("nb").to_numpy(zero_copy_only=False)
    order = np.argsort(cents)
    ca, cb = np.cumsum(na[order]), np.cumsum(nb[order])
    ta, tb = int(ca[-1]), int(cb[-1])
    ks = np.max(np.abs(ca / float(ta) - cb / float(tb)))
    return pd.DataFrame({"ks": [float(round_half_up(ks, 6))],
                         "n_a": [ta], "n_b": [tb]})


EVENTS_KS_SQL = f"""
WITH e2 AS (
  SELECT value, event_type FROM events
  WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')),
g AS (
  SELECT value,
         sum(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END)
             AS na,
         sum(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END)
             AS nb
  FROM e2 GROUP BY value),
c AS (
  SELECT sum(na) OVER (ORDER BY value) AS ca,
         sum(nb) OVER (ORDER BY value) AS cb
  FROM g),
t AS (SELECT CAST(sum(na) AS DOUBLE) AS ta,
             CAST(sum(nb) AS DOUBLE) AS tb FROM g)
SELECT round(max(abs(ca / t.ta - cb / t.tb)), 6) AS ks,
       CAST(t.ta AS BIGINT) AS n_a, CAST(t.tb AS BIGINT) AS n_b
FROM c, t
GROUP BY t.ta, t.tb
"""


@_hash_shuffled
def events_user_entropy(sf_dir: str, np_: int = 0,
                        bound: int = 2_000_000):
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity signal.  Per-(user, type) counts reduce
    through the combiner; within ``bound`` the entropy fold runs
    vectorized on the driver; past it the fold moves into a
    distributed groupby(user).map_groups over the already-reduced
    (user, type, n) rows (≤ |types| rows per group)."""
    from cheque_ocr_project_ray.util import collect_table
    import ray.data as _rd

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("n", "sum")])
        return g.rename_columns(["user_id", "event_type", "n"])

    merged = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], ["n"], np_=np_).materialize()
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "n_types": pa.array([], pa.int64()),
                      "entropy": pa.array([], pa.float64())})
    if merged.count() <= bound:
        t = collect_table(merged)
        if t is None or t.num_rows == 0:
            return _rd.from_arrow(empty)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        users, codes = np.unique(uid, return_inverse=True)
        totals = np.bincount(codes, weights=n.astype(np.float64))
        n_types = np.bincount(codes)
        p = n / totals[codes]
        terms = p * np.log(p)
        ent = -np.bincount(codes, weights=terms)
        return _rd.from_arrow(pa.table({
            "user_id": pa.array(users, pa.int64()),
            "n_events": pa.array(totals.astype(np.int64), pa.int64()),
            "n_types": pa.array(n_types.astype(np.int64), pa.int64()),
            "entropy": pa.array(round_half_up(ent, 6), pa.float64())}))

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        n = group["n"].to_numpy(np.float64)
        total = n.sum()
        p = n / total
        return pd.DataFrame({
            "user_id": [group["user_id"].iloc[0]],
            "n_events": [np.int64(total)],
            "n_types": [len(group)],
            "entropy": [float(round_half_up(-(p * np.log(p)).sum(),
                                            6))]})

    return merged.groupby("user_id", num_partitions=np_).map_groups(
        fold, batch_format="pandas")


EVENTS_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
u AS (
  SELECT user_id, CAST(sum(n) AS DOUBLE) AS total,
         count(*) AS n_types
  FROM c GROUP BY 1)
SELECT c.user_id,
       CAST(u.total AS BIGINT) AS n_events,
       u.n_types,
       round(-sum((c.n / u.total) * ln(c.n / u.total)), 6) AS entropy
FROM c JOIN u USING (user_id)
GROUP BY c.user_id, u.total, u.n_types
"""


@_hash_shuffled
def events_benford(sf_dir: str, np_: int = 0):
    """Benford's-law first-digit audit over event values — the fraud /
    data-fabrication screen.  The leading digit comes from the EXACT
    integer-cent representation (float log10 digit extraction
    disagrees between libm implementations on boundary values —
    measured), so both engines bucket identically; per-digit χ²
    contributions are the only float math."""
    ds = _pq(sf_dir, "events", ["value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("value"))
        # zero-cent values have no leading significant digit
        cents = cents.filter(pc.greater(cents, pa.scalar(0, pa.int64())))
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1), pa.int64())
        t = pa.table({"digit": digit,
                      "n": pa.array(np.ones(len(digit), np.int64))})
        g = t.group_by("digit").aggregate([("n", "sum")])
        return g.rename_columns(["digit", "n"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["digit"], ["n"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("digit").reset_index(drop=True)
        total = float(b["n"].sum())
        obs_p = b["n"] / total
        benford_p = np.log(1.0 + 1.0 / b["digit"].to_numpy(np.float64)) \
            / np.log(10.0)
        exp_n = total * benford_p
        chi2 = (b["n"] - exp_n) * (b["n"] - exp_n) / exp_n
        return pd.DataFrame({
            "digit": b["digit"], "n": b["n"],
            "obs_p": round_half_up(obs_p, 6),
            "benford_p": round_half_up(benford_p, 6),
            "chi2_term": round_half_up(chi2, 4)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


EVENTS_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100
                               AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
             AS digit
  FROM events
  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT digit, n,
       round(n / t.total, 6) AS obs_p,
       round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_p,
       round((n - t.total * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             * (n - t.total * (ln(1.0 + 1.0 / digit) / ln(10.0)))
             / (t.total * (ln(1.0 + 1.0 / digit) / ln(10.0))), 4)
           AS chi2_term
FROM c, t
"""


@_hash_shuffled
def events_value_gini(sf_dir: str, np_: int = 0):
    """Gini coefficient of the value distribution per event type —
    the inequality/concentration measure.  Computed from the
    (type, cents, count) grid with the rank-weighted identity
    G = Σ(2·rank − n − 1)·xᵢ / (n·Σxᵢ): tie order cannot matter
    (equal values share the weight sum), and both numerator and
    denominator stay EXACT integers until the final division."""
    from cheque_ocr_project_ray.util import collect_table

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "cents": money_units(batch.column("value")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["event_type", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "cents", "n"])

    grid = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"], ["n"], np_=np_).materialize())
    if grid is None or grid.num_rows == 0:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "gini": pd.Series([], dtype="float64")})
    gdf = grid.to_pandas().sort_values(["event_type", "cents"])
    rows = []
    for et, g in gdf.groupby("event_type", sort=True):
        c = g["cents"].to_numpy()
        cnt = g["n"].to_numpy()
        n = int(cnt.sum())
        # ranks occupied by each distinct value: s+1 .. s+cnt
        # Σ(2·rank) over the run = 2·(cnt·s + cnt(cnt+1)/2)
        s = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        wsum = 2 * (cnt * s + cnt * (cnt + 1) // 2) - cnt * (n + 1)
        num = int(np.sum(wsum * c))
        den = n * int(np.sum(cnt * c))
        rows.append((et, n, float(round_half_up(num / den, 6))))
    return pd.DataFrame(rows, columns=["event_type", "n", "gini"])


EVENTS_GINI_SQL = """
WITH r AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
       round(CAST(sum((2 * rn - n - 1) * cents) AS DOUBLE)
             / (any_value(n) * sum(cents)), 6) AS gini
FROM r GROUP BY event_type
"""


@_hash_shuffled
def events_value_means(sf_dir: str, np_: int = 0):
    """Arithmetic, geometric, and harmonic mean of values per event
    type — the Pythagorean-means profile.  The arithmetic mean rides
    exact integer cents; the log- and reciprocal-sums are float
    combiner partials (4dp output rounding absorbs summation-order
    drift, the same tolerance every float aggregate here uses).
    Zero values are excluded (undefined log/reciprocal) in BOTH
    engines."""
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("value"))
        keep = pc.greater(cents, pa.scalar(0, pa.int64()))
        b = batch.filter(keep)
        cents = cents.filter(keep)
        v = b.column("value").to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b.column("event_type"),
                      "n": pa.array(np.ones(b.num_rows, np.int64)),
                      "cents": cents,
                      "ln_sum": pa.array(np.log(v), pa.float64()),
                      "inv_sum": pa.array(1.0 / v, pa.float64())})
        g = t.group_by("event_type").aggregate(
            [("n", "sum"), ("cents", "sum"), ("ln_sum", "sum"),
             ("inv_sum", "sum")])
        return g.rename_columns(
            ["event_type", "n", "cents", "ln_sum", "inv_sum"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n", "cents", "ln_sum", "inv_sum"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].astype(np.float64)
        return pd.DataFrame({
            "event_type": b["event_type"],
            "n": b["n"],
            "arith_mean": round_half_up((b["cents"] / 100.0) / n, 4),
            "geo_mean": round_half_up(np.exp(b["ln_sum"] / n), 4),
            "harm_mean": round_half_up(n / b["inv_sum"], 4)})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_MEANS_SQL = """
SELECT event_type, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 4) AS arith_mean,
       round(exp(sum(ln(value)) / count(*)), 4) AS geo_mean,
       round(count(*) / sum(1.0 / value), 4) AS harm_mean
FROM events
WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
GROUP BY event_type
"""


@_hash_shuffled
def orders_monthly_dense(sf_dir: str, np_: int = 0):
    """Calendar densification (gap fill): EVERY month in the data
    range × EVERY priority, zero-filled where no orders exist — the
    time-series shape downstream models need (missing ≠ absent).
    One combiner pass; the dense grid is generated on the driver and
    left-merged against the (month×priority-bounded) aggregate."""
    from cheque_ocr_project_ray.util import collect_table
    import ray.data as _rd

    ds = _pq(sf_dir, "orders",
             ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").cast(pa.timestamp("us"))
        ym = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()),
                                pa.scalar(100, pa.int64())),
                    pc.cast(pc.month(d), pa.int64()))
        t = pa.table({"ym": ym,
                      "o_orderpriority": batch.column("o_orderpriority"),
                      "n_orders": pa.array(np.ones(batch.num_rows,
                                                   np.int64)),
                      "cents": money_units(batch.column("o_totalprice"))})
        g = t.group_by(["ym", "o_orderpriority"]).aggregate(
            [("n_orders", "sum"), ("cents", "sum")])
        return g.rename_columns(["ym", "o_orderpriority", "n_orders",
                                 "cents"])

    t = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["ym", "o_orderpriority"], ["n_orders", "cents"],
        np_=np_).materialize())
    empty = pa.table({"ym": pa.array([], pa.int64()),
                      "o_orderpriority": pa.array([], pa.string()),
                      "n_orders": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64())})
    if t is None or t.num_rows == 0:
        return _rd.from_arrow(empty)
    df = t.to_pandas()
    yms = df["ym"].to_numpy()
    lo_y, lo_m = divmod(int(yms.min()), 100)
    hi_y, hi_m = divmod(int(yms.max()), 100)
    months = [y * 100 + m
              for y in range(lo_y, hi_y + 1)
              for m in range(1, 13)
              if (y, m) >= (lo_y, lo_m) and (y, m) <= (hi_y, hi_m)]
    prios = sorted(df["o_orderpriority"].unique())
    grid = pd.MultiIndex.from_product(
        [months, prios], names=["ym", "o_orderpriority"]).to_frame(
        index=False)
    out = grid.merge(df, on=["ym", "o_orderpriority"], how="left")
    out["n_orders"] = out["n_orders"].fillna(0).astype(np.int64)
    out["revenue"] = out["cents"].fillna(0) / 100.0
    return _rd.from_pandas(out[["ym", "o_orderpriority", "n_orders",
                                "revenue"]])


ORDERS_MONTHLY_DENSE_SQL = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
             AS ym,
         o_orderpriority, count(*) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1, 2),
months AS (
  SELECT CAST(year(d) * 100 + month(d) AS BIGINT) AS ym
  FROM (SELECT unnest(generate_series(
            date_trunc('month', (SELECT min(o_orderdate) FROM orders)),
            date_trunc('month', (SELECT max(o_orderdate) FROM orders)),
            INTERVAL 1 MONTH)) AS d)),
prios AS (SELECT DISTINCT o_orderpriority FROM orders)
SELECT months.ym, prios.o_orderpriority,
       COALESCE(agg.n_orders, 0) AS n_orders,
       CAST(COALESCE(agg.rev, 0) AS DOUBLE) AS revenue
FROM months CROSS JOIN prios
LEFT JOIN agg USING (ym, o_orderpriority)
"""


SESSION_GAP_MIN = 30


@_hash_shuffled
def events_session_stats(sf_dir: str, np_: int = 0):
    """Session-LEVEL aggregates (one row per session, not per user):
    event count, exact value sum, and duration for every gap-delimited
    session — the windowed-aggregate companion to events_sessions.
    Per-user ordering inside groupby(user).map_groups; session ids are
    the cumulative gap count, so both engines number sessions
    identically."""
    import pyarrow.parquet as pq_
    from pathlib import Path
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "session_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "sum_value": pd.Series([], dtype="float64"),
            "duration_s": pd.Series([], dtype="float64")})
    gap_us = SESSION_GAP_MIN * 60_000_000
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        new = np.ones(len(us), np.int64)
        new[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        n = np.bincount(sid)[1:]
        vs = np.bincount(sid, weights=cents)[1:]
        t0 = us[new.astype(bool)]
        ends = np.concatenate((np.flatnonzero(new)[1:] - 1,
                               [len(us) - 1]))
        dur = (us[ends] - t0) / 1_000_000.0
        return pd.DataFrame({
            "user_id": g["user_id"].iloc[0],
            "session_id": np.arange(1, len(n) + 1),
            "n_events": n,
            "sum_value": vs / 100.0,
            "duration_s": dur})

    return ds.groupby("user_id", num_partitions=np_).map_groups(
        sessions, batch_format="pandas")


EVENTS_SESSION_STATS_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > {SESSION_GAP_MIN} * 60 * 1000000 OR
              lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events),
s AS (
  SELECT user_id, ts, value,
         sum(is_start) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
           AS duration_s
FROM s GROUP BY user_id, session_id
"""


@_hash_shuffled
def events_value_winsorized(sf_dir: str, np_: int = 0):
    """Winsorized (p05/p95-clipped) mean per event type — the robust
    mean that survives outliers.  The clip thresholds come from the
    exact quantile_cont replica over the (type, cents, count) grid
    (bit-equal to DuckDB; Ray's Quantile would drift past the clip
    comparison), broadcast into a second clipping pass."""
    import ray
    from cheque_ocr_project_ray.util import (collect_table,
                                             quantile_cont_from_grid)

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def grid_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "cents": money_units(batch.column("value")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["event_type", "cents"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "cents", "n"])

    grid = collect_table(final_merge_sums(
        ds.map_batches(grid_partial, batch_format="pyarrow"),
        ["event_type", "cents"], ["n"], np_=np_).materialize())
    if grid is None or grid.num_rows == 0:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "p05": pd.Series([], dtype="float64"),
            "p95": pd.Series([], dtype="float64"),
            "winsorized_mean": pd.Series([], dtype="float64")})
    gdf = grid.to_pandas().sort_values(["event_type", "cents"])
    bounds = {}
    for et, g in gdf.groupby("event_type", sort=False):
        vals = g["cents"].to_numpy() / 100.0
        cnts = g["n"].to_numpy()
        bounds[et] = (quantile_cont_from_grid(vals, cnts, 0.05),
                      quantile_cont_from_grid(vals, cnts, 0.95))
    b_ref = ray.put(bounds)

    class Clip:
        def __init__(self):
            self.bounds = ray.get(b_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            et = batch.column("event_type").to_pandas()
            lo = et.map({k: v[0] for k, v in self.bounds.items()}) \
                .to_numpy(dtype=np.float64)
            hi = et.map({k: v[1] for k, v in self.bounds.items()}) \
                .to_numpy(dtype=np.float64)
            v = batch.column("value").to_numpy(zero_copy_only=False)
            clipped = np.minimum(np.maximum(v, lo), hi)
            t = pa.table({"event_type": batch.column("event_type"),
                          "n": pa.array(np.ones(batch.num_rows,
                                                np.int64)),
                          "csum": pa.array(clipped, pa.float64())})
            g = t.group_by("event_type").aggregate(
                [("n", "sum"), ("csum", "sum")])
            return g.rename_columns(["event_type", "n", "csum"])

    from cheque_ocr_project_ray.util import map_pool
    agg = final_merge_sums(
        ds.map_batches(Clip, batch_format="pyarrow",
                       concurrency=(1, map_pool())),
        ["event_type"], ["n", "csum"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "n": b["n"],
            "p05": round_half_up(
                b["event_type"].map({k: v[0]
                                     for k, v in bounds.items()}), 4),
            "p95": round_half_up(
                b["event_type"].map({k: v[1]
                                     for k, v in bounds.items()}), 4),
            "winsorized_mean": round_half_up(b["csum"] / b["n"], 4)})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_WINSORIZED_SQL = """
WITH t AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type, count(*) AS n,
       round(any_value(t.lo), 4) AS p05,
       round(any_value(t.hi), 4) AS p95,
       round(sum(least(greatest(e.value, t.lo), t.hi)) / count(*), 4)
           AS winsorized_mean
FROM events e JOIN t USING (event_type)
GROUP BY e.event_type
"""


def _type_value_rollup(ds, np_):
    """(event_type → count, exact value sum) over any events stream —
    shared by the multi-format readers so format parity is checked by
    the SAME aggregate."""
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch.column("event_type"),
                      "n_events": pa.array(np.ones(batch.num_rows,
                                                   np.int64)),
                      "cents": money_units(batch.column("value"))})
        g = t.group_by("event_type").aggregate(
            [("n_events", "sum"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n_events", "cents"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n_events", "cents"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_value"] = b["cents"] / 100.0
        return b.drop(columns=["cents"])

    return agg.map_batches(finish, batch_format="pandas")


_FORMAT_ROLLUP_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


@_hash_shuffled
def events_csv_roundtrip(sf_dir: str, np_: int = 0):
    """The events stream ingested from CSV (ray.data.read_csv +
    schema normalization) — the oracle runs on the PARQUET table, so
    a green row proves the CSV reader path is byte-equivalent to the
    parquet path."""
    from cheque_ocr_project_ray.sources.formats import read_events_csv
    return _type_value_rollup(read_events_csv(sf_dir), np_)


@_hash_shuffled
def events_jsonl_roundtrip(sf_dir: str, np_: int = 0):
    """Same parity check for JSON-lines ingestion
    (ray.data.read_json)."""
    from cheque_ocr_project_ray.sources.formats import read_events_jsonl
    return _type_value_rollup(read_events_jsonl(sf_dir), np_)


@_hash_shuffled
def events_schema_evolution(sf_dir: str, np_: int = 0):
    """Union-by-name read across two schema-DRIFTED derived shards
    (one missing ``ts``, one carrying an extra ``channel`` column,
    orders permuted — see ``sources/formats._evolved_shards``), rolled
    up per event type.  The oracle re-derives the expected counts from
    the ORIGINAL parquet via the shard-parity rule, so a green row
    proves every row survived the union exactly once with correct
    typed null-fill."""
    from cheque_ocr_project_ray.sources.formats import read_events_evolved
    ds = read_events_evolved(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pa.array(np.ones(batch.num_rows, np.int64)),
            "n_with_ts": pc.cast(pc.is_valid(batch.column("ts")),
                                 pa.int64()),
            "n_web": pc.cast(pc.fill_null(pc.equal(
                batch.column("channel"), "web"), False), pa.int64()),
            "cents": money_units(batch.column("value"))})
        g = t.group_by("event_type").aggregate(
            [("n_events", "sum"), ("n_with_ts", "sum"),
             ("n_web", "sum"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n_events", "n_with_ts",
                                 "n_web", "cents"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], ["n_events", "n_with_ts", "n_web", "cents"],
        np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": b["event_type"],
            "n_events": b["n_events"],
            "n_with_ts": b["n_with_ts"],
            "n_web": b["n_web"],
            "sum_value": b["cents"].astype(np.int64) / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


@_hash_shuffled
def user_customer_coverage(sf_dir: str, np_: int = 0):
    """FULL OUTER join of two fact-derived aggregates whose key spaces
    genuinely differ on both sides (users who ERRORED vs customers
    with FAILED orders — verified non-empty on all three sides at
    every tier): per-key activity from both worlds plus a side
    classifier.  This is the distributed full-outer shape — both sides
    shuffle, unmatched rows surface from EITHER side (a broadcast join
    cannot express it: per-batch emission would duplicate unmatched
    small-side rows)."""
    from cheque_ocr_project_ray.relational.joins import hash_join

    def e_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"), "error"))
        t = pa.table({"key": b.column("user_id"),
                      "n_events": pa.array(
                          np.ones(b.num_rows, np.int64))})
        g = t.group_by("key").aggregate([("n_events", "sum")])
        return g.rename_columns(["key", "n_events"])

    def o_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("o_orderstatus"), "F"))
        t = pa.table({"key": b.column("o_custkey"),
                      "n_orders": pa.array(
                          np.ones(b.num_rows, np.int64))})
        g = t.group_by("key").aggregate([("n_orders", "sum")])
        return g.rename_columns(["key", "n_orders"])

    evts = final_merge_sums(
        _pq(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(e_partial, batch_format="pyarrow"),
        ["key"], ["n_events"], np_=np_)
    orders = final_merge_sums(
        _pq(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(o_partial, batch_format="pyarrow"),
        ["key"], ["n_orders"], np_=np_)

    joined = hash_join(evts, orders, on="key", how="outer",
                       num_partitions=np_ or None)

    def finish(batch: pa.Table) -> pa.Table:
        ne = pc.fill_null(batch.column("n_events"),
                          pa.scalar(0, pa.int64()))
        no = pc.fill_null(batch.column("n_orders"),
                          pa.scalar(0, pa.int64()))
        side = pc.if_else(
            pc.equal(ne, pa.scalar(0, pa.int64())),
            pa.scalar("orders_only"),
            pc.if_else(pc.equal(no, pa.scalar(0, pa.int64())),
                       pa.scalar("events_only"), pa.scalar("both")))
        return pa.table({"key": batch.column("key"), "n_events": ne,
                         "n_orders": no, "side": side})

    return joined.map_batches(finish, batch_format="pyarrow")


@_hash_shuffled
def orders_quartile_bands(sf_dir: str, np_: int = 0):
    """Global quantile bucketing (the NTILE/bucketize shape): exact
    q25/q50/q75 from the (cents, count) grid — the bit-equal
    quantile_cont replica, never Ray's drifting Quantile — broadcast
    into a labeling pass, then per-band count / exact-int sum /
    min / max.  Two streaming passes; the grid is bounded-adaptive
    (distinct price cardinality) with the distributed fallback."""
    import ray as _ray
    from cheque_ocr_project_ray.util import (collect_table, map_pool,
                                             quantile_cont_from_grid)

    ds = _pq(sf_dir, "orders", ["o_totalprice"])

    def grid_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"cents": money_units(batch.column("o_totalprice")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("cents").aggregate([("n", "sum")])
        return g.rename_columns(["cents", "n"])

    grid = collect_table(final_merge_sums(
        ds.map_batches(grid_partial, batch_format="pyarrow"),
        ["cents"], ["n"], np_=np_).materialize())
    empty = pd.DataFrame({
        "quartile": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "sum_value": pd.Series([], dtype="float64"),
        "min_value": pd.Series([], dtype="float64"),
        "max_value": pd.Series([], dtype="float64")})
    if grid is None or grid.num_rows == 0:
        return empty
    gdf = grid.to_pandas().sort_values("cents")
    vals = gdf["cents"].to_numpy() / 100.0
    cnts = gdf["n"].to_numpy()
    qs = [quantile_cont_from_grid(vals, cnts, q)
          for q in (0.25, 0.5, 0.75)]
    q_ref = _ray.put(qs)

    class Label:
        def __init__(self):
            self.qs = _ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch.column("o_totalprice") \
                .to_numpy(zero_copy_only=False)
            band = (1 + (v > self.qs[0]).astype(np.int64)
                    + (v > self.qs[1]).astype(np.int64)
                    + (v > self.qs[2]).astype(np.int64))
            cents = money_units(batch.column("o_totalprice")) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            t = pa.table({"quartile": pa.array(band),
                          "n": pa.array(np.ones(len(v), np.int64)),
                          "cents": pa.array(cents),
                          "min_c": pa.array(cents),
                          "neg_max_c": pa.array(-cents)})
            g = t.group_by("quartile").aggregate(
                [("n", "sum"), ("cents", "sum"),
                 ("min_c", "min"), ("neg_max_c", "min")])
            return g.rename_columns(["quartile", "n", "cents",
                                     "min_c", "neg_max_c"])

    partials = ds.map_batches(Label, batch_format="pyarrow",
                              concurrency=(1, map_pool())) \
        .materialize()
    sums = final_merge_sums(partials.select_columns(
        ["quartile", "n", "cents"]), ["quartile"], ["n", "cents"],
        np_=np_).to_pandas()
    from cheque_ocr_project_ray.util import final_merge_min
    mins = final_merge_min(partials.select_columns(
        ["quartile", "min_c", "neg_max_c"]), ["quartile"],
        ["min_c", "neg_max_c"], np_=np_).to_pandas()
    out = sums.merge(mins, on="quartile").sort_values("quartile")
    return pd.DataFrame({
        "quartile": out["quartile"].astype("int64"),
        "n": out["n"].astype("int64"),
        "sum_value": out["cents"].astype(np.int64) / 100.0,
        "min_value": out["min_c"].astype(np.int64) / 100.0,
        "max_value": (-out["neg_max_c"].astype(np.int64)) / 100.0,
    }).reset_index(drop=True)


@_hash_shuffled
def events_table_profile(sf_dir: str, np_: int = 0):
    """Per-column table profile (the lake data-quality audit): row
    count, null count, EXACT distinct count, numeric min/max — one row
    per column.  Distinct counts run per column through the
    two-merge shape (per-batch distinct partials → bounded-adaptive
    merge → distributed count), so no column's value stream ever
    lands on the driver; n/null/min/max share one combined pass."""
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    numeric = {"event_id", "user_id", "value"}
    ds = _pq(sf_dir, "events", cols)

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = []
        if batch.num_rows == 0:  # never poison the min-merge with NaN
            return pa.table({
                "column": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "n_null": pa.array([], pa.int64()),
                "min_num": pa.array([], pa.float64()),
                "neg_max_num": pa.array([], pa.float64())})
        for c in cols:
            col = batch.column(c)
            row = {"column": c, "n": batch.num_rows,
                   "n_null": col.null_count,
                   "min_num": np.nan, "neg_max_num": np.nan}
            if c in numeric and batch.num_rows:
                v = col.to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
                row["min_num"] = float(np.min(v))
                row["neg_max_num"] = float(-np.max(v))
            rows.append(row)
        return pa.table({
            "column": pa.array([r["column"] for r in rows]),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "n_null": pa.array([r["n_null"] for r in rows], pa.int64()),
            "min_num": pa.array([r["min_num"] for r in rows],
                                pa.float64()),
            "neg_max_num": pa.array([r["neg_max_num"] for r in rows],
                                    pa.float64())})

    part = ds.map_batches(stats_partial,
                          batch_format="pyarrow").materialize()
    sums = final_merge_sums(part.select_columns(
        ["column", "n", "n_null"]), ["column"], ["n", "n_null"],
        np_=np_).to_pandas()
    from cheque_ocr_project_ray.util import final_merge_min
    mins = final_merge_min(part.select_columns(
        ["column", "min_num", "neg_max_num"]), ["column"],
        ["min_num", "neg_max_num"], np_=np_).to_pandas()

    n_distinct = {}
    for c in cols:
        def d_partial(batch: pa.Table, _c=c) -> pa.Table:
            t = pa.table({_c: batch.column(_c),
                          "one": pa.array(
                              np.ones(batch.num_rows, np.int64))})
            g = t.group_by(_c).aggregate([("one", "min")])
            return g.rename_columns([_c, "one"])

        merged = final_merge_min(
            ds.map_batches(d_partial, batch_format="pyarrow"),
            [c], ["one"], np_=np_)
        n_distinct[c] = merged.count()

    out = sums.merge(mins, on="column")
    out["n_distinct"] = out["column"].map(n_distinct).astype("int64")
    is_num = out["column"].isin(sorted(numeric))
    out["min_num"] = np.where(is_num, out["min_num"], np.nan)
    out["max_num"] = np.where(is_num, -out["neg_max_num"], np.nan)
    return pd.DataFrame({
        "column": out["column"],
        "n": out["n"].astype("int64"),
        "n_null": out["n_null"].astype("int64"),
        "n_distinct": out["n_distinct"],
        "min_num": out["min_num"].astype("float64"),
        "max_num": out["max_num"].astype("float64"),
    }).sort_values("column").reset_index(drop=True)


_EVENTS_TABLE_PROFILE_SQL = """
SELECT 'event_id' AS "column", count(*) AS n,
       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null,
       count(DISTINCT event_id) AS n_distinct,
       CAST(min(event_id) AS DOUBLE) AS min_num,
       CAST(max(event_id) AS DOUBLE) AS max_num
FROM events
UNION ALL
SELECT 'ts', count(*),
       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT ts), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM events
UNION ALL
SELECT 'user_id', count(*),
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       count(DISTINCT user_id),
       CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
FROM events
UNION ALL
SELECT 'event_type', count(*),
       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       count(DISTINCT event_type),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM events
UNION ALL
SELECT 'value', count(*),
       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       count(DISTINCT value),
       min(value), max(value)
FROM events
ORDER BY "column"
"""


_ORDERS_QUARTILE_SQL = """
WITH t AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
                  quantile_cont(o_totalprice, 0.5)  AS q2,
                  quantile_cont(o_totalprice, 0.75) AS q3
           FROM orders)
SELECT 1 + CAST(o_totalprice > t.q1 AS INT)
         + CAST(o_totalprice > t.q2 AS INT)
         + CAST(o_totalprice > t.q3 AS INT) AS quartile,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_value,
       min(o_totalprice) AS min_value,
       max(o_totalprice) AS max_value
FROM orders, t
GROUP BY 1
ORDER BY 1
"""


_USER_CUSTOMER_COVERAGE_SQL = """
WITH e AS (SELECT user_id AS key, count(*) AS n_events
           FROM events WHERE event_type = 'error' GROUP BY user_id),
o AS (SELECT o_custkey AS key, count(*) AS n_orders
      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
SELECT coalesce(e.key, o.key) AS key,
       coalesce(e.n_events, 0) AS n_events,
       coalesce(o.n_orders, 0) AS n_orders,
       CASE WHEN e.key IS NULL THEN 'orders_only'
            WHEN o.key IS NULL THEN 'events_only'
            ELSE 'both' END AS side
FROM e FULL OUTER JOIN o ON e.key = o.key
"""


_SCHEMA_EVOLUTION_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_ts,
       CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_web,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
"""


CONV_WINDOW_US = 3600 * 1_000_000


@_hash_shuffled
def events_conversion_window(sf_dir: str, np_: int = 0):
    """Time-BOUNDED conversion: users who purchase within one hour
    AFTER a click — the attribution-window funnel (the plain funnel
    only orders steps; real conversion windows expire).  Per-user
    vectorized two-pointer check inside groupby(user).map_groups;
    one tiny global sum."""
    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_type"])

    def flags(group: pd.DataFrame) -> pd.DataFrame:
        us = group["ts"].astype("datetime64[us]").astype("int64")
        et = group["event_type"].to_numpy()
        clicks = np.sort(us[et == "click"].to_numpy())
        if len(clicks) == 0:
            return pd.DataFrame({"has_click": pd.Series([], dtype="int64"),
                                 "converted": pd.Series([], dtype="int64")})
        purchases = np.sort(us[et == "purchase"].to_numpy())
        # purchase p converts iff a click exists in [p - window, p)
        lo = np.searchsorted(clicks, purchases - CONV_WINDOW_US,
                             side="left")
        hi = np.searchsorted(clicks, purchases, side="left")
        converted = int(np.any(hi > lo))
        return pd.DataFrame({"has_click": [1], "converted": [converted]})

    partials = ds.groupby("user_id", num_partitions=np_).map_groups(
        flags, batch_format="pandas")

    def total(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_users": pa.array([int(pc.sum(
                batch.column("has_click")).as_py() or 0)], pa.int64()),
            "n_converted": pa.array([int(pc.sum(
                batch.column("converted")).as_py() or 0)], pa.int64())})

    agg = final_merge_sums(
        partials.map_batches(total, batch_format="pyarrow"),
        ["k"], ["n_users", "n_converted"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_users": b["n_users"],
            "n_converted": b["n_converted"],
            "conv_rate": round_half_up(
                b["n_converted"].astype(np.float64) / b["n_users"], 6)})

    return agg.map_batches(finish, batch_format="pandas")


EVENTS_CONVERSION_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'click'),
conv AS (
  SELECT DISTINCT e.user_id FROM events e
  WHERE e.event_type = 'purchase' AND EXISTS (
    SELECT 1 FROM events c
    WHERE c.user_id = e.user_id AND c.event_type = 'click'
      AND c.ts < e.ts AND e.ts <= c.ts + INTERVAL 1 HOUR))
SELECT (SELECT count(*) FROM u) AS n_users,
       (SELECT count(*) FROM conv) AS n_converted,
       round(CAST((SELECT count(*) FROM conv) AS DOUBLE)
             / (SELECT count(*) FROM u), 6) AS conv_rate
"""


# --- exponentially-decayed per-user engagement score ------------------
_DECAY_HALFLIFE_US = 7 * _DAY_US     # 7-day half-life


@_hash_shuffled
def events_decay_score(sf_dir: str, np_: int = 0):
    """Per-user exponentially time-decayed value sum — the recency-
    weighted engagement score (feature-store staple): each event
    contributes ``value · 0.5^((T_max − ts) / 7d)`` where ``T_max`` is
    the corpus's newest timestamp, so the score is a pure function of
    the data (re-runs reproduce it bit-for-bit; no wall clock).

    Scale shape: pass 1 reduces the global max timestamp through
    per-batch combiner maxima (a scalar); pass 2 streams the decayed
    products into per-user float partials (fixed T makes the weighted
    sum associative) merged bounded-adaptively.  4dp output rounding
    absorbs summation-order drift, the same tolerance every float
    aggregate here uses."""
    tmax = _pq(sf_dir, "events", ["ts"]).map_batches(
        lambda b: pa.table({"t": [pc.max(_ts_col_us(b.column("ts"))).as_py()]}),
        batch_format="pyarrow").max("t")

    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = _ts_col_us(batch.column("ts")).to_numpy(
            zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        w = np.power(0.5, (tmax - ts_us) / float(_DECAY_HALFLIFE_US))
        t = pa.table({"user_id": batch.column("user_id"),
                      "decayed_value": pa.array(w * v, pa.float64()),
                      "n_events": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        g = t.group_by("user_id").aggregate(
            [("decayed_value", "sum"), ("n_events", "sum")])
        return g.rename_columns(["user_id", "decayed_value", "n_events"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], ["decayed_value", "n_events"], np_=np_)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "decayed_value": pa.array(round_half_up(
                batch.column("decayed_value").to_numpy(
                    zero_copy_only=False), 4), pa.float64()),
            "n_events": batch.column("n_events")})

    return agg.map_batches(shape, batch_format="pyarrow").sort("user_id")


EVENTS_DECAY_SCORE_SQL = f"""
WITH t AS (SELECT max(epoch_us(ts)) AS tmax FROM events)
SELECT user_id,
       round(sum(power(0.5, (t.tmax - epoch_us(ts))
                            / {float(_DECAY_HALFLIFE_US)}) * value), 4)
           AS decayed_value,
       count(*) AS n_events
FROM events, t
GROUP BY user_id, t.tmax
ORDER BY user_id
"""


# --- exact heavy hitters via bounded candidate pass -------------------
HH_M = 120        # heavy ⟺ count · M > total (exact integer test)


@_hash_shuffled
def events_heavy_hitters(sf_dir: str, np_: int = 0):
    """Exact frequency heavy hitters (users with > 1/M of all events)
    WITHOUT a full-cardinality groupby — the two-phase candidate shape
    that survives corpora whose key space dwarfs memory.

    Phase 1 keeps, per batch, only keys with local count · M > batch
    rows: by pigeonhole any globally-heavy key is locally heavy in at
    least one batch, so the union (< M candidates per batch, deduped
    through the bounded min-merge) is a guaranteed superset.  Phase 2
    broadcasts the candidate set and recounts EXACTLY (combiner
    partials over the filtered stream), then applies the integer
    threshold against the metadata row count.  The full per-key count
    table never materializes anywhere."""
    import ray

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min, map_pool)

    ds = _pq(sf_dir, "events", ["user_id"])
    total = ds.count()

    def cand_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("user_id").aggregate([("n", "sum")])
        g = g.rename_columns(["user_id", "n"])
        keep = pc.greater(pc.multiply(g.column("n"),
                                      pa.scalar(HH_M, pa.int64())),
                          pa.scalar(batch.num_rows, pa.int64()))
        g = g.filter(keep)
        return pa.table({"user_id": g.column("user_id"),
                         "one": pa.array(
                             np.ones(g.num_rows, np.int64))})

    cand = collect_table(final_merge_min(
        ds.map_batches(cand_partial, batch_format="pyarrow"),
        ["user_id"], ["one"], np_=np_).materialize())
    if cand is None or cand.num_rows == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_events": pd.Series([], dtype="int64")})
    cand_ref = ray.put(cand.column("user_id").combine_chunks())

    class Recount:
        def __init__(self):
            self.cand = ray.get(cand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            b = batch.filter(pc.is_in(batch.column("user_id"),
                                      value_set=self.cand))
            t = pa.table({"user_id": b.column("user_id"),
                          "n_events": pa.array(
                              np.ones(b.num_rows, np.int64))})
            g = t.group_by("user_id").aggregate([("n_events", "sum")])
            return g.rename_columns(["user_id", "n_events"])

    exact = final_merge_sums(
        ds.map_batches(Recount, batch_format="pyarrow",
                       concurrency=(1, map_pool())),
        ["user_id"], ["n_events"], np_=np_)

    def threshold(batch: pa.Table) -> pa.Table:
        keep = pc.greater(pc.multiply(batch.column("n_events"),
                                      pa.scalar(HH_M, pa.int64())),
                          pa.scalar(total, pa.int64()))
        return batch.filter(keep)

    return exact.map_batches(threshold, batch_format="pyarrow") \
        .sort("user_id")


EVENTS_HEAVY_HITTERS_SQL = f"""
WITH c AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
), t AS (SELECT count(*) AS total FROM events)
SELECT user_id, n_events
FROM c, t
WHERE n_events * {HH_M} > total
ORDER BY user_id
"""


# --- time-series lag-1 autocorrelation of the hourly count series ------
@_hash_shuffled
def events_hourly_autocorr(sf_dir: str, np_: int = 0):
    """Lag-1 Pearson autocorrelation of the DENSE hourly event-count
    series — the load-seasonality / drift-detection statistic a
    pipeline monitor computes over ingestion counts.

    Scale shape: one combiner pass reduces the corpus to per-hour
    counts (the grid is bounded by the time span, not the row count);
    the dense fill, the lag pairing and the six exact-int regression
    moments happen on that grid with Python ints; ONE float expression
    at the end mirrors the SQL twin's op order."""
    import math

    from cheque_ocr_project_ray.util import collect_table

    ds = _pq(sf_dir, "events", ["ts"])
    hour_us = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        hrs = pc.divide(_ts_col_us(batch.column("ts")),
                        pa.scalar(hour_us))
        t = pa.table({"hour": hrs,
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("hour").aggregate([("n", "sum")])
        return g.rename_columns(["hour", "n"])

    grid = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["hour"], ["n"], np_=np_).materialize())
    empty = pd.DataFrame({"n_hours": pd.Series([], dtype="int64"),
                          "n_pairs": pd.Series([], dtype="int64"),
                          "autocorr": pd.Series([], dtype="float64")})
    if grid is None or grid.num_rows == 0:
        return empty
    gdf = grid.to_pandas().sort_values("hour")
    lo, hi = int(gdf["hour"].iloc[0]), int(gdf["hour"].iloc[-1])
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[gdf["hour"].to_numpy() - lo] = gdf["n"].to_numpy()
    x, y = dense[:-1], dense[1:]
    k = len(x)
    if k < 2:
        return empty
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x.astype(object) * y.astype(object)).sum())
    sxx = int((x.astype(object) * x.astype(object)).sum())
    syy = int((y.astype(object) * y.astype(object)).sum())
    num = k * sxy - sx * sy
    denx, deny = k * sxx - sx * sx, k * syy - sy * sy
    r = float(num) / math.sqrt(float(denx) * float(deny))
    return pd.DataFrame({"n_hours": [len(dense)], "n_pairs": [k],
                         "autocorr": [float(round_half_up(r, 6))]})


EVENTS_AUTOCORR_SQL = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY 1),
grid AS (
  SELECT unnest(generate_series((SELECT min(h) FROM c),
                                (SELECT max(h) FROM c),
                                INTERVAL 1 HOUR)) AS h),
s AS (
  SELECT grid.h, COALESCE(c.n, 0) AS n
  FROM grid LEFT JOIN c USING (h)),
p AS (
  SELECT n AS x, lead(n) OVER (ORDER BY h) AS y FROM s),
m AS (
  SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM p WHERE y IS NOT NULL)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_hours,
       CAST(k AS BIGINT) AS n_pairs,
       round(CAST(k * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(k * sxx - sx * sx AS DOUBLE)
                    * CAST(k * syy - sy * sy AS DOUBLE)), 6) AS autocorr
FROM m
"""


# --- grouped linear regression from exact-int moment sums --------------
@_hash_shuffled
def lineitem_discount_slope(sf_dir: str, np_: int = 0):
    """Per-returnflag OLS slope of quantity on discount — the grouped
    linear-regression operator (price-elasticity / drift-trend shape).

    The five regression moments (n, Σx, Σy, Σxy, Σx²) are EXACT
    integers in 1e-4 discount units, reduced through combiner
    partials; the slope is assembled on the 3-row merged grid with
    arbitrary-precision Python ints (no int64 overflow at any corpus
    size) and ONE float division — bit-equal to the SQL twin, unlike
    DuckDB's running-covariance ``regr_slope``."""
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_discount", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        x = money_units(batch.column("l_discount"), 4) \
            .to_numpy(zero_copy_only=False)
        y = pc.cast(batch.column("l_quantity"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({"l_returnflag": batch.column("l_returnflag"),
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x), "sy": pa.array(y),
                      "sxy": pa.array(x * y), "sxx": pa.array(x * x)})
        g = t.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")])
        return g.rename_columns(
            ["l_returnflag", "n", "sx", "sy", "sxy", "sxx"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"], ["n", "sx", "sy", "sxy", "sxx"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        slopes = []
        for _, r in b.iterrows():
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sxy, sxx = int(r["sxy"]), int(r["sxx"])
            num, den = n * sxy - sx * sy, n * sxx - sx * sx
            slopes.append(float(round_half_up(
                float(num) / float(den) * 10000.0, 6)))
        return pd.DataFrame({"l_returnflag": b["l_returnflag"],
                             "n": b["n"].astype("int64"),
                             "slope": slopes})

    return agg.map_batches(finish, batch_format="pandas") \
        .sort("l_returnflag")


DISCOUNT_SLOPE_SQL = """
WITH d AS (
  SELECT l_returnflag,
         CAST(CAST(l_discount AS DECIMAL(8,4)) * 10000 AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem),
m AS (
  SELECT l_returnflag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM d GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 10000.0, 6) AS slope
FROM m
ORDER BY l_returnflag
"""


TOP_PARTS_K = 3


@_hash_shuffled
def parts_top_per_nation(sf_dir: str, np_: int = 0):
    """Top-``TOP_PARTS_K`` parts by discounted revenue per supplier
    nation — grouped top-k AFTER aggregation (rank-within-group over a
    derived fact, not raw rows).  Supplier×nation is a broadcast
    dimension; revenue partials combine per batch on (nation, part)
    before the merge, and the per-nation rank runs distributed in
    ``groupby(nation).map_groups`` (group size ≤ |part| — never the
    raw lineitem stream)."""
    import pyarrow.parquet as pq_
    from pathlib import Path

    from cheque_ocr_project_ray.relational.joins import broadcast_join

    empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                          "p_partkey": pd.Series([], dtype="int64"),
                          "revenue": pd.Series([], dtype="float64"),
                          "rnk": pd.Series([], dtype="int64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "lineitem.parquet")) \
            .metadata.num_rows == 0:
        return empty

    supplier = pq_.read_table(str(Path(sf_dir) / "supplier.parquet"),
                              columns=["s_suppkey", "s_nationkey"])
    nation = pq_.read_table(str(Path(sf_dir) / "nation.parquet"),
                            columns=["n_nationkey", "n_name"])
    dim = supplier.rename_columns(["l_suppkey", "s_nationkey"]).join(
        nation.rename_columns(["s_nationkey", "n_name"]),
        keys="s_nationkey", join_type="inner") \
        .select(["l_suppkey", "n_name"])

    li = _pq(sf_dir, "lineitem",
             ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(li, dim, on="l_suppkey")

    def partial(batch: pa.Table) -> pa.Table:
        from cheque_ocr_project_ray.relational.tpch_extra import _du
        t = pa.table({"n_name": batch.column("n_name"),
                      "p_partkey": batch.column("l_partkey"),
                      "du": _du(batch)})
        return t.group_by(["n_name", "p_partkey"]) \
            .aggregate([("du", "sum")]) \
            .rename_columns(["n_name", "p_partkey", "du"])

    agg = final_merge_sums(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["n_name", "p_partkey"], ["du"], np_=np_)

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["du", "p_partkey"],
                          ascending=[False, True]).head(TOP_PARTS_K)
        return pd.DataFrame({
            "n_name": g["n_name"].to_numpy(),
            "p_partkey": g["p_partkey"].to_numpy(np.int64),
            "revenue": g["du"].to_numpy(np.float64) / 10000.0,
            "rnk": np.arange(1, len(g) + 1, dtype=np.int64)})

    return agg.groupby("n_name", num_partitions=np_).map_groups(
        top3, batch_format="pandas")


def _skyline_mask(price: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Non-dominated mask for (maximize price, minimize size).

    Vectorized sweep: at each distinct price level (descending), only
    rows at the level's min size can survive, and they survive iff
    that min beats the best (smallest) size seen at any strictly
    higher price.  Ties on both dims are mutually non-dominating →
    all kept."""
    n = len(price)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    order = np.lexsort((size, -price))
    p_s, s_s = price[order], size[order]
    # level boundaries (price descending, so equal prices adjacent)
    starts = np.flatnonzero(np.concatenate(([True], p_s[1:] != p_s[:-1])))
    level_min = np.minimum.reduceat(s_s, starts)
    # best size among all STRICTLY higher price levels (exclusive)
    best_prev = np.concatenate(
        ([np.inf], np.minimum.accumulate(level_min)[:-1]))
    lvl = np.cumsum(np.concatenate(
        ([0], (p_s[1:] != p_s[:-1]).astype(np.int64))))
    ok = (s_s == level_min[lvl]) & (level_min[lvl] < best_prev[lvl])
    keep[order] = ok
    return keep


def part_skyline(sf_dir: str):
    """Pareto frontier (skyline) of parts: maximize ``p_retailprice``
    while minimizing ``p_size`` — no part in the result is dominated
    by another on both dimensions.  The distributed-skyline classic:
    each batch keeps only its LOCAL skyline (dominance is transitive,
    so global skyline ⊆ union of local skylines), and one final sweep
    over that small candidate union finishes.  Candidate union size is
    the sum of per-batch frontier sizes — orders of magnitude below
    the corpus; a worst-case anti-correlated corpus degrades to a
    second distributed round (repartition + re-sweep), not a failure."""
    from cheque_ocr_project_ray.relational.queries import _pq

    ds = _pq(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])

    def local(batch: pa.Table) -> pa.Table:
        keep = _skyline_mask(
            batch.column("p_retailprice").to_numpy(zero_copy_only=False),
            batch.column("p_size").to_numpy(
                zero_copy_only=False).astype(np.int64))
        return batch.filter(pa.array(keep))

    cand = ds.map_batches(local, batch_format="pyarrow")
    # final sweep over the bounded candidate union
    return cand.repartition(1).map_batches(local, batch_format="pyarrow",
                                           batch_size=None)


PART_SKYLINE_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice >= p.p_retailprice
    AND q.p_size <= p.p_size
    AND (q.p_retailprice > p.p_retailprice OR q.p_size < p.p_size))
"""


@_hash_shuffled
def events_cusum_shift(sf_dir: str, np_: int = 0):
    """CUSUM change-point over the hourly event-count series: the hour
    where the cumulative deviation from the global mean peaks — the
    level-shift detector.  All arithmetic is EXACT integers (the
    deviation is scaled by n_hours: ``cu_i = H·prefix(n) − i·total``),
    so the running statistic is order-stable and bit-equal to the SQL
    window, with no float accumulation drift.  Hourly counts reduce
    via combiner partials (calendar-bounded); the scan itself runs on
    that tiny table."""
    import pyarrow.parquet as pq_
    from pathlib import Path

    empty = pd.DataFrame({
        "shift_hour": pd.Series([], dtype="datetime64[us]"),
        "cusum_scaled": pd.Series([], dtype="int64"),
        "n_hours": pd.Series([], dtype="int64"),
        "total_events": pd.Series([], dtype="int64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return empty

    ds = _pq(sf_dir, "events", ["ts"])
    hour_us = 3_600 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        hr = pc.multiply(pc.divide(us, pa.scalar(hour_us, pa.int64())),
                         pa.scalar(hour_us, pa.int64()))
        t = pa.table({"hr": hr,
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by("hr").aggregate([("n", "sum")]) \
            .rename_columns(["hr", "n"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["hr"], ["n"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "hr" not in b.columns:
            return empty
        b = b.sort_values("hr").reset_index(drop=True)
        n = b["n"].to_numpy(np.int64)
        h, tot = len(n), int(n.sum())
        cu = h * np.cumsum(n) - np.arange(1, h + 1, dtype=np.int64) * tot
        i = int(np.lexsort((np.arange(h), -np.abs(cu)))[0])
        return pd.DataFrame({
            "shift_hour": b["hr"].iloc[[i]].to_numpy(np.int64)
            .astype("datetime64[us]"),
            "cusum_scaled": np.asarray([cu[i]], np.int64),
            "n_hours": np.asarray([h], np.int64),
            "total_events": np.asarray([tot], np.int64)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


EVENTS_CUSUM_SQL = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hr, count(*) AS n
  FROM events GROUP BY 1),
t AS (SELECT count(*) AS nh, sum(n) AS tot FROM h),
c AS (
  SELECT hr,
         (SELECT nh FROM t)
             * sum(n) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING)
         - row_number() OVER (ORDER BY hr) * (SELECT tot FROM t) AS cu
  FROM h)
SELECT hr AS shift_hour, CAST(cu AS BIGINT) AS cusum_scaled,
       CAST((SELECT nh FROM t) AS BIGINT) AS n_hours,
       CAST((SELECT tot FROM t) AS BIGINT) AS total_events
FROM c ORDER BY abs(cu) DESC, hr LIMIT 1
"""


ATTRIB_WINDOW_US = 7 * 24 * 3_600 * 1_000_000


@_hash_shuffled
def events_attribution_linear(sf_dir: str, np_: int = 0):
    """Linear multi-touch attribution: each 'purchase' splits its
    value equally across the user's touches in the prior 7 days,
    credited to the touch's event type.  EXACT integers end to end:
    each touch gets ``cents // n`` and the FIRST touch absorbs the
    remainder (``cents % n``) — a deterministic rule that keeps the
    per-type sums order-independent (a float value/n split would make
    the distributed sum order-sensitive and break cross-engine
    equality).  Per-user windows run FULLY vectorized: both window
    edges come from one searchsorted pair over the (ts, event_id)
    sorted stream and the credit expansion is a repeat/offset arange —
    no per-purchase Python loop; credits merge via combiner sums."""
    import pyarrow.parquet as pq_
    from pathlib import Path

    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_credits": pd.Series([], dtype="int64"),
        "credited_value": pd.Series([], dtype="float64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return empty

    ds = _pq(sf_dir, "events",
             ["user_id", "ts", "event_id", "event_type", "value"])

    def credits(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].astype("int64").to_numpy()
        types = g["event_type"].to_numpy()
        # half-AWAY-from-zero cents — matches the SQL twin's
        # DECIMAL(18,2) cast (np.round is banker's: 0.125 would
        # diverge); generator values are non-negative 2-dp, asserted
        # so the floor-vs-truncating //,% divergence below can't
        # silently activate on a future corpus (ADVICE r4)
        v = g["value"].to_numpy(np.float64)
        cents_all = (np.sign(v)
                     * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)
        assert cents_all.min(initial=0) >= 0, \
            "negative values need truncating div/mod to match DuckDB"
        is_p = types == "purchase"
        # touches = EVERY event strictly before the purchase within
        # the window (purchases can be touches for later purchases).
        # On the (ts, event_id)-sorted stream the touch set of
        # purchase i is exactly the index range
        # [searchsorted(us, us[i]-W), searchsorted(us, us[i])),
        # so both edges vectorize to one searchsorted pair.
        pi = np.flatnonzero(is_p)
        lo = np.searchsorted(us, us[pi] - ATTRIB_WINDOW_US, side="left")
        hi = np.searchsorted(us, us[pi], side="left")
        n = hi - lo
        keep = n > 0
        pi, lo, n = pi[keep], lo[keep], n[keep]
        if len(pi) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n_credits": pd.Series([], dtype="int64"),
                "cents": pd.Series([], dtype="int64")})
        cents = cents_all[pi]
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        total = int(n.sum())
        # touch index expansion: per-purchase arange(lo, lo+n) packed
        # into one flat vector via repeat/offset
        touch = (np.repeat(lo, n)
                 + np.arange(total, dtype=np.int64) - np.repeat(starts, n))
        share = np.repeat(cents // n, n)
        share[starts] += cents % n  # FIRST touch absorbs the remainder
        df = pd.DataFrame({"event_type": types[touch], "cents": share})
        agg = df.groupby("event_type").agg(
            n_credits=("cents", "size"), cents=("cents", "sum"))
        return agg.reset_index()

    per_user = ds.groupby("user_id", num_partitions=np_).map_groups(
        credits, batch_format="pandas")
    merged = final_merge_sums(per_user, ["event_type"],
                              ["n_credits", "cents"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "event_type" not in b.columns:
            return empty
        return pd.DataFrame({
            "event_type": b["event_type"],
            "n_credits": b["n_credits"].astype("int64"),
            "credited_value": b["cents"].to_numpy(np.float64) / 100.0})

    return merged.map_batches(finish, batch_format="pandas")


EVENTS_ATTRIBUTION_SQL = f"""
WITH p AS (
  SELECT user_id, event_id AS pid, ts AS pts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT p.pid, p.cents, t.event_type,
         row_number() OVER (PARTITION BY p.pid
                            ORDER BY t.ts, t.event_id) AS rn,
         count(*) OVER (PARTITION BY p.pid) AS n
  FROM p JOIN events t
    ON t.user_id = p.user_id AND t.ts < p.pts
   AND epoch_us(t.ts) >= epoch_us(p.pts) - {ATTRIB_WINDOW_US})
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(CAST(sum(cents // n
                     + CASE WHEN rn = 1 THEN cents % n ELSE 0 END)
                 AS DOUBLE) / 100.0 AS DOUBLE) AS credited_value
FROM j GROUP BY event_type
"""


DAU_WINDOW_DAYS = 7


@_hash_shuffled
def events_dau_wau(sf_dir: str, np_: int = 0):
    """DAU / trailing-WAU stickiness per day: daily distinct users,
    distinct users over the trailing 7 days, and the ratio — the
    engagement health metric.  The trailing-window distinct cannot
    combine counts: distinct (day, user) pairs fan out to the ≤7
    window-days they serve (the hopping-window replication trick),
    then ONE distributed dedup + bounded count merges finish.  Raw
    events never shuffle — only deduped (day, user) pairs."""
    import pyarrow.parquet as pq_
    from pathlib import Path

    import ray.data
    from ray.data.aggregate import Count

    empty = pd.DataFrame({
        "day": pd.Series([], dtype="datetime64[us]"),
        "dau": pd.Series([], dtype="int64"),
        "wau": pd.Series([], dtype="int64"),
        "stickiness": pd.Series([], dtype="float64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return empty

    ds = _pq(sf_dir, "events", ["ts", "user_id"])
    day_us = 24 * 3_600 * 1_000_000

    def day_pairs(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        day = pc.divide(us, pa.scalar(day_us, pa.int64()))
        t = pa.table({"day": day, "user_id": batch.column("user_id")})
        return t.group_by(["day", "user_id"]).aggregate([])

    distinct = ds.map_batches(day_pairs, batch_format="pyarrow") \
        .groupby(["day", "user_id"],
                 num_partitions=np_ or None).aggregate(
            Count(alias_name="_c"))

    def fan_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False)
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        # dau partial
        dau = pa.table({"day": d, "kind": np.zeros(len(d), np.int64),
                        "user_id": u})
        # wau fan-out: the (day,user) pair serves windows day..day+6
        offs = np.arange(DAU_WINDOW_DAYS, dtype=np.int64)
        wd = (d[:, None] + offs[None, :]).ravel()
        wu = np.repeat(u, DAU_WINDOW_DAYS)
        wau = pa.table({"day": wd,
                        "kind": np.ones(len(wd), np.int64),
                        "user_id": wu})
        return pa.concat_tables([dau, wau]) \
            .group_by(["day", "kind", "user_id"]).aggregate([])

    fanned = distinct.map_batches(fan_partial, batch_format="pyarrow") \
        .groupby(["day", "kind", "user_id"],
                 num_partitions=np_ or None).aggregate(
            Count(alias_name="_c"))

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"day": batch.column("day"),
                      "kind": batch.column("kind"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by(["day", "kind"]).aggregate([("n", "sum")]) \
            .rename_columns(["day", "kind", "n"])

    merged = final_merge_sums(
        fanned.map_batches(count_partial, batch_format="pyarrow"),
        ["day", "kind"], ["n"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "day" not in b.columns:
            return empty
        dau = b[b["kind"] == 0].set_index("day")["n"]
        wau = b[b["kind"] == 1].set_index("day")["n"]
        # report only days with actual activity (dau rows).
        # np.sort COPY, not in-place .sort(): Index.to_numpy returns a
        # VIEW of the index buffer when dtypes match, and sorting it
        # in place scrambles dau's index under .loc — which days hit
        # it depended on the merged block's row order (CPU-count-
        # dependent), the round-5 parallelism-dependent-values bug
        days = np.sort(dau.index.to_numpy(np.int64))
        dv = dau.loc[days].to_numpy(np.int64)
        wv = wau.loc[days].to_numpy(np.int64)
        return pd.DataFrame({
            "day": (days * day_us).astype("datetime64[us]"),
            "dau": dv, "wau": wv,
            "stickiness": round_half_up(
                dv.astype(np.float64) / wv.astype(np.float64), 6)})

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas",
                                             batch_size=None)


EVENTS_DAU_WAU_SQL = f"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
  FROM events),
wau AS (
  SELECT w.day, count(DISTINCT du.user_id) AS wau
  FROM (SELECT DISTINCT day FROM du) w
  JOIN du ON du.day BETWEEN w.day - {DAU_WINDOW_DAYS - 1} AND w.day
  GROUP BY w.day),
dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day)
SELECT make_timestamp(dau.day * 86400000000) AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


SEASONAL_TOP_K = 10


@_hash_shuffled
def events_hourly_seasonal_z(sf_dir: str, np_: int = 0):
    """Seasonal anomaly detection: each hour's event count z-scored
    against its OWN (day-of-week, hour-of-day) seasonal group — the
    "is this Tuesday 3pm unusual for a Tuesday 3pm" monitor, the
    complement of the global-shift CUSUM.  Group moments (k, Σn, Σn²)
    are exact integers, so mean/var/z are bit-equal to the SQL twin
    (sqrt is IEEE-correctly-rounded on identical inputs).  Hourly
    counts reduce via combiner partials; the seasonal join and top-k
    run on the calendar-bounded table."""
    import pyarrow.parquet as pq_
    from pathlib import Path

    empty = pd.DataFrame({
        "hr": pd.Series([], dtype="datetime64[us]"),
        "dow": pd.Series([], dtype="int64"),
        "hod": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
        "mean_n": pd.Series([], dtype="float64"),
        "z": pd.Series([], dtype="float64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return empty

    ds = _pq(sf_dir, "events", ["ts"])
    hour_us = 3_600 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        hr = pc.multiply(pc.divide(us, pa.scalar(hour_us, pa.int64())),
                         pa.scalar(hour_us, pa.int64()))
        t = pa.table({"hr": hr,
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by("hr").aggregate([("n", "sum")]) \
            .rename_columns(["hr", "n"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["hr"], ["n"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "hr" not in b.columns:
            return empty
        hr_us_arr = b["hr"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        days = hr_us_arr // (24 * hour_us)
        dow = (days + 4) % 7          # 1970-01-01 = Thursday = 4
        hod = (hr_us_arr // hour_us) % 24
        g = pd.DataFrame({"dow": dow, "hod": hod, "n": n})
        st = g.groupby(["dow", "hod"])["n"].agg(
            k="count", s="sum", q=lambda x: int((x.astype(object)
                                                 ** 2).sum()))
        st = st.reset_index()
        m = g.merge(st, on=["dow", "hod"])
        k = m["k"].to_numpy(np.float64)
        s = m["s"].to_numpy(np.float64)
        q = m["q"].to_numpy(np.float64)
        mu = s / k
        var = (q * k - s * s) / (k * k)
        nn = m["n"].to_numpy(np.float64)
        z = np.where(var > 0, (nn - mu) / np.sqrt(np.where(var > 0,
                                                           var, 1.0)),
                     0.0)
        order = np.lexsort((hr_us_arr, -np.abs(z)))[:SEASONAL_TOP_K]
        return pd.DataFrame({
            "hr": hr_us_arr[order].astype("datetime64[us]"),
            "dow": dow[order].astype(np.int64),
            "hod": hod[order].astype(np.int64),
            "n_events": n[order],
            "mean_n": round_half_up(mu[order], 6),
            "z": round_half_up(z[order], 4)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


EVENTS_SEASONAL_Z_SQL = f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS hr, count(*) AS n
  FROM events GROUP BY 1),
g AS (SELECT hr, n, dayofweek(hr) AS dow, hour(hr) AS hod FROM h),
st AS (
  SELECT dow, hod, count(*) AS k, sum(n) AS s, sum(n * n) AS q
  FROM g GROUP BY 1, 2),
z AS (
  SELECT g.hr, g.dow, g.hod, g.n,
         CAST(s AS DOUBLE) / k AS mu,
         (CAST(q AS DOUBLE) * k - CAST(s AS DOUBLE) * s)
             / (CAST(k AS DOUBLE) * k) AS var
  FROM g JOIN st ON g.dow = st.dow AND g.hod = st.hod)
SELECT hr, CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
       CAST(n AS BIGINT) AS n_events,
       round(mu, 6) AS mean_n,
       round(CASE WHEN var > 0 THEN (n - mu) / sqrt(var)
             ELSE 0 END, 4) AS z
FROM z
ORDER BY abs(CASE WHEN var > 0 THEN (n - mu) / sqrt(var)
             ELSE 0 END) DESC, hr
LIMIT {SEASONAL_TOP_K}
"""


@_hash_shuffled
def suppliers_hhi_by_parttype(sf_dir: str, np_: int = 0):
    """Market concentration per part type: the Herfindahl–Hirschman
    index of supplier revenue shares (Σ shareᵢ², 1/n..1) plus the
    supplier count — the assortment-risk report.  Per-(type, supplier)
    revenue reduces to exact integer cents via combiner partials; the
    HHI itself is computed from arbitrary-precision integer moments
    (Σc², (Σc)² — c² overflows int64 at corpus scale) with ONE final
    double division, bit-equal to the HUGEINT SQL."""
    import pyarrow.parquet as pq_
    from pathlib import Path

    empty = pd.DataFrame({
        "p_type": pd.Series([], dtype="object"),
        "n_suppliers": pd.Series([], dtype="int64"),
        "hhi": pd.Series([], dtype="float64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "lineitem.parquet")) \
            .metadata.num_rows == 0:
        return empty

    part = pq_.read_table(str(Path(sf_dir) / "part.parquet"),
                          columns=["p_partkey", "p_type"])
    part_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_type").combine_chunks()))

    li = _pq(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        pkeys, ptypes = ray.get(part_ref)
        idx = pc.index_in(batch.column("l_partkey"), value_set=pkeys)
        t = pa.table({"p_type": ptypes.take(idx),
                      "l_suppkey": batch.column("l_suppkey"),
                      "cents": money_units(
                          batch.column("l_extendedprice"))})
        return t.group_by(["p_type", "l_suppkey"]) \
            .aggregate([("cents", "sum")]) \
            .rename_columns(["p_type", "l_suppkey", "cents"])

    agg = final_merge_sums(
        li.map_batches(partial, batch_format="pyarrow"),
        ["p_type", "l_suppkey"], ["cents"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "p_type" not in b.columns:
            return empty
        rows = []
        for ptype, g in b.groupby("p_type", sort=True):
            cs = [int(c) for c in g["cents"]]  # python ints: exact c²
            num = sum(c * c for c in cs)
            den = sum(cs)
            hhi = float(num) / (float(den) * float(den)) if den else 0.0
            rows.append((ptype, len(cs), float(round_half_up(hhi, 6))))
        return pd.DataFrame(rows, columns=["p_type", "n_suppliers",
                                           "hhi"]) \
            .astype({"n_suppliers": "int64"})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


SUPPLIERS_HHI_SQL = """
WITH s AS (
  SELECT p_type, l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
              AS BIGINT) AS c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2)
SELECT p_type, CAST(count(*) AS BIGINT) AS n_suppliers,
       round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
             / (CAST(sum(c) AS DOUBLE) * CAST(sum(c) AS DOUBLE)), 6)
           AS hhi
FROM s GROUP BY p_type
"""


PATH_LEN = 4
PATH_TOP_K = 20


@_hash_shuffled
def events_funnel_paths(sf_dir: str, np_: int = 0):
    """Top-``PATH_TOP_K`` user journey prefixes: each user's first
    ``PATH_LEN`` event types (ordered by ts, event_id) joined into one
    path string, counted across users — sequence mining's "what do
    people actually do first".  Per-user ordering happens inside
    ``groupby(user).map_groups`` (sessionization partitioning
    assumption); the path table is ≤|types|^len — merge-bounded — and
    the final top-k is a sort of that bounded table, never raw rows."""
    import pyarrow.parquet as pq_
    from pathlib import Path
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return pd.DataFrame({"path": pd.Series([], dtype="object"),
                             "n_users": pd.Series([], dtype="int64")})

    ds = _pq(sf_dir, "events", ["user_id", "ts", "event_id",
                                "event_type"])

    def path(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).head(PATH_LEN)
        return pd.DataFrame({"path": [">".join(g["event_type"])],
                             "n_users": np.asarray([1], np.int64)})

    per_user = ds.groupby("user_id", num_partitions=np_).map_groups(
        path, batch_format="pandas")
    agg = final_merge_sums(per_user, ["path"], ["n_users"], np_=np_)
    return agg.sort(["n_users", "path"],
                    descending=[True, False]).limit(PATH_TOP_K)


EVENTS_FUNNEL_PATHS_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {PATH_LEN} GROUP BY user_id)
SELECT path, count(*) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path
LIMIT {PATH_TOP_K}
"""


@_hash_shuffled
def events_user_overlap(sf_dir: str, np_: int = 0):
    """Audience-overlap matrix: for every event-type pair, the count
    of users doing BOTH plus the Jaccard of their user sets — the
    co-engagement report.  Per-user distinct type sets come from one
    ``groupby(user)`` pass that emits both the within-user pairs AND a
    one-row-per-type presence marker (``type_a == type_b``), so user
    streams are deduped exactly once; everything after is a bounded
    |types|² merge."""
    import itertools

    import pyarrow.parquet as pq_
    from pathlib import Path

    empty = pd.DataFrame({
        "type_a": pd.Series([], dtype="object"),
        "type_b": pd.Series([], dtype="object"),
        "n_both": pd.Series([], dtype="int64"),
        "n_a": pd.Series([], dtype="int64"),
        "n_b": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64")})
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return empty

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([])

    ut = ds.map_batches(distinct_partial, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(set(group["event_type"]))
        a = list(ts)          # presence markers: type_a == type_b
        b = list(ts)
        for x, y in itertools.combinations(ts, 2):
            a.append(x)
            b.append(y)
        return pd.DataFrame({"type_a": a, "type_b": b,
                             "n": np.ones(len(a), np.int64)})

    merged = final_merge_sums(
        ut.groupby("user_id", num_partitions=np_).map_groups(
            pairs, batch_format="pandas"),
        ["type_a", "type_b"], ["n"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "type_a" not in b.columns:
            return empty
        counts = b[b["type_a"] == b["type_b"]] \
            .set_index("type_a")["n"].to_dict()
        p = b[b["type_a"] != b["type_b"]].sort_values(
            ["type_a", "type_b"])
        na = p["type_a"].map(counts).to_numpy(np.int64)
        nb = p["type_b"].map(counts).to_numpy(np.int64)
        inter = p["n"].to_numpy(np.int64)
        return pd.DataFrame({
            "type_a": p["type_a"].to_numpy(),
            "type_b": p["type_b"].to_numpy(),
            "n_both": inter, "n_a": na, "n_b": nb,
            "jaccard": round_half_up(
                inter.astype(np.float64) / (na + nb - inter), 6)})

    return merged.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)


EVENTS_USER_OVERLAP_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
cnt AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS inter
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b,
       CAST(inter AS BIGINT) AS n_both,
       CAST(ca.n AS BIGINT) AS n_a,
       CAST(cb.n AS BIGINT) AS n_b,
       round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6)
           AS jaccard
FROM pr
JOIN cnt ca ON ca.event_type = type_a
JOIN cnt cb ON cb.event_type = type_b
"""


@_hash_shuffled
def orders_priority_mix_shift(sf_dir: str, np_: int = 0):
    """Quarter-over-quarter order-priority mix: each quarter's share
    per priority plus the share delta vs the SAME priority one quarter
    earlier (LAG over an aggregate, not raw rows) — the mix-shift
    monitor.  The combiner reduces the corpus to a calendar×|priority|
    table before any window logic; the window itself runs on that
    driver-tiny table."""
    ds = _pq(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("o_orderdate"), pa.timestamp("us"))
        q = pc.add(pc.divide(pc.subtract(pc.cast(pc.month(ts), pa.int64()),
                                         pa.scalar(1, pa.int64())),
                             pa.scalar(3, pa.int64())),
                   pa.scalar(1, pa.int64()))
        yq = pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                                pa.scalar(10, pa.int64())), q)
        t = pa.table({"yq": yq,
                      "o_orderpriority": batch.column("o_orderpriority"),
                      "n_orders": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by(["yq", "o_orderpriority"]) \
            .aggregate([("n_orders", "sum")]) \
            .rename_columns(["yq", "o_orderpriority", "n_orders"])

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["yq", "o_orderpriority"], ["n_orders"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "yq" not in b.columns:
            return pd.DataFrame({
                "yq": pd.Series([], dtype="int64"),
                "o_orderpriority": pd.Series([], dtype="object"),
                "n_orders": pd.Series([], dtype="int64"),
                "share": pd.Series([], dtype="float64"),
                "share_delta": pd.Series([], dtype="float64")})
        b = b.sort_values(["o_orderpriority", "yq"]) \
            .reset_index(drop=True)
        share = (b["n_orders"].to_numpy(np.float64)
                 / b.groupby("yq")["n_orders"].transform("sum")
                 .to_numpy(np.float64))
        prev = pd.Series(share).groupby(b["o_orderpriority"]).shift(1)
        return pd.DataFrame({
            "yq": b["yq"], "o_orderpriority": b["o_orderpriority"],
            "n_orders": b["n_orders"],
            "share": round_half_up(share, 6),
            "share_delta": round_half_up(
                (share - prev.to_numpy(np.float64)), 6)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


ORDERS_MIX_SHIFT_SQL = """
WITH c AS (
  SELECT year(o_orderdate) * 10 + quarter(o_orderdate) AS yq,
         o_orderpriority, count(*) AS n_orders
  FROM orders GROUP BY 1, 2),
s AS (
  SELECT yq, o_orderpriority, n_orders,
         CAST(n_orders AS DOUBLE)
             / sum(n_orders) OVER (PARTITION BY yq) AS share
  FROM c)
SELECT yq, o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
       round(share, 6) AS share,
       round(share - lag(share) OVER (PARTITION BY o_orderpriority
                                      ORDER BY yq), 6) AS share_delta
FROM s
"""


TOP_PARTS_SQL = f"""
WITH rev AS (
  SELECT n_name, l_partkey AS p_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS du
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  GROUP BY n_name, l_partkey),
rk AS (
  SELECT n_name, p_partkey, du,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY du DESC, p_partkey) AS rnk
  FROM rev)
SELECT n_name, p_partkey, CAST(du AS DOUBLE) AS revenue,
       CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= {TOP_PARTS_K}
"""


def _session_delta_ds(sf_dir: str, np_: int, gap_minutes: int,
                      bound: int):
    """Session-interval delta stream shared by the interval-overlap
    scanline family (``events_peak_concurrency``,
    ``events_busy_coverage``): a materialized Dataset of UNIQUE
    (t, d) rows where d is the net number of sessions opening at
    microsecond t (+1 at each session's first event, −1 at last+1µs),
    or None when there are no events.

    Gap sessionization (30 min default, the ``events_sessions``
    definition) runs WITHOUT the one-user-fits-one-group assumption: a
    session boundary is a pure LAG predicate over the (user, ts)-
    sorted stream, so the plan is per-batch (user, ts) distinct → ONE
    distributed sort → per-block vectorized boundary detection with a
    (last-row, first-row) carry between neighbor blocks (n_blocks
    4-tuples through the driver — raw tasks, because the lag needs
    block ORDER).  Duplicate (user, ts) pairs surviving the per-batch
    distinct are harmless by construction (their lag diff is 0, so
    they can never open or close a session).  Deltas merge via the
    bounded-adaptive sum, staying distributed past ``bound``."""
    import ray.data as _rd

    ds = _pq(sf_dir, "events", ["user_id", "ts"])
    gap_us = gap_minutes * 60_000_000

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "us": pc.cast(pc.cast(batch.column("ts"),
                                            pa.timestamp("us")),
                                    pa.int64())})
        return t.group_by(["user_id", "us"]).aggregate([])

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .sort(["user_id", "us"]).materialize()
    pair_refs = pairs.to_arrow_refs()

    @ray.remote
    def block_edges(tb: pa.Table):
        if tb.num_columns == 0 or tb.num_rows == 0:
            return None
        u = tb.column("user_id")
        t = tb.column("us")
        return (u[0].as_py(), t[0].as_py(),
                u[-1].as_py(), t[-1].as_py())

    edges = ray.get([block_edges.remote(r) for r in pair_refs])
    live = [i for i, e in enumerate(edges) if e is not None]
    # neighbor carry skips empty blocks; sentinel None = stream edge
    prev_of = {}
    next_of = {}
    for a, b in zip(live, live[1:]):
        prev_of[b] = edges[a][2:]   # (last_user, last_us) of a
        next_of[a] = edges[b][:2]   # (first_user, first_us) of b

    @ray.remote
    def block_deltas(tb: pa.Table, prev, nxt, gap: int) -> pa.Table:
        u = tb.column("user_id").to_numpy(zero_copy_only=False)
        t = tb.column("us").to_numpy(zero_copy_only=False)
        pu = np.concatenate(([prev[0] if prev else -1], u[:-1]))
        pt = np.concatenate(([prev[1] if prev else 0], t[:-1]))
        nu = np.concatenate((u[1:], [nxt[0] if nxt else -1]))
        nt = np.concatenate((t[1:], [nxt[1] if nxt else 0]))
        is_start = (u != pu) | (t - pt > gap)
        if not prev:
            is_start[0] = True
        is_end = (u != nu) | (nt - t > gap)
        if not nxt:
            is_end[-1] = True
        df = pd.DataFrame({
            "t": np.concatenate((t[is_start], t[is_end] + 1)),
            "d": np.concatenate(
                (np.ones(int(is_start.sum()), np.int64),
                 np.full(int(is_end.sum()), -1, np.int64)))})
        g = df.groupby("t", as_index=False).agg(d=("d", "sum"))
        return pa.table({"t": pa.array(g["t"].to_numpy(), pa.int64()),
                         "d": pa.array(g["d"].to_numpy(), pa.int64())})

    delta_refs = [block_deltas.remote(pair_refs[i],
                                      prev_of.get(i), next_of.get(i),
                                      gap_us)
                  for i in live]
    if not delta_refs:
        return None
    pts = _rd.from_arrow_refs(delta_refs)
    return final_merge_sums(pts, ["t"], ["d"], np_=np_,
                            bound=bound).materialize()


@_hash_shuffled
def events_peak_concurrency(sf_dir: str, np_: int = 0,
                            gap_minutes: int = 30,
                            bound: int = 2_000_000):
    """Peak number of SIMULTANEOUSLY active sessions across all users
    — the interval-overlap scanline a capacity planner runs, over the
    shared :func:`_session_delta_ds` stream (see there for the
    sort+carry shape).  Under ``bound`` the prefix max folds on the
    driver; past it (session cardinality beyond driver memory) the
    fallback is the ``orders_pareto`` two-phase prefix scan: per-block
    delta totals make exclusive offsets, each block reports its own
    (max, earliest-t) candidate, and the driver folds n_blocks pairs.
    Output is one row (peak_concurrency, peak_us)."""
    from cheque_ocr_project_ray.util import collect_table

    agg_ds = _session_delta_ds(sf_dir, np_, gap_minutes, bound)
    empty = pd.DataFrame({
        "peak_concurrency": pd.Series([], dtype="int64"),
        "peak_us": pd.Series([], dtype="int64")})
    if agg_ds is None:
        return empty
    if agg_ds.count() <= bound:
        t = collect_table(agg_ds)
        if t is None or t.num_rows == 0:
            return empty
        ts_ = t.column("t").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.argsort(ts_)  # keys unique after the merge
        conc = np.cumsum(d[order])
        i = int(np.argmax(conc))  # first occurrence = earliest t
        return pd.DataFrame({"peak_concurrency": [int(conc[i])],
                             "peak_us": [int(ts_[order][i])]})
    # distributed fallback: prefix needs block ORDER, which the
    # Dataset API does not expose — the documented raw-task last resort
    refs = agg_ds.sort(["t"]).materialize().to_arrow_refs()

    @ray.remote
    def block_total(tb: pa.Table) -> int:
        if tb.num_columns == 0 or tb.num_rows == 0:
            return 0
        return int(pc.sum(tb.column("d")).as_py() or 0)

    sums = ray.get([block_total.remote(r) for r in refs])
    offs = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def block_peak(tb: pa.Table, off: int):
        if tb.num_columns == 0 or tb.num_rows == 0:
            return None
        conc = off + np.cumsum(
            tb.column("d").to_numpy(zero_copy_only=False))
        i = int(np.argmax(conc))
        return (int(conc[i]),
                int(tb.column("t").to_numpy(zero_copy_only=False)[i]))

    cands = [c for c in ray.get([block_peak.remote(r, int(o))
                                 for r, o in zip(refs, offs)])
             if c is not None]
    if not cands:
        return empty
    peak = max(c[0] for c in cands)
    return pd.DataFrame({
        "peak_concurrency": [peak],
        "peak_us": [min(c[1] for c in cands if c[0] == peak)]})


# session-interval delta grid — ONE snippet shared by both scanline
# oracles so the session definition cannot drift between them
_SESSION_DELTA_CTE = f"""
WITH du AS (
  SELECT DISTINCT user_id, epoch_us(ts) AS us FROM events),
ordered AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {30 * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS is_start
  FROM du WINDOW w AS (PARTITION BY user_id ORDER BY us)),
sess AS (
  SELECT user_id, us,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered),
iv AS (SELECT min(us) AS s, max(us) AS e
       FROM sess GROUP BY user_id, sid),
pts AS (SELECT s AS t, 1 AS d FROM iv
        UNION ALL SELECT e + 1 AS t, -1 AS d FROM iv),
ag AS (SELECT t, sum(d) AS d FROM pts GROUP BY t)"""

EVENTS_PEAK_CONCURRENCY_SQL = _SESSION_DELTA_CTE + """,
run AS (SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                 AS conc
        FROM ag)
SELECT CAST(conc AS BIGINT) AS peak_concurrency,
       CAST(t AS BIGINT) AS peak_us
FROM run ORDER BY conc DESC, t LIMIT 1
"""


@_hash_shuffled
def events_busy_coverage(sf_dir: str, np_: int = 0,
                         gap_minutes: int = 30,
                         bound: int = 2_000_000):
    """Union-of-intervals coverage: total microseconds where AT LEAST
    one session is active anywhere in the system, and the number of
    maximal busy intervals — the merged-interval operator, over the
    shared :func:`_session_delta_ds` stream.  Prev-concurrency at a
    point is ``conc − d`` (same row), so interval OPENINGS need no
    lag; the busy span between consecutive points needs the NEXT
    point's t, which the bounded path reads in one vector shift and
    the distributed fallback carries between neighbor blocks
    (n_blocks ints).  The global last point always closes every
    session (deltas sum to 0), so there is no tail term and every
    quantity stays an exact integer.  Output: one row
    (busy_us, n_busy_intervals)."""
    from cheque_ocr_project_ray.util import collect_table

    agg_ds = _session_delta_ds(sf_dir, np_, gap_minutes, bound)
    empty = pd.DataFrame({
        "busy_us": pd.Series([], dtype="int64"),
        "n_busy_intervals": pd.Series([], dtype="int64")})
    if agg_ds is None:
        return empty
    if agg_ds.count() <= bound:
        t = collect_table(agg_ds)
        if t is None or t.num_rows == 0:
            return empty
        ts_ = t.column("t").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.argsort(ts_)  # keys unique after the merge
        ts_, d = ts_[order], d[order]
        conc = np.cumsum(d)
        busy = int(np.sum((ts_[1:] - ts_[:-1])[conc[:-1] > 0]))
        n_iv = int(np.sum((conc > 0) & (conc - d == 0)))
        return pd.DataFrame({"busy_us": [busy],
                             "n_busy_intervals": [n_iv]})
    # distributed fallback: same two-phase block scan as the peak
    refs = agg_ds.sort(["t"]).materialize().to_arrow_refs()

    @ray.remote
    def block_info(tb: pa.Table):
        if tb.num_columns == 0 or tb.num_rows == 0:
            return None
        return (int(pc.sum(tb.column("d")).as_py() or 0),
                int(tb.column("t")[0].as_py()))

    infos = ray.get([block_info.remote(r) for r in refs])
    live = [i for i, x in enumerate(infos) if x is not None]
    if not live:
        return empty
    nxt_t = {a: infos[b][1] for a, b in zip(live, live[1:])}
    offs, run = {}, 0
    for i in live:
        offs[i] = run
        run += infos[i][0]

    @ray.remote
    def block_busy(tb: pa.Table, off: int, nxt):
        ts_ = tb.column("t").to_numpy(zero_copy_only=False)
        d = tb.column("d").to_numpy(zero_copy_only=False)
        conc = off + np.cumsum(d)
        busy = int(np.sum((ts_[1:] - ts_[:-1])[conc[:-1] > 0]))
        if nxt is not None and conc[-1] > 0:
            busy += int(nxt - ts_[-1])
        return busy, int(np.sum((conc > 0) & (conc - d == 0)))

    parts = ray.get([block_busy.remote(refs[i], int(offs[i]),
                                       nxt_t.get(i))
                     for i in live])
    return pd.DataFrame({
        "busy_us": [sum(p[0] for p in parts)],
        "n_busy_intervals": [sum(p[1] for p in parts)]})


EVENTS_BUSY_COVERAGE_SQL = _SESSION_DELTA_CTE + """,
run AS (SELECT t, d,
               sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                   AS conc,
               lead(t) OVER (ORDER BY t) AS nt
        FROM ag)
SELECT CAST(sum(CASE WHEN conc > 0 THEN nt - t ELSE 0 END)
            AS BIGINT) AS busy_us,
       CAST(sum(CASE WHEN conc > 0 AND conc - d = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_busy_intervals
FROM run
"""


@_hash_shuffled
def customer_cohort_ltv(sf_dir: str, np_: int = 0,
                        bound: int = 2_000_000):
    """Cohort lifetime-value matrix: customers cohorted by their FIRST
    order month; revenue and order counts roll up per (cohort month,
    months-since-first).  NO orders shuffle (the r5 rework — the
    first cut shuffled the whole fact table through
    ``groupby(custkey).map_groups``): per-batch combiners reduce to
    (custkey, month) partial sums, the bounded-adaptive merge yields
    the |customers|×|months|-bounded grid, and the per-customer
    cohort month — a min over that grid — is attached back via a
    broadcast under ``bound`` or a hash join past it (the
    events_retention shape).  Only the months²-bounded (cohort, age)
    matrix ever reaches the driver — class (a).  Cents are exact
    integers (``money_units``), so the grouped revenue matches the
    DECIMAL oracle bit-for-bit."""
    from cheque_ocr_project_ray.relational.joins import (broadcast_join,
                                                         hash_join)
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min)
    ds = _pq(sf_dir, "orders",
             ["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        m = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()),
                               pa.scalar(12)),
                   pc.subtract(pc.cast(pc.month(d), pa.int64()),
                               pa.scalar(1)))
        t = pa.table({"o_custkey": batch.column("o_custkey"), "m": m,
                      "cents": money_units(batch.column("o_totalprice")),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["o_custkey", "m"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return g.rename_columns(["o_custkey", "m", "cents", "n_orders"])

    grid = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey", "m"], ["cents", "n_orders"],
        np_=np_, bound=bound).materialize()
    if grid.count() == 0:
        return ray.data.from_arrow(pa.table({
            "cohort_month": pa.array([], pa.string()),
            "age_months": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64())}))

    cohort = final_merge_min(
        grid.select_columns(["o_custkey", "m"]), ["o_custkey"], ["m"],
        np_=np_, bound=bound).map_batches(
        lambda b: b.rename_columns(["o_custkey", "cm"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if cohort.count() <= bound:
        j = broadcast_join(grid, collect_table(cohort), on="o_custkey")
    else:
        j = hash_join(grid, cohort, on="o_custkey",
                      num_partitions=np_ or None)

    def age_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"cohort_m": batch.column("cm"),
                      "age_months": pc.subtract(batch.column("m"),
                                                batch.column("cm")),
                      "cents": batch.column("cents"),
                      "n_orders": batch.column("n_orders")})
        g = t.group_by(["cohort_m", "age_months"]).aggregate(
            [("cents", "sum"), ("n_orders", "sum")])
        return g.rename_columns(["cohort_m", "age_months", "cents",
                                 "n_orders"])

    agg = final_merge_sums(
        j.map_batches(age_partial, batch_format="pyarrow"),
        ["cohort_m", "age_months"], ["cents", "n_orders"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        y = (b["cohort_m"] // 12).astype("int64")
        mo = (b["cohort_m"] % 12 + 1).astype("int64")
        return pd.DataFrame({
            "cohort_month": (y.astype(str).str.zfill(4) + "-"
                             + mo.astype(str).str.zfill(2)),
            "age_months": b["age_months"].astype("int64"),
            "n_orders": b["n_orders"].astype("int64"),
            "revenue": b["cents"] / 100.0})

    return agg.map_batches(finish, batch_format="pandas")


CUSTOMER_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders),
c AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1)
SELECT printf('%04d-%02d', cm // 12, cm % 12 + 1) AS cohort_month,
       CAST(m - cm AS BIGINT) AS age_months,
       count(*) AS n_orders,
       CAST(sum(p) AS DOUBLE) AS revenue
FROM o JOIN c USING (o_custkey)
GROUP BY cohort_month, age_months
"""


# composite (custkey, month) key multiplier for the prev-month
# presence self-join: absolute month numbers (year*12 + month - 1)
# stay < 2^21 for any calendar date, so custkey << 21 never collides
_GROWTH_MK = 1 << 21


def orders_growth_accounting(sf_dir: str, np_: int = 0,
                             bound: int = 2_000_000):
    """Monthly growth accounting: every active customer-month is
    exactly one of NEW (first-ever active month), RETAINED (also
    active the month before) or RESURRECTED (returning after a gap),
    and CHURNED(m) = active(m-1) − retained(m) — the
    new/retained/resurrected/churned decomposition every
    subscription/marketplace dashboard runs.  The orders fact stream
    never shuffles: per-batch distinct (custkey, month) partials
    reduce through the bounded-adaptive merge to the
    |customers|×|months|-bounded activity grid; the per-customer
    first month is a min over that grid.  Under ``bound`` the
    classification is one driver numpy pass over the collected grid;
    past it nothing is collected: the prev-month presence flag comes
    from a composite-key LEFT hash self-join of the grid against
    itself shifted one month, the first month attaches via a
    custkey-keyed hash join, the class is row-local, and per-(month,
    class) counts reduce through the months-bounded merge — the
    driver only ever folds the |months| grid (class a+b).  All-int
    output, so the DuckDB twin matches bit-for-bit."""
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min)

    ds = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        m = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()),
                               pa.scalar(12)),
                   pc.subtract(pc.cast(pc.month(d), pa.int64()),
                               pa.scalar(1)))
        t = pa.table({"o_custkey": batch.column("o_custkey"), "m": m,
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by(["o_custkey", "m"]).aggregate([("n", "sum")]) \
            .rename_columns(["o_custkey", "m", "n"])

    grid = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey", "m"], ["n"], np_=np_, bound=bound) \
        .select_columns(["o_custkey", "m"]).materialize()

    def _finish(per_month: pd.DataFrame) -> pd.DataFrame:
        g = per_month.groupby("m", as_index=False)[
            ["new_c", "retained_c", "resurrected_c"]].sum() \
            .sort_values("m").reset_index(drop=True)
        active = (g["new_c"] + g["retained_c"]
                  + g["resurrected_c"]).to_numpy(np.int64)
        prev_active = dict(zip(g["m"].to_numpy(np.int64), active))
        churn = np.array([prev_active.get(m - 1, 0)
                          for m in g["m"].to_numpy(np.int64)],
                         np.int64) - g["retained_c"].to_numpy(np.int64)
        y = (g["m"] // 12).astype("int64")
        mo = (g["m"] % 12 + 1).astype("int64")
        return pd.DataFrame({
            "month": (y.astype(str).str.zfill(4) + "-"
                      + mo.astype(str).str.zfill(2)),
            "new_c": g["new_c"].astype("int64"),
            "retained_c": g["retained_c"].astype("int64"),
            "resurrected_c": g["resurrected_c"].astype("int64"),
            "churned_c": churn,
            "active": active})

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "month": pd.Series([], dtype="object"),
            "new_c": pd.Series([], dtype="int64"),
            "retained_c": pd.Series([], dtype="int64"),
            "resurrected_c": pd.Series([], dtype="int64"),
            "churned_c": pd.Series([], dtype="int64"),
            "active": pd.Series([], dtype="int64")})

    n_pairs = grid.count()
    if n_pairs == 0:
        return _empty()
    if n_pairs <= bound:
        gt = collect_table(grid)
        c = gt.column("o_custkey").to_numpy()
        m = gt.column("m").to_numpy()
        key = c * _GROWTH_MK + m
        present = np.sort(key)
        idx = np.searchsorted(present, key - 1)
        prev = (idx < len(present)) & (present[np.clip(
            idx, 0, len(present) - 1)] == key - 1)
        order = np.lexsort((m, c))
        fm_sorted = pd.Series(m[order]).groupby(
            pd.Series(c[order])).transform("min").to_numpy()
        fm = np.empty_like(fm_sorted)
        fm[order] = fm_sorted
        is_new = m == fm
        per_month = pd.DataFrame({
            "m": m,
            "new_c": is_new.astype(np.int64),
            "retained_c": (~is_new & prev).astype(np.int64),
            "resurrected_c": (~is_new & ~prev).astype(np.int64)})
        return _finish(per_month)

    # distributed path: nothing customer-scale touches the driver
    first = final_merge_min(grid, ["o_custkey"], ["m"], np_=np_,
                            bound=bound).map_batches(
        lambda b: b.rename_columns(["o_custkey", "fm"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def with_key(t: pa.Table) -> pa.Table:
        k = pc.add(pc.multiply(t.column("o_custkey"),
                               pa.scalar(_GROWTH_MK)), t.column("m"))
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "m": t.column("m"), "k": k})

    def as_prev(t: pa.Table) -> pa.Table:
        k = pc.add(pc.add(pc.multiply(t.column("o_custkey"),
                                      pa.scalar(_GROWTH_MK)),
                          t.column("m")), pa.scalar(1))
        return pa.table({
            "k": k,
            "prev_flag": pa.array(np.ones(t.num_rows, np.int64))})

    j1 = hash_join(grid.map_batches(with_key, batch_format="pyarrow"),
                   grid.map_batches(as_prev, batch_format="pyarrow"),
                   on="k", how="left", num_partitions=np_ or None)
    j2 = hash_join(j1, first, on="o_custkey",
                   num_partitions=np_ or None)

    def cls_partial(t: pa.Table) -> pa.Table:
        m = t.column("m").to_numpy(zero_copy_only=False)
        fm = t.column("fm").to_numpy(zero_copy_only=False)
        prev = t.column("prev_flag").to_numpy(zero_copy_only=False)
        prev = ~np.isnan(prev.astype(np.float64)) \
            if prev.dtype != np.int64 else prev == 1
        is_new = m == fm
        g = pa.table({
            "m": pa.array(m),
            "new_c": pa.array(is_new.astype(np.int64)),
            "retained_c": pa.array((~is_new & prev).astype(np.int64)),
            "resurrected_c": pa.array(
                (~is_new & ~prev).astype(np.int64))}) \
            .group_by("m").aggregate([("new_c", "sum"),
                                      ("retained_c", "sum"),
                                      ("resurrected_c", "sum")])
        return g.rename_columns(["m", "new_c", "retained_c",
                                 "resurrected_c"])

    agg = collect_table(final_merge_sums(
        j2.map_batches(cls_partial, batch_format="pyarrow"),
        ["m"], ["new_c", "retained_c", "resurrected_c"],
        np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return _empty()
    return _finish(agg.to_pandas())


ORDERS_GROWTH_SQL = """
WITH a AS (
  SELECT DISTINCT o_custkey AS c,
         (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m
  FROM orders
), f AS (SELECT c, min(m) AS fm FROM a GROUP BY c),
cls AS (
  SELECT a.m,
         CASE WHEN a.m = f.fm THEN 0
              WHEN p.c IS NOT NULL THEN 1 ELSE 2 END AS k
  FROM a
  JOIN f ON f.c = a.c
  LEFT JOIN a p ON p.c = a.c AND p.m = a.m - 1
), g AS (
  SELECT m,
         CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS new_c,
         CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS retained_c,
         CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS resurrected_c
  FROM cls GROUP BY m
)
SELECT printf('%04d-%02d', g.m // 12, g.m % 12 + 1) AS month,
       g.new_c, g.retained_c, g.resurrected_c,
       CAST(coalesce(pg.new_c + pg.retained_c + pg.resurrected_c, 0)
            - g.retained_c AS BIGINT) AS churned_c,
       g.new_c + g.retained_c + g.resurrected_c AS active
FROM g LEFT JOIN g pg ON pg.m = g.m - 1
ORDER BY month
"""


def orders_rolling_aov(sf_dir: str, np_: int = 0):
    """Monthly revenue / order count with average-order-value and a
    3-month trailing revenue mean — the rolling-window KPI series over
    an AGGREGATED time grid (``events_user_rolling`` windows per user;
    this windows over the calendar itself).  100-TB shape: per-batch
    (month, n, cents) combiner partials, one months-bounded merge
    (class b), then the window fold runs on the ≤|months| grid — the
    fact stream never sorts.  Exact-int cents end-to-end; both engines
    divide the same int window sums by the same float denominators."""
    from cheque_ocr_project_ray.util import collect_table

    ds = _pq(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.timestamp("us"))
        ym = pc.add(pc.multiply(pc.year(ts), 100), pc.month(ts))
        t = pa.table({"ym": pc.cast(ym, pa.int64()),
                      "n_orders": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "cents": money_units(batch.column("o_totalprice"))})
        g = t.group_by("ym").aggregate([("n_orders", "sum"),
                                        ("cents", "sum")])
        return g.rename_columns(["ym", "n_orders", "cents"])

    agg = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["ym"], ["n_orders", "cents"], np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({"ym": pd.Series([], dtype="int64"),
                             "n_orders": pd.Series([], dtype="int64"),
                             "revenue": pd.Series([], dtype="float64"),
                             "aov": pd.Series([], dtype="float64"),
                             "roll3_revenue": pd.Series([],
                                                        dtype="float64")})
    df = agg.to_pandas().sort_values("ym").reset_index(drop=True)
    cents = df["cents"].to_numpy(np.int64)
    n = df["n_orders"].to_numpy(np.int64)
    cum = np.concatenate([[0], np.cumsum(cents)])
    idx = np.arange(len(cents))
    lo = np.maximum(idx - 2, 0)
    cw = cum[idx + 1] - cum[lo]            # trailing ≤3-row window sum
    mw = idx - lo + 1
    return pd.DataFrame({
        "ym": df["ym"].astype(np.int64),
        "n_orders": n,
        "revenue": round_half_up(cents / 100.0, 2),
        "aov": round_half_up(cents / (100.0 * n), 4),
        "roll3_revenue": round_half_up(cw / (100.0 * mw), 4)})


ORDERS_ROLLING_AOV_SQL = """
WITH m AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS cents
  FROM orders GROUP BY ym),
w AS (
  SELECT ym, n_orders, cents,
         sum(cents) OVER (ORDER BY ym
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS cw,
         count(*) OVER (ORDER BY ym
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS mw
  FROM m)
SELECT ym, n_orders,
       round(cents / 100.0, 2) AS revenue,
       round(cents / (100.0 * n_orders), 4) AS aov,
       round(cw / (100.0 * mw), 4) AS roll3_revenue
FROM w ORDER BY ym
"""


def _empty_interarrival() -> pd.DataFrame:
    return pd.DataFrame({
        "week_bucket": pd.Series([], dtype="int64"),
        "n_gaps": pd.Series([], dtype="int64"),
        "sum_gap_days": pd.Series([], dtype="int64"),
        "avg_gap_days": pd.Series([], dtype="float64")})


@_hash_shuffled
def orders_interarrival(sf_dir: str, np_: int = 0,
                        bound: int = 2_000_000):
    """Customer repeat-purchase cadence: gaps in days between
    consecutive DISTINCT order dates per customer, rolled into a
    weekly-bucket histogram with exact gap-day sums — the
    inter-arrival profile behind reorder forecasting and churn-window
    tuning (the per-user twin is ``events_lag_delta``; this is the
    per-customer ORDER-grain version with a bounded grid output).

    100-TB shape: the orders fact stream never shuffles — per-batch
    distinct (custkey, epoch-day) partials reduce through the
    bounded-adaptive merge to the activity grid.  Under ``bound`` the
    gaps fold in one driver lexsort+diff pass; past it the grid sorts
    ONCE distributedly on (custkey, day) and every block diffs
    vectorized with a last-row neighbor carry (the
    ``_session_delta_ds`` scanline shape — n_blocks 2-tuples through
    the driver, never a row), per-block week-bucket partials reducing
    through the weeks-bounded merge (class a+b).  All-int histogram
    columns; the mean derives from the exact ints on both engines.
    """
    import ray.data as _rd
    from cheque_ocr_project_ray.util import collect_table

    ds = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(batch.column("o_orderdate"),
                             pa.timestamp("us")), pa.int64())
        day = pc.divide(us, pa.scalar(_DAY_US, pa.int64()))
        t = pa.table({"c": batch.column("o_custkey"), "d": day,
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by(["c", "d"]).aggregate([("n", "sum")]) \
            .rename_columns(["c", "d", "n"])

    grid = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c", "d"], ["n"], np_=np_, bound=bound) \
        .select_columns(["c", "d"]).materialize()

    def _finish(bt: pd.DataFrame) -> pd.DataFrame:
        bt = bt.sort_values("week_bucket").reset_index(drop=True)
        return pd.DataFrame({
            "week_bucket": bt["week_bucket"].astype("int64"),
            "n_gaps": bt["n_gaps"].astype("int64"),
            "sum_gap_days": bt["sum_gap_days"].astype("int64"),
            "avg_gap_days": round_half_up(
                bt["sum_gap_days"].to_numpy(np.float64)
                / bt["n_gaps"].to_numpy(np.float64), 4)})

    if grid.count() <= bound:
        gt = collect_table(grid)
        if gt is None:
            return _empty_interarrival()
        c = gt.column("c").to_numpy()
        d = gt.column("d").to_numpy()
        order = np.lexsort((d, c))
        cs, dv = c[order], d[order]
        same = cs[1:] == cs[:-1]
        gaps = (dv[1:] - dv[:-1])[same]
        if len(gaps) == 0:
            return _empty_interarrival()
        bt = pd.DataFrame({"week_bucket": gaps // 7, "gap": gaps}) \
            .groupby("week_bucket", as_index=False) \
            .agg(n_gaps=("gap", "size"), sum_gap_days=("gap", "sum"))
        return _finish(bt)

    # distributed path: one sort, per-block diff with neighbor carry
    refs = grid.sort(["c", "d"]).materialize().to_arrow_refs()

    @ray.remote
    def block_last(tb: pa.Table):
        if tb.num_columns == 0 or tb.num_rows == 0:
            return None
        return (tb.column("c")[-1].as_py(), tb.column("d")[-1].as_py())

    lasts = ray.get([block_last.remote(r) for r in refs])
    live = [i for i, e in enumerate(lasts) if e is not None]
    prev_of = {b: lasts[a] for a, b in zip(live, live[1:])}

    @ray.remote
    def block_gaps(tb: pa.Table, prev) -> pa.Table:
        c = tb.column("c").to_numpy(zero_copy_only=False)
        d = tb.column("d").to_numpy(zero_copy_only=False)
        pc_ = np.concatenate(([prev[0] if prev else -1], c[:-1]))
        pd_ = np.concatenate(([prev[1] if prev else 0], d[:-1]))
        same = c == pc_
        gaps = (d - pd_)[same]
        df = pd.DataFrame({"week_bucket": gaps // 7, "gap": gaps}) \
            .groupby("week_bucket", as_index=False) \
            .agg(n_gaps=("gap", "size"), sum_gap_days=("gap", "sum"))
        return pa.table({
            "week_bucket": pa.array(df["week_bucket"].to_numpy(),
                                    pa.int64()),
            "n_gaps": pa.array(df["n_gaps"].to_numpy(), pa.int64()),
            "sum_gap_days": pa.array(df["sum_gap_days"].to_numpy(),
                                     pa.int64())})

    part_refs = [block_gaps.remote(refs[i], prev_of.get(i))
                 for i in live]
    if not part_refs:
        return _empty_interarrival()
    merged = collect_table(final_merge_sums(
        _rd.from_arrow_refs(part_refs), ["week_bucket"],
        ["n_gaps", "sum_gap_days"], np_=np_, bound=bound)
        .materialize())
    if merged is None or merged.num_rows == 0:
        return _empty_interarrival()
    return _finish(merged.to_pandas())


def _empty_deciles() -> pd.DataFrame:
    return pd.DataFrame({
        "decile": pd.Series([], dtype="int64"),
        "n_customers": pd.Series([], dtype="int64"),
        "min_bal": pd.Series([], dtype="float64"),
        "max_bal": pd.Series([], dtype="float64"),
        "revenue": pd.Series([], dtype="float64"),
        "n_orders": pd.Series([], dtype="int64")})


@_hash_shuffled
def customer_balance_deciles(sf_dir: str, np_: int = 0,
                             bound: int = 2_000_000):
    """Customer-equity decile table: customers ranked by account
    balance (ties broken by custkey, so the cut is deterministic on
    both engines), split into ten equal-population bands with
    ``decile = ((rank−1)·10) // n`` — the same integer formula in the
    SQL twin, NOT ``ntile`` (whose tie placement is engine-defined) —
    then each band's population, balance range, and exact-cents order
    revenue.  The who-funds-the-business curve that pairs with
    ``orders_pareto``'s concentration cut.

    100-TB shape: global rank needs ONE distributed sort of the
    customer dimension; under ``bound`` the rank+join folds on the
    driver, past it the ``orders_pareto`` two-phase scan assigns
    per-block deciles from exclusive row offsets (n_blocks ints on
    the driver), per-customer revenue reduces through the
    bounded-adaptive merge, a custkey-keyed LEFT hash join attaches
    it, and only the 10×n_blocks partial grid reaches the driver
    (class a+b).  Balances and revenue travel as exact integer cents."""
    import ray.data as _rd
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import collect_table

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cust_partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("c_custkey"),
            "bal_cents": money_units(batch.column("c_acctbal"))})

    def rev_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_custkey": batch.column("o_custkey"),
            "cents": money_units(batch.column("o_totalprice")),
            "n_orders": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by("o_custkey").aggregate(
            [("cents", "sum"), ("n_orders", "sum")]) \
            .rename_columns(["o_custkey", "cents", "n_orders"])

    cents_ds = cust.map_batches(cust_partial,
                                batch_format="pyarrow").materialize()
    rev_ds = final_merge_sums(
        orders.map_batches(rev_partial, batch_format="pyarrow"),
        ["o_custkey"], ["cents", "n_orders"], np_=np_,
        bound=bound).materialize()

    def _finish(grid: pd.DataFrame) -> pd.DataFrame:
        g = grid.groupby("decile", as_index=False).agg(
            n_customers=("n_customers", "sum"),
            min_c=("min_c", "min"), max_c=("max_c", "max"),
            cents=("cents", "sum"), n_orders=("n_orders", "sum")) \
            .sort_values("decile").reset_index(drop=True)
        return pd.DataFrame({
            "decile": g["decile"].astype("int64"),
            "n_customers": g["n_customers"].astype("int64"),
            "min_bal": g["min_c"].to_numpy(np.int64) / 100.0,
            "max_bal": g["max_c"].to_numpy(np.int64) / 100.0,
            "revenue": g["cents"].to_numpy(np.int64) / 100.0,
            "n_orders": g["n_orders"].astype("int64")})

    n_cust = cents_ds.count()
    if n_cust == 0:
        return _empty_deciles()
    if n_cust <= bound:
        ct = collect_table(cents_ds)
        rt = collect_table(rev_ds)
        ck = ct.column("o_custkey").to_numpy(zero_copy_only=False)
        cb = ct.column("bal_cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, cb))
        ck, cb = ck[order], cb[order]
        dec = (np.arange(n_cust, dtype=np.int64) * 10) // n_cust
        df = pd.DataFrame({"o_custkey": ck, "decile": dec,
                           "min_c": cb, "max_c": cb})
        if rt is not None and rt.num_rows:
            rdf = rt.to_pandas()
            df = df.merge(rdf, on="o_custkey", how="left")
            df["cents"] = df["cents"].fillna(0).astype(np.int64)
            df["n_orders"] = df["n_orders"].fillna(0).astype(np.int64)
        else:
            df["cents"] = np.int64(0)
            df["n_orders"] = np.int64(0)
        df["n_customers"] = np.int64(1)
        return _finish(df)

    # distributed: one sort, per-block decile from exclusive offsets
    refs = cents_ds.sort(["bal_cents", "o_custkey"]) \
        .materialize().to_arrow_refs()
    rows, row_off, _, _ = block_prefix_offsets(refs)

    @ray.remote
    def block_deciles(t: pa.Table, off: int, n: int) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "decile": pa.array([], pa.int64()),
                             "bal_cents": pa.array([], pa.int64())})
        dec = ((off + np.arange(t.num_rows, dtype=np.int64)) * 10) // n
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "decile": pa.array(dec, pa.int64()),
                         "bal_cents": t.column("bal_cents")})

    dec_ds = _rd.from_arrow_refs(
        [block_deciles.remote(r, int(o), int(n_cust))
         for r, o in zip(refs, row_off)])
    joined = hash_join(dec_ds, rev_ds, on="o_custkey", how="left",
                       num_partitions=np_ or None)

    def grid_partial(t: pa.Table) -> pa.Table:
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        nord = t.column("n_orders").to_numpy(zero_copy_only=False)
        cents = np.nan_to_num(cents.astype(np.float64)).astype(np.int64)
        nord = np.nan_to_num(nord.astype(np.float64)).astype(np.int64)
        g = pa.table({
            "decile": t.column("decile"),
            "n_customers": pa.array(np.ones(t.num_rows, np.int64)),
            "min_c": t.column("bal_cents"),
            "max_c": t.column("bal_cents"),
            "cents": pa.array(cents, pa.int64()),
            "n_orders": pa.array(nord, pa.int64())}) \
            .group_by("decile").aggregate(
                [("n_customers", "sum"), ("min_c", "min"),
                 ("max_c", "max"), ("cents", "sum"),
                 ("n_orders", "sum")])
        return g.rename_columns(["decile", "n_customers", "min_c",
                                 "max_c", "cents", "n_orders"])

    grid = collect_table(
        joined.map_batches(grid_partial, batch_format="pyarrow")
        .materialize())
    if grid is None or grid.num_rows == 0:
        return _empty_deciles()
    return _finish(grid.to_pandas())


CUSTOMER_BALANCE_DECILES_SQL = """
WITH r AS (
  SELECT c_custkey, c_acctbal,
         row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn,
         count(*) OVER () AS n
  FROM customer
), d AS (
  SELECT c_custkey, c_acctbal,
         CAST(((rn - 1) * 10) // n AS BIGINT) AS decile
  FROM r
), o AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS BIGINT) AS cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT decile,
       count(*) AS n_customers,
       CAST(min(CAST(d.c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
           / 100.0 AS min_bal,
       CAST(max(CAST(d.c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT)
           / 100.0 AS max_bal,
       coalesce(sum(o.cents), 0) / 100.0 AS revenue,
       CAST(coalesce(sum(o.n_orders), 0) AS BIGINT) AS n_orders
FROM d LEFT JOIN o ON o.o_custkey = d.c_custkey
GROUP BY decile ORDER BY decile
"""


ORDERS_INTERARRIVAL_SQL = """
WITH d AS (
  SELECT DISTINCT o_custkey AS c,
         date_diff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) AS dt
  FROM orders
), g AS (
  SELECT dt - lag(dt) OVER (PARTITION BY c ORDER BY dt) AS gap
  FROM d
)
SELECT CAST(gap // 7 AS BIGINT) AS week_bucket,
       count(*) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap_days,
       round(sum(gap) / (1.0 * count(*)), 4) AS avg_gap_days
FROM g WHERE gap IS NOT NULL
GROUP BY week_bucket ORDER BY week_bucket
"""


def _empty_span_hist() -> pd.DataFrame:
    return pd.DataFrame({
        "span_days": pd.Series([], dtype="int64"),
        "n_orders": pd.Series([], dtype="int64")})


@_hash_shuffled
def order_fulfillment_span(sf_dir: str, np_: int = 0,
                           bound: int = 2_000_000):
    """Per-order fulfilment-span histogram: days between the FIRST and
    LAST lineitem ship date of each order — the multi-shipment spread
    profile behind split-shipment cost and promise-date tuning (span 0
    = everything shipped the same day).

    100-TB shape: lineitem arrives clustered by orderkey, so the
    per-batch per-order (min-day, neg-max-day) combiner is near-total
    and the orderkey-keyed reduce runs through the bounded-adaptive
    min-merge (max carried as min of the NEGATED day so one reduce
    kind serves both ends; distributed groupby past ``bound``).  The
    span histogram partials are then computed distributedly over the
    merged per-order stream and only the span-bounded grid (≤ the
    corpus date range in days) reaches the driver (class a+b).
    All-int output, bit-deterministic.
    """
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min,
                                             final_merge_sums)

    ds = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(_ts_col_us(batch.column("l_shipdate")),
                        pa.scalar(_DAY_US, pa.int64()))
        t = pa.table({"k": batch.column("l_orderkey"),
                      "dmin": day, "negmax": pc.negate_checked(day)})
        return t.group_by("k").aggregate(
            [("dmin", "min"), ("negmax", "min")]) \
            .rename_columns(["k", "dmin", "negmax"])

    per_order = final_merge_min(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k"], ["dmin", "negmax"], np_=np_, bound=bound)

    def span_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "dmin" not in batch.column_names:
            return pa.table({"span_days": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        span = pc.subtract(pc.negate_checked(batch.column("negmax")),
                           batch.column("dmin"))
        t = pa.table({"span_days": span,
                      "n_orders": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by("span_days").aggregate(
            [("n_orders", "sum")]) \
            .rename_columns(["span_days", "n_orders"])

    agg = collect_table(final_merge_sums(
        per_order.map_batches(span_partial, batch_format="pyarrow"),
        ["span_days"], ["n_orders"], np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return _empty_span_hist()
    df = agg.to_pandas().sort_values("span_days").reset_index(drop=True)
    return pd.DataFrame({
        "span_days": df["span_days"].astype("int64"),
        "n_orders": df["n_orders"].astype("int64")})


ORDER_FULFILLMENT_SPAN_SQL = """
WITH s AS (
  SELECT date_diff('day', min(CAST(l_shipdate AS DATE)),
                   max(CAST(l_shipdate AS DATE))) AS span
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(span AS BIGINT) AS span_days, count(*) AS n_orders
FROM s GROUP BY span_days ORDER BY span_days
"""


def _empty_ship_latency() -> pd.DataFrame:
    return pd.DataFrame({
        "o_orderpriority": pd.Series([], dtype="object"),
        "n_lines": pd.Series([], dtype="int64"),
        "sum_days": pd.Series([], dtype="int64"),
        "sumsq_days": pd.Series([], dtype="int64"),
        "avg_days": pd.Series([], dtype="float64"),
        "std_days": pd.Series([], dtype="float64")})


@_hash_shuffled
def shipping_latency_by_priority(sf_dir: str, np_: int = 0,
                                 bound: int = 2_000_000):
    """Order-to-ship latency profile per order priority: for every
    lineitem the days from its order's placement to its ship date,
    rolled up per priority class as count, exact integer day sums and
    sum-of-squares, mean, and population std — the does-URGENT-
    actually-ship-faster SLA audit.

    100-TB shape: the latency needs o_orderdate per lineitem — an
    irreducible fact-fact equi-join (q7 shape) — but lineitem first
    pre-aggregates INSIDE each batch to three ints per order
    (n, Σship-day, Σship-day²), so the orderkey-keyed partitioned
    ``hash_join`` shuffles one row per ORDER, not one per lineitem
    (~4× smaller), and the per-order moments shift to
    order-date-relative days row-locally after the join
    (Σ(d−o) = Σd − n·o; Σ(d−o)² = Σd² − 2oΣd + n·o²).  The priority
    rollup is a 5-row bounded grid; mean/std derive from the same
    exact integer moments on both engines, so 4dp rounding carries no
    float-order noise at all (class a+b)."""
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def li_partial(batch: pa.Table) -> pa.Table:
        day = pc.divide(_ts_col_us(batch.column("l_shipdate")),
                        pa.scalar(_DAY_US, pa.int64()))
        t = pa.table({"k": batch.column("l_orderkey"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64)),
                      "s": day, "s2": pc.multiply(day, day)})
        return t.group_by("k").aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum")]) \
            .rename_columns(["k", "n", "s", "s2"])

    per_order = final_merge_sums(
        li.map_batches(li_partial, batch_format="pyarrow"),
        ["k"], ["n", "s", "s2"], np_=np_, bound=bound)

    def o_map(batch: pa.Table) -> pa.Table:
        oday = pc.divide(_ts_col_us(batch.column("o_orderdate")),
                         pa.scalar(_DAY_US, pa.int64()))
        return pa.table({"k": batch.column("o_orderkey"), "oday": oday,
                         "o_orderpriority":
                             batch.column("o_orderpriority")})

    joined = hash_join(
        per_order, orders.map_batches(o_map, batch_format="pyarrow"),
        on="k")

    def prio_partial(batch: pa.Table) -> pa.Table:
        n = batch.column("n")
        s = batch.column("s")
        s2 = batch.column("s2")
        o = batch.column("oday")
        sum_days = pc.subtract(s, pc.multiply(n, o))
        sumsq = pc.add(pc.subtract(
            s2, pc.multiply(pa.scalar(2, pa.int64()),
                            pc.multiply(o, s))),
            pc.multiply(n, pc.multiply(o, o)))
        t = pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                      "n_lines": n, "sum_days": sum_days,
                      "sumsq_days": sumsq})
        return t.group_by("o_orderpriority").aggregate(
            [("n_lines", "sum"), ("sum_days", "sum"),
             ("sumsq_days", "sum")]) \
            .rename_columns(["o_orderpriority", "n_lines", "sum_days",
                             "sumsq_days"])

    agg = collect_table(final_merge_sums(
        joined.map_batches(prio_partial, batch_format="pyarrow"),
        ["o_orderpriority"], ["n_lines", "sum_days", "sumsq_days"],
        np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return _empty_ship_latency()
    df = agg.to_pandas().sort_values("o_orderpriority") \
        .reset_index(drop=True)
    n = df["n_lines"].to_numpy(np.float64)
    s = df["sum_days"].to_numpy(np.float64)
    s2 = df["sumsq_days"].to_numpy(np.float64)
    mean = s / n
    var = np.maximum(s2 / n - mean * mean, 0.0)
    return pd.DataFrame({
        "o_orderpriority": df["o_orderpriority"],
        "n_lines": df["n_lines"].astype("int64"),
        "sum_days": df["sum_days"].astype("int64"),
        "sumsq_days": df["sumsq_days"].astype("int64"),
        "avg_days": round_half_up(mean, 4),
        "std_days": round_half_up(np.sqrt(var), 4)})


SHIPPING_LATENCY_SQL = """
WITH d AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(sum(days) AS BIGINT) AS sum_days,
       CAST(sum(days * days) AS BIGINT) AS sumsq_days,
       round(sum(days) / (1.0 * count(*)), 4) AS avg_days,
       round(sqrt(greatest(sum(days * days) / (1.0 * count(*))
             - (sum(days) / (1.0 * count(*)))
             * (sum(days) / (1.0 * count(*))), 0)), 4) AS std_days
FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@_hash_shuffled
def lineitem_returns_by_month(sf_dir: str, np_: int = 0):
    """Return-rate drift per ship month: line count, returned-line
    count (``l_returnflag = 'R'``), exact-cents returned extended
    price, and the returned share — the supplier/process-regression
    monitor that pairs with ``orders_priority_mix_shift``.

    100-TB shape: pure one-pass combiner — per-batch (month, counts,
    cents) partials through the bounded-adaptive merge; only the
    months-bounded grid reaches the driver (class a).  The rate
    derives from the two exact ints on both engines."""
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    ds = _pq(sf_dir, "lineitem",
             ["l_shipdate", "l_returnflag", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").cast(pa.timestamp("us"))
        ym = pc.add(pc.multiply(pc.year(ts), 100), pc.month(ts))
        ret = pc.cast(pc.equal(batch.column("l_returnflag"), "R"),
                      pa.int64())
        cents = money_units(batch.column("l_extendedprice"))
        t = pa.table({"ym": pc.cast(ym, pa.int64()),
                      "n_lines": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "n_returned": ret,
                      "ret_cents": pc.multiply(cents, ret)})
        return t.group_by("ym").aggregate(
            [("n_lines", "sum"), ("n_returned", "sum"),
             ("ret_cents", "sum")]) \
            .rename_columns(["ym", "n_lines", "n_returned",
                             "ret_cents"])

    agg = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["ym"], ["n_lines", "n_returned", "ret_cents"],
        np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({
            "ym": pd.Series([], dtype="int64"),
            "n_lines": pd.Series([], dtype="int64"),
            "n_returned": pd.Series([], dtype="int64"),
            "returned_value": pd.Series([], dtype="float64"),
            "return_rate": pd.Series([], dtype="float64")})
    df = agg.to_pandas().sort_values("ym").reset_index(drop=True)
    return pd.DataFrame({
        "ym": df["ym"].astype("int64"),
        "n_lines": df["n_lines"].astype("int64"),
        "n_returned": df["n_returned"].astype("int64"),
        "returned_value": df["ret_cents"].to_numpy(np.int64) / 100.0,
        "return_rate": round_half_up(
            df["n_returned"].to_numpy(np.float64)
            / df["n_lines"].to_numpy(np.float64), 6)})


LINEITEM_RETURNS_SQL = """
SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_returned,
       CAST(sum(CASE WHEN l_returnflag = 'R'
                THEN CAST(l_extendedprice AS DECIMAL(18,2))
                ELSE 0 END) AS DOUBLE) AS returned_value,
       round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             / (1.0 * count(*)), 6) AS return_rate
FROM lineitem GROUP BY ym ORDER BY ym
"""


@_hash_shuffled
def events_activity_histogram(sf_dir: str, np_: int = 0,
                              bound: int = 2_000_000):
    """User-activity count-of-counts: how many users emitted exactly
    N events — the engagement-distribution shape (power-law tail vs
    uniform bots) that sizes per-user state for every user-keyed
    stage downstream.

    100-TB shape: per-batch (user, n) combiner partials reduce
    through the bounded-adaptive merge (distributed groupby past
    ``bound``); the count-of-counts second phase then runs
    DISTRIBUTEDLY over the merged per-user stream and only the
    activity-level grid (distinct per-user totals — ≤ max events per
    user, a domain, not a user count) reaches the driver (class a+b).
    All-int output, bit-deterministic."""
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    ds = _pq(sf_dir, "events", ["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        return t.group_by("user_id").aggregate([("n", "sum")]) \
            .rename_columns(["user_id", "n"])

    per_user = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], ["n"], np_=np_, bound=bound)

    def coc_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return pa.table({"n_events": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        t = pa.table({"n_events": batch.column("n"),
                      "n_users": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by("n_events").aggregate([("n_users", "sum")]) \
            .rename_columns(["n_events", "n_users"])

    agg = collect_table(final_merge_sums(
        per_user.map_batches(coc_partial, batch_format="pyarrow"),
        ["n_events"], ["n_users"], np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({"n_events": pd.Series([], dtype="int64"),
                             "n_users": pd.Series([], dtype="int64")})
    df = agg.to_pandas().sort_values("n_events").reset_index(drop=True)
    return pd.DataFrame({"n_events": df["n_events"].astype("int64"),
                         "n_users": df["n_users"].astype("int64")})


EVENTS_ACTIVITY_HISTOGRAM_SQL = """
WITH c AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
)
SELECT CAST(n AS BIGINT) AS n_events, count(*) AS n_users
FROM c GROUP BY n ORDER BY n_events
"""


@_hash_shuffled
def nation_trade_balance(sf_dir: str, np_: int = 0,
                         bound: int = 2_000_000):
    """Per-nation trade balance: order revenue bought by the nation's
    customers vs lineitem revenue sold by its suppliers, and the
    net balance — the import/export skew view that q5/q7 slice by
    pair but never net out.  Every nation appears (zero-filled).

    100-TB shape: both fact streams collapse to per-key exact-int
    partials inside each batch (orders → per-custkey cents, lineitem
    → per-suppkey deci-units) and reduce through the bounded-adaptive
    merge (distributed groupby past ``bound``); each side then
    attaches its nationkey via a key-partitioned ``hash_join``
    against the matching dimension stream — never a driver-side
    key-set broadcast — and re-reduces per nation.  Only the two
    nations-bounded grids reach the driver (class a+b).  Revenue
    floats are single divisions of exact int sums, so both engines
    see the identical nearest-double."""
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def buy_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": batch.column("o_custkey"),
                      "buy_cents": money_units(
                          batch.column("o_totalprice"))})
        return t.group_by("c_custkey").aggregate(
            [("buy_cents", "sum")]) \
            .rename_columns(["c_custkey", "buy_cents"])

    per_cust = final_merge_sums(
        orders.map_batches(buy_partial, batch_format="pyarrow"),
        ["c_custkey"], ["buy_cents"], np_=np_, bound=bound)
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    buy_joined = hash_join(per_cust, cust, on="c_custkey",
                           num_partitions=np_ or None)

    def buy_nation(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c_nationkey" not in batch.column_names:
            return pa.table({"nk": pa.array([], pa.int64()),
                             "buy_cents": pa.array([], pa.int64())})
        t = pa.table({"nk": batch.column("c_nationkey").cast(pa.int64()),
                      "buy_cents": batch.column("buy_cents")})
        return t.group_by("nk").aggregate([("buy_cents", "sum")]) \
            .rename_columns(["nk", "buy_cents"])

    buy_grid = collect_table(final_merge_sums(
        buy_joined.map_batches(buy_nation, batch_format="pyarrow"),
        ["nk"], ["buy_cents"], np_=np_).materialize())

    lineitem = _pq(sf_dir, "lineitem",
                   ["l_suppkey", "l_extendedprice", "l_discount"])

    def sell_partial(batch: pa.Table) -> pa.Table:
        cents = money_units(batch.column("l_extendedprice"))
        du = pc.multiply(cents, pc.subtract(
            pa.scalar(100, pa.int64()),
            money_units(batch.column("l_discount"))))
        t = pa.table({"s_suppkey": batch.column("l_suppkey"),
                      "sell_du": du})
        return t.group_by("s_suppkey").aggregate([("sell_du", "sum")]) \
            .rename_columns(["s_suppkey", "sell_du"])

    per_supp = final_merge_sums(
        lineitem.map_batches(sell_partial, batch_format="pyarrow"),
        ["s_suppkey"], ["sell_du"], np_=np_, bound=bound)
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    sell_joined = hash_join(per_supp, supp, on="s_suppkey",
                            num_partitions=np_ or None)

    def sell_nation(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "s_nationkey" not in batch.column_names:
            return pa.table({"nk": pa.array([], pa.int64()),
                             "sell_du": pa.array([], pa.int64())})
        t = pa.table({"nk": batch.column("s_nationkey").cast(pa.int64()),
                      "sell_du": batch.column("sell_du")})
        return t.group_by("nk").aggregate([("sell_du", "sum")]) \
            .rename_columns(["nk", "sell_du"])

    sell_grid = collect_table(final_merge_sums(
        sell_joined.map_batches(sell_nation, batch_format="pyarrow"),
        ["nk"], ["sell_du"], np_=np_).materialize())

    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .materialize()
    nt = collect_table(nation)
    base = nt.to_pandas() if nt is not None else pd.DataFrame(
        {"n_nationkey": pd.Series([], dtype="int64"),
         "n_name": pd.Series([], dtype="object")})
    base["nk"] = base["n_nationkey"].astype("int64")
    buy_df = (buy_grid.to_pandas() if buy_grid is not None
              else pd.DataFrame({"nk": pd.Series([], dtype="int64"),
                                 "buy_cents": pd.Series([],
                                                        dtype="int64")}))
    sell_df = (sell_grid.to_pandas() if sell_grid is not None
               else pd.DataFrame({"nk": pd.Series([], dtype="int64"),
                                  "sell_du": pd.Series([],
                                                       dtype="int64")}))
    df = base.merge(buy_df, on="nk", how="left") \
        .merge(sell_df, on="nk", how="left")
    buy = df["buy_cents"].fillna(0).to_numpy(np.int64)
    sell = df["sell_du"].fillna(0).to_numpy(np.int64)
    out = pd.DataFrame({
        "n_name": df["n_name"],
        "buy_revenue": buy / 100.0,
        "sell_revenue": sell / 10000.0,
        "balance": (sell - 100 * buy) / 10000.0})
    return out.sort_values("n_name").reset_index(drop=True)


NATION_TRADE_BALANCE_SQL = """
WITH buy AS (
  SELECT c_nationkey AS nk,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS b
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY 1
), sell AS (
  SELECT s_nationkey AS nk,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS s
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY 1
)
SELECT n_name,
       CAST(coalesce(buy.b, 0) AS DOUBLE)  AS buy_revenue,
       CAST(coalesce(sell.s, 0) AS DOUBLE) AS sell_revenue,
       CAST(coalesce(sell.s, 0) - coalesce(buy.b, 0) AS DOUBLE)
           AS balance
FROM nation
LEFT JOIN buy  ON buy.nk = n_nationkey
LEFT JOIN sell ON sell.nk = n_nationkey
ORDER BY n_name
"""


@_hash_shuffled
def customer_segment_profile(sf_dir: str, np_: int = 0,
                             bound: int = 2_000_000):
    """Per-market-segment customer health: population, account-balance
    profile (exact-cents mean, raw min/max) and order activity
    (count + exact-cents revenue) — the segment-level twin of
    ``revenue_by_nation`` that q3 slices but never profiles.

    100-TB shape: the customer dim folds per batch to per-segment
    (n, Σcents, min, max) partials — the driver sees only the
    segments × n_blocks grid (class b).  The orders fact collapses to
    per-custkey exact-int partials through the bounded-adaptive merge
    (distributed groupby past ``bound``), attaches its segment via a
    custkey-partitioned ``hash_join`` against the customer stream and
    re-reduces per segment (class a+b).  Customers without orders
    still count (the activity side folds in with zero-fill)."""
    from cheque_ocr_project_ray.relational.joins import hash_join
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_mktsegment", "c_acctbal"])

    def cust_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"segment": batch.column("c_mktsegment"),
                      "n_customers": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "bal_cents": money_units(
                          batch.column("c_acctbal")),
                      "min_bal": batch.column("c_acctbal"),
                      "max_bal": batch.column("c_acctbal")})
        return t.group_by("segment").aggregate(
            [("n_customers", "sum"), ("bal_cents", "sum"),
             ("min_bal", "min"), ("max_bal", "max")]) \
            .rename_columns(["segment", "n_customers", "bal_cents",
                             "min_bal", "max_bal"])

    cgrid = collect_table(
        cust.map_batches(cust_partial, batch_format="pyarrow")
        .materialize())

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def ord_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_custkey": batch.column("o_custkey"),
                      "n_orders": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "rev_cents": money_units(
                          batch.column("o_totalprice"))})
        return t.group_by("c_custkey").aggregate(
            [("n_orders", "sum"), ("rev_cents", "sum")]) \
            .rename_columns(["c_custkey", "n_orders", "rev_cents"])

    per_cust = final_merge_sums(
        orders.map_batches(ord_partial, batch_format="pyarrow"),
        ["c_custkey"], ["n_orders", "rev_cents"], np_=np_, bound=bound)
    joined = hash_join(per_cust,
                       _pq(sf_dir, "customer",
                           ["c_custkey", "c_mktsegment"]),
                       on="c_custkey", num_partitions=np_ or None)

    def seg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or \
                "c_mktsegment" not in batch.column_names:
            return pa.table({"segment": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64()),
                             "rev_cents": pa.array([], pa.int64())})
        t = pa.table({"segment": batch.column("c_mktsegment"),
                      "n_orders": batch.column("n_orders"),
                      "rev_cents": batch.column("rev_cents")})
        return t.group_by("segment").aggregate(
            [("n_orders", "sum"), ("rev_cents", "sum")]) \
            .rename_columns(["segment", "n_orders", "rev_cents"])

    ogrid = collect_table(final_merge_sums(
        joined.map_batches(seg_partial, batch_format="pyarrow"),
        ["segment"], ["n_orders", "rev_cents"], np_=np_).materialize())

    if cgrid is None or cgrid.num_rows == 0:
        return pd.DataFrame({
            "segment": pd.Series([], dtype="object"),
            "n_customers": pd.Series([], dtype="int64"),
            "avg_balance": pd.Series([], dtype="float64"),
            "min_balance": pd.Series([], dtype="float64"),
            "max_balance": pd.Series([], dtype="float64"),
            "n_orders": pd.Series([], dtype="int64"),
            "revenue": pd.Series([], dtype="float64")})
    cdf = cgrid.to_pandas().groupby("segment", as_index=False).agg(
        n_customers=("n_customers", "sum"),
        bal_cents=("bal_cents", "sum"),
        min_bal=("min_bal", "min"), max_bal=("max_bal", "max"))
    odf = (ogrid.to_pandas() if ogrid is not None
           else pd.DataFrame({"segment": pd.Series([], dtype="object"),
                              "n_orders": pd.Series([], dtype="int64"),
                              "rev_cents": pd.Series([],
                                                     dtype="int64")}))
    df = cdf.merge(odf, on="segment", how="left")
    n = df["n_customers"].to_numpy(np.int64)
    return pd.DataFrame({
        "segment": df["segment"],
        "n_customers": df["n_customers"].astype("int64"),
        "avg_balance": round_half_up(
            df["bal_cents"].to_numpy(np.int64) / (100.0 * n), 4),
        "min_balance": df["min_bal"].astype("float64"),
        "max_balance": df["max_bal"].astype("float64"),
        "n_orders": df["n_orders"].fillna(0).astype("int64"),
        "revenue": df["rev_cents"].fillna(0).to_numpy(np.int64)
            / 100.0}).sort_values("segment").reset_index(drop=True)


CUSTOMER_SEGMENT_PROFILE_SQL = """
WITH o AS (
  SELECT o_custkey AS k, count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY 1
)
SELECT c_mktsegment AS segment,
       count(*) AS n_customers,
       round(sum(CAST(round(c_acctbal * 100) AS BIGINT))
             / (100.0 * count(*)), 4) AS avg_balance,
       min(c_acctbal) AS min_balance,
       max(c_acctbal) AS max_balance,
       CAST(sum(coalesce(o.n, 0)) AS BIGINT) AS n_orders,
       CAST(sum(coalesce(o.r, 0)) AS DOUBLE) AS revenue
FROM customer LEFT JOIN o ON o.k = c_custkey
GROUP BY 1 ORDER BY 1
"""


def lineitem_discount_quantity_grid(sf_dir: str, np_: int = 0):
    """Discount-vs-quantity pricing grid: for each integer order
    quantity, the line count, mean discount and mean extended price —
    the volume-pricing-curve check behind q17/q19's quantity
    predicates (is bulk actually cheaper per unit?).

    100-TB shape: pure one-pass combiner — per-batch (qty, n,
    Σdiscount-units, Σprice-cents) exact-int partials through the
    bounded-adaptive merge; only the quantity grid (≤ the quantity
    domain, TPC-H: 1..50) reaches the driver (class b).  Means are
    single divisions of exact ints, identical on both engines."""
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    ds = _pq(sf_dir, "lineitem",
             ["l_quantity", "l_discount", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "qty": pc.cast(pc.round(batch.column("l_quantity")),
                           pa.int64()),
            "n_lines": pa.array(np.ones(batch.num_rows, np.int64)),
            "disc_units": money_units(batch.column("l_discount")),
            "price_cents": money_units(
                batch.column("l_extendedprice"))})
        return t.group_by("qty").aggregate(
            [("n_lines", "sum"), ("disc_units", "sum"),
             ("price_cents", "sum")]) \
            .rename_columns(["qty", "n_lines", "disc_units",
                             "price_cents"])

    agg = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["qty"], ["n_lines", "disc_units", "price_cents"],
        np_=np_).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({
            "qty": pd.Series([], dtype="int64"),
            "n_lines": pd.Series([], dtype="int64"),
            "avg_discount": pd.Series([], dtype="float64"),
            "avg_price": pd.Series([], dtype="float64")})
    df = agg.to_pandas().sort_values("qty").reset_index(drop=True)
    n = df["n_lines"].to_numpy(np.int64)
    return pd.DataFrame({
        "qty": df["qty"].astype("int64"),
        "n_lines": df["n_lines"].astype("int64"),
        "avg_discount": round_half_up(
            df["disc_units"].to_numpy(np.int64) / (100.0 * n), 4),
        "avg_price": round_half_up(
            df["price_cents"].to_numpy(np.int64) / (100.0 * n), 4)})


DISCOUNT_QUANTITY_GRID_SQL = """
SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
       count(*) AS n_lines,
       round(sum(CAST(round(l_discount * 100) AS BIGINT))
             / (100.0 * count(*)), 4) AS avg_discount,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             / (100.0 * count(*)), 4) AS avg_price
FROM lineitem GROUP BY qty ORDER BY qty
"""


def region_profile(sf_dir: str, np_: int = 0):
    """Per-region rollup across the dimension hierarchy: nation
    count, customer and supplier populations and the total customer
    account balance — the region-level sanity panel q5/q8 slice but
    never total.

    100-TB shape: the customer and supplier dims each fold per batch
    to per-nationkey (count, cents) partials — nations are a fixed
    enum, so the driver sees two ≤|nations| × n_blocks grids (class
    b); nation→region is a tiny dim collected whole.  All-int until
    the final division."""
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    cust = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def c_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"nk": pc.cast(batch.column("c_nationkey"),
                                    pa.int64()),
                      "n_customers": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "bal_cents": money_units(
                          batch.column("c_acctbal"))})
        return t.group_by("nk").aggregate(
            [("n_customers", "sum"), ("bal_cents", "sum")]) \
            .rename_columns(["nk", "n_customers", "bal_cents"])

    cgrid = collect_table(final_merge_sums(
        cust.map_batches(c_partial, batch_format="pyarrow"),
        ["nk"], ["n_customers", "bal_cents"], np_=np_).materialize())

    supp = _pq(sf_dir, "supplier", ["s_nationkey"])

    def s_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"nk": pc.cast(batch.column("s_nationkey"),
                                    pa.int64()),
                      "n_suppliers": pa.array(
                          np.ones(batch.num_rows, np.int64))})
        return t.group_by("nk").aggregate([("n_suppliers", "sum")]) \
            .rename_columns(["nk", "n_suppliers"])

    sgrid = collect_table(final_merge_sums(
        supp.map_batches(s_partial, batch_format="pyarrow"),
        ["nk"], ["n_suppliers"], np_=np_).materialize())

    nt = collect_table(_pq(sf_dir, "nation",
                           ["n_nationkey", "n_regionkey"])
                       .materialize())
    rt = collect_table(_pq(sf_dir, "region",
                           ["r_regionkey", "r_name"]).materialize())
    if nt is None or rt is None:
        return pd.DataFrame({
            "r_name": pd.Series([], dtype="object"),
            "n_nations": pd.Series([], dtype="int64"),
            "n_customers": pd.Series([], dtype="int64"),
            "n_suppliers": pd.Series([], dtype="int64"),
            "total_balance": pd.Series([], dtype="float64")})
    ndf = nt.to_pandas()
    ndf["nk"] = ndf["n_nationkey"].astype("int64")
    rdf = rt.to_pandas()
    df = ndf.merge(rdf, left_on="n_regionkey",
                   right_on="r_regionkey", how="inner")
    cdf = (cgrid.to_pandas() if cgrid is not None
           else pd.DataFrame({"nk": pd.Series([], dtype="int64"),
                              "n_customers": pd.Series([],
                                                       dtype="int64"),
                              "bal_cents": pd.Series([],
                                                     dtype="int64")}))
    sdf = (sgrid.to_pandas() if sgrid is not None
           else pd.DataFrame({"nk": pd.Series([], dtype="int64"),
                              "n_suppliers": pd.Series([],
                                                       dtype="int64")}))
    df = df.merge(cdf, on="nk", how="left").merge(sdf, on="nk",
                                                  how="left")
    g = df.groupby("r_name", as_index=False).agg(
        n_nations=("nk", "nunique"),
        n_customers=("n_customers", lambda s: int(s.fillna(0).sum())),
        n_suppliers=("n_suppliers", lambda s: int(s.fillna(0).sum())),
        bal_cents=("bal_cents", lambda s: int(s.fillna(0).sum())))
    return pd.DataFrame({
        "r_name": g["r_name"],
        "n_nations": g["n_nations"].astype("int64"),
        "n_customers": g["n_customers"].astype("int64"),
        "n_suppliers": g["n_suppliers"].astype("int64"),
        "total_balance": g["bal_cents"].to_numpy(np.int64) / 100.0}) \
        .sort_values("r_name").reset_index(drop=True)


REGION_PROFILE_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk, count(*) AS n,
         sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS bc
  FROM customer GROUP BY 1
), s AS (
  SELECT s_nationkey AS nk, count(*) AS n FROM supplier GROUP BY 1
)
SELECT r_name,
       count(DISTINCT n_nationkey) AS n_nations,
       CAST(sum(coalesce(c.n, 0)) AS BIGINT) AS n_customers,
       CAST(sum(coalesce(s.n, 0)) AS BIGINT) AS n_suppliers,
       CAST(sum(coalesce(c.bc, 0)) AS DOUBLE) / 100.0
           AS total_balance
FROM region
JOIN nation ON n_regionkey = r_regionkey
LEFT JOIN c ON c.nk = n_nationkey
LEFT JOIN s ON s.nk = n_nationkey
GROUP BY r_name ORDER BY r_name
"""


def orders_status_profile(sf_dir: str, np_: int = 0):
    """Per-order-status operational profile: order count, exact-cents
    revenue and mean order value — the fulfilment-state dashboard row
    (q4/q21 slice lateness; this totals the pipeline states).

    100-TB shape: pure one-pass combiner — per-batch (status, n,
    Σcents) partials through the bounded-adaptive merge; only the
    |statuses| × n_blocks grid reaches the driver (class b)."""
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums)

    ds = _pq(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderstatus": batch.column("o_orderstatus"),
                      "n_orders": pa.array(
                          np.ones(batch.num_rows, np.int64)),
                      "cents": money_units(
                          batch.column("o_totalprice"))})
        return t.group_by("o_orderstatus").aggregate(
            [("n_orders", "sum"), ("cents", "sum")]) \
            .rename_columns(["o_orderstatus", "n_orders", "cents"])

    agg = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_orderstatus"], ["n_orders", "cents"], np_=np_)
        .materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({
            "o_orderstatus": pd.Series([], dtype="object"),
            "n_orders": pd.Series([], dtype="int64"),
            "revenue": pd.Series([], dtype="float64"),
            "aov": pd.Series([], dtype="float64")})
    df = agg.to_pandas().sort_values("o_orderstatus") \
        .reset_index(drop=True)
    cents = df["cents"].to_numpy(np.int64)
    n = df["n_orders"].to_numpy(np.int64)
    return pd.DataFrame({
        "o_orderstatus": df["o_orderstatus"],
        "n_orders": df["n_orders"].astype("int64"),
        "revenue": cents / 100.0,
        "aov": round_half_up(cents / (100.0 * n), 4)})


ORDERS_STATUS_PROFILE_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             / (100.0 * count(*)), 4) AS aov
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def analytics_extra_queries():
    return {
        "orders_rolling_aov": orders_rolling_aov,
        "parts_top_per_nation": parts_top_per_nation,
        "events_funnel_paths": events_funnel_paths,
        "events_user_overlap": events_user_overlap,
        "orders_priority_mix_shift": orders_priority_mix_shift,
        "part_skyline": part_skyline,
        "events_cusum_shift": events_cusum_shift,
        "events_hourly_seasonal_z": events_hourly_seasonal_z,
        "suppliers_hhi_by_parttype": suppliers_hhi_by_parttype,
        "events_attribution_linear": events_attribution_linear,
        "events_dau_wau": events_dau_wau,
        "lineitem_discount_slope": lineitem_discount_slope,
        "events_hourly_autocorr": events_hourly_autocorr,
        "events_decay_score": events_decay_score,
        "events_heavy_hitters": events_heavy_hitters,
        "events_csv_roundtrip": events_csv_roundtrip,
        "events_jsonl_roundtrip": events_jsonl_roundtrip,
        "events_schema_evolution": events_schema_evolution,
        "user_customer_coverage": user_customer_coverage,
        "orders_quartile_bands": orders_quartile_bands,
        "events_table_profile": events_table_profile,
        "events_conversion_window": events_conversion_window,
        "orders_pareto": orders_pareto,
        "events_value_gini": events_value_gini,
        "events_value_means": events_value_means,
        "orders_monthly_dense": orders_monthly_dense,
        "events_session_stats": events_session_stats,
        "events_value_winsorized": events_value_winsorized,
        "events_ks_drift": events_ks_drift,
        "events_user_entropy": events_user_entropy,
        "events_benford": events_benford,
        "events_value_quantile_sketch": events_value_quantile_sketch,
        "orders_cube": orders_cube,
        "lineitem_weighted_discount": lineitem_weighted_discount,
        "events_type_markov": events_type_markov,
        "events_anomaly_mad": events_anomaly_mad,
        "orders_yoy_growth": orders_yoy_growth,
        "customer_rfm": customer_rfm,
        "events_ab_test": events_ab_test,
        "events_values_except": events_values_except,
        "events_weekday_profile": events_weekday_profile,
        "events_value_histogram": events_value_histogram,
        "events_lag_delta": events_lag_delta,
        "events_quantiles_by_type": events_quantiles_by_type,
        "events_range_join": events_range_join,
        "events_peak_concurrency": events_peak_concurrency,
        "events_busy_coverage": events_busy_coverage,
        "customer_cohort_ltv": customer_cohort_ltv,
        "orders_growth_accounting": orders_growth_accounting,
        "orders_interarrival": orders_interarrival,
        "customer_balance_deciles": customer_balance_deciles,
        "order_fulfillment_span": order_fulfillment_span,
        "shipping_latency_by_priority": shipping_latency_by_priority,
        "lineitem_returns_by_month": lineitem_returns_by_month,
        "events_activity_histogram": events_activity_histogram,
        "nation_trade_balance": nation_trade_balance,
        "customer_segment_profile": customer_segment_profile,
        "lineitem_discount_quantity_grid": lineitem_discount_quantity_grid,
        "region_profile": region_profile,
        "orders_status_profile": orders_status_profile,
    }


def analytics_extra_oracle_sql():
    return {
        "orders_rolling_aov": ORDERS_ROLLING_AOV_SQL,
        "parts_top_per_nation": TOP_PARTS_SQL,
        "events_funnel_paths": EVENTS_FUNNEL_PATHS_SQL,
        "events_user_overlap": EVENTS_USER_OVERLAP_SQL,
        "orders_priority_mix_shift": ORDERS_MIX_SHIFT_SQL,
        "part_skyline": PART_SKYLINE_SQL,
        "events_cusum_shift": EVENTS_CUSUM_SQL,
        "events_hourly_seasonal_z": EVENTS_SEASONAL_Z_SQL,
        "suppliers_hhi_by_parttype": SUPPLIERS_HHI_SQL,
        "events_attribution_linear": EVENTS_ATTRIBUTION_SQL,
        "events_dau_wau": EVENTS_DAU_WAU_SQL,
        "lineitem_discount_slope": DISCOUNT_SLOPE_SQL,
        "events_hourly_autocorr": EVENTS_AUTOCORR_SQL,
        "events_decay_score": EVENTS_DECAY_SCORE_SQL,
        "events_heavy_hitters": EVENTS_HEAVY_HITTERS_SQL,
        "events_value_histogram": EVENTS_HISTOGRAM_SQL,
        "events_lag_delta": EVENTS_LAG_DELTA_SQL,
        "events_quantiles_by_type": EVENTS_QUANTILES_SQL,
        "events_range_join": EVENTS_RANGE_JOIN_SQL,
        "orders_cube": ORDERS_CUBE_SQL,
        "lineitem_weighted_discount": WEIGHTED_DISCOUNT_SQL,
        "events_type_markov": EVENTS_MARKOV_SQL,
        "events_anomaly_mad": EVENTS_ANOMALY_MAD_SQL,
        "orders_yoy_growth": ORDERS_YOY_SQL,
        "customer_rfm": CUSTOMER_RFM_SQL,
        "events_ab_test": EVENTS_AB_TEST_SQL,
        "events_values_except": EVENTS_VALUES_EXCEPT_SQL,
        "events_weekday_profile": EVENTS_WEEKDAY_SQL,
        "orders_pareto": ORDERS_PARETO_SQL,
        "events_ks_drift": EVENTS_KS_SQL,
        "events_user_entropy": EVENTS_ENTROPY_SQL,
        "events_benford": EVENTS_BENFORD_SQL,
        "events_value_gini": EVENTS_GINI_SQL,
        "events_value_means": EVENTS_MEANS_SQL,
        "orders_monthly_dense": ORDERS_MONTHLY_DENSE_SQL,
        "events_session_stats": EVENTS_SESSION_STATS_SQL,
        "events_value_winsorized": EVENTS_WINSORIZED_SQL,
        "events_csv_roundtrip": _FORMAT_ROLLUP_SQL,
        "events_schema_evolution": _SCHEMA_EVOLUTION_SQL,
        "user_customer_coverage": _USER_CUSTOMER_COVERAGE_SQL,
        "orders_quartile_bands": _ORDERS_QUARTILE_SQL,
        "events_table_profile": _EVENTS_TABLE_PROFILE_SQL,
        "events_jsonl_roundtrip": _FORMAT_ROLLUP_SQL,
        "events_conversion_window": EVENTS_CONVERSION_SQL,
        "events_peak_concurrency": EVENTS_PEAK_CONCURRENCY_SQL,
        "events_busy_coverage": EVENTS_BUSY_COVERAGE_SQL,
        "customer_cohort_ltv": CUSTOMER_COHORT_LTV_SQL,
        "orders_growth_accounting": ORDERS_GROWTH_SQL,
        "orders_interarrival": ORDERS_INTERARRIVAL_SQL,
        "customer_balance_deciles": CUSTOMER_BALANCE_DECILES_SQL,
        "order_fulfillment_span": ORDER_FULFILLMENT_SPAN_SQL,
        "shipping_latency_by_priority": SHIPPING_LATENCY_SQL,
        "lineitem_returns_by_month": LINEITEM_RETURNS_SQL,
        "events_activity_histogram": EVENTS_ACTIVITY_HISTOGRAM_SQL,
        "nation_trade_balance": NATION_TRADE_BALANCE_SQL,
        "customer_segment_profile": CUSTOMER_SEGMENT_PROFILE_SQL,
        "lineitem_discount_quantity_grid": DISCOUNT_QUANTITY_GRID_SQL,
        "region_profile": REGION_PROFILE_SQL,
        "orders_status_profile": ORDERS_STATUS_PROFILE_SQL,
    }
