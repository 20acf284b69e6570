"""Scan-line / ordered-sequence additions: gaps-and-islands streaks,
interval-stabbing backlog via delta encoding + prefix sum, and
weighted sampling without replacement (Efraimidis–Spirakis A-Res with
a deterministic hash-derived uniform, so the draw is reproducible
across engines and cluster sizes).  All oracled.

Scale shapes:
- streaks: per-batch distinct (user, day) combiner (shrinks the
  shuffle to active-days), then ``groupby(user).map_groups`` with a
  vectorized run-length split — the per-user-ordered window family
  (same partitioning assumption as sessionization).
- backlog: the classic interval-overlay trick — each order's open
  interval becomes (+1 at open month, −1 after close month); the
  unbounded interval set reduces to a calendar-bounded delta table
  (combiner + tiny merge), and the running count is a prefix sum over
  months — never a self-join or a per-month rescan.
- weighted sample: per-batch top-k by priority key (one vectorized
  ``select_k_unstable``), then a global merge of ≤k·B candidate rows —
  the corpus is never sorted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cheque_ocr_project_ray.relational.joins import hash_join
from cheque_ocr_project_ray.relational.queries import _hash_shuffled, _pq
from cheque_ocr_project_ray.util import (final_merge_max,
                                         final_merge_sums, round_half_up)

_DAY_US = 86_400 * 1_000_000


def _empty_streaks() -> pd.DataFrame:
    return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                         "active_days": pd.Series([], dtype="int64"),
                         "longest_streak": pd.Series([], dtype="int64")})


@_hash_shuffled
def events_user_streak(sf_dir: str, np_: int = 0):
    """Longest consecutive-active-day streak per user (gaps-and-
    islands): distinct active days, then the max run length of
    day-adjacent values.  The SQL twin is the canonical
    ``day - row_number()`` island trick; the Ray side is a vectorized
    ``np.diff`` run split inside ``groupby(user).map_groups``.
    """
    import pyarrow.parquet as pq_
    from pathlib import Path
    if pq_.ParquetFile(str(Path(sf_dir) / "events.parquet")) \
            .metadata.num_rows == 0:
        return _empty_streaks()

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def day_partial(batch: pa.Table) -> pa.Table:
        # trunc == floor for the (positive) us-epoch domain
        day = pc.divide(pc.cast(pc.cast(batch.column("ts"),
                                        pa.timestamp("us")), pa.int64()),
                        pa.scalar(_DAY_US, pa.int64()))
        t = pa.table({"user_id": batch.column("user_id"), "day": day})
        return t.group_by(["user_id", "day"]).aggregate([])

    days = ds.map_batches(day_partial, batch_format="pyarrow")

    def streaks(group: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(group["day"].to_numpy())  # dedup across batches
        brk = np.flatnonzero(np.diff(d) != 1)
        edges = np.concatenate(([-1], brk, [len(d) - 1]))
        return pd.DataFrame({
            "user_id": np.asarray([group["user_id"].iloc[0]], np.int64),
            "active_days": np.asarray([len(d)], np.int64),
            "longest_streak": np.asarray([np.diff(edges).max()],
                                         np.int64)})

    return days.groupby("user_id", num_partitions=np_).map_groups(
        streaks, batch_format="pandas")


EVENTS_STREAK_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events),
isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id
                                  ORDER BY day) AS grp
  FROM days),
runs AS (SELECT user_id, grp, count(*) AS len
         FROM isl GROUP BY user_id, grp)
SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
       CAST(max(len) AS BIGINT) AS longest_streak
FROM runs GROUP BY user_id
"""


def _month_idx(ts_col) -> pa.ChunkedArray:
    """year*12 + (month-1) — a dense, orderable calendar-month
    integer."""
    ts = pc.cast(ts_col, pa.timestamp("us"))
    return pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                              pa.scalar(12, pa.int64())),
                  pc.subtract(pc.cast(pc.month(ts), pa.int64()),
                              pa.scalar(1, pa.int64())))


@_hash_shuffled
def orders_backlog_running(sf_dir: str, np_: int = 0):
    """Monthly in-flight order backlog: an order is open from its
    order month through its last lineitem ship month; report the
    running count of open orders at each month where it changes.

    Interval-stabbing via delta encoding: per-order (open, close)
    months come from a combiner max over lineitem + one hash join to
    orders; each interval then contributes (+1, −1) delta rows, which
    collapse by month (calendar-bounded — driver-tiny at any corpus
    size) before a single prefix sum.  No month×orders rescan, no
    self-join, no global sort of raw rows.
    """
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def ship_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderkey": batch.column("l_orderkey"),
                      "m1": _month_idx(batch.column("l_shipdate"))})
        return t.group_by("o_orderkey").aggregate([("m1", "max")]) \
            .rename_columns(["o_orderkey", "m1"])

    last = final_merge_max(
        li.map_batches(ship_partial, batch_format="pyarrow"),
        ["o_orderkey"], ["m1"], np_=np_)

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def open_month(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "m0": _month_idx(batch.column("o_orderdate"))})

    joined = hash_join(orders.map_batches(open_month,
                                          batch_format="pyarrow"),
                       last, on="o_orderkey")

    def deltas(batch: pa.Table) -> pa.Table:
        m0 = batch.column("m0").to_numpy(zero_copy_only=False)
        # clamp: a last-ship month before the order month still keeps
        # the order open for its own order month
        m1 = np.maximum(
            batch.column("m1").to_numpy(zero_copy_only=False), m0) + 1
        t = pa.table({
            "m": np.concatenate([m0, m1]),
            "delta": np.concatenate([np.ones(len(m0), np.int64),
                                     -np.ones(len(m1), np.int64)])})
        return t.group_by("m").aggregate([("delta", "sum")]) \
            .rename_columns(["m", "delta"])

    agg = final_merge_sums(
        joined.map_batches(deltas, batch_format="pyarrow"),
        ["m"], ["delta"], np_=np_)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty or "m" not in b.columns:
            return pd.DataFrame({
                "ym": pd.Series([], dtype="int64"),
                "open_orders": pd.Series([], dtype="int64")})
        b = b.sort_values("m")
        m = b["m"].to_numpy()
        return pd.DataFrame({
            "ym": (m // 12) * 100 + (m % 12) + 1,
            "open_orders": b["delta"].cumsum().to_numpy(np.int64)})

    return agg.repartition(1).map_batches(finish, batch_format="pandas",
                                          batch_size=None)


ORDERS_BACKLOG_SQL = """
WITH last AS (
  SELECT l_orderkey,
         max(year(l_shipdate) * 12 + month(l_shipdate) - 1) AS m1
  FROM lineitem GROUP BY l_orderkey),
span AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m0,
         greatest(year(o_orderdate) * 12 + month(o_orderdate) - 1,
                  m1) AS m1
  FROM orders JOIN last ON l_orderkey = o_orderkey),
d AS (
  SELECT m0 AS m, 1 AS delta FROM span
  UNION ALL
  SELECT m1 + 1 AS m, -1 AS delta FROM span),
g AS (SELECT m, sum(delta) AS delta FROM d GROUP BY m)
SELECT CAST((m // 12) * 100 + (m % 12) + 1 AS BIGINT) AS ym,
       CAST(sum(delta) OVER (ORDER BY m) AS BIGINT) AS open_orders
FROM g ORDER BY ym
"""


SAMPLE_K = 500


def events_weighted_sample(sf_dir: str, k: int = SAMPLE_K):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): priority key = −ln(u)/w with weight w = |value|+1 and a
    DETERMINISTIC uniform u derived from a multiplicative hash of
    ``event_id`` — the draw is reproducible across engines, reruns,
    and cluster sizes (a seeded RNG would not be), and expressible in
    SQL with the same arithmetic.  The k smallest keys are the
    weighted sample.  Per-batch ``select_k_unstable`` keeps only ≤k
    candidates per block, so the global step merges ≤k·B rows.
    """
    ds = _pq(sf_dir, "events",
             ["event_id", "user_id", "event_type", "value"])

    def local(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # mask BEFORE multiplying, in uint64: (2^32-1)·2654435761 ≈
        # 1.14e19 fits uint64 but overflows int64, where numpy would
        # wrap silently while the SQL twin's BIGINT raises — the
        # engines would diverge exactly at large-id tiers (ADVICE r4)
        h = ((eid.astype(np.uint64) % np.uint64(4294967296))
             * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        w = np.abs(batch.column("value").to_numpy(
            zero_copy_only=False)) + 1.0
        t = batch.append_column("skey", pa.array(-np.log(u) / w))
        idx = pc.select_k_unstable(t, k, [("skey", "ascending"),
                                          ("event_id", "ascending")])
        return t.take(idx)

    sel = ds.map_batches(local, batch_format="pyarrow") \
        .sort(["skey", "event_id"]).limit(k)

    def finish(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("skey")
        return b.set_column(i, "skey", pa.array(round_half_up(
            b.column("skey").to_numpy(zero_copy_only=False), 6)))

    return sel.map_batches(finish, batch_format="pyarrow")


EVENTS_WEIGHTED_SAMPLE_SQL = f"""
SELECT event_id, user_id, event_type, value, round(skey, 6) AS skey
FROM (
  SELECT event_id, user_id, event_type, value,
         -ln(((((CAST(event_id AS UBIGINT) % 4294967296)
                 * 2654435761) & 4294967295) + 1)
             / 4294967296.0) / (abs(value) + 1.0) AS skey
  FROM events
  ORDER BY skey, event_id LIMIT {SAMPLE_K}) t
"""


def scanline_queries():
    return {
        "events_user_streak": events_user_streak,
        "orders_backlog_running": orders_backlog_running,
        "events_weighted_sample": events_weighted_sample,
    }


def scanline_oracle_sql():
    return {
        "events_user_streak": EVENTS_STREAK_SQL,
        "orders_backlog_running": ORDERS_BACKLOG_SQL,
        "events_weighted_sample": EVENTS_WEIGHTED_SAMPLE_SQL,
    }
