"""Join primitives (SURVEY.md §2.4 → Ray Data).

Two join strategies, chosen by side size exactly as the guide
prescribes:

- ``broadcast_join``: the small side is collected to an Arrow table on
  the driver, shipped once via ``ray.put``, and merged per batch
  inside ``map_batches`` — zero shuffle.  This replaces the
  reference's O(N·M) per-image DBF scan (J1,
  ``issuer_processor_v.py:552-576``).

- ``hash_join``: both sides large → one explicit hash-partitioned
  exchange: tag each side, union, ``groupby(key).map_groups`` joining
  within each key group.  One shuffle total; skewed keys can be
  salted by pre-splitting hot keys upstream.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray


def broadcast_join(large_ds, small_table: pa.Table, on: str,
                   how: str = "inner"):
    """Join a Dataset against a small in-memory side, batch-local."""
    small_ref = ray.put(small_table.to_pandas())

    class _Joiner:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return large_ds.map_batches(_Joiner, batch_format="pandas",
                                concurrency=(1, 4))


def hash_join(left_ds, right_ds, on: str, how: str = "inner"):
    """Partitioned hash join of two Datasets on one key column.

    Implementation: add a side tag, union, group by the key, and merge
    the two sides within each group.  The groupby is the single
    all-to-all exchange; everything else is batch-local.
    """
    lcols = list(left_ds.schema().names)
    rcols = list(right_ds.schema().names)
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"hash_join column overlap: {overlap}")

    def tag(side):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__side"] = side
            return batch
        return fn

    tagged = left_ds.map_batches(tag(0), batch_format="pandas").union(
        right_ds.map_batches(tag(1), batch_format="pandas"))

    out_cols = [c for c in lcols + rcols if c != on]

    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][[c for c in lcols]]
        r = group[group["__side"] == 1][[c for c in rcols]]
        return l.merge(r, on=on, how=how)

    return tagged.groupby(on).map_groups(join_group, batch_format="pandas")
