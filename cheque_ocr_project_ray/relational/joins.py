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

import pyarrow as pa

import ray


def broadcast_join(large_ds, small_table: pa.Table, on: str,
                   how: str = "inner"):
    """Join a Dataset against a small in-memory side, batch-local.

    The small side lives in the object store once (``ray.put``); each
    actor reads it zero-copy in ``__init__`` and joins per Arrow batch.
    """
    small_ref = ray.put(small_table)
    # accept BOTH vocabularies ('left' and Arrow's 'left outer') so the
    # broadcast and hash paths are drop-in swappable at call sites
    arrow_how = {"left": "left outer", "right": "right outer",
                 "outer": "full outer"}.get(how, how)

    class _Joiner:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=on, join_type=arrow_how)

    from cheque_ocr_project_ray.util import map_pool
    return large_ds.map_batches(_Joiner, batch_format="pyarrow",
                                concurrency=(1, map_pool()))


_JOIN_TYPES = {"inner": "inner", "left": "left_outer",
               "right": "right_outer", "outer": "full_outer",
               # Arrow-vocabulary aliases: both join helpers accept
               # either spelling (call sites are drop-in swappable)
               "left outer": "left_outer", "right outer": "right_outer",
               "full outer": "full_outer"}


def hash_join(left_ds, right_ds, on: str, how: str = "inner",
              num_partitions: int | None = None):
    """Partitioned hash join of two Datasets on one key column.

    Uses Ray Data's native hash-shuffle join: both sides are
    hash-partitioned on the key across ``num_partitions`` aggregator
    actors (one all-to-all exchange), then joined partition-local.
    Partition count defaults to half the CPU count (measured: above
    that, aggregator actors contend with the map tasks feeding them —
    32 partitions on 32 CPUs was 5x slower than 16); raise it for
    skewed keys on a real cluster.
    """
    if num_partitions is None:
        from cheque_ocr_project_ray.util import shuffle_partitions
        num_partitions = shuffle_partitions()
    return left_ds.join(right_ds, join_type=_JOIN_TYPES[how],
                        num_partitions=num_partitions, on=(on,))
