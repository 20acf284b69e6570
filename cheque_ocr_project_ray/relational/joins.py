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

import numpy as np
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
    # parquet files written by pandas carry b'pandas' schema metadata,
    # which makes pyarrow Schema unhashable and trips a "Failed to
    # hash the schemas" warning in every join aggregator's concat;
    # stripping it is zero-copy and fuses into the upstream read
    def _strip_meta(t: pa.Table) -> pa.Table:
        return t.replace_schema_metadata(None)

    left_ds = left_ds.map_batches(_strip_meta, batch_format="pyarrow",
                                  zero_copy_batch=True)
    right_ds = right_ds.map_batches(_strip_meta, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return left_ds.join(right_ds, join_type=_JOIN_TYPES[how],
                        num_partitions=num_partitions, on=(on,))


# --- Bloom-prefiltered semi-join -------------------------------------
_BLOOM_C1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_indices(keys: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    """i-th double-hash probe index for each key (Kirsch–Mitzenmacher:
    h1 + i*h2, both multiplicative mixes of the 64-bit key)."""
    k = keys.astype(np.uint64)
    h1 = k * _BLOOM_C1
    h2 = (k * _BLOOM_C2) | np.uint64(1)
    return ((h1 + np.uint64(i) * h2) % np.uint64(m_bits))


def bloom_semi_join(left_ds, keys_ds, on_left: str, on_right: str,
                    m_bits: int = 1 << 20, k_hashes: int = 4):
    """Semi-join ``left_ds`` to the key set of ``keys_ds`` with a
    Bloom-filter prefilter: the scale pattern for "big fact table ⋉
    selective key set" that avoids shuffling the fact side.

    Phase 1 builds per-batch bitmaps over the key column (each batch
    reduces to one ``m_bits``-bit array) and OR-merges them — on the
    driver here (bitmap count = #key batches, each m_bits/8 bytes; on
    a many-node cluster make this a tree reduce).  Phase 2 broadcasts
    the merged bitmap once (``ray.put``) and streams the fact side
    through a vectorized membership test.  Phase 3 removes Bloom
    false positives EXACTLY by hash-joining only the survivors
    against the key set — the shuffle now moves just the prefiltered
    rows, which is the entire point at 100 TB.

    ``keys_ds`` must be key-unique (a key SET — e.g. a primary key
    column); duplicate keys would multiply matched rows in the exact
    join, per plain semi-join-vs-inner-join semantics.
    """
    from cheque_ocr_project_ray.util import collect_table, map_pool

    def batch_bits(batch: pa.Table) -> pa.Table:
        keys = batch.column(on_right).to_numpy()
        bits = np.zeros(m_bits // 64, np.uint64)
        for i in range(k_hashes):
            idx = _bloom_indices(keys, i, m_bits)
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = collect_table(
        keys_ds.map_batches(batch_bits,
                            batch_format="pyarrow").materialize())
    bits = np.zeros(m_bits // 64, np.uint64)
    if parts is not None:
        for b in parts.column("bits").to_pylist():
            bits |= np.frombuffer(b, np.uint64)
    bits_ref = ray.put(bits)

    class Prefilter:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(on_left).to_numpy()
            ok = np.ones(len(keys), bool)
            for i in range(k_hashes):
                idx = _bloom_indices(keys, i, m_bits)
                word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
                ok &= (word >> (idx & np.uint64(63))) & np.uint64(1) == 1
            return batch.filter(pa.array(ok))

    survivors = left_ds.map_batches(Prefilter, batch_format="pyarrow",
                                    concurrency=(1, map_pool()))
    keys_only = keys_ds.select_columns([on_right])
    if on_right != on_left:
        keys_only = keys_only.rename_columns({on_right: on_left})
    return hash_join(survivors, keys_only, on=on_left)
