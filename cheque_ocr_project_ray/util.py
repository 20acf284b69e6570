"""Small shared utilities."""

from __future__ import annotations

import numpy as np


def round_half_up_arrow(arr, digits: int = 4):
    """Arrow-kernel form of :func:`round_half_up` (pc.round rounds
    half-to-even, which disagrees with SQL on exact halves)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    scale = 10.0 ** digits
    scaled = pc.add(pc.multiply(pc.abs(arr), pa.scalar(scale)),
                    pa.scalar(0.5))
    return pc.multiply(pc.divide(pc.floor(scaled), pa.scalar(scale)),
                       pc.sign(pc.cast(arr, pa.float64())))


def shuffle_partitions() -> int:
    """Hash-shuffle partition count sized to the cluster: half the CPU
    count — measured sweet spot locally (aggregator actors contend
    with map tasks above that); scales with total cores on a cluster."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, cpus // 2)


def map_pool(divisor: int = 3, floor: int = 2) -> int:
    """Actor-pool size for a linear (map-only) stage, proportional to
    the cluster: CPUs/divisor, min ``floor``.  A fixed small cap (the
    round-1 ``concurrency=(1, 4)``) pins the stage to 4 actors no
    matter how many nodes exist — a stage bottleneck at scale; sizing
    from ``cluster_resources()`` tracks the cluster instead."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(floor, cpus // divisor)


class tune_shuffle:
    """Scoped hash-shuffle: ``with tune_shuffle() as np_: build datasets``.

    Hash shuffle (aggregator actors, Ray >= 2.46) beats the default
    sort-based shuffle ~2-5x for groupby/aggregate on this workload.
    A Dataset captures its DataContext at BUILD time (verified: a
    dataset built under hash and executed under sort runs hash), so
    scoping the strategy to the build and restoring on exit keeps the
    driver's global context untouched for anything built later.
    """

    def __init__(self, num_partitions: int | None = None):
        self.num_partitions = num_partitions or shuffle_partitions()

    def __enter__(self) -> int:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy
        self._ctx = DataContext.get_current()
        self._prev = self._ctx.shuffle_strategy
        self._prev_agg = \
            self._ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override
        self._prev_shuf = \
            self._ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
        self._ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # Fractional CPUs per aggregator actor: lets the shuffle coexist
        # with fixed actor pools instead of deadlocking when logical
        # CPUs are fully reserved (observed on the 4-CPU test session).
        self._ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.25
        self._ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
        return self.num_partitions

    def __exit__(self, *exc) -> None:
        self._ctx.shuffle_strategy = self._prev
        self._ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = \
            self._prev_agg
        self._ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = \
            self._prev_shuf


def round_half_up(x, digits: int = 4):
    """Round half AWAY from zero — DuckDB's round() semantics.

    numpy/pandas round half-to-even (banker's), which disagrees with
    SQL on exact halves (e.g. 1/32 = 0.03125 → 0.0312 vs 0.0313).
    Ratio columns with power-of-two denominators hit this constantly,
    so every Ray-side division that is compared against a DuckDB
    oracle goes through this helper.
    """
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def final_merge_sums(partials_ds, keys: list, sum_cols: list,
                     np_: int = 0, bound: int = 2_000_000):
    """Merge per-batch combiner partials into final per-key sums.

    Ray's groupby/aggregate dispatches per group (measured ~30-60 µs
    each — 4-5 s for the 95k (user, hour) groups of events_hourly at
    sf0.1, under either shuffle strategy).  The partial stream is
    already combiner-reduced, so when it is bounded the final merge is
    ONE vectorized Arrow ``group_by`` on the driver (0.1 s for the same
    95k groups; the result is driver-collected right after anyway).
    Beyond ``bound`` partial rows — corpus-scale key cardinality —
    fall back to the distributed groupby, which is the only shape that
    scales past driver memory.
    """
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    part = partials_ds.materialize()
    if part.count() <= bound:
        t = collect_table(part)
        if t is not None:
            g = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
            g = g.select(list(keys) + [f"{c}_sum" for c in sum_cols]) \
                .rename_columns(list(keys) + list(sum_cols))
            return ray.data.from_arrow(g)
        return part  # typed-empty input: nothing to merge
    return part.groupby(list(keys),
                        num_partitions=np_ or None).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols])


def final_merge_min(partials_ds, keys: list, min_cols: list,
                    np_: int = 0, bound: int = 2_000_000):
    """Min-reduce twin of :func:`final_merge_sums` — merges per-batch
    argmin/min partials into global per-key minima with the same
    bounded-adaptive shape (driver Arrow ``group_by`` when the partial
    stream is bounded, distributed groupby beyond)."""
    import ray
    import ray.data
    from ray.data.aggregate import Min

    part = partials_ds.materialize()
    if part.count() <= bound:
        t = collect_table(part)
        if t is not None:
            g = t.group_by(keys).aggregate([(c, "min") for c in min_cols])
            g = g.select(list(keys) + [f"{c}_min" for c in min_cols]) \
                .rename_columns(list(keys) + list(min_cols))
            return ray.data.from_arrow(g)
        return part
    return part.groupby(list(keys),
                        num_partitions=np_ or None).aggregate(
        *[Min(c, alias_name=c) for c in min_cols])


def final_merge_max(partials_ds, keys: list, max_cols: list,
                    np_: int = 0, bound: int = 2_000_000):
    """Max-reduce twin of :func:`final_merge_min` — same
    bounded-adaptive shape (driver Arrow ``group_by`` when the partial
    stream is bounded, distributed groupby beyond)."""
    import ray
    import ray.data
    from ray.data.aggregate import Max

    part = partials_ds.materialize()
    if part.count() <= bound:
        t = collect_table(part)
        if t is not None:
            g = t.group_by(keys).aggregate([(c, "max") for c in max_cols])
            g = g.select(list(keys) + [f"{c}_max" for c in max_cols]) \
                .rename_columns(list(keys) + list(max_cols))
            return ray.data.from_arrow(g)
        return part
    return part.groupby(list(keys),
                        num_partitions=np_ or None).aggregate(
        *[Max(c, alias_name=c) for c in max_cols])


def collect_table(materialized_ds):
    """Concat a (small, bounded) materialized Dataset's blocks into one
    local Arrow table, or None when nothing real was produced.

    Centralizes the empty-block hygiene every bounded-adaptive path
    needs: Ray emits schemaless (0-column) blocks for some empty
    outputs and null-typed blocks for empty pandas frames — both must
    be dropped before pyarrow.concat_tables or it raises on the mixed
    schemas.
    """
    import pyarrow as pa
    import ray

    parts = [t for t in ray.get(materialized_ds.to_arrow_refs())
             if t.num_columns and t.num_rows]
    if not parts:
        return None
    return pa.concat_tables(parts).combine_chunks()


def block_prefix_offsets(refs, sum_col: str | None = None):
    """Phase ONE of the two-phase prefix scan over a globally sorted
    Dataset's block refs: per-block row counts (and, optionally, the
    integer total of ``sum_col``) fold into EXCLUSIVE prefix offsets.
    The driver sees n_blocks 2-int tuples — never a row.  Phase two
    is query-specific: each block finishes its own rank/cumsum work
    in a Ray task seeded with its offsets (the ``orders_pareto``
    shape, shared by the vocabulary-rank fallbacks).

    Returns ``(rows, row_off, sums, sum_off)`` int64 arrays of length
    n_blocks (``sums``/``sum_off`` are zeros when ``sum_col`` is
    None)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    @ray.remote
    def _stats(t, col):
        if t.num_columns == 0 or t.num_rows == 0:
            return (0, 0)
        s = int(pc.sum(t.column(col)).as_py() or 0) if col else 0
        return (t.num_rows, s)

    st = ray.get([_stats.remote(r, sum_col) for r in refs])
    rows = np.array([a for a, _ in st], dtype=np.int64)
    sums = np.array([b for _, b in st], dtype=np.int64)
    row_off = np.concatenate([[0], np.cumsum(rows)[:-1]]).astype(np.int64)
    sum_off = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)
    return rows, row_off, sums, sum_off


def strip_schema_metadata(t):
    """Drop parquet/pandas schema metadata from an Arrow table —
    pandas-written parquet carries a b'pandas' dict that makes the
    Schema unhashable and trips Ray's "Failed to hash the schemas"
    warning inside every shuffle aggregator.  Zero-copy; as a
    ``map_batches`` fn it fuses into the upstream read task.  The one
    shared definition — joins and the relational readers both use it.
    """
    return t.replace_schema_metadata(None)


def money_units(arr, digits: int = 2):
    """Exact fixed-point decimal column (float storage) → int64 in
    10^digits units.  Integer sums are order-independent and exact, so
    grouped money totals become bit-reproducible under ANY block order
    / parallelism and match the SQL twin's DECIMAL arithmetic bit-for-
    bit (verified at sf0.1) — float64 partial sums were drifting past
    the 2-4dp rounding once group sums reached ~1e9."""
    import pyarrow as pa
    import pyarrow.compute as pc
    return pc.cast(
        pc.round(pc.multiply(pc.cast(arr, pa.float64()),
                             pa.scalar(10.0 ** digits))), pa.int64())


def quantile_cont_from_grid(values: "np.ndarray", counts: "np.ndarray",
                            q: float) -> float:
    """Exact replica of DuckDB's ``quantile_cont`` over a sorted
    (value, count) grid: rn = (n-1)·q, result = (CRN−rn)·a + (rn−FRN)·b
    — bit-equal to DuckDB (verified), unlike Ray's Quantile aggregate
    whose interpolation drifts ~1e-6 at fractional ranks.  Use this
    whenever a quantile feeds an exact comparison instead of a rounded
    output column."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    rn = (n - 1) * q
    frn, crn = np.floor(rn), np.ceil(rn)
    a = values[np.searchsorted(cum, frn + 1)]
    b = values[np.searchsorted(cum, crn + 1)]
    if crn == frn:
        return float(a)
    return float((crn - rn) * a + (rn - frn) * b)
