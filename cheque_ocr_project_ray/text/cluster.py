"""Connected components over near-dup pair lists.

The dedup family emits PAIRS (doc_a, doc_b, score); turning pairs
into droppable duplicate groups needs the transitive closure — docs
A-B and B-C are one cluster even though A-C never paired.  This is
the graph operator shape: union-find when the edge list is bounded
(it is the DEDUP OUTPUT, a tiny fraction of the corpus), iterative
min-label propagation over hash joins when it is not — the standard
large-scale connected-components algorithm (converges in O(component
diameter) rounds).

Output: (doc_id, rep) for every doc in at least one pair, where rep
is the smallest doc_id in its component — the canonical keep/drop
rule (keep rep, drop the rest).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from cheque_ocr_project_ray.util import collect_table


def _typed_empty():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "rep": pa.array([], pa.int64())}))


def _union_find(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Driver union-find with path halving; rep = min doc_id in the
    component (not the arbitrary root)."""
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    parent = np.arange(len(ids))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for x, y in zip(ai, bi):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = np.array([find(i) for i in range(len(ids))])
    rep = np.full(len(ids), np.iinfo(np.int64).max)
    np.minimum.at(rep, roots, ids)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "rep": pa.array(rep[roots], pa.int64())})


def components_from_pairs(pairs_ds, a_col: str = "doc_a",
                          b_col: str = "doc_b",
                          bound: int = 2_000_000,
                          max_iters: int = 50):
    """Transitive closure of a pair list → (doc_id, rep).

    Bounded-adaptive like the rest of the pair machinery: an edge
    list within ``bound`` rows runs exact union-find on the driver
    (the dedup output IS bounded relative to the corpus); beyond it,
    distributed min-label propagation — labels start at own doc_id,
    each round takes the min over neighbors via one hash join +
    groupby(min), and the monotone label sum gives a cheap fixpoint
    test.  Set ``bound=0`` to force the distributed path (tests do).

    ``max_iters`` bounds propagation rounds; convergence needs
    O(component diameter) rounds, and near-dup components are
    squat (near-cliques), so 50 is far beyond any real corpus — a
    pathological million-hop chain would return early with labels
    still converging, never a wrong pairing (labels only tighten).
    """
    pairs = pairs_ds.select_columns([a_col, b_col]).materialize()
    if pairs.count() == 0:
        return _typed_empty()
    if pairs.count() <= bound:
        t = collect_table(pairs)
        return ray.data.from_arrow(_union_find(
            t.column(a_col).to_numpy(), t.column(b_col).to_numpy()))

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        return pa.table({
            "doc": pa.concat_arrays([*a.cast(pa.int64()).chunks,
                                     *b.cast(pa.int64()).chunks]),
            "nbr": pa.concat_arrays([*b.cast(pa.int64()).chunks,
                                     *a.cast(pa.int64()).chunks])})

    edges = pairs.map_batches(both_dirs,
                              batch_format="pyarrow").materialize()
    labels = edges.groupby("doc").aggregate(
        Min("nbr", alias_name="lab")).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("lab"), "lab",
            pa.compute.min_element_wise(t.column("lab"),
                                        t.column("doc"))),
        batch_format="pyarrow").materialize()
    prev_sum = labels.sum("lab")

    from cheque_ocr_project_ray.relational.joins import hash_join
    for _ in range(max_iters):
        # hash_join joins on a single shared column name; relabel the
        # join key on the label side
        relabeled = labels.map_batches(
            lambda t: t.rename_columns(["nbr", "nbr_lab"]),
            batch_format="pyarrow")
        joined = hash_join(edges, relabeled, on="nbr")
        cand = joined.map_batches(
            lambda t: t.select(["doc", "nbr_lab"]).rename_columns(
                ["doc", "lab"]), batch_format="pyarrow")
        labels = cand.union(labels).groupby("doc").aggregate(
            Min("lab", alias_name="lab")).materialize()
        cur_sum = labels.sum("lab")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "rep"]),
        batch_format="pyarrow")
