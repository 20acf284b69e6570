"""Distributed Lloyd k-means over an embedding column.

The iterative-ML operator shape: each round is ONE streaming pass —
centroids are broadcast (``ray.put``), every batch reduces to k
partial rows (count + per-dimension sum via one GEMM argmin +
``np.add.at``), and the k×(d+1) partial table merges through
``final_merge_sums`` (driver Arrow group_by when bounded, distributed
groupby beyond).  Nothing but the k centroids ever leaves the
cluster; the corpus is never materialized.

Determinism: init is the k smallest vec_ids, assignment ties break to
the lowest cluster id (``np.argmin`` first-hit — same rule as the SQL
twin's ``ORDER BY dist, cid LIMIT 1``), empty clusters keep their
previous centroid.  All arithmetic is float64, so the fixed-round SQL
re-derivation in ``vector/queries.py`` agrees to well under the
assignment margins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from cheque_ocr_project_ray.util import (collect_table, final_merge_sums,
                                         map_pool)
from cheque_ocr_project_ray.vector.ann import _table_matrix


def _assign(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_c ||v - c||² per row — via the reduced form
    (-2 v·c + ||c||²), one GEMM; ties fall to the lowest cluster id."""
    score = -2.0 * (m @ cent.T) + (cent * cent).sum(axis=1)
    return np.argmin(score, axis=1).astype(np.int64)


def centroid_rounds(emb_ds, init_centroids: np.ndarray, rounds: int = 2,
                    np_: int = 0, dim_lo: int = 0,
                    dim_hi: int | None = None) -> np.ndarray:
    """``rounds - 1`` centroid-update passes; returns the FINAL
    centroid matrix (the caller does the last assignment).  ``dim_lo``
    / ``dim_hi`` restrict to a dimension slice — the product-quantizer
    trains one codebook per subspace through this same loop."""
    cent = np.asarray(init_centroids, dtype=np.float64)
    k, d = cent.shape
    sum_cols = [f"s{j}" for j in range(d)]

    for _ in range(rounds - 1):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            m = _table_matrix(batch)[:, dim_lo:dim_hi]
            a = _assign(m, c)
            n = np.bincount(a, minlength=k)
            s = np.zeros((k, d))
            np.add.at(s, a, m)
            cols = {"cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(n.astype(np.int64))}
            for j, name in enumerate(sum_cols):
                cols[name] = pa.array(s[:, j])
            return pa.table(cols)

        st = collect_table(final_merge_sums(
            emb_ds.map_batches(partial, batch_format="pyarrow"),
            ["cluster"], ["n"] + sum_cols, np_=np_).materialize())
        if st is None:  # empty input: nothing to update
            break
        st = st.sort_by("cluster")
        n = st.column("n").to_numpy().astype(np.float64)
        sums = np.column_stack([st.column(c).to_numpy()
                                for c in sum_cols])
        nz = n > 0
        new_cent = cent.copy()
        new_cent[nz] = sums[nz] / n[nz, None]
        cent = new_cent

    return cent


def kmeans_rounds(emb_ds, init_centroids: np.ndarray, rounds: int = 2,
                  np_: int = 0):
    """``rounds`` assignment passes with a centroid update between
    each; returns the final (vec_id, cluster) Dataset."""
    cent = centroid_rounds(emb_ds, init_centroids, rounds, np_)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = _assign(_table_matrix(batch), self.cent)
            return pa.table({"vec_id": batch.column("vec_id"),
                             "cluster": pa.array(a)})

    return emb_ds.map_batches(Assign, batch_format="pyarrow",
                              concurrency=(1, map_pool()))


def pq_encode(emb_ds, inits: list[np.ndarray],
              bounds: list[tuple[int, int]], rounds: int = 2,
              np_: int = 0):
    """Product quantization: one fixed-round Lloyd codebook per
    dimension subspace (trained through :func:`centroid_rounds`, so
    each codebook costs the same streaming passes as k-means), then
    ONE encode pass emitting the per-subspace code and the exact
    reconstruction MSE.

    Float-parity contract (mirrors the SQL twin): per-subspace squared
    errors accumulate SEQUENTIALLY over dimensions (DuckDB ``list_sum``
    order), subspace partials add left-to-right, and only the final
    MSE is rounded (10 dp).  Codes are exact ints.  Assignment ties
    break to the lowest code id, same rule as k-means.
    """
    cents = [centroid_rounds(emb_ds, init, rounds, np_, lo, hi)
             for init, (lo, hi) in zip(inits, bounds)]
    cents_ref = ray.put(cents)
    d_total = sum(hi - lo for lo, hi in bounds)

    class Encode:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from cheque_ocr_project_ray.util import round_half_up
            m = _table_matrix(batch)
            total = np.zeros(len(m), np.float64)
            cols = {"vec_id": batch.column("vec_id")}
            for s, ((lo, hi), cent) in enumerate(zip(bounds,
                                                     self.cents)):
                sub = m[:, lo:hi]
                a = _assign(sub, cent)
                diff = sub - cent[a]
                sq = diff * diff
                acc = np.zeros(len(m), np.float64)
                for j in range(hi - lo):  # sequential, like list_sum
                    acc += sq[:, j]
                total = total + acc       # left-to-right over subspaces
                cols[f"code{s}"] = pa.array(a)
            cols["mse"] = pa.array(
                round_half_up(total / d_total, 10), pa.float64())
            return pa.table(cols)

    return emb_ds.map_batches(Encode, batch_format="pyarrow",
                              concurrency=(1, map_pool()))
