"""Greedy fixed-budget sequence packing — a distributed global prefix
sum.

Training pipelines pack documents into fixed token-budget sequences;
the assignment ``pack_id = (tokens of all docs before me) // budget``
is a GLOBAL running total in doc_id order, which no per-batch map can
compute alone.  The scalable two-phase shape:

1. Reduce each doc to (doc_id, n_tokens, range_bucket) — one
   streaming tokenize pass; the per-doc table is metadata-sized
   (~16 B/doc) and is the only thing materialized.
2. Per-bucket token sums (bounded combiner) → exclusive bucket
   offsets broadcast to phase 3.
3. ``groupby(bucket).map_groups``: sort the bucket by doc_id, local
   exclusive cumsum + the bucket's offset — each group touches only
   its own slice, so the prefix sum never serializes through one
   worker.

Range buckets (not hash) keep doc_id order contiguous per bucket,
which is what makes the offset + local-cumsum identity hold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from cheque_ocr_project_ray.text.analysis import _token_lists
from cheque_ocr_project_ray.util import collect_table, final_merge_sums


def pack_documents(docs_ds, budget: int, n_buckets: int = 64,
                   np_: int = 0):
    """(doc_id, n_tokens, pack_id) with pack_id = exclusive cumulative
    token count (in doc_id order) // ``budget``."""
    def per_doc(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(_token_lists(batch.column("text"))) \
            .cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})

    tok = docs_ds.map_batches(per_doc,
                              batch_format="pyarrow").materialize()
    if tok.count() == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "pack_id": pa.array([], pa.int64())}))
    max_id = int(tok.max("doc_id"))

    def bucketed(batch: pa.Table) -> pa.Table:
        b = pc.divide(pc.multiply(batch.column("doc_id"),
                                  pa.scalar(n_buckets, pa.int64())),
                      pa.scalar(max_id + 1, pa.int64()))
        return batch.append_column("bucket", b)

    tok_b = tok.map_batches(bucketed, batch_format="pyarrow")

    def sum_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["bucket", "n_tokens"]).group_by("bucket") \
            .aggregate([("n_tokens", "sum")])
        return g.rename_columns(["bucket", "n_tokens"])

    bs = collect_table(final_merge_sums(
        tok_b.map_batches(sum_partial, batch_format="pyarrow"),
        ["bucket"], ["n_tokens"], np_=np_).materialize())
    bs = bs.sort_by("bucket")
    buckets = bs.column("bucket").to_numpy()
    sums = bs.column("n_tokens").to_numpy()
    excl = np.concatenate([[0], np.cumsum(sums)[:-1]])
    offsets = {int(b): int(o) for b, o in zip(buckets, excl)}

    def pack_group(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        n = g["n_tokens"].to_numpy()
        cum_excl = offsets.get(int(g["bucket"].iloc[0]), 0) \
            + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "pack_id": (cum_excl // budget).astype(np.int64),
        })

    return tok_b.groupby("bucket", num_partitions=np_ or None) \
        .map_groups(pack_group, batch_format="pandas")
