"""Similarity search over the ``embeddings`` table.

- ``brute_force_topk``: the exactness baseline — numpy matmul per
  batch against a broadcast query matrix, per-batch top-k, tiny global
  merge.  Work per batch is one GEMV; the only global step is a sort
  of ≤ k×num_blocks candidate rows.
- ``lsh_topk``: the scale path — random-hyperplane signatures bucket
  the corpus; the query probes only its own bucket (and optional
  neighbor buckets by Hamming distance ≤ 1).  Recall < 1 by design;
  the test checks bucket containment + that results are a subset of
  brute-force order.
- ``cosine_neardup_pairs``: embedding near-dup detection via the same
  LSH buckets (groupby bucket → pairwise cosine inside the bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _batch_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.asarray(batch["embedding"].to_list(), dtype=np.float64)


def _table_matrix(batch: pa.Table) -> np.ndarray:
    """Zero-copy-ish (one flat buffer view, no per-row Python lists)
    list<float> column → (n, dim) float64 matrix."""
    col = batch.column("embedding")
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(len(batch), -1)


def brute_force_topk(emb_ds, query_vec: np.ndarray, k: int = 10):
    """Exact cosine top-k: per-batch candidates → global sort+limit."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    class _Scorer:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            norms = np.linalg.norm(m, axis=1)
            cos = (m @ self.q) / np.where(norms == 0, 1, norms)
            from cheque_ocr_project_ray.util import round_half_up
            cos = round_half_up(cos, 5)
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            top = np.lexsort((ids, -cos))[:k]  # cos desc, vec_id asc
            return pa.table({"vec_id": pa.array(ids[top]),
                             "cos": pa.array(cos[top], pa.float64())})

    from cheque_ocr_project_ray.util import map_pool
    cand = emb_ds.map_batches(_Scorer, batch_format="pyarrow",
                              concurrency=(1, map_pool()))
    return cand.sort(["cos", "vec_id"], descending=[True, False]).limit(k)


def knn_join(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
             k: int = 5):
    """Batched exact cosine top-k: EVERY query at once against the
    corpus — the broadcast-query-MATRIX pattern (one GEMM slice
    ``batch × Qᵀ`` per block, local top-k per query per block, tiny
    global re-rank).  Output: (query_id, vec_id, cos), k rows per
    query.  At corpus scale the per-block partials are
    k × |Q| × num_blocks rows — driver-bounded for broadcastable Q."""
    from cheque_ocr_project_ray.util import map_pool, round_half_up

    q = np.asarray(query_matrix, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    q = q / np.where(qn == 0, 1, qn)[:, None]
    qids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((qids, q))

    class _Scorer:
        def __init__(self):
            self.qids, self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            norms = np.linalg.norm(m, axis=1)
            mn = m / np.where(norms == 0, 1, norms)[:, None]
            cos = round_half_up(mn @ self.q.T, 5)      # (n, |Q|)
            ids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            out_q, out_v, out_c = [], [], []
            for col in range(cos.shape[1]):
                top = np.lexsort((ids, -cos[:, col]))[:k]
                out_q.append(np.full(len(top), self.qids[col]))
                out_v.append(ids[top])
                out_c.append(cos[top, col])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cos": pa.array(np.concatenate(out_c), pa.float64()),
            })

    cand = emb_ds.map_batches(_Scorer, batch_format="pyarrow",
                              concurrency=(1, map_pool()))
    # global re-rank: k best per query among the per-block candidates
    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(["query_id", "cos", "vec_id"],
                                  ascending=[True, False, True])
        return batch.groupby("query_id", sort=True).head(k) \
            .reset_index(drop=True)

    # candidates are tiny (k x |Q| x blocks): one final single-block pass
    return cand.repartition(1).map_batches(
        finish, batch_format="pandas", batch_size=None)


def range_search(emb_ds, query_ids: np.ndarray, query_matrix: np.ndarray,
                 threshold: float):
    """Radius (range) search: every (query, vector) pair with cosine ≥
    ``threshold``, self-pairs excluded.  Unlike top-k there is NO
    global step at all — one GEMM slice and a vectorized mask per
    block, so the output streams with the scan.  The 100-TB shape for
    'find everything similar to these probes'."""
    from cheque_ocr_project_ray.util import map_pool, round_half_up

    q = np.asarray(query_matrix, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    q = q / np.where(qn == 0, 1, qn)[:, None]
    qids = np.asarray(query_ids, dtype=np.int64)
    q_ref = ray.put((qids, q))

    class _Scorer:
        def __init__(self):
            self.qids, self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            norms = np.linalg.norm(m, axis=1)
            mn = m / np.where(norms == 0, 1, norms)[:, None]
            cos = round_half_up(mn @ self.q.T, 5)      # (n, |Q|)
            ids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            # threshold on the ROUNDED value — the same comparison the
            # SQL twin makes, so boundary pairs agree between engines
            hit = (cos >= threshold) & (ids[:, None] != self.qids[None, :])
            vi, qi = np.nonzero(hit)
            return pa.table({
                "query_id": pa.array(self.qids[qi], pa.int64()),
                "vec_id": pa.array(ids[vi], pa.int64()),
                "cos": pa.array(cos[vi, qi], pa.float64())})

    return emb_ds.map_batches(_Scorer, batch_format="pyarrow",
                              concurrency=(1, map_pool()))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return bits @ (1 << np.arange(planes.shape[0]))


def add_lsh_bucket(emb_ds, planes: np.ndarray):
    planes_ref = ray.put(planes)

    class _Bucketer:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            sig = lsh_signature(m, self.planes).astype("int64")
            return batch.append_column("bucket", pa.array(sig))

    from cheque_ocr_project_ray.util import map_pool
    return emb_ds.map_batches(_Bucketer, batch_format="pyarrow",
                              concurrency=(1, map_pool()))


def lsh_topk(emb_ds, query_vec: np.ndarray, k: int = 10,
             n_planes: int = 8, probe_hamming: int = 1):
    """Approximate top-k: score only vectors in the query's LSH bucket
    (plus Hamming≤probe neighbors)."""
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes)
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(lsh_signature(q[None, :], planes)[0])
    probe = {q_bucket}
    if probe_hamming >= 1:
        probe |= {q_bucket ^ (1 << i) for i in range(n_planes)}

    bucketed = add_lsh_bucket(emb_ds, planes)
    probe_list = pa.array(sorted(probe), pa.int64())

    def in_probe(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("bucket"), value_set=probe_list))

    candidates = bucketed.map_batches(in_probe, batch_format="pyarrow")
    return brute_force_topk(candidates, query_vec, k)


def normalized_view(emb_ds):
    """L2-normalized copy of the embedding column (squared L2 on unit
    vectors = 2 − 2·cos, so PQ-ADC distance ranks like cosine)."""

    def norm(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        n = np.linalg.norm(m, axis=1)
        mn = m / np.where(n == 0, 1, n)[:, None]
        flat = pa.array(mn.ravel(), pa.float64())
        offsets = pa.array(
            np.arange(0, (len(mn) + 1) * mn.shape[1], mn.shape[1],
                      dtype=np.int32))
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": pa.ListArray.from_arrays(offsets, flat)})

    return emb_ds.map_batches(norm, batch_format="pyarrow")


def pq_topk(emb_ds, query_vec: np.ndarray, k: int = 10,
            n_codes: int = 8, bounds: tuple = ((0, 32), (32, 64)),
            rounds: int = 2):
    """Approximate top-k via product-quantization ADC: per-subspace
    codebooks trained on the L2-normalized corpus (fixed-round Lloyd,
    the same streaming loop as k-means), the query expanded into one
    tiny distance LUT per subspace, and each batch scored as
    ``Σ_s lut_s[code_s(v)]`` — O(n_codes·d) GEMM per batch instead of
    the exact path's O(d) per corpus vector against the full query, and
    at a REAL deployment the codes are precomputed once so search is
    pure LUT adds.  Candidates take a per-batch local top-k before the
    tiny global sort."""
    from cheque_ocr_project_ray.util import map_pool
    from cheque_ocr_project_ray.vector.kmeans import (_assign,
                                                      centroid_rounds)

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    nview = normalized_view(emb_ds)
    # deterministic init: the n_codes smallest vec_ids (same rule as
    # k-means / PQ), not "whatever rows the scan yields first"
    probes = nview.filter(expr=f"vec_id < {n_codes}").to_pandas()
    init_full = np.asarray(probes.sort_values("vec_id")["embedding"]
                           .to_list(), dtype=np.float64)
    cents = [centroid_rounds(nview, init_full[:, lo:hi], rounds,
                             dim_lo=lo, dim_hi=hi)
             for lo, hi in bounds]
    luts = [((cent - q[lo:hi]) ** 2).sum(axis=1)
            for cent, (lo, hi) in zip(cents, bounds)]
    state_ref = ray.put((cents, luts))

    class _Adc:
        def __init__(self):
            self.cents, self.luts = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            adist = np.zeros(len(m), np.float64)
            for (lo, hi), cent, lut in zip(bounds, self.cents,
                                           self.luts):
                codes = _assign(m[:, lo:hi], cent)
                adist += lut[codes]
            top = np.argsort(adist, kind="stable")[:k]
            return pa.table({
                "vec_id": batch.column("vec_id").take(pa.array(top)),
                "adist": pa.array(adist[top])})

    return nview.map_batches(_Adc, batch_format="pyarrow",
                             concurrency=(1, map_pool())) \
        .sort(["adist", "vec_id"]).limit(k)


def kmeans_centroids(sample: np.ndarray, n_centroids: int = 16,
                     iters: int = 5, seed: int = 23) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample.

    At corpus scale the sample is a tiny reservoir (e.g. 100k vectors)
    — centroid building never touches the full table.
    """
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        d = sample @ cents.T
        assign = d.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(emb_ds, query_vec: np.ndarray, k: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             sample_size: int = 2048):
    """IVF approximate top-k — the coarse-quantizer scale path.

    1. centroids from a driver-side sample (broadcast via ray.put)
    2. per-batch cluster assignment (one GEMM) + probe-cluster filter
    3. exact cosine over the probed subset only (~n_probe/n_centroids
       of the corpus scored instead of all of it)
    """
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)

    sample = _batch_matrix(
        emb_ds.limit(sample_size).to_pandas())
    norms = np.linalg.norm(sample, axis=1)
    sample = sample / np.where(norms == 0, 1, norms)[:, None]
    cents = kmeans_centroids(sample, n_centroids)
    probe = np.sort(np.argsort(cents @ q)[::-1][:n_probe])  # frozen
    cents_ref = ray.put(cents)

    class _Prober:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            self.probe = probe  # captured once, not rebuilt per batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            assign = (m @ self.cents.T).argmax(axis=1)
            mask = np.isin(assign, self.probe)
            return batch.filter(pa.array(mask))

    from cheque_ocr_project_ray.util import map_pool
    candidates = emb_ds.map_batches(_Prober, batch_format="pyarrow",
                                    concurrency=(1, map_pool()))
    return brute_force_topk(candidates, query_vec, k)


def exact_neardup_pairs(emb_ds, ids: np.ndarray, matrix: np.ndarray,
                        threshold: float = 0.4):
    """EXACT embedding-cosine near-dup pairs (``vec_a < vec_b``).

    Block-vs-broadcast design: the caller supplies the full corpus
    matrix (one small-column read), which is L2-normalized once and
    broadcast via ``ray.put``; every batch then computes one GEMM slice
    ``batch × corpusᵀ`` — O(N²/P) distributed work, zero shuffle, and
    the output is only the qualifying pairs.

    Scale boundary (documented, by design): the broadcast side must fit
    a worker heap (~10M × 64 float32 ≈ 2.5 GB).  Beyond that, use the
    LSH-bucketed :func:`cosine_neardup_pairs` (recall < 1 at low
    thresholds) or split the corpus into C chunks and join the C(C+1)/2
    chunk pairs.
    """
    return _pairs_vs_broadcast(emb_ds, ids, matrix, threshold) \
        .sort(["vec_a", "vec_b"])


def _gemm_pairs_kernel(batch: pa.Table, mat: np.ndarray,
                       ids: np.ndarray, threshold: float) -> pa.Table:
    """batch × broadcastᵀ GEMM slice → qualifying (vec_a < vec_b, cos)
    pairs whose *b* side is in the broadcast set."""
    from cheque_ocr_project_ray.util import round_half_up

    m = _table_matrix(batch)
    bn = np.linalg.norm(m, axis=1)
    mn = m / np.where(bn == 0, 1, bn)[:, None]
    cos = mn @ mat.T
    bids = batch.column("vec_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ii, jj = np.where(cos >= threshold)
    keep = bids[ii] < ids[jj]  # each pair emitted once
    ii, jj = ii[keep], jj[keep]
    return pa.table({
        "vec_a": pa.array(bids[ii]),
        "vec_b": pa.array(ids[jj]),
        "cos": pa.array(round_half_up(cos[ii, jj], 5)),
    })


def _pairs_vs_broadcast(emb_ds, ids: np.ndarray, matrix: np.ndarray,
                        threshold: float, use_tasks: bool = False):
    """One GEMM slice ``batch × broadcastᵀ`` per block; emits the
    qualifying (vec_a < vec_b, cos) pairs whose *b* side is in the
    broadcast set.  Shared by the whole-corpus and chunked variants.

    ``use_tasks=True`` runs the stage as stateless Ray tasks instead
    of an actor pool: the chunked variant unions C of these stages, and
    C actor pools each reserving a minimum actor would deadlock a small
    cluster (min-actors sum past the CPU count).  Tasks reserve nothing
    up front, and ``ray.get`` of the broadcast float64 matrix is a
    zero-copy plasma read, so per-task state costs no heap copy."""
    from cheque_ocr_project_ray.util import map_pool

    mat = np.asarray(matrix, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    mat = mat / np.where(norms == 0, 1, norms)[:, None]
    ids = np.asarray(ids, dtype=np.int64)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)

    if use_tasks:
        def _pairs_task(batch: pa.Table) -> pa.Table:
            return _gemm_pairs_kernel(batch, ray.get(mat_ref),
                                      ray.get(ids_ref), threshold)

        return emb_ds.map_batches(_pairs_task, batch_format="pyarrow")

    class _Pairs:
        def __init__(self):
            self.mat = ray.get(mat_ref)
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return _gemm_pairs_kernel(batch, self.mat, self.ids,
                                      threshold)

    return emb_ds.map_batches(_Pairs, batch_format="pyarrow",
                              concurrency=(1, map_pool()))


@ray.remote
def _load_norm_chunk(parquet_path: str, lo_j: int, hi_j: int):
    """Worker-side chunk ingest for the blocked near-dup path: one
    row-group-pruned filtered read of a ``vec_id`` range, L2-normalized
    float64.  Runs as a Ray TASK so the C chunk reads parallelize
    across workers and the embedding column never transits the driver
    NIC (driver-serial ingest was the 100-TB bottleneck here)."""
    import pyarrow.parquet as pq

    chunk = pq.read_table(
        parquet_path, columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", lo_j), ("vec_id", "<", hi_j)])
    cids = chunk.column("vec_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    if chunk.num_rows == 0:
        return cids, None
    mat = np.asarray(_table_matrix(chunk), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    return cids, mat / np.where(norms == 0, 1, norms)[:, None]


def _pairs_vs_chunk_ref(emb_ds, chunk_ref, threshold: float):
    """GEMM-pairs stage against a worker-loaded (ids, normalized
    matrix) ObjectRef — stateless tasks (see ``_pairs_vs_broadcast``
    for why the chunked union cannot use actor pools); ``ray.get`` of
    the float64 matrix is a zero-copy plasma read per task."""
    def _pairs_task(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(chunk_ref)
        if cmat is None:
            return _EMPTY_PAIRS
        return _gemm_pairs_kernel(batch, cmat, cids, threshold)

    return emb_ds.map_batches(_pairs_task, batch_format="pyarrow")


def exact_neardup_pairs_blocked(parquet_path: str,
                                threshold: float = 0.4,
                                chunk_rows: int = 1_000_000):
    """Chunked C(C+1)/2 exact near-dup — bit-equal output to
    :func:`exact_neardup_pairs` with NO full-corpus broadcast.

    The corpus is range-chunked on ``vec_id`` using parquet row-group
    statistics (never a full column scan).  For each chunk *j* a Ray
    TASK reads and normalizes only that chunk's (ids, matrix)
    (row-group-pruned filtered read, ≤ ``chunk_rows`` rows) — the
    driver only launches the task and holds the ObjectRef, so chunk
    ingest parallelizes across workers and never streams through the
    driver.  One predicate-pushdown scan of the rows with
    ``vec_id < hi_j`` computes the GEMM slice against chunk *j*.  A
    pair (a < b) is emitted exactly once — in the iteration owning
    *b*'s chunk — so the union over chunks is the complete exact pair
    set.  Peak per-task memory is one chunk (``chunk_rows × dim``
    floats) regardless of corpus size; total GEMM work is the same
    O(N²/P).
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    import ray.data

    empty = pa.table({"vec_a": pa.array([], pa.int64()),
                      "vec_b": pa.array([], pa.int64()),
                      "cos": pa.array([], pa.float64())})
    pf = pq.ParquetFile(parquet_path)
    n = pf.metadata.num_rows
    if n == 0:
        return ray.data.from_arrow(empty)
    lo, hi = None, None
    idx = pf.schema_arrow.get_field_index("vec_id")
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = hi = None
            break
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if lo is None:  # no stats: one bounded id-column read
        t = pads.dataset(parquet_path).to_table(columns=["vec_id"])
        if t.num_rows == 0:
            return ray.data.from_arrow(empty)
        ids = t.column("vec_id")
        lo, hi = pc.min(ids).as_py(), pc.max(ids).as_py()

    n_chunks = max(1, -(-n // chunk_rows))
    edges = np.unique(np.linspace(lo, hi + 1, n_chunks + 1)
                      .astype(np.int64))
    branches = []
    for j in range(len(edges) - 1):
        lo_j, hi_j = int(edges[j]), int(edges[j + 1])
        chunk_ref = _load_norm_chunk.remote(parquet_path, lo_j, hi_j)
        scan = ray.data.read_parquet(
            parquet_path, columns=["vec_id", "embedding"],
            filter=pads.field("vec_id") < hi_j)
        branches.append(_pairs_vs_chunk_ref(scan, chunk_ref, threshold))
    out = branches[0]
    for b in branches[1:]:
        out = out.union(b)
    return out.sort(["vec_a", "vec_b"])


def cosine_neardup_pairs(emb_ds, n_planes: int = 8,
                         threshold: float = 0.95,
                         dim: int | None = None,
                         bucket_cap: int = 4096):
    """Embedding-cosine near-dup pairs via LSH bucket blocking — the
    high-threshold scale path (recall < 1 by design: only same-bucket
    pairs are scored).

    Returns a DATASET of (vec_a, vec_b, cos): at corpus scale the pair
    set is unbounded, so it must stream to the consumer (write/agg),
    never materialize on the driver.  Pairs are unique by construction
    (each vector lives in exactly one bucket), so no dedup pass is
    needed.  Partitioning assumption: buckets are 2^n_planes-way, so
    raise ``n_planes`` as the corpus grows — and a bucket that still
    exceeds ``bucket_cap`` rows (hot/degenerate: near-identical
    embeddings, exactly the dedup case) falls back to STAR comparison
    (min-id row vs rest) instead of the dense within-bucket GEMM —
    linear work/memory instead of O(bucket²), same cap strategy as the
    MinHash/SimHash paths (``text/dedup.bucket_pairs``).  Duplicate
    clusters stay connected through the hub; sparse near-misses in a
    capped bucket may be missed (recall is already < 1 here).

    Pass ``dim`` when known (the caller usually has it from the table
    schema/metadata) — otherwise one probe row is read to learn it.
    """

    from cheque_ocr_project_ray.util import round_half_up

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _EMPTY_PAIRS
        m = _table_matrix(group)
        norms = np.linalg.norm(m, axis=1)
        mn = m / np.where(norms == 0, 1, norms)[:, None]
        ids = group.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(ids) > bucket_cap:
            hub = int(np.argmin(ids))  # deterministic center
            cos_row = mn @ mn[hub]
            jj = np.where(cos_row >= threshold)[0]
            jj = jj[jj != hub]
            return pa.table({
                "vec_a": pa.array(np.full(len(jj), ids[hub], np.int64),
                                  pa.int64()),
                "vec_b": pa.array(ids[jj], pa.int64()),
                "cos": pa.array(round_half_up(cos_row[jj], 5),
                                pa.float64()),
            })
        cos = mn @ mn.T
        ii, jj = np.where(np.triu(cos, 1) >= threshold)
        return pa.table({
            "vec_a": pa.array(np.minimum(ids[ii], ids[jj]), pa.int64()),
            "vec_b": pa.array(np.maximum(ids[ii], ids[jj]), pa.int64()),
            "cos": pa.array(round_half_up(cos[ii, jj], 5), pa.float64()),
        })

    if dim is None:
        dim = len(emb_ds.take(1)[0]["embedding"])
    planes = hyperplanes(dim, n_planes)
    bucketed = add_lsh_bucket(emb_ds, planes)
    return bucketed.groupby("bucket").map_groups(
        pairs, batch_format="pyarrow")


_EMPTY_PAIRS = pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
