"""Deduplication operators: exact, prefix, MinHash+LSH, SimHash,
n-gram Jaccard — the standard large-scale training-data dedup family,
each expressed in Ray Data's shuffle vocabulary:

- exact / prefix: content-hash column in ``map_batches`` →
  ``groupby(hash)`` keep-first (one shuffle over (hash, doc_id) pairs,
  never over full texts)
- MinHash LSH: shingle→minhash signature per batch → explode to
  (band_id, band_hash, doc_id) rows → ``groupby`` over bands →
  candidate pairs (bucket-capped) → exact-Jaccard verification as a
  DISTRIBUTED join against per-doc shingle blobs — no driver
  materialization, no point re-reads
- SimHash: 64-bit signature per doc; duplicates = equal signatures

Degenerate buckets: a bucket with thousands of identical docs would
go O(bucket²) in the pair step.  Buckets above ``bucket_cap`` are
treated as one duplicate CLUSTER and emit star pairs (min-id × each
other member) — linear, and transitively equivalent for
keep-one-per-cluster dedup; the cap trades exhaustive pair listing
inside a degenerate bucket for bounded work (documented assumption).

All hashes are blake2b/crc-style and seeded — deterministic across
processes and cluster sizes (Python's builtin ``hash`` is
intentionally NOT used).

Shuffle note (measured): these groupby/map_groups run over MILLIONS of
tiny groups (one per LSH band bucket).  Ray's sort-based shuffle
handles that shape well; the hash-shuffle strategy that speeds up the
low-cardinality relational aggregates (util.tune_shuffle) degrades it
by >10x (aggregator actors become the bottleneck for high-cardinality
``map_groups``) — so this module deliberately stays on the default
strategy.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterable

import numpy as np
import pandas as pd

from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _stable64(token: str) -> int:
    """Stable 64-bit word hash = md5 bytes 8..16 little-endian —
    bit-for-bit DuckDB's ``md5_number_lower``, so the SimHash
    signature is re-derivable in pure SQL by the driver's oracle
    (``text/queries.py`` builds the 64 per-bit majority aggregates)."""
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[8:16], "little")


def shingles(text: str, k: int = 3) -> set[int]:
    """crc32 hashes of word k-grams (rolling over the token stream)."""
    ws = text.split()
    if len(ws) < k:
        return {zlib.crc32(" ".join(ws).encode("utf-8"))} if ws else set()
    return {zlib.crc32(" ".join(ws[i:i + k]).encode("utf-8"))
            for i in range(len(ws) - k + 1)}


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    # a < 2^30 and 32-bit shingle hashes keep a*h + b inside int64 —
    # exact arithmetic, no object-dtype fallback.
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 30, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(sh: Iterable[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = np.fromiter(sh, dtype=np.int64)
    if h.size == 0:
        return np.full(a.shape, _MERSENNE, dtype=np.int64)
    # (a*h + b) mod p for each permutation — one vectorized outer op
    vals = (np.multiply.outer(a, h) + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.int64)


def band_hashes(sig: np.ndarray, bands: int) -> list[int]:
    """Signed-int64 band bucket ids (int keys shuffle/sort cheaper
    than the equivalent hex strings — same bucket identity)."""
    r = len(sig) // bands
    out = []
    for i in range(bands):
        chunk = sig[i * r:(i + 1) * r].tobytes()
        v = int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(),
                           "big")
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (signed int64 for Arrow)."""
    words = text.split()
    if not words:
        return 0
    # hashes are full-range uint64 — keep everything unsigned in numpy
    hs = np.fromiter((_stable64(w) for w in words), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
    acc = np.where(bits == 1, 1, -1).sum(axis=0)
    out = int(np.bitwise_or.reduce(
        np.where(acc > 0, np.uint64(1) << shifts, np.uint64(0))))
    return out - (1 << 64) if out >= (1 << 63) else out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# --- Ray Data compositions ------------------------------------------

def exact_dedup(docs_ds):
    """Exact dedup by full-text hash: keep min doc_id per text.

    Output: (text_hash, doc_id, n_dups) — one row per distinct text.
    """
    import pyarrow as pa

    from cheque_ocr_project_ray.text.analysis import text_md5

    def hash_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": pa.array(
                text_md5(batch.column("text").to_pylist()), pa.string()),
            "doc_id": batch.column("doc_id"),
        })

    hashed = docs_ds.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_dups"))


def prefix_dedup(docs_ds, prefix_len: int = 40):
    """Near-dup by text prefix: cheap blocking key demonstration."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def key_batch(batch: pa.Table) -> pa.Table:
        return pa.table({
            "prefix": pc.utf8_slice_codeunits(batch.column("text"),
                                              0, prefix_len),
            "doc_id": batch.column("doc_id"),
        })

    keyed = docs_ds.map_batches(key_batch, batch_format="pyarrow")
    return keyed.groupby("prefix").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_dups"))


def minhash_bands(docs_ds, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 3):
    """Stage 1-2 of MinHash LSH: signatures → exploded band rows."""
    a, b = minhash_params(num_perm)

    import pyarrow as pa

    def to_bands(batch: pa.Table) -> pa.Table:
        rows_band, rows_hash, rows_doc = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = minhash_signature(shingles(text, shingle_k), a, b)
            for band_id, bh in enumerate(band_hashes(sig, bands)):
                rows_band.append(band_id)
                rows_hash.append(bh)
                rows_doc.append(doc_id)
        return pa.table({
            "band_id": pa.array(rows_band, pa.int64()),
            "band_hash": pa.array(rows_hash, pa.int64()),
            "doc_id": pa.array(rows_doc),
        })

    return docs_ds.map_batches(to_bands, batch_format="pyarrow")


def bucket_pairs(ids, bucket_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """All pairs for a normal bucket; star pairs (min × rest) for a
    degenerate one — linear instead of O(bucket²).  Vectorized: the
    python double loop took ~35 s for the loose k=2 blocking at sf0.1
    (capped buckets still emit 32k pairs each)."""
    ids = np.asarray(ids)
    if len(ids) > bucket_cap:
        return np.broadcast_to(ids[0], len(ids) - 1), ids[1:]
    ii, jj = np.triu_indices(len(ids), k=1)
    return ids[ii], ids[jj]


def _pair_typed_empty(out_col: str):
    import pyarrow as pa
    return pa.table({"doc_a": pa.array([], pa.int64()),
                     "doc_b": pa.array([], pa.int64()),
                     out_col: pa.array([], pa.int64())})


def _dedup_pair_table(t, agg: str, agg_col: str, out_col: str):
    """Local core: one row per (doc_a, doc_b) via vectorized Arrow
    group_by.  ``agg``: "count_all" | "min"; ``agg_col``: input column
    for min ("" for count_all); ``out_col``: output name."""
    spec = [([], "count_all")] if agg == "count_all" \
        else [(agg_col, "min")]
    g = t.group_by(["doc_a", "doc_b"]).aggregate(spec)
    agg_name = "count_all" if agg == "count_all" else f"{agg_col}_min"
    g = g.select(["doc_a", "doc_b", agg_name]) \
        .rename_columns(["doc_a", "doc_b", out_col])
    return g if g.num_rows else _pair_typed_empty(out_col)


def _dedup_pair_rows(raw_ds, agg: str, agg_col: str, out_col: str,
                     broadcast_limit: int = 2_000_000):
    """Dataset form of :func:`_dedup_pair_table`.

    Ray's groupby/aggregate dispatches per group, and candidate-pair
    keys are almost all singletons — measured 28-33 s for 162k groups
    at sf0.1 under BOTH shuffle strategies, vs 0.07 s for the same
    dedup as one vectorized Arrow ``group_by`` on the driver.  So:
    when the raw pair stream is bounded (it is whenever the verify
    stage will broadcast anyway), collect + Arrow-dedup on the driver;
    beyond the bound fall back to the distributed groupby (correct,
    unbounded, slower per group).
    """
    import ray.data

    from cheque_ocr_project_ray.util import collect_table

    raw = raw_ds.materialize()
    if raw.count() <= broadcast_limit:
        t = collect_table(raw)
        if t is None:
            return ray.data.from_arrow(_pair_typed_empty(out_col))
        return ray.data.from_arrow(
            _dedup_pair_table(t, agg, agg_col, out_col))
    if agg == "count_all":
        return raw.groupby(["doc_a", "doc_b"]).aggregate(
            Count(alias_name=out_col))
    return raw.groupby(["doc_a", "doc_b"]).aggregate(
        Min(agg_col, alias_name=out_col))


def _pairs_grouped(key_arrays: list, doc: np.ndarray, bucket_cap: int):
    """Vectorized candidate pairs from collected bucket rows: lexsort
    by the key tuple, slice bucket boundaries, emit pairs per collided
    bucket — no per-group dataframe dispatch."""
    import pyarrow as pa

    order = np.lexsort(tuple([doc] + key_arrays[::-1]))
    keys = [k[order] for k in key_arrays]
    doc = doc[order]
    diff = np.zeros(len(doc) - 1, dtype=bool) if len(doc) else \
        np.zeros(0, dtype=bool)
    for k in keys:
        diff |= np.diff(k) != 0
    boundary = np.flatnonzero(diff)
    starts = np.concatenate(([0], boundary + 1))
    ends = np.concatenate((boundary + 1, [len(doc)]))
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        ids = np.unique(doc[s:e])
        if len(ids) < 2:
            continue
        a, b = bucket_pairs(ids, bucket_cap)
        out_a.append(a)
        out_b.append(b)
    if not out_a:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    return pa.table({"doc_a": pa.array(np.concatenate(out_a)),
                     "doc_b": pa.array(np.concatenate(out_b))})


def _pairs_from_banded_table(t, bucket_cap: int):
    return _pairs_grouped(
        [t.column("band_id").to_numpy(), t.column("band_hash").to_numpy()],
        t.column("doc_id").to_numpy(), bucket_cap)


def minhash_candidates(docs_ds, num_perm: int = 64, bands: int = 16,
                       shingle_k: int = 3, bucket_cap: int = 256,
                       banded_bound: int = 5_000_000):
    """Candidate duplicate pairs from LSH buckets (doc_a < doc_b).

    Adaptive like the pair dedup: the banded stream is ``bands`` rows
    per doc; when it is within ``banded_bound`` the bucket grouping is
    one driver-side lexsort + vectorized slice (Ray's map_groups costs
    ~50 µs per group × one group per distinct band bucket — the
    dominant cost of the whole dedup at sf0.1), else the distributed
    groupby/map_groups path runs (the only shape that scales past
    driver memory; same pair semantics, same caps)."""
    import pyarrow as pa
    import ray
    import ray.data

    from cheque_ocr_project_ray.util import collect_table

    banded = minhash_bands(docs_ds, num_perm, bands, shingle_k) \
        .materialize()
    if banded.count() <= banded_bound:
        t = collect_table(banded)
        if t is None:
            return ray.data.from_arrow(_pair_typed_empty("n_bands"))
        raw = _pairs_from_banded_table(t, bucket_cap)
        # the raw pair table is already local: dedup it here, don't
        # round-trip it through the object store
        return ray.data.from_arrow(
            _dedup_pair_table(raw, "count_all", "", "n_bands"))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        empty = group["doc_id"].iloc[:0]  # typed (never schemaless) empties
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": empty, "doc_b": empty.copy()})
        out_a, out_b = bucket_pairs(ids, bucket_cap)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas")
    # same pair can surface from several bands — keep one row per pair
    return _dedup_pair_rows(cand, "count_all", "", "n_bands")


def shingle_blobs(docs_ds, shingle_k: int = 3):
    """(doc_id, shingle_blob) — the sorted shingle-hash set serialized
    to one binary cell per doc (int64 little-endian).  Binary cells
    survive distributed joins (list columns don't, in Arrow's hash
    join) and decode zero-copy with ``np.frombuffer``."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        blobs = [
            np.fromiter(sorted(shingles(t, shingle_k)),
                        dtype=np.int64).tobytes()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "shingle_blob": pa.array(blobs, pa.binary())})

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def _verify_jaccard(blob_a, blob_b) -> np.ndarray:
    """Exact Jaccard per pair from serialized shingle blobs."""
    jac = np.empty(len(blob_a), dtype=np.float64)
    for i, (ba, bb) in enumerate(zip(blob_a, blob_b)):
        sa = np.frombuffer(ba, dtype=np.int64)
        sb = np.frombuffer(bb, dtype=np.int64)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        jac[i] = inter / union if union else 1.0
    from cheque_ocr_project_ray.util import round_half_up
    return round_half_up(jac, 4)  # DuckDB round() semantics (oracle)


def minhash_dedup_pairs(docs_ds, num_perm: int = 64,
                        bands: int = 16, shingle_k: int = 3,
                        threshold: float = 0.6, bucket_cap: int = 256,
                        broadcast_limit: int = 2_000_000,
                        broadcast_doc_limit: int = 250_000):
    """Full MinHash LSH dedup: candidates + exact-Jaccard verification.

    Verification strategy is ADAPTIVE, picked by measured candidate
    size (the same small-side/large-side rule the join module uses):

    - ``<= broadcast_limit`` pairs AND ``<= broadcast_doc_limit``
      distinct candidate docs: candidate blobs are filtered
      DISTRIBUTED (``is_in`` over the streamed blob pass) and only the
      bounded candidate set reaches the driver for one vectorized
      verify — two orders of magnitude cheaper than a shuffle join at
      this size (measured: 5 s vs 16 s at sf0.1).  The DOC limit is
      what actually bounds driver memory (the collected payload is
      one shingle blob per distinct doc, ~250k × 8 KB ≈ 2 GB worst
      case); the pair limit alone would not.
    - otherwise (high-dup-rate corpus at scale): a fully distributed
      double hash-join against the per-doc shingle blobs — nothing
      driver-side, unbounded pair counts.

    Either way the corpus is read twice (bands pass + blob pass), both
    streaming; the round-1 unbounded ``to_pandas()`` + per-id point
    re-reads are gone.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    cand = minhash_candidates(docs_ds, num_perm, bands, shingle_k,
                              bucket_cap).materialize()  # small by
    # construction: bucket cap bounds pairs linearly in corpus size
    n_cand = cand.count()

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if n_cand == 0:
        return ray.data.from_arrow(empty)

    from cheque_ocr_project_ray.util import collect_table

    ids = None
    if n_cand <= broadcast_limit:
        cand_t = collect_table(cand)  # non-None: n_cand > 0
        ids = pa.compute.unique(pa.concat_arrays([
            cand_t.column("doc_a").combine_chunks(),
            cand_t.column("doc_b").combine_chunks()]))
        if len(ids) > broadcast_doc_limit:
            ids = None  # too many blobs for the driver → join path

    if ids is not None:

        def only_candidates(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("doc_id"), value_set=ids))

        # filter to candidate docs BEFORE shingling: the second corpus
        # pass then re-shingles only the (bounded) candidate set, not
        # every doc — at corpus scale the blob compute is proportional
        # to dups, not corpus size
        blobs = collect_table(
            shingle_blobs(
                docs_ds.map_batches(only_candidates,
                                    batch_format="pyarrow"),
                shingle_k).materialize())
        blob_by_id = dict(zip(blobs.column("doc_id").to_pylist(),
                              blobs.column("shingle_blob").to_pylist()))
        # verification is DISTRIBUTED even on this path: the bounded
        # blob dict broadcasts once (ray.put) and the candidate pairs
        # fan out over an actor pool — the round-2 driver-side python
        # loop was single-threaded and took 38 s on the loose k=2
        # blocking at sf0.1 (vs ~3 s distributed)
        blob_ref = ray.put(blob_by_id)

        class _Verify:
            def __init__(self):
                self.blobs = ray.get(blob_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                a = batch.column("doc_a").to_pylist()
                b = batch.column("doc_b").to_pylist()
                jac = _verify_jaccard([self.blobs[x] for x in a],
                                      [self.blobs[y] for y in b])
                keep = jac >= threshold
                return pa.table({
                    "doc_a": pa.array(np.asarray(a)[keep]),
                    "doc_b": pa.array(np.asarray(b)[keep]),
                    "jaccard": pa.array(jac[keep]),
                })

        from cheque_ocr_project_ray.util import map_pool
        verified = ray.data.from_arrow(cand_t.select(["doc_a", "doc_b"])) \
            .map_batches(_Verify, batch_format="pyarrow",
                         batch_size=4096,
                         concurrency=(1, map_pool())).materialize()
        if verified.count() == 0:
            return ray.data.from_arrow(empty)
        return verified.sort(["doc_a", "doc_b"])

    from cheque_ocr_project_ray.relational.joins import hash_join

    sh = shingle_blobs(docs_ds, shingle_k)  # join path: all docs' blobs

    def rename(side: str):
        def fn(batch):
            return batch.rename_columns([f"doc_{side}", f"blob_{side}"])
        return fn

    j = hash_join(cand, sh.map_batches(rename("a"), batch_format="pyarrow"),
                  on="doc_a")
    j = hash_join(j, sh.map_batches(rename("b"), batch_format="pyarrow"),
                  on="doc_b")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = _verify_jaccard(list(batch["blob_a"]), list(batch["blob_b"]))
        out = pd.DataFrame({"doc_a": batch["doc_a"],
                            "doc_b": batch["doc_b"],
                            "jaccard": jac})
        return out[out["jaccard"] >= threshold]

    return j.map_batches(verify, batch_format="pandas") \
        .sort(["doc_a", "doc_b"])


def simhash_docs(docs_ds):
    """64-bit SimHash per document (signed int64)."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(
                [simhash64(t) for t in batch.column("text").to_pylist()],
                pa.int64()),
        })

    return docs_ds.map_batches(fn, batch_format="pyarrow")


def _simhash_pairs_from_table(t, max_hamming: int, bucket_cap: int):
    """Vectorized near-pair search from a collected banded signature
    table (driver path of :func:`simhash_near_pairs`)."""
    import pyarrow as pa
    band = t.column("band_id").to_numpy()
    bv = t.column("band_val").to_numpy()
    doc = t.column("doc_id").to_numpy()
    sig = t.column("simhash").to_numpy().astype(np.uint64)
    order = np.lexsort((doc, bv, band))
    band, bv, doc, sig = band[order], bv[order], doc[order], sig[order]
    boundary = np.flatnonzero((np.diff(band) != 0) | (np.diff(bv) != 0))
    starts = np.concatenate(([0], boundary + 1))
    ends = np.concatenate((boundary + 1, [len(band)]))
    out_a, out_b, out_h = [], [], []
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        ids, idx = np.unique(doc[s:e], return_index=True)
        if len(ids) < 2:
            continue
        _bucket_hamming_pairs(ids, sig[s:e][idx], max_hamming,
                              bucket_cap, out_a, out_b, out_h)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "hamming": pa.array(out_h, pa.int64())})


def _bucket_hamming_pairs(ids, hs, max_hamming: int, bucket_cap: int,
                          out_a: list, out_b: list, out_h: list) -> None:
    """Exact-Hamming compare within one bucket (sorted unique ids with
    their signatures) — appends qualifying pairs.  The ONE copy of the
    star/full compare semantics shared by the driver and distributed
    paths (a divergence here would silently break their promised
    equality).  Degenerate bucket (> cap) → star comparison only
    (linear, transitively complete for keep-one-per-cluster)."""
    upper = 1 if len(ids) > bucket_cap else len(ids)
    for i in range(upper):
        x = hs[i] ^ hs[i + 1:]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = np.nonzero(ham <= max_hamming)[0]
        for j in keep:
            out_a.append(int(ids[i]))
            out_b.append(int(ids[i + 1 + j]))
            out_h.append(int(ham[j]))


def simhash_near_pairs(docs_ds, max_hamming: int = 3,
                       bucket_cap: int = 2048,
                       banded_bound: int = 5_000_000):
    """SimHash near-dup pairs via band blocking.

    A 64-bit signature is split into 4 disjoint 16-bit bands; two
    signatures within Hamming distance 3 agree on at least one band
    (pigeonhole), so banding finds every such pair with one groupby.
    Verification (exact Hamming) happens inside the group — signatures
    travel with the rows, no corpus re-read.  Buckets above
    ``bucket_cap`` fall back to star comparison (min-id vs rest):
    linear in the bucket, still transitively complete for
    keep-one-per-cluster dedup of a degenerate identical cluster.
    The cap is 2048 (not the pair-generators' 256): hamming checks
    are one vectorized XOR+popcount per bucket, so a full 2048² pass
    is milliseconds, and natural-language band buckets reach the
    low hundreds on ordinary corpora (measured 317 at sf0.1) —
    a tight cap silently downgrades exact pairs to star pairs.
    """
    sigs = simhash_docs(docs_ds)

    def to_bands(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        out = []
        for band in range(4):
            band_val = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out.append(pd.DataFrame({
                "band_id": band,
                "band_val": band_val.astype("int64"),
                "doc_id": batch["doc_id"],
                "simhash": batch["simhash"],
            }))
        return pd.concat(out, ignore_index=True)

    banded = sigs.map_batches(to_bands, batch_format="pandas") \
        .materialize()
    # same bounded-adaptive shape as minhash_candidates: 4 rows/doc,
    # driver lexsort + vectorized slicing when within bound, else the
    # distributed groupby/map_groups (unbounded corpora)
    if banded.count() <= banded_bound:
        import ray.data

        from cheque_ocr_project_ray.util import collect_table
        t = collect_table(banded)
        if t is None:
            return ray.data.from_arrow(_pair_typed_empty("hamming"))
        raw = _simhash_pairs_from_table(t, max_hamming, bucket_cap)
        return ray.data.from_arrow(
            _dedup_pair_table(raw, "min", "hamming", "hamming"))

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            empty = g["doc_id"].iloc[:0]
            return pd.DataFrame({"doc_a": empty, "doc_b": empty.copy(),
                                 "hamming": pd.Series([], dtype="int64")})
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        _bucket_hamming_pairs(ids, hs, max_hamming, bucket_cap,
                              out_a, out_b, out_h)
        # typed even when no pair survives — an untyped empty frame
        # (float64/objectless) makes the whole aggregate schemaless on
        # a clean corpus and out['doc_a'] raises KeyError downstream
        return pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype=g["doc_id"].dtype),
            "doc_b": pd.Series(out_b, dtype=g["doc_id"].dtype),
            "hamming": pd.Series(out_h, dtype="int64")})

    cand = banded.groupby(["band_id", "band_val"]).map_groups(
        pairs, batch_format="pandas")
    # a pair can match in several bands — keep one row per pair (min
    # hamming); typed-empty-safe and driver-vectorized when bounded
    return _dedup_pair_rows(cand, "min", "hamming", "hamming")


def winnow_dedup_pairs(docs_ds, min_shared: int = 3, max_df: int = 50,
                       bucket_cap: int = 256,
                       bound: int = 5_000_000):
    """Near-dup pairs by shared winnowing fingerprints: docs sharing
    >= ``min_shared`` distinct fingerprints (doc_a < doc_b, n_shared).

    ``max_df`` drops stopword-grams first: a fingerprint present in
    more than ``max_df`` docs carries no dedup signal (common phrases)
    and would otherwise create quadratic buckets — the standard
    document-frequency cap, applied identically in the SQL oracle so
    equality is exact.  Shape: fingerprint rows → df filter → bucket
    by fp → pairs per collided bucket → count shared fps per pair.
    Bounded-adaptive like the LSH paths: driver lexsort+slice within
    ``bound`` fingerprint rows, distributed groupby beyond."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cheque_ocr_project_ray.text.analysis import winnow_fingerprints

    fps = docs_ds.map_batches(winnow_fingerprints,
                              batch_format="pyarrow").materialize()

    from cheque_ocr_project_ray.util import collect_table

    if fps.count() <= bound:
        t = collect_table(fps)
        if t is None:
            return ray.data.from_arrow(_pair_typed_empty("n_shared"))
        # df filter: rows are distinct (doc, fp), so value_counts = df
        vc = t.column("fp").value_counts()
        keep_fps = vc.field("values").filter(
            pc.less_equal(vc.field("counts"), max_df))
        t = t.filter(pc.is_in(t.column("fp"), value_set=keep_fps))
        raw = _pairs_grouped([t.column("fp").to_numpy()],
                             t.column("doc_id").to_numpy(), bucket_cap)
        pairs = ray.data.from_arrow(
            _dedup_pair_table(raw, "count_all", "", "n_shared"))
    else:
        def bucket(group: pd.DataFrame) -> pd.DataFrame:
            ids = sorted(group["doc_id"].unique())
            empty = group["doc_id"].iloc[:0]
            if len(ids) < 2 or len(ids) > max_df:  # df cap distributed
                return pd.DataFrame({"doc_a": empty, "doc_b": empty.copy()})
            a, b = bucket_pairs(ids, bucket_cap)
            return pd.DataFrame({"doc_a": a, "doc_b": b})

        cand = fps.groupby("fp").map_groups(bucket, batch_format="pandas")
        pairs = _dedup_pair_rows(cand, "count_all", "", "n_shared")

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(
            pc.greater_equal(batch.column("n_shared"), min_shared))

    return pairs.map_batches(keep, batch_format="pyarrow")


def ngram_jaccard_pairs(docs_ds, shingle_k: int = 2,
                        threshold: float = 0.5):
    """n-gram Jaccard near-dup via the same LSH blocking (smaller k →
    looser blocking)."""
    return minhash_dedup_pairs(docs_ds, num_perm=32, bands=16,
                               shingle_k=shingle_k, threshold=threshold)


def _verify_containment(blob_a, blob_b) -> np.ndarray:
    """RAW (unrounded) containment |A∩B| / min(|A|, |B|) per pair
    from serialized shingle blobs — the asymmetric overlap measure:
    1.0 whenever the smaller shingle set is a subset of the larger,
    however different the sizes (Jaccard on the same pair → tiny)."""
    cont = np.empty(len(blob_a), dtype=np.float64)
    for i, (ba, bb) in enumerate(zip(blob_a, blob_b)):
        sa = np.frombuffer(ba, dtype=np.int64)
        sb = np.frombuffer(bb, dtype=np.int64)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        m = min(sa.size, sb.size)
        cont[i] = inter / m if m else 1.0
    return cont


def containment_dedup_pairs(docs_ds, shingle_k: int = 3,
                            min_shared: int = 3, max_df: int = 50,
                            threshold: float = 0.3,
                            broadcast_limit: int = 2_000_000,
                            broadcast_doc_limit: int = 250_000,
                            bound: int = 5_000_000):
    """Subset/quote near-dup by shingle CONTAINMENT: for candidate
    pairs from the winnowing-fingerprint blocking (shared >=
    ``min_shared`` fps under the ``max_df`` stopword-gram cap — the
    same candidates as :func:`winnow_dedup_pairs`, so the SQL oracle
    re-derives them identically), keep pairs whose exact word-k-gram
    containment |A∩B| / min(|A|, |B|) >= ``threshold``.  This is the
    asymmetric duplication Jaccard structurally MISSES: a short doc
    quoted whole inside a long one has containment 1.0 but Jaccard
    ~|small|/|large|, below any sane Jaccard cut.  Verification is
    the same adaptive shape as the MinHash path: bounded candidates →
    blob dict broadcast + actor-pool verify; otherwise a fully
    distributed double hash join against the per-doc shingle blobs.
    The raw ratio is threshold-compared on BOTH engines (the output
    column is then 4dp-rounded), so the keep set is cross-engine
    exact."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from cheque_ocr_project_ray.util import (collect_table, map_pool,
                                             round_half_up)

    cand = winnow_dedup_pairs(docs_ds, min_shared=min_shared,
                              max_df=max_df, bound=bound) \
        .select_columns(["doc_a", "doc_b"]).materialize()
    n_cand = cand.count()
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "containment": pa.array([], pa.float64())})
    if n_cand == 0:
        return ray.data.from_arrow(empty)

    ids = None
    if n_cand <= broadcast_limit:
        cand_t = collect_table(cand)
        ids = pc.unique(pa.concat_arrays([
            cand_t.column("doc_a").combine_chunks(),
            cand_t.column("doc_b").combine_chunks()]))
        if len(ids) > broadcast_doc_limit:
            ids = None  # too many blobs for the driver → join path

    if ids is not None:
        def only_candidates(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("doc_id"), value_set=ids))

        blobs = collect_table(
            shingle_blobs(
                docs_ds.map_batches(only_candidates,
                                    batch_format="pyarrow"),
                shingle_k).materialize())
        blob_by_id = dict(zip(blobs.column("doc_id").to_pylist(),
                              blobs.column("shingle_blob").to_pylist()))
        blob_ref = ray.put(blob_by_id)

        class _Verify:
            def __init__(self):
                self.blobs = ray.get(blob_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                a = batch.column("doc_a").to_pylist()
                b = batch.column("doc_b").to_pylist()
                cont = _verify_containment(
                    [self.blobs[x] for x in a],
                    [self.blobs[y] for y in b])
                keep = cont >= threshold
                return pa.table({
                    "doc_a": pa.array(np.asarray(a)[keep]),
                    "doc_b": pa.array(np.asarray(b)[keep]),
                    "containment": pa.array(
                        round_half_up(cont[keep], 4), pa.float64()),
                })

        verified = ray.data.from_arrow(cand_t) \
            .map_batches(_Verify, batch_format="pyarrow",
                         batch_size=4096,
                         concurrency=(1, map_pool())).materialize()
        if verified.count() == 0:
            return ray.data.from_arrow(empty)
        return verified.sort(["doc_a", "doc_b"])

    from cheque_ocr_project_ray.relational.joins import hash_join

    sh = shingle_blobs(docs_ds, shingle_k)

    def rename(side: str):
        def fn(batch):
            return batch.rename_columns([f"doc_{side}", f"blob_{side}"])
        return fn

    j = hash_join(cand, sh.map_batches(rename("a"),
                                       batch_format="pyarrow"),
                  on="doc_a")
    j = hash_join(j, sh.map_batches(rename("b"),
                                    batch_format="pyarrow"),
                  on="doc_b")

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        cont = _verify_containment(list(batch["blob_a"]),
                                   list(batch["blob_b"]))
        keep = cont >= threshold
        return pd.DataFrame({
            "doc_a": batch["doc_a"][keep],
            "doc_b": batch["doc_b"][keep],
            "containment": round_half_up(cont[keep], 4)})

    return j.map_batches(verify, batch_format="pandas") \
        .sort(["doc_a", "doc_b"])
