"""Sources: the Lance-shaped cheque table, metadata side table, and the
content-addressed media store (SURVEY.md §2.1 S1-S6).

The cheque table is read with ``ray.data.read_parquet`` — streaming,
one block per fragment; swapping in a real Lance reader later only
touches this module (the I/O seam called out in SURVEY.md §7.5).

``MediaStore`` models the production access pattern for media bytes at
100 TB scale: content-addressed GETs against a bucketed store, batched
per bucket and cached per worker — never a cluster-wide shuffle join.
media_ref format: ``bNNN/<doc_id>_<k>``; bucket ``NNN`` maps to one
parquet fragment ``media/bucket=NNN/data.parquet``.
"""

from __future__ import annotations

from collections import OrderedDict
from pathlib import Path
from typing import Iterable

import pyarrow.parquet as pq

import ray.data


def read_cheques(fixture_dir: str | Path, limit: int | None = None,
                 filter_expr=None):
    """Streaming read of the (doc_id, spans, media_bytes) table.

    ``filter_expr`` (a pyarrow dataset expression) is pushed into the
    parquet scan — rows are dropped at the read and, where row-group
    statistics allow, whole row groups are skipped.  The skew router
    uses this on the stored ``media_bytes`` hint column.
    """
    ds = ray.data.read_parquet(str(Path(fixture_dir) / "cheques"),
                               filter=filter_expr)
    if limit is not None:  # limit=0 means "zero docs", not "no limit"
        ds = ds.limit(limit)
    return ds


def skew_profile(cheques_dir: str | Path, threshold: int,
                 max_sample_groups: int = 64) -> tuple[float, int]:
    """(big_byte_share, est_n_big_docs) for the skew router — from
    parquet METADATA plus a bounded row-group sample, never a full
    column scan (the round-1 version did ``to_table(["media_bytes"])``
    on the driver: an 8 TB driver materialization at 10^12 rows).

    - Existence of oversized docs is exact and metadata-only: any
      row-group max statistic above the threshold.
    - The byte SHARE is estimated from a STRATIFIED sample of at most
      ``max_sample_groups`` row groups: half the budget goes to groups
      whose max statistic exceeds the threshold (so big docs can't hide
      from an even stride — they'd silently disable skew routing), half
      to the rest, each evenly strided.  The driver reads
      ``<= max_sample_groups × row_group_size`` int64 values no matter
      the corpus size.  Pool sizing needs a ratio, not a census.
    """
    files = sorted(Path(cheques_dir).glob("*.parquet"))
    big_groups: list[tuple[Path, int]] = []    # stats say "may hold big"
    small_groups: list[tuple[Path, int]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        if md.num_row_groups == 0:  # fragment from an empty block
            continue
        # leaf-column index, NOT the arrow schema index: nested columns
        # (spans) expand into several parquet leaves before media_bytes
        rg0 = md.row_group(0)
        ci = next((i for i in range(rg0.num_columns)
                   if rg0.column(i).path_in_schema == "media_bytes"),
                  None)
        if ci is None:
            # table without the hint column (external/legacy corpus):
            # no routing signal — fall back to the no-skew single
            # branch rather than aborting pipeline construction
            return 0.0, 0
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(ci).statistics
            if st is None or not st.has_min_max or st.max > threshold:
                big_groups.append((f, i))
            else:
                small_groups.append((f, i))
    if not big_groups:  # exact: no row group can hold an oversized doc
        return 0.0, 0

    def strided(seq, budget):
        if budget <= 0 or not seq:
            return []
        stride = max(1, len(seq) // budget)
        return seq[::stride][:budget]

    import pyarrow.compute as pc

    def scan(sample):
        big_b = tot_b = nb = 0
        for f, i in sample:
            col = pq.ParquetFile(f).read_row_group(
                i, columns=["media_bytes"]).column("media_bytes")
            tot_b += pc.sum(col).as_py() or 0
            big_mask = pc.greater(col, threshold)
            big_b += pc.sum(pc.if_else(big_mask, col, 0)).as_py() or 0
            nb += pc.sum(pc.cast(big_mask, "int64")).as_py() or 0
        return big_b, tot_b, nb

    half = max(1, max_sample_groups // 2)
    big_sample = strided(big_groups, half)
    small_sample = strided(small_groups, max_sample_groups - half)

    # per-stratum extrapolation: every oversized row lives in the
    # big-stats stratum by construction (small-stratum max <= threshold)
    fs_big = len(big_sample) / len(big_groups)
    fs_small = (len(small_sample) / len(small_groups)) if small_groups \
        else 1.0
    big_b, big_tot, n_big = scan(big_sample)
    _, small_tot, _ = scan(small_sample)
    big_bytes_est = big_b / fs_big
    total_bytes_est = big_tot / fs_big + \
        (small_tot / fs_small if fs_small else 0.0)
    if not total_bytes_est:
        return 0.0, 0
    n_big_est = round(n_big / fs_big)
    return big_bytes_est / total_bytes_est, n_big_est


def read_meta(fixture_dir: str | Path, columns: list[str] | None = None):
    """Streaming read of the DBF-mirror metadata table (S4/S5)."""
    return ray.data.read_parquet(str(Path(fixture_dir) / "meta"), columns=columns)


class MediaStore:
    """Per-worker content-addressed media fetcher with bucket LRU cache.

    One instance lives inside each OCR actor (built once in
    ``__init__``, SURVEY.md §2.3 A1): per batch, the needed refs are
    grouped by bucket and each uncached bucket is read once.  The LRU
    bound MUST stay small: batches arrive bucket-contiguous (the corpus
    co-locates consecutive docs' media), so a handful of buckets gets
    near-perfect hit rates, while a large bound silently grows every
    actor's heap toward the whole media corpus (observed: 790 MB/actor
    at sf0.1 with max_buckets=64 — a 2.5x pipeline slowdown).
    """

    def __init__(self, media_dir: str | Path, max_buckets: int = 4):
        self.media_dir = Path(media_dir)
        self.max_buckets = max_buckets
        self._cache: OrderedDict[str, dict[str, bytes]] = OrderedDict()

    def _load_bucket(self, bucket: str) -> dict[str, bytes]:
        cached = self._cache.get(bucket)
        if cached is not None:
            self._cache.move_to_end(bucket)
            return cached
        path = self.media_dir / f"bucket={bucket}" / "data.parquet"
        try:
            table = pq.read_table(path, columns=["media_ref", "data"])
            data = dict(zip(table["media_ref"].to_pylist(),
                            table["data"].to_pylist()))
        except FileNotFoundError:
            data = {}  # lost/missing bucket → every ref in it is missing
        self._cache[bucket] = data
        if len(self._cache) > self.max_buckets:
            self._cache.popitem(last=False)
        return data

    def get_many(self, refs: Iterable[str]) -> dict[str, bytes | None]:
        """Batched GET: group refs by bucket, one bucket read each.

        Two ref schemes:
        - ``bNNN/<id>``: bucketed content-addressed store (the fixture
          layout)
        - ``file:<path>``: media left in place by the ingest path —
          read directly, no bucket indirection (at corpus scale this
          is the object-store GET the ingest deliberately avoids
          re-shuffling)

        A ref absent from the store maps to ``None`` — the caller owns
        the failure semantics (OcrStage turns it into a per-row ERROR;
        raising here would fail the whole task for one lost blob).
        """
        by_bucket: dict[str, list[str]] = {}
        out: dict[str, bytes | None] = {}
        for ref in refs:
            if ref.startswith("file:"):
                try:
                    out[ref] = Path(ref[5:]).read_bytes()
                except OSError:
                    out[ref] = None
                continue
            bucket = ref.split("/", 1)[0][1:]
            by_bucket.setdefault(bucket, []).append(ref)
        for bucket, bucket_refs in by_bucket.items():
            data = self._load_bucket(bucket)
            for ref in bucket_refs:
                out[ref] = data.get(ref)
        return out
