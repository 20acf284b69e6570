"""Multi-format ingestion: the same events stream read from CSV and
JSONL instead of parquet (S4/S5-family generalization — the reference
reads DBF+TXT; a Ray engine must eat whatever lands in the lake).

The fixture CSV/JSONL copies are derived ONCE from the provided
parquet (cached under /tmp keyed by source mtime+size — deterministic,
no external data), so the format readers can be verified against the
SAME DuckDB oracle as the parquet path: a green row proves
read_csv/read_json produce byte-identical analytics to read_parquet.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_CACHE_ROOT = "/tmp/cheque_ray_formats"


def _derived(sf_dir: str, fmt: str) -> str:
    """Path of the cached CSV/JSONL copy of events.parquet, creating
    it on first use.  Timestamps serialize as ISO microseconds; both
    readers parse them back to timestamp[us]."""
    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    # stable digest (NOT builtin hash(): PYTHONHASHSEED randomization
    # would give a different key per process, so the cache would never
    # hit across runs and derived copies would accumulate unboundedly)
    import hashlib
    key = hashlib.md5(
        f"{src}|{st.st_mtime_ns}|{st.st_size}".encode()).hexdigest()[:16]
    out_dir = Path(_CACHE_ROOT) / f"{key}"
    out = out_dir / f"events.{fmt}"
    if out.exists():
        return str(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.read_parquet(src)
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    tmp = str(out) + f".tmp{os.getpid()}"
    if fmt == "csv":
        df.to_csv(tmp, index=False)
    else:
        df.to_json(tmp, orient="records", lines=True)
    os.replace(tmp, out)   # atomic: concurrent callers see whole files
    return str(out)


def _normalize(batch: pa.Table) -> pa.Table:
    """Bring a CSV/JSONL batch to the parquet schema: parse ISO
    timestamps, cast the numeric columns to their parquet types."""
    ts = batch.column("ts")
    if not pa.types.is_timestamp(ts.type):
        # ISO-8601 strings cast natively (pyarrow strptime lacks %f)
        ts = pc.cast(pc.cast(ts, pa.string()), pa.timestamp("us"))
    return pa.table({
        "event_id": pc.cast(batch.column("event_id"), pa.int64()),
        "ts": pc.cast(ts, pa.timestamp("us")),
        "user_id": pc.cast(batch.column("user_id"), pa.int64()),
        "event_type": pc.cast(batch.column("event_type"), pa.string()),
        "value": pc.cast(batch.column("value"), pa.float64()),
    })


def _evolved_shards(sf_dir: str) -> tuple[str, str]:
    """Two derived parquet shards with DRIFTED schemas (cached like
    ``_derived``): shard A = even event_ids, the original schema;
    shard B = odd event_ids with the ``ts`` column DROPPED, a new
    ``channel`` column added, and the remaining columns reordered —
    the schema drift a year of lake ingestion produces."""
    import hashlib

    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    key = hashlib.md5(
        f"evo|{src}|{st.st_mtime_ns}|{st.st_size}".encode()) \
        .hexdigest()[:16]
    out_dir = Path(_CACHE_ROOT) / key
    a, b = out_dir / "shard_a.parquet", out_dir / "shard_b.parquet"
    if a.exists() and b.exists():
        return str(a), str(b)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = pd.read_parquet(src,
                         columns=["event_id", "ts", "user_id",
                                  "event_type", "value"])
    even = df[df["event_id"] % 2 == 0]
    odd = df[df["event_id"] % 2 == 1].drop(columns=["ts"]).copy()
    odd["channel"] = "web"
    odd = odd[["channel", "value", "event_type", "user_id", "event_id"]]
    tmp_a, tmp_b = f"{a}.tmp{os.getpid()}", f"{b}.tmp{os.getpid()}"
    even.to_parquet(tmp_a, index=False)
    odd.to_parquet(tmp_b, index=False)
    os.replace(tmp_a, a)
    os.replace(tmp_b, b)
    return str(a), str(b)


_EVOLVED_SCHEMA = (("event_id", pa.int64()),
                   ("ts", pa.timestamp("us")),
                   ("user_id", pa.int64()),
                   ("event_type", pa.string()),
                   ("value", pa.float64()),
                   ("channel", pa.string()))


def read_events_evolved(sf_dir: str):
    """Union-by-name read across schema-drifted shards: each shard's
    batches are aligned to the union schema (missing columns null-
    filled with their TARGET type, order canonicalized) in one
    map_batches, then the shards union — the reader a 100 TB lake
    whose shards predate a column needs.  No shuffle; alignment is
    per-batch metadata work."""

    def align(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in _EVOLVED_SCHEMA:
            if name in batch.column_names:
                cols[name] = pc.cast(batch.column(name), typ)
            else:
                cols[name] = pa.nulls(batch.num_rows, typ)
        return pa.table(cols)

    a, b = _evolved_shards(sf_dir)
    return ray.data.read_parquet(a) \
        .map_batches(align, batch_format="pyarrow") \
        .union(ray.data.read_parquet(b)
               .map_batches(align, batch_format="pyarrow"))


def read_events_csv(sf_dir: str):
    return ray.data.read_csv(_derived(sf_dir, "csv")) \
        .map_batches(_normalize, batch_format="pyarrow")


def read_events_jsonl(sf_dir: str):
    return ray.data.read_json(_derived(sf_dir, "jsonl")) \
        .map_batches(_normalize, batch_format="pyarrow")
