"""Per-partition checkpointed output with lineage + resumable restart
(SURVEY.md §4 "Checkpoint / resume" and §7.3 milestone 4).

Layout (one directory per doc_id-hash partition — never one giant
file):

    out/part=0007/data.parquet      committed atomically (tmp + rename)
    out/part=0007/_SUCCESS.json     lineage: rows, doc_id range, dup
                                    count, stage metrics, wall time

The checkpoint exchange is the pipeline's ONE shuffle: results are
hash-partitioned by doc_id (``groupby`` under the hash-shuffle
strategy) and each partition is written by the task that owns it, so a
partition either fully commits (_SUCCESS present) or is retried/
recreated — there is no half-visible state.  On restart,
``resume_filter`` drops every doc whose partition already committed
(anti-join against the completed-partition manifest, reference D1
semantics: ``parallel_processor.py:124-133``), so only the remainder
is recomputed.  The reference's equivalents are append-only CSVs plus
an in-memory processed-set; those survive neither process death nor
duplication, which is why the unit here is the partition, not the row.
"""

from __future__ import annotations

import json
import os
import time
import zlib
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cheque_ocr_project_ray.util import shuffle_partitions


def partition_of(doc_id: str, num_partitions: int) -> int:
    """Stable doc_id → partition id (crc32, not Python hash)."""
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def completed_partitions(out_dir: str | Path) -> set[int]:
    """Partition ids with a committed _SUCCESS.json."""
    out_dir = Path(out_dir)
    done = set()
    if not out_dir.exists():
        return done
    for d in out_dir.glob("part=*"):
        if (d / "_SUCCESS.json").exists():
            done.add(int(d.name.split("=", 1)[1]))
    return done


def _clean_incomplete(out_dir: Path) -> None:
    """Remove data from partition dirs that never committed."""
    for d in out_dir.glob("part=*"):
        if not (d / "_SUCCESS.json").exists():
            for f in d.iterdir():
                f.unlink()
            d.rmdir()


def write_checkpointed(results_ds, out_dir: str | Path,
                       num_partitions: int = 32, resume: bool = False):
    """Write results as committed per-partition parquet + lineage.

    Returns the list of lineage records (one per partition written in
    this run).  ``resume=True`` declares that the caller filtered the
    input with ``resume_filter`` — committed partitions are kept.
    ``resume=False`` (a fresh run) WIPES previously committed
    partitions first: otherwise a re-run with different inputs into
    the same dir would mix stale rows into ``read_checkpoint`` /
    ``rollup_metrics``.  Partial files from crashes are swept either
    way.
    """
    import shutil
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # layout manifest: resuming with a different partition count would
    # silently skip the wrong docs — fail loudly instead
    layout_path = out_dir / "_LAYOUT.json"
    if layout_path.exists():
        prev = json.loads(layout_path.read_text())["num_partitions"]
        if prev != num_partitions and resume:
            # only RESUMING into a different layout mis-routes docs —
            # a fresh run is about to wipe everything anyway, so it
            # may legitimately change the partition count
            raise ValueError(
                f"checkpoint at {out_dir} was written with "
                f"num_partitions={prev}; resuming with {num_partitions} "
                "would mis-route documents")
        if not resume:
            for d in out_dir.glob("part=*"):
                shutil.rmtree(d)
    layout_path.write_text(json.dumps({"num_partitions": num_partitions}))
    _clean_incomplete(out_dir)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = [partition_of(d, num_partitions)
                         for d in batch["doc_id"]]
        return batch

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        pid = int(group["part"].iloc[0])
        # replay/dedup guard (D1): keep first row per doc_id
        n_in = len(group)
        group = group.drop_duplicates(subset="doc_id", keep="first")
        group = group.sort_values("doc_id").drop(columns=["part"])
        pdir = out_dir / f"part={pid:04d}"
        pdir.mkdir(parents=True, exist_ok=True)
        tmp = pdir / ".data.parquet.tmp"
        pq.write_table(pa.Table.from_pandas(group, preserve_index=False), tmp)
        os.replace(tmp, pdir / "data.parquet")
        lineage = {
            "partition": pid,
            "rows": len(group),
            "duplicates_dropped": n_in - len(group),
            "doc_id_min": group["doc_id"].min(),
            "doc_id_max": group["doc_id"].max(),
            "media_bytes": int(group["media_bytes"].sum())
            if "media_bytes" in group else None,
            # per-partition extraction metrics (G1): rolled up by
            # rollup_metrics without re-reading the data
            "status_counts": {str(k): int(v) for k, v in
                              group["status"].value_counts().items()}
            if "status" in group else {},
            "wall_s": round(time.perf_counter() - t0, 4),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        # commit marker LAST, written ATOMICALLY — its presence alone
        # defines partition success, so a crash mid-write must never
        # leave a truncated marker (resume would skip the partition
        # while rollup_metrics chokes on the partial JSON)
        tmp_marker = pdir / "._SUCCESS.json.tmp"
        tmp_marker.write_text(json.dumps(lineage))
        os.replace(tmp_marker, pdir / "_SUCCESS.json")
        # returned record keeps flat columns only (nested dicts don't
        # unify across pandas blocks); the sidecar carries the rest
        return pd.DataFrame(
            [{k: v for k, v in lineage.items() if k != "status_counts"}])

    # layout partition count (= resume granularity) is independent of
    # the shuffle's aggregator-actor count, which is capped to the
    # cluster so aggregators don't fight the pipeline's fixed pools.
    # NOTE on strategy: Ray copies the DataContext at ROOT-dataset
    # creation (verified on 2.49.2), so the shuffle strategy here is
    # whatever context ``results_ds`` was BUILT under — wrapping only
    # this groupby in tune_shuffle would be inert.  Callers who want
    # the hash shuffle must build the whole pipeline inside the scope.
    np_ = min(num_partitions, shuffle_partitions())
    lineage_ds = results_ds \
        .map_batches(assign, batch_format="pandas") \
        .groupby("part", num_partitions=np_) \
        .map_groups(write_group, batch_format="pandas")
    return lineage_ds.to_pandas().to_dict("records")


def resume_filter(ds, out_dir: str | Path, num_partitions: int = 32):
    """Drop docs whose output partition already committed.

    The partition count is validated against the checkpoint's
    _LAYOUT.json: filtering with a different count than the one the
    data was routed with would silently drop never-processed docs.
    """
    layout_path = Path(out_dir) / "_LAYOUT.json"
    if layout_path.exists():
        actual = json.loads(layout_path.read_text())["num_partitions"]
        if actual != num_partitions:
            raise ValueError(
                f"checkpoint at {out_dir} uses num_partitions={actual}; "
                f"resume_filter called with {num_partitions} would "
                "mis-route documents")
    done = completed_partitions(out_dir)
    if not done:
        return ds

    def keep(batch: pa.Table) -> pa.Table:
        mask = [partition_of(d, num_partitions) not in done
                for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def read_checkpoint(out_dir: str | Path):
    """Dataset over every committed partition."""
    import ray.data
    out_dir = Path(out_dir)
    paths = sorted(str(d / "data.parquet") for d in out_dir.glob("part=*")
                   if (d / "_SUCCESS.json").exists())
    if not paths:
        return ray.data.from_items([])
    return ray.data.read_parquet(paths)


def rollup_metrics(out_dir: str | Path) -> dict:
    """Driver-side roll-up of the per-partition lineage sidecars."""
    out_dir = Path(out_dir)
    parts = [json.loads((d / "_SUCCESS.json").read_text())
             for d in sorted(out_dir.glob("part=*"))
             if (d / "_SUCCESS.json").exists()]
    status_counts: dict[str, int] = {}
    for p in parts:
        for k, v in p.get("status_counts", {}).items():
            status_counts[k] = status_counts.get(k, 0) + v
    return {
        "partitions": len(parts),
        "rows": sum(p["rows"] for p in parts),
        "duplicates_dropped": sum(p["duplicates_dropped"] for p in parts),
        "media_bytes": sum(p["media_bytes"] or 0 for p in parts),
        "status_counts": status_counts,
        "max_partition_wall_s": max((p["wall_s"] for p in parts), default=0.0),
    }
