"""`ray job submit`-able entry point for the cheque extraction job.

    ray job submit -- python -m cheque_ocr_project_ray.run \
        --fixture-dir /tmp/cheque_ray_fixtures/sf0.1-42-16000 \
        --out /tmp/cheque_out --resume

Lifecycle (SURVEY.md §3 target): streaming read → skew-routed OCR
actor pools → field extraction → per-partition checkpointed write with
lineage → metadata join-back export → metrics roll-up printed as one
JSON line.  ``--resume`` skips every partition that already committed.

This script OWNS the Ray session (guarded init so it also runs inside
an existing cluster via `ray job submit`).  Library code never calls
``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture-dir",
                    help="corpus dir (cheques/ meta/ media/); mutually "
                         "exclusive with --sf-dir")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="testdata tier; its synthetic corpus is "
                         "generated/cached on first use")
    ap.add_argument("--out", required=True, help="checkpointed output dir")
    ap.add_argument("--export", help="optional final join-back export dir")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions that already committed")
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.90)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import os

    import ray
    if not ray.is_initialized():
        # honor RAY_ADDRESS so `ray job submit` connects to the cluster
        # instead of nesting a fresh local instance inside the job;
        # num_cpus is only legal when STARTING a local instance (Ray
        # rejects it when connecting to an existing cluster)
        addr = os.environ.get("RAY_ADDRESS") or "local"
        kw = {"num_cpus": args.num_cpus} if addr == "local" else {}
        ray.init(address=addr, include_dashboard=False, **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from cheque_ocr_project_ray.config import DEFAULT_CONFIG
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    from cheque_ocr_project_ray.pipelines.checkpoint import (
        rollup_metrics, write_checkpointed)
    from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline
    from cheque_ocr_project_ray.pipelines.sink import write_final

    fixture = args.fixture_dir or ensure_fixture(args.sf_dir)
    cfg = DEFAULT_CONFIG.with_overrides(threshold=args.threshold,
                                        limit=args.limit,
                                        num_partitions=args.num_partitions)

    t0 = time.perf_counter()
    # --resume drops committed partitions at the READ (no OCR redone)
    results = build_cheque_pipeline(
        fixture, cfg, resume_from=args.out if args.resume else None)
    write_checkpointed(results, args.out, args.num_partitions,
                       resume=args.resume)
    roll = rollup_metrics(args.out)
    roll["wall_s"] = round(time.perf_counter() - t0, 2)

    if args.export:
        from cheque_ocr_project_ray.pipelines.checkpoint import read_checkpoint
        write_final(read_checkpoint(args.out), fixture, args.export)
        roll["exported_to"] = args.export

    print(json.dumps(roll))
    ray.shutdown()


if __name__ == "__main__":
    main()
