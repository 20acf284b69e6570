"""Benchmark harness: headline cheque pipeline + representative queries.

Plain run (the driver's per-round BENCH record):
    python bench.py                # $GRAFT_SF_DIR (default sf0.1),
                                   # $RAY_GRAFT_CPUS cpus (default 32)
Prints ONE JSON line:
    {"metric": "cheque_extract_e2e_sec", "value": S, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "cheques": n, "cheques_per_sec": r}

Scaling evidence (BASELINE.json north rule — N→4N cluster sizes are
evidenced here by two parallelism levels in fresh processes):
    python bench.py --scaling      # num_cpus=8 then num_cpus=32
Prints ONE JSON line with both throughputs and
efficiency = (tput_4N / tput_N) / 4.

This script OWNS its Ray session (unlike __ray_entry__, which the
driver initialises Ray for).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")

# Representative non-headline pipelines (one per operator family).
BENCH_QUERIES = [
    "q1_pricing_summary",      # combiner-first grouped aggregate
    "order_priority_revenue",  # large-large partitioned hash join
    "revenue_by_nation",       # broadcast dimension join
    "top_orders",              # per-batch top-k + tiny global sort
    "events_hourly",           # tumbling-window aggregate
    "events_sessions",         # gap-window sessionization (map_groups)
    "dedup_minhash",           # MinHash LSH shuffle
    "dedup_winnow",            # winnow fingerprint-sharing near-dup
    "doc_simhash",             # signature map
    "doc_quality",             # vectorized text analysis
    "ann_cosine_topk",         # brute-force cosine top-k
    "ann_knn_join",            # batched multi-query GEMM top-k
    "ann_ivf_topk",            # IVF coarse-quantizer scale path
    "embedding_neardup",       # exact all-pairs near-dup (block GEMM)
    "embedding_kmeans",        # iterative broadcast-update (Lloyd)
    "doc_pack",                # distributed prefix sum (packing)
    "dedup_components",        # graph closure over near-dup pairs
    "media_decode_stats",      # multimodal actor-pool stage
    "q7_volume_shipping",      # fact-fact hash join + 4 dim hops
    "doc_segment_dedup",       # corpus segment dedup + reassembly
    "doc_unigram_logprob",     # two-pass corpus LM scoring
    "q21_sole_late_supplier",  # double-EXISTS via flag aggregation
    "q10_returned_revenue",    # hash join + per-key top-k
    "events_range_join",       # banded non-equi interval join
    "ann_range_search",        # radius search (streaming GEMM filter)
    "supplier_scorecard",      # entity-360 multi-metric join profile
    "doc_bm25_topk",           # two-pass ranked retrieval
    "events_funnel_paths",     # per-user ordered sequence mining
    "embedding_mmr_topk",      # diverse retrieval re-rank (r4)
    "events_peak_concurrency",  # interval scanline: sort + block scan (r5)
    "customer_cohort_ltv",     # cohort matrix: map_groups + grid merge (r5)
    "orders_growth_accounting",  # activity grid + prev-month self-join (r5)
    "dedup_containment",       # winnow blocking + adaptive containment verify (r5)
]


def _consume(result) -> int:
    """Execute a query result fully; return its row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.count()
    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return 0


def _warm_page_cache(fixture_dir) -> None:
    """Read every fixture byte once so the timed region always starts
    from a WARM page cache: round-over-round bench comparisons were
    weather reports (observed 32.6-36.9 s for the same code depending
    on cache state).  `--cold` inverts this by dropping caches."""
    import pathlib
    for f in sorted(pathlib.Path(fixture_dir).rglob("*")):
        if f.is_file():
            with open(f, "rb") as fh:
                while fh.read(1 << 22):
                    pass


def _drop_page_cache() -> bool:
    """Best-effort page-cache drop (root-only sysctl); False if the
    sandbox forbids it — callers then report cache state honestly."""
    try:
        import subprocess as sp
        sp.run(["sync"], check=True)
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        return True
    except OSError:
        return False


def run_once(sf_dir: str, num_cpus: int, headline_only: bool,
             cold: bool = False) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    # Corpus generation is one-time setup, not pipeline work — keep it
    # outside the timed region (cached across runs under /tmp).
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    fixture = ensure_fixture(sf_dir)
    if cold:
        cache_state = "cold" if _drop_page_cache() else "unknown"
    else:
        _warm_page_cache(fixture)
        cache_state = "warm"

    import __ray_entry__ as entrymod
    qs = entrymod.queries()

    timings: dict[str, float] = {}
    t0 = time.perf_counter()
    n_cheques = _consume(qs["cheque_extract"](sf_dir))
    headline_sec = time.perf_counter() - t0
    timings["cheque_extract"] = round(headline_sec, 3)

    if not headline_only:
        for name in BENCH_QUERIES:
            if name not in qs:
                continue
            t0 = time.perf_counter()
            _consume(qs[name](sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "cheque_extract_e2e_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "num_cpus": num_cpus,
        "cheques": n_cheques,
        "cheques_per_sec": round(n_cheques / headline_sec, 2),
        "cache": cache_state,
    }


def run_scaling(sf_dir: str, cpus_lo: int, cpus_hi: int) -> dict:
    """Same headline job at two parallelism levels in fresh processes."""
    results = {}
    for cpus in (cpus_lo, cpus_hi):
        proc = subprocess.run(
            [sys.executable, __file__, "--headline-only",
             "--cpus", str(cpus), "--sf-dir", sf_dir],
            capture_output=True, text=True)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr)
            raise RuntimeError(
                f"scaling sub-run at {cpus} CPUs failed "
                f"(exit {proc.returncode}); stderr above")
        json_lines = [ln for ln in proc.stdout.strip().splitlines()
                      if ln.startswith("{")]
        results[cpus] = json.loads(json_lines[-1])
    tput_lo = results[cpus_lo]["cheques_per_sec"]
    tput_hi = results[cpus_hi]["cheques_per_sec"]
    factor = cpus_hi / cpus_lo
    return {
        "metric": "scaling_efficiency",
        "value": round((tput_hi / tput_lo) / factor, 4),
        "unit": "ratio",
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "cpus_lo": cpus_lo,
        "cpus_hi": cpus_hi,
        "cheques_per_sec_lo": tput_lo,
        "cheques_per_sec_hi": tput_hi,
        "sec_lo": results[cpus_lo]["value"],
        "sec_hi": results[cpus_hi]["value"],
        "cheques": results[cpus_hi]["cheques"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--headline-only", action="store_true",
                    help="time only the cheque pipeline (scaling sub-run)")
    ap.add_argument("--scaling", action="store_true",
                    help="run headline at two parallelism levels")
    ap.add_argument("--scale-lo", type=int, default=8)
    ap.add_argument("--scale-hi", type=int, default=32)
    ap.add_argument("--cold", action="store_true",
                    help="drop the page cache before timing instead of "
                         "warming it (needs root; default runs warm)")
    args = ap.parse_args()

    if args.scaling:
        out = run_scaling(args.sf_dir, args.scale_lo, args.scale_hi)
    else:
        out = run_once(args.sf_dir, args.cpus, args.headline_only,
                       cold=args.cold)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
