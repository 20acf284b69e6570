"""End-to-end cheque extraction pipeline (SURVEY.md §3 target lifecycle).

    read_parquet(cheques)                 # streaming, block-per-fragment
      → [skew split on span count]        # oversized docs → small batches
      → map_batches(OcrStage, actor pool) # stateful: media store client
      → map_batches(FieldExtractStage,    # stateful: broadcast drawer
                    actor pool)           #   dict + fuzzy-match memo
      → Dataset[doc_id, spans_out, flat field columns]

No full materialization anywhere: consumers stream via write_parquet /
iter_batches / aggregates.  The only broadcast is the drawer
dictionary (ray.put once).  There is NO shuffle in the hot path —
partition balance comes from fragment-per-file reads plus Ray's
dynamic block splitting; sorts/groupbys exist only in metrics and in
the checkpointed write (checkpoint.py), as inventoried in SURVEY.md §4.

Skew note (SURVEY.md §7.3): a doc's cost is driven by its media bytes,
so the corpus stores a per-doc ``media_bytes`` hint column generated
with the table.  Docs above ``skew_bytes_threshold`` take the
small-batch path (``skew_batch_size`` docs per task) so one oversized
multi-span cheque can't stall a 64-doc task; the split is a read-time
parquet predicate, not a post-read filter stage.
"""

from __future__ import annotations

from pathlib import Path


import ray

from cheque_ocr_project_ray.config import DEFAULT_CONFIG, PipelineConfig
from cheque_ocr_project_ray.sources.io import read_cheques
from cheque_ocr_project_ray.stages.extract import FieldExtractStage
from cheque_ocr_project_ray.stages.ocr import OcrStage
from cheque_ocr_project_ray.state.drawer_dict import build_drawer_dict


def build_ocr_front(
    fixture_dir: str | Path,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume_from: str | Path | None = None,
) -> tuple["ray.data.Dataset", int, float]:
    """The read → skew-split → OCR-actor-pool front half, shared by
    every pipeline that consumes assembled OCR text (field extraction,
    the deterministic AI ensemble).  Returns ``(ocred, extract_max,
    extract_cpus)`` — the leftover CPU budget for one downstream
    actor-pool stage, so callers don't re-derive the split.
    """
    fixture_dir = Path(fixture_dir)
    media_dir = str(fixture_dir / "media")

    # --- cost-model-driven pool sizing -------------------------------
    # OCR cost is proportional to media bytes, so the two OCR branches
    # must get actors proportional to their BYTE load, not their row
    # count: oversized docs are ~25x costlier per row, and a fixed
    # 2-actor skew pool turned ~50% of the total compute into the
    # critical path (observed: 158 s vs 44 s at sf0.1).  The split
    # comes from parquet row-group statistics plus a BOUNDED row-group
    # sample (sources/io.skew_profile) — the driver never scans the
    # column (the round-1 full-column to_table would be an 8 TB driver
    # read at corpus scale).  Fixed pools (not autoscaling) start
    # eagerly and keep the CPU budget explicit; they total ~80% of the
    # cluster so read tasks and the executor never starve.
    import pyarrow.dataset as pads
    from cheque_ocr_project_ray.sources.io import skew_profile
    thr = cfg.skew_bytes_threshold
    big_share, n_big_docs = skew_profile(fixture_dir / "cheques", thr)

    # CPU budget: reserve ~2 CPUs for read tasks + shuffle aggregators
    # (fixed pools never release their CPUs — reserving everything
    # deadlocks any downstream task on small clusters).
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    avail = max(2, total_cpus - 2)
    # extraction is ~300x cheaper per doc than OCR (measured 0.14 ms vs
    # ~40 ms) — a big extract pool is idle reservation, so it gets ~10%
    # and OCR the rest
    extract_max = max(1, int(avail * 0.1))
    ocr_total = max(1, min(cfg.ocr_concurrency, avail - extract_max))
    # Tiny-cluster guard (< 4 CPUs): avail=max(2,...) above would let
    # the two 1-CPU fixed pools reserve EVERY CPU and starve the read
    # tasks — the exact deadlock the -2 reserve exists to prevent.
    # Run both stages on fractional actors so >= 1 full CPU stays free.
    ocr_cpus = cfg.ocr_num_cpus
    extract_cpus = 1.0
    if total_cpus < 4:
        ocr_total, extract_max = 1, 1
        ocr_cpus, extract_cpus = 0.4, 0.4
    # A limited run (--limit N = "first N docs", reference O2) must be
    # ONE ordered read — two predicate branches would each take N of
    # their own subset.  Skew routing only matters at full-corpus scale
    # anyway.
    if n_big_docs and ocr_total > 1 and cfg.limit is None:
        skew_n = min(ocr_total - 1, max(1, round(ocr_total * big_share)))
    else:
        skew_n = 0
    small_n = max(1, ocr_total - skew_n)

    def ocr_branch(ds, batch_size: int, pool: int):
        return ds.map_batches(
            OcrStage,
            fn_constructor_kwargs={
                "media_dir": media_dir,
                "work_passes": cfg.ocr_work_passes,
                "target_long_side": cfg.target_long_side,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
            num_cpus=ocr_cpus,
        )

    # Two-path skew routing on the stored media_bytes hint, pushed into
    # the parquet scan as a row predicate (rows dropped at the read;
    # row groups pruned where statistics allow).  Both branches stream;
    # union re-merges.
    def maybe_resume(ds):
        if resume_from is None:
            return ds
        from cheque_ocr_project_ray.pipelines.checkpoint import resume_filter
        return resume_filter(ds, resume_from, cfg.num_partitions)

    if skew_n:
        small = read_cheques(fixture_dir, limit=cfg.limit,
                             filter_expr=pads.field("media_bytes") <= thr)
        big = read_cheques(fixture_dir, limit=cfg.limit,
                           filter_expr=pads.field("media_bytes") > thr)
        ocred = ocr_branch(maybe_resume(small), cfg.ocr_batch_size,
                           small_n).union(
            ocr_branch(maybe_resume(big), cfg.skew_batch_size, skew_n))
    else:
        # no skew pool (no oversized docs, or a 1-actor cluster):
        # everything takes the one branch — never filter docs away
        ocred = ocr_branch(
            maybe_resume(read_cheques(fixture_dir, limit=cfg.limit)),
            cfg.ocr_batch_size, small_n)

    return ocred, extract_max, extract_cpus


def build_cheque_pipeline(
    fixture_dir: str | Path,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    drawer_dict: list[str] | None = None,
    resume_from: str | Path | None = None,
):
    """Lazy Dataset of extraction results for one fixture tier.

    ``resume_from``: a checkpoint dir — docs whose output partition
    already committed are dropped AT THE READ, before any OCR compute
    (filtering the pipeline output instead would redo all the work
    just to throw the rows away).
    """
    if drawer_dict is None:
        drawer_dict = build_drawer_dict(Path(fixture_dir))
    drawer_ref = ray.put(drawer_dict)

    ocred, extract_max, extract_cpus = build_ocr_front(
        fixture_dir, cfg, resume_from)
    return ocred.map_batches(
        FieldExtractStage,
        fn_constructor_kwargs={
            "drawer_ref": drawer_ref,
            "threshold": cfg.threshold,
            "status_ladder": cfg.status_ladder,
        },
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=extract_max,
        num_cpus=extract_cpus,
    )


def build_ai_pipeline(
    fixture_dir: str | Path,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """The EP3 AI-ensemble flow (ai_processor.py:336-381): OCR front +
    the deterministic ensemble scorer.  The scorer is a stateless batch
    function (nothing to pin per actor), so it rides task parallelism
    and adds no pool reservation on top of the OCR pools."""
    from cheque_ocr_project_ray.stages.ai import ai_ensemble_batch

    ocred, _extract_max, _extract_cpus = build_ocr_front(fixture_dir, cfg)
    return ocred.map_batches(ai_ensemble_batch, batch_format="pyarrow",
                             batch_size=cfg.extract_batch_size)
