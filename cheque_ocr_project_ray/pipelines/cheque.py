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

Skew note (SURVEY.md §7.3): a doc's cost is driven by its media bytes.
Docs with more than ``skew_span_threshold`` spans take the
small-batch path (``skew_batch_size`` docs per task) so one oversized
multi-span cheque can't stall a 64-doc task; at production scale the
routing key would be a stored per-doc byte hint generated with the
table.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

import ray

from cheque_ocr_project_ray.config import DEFAULT_CONFIG, PipelineConfig
from cheque_ocr_project_ray.sources.io import read_cheques
from cheque_ocr_project_ray.stages.extract import FieldExtractStage
from cheque_ocr_project_ray.stages.ocr import OcrStage
from cheque_ocr_project_ray.state.drawer_dict import build_drawer_dict


def _span_count_filter(keep_big: bool, threshold: int):
    def fn(batch: pa.Table) -> pa.Table:
        counts = pc.list_value_length(batch.column("spans"))
        mask = pc.greater(counts, threshold) if keep_big \
            else pc.less_equal(counts, threshold)
        return batch.filter(mask)
    return fn


def build_cheque_pipeline(
    fixture_dir: str | Path,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    drawer_dict: list[str] | None = None,
):
    """Lazy Dataset of extraction results for one fixture tier."""
    fixture_dir = Path(fixture_dir)
    media_dir = str(fixture_dir / "media")

    if drawer_dict is None:
        drawer_dict = build_drawer_dict(fixture_dir)
    drawer_ref = ray.put(drawer_dict)

    base = read_cheques(fixture_dir, limit=cfg.limit)

    # Size pools to the cluster: autoscaling (1, max) so the three actor
    # pools (OCR small-path, OCR skew-path, extraction) never starve
    # each other on small CPU counts — a fixed pool that reserves every
    # CPU serializes the pipeline (ray_guide: actor-pool sizing).
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    ocr_max = max(1, min(cfg.ocr_concurrency, int(total_cpus * 0.6)))
    skew_max = max(1, min(2, ocr_max))
    extract_max = max(1, min(cfg.ocr_concurrency, int(total_cpus * 0.4)))

    def ocr_branch(ds, batch_size: int, pool_max: int):
        return ds.map_batches(
            OcrStage,
            fn_constructor_kwargs={
                "media_dir": media_dir,
                "work_passes": cfg.ocr_work_passes,
                "target_long_side": cfg.target_long_side,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, pool_max),
            num_cpus=cfg.ocr_num_cpus,
        )

    # Two-path skew routing: both branches stream; union re-merges.
    small = base.map_batches(
        _span_count_filter(False, cfg.skew_span_threshold),
        batch_format="pyarrow")
    big = base.map_batches(
        _span_count_filter(True, cfg.skew_span_threshold),
        batch_format="pyarrow")
    ocred = ocr_branch(small, cfg.ocr_batch_size, ocr_max).union(
        ocr_branch(big, cfg.skew_batch_size, skew_max))

    return ocred.map_batches(
        FieldExtractStage,
        fn_constructor_kwargs={
            "drawer_ref": drawer_ref,
            "threshold": cfg.threshold,
        },
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=(1, extract_max),
        num_cpus=1,
    )
