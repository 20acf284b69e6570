"""Multimodal pipelines over the fixture media store (driver-contract
entries; rows-only checks — binary media has no SQL oracle).

Each pipeline is: streaming ``read_parquet`` of the bucketed media
store → actor-pool ``map_batches`` stage (small batches — payloads are
large) → small aggregate or per-ref table.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum

from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
from cheque_ocr_project_ray.multimodal.stages import (
    DEFAULT_MEDIA_BATCH,
    AudioFeatureStage,
    FrameSampleStage,
    HandwritingDetectStage,
    ImageDecodeStage,
    ImageResizeStage,
    MediaEmbedStage,
    RoiCropPlanStage,
)


def _media_ds(sf_dir: str, columns=None):
    fixture = ensure_fixture(sf_dir)
    return ray.data.read_parquet(str(Path(fixture) / "media"),
                                 columns=columns)


def _pool(ds, stage_cls, batch_size=DEFAULT_MEDIA_BATCH, **ctor):
    import ray
    n = max(2, int(ray.cluster_resources().get("CPU", 8)) // 3)
    return ds.map_batches(stage_cls, fn_constructor_kwargs=ctor,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=n, num_cpus=1)


def media_decode_stats(sf_dir: str):
    decoded = _pool(_media_ds(sf_dir, ["media_ref", "data"]),
                    ImageDecodeStage)
    return decoded.groupby("format").aggregate(
        Count(alias_name="n"),
        Mean("width", alias_name="mean_width"),
        Mean("height", alias_name="mean_height"),
        Max("n_text_lines", alias_name="max_lines"),
        Sum("nbytes", alias_name="total_bytes"),
    )


def media_resize_plan(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "data", "width", "height"])
    return _pool(ds, ImageResizeStage, target_long_side=1200)


def media_frame_sample(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "data"])
    plan = _pool(ds, FrameSampleStage)
    return plan.drop_columns(["frame_offsets"])  # flat cols for driver


def media_audio_features(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "data"])
    feats = _pool(ds, AudioFeatureStage, batch_size=16)
    return feats.drop_columns(["features"])


def media_embed_neighbors(sf_dir: str, k: int = 5):
    """Embed media then brute-force cosine top-k against the first
    payload's embedding (batched matmul per block)."""
    import numpy as np
    import pyarrow as pa

    ds = _media_ds(sf_dir, ["media_ref", "data"])
    emb = _pool(ds, MediaEmbedStage, dim=32)

    # deterministic probe vector (pure function of the dim)
    rng = np.random.default_rng(1234)
    q = rng.standard_normal(32).astype(np.float32)
    q /= np.linalg.norm(q)
    import ray
    q_ref = ray.put(q)

    class _Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = np.asarray(batch.column("embedding").to_pylist(),
                             dtype=np.float32)
            sims = mat @ self.q
            return pa.table({
                "media_ref": batch.column("media_ref"),
                "cosine": pa.array(np.round(sims, 5), pa.float32()),
            })

    scored = emb.map_batches(_Score, batch_format="pyarrow",
                             concurrency=2, num_cpus=1)
    return scored.sort(["cosine", "media_ref"],
                       descending=[True, False]).limit(k)


def media_roi_plan(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "width", "height"])
    return ds.map_batches(RoiCropPlanStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2, num_cpus=1)


def media_handwriting(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "data"])
    return _pool(ds, HandwritingDetectStage)


def multimodal_queries() -> dict[str, Callable]:
    return {
        "media_decode_stats": media_decode_stats,
        "media_resize_plan": media_resize_plan,
        "media_frame_sample": media_frame_sample,
        "media_audio_features": media_audio_features,
        "media_embed_neighbors": media_embed_neighbors,
        "media_roi_plan": media_roi_plan,
        "media_handwriting": media_handwriting,
    }
