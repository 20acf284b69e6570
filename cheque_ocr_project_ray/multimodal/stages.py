"""Multimodal column operators: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio/video codec libraries (cv2/PIL/ffmpeg/torchaudio) are
NOT in this container, so the byte→pixels/samples step is stubbed: a
real codec raises ``NotImplementedError`` with a clear message, and a
deterministic fake (pure function of the payload bytes) stands in so
the Ray-side plumbing — schemas, batch sizes, actor signatures, output
layout — is real and fully tested.  Swapping in a real codec touches
only the ``_decode_*`` functions.

Batch-size note (the 100 TB constraint): media payloads are orders of
magnitude bigger than text rows, so these stages default to SMALL
batch sizes — ``batch_size × payload × concurrency`` must fit the
worker heap; callers with 10 MB+ payloads should pass batch_size<=8.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from cheque_ocr_project_ray.media import MAGIC, decode_image, preprocess_meta

DEFAULT_MEDIA_BATCH = 32


def _fake_pixel_stats(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for decoded-pixel statistics."""
    arr = np.frombuffer(payload[:65536], dtype=np.uint8)
    if arr.size == 0:
        return 0.0, 0.0
    return float(arr.mean()), float(arr.std())


def _decode_real_image(payload: bytes):
    raise NotImplementedError(
        "real image decode requires cv2/PIL, which are not available in "
        "this environment; only CHQ1 synthetic payloads are decodable")


class ImageDecodeStage:
    """binary payload → (format, width, height, n_text_lines, pixel
    stats).  CHQ1 synthetic payloads decode fully; other formats go
    through the stubbed real-codec path."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts, ws, hs, n_lines, means, stds = [], [], [], [], [], []
        payloads = batch.column("data").to_pylist()  # materialize ONCE —
        # payloads dominate batch memory (see module header)
        for payload in payloads:
            if payload.startswith(MAGIC):
                lines, w, h = decode_image(payload)
                fmts.append("chq1")
                ws.append(w)
                hs.append(h)
                n_lines.append(len(lines))
            elif self.strict:
                # contract for a future real codec: return
                # (format, width, height, n_text_lines) — the columns
                # stay aligned when the stub is replaced
                fmt, w, h, n = _decode_real_image(payload)
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
                n_lines.append(n)
            else:
                fmts.append("unknown")
                ws.append(0)
                hs.append(0)
                n_lines.append(0)
            m, s = _fake_pixel_stats(payload)
            means.append(m)
            stds.append(s)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "format": pa.array(fmts, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_text_lines": pa.array(n_lines, pa.int32()),
            "pixel_mean": pa.array(means, pa.float32()),
            "pixel_std": pa.array(stds, pa.float32()),
            "nbytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


class ImageResizeStage:
    """Resize/contrast plan per image (tiff_processor.py:84-108
    semantics) without touching pixels: emits the scale factor, target
    dims and contrast decision the real resampler would apply."""

    def __init__(self, target_long_side: int = 1200):
        self.target = target_long_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        scales, pws, phs, boosted = [], [], [], []
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        for payload, w, h in zip(batch.column("data").to_pylist(),
                                 widths, heights):
            meta = preprocess_meta(payload, w, h, self.target)
            scales.append(meta["scale_factor"])
            pws.append(meta["processed_w"])
            phs.append(meta["processed_h"])
            boosted.append(meta["contrast_boosted"])
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "scale_factor": pa.array(scales, pa.float64()),
            "processed_w": pa.array(pws, pa.int32()),
            "processed_h": pa.array(phs, pa.int32()),
            "contrast_boosted": pa.array(boosted, pa.bool_()),
        })


class FrameSampleStage:
    """Video frame sampling plan: deterministic every-k-th frame
    offsets from (nbytes, fps) metadata; frame pixel decode itself is
    the stubbed codec step."""

    def __init__(self, every_n: int = 30, max_frames: int = 16,
                 bytes_per_frame: int = 8192):
        self.every_n = every_n
        self.max_frames = max_frames
        self.bytes_per_frame = bytes_per_frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets: list[list[int]] = []
        for payload in batch.column("data").to_pylist():
            n_frames = max(1, len(payload) // self.bytes_per_frame)
            sel = list(range(0, n_frames, self.every_n))[:self.max_frames]
            offsets.append(sel)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "frame_offsets": pa.array(offsets, pa.list_(pa.int32())),
            "n_sampled": pa.array([len(o) for o in offsets], pa.int32()),
        })


class AudioFeatureStage:
    """Windowed audio features: real MFCC/spectrogram needs an audio
    lib (stubbed); the per-window plumbing computes a deterministic
    rolling byte hash per window so output layout (list<float> per
    row) and batch memory behavior are real."""

    def __init__(self, window_bytes: int = 4096, max_windows: int = 64):
        self.window_bytes = window_bytes
        self.max_windows = max_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list[list[float]] = []
        for payload in batch.column("data").to_pylist():
            row = []
            for i in range(0, min(len(payload),
                                  self.window_bytes * self.max_windows),
                           self.window_bytes):
                window = payload[i:i + self.window_bytes]
                h = int.from_bytes(
                    hashlib.blake2b(window, digest_size=4).digest(), "big")
                row.append(round(h / 0xFFFFFFFF, 6))
            feats.append(row)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "features": pa.array(feats, pa.list_(pa.float32())),
            "n_windows": pa.array([len(f) for f in feats], pa.int32()),
        })


class RoiCropPlanStage:
    """ROI crop cascade plan (reference M1/M2/M4): the issuer zone
    ``[0.40h:0.90h, 0.35w:w]`` (issuer_processor_v.py:456-458), the
    bottom-right signature crop ``[0.55h:, 0.5w:]``
    (issuer_batch_processor.py:110-127) and the V3 multi-ROI cascade
    (IssuerBatchProcessorV3.py:364-393), emitted as rectangle columns.
    Pixel cropping itself happens inside the OCR stand-in; at scale
    these rectangles are what the GPU batch loader consumes."""

    # (name, y0_frac, y1_frac, x0_frac, x1_frac) — cascade order
    CASCADE = (
        ("issuer_zone", 0.40, 0.90, 0.35, 1.00),
        ("bottom_right", 0.55, 1.00, 0.50, 1.00),
        ("bottom_half", 0.50, 1.00, 0.00, 1.00),
        ("full_image", 0.00, 1.00, 0.00, 1.00),
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, names, orders, y0s, y1s, x0s, x1s = [], [], [], [], [], [], []
        for ref, w, h in zip(batch.column("media_ref").to_pylist(),
                             batch.column("width").to_pylist(),
                             batch.column("height").to_pylist()):
            for i, (name, fy0, fy1, fx0, fx1) in enumerate(self.CASCADE):
                refs.append(ref)
                names.append(name)
                orders.append(i)
                y0s.append(int(h * fy0))
                y1s.append(int(h * fy1))
                x0s.append(int(w * fx0))
                x1s.append(int(w * fx1))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "roi": pa.array(names, pa.string()),
            "cascade_order": pa.array(orders, pa.int32()),
            "y0": pa.array(y0s, pa.int32()),
            "y1": pa.array(y1s, pa.int32()),
            "x0": pa.array(x0s, pa.int32()),
            "x1": pa.array(x1s, pa.int32()),
        })


class VariantBestOfStage:
    """Best-of preprocessing-variant cascade (reference M3,
    ``issuer_processor_v2.py:286-330``): 4 ROIs × 3 preprocessing
    variants (gray / equalizeHist / adaptiveThreshold), OCR each, keep
    the highest-confidence combination with a ``len >= 3`` validity
    gate.  The pixel transforms need cv2 (stubbed per this module's
    contract); the stand-in derives a deterministic per-(payload, roi,
    variant) confidence modifier from the payload bytes, so the
    SELECTION control flow — full scan, compare, keep-best, validity
    gate — runs for real and is testable."""

    # (y0, y1, x0, x1) fractions — issuer_processor_v2.py:289-295
    ROIS = (
        (0.30, 0.85, 0.30, 1.00),   # wider area
        (0.40, 0.90, 0.35, 1.00),   # original
        (0.35, 0.80, 0.25, 1.00),   # higher up
        (0.45, 0.95, 0.40, 1.00),   # lower
    )
    VARIANTS = ("gray", "equalize_hist", "adaptive_threshold")

    def __call__(self, batch: pa.Table) -> pa.Table:
        rois, variants, confs, evals = [], [], [], []
        for payload in batch.column("data").to_pylist():
            if payload.startswith(MAGIC):
                lines, _w, _h = decode_image(payload)
            else:
                lines = []
            base_conf = (sum(c for _, c in lines) / len(lines)) if lines \
                else 0.0
            # the reference's candidate validity gate is len(text) >= 3
            # (issuer_processor_v2.py:324); line-level proxy here since
            # the stand-in keeps whole-line OCR output
            has_valid_text = any(len(t.strip()) >= 3 for t, _ in lines)
            best_conf, best_roi, best_variant = 0.0, "NONE", "NONE"
            n_eval = 0
            if lines:  # an undecodable payload yields no OCR result to
                # evaluate — n_evaluated stays 0, not 12
                for i in range(len(self.ROIS)):
                    for variant in self.VARIANTS:
                        n_eval += 1
                        # deterministic variant-quality modifier in
                        # [0.85, 1.0) — the stand-in for "this
                        # preprocessing made OCR better/worse on these
                        # pixels"
                        h = int.from_bytes(
                            hashlib.blake2b(
                                payload[:512] + f"|{i}|{variant}".encode(),
                                digest_size=4).digest(), "big")
                        conf = round(
                            base_conf * (0.85 + 0.15 * h / 0x100000000), 4)
                        if conf > best_conf and has_valid_text:
                            best_conf = conf
                            best_roi = f"ROI_{i + 1}"
                            best_variant = variant
            rois.append(best_roi)
            variants.append(best_variant)
            confs.append(best_conf)
            evals.append(n_eval)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "best_roi": pa.array(rois, pa.string()),
            "best_variant": pa.array(variants, pa.string()),
            "best_conf": pa.array(confs, pa.float64()),
            "n_evaluated": pa.array(evals, pa.int32()),
        })


class HandwritingDetectStage:
    """Handwriting detector (reference M5, issuer_processor_v.py:71-113:
    Otsu binarize → contour aspect/extent/solidity scoring).  The
    contour step needs cv2 (stubbed); the deterministic stand-in
    derives contour-count and score proxies from payload byte
    statistics so the decision column, thresholds and plumbing are
    real: handwritten iff >15 "contours" and score > 1.2."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_contours, scores, handwritten = [], [], []
        for payload in batch.column("data").to_pylist():
            if self.strict:
                raise NotImplementedError(
                    "real handwriting detection requires cv2 contours; "
                    "not available in this environment")
            arr = np.frombuffer(payload[:32768], dtype=np.uint8)
            if arr.size == 0:
                n_contours.append(0)
                scores.append(0.0)
                handwritten.append(False)
                continue
            # byte-level texture proxies: sign changes ≈ contours,
            # normalized variation ≈ stroke-irregularity score
            diffs = np.diff(arr.astype(np.int16))
            contours = int(np.count_nonzero(np.abs(diffs) > 64) // 97)
            score = round(float(np.abs(diffs).mean()) / 64.0, 4)
            n_contours.append(contours)
            scores.append(score)
            handwritten.append(contours > 15 and score > 1.2)
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "n_contours": pa.array(n_contours, pa.int32()),
            "stroke_score": pa.array(scores, pa.float64()),
            "handwritten": pa.array(handwritten, pa.bool_()),
        })


class MediaEmbedStage:
    """Deterministic fake embedding per payload (unit-norm float32
    vector from a blake2 digest) — the batched-model-inference shape
    used by the vector ops, without model weights."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for payload in batch.column("data").to_pylist():
            seed = int.from_bytes(
                hashlib.blake2b(payload, digest_size=8).digest(), "big")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim).astype(np.float32)
            v /= np.linalg.norm(v) or 1.0
            vecs.append(v.tolist())
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        })
