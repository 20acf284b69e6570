"""Synthetic media codec — the OCR stand-in's "image" format.

``paddleocr``/``cv2`` are unavailable in this environment (SURVEY.md
preamble), so media spans reference synthetic image payloads whose
bytes deterministically encode the OCR line list the real engine would
have produced.  The OCR actor decodes bytes → ordered ``(text, conf)``
lines, preserving the interface of the reference's PaddleOCR result
(``ocr_engine.py:86-107`` consumes exactly this shape), and burns a
deterministic amount of compute proportional to the payload so the
scaling benchmark measures real scheduling behavior (SURVEY.md §7.5).

Payload layout (all deterministic):
  b"CHQ1\\n" + header-length int32 LE + JSON header + padding bytes
  header = {"w": int, "h": int, "lines": [[text, conf], ...]}
"""

from __future__ import annotations

import json
import struct
from typing import Sequence

import numpy as np

MAGIC = b"CHQ1\n"

OcrLinesT = list[tuple[str, float]]


def encode_image(
    lines: Sequence[tuple[str, float]],
    width: int,
    height: int,
    total_size: int,
    seed: int,
) -> bytes:
    """Build a synthetic image payload of ~``total_size`` bytes."""
    header = json.dumps(
        {"w": width, "h": height, "lines": [[t, round(float(c), 4)] for t, c in lines]},
        ensure_ascii=False,
    ).encode("utf-8")
    base = MAGIC + struct.pack("<i", len(header)) + header
    pad_len = max(0, total_size - len(base))
    rng = np.random.default_rng(seed)
    padding = rng.integers(0, 256, size=pad_len, dtype=np.uint8).tobytes()
    return base + padding


def decode_image(payload: bytes) -> tuple[OcrLinesT, int, int]:
    """Decode payload → (ocr_lines, width, height)."""
    if not payload.startswith(MAGIC):
        raise ValueError("not a CHQ1 synthetic image payload")
    off = len(MAGIC)
    (hlen,) = struct.unpack_from("<i", payload, off)
    off += 4
    header = json.loads(payload[off:off + hlen].decode("utf-8"))
    lines = [(t, float(c)) for t, c in header["lines"]]
    return lines, int(header["w"]), int(header["h"])


def preprocess_meta(payload: bytes, width: int, height: int,
                    target_long_side: int = 1200) -> dict:
    """Deskew/downscale metadata, mirroring ``tiff_processor.py:84-108``.

    The reference resizes to a target long side and boosts contrast on
    dark images; neither changes the (stand-in) OCR line output, so the
    stage records the same metadata the reference tracks without
    altering extraction semantics.
    """
    long_side = max(width, height)
    scale = target_long_side / long_side if long_side else 1.0
    new_w, new_h = int(width * scale), int(height * scale)
    # "mean pixel" over the payload bytes stands in for np.mean(img).
    sample = np.frombuffer(payload[-4096:] if len(payload) > 4096 else payload,
                           dtype=np.uint8)
    dark = bool(sample.mean() < 128) if sample.size else False
    return {
        "scale_factor": scale,
        "processed_w": new_w,
        "processed_h": new_h,
        "contrast_boosted": dark,
    }


def simulate_inference(payload: bytes, work_passes: int = 40) -> int:
    """Deterministic compute cost proportional to payload bytes.

    Stands in for CRNN inference so per-image cost scales with image
    size (the reference's honest anchor is ~1s/image on 2 threads,
    ``benchmark_result.json``; here the cost is scaled down so local
    benchmarks finish, but stays proportional and non-optimizable).
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0
    # O(bytes × passes) of vectorized numpy per image — honest compute,
    # not interpreter overhead.  Looping passes (instead of tiling the
    # buffer work_passes times) keeps peak memory at 4×payload
    # regardless of the pass count.  uint32 cumsum wraps mod 2^32:
    # deterministic.
    base = arr.astype(np.uint32)
    acc = 0
    for _ in range(max(1, work_passes)):
        acc = int(base.cumsum(dtype=np.uint32)[-1] + acc) & 0xFFFFFFFF
    return acc
