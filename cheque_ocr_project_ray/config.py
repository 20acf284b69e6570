"""Pipeline configuration.

All tunables in one dataclass; defaults mirror the reference's
production settings (threshold 0.90 at ``issuer_processor_v.py:696``,
OCR batch cadence at ``:611``) translated to Ray Data knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # Semantic knobs (reference CLI flags, SURVEY.md §2.10)
    threshold: float = 0.90          # issuer confidence gate
    limit: int | None = None         # head-N of the corpus
    target_long_side: int = 1200     # preprocess resize target

    # Ray Data physical knobs
    ocr_batch_size: int = 64         # rows per OCR actor call
    ocr_concurrency: int = 8         # OCR actor pool size
    ocr_num_cpus: float = 1.0        # CPUs reserved per OCR actor
    extract_batch_size: int = 256    # rows per extraction call
    ocr_work_passes: int = 12        # simulated inference cost knob
                                     # (~2-4 ms per typical image; see
                                     # media.simulate_inference)
    skew_span_threshold: int = 8     # docs with more media spans than
                                     # this go through the small-batch path
    skew_batch_size: int = 4

    # Checkpointing
    num_partitions: int = 32         # checkpoint unit = output partition

    def with_overrides(self, **kw) -> "PipelineConfig":
        from dataclasses import replace
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
