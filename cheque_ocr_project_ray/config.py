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
    status_ladder: str = "v1"        # 'v1' (AUTO-UPDATED/REJECTED/
                                     # ERROR, issuer_processor_v.py) or
                                     # 'v3' (7-state REVIEW ladder,
                                     # IssuerBatchProcessorV3.py:446-473;
                                     # reference default threshold 0.85)

    # Ray Data physical knobs
    ocr_batch_size: int = 64         # rows per OCR actor call
    ocr_concurrency: int = 64        # OCR actor pool cap; the effective
                                     # pool is min(this, 0.6*cluster CPUs)
                                     # so it scales with the cluster
    ocr_num_cpus: float = 1.0        # CPUs reserved per OCR actor
    extract_batch_size: int = 256    # rows per extraction call
    ocr_work_passes: int = 256       # simulated inference cost knob —
                                     # ~25 ms per typical image, so the
                                     # benchmark measures compute
                                     # scheduling, not task overhead
                                     # (SURVEY.md §7.5; still ~40x
                                     # lighter than the reference's
                                     # ~1 s/image CRNN)
    skew_bytes_threshold: int = 150_000  # docs with more media payload
                                     # than this take the small-batch
                                     # path (read-time predicate on the
                                     # stored media_bytes hint column)
    skew_batch_size: int = 4

    # Checkpointing
    num_partitions: int = 32         # checkpoint unit = output partition

    def with_overrides(self, **kw) -> "PipelineConfig":
        from dataclasses import replace
        return replace(self, **kw)


DEFAULT_CONFIG = PipelineConfig()
