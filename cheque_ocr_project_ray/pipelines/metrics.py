"""Run metrics as data aggregations (SURVEY.md §2.5 G1-G4).

The reference keeps in-process counter dicts (``ocr_engine.py:77-84``,
``IssuerBatchProcessorV3.py:429-509``); here metrics are computed FROM
the output data with Ray Data aggregations, so they are correct under
retries/restarts (SURVEY.md §7.5 "state in actors").
"""

from __future__ import annotations

from ray.data.aggregate import Count, Max, Mean, Min, Sum


def status_histogram(results_ds):
    """Status ladder histogram (G1)."""
    return results_ds.groupby("status").count()


def type_histogram(results_ds):
    return results_ds.groupby("cheque_type").count()


def run_summary(results_ds) -> dict:
    """Driver-side roll-up (G1-G4): counts, government share, confidences."""
    agg = results_ds.aggregate(
        Count(alias_name="processed"),
        Sum("is_government", alias_name="government"),
        Mean("confidence", alias_name="mean_confidence"),
        Min("confidence", alias_name="min_confidence"),
        Max("confidence", alias_name="max_confidence"),
        Sum("media_bytes", alias_name="total_media_bytes"),
    )
    return dict(agg)
