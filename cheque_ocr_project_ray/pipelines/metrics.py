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


def latency_stats(results_ds, work_passes: int = 256):
    """Per-run latency roll-up (G3 — ``fast_ai_processor.py:286-293``:
    mean/median/min/max/total over successful docs).

    The reference measures wall-clock ``time_ms`` per cheque; a
    distributed engine can't make wall-clock deterministic, so the
    per-doc cost is the engine's cost model itself:
    ``cost_ms = media_bytes × work_passes / 1000`` — the exact quantity
    ``media.simulate_inference`` burns, so it IS the latency up to the
    machine constant, and it is SQL-re-derivable from ``media_bytes``.

    Shape: per-batch (media_bytes → count) grid partials, one bounded
    merge (``final_merge_sums``, distributed-groupby fallback past 2M
    distinct sizes), then exact stats from the grid — the median is the
    bit-equal ``quantile_cont`` replica, never Ray's drifting Quantile.
    All stats are monotone transforms of the integer byte grid, so sums
    stay exact-int until the final division.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             quantile_cont_from_grid,
                                             round_half_up)

    ok = results_ds.filter(expr="status != 'ERROR'")

    def grid_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"media_bytes": batch.column("media_bytes"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("media_bytes").aggregate([("n", "sum")])
        return g.rename_columns(["media_bytes", "n"])

    grid = collect_table(final_merge_sums(
        ok.map_batches(grid_partial, batch_format="pyarrow"),
        ["media_bytes"], ["n"]).materialize())
    empty = pd.DataFrame({
        "n_docs": pd.Series([], dtype="int64"),
        "mean_ms": pd.Series([], dtype="float64"),
        "median_ms": pd.Series([], dtype="float64"),
        "min_ms": pd.Series([], dtype="float64"),
        "max_ms": pd.Series([], dtype="float64"),
        "total_s": pd.Series([], dtype="float64")})
    if grid is None or grid.num_rows == 0:
        return empty
    gdf = grid.to_pandas().sort_values("media_bytes")
    bytes_vals = gdf["media_bytes"].to_numpy().astype(np.int64)
    cnts = gdf["n"].to_numpy().astype(np.int64)
    n = int(cnts.sum())
    # exact-int sum; per-value cost mirrors the SQL op order
    # CAST(media_bytes * wp AS DOUBLE) / 1000.0
    sum_units = int((bytes_vals * cnts).sum()) * work_passes
    cost_vals = (bytes_vals * work_passes).astype(np.float64) / 1000.0
    return pd.DataFrame([{
        "n_docs": n,
        "mean_ms": round_half_up(float(sum_units) / 1000.0 / n, 4),
        "median_ms": round_half_up(
            quantile_cont_from_grid(cost_vals, cnts, 0.5), 4),
        "min_ms": round_half_up(float(cost_vals[0]), 4),
        "max_ms": round_half_up(float(cost_vals[-1]), 4),
        "total_s": round_half_up(float(sum_units) / 1000.0 / 1000.0, 4),
    }])
