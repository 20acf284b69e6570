"""Multimodal pipelines over the fixture media store (driver-contract
entries; metadata-arithmetic outputs carry DuckDB oracles, see below —
only the payload-byte-statistic stages stay rows-only).

Each pipeline is: streaming ``read_parquet`` of the bucketed media
store → actor-pool ``map_batches`` stage (small batches — payloads are
large) → small aggregate or per-ref table.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import pandas as pd

import ray.data
from ray.data.aggregate import Count, Mean, Sum

from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
from cheque_ocr_project_ray.util import round_half_up
from cheque_ocr_project_ray.multimodal.stages import (
    DEFAULT_MEDIA_BATCH,
    AudioFeatureStage,
    FrameSampleStage,
    HandwritingDetectStage,
    ImageDecodeStage,
    ImageResizeStage,
    MediaEmbedStage,
    RoiCropPlanStage,
    VariantBestOfStage,
)


def _media_ds(sf_dir: str, columns=None):
    fixture = ensure_fixture(sf_dir)
    return ray.data.read_parquet(str(Path(fixture) / "media"),
                                 columns=columns)


def _pool(ds, stage_cls, batch_size=DEFAULT_MEDIA_BATCH, **ctor):
    from cheque_ocr_project_ray.util import map_pool
    return ds.map_batches(stage_cls, fn_constructor_kwargs=ctor,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=map_pool(), num_cpus=1)


def media_decode_stats(sf_dir: str):
    """Per-format decode stats.  Driver-facing output sticks to the
    SQL-expressible columns (format / count / mean dims / bytes) so the
    DuckDB oracle can verify it; ``n_text_lines`` (needs the CHQ1
    decode) stays on the stage and is pytest-verified."""
    from cheque_ocr_project_ray.util import tune_shuffle
    # hash-shuffle groupby (context captured at BUILD time — the whole
    # chain must be built inside the scope) with partitions capped to
    # the KEY CARDINALITY (media formats: ~2).  More partitions than
    # groups guarantees empty output partitions, and empty aggregate
    # blocks are schemaless — the source of the executor's "different
    # schema" warning.
    with tune_shuffle(num_partitions=2) as np_:
        decoded = _pool(_media_ds(sf_dir, ["media_ref", "data"]),
                        ImageDecodeStage)
        agg = decoded.groupby("format", num_partitions=np_).aggregate(
            Count(alias_name="n"),
            Mean("width", alias_name="mean_width"),
            Mean("height", alias_name="mean_height"),
            Sum("nbytes", alias_name="total_bytes"),
        )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        from cheque_ocr_project_ray.util import round_half_up
        b["mean_width"] = round_half_up(b["mean_width"], 4)
        b["mean_height"] = round_half_up(b["mean_height"], 4)
        return b

    return agg.map_batches(finish, batch_format="pandas")


def media_resize_plan(sf_dir: str):
    """Resize plan per image.  ``contrast_boosted`` (a payload-byte
    statistic with no SQL twin) stays a stage output verified by
    pytest; the driver-facing columns are pure arithmetic with a
    DuckDB oracle."""
    ds = _media_ds(sf_dir, ["media_ref", "data", "width", "height"])
    plan = _pool(ds, ImageResizeStage, target_long_side=1200)

    def finish(b):
        import pyarrow as pa
        from cheque_ocr_project_ray.util import round_half_up_arrow
        return pa.table({
            "media_ref": b["media_ref"],
            "scale_factor": round_half_up_arrow(b["scale_factor"], 6),
            "processed_w": b["processed_w"],
            "processed_h": b["processed_h"],
        })

    return plan.map_batches(finish, batch_format="pyarrow")


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
                "cosine": pa.array(
                    round_half_up(sims, 5).astype(np.float32),
                    pa.float32()),
            })

    from cheque_ocr_project_ray.util import map_pool
    scored = emb.map_batches(_Score, batch_format="pyarrow",
                             concurrency=(1, map_pool()), num_cpus=1)
    return scored.sort(["cosine", "media_ref"],
                       descending=[True, False]).limit(k)


def media_roi_plan(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "width", "height"])
    return ds.map_batches(RoiCropPlanStage, batch_format="pyarrow",
                          batch_size=256, concurrency=2, num_cpus=1)


def media_handwriting(sf_dir: str):
    ds = _media_ds(sf_dir, ["media_ref", "data"])
    return _pool(ds, HandwritingDetectStage)


def media_bestof_variants(sf_dir: str):
    """Best-of ROI×preprocessing-variant selection per image (M3,
    issuer_processor_v2.py:286-330).  Rows-only: the stand-in modifier
    is a seeded hash, not SQL-expressible."""
    ds = _media_ds(sf_dir, ["media_ref", "data"])
    return _pool(ds, VariantBestOfStage)


def media_dedup_exact(sf_dir: str, bound: int = 2_000_000):
    """Content-addressed media dedup: one row per DISTINCT payload —
    md5 fingerprint, copy count, and the keeper ref (min media_ref).
    The multimodal twin of the text exact-dedup family: per-batch
    partials carry (fp, count, min-ref) — never the payloads.  Under
    ``bound`` they merge via one driver group_by; past it
    (fingerprint cardinality = distinct payloads, corpus-scale) the
    merge is a distributed groupby(fp) and the result STAYS a
    distributed Dataset — the round-5 audit fallback (previously
    promised in prose only)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    import ray.data as _rd

    from cheque_ocr_project_ray.util import collect_table

    ds = _media_ds(sf_dir, ["media_ref", "data"])

    def partial(batch: pa.Table) -> pa.Table:
        # DuckDB 1.0's md5() takes VARCHAR only — both engines hash the
        # UPPERCASE-hex encoding of the payload (hex(data) in SQL)
        fps = [hashlib.md5(d.hex().upper().encode()).hexdigest()
               for d in batch.column("data").to_pylist()]
        t = pa.table({"fp": pa.array(fps, pa.string()),
                      "media_ref": batch.column("media_ref"),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by("fp").aggregate(
            [("n", "sum"), ("media_ref", "min")])
        return g.rename_columns(["fp", "n_copies", "keeper_ref"])

    from cheque_ocr_project_ray.util import map_pool
    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=DEFAULT_MEDIA_BATCH,
                              concurrency=map_pool(),
                              num_cpus=1).materialize()
    empty = pa.table({"fp": pa.array([], pa.string()),
                      "n_copies": pa.array([], pa.int64()),
                      "keeper_ref": pa.array([], pa.string())})
    if parts_ds.count() <= bound:
        parts = collect_table(parts_ds)
        if parts is None or parts.num_rows == 0:
            return _rd.from_arrow(empty)
        g = parts.group_by("fp").aggregate(
            [("n_copies", "sum"), ("keeper_ref", "min")])
        return _rd.from_arrow(g.rename_columns(
            ["fp", "n_copies", "keeper_ref"]))
    from ray.data.aggregate import Min, Sum
    return parts_ds.groupby("fp").aggregate(
        Sum("n_copies", alias_name="n_copies"),
        Min("keeper_ref", alias_name="keeper_ref"))


def media_integrity_audit(sf_dir: str):
    """Referential-integrity audit between the span table and the
    media store: every image span's ref must resolve to a payload,
    every payload should be referenced.  Both sides reduce to
    DISTINCT ref sets through per-batch combiners (refs travel,
    payloads don't); the set difference folds on the driver
    (ref-cardinality-bounded; a distributed anti-join is the
    unbounded fallback)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_min)

    fixture = ensure_fixture(sf_dir)

    def span_refs(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(batch.column("spans"))
        kinds = pc.struct_field(flat, "kind")
        refs = pc.struct_field(flat, "media_ref").filter(
            pc.equal(kinds, "image"))
        t = pa.table({"ref": refs,
                      "one": pa.array(np.ones(len(refs), np.int64))})
        g = t.group_by("ref").aggregate([("one", "min")])
        return g.rename_columns(["ref", "one"])

    refs_t = collect_table(final_merge_min(
        ray.data.read_parquet(str(Path(fixture) / "cheques"),
                              columns=["spans"])
        .map_batches(span_refs, batch_format="pyarrow"),
        ["ref"], ["one"]).materialize())

    def store_refs(batch: pa.Table) -> pa.Table:
        t = pa.table({"ref": batch.column("media_ref"),
                      "one": pa.array(np.ones(batch.num_rows,
                                              np.int64))})
        g = t.group_by("ref").aggregate([("one", "min")])
        return g.rename_columns(["ref", "one"])

    store_t = collect_table(final_merge_min(
        _media_ds(sf_dir, ["media_ref"])
        .map_batches(store_refs, batch_format="pyarrow"),
        ["ref"], ["one"]).materialize())

    span_set = np.array([] if refs_t is None
                        else refs_t.column("ref").to_pylist(),
                        dtype=object)
    store_set = np.array([] if store_t is None
                         else store_t.column("ref").to_pylist(),
                         dtype=object)
    orphans = int(np.count_nonzero(~np.isin(span_set, store_set)))
    unreferenced = int(np.count_nonzero(~np.isin(store_set, span_set)))
    return pd.DataFrame({
        "n_span_refs": [len(span_set)],
        "n_payloads": [len(store_set)],
        "n_orphan_refs": [orphans],
        "n_unreferenced_payloads": [unreferenced]})


def media_size_quantiles(sf_dir: str):
    """Per-format payload-size quantiles (p50/p90/p99 bytes) — the
    capacity-planning profile that sizes media batch/block knobs.

    Exact and streaming: per-(format, nbytes) counts reduce through
    combiner partials (the distinct-size grid is bounded by the format
    geometry, not the corpus), and the driver replays DuckDB's
    ``quantile_cont`` interpolation bit-for-bit from the grid
    (``quantile_cont_from_grid``).  The payload column never leaves
    the worker — only its length does."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             quantile_cont_from_grid)

    ds = _media_ds(sf_dir, columns=["media_ref", "data"])

    def partial(batch: pa.Table) -> pa.Table:
        data = batch.column("data")
        fmt = pc.if_else(
            pc.equal(pc.binary_slice(data, 0, 5),
                     pa.scalar(b"CHQ1\n", pa.binary())),
            "chq1", "unknown")
        t = pa.table({"format": fmt,
                      "nbytes": pc.binary_length(data).cast(pa.int64()),
                      "n": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["format", "nbytes"]).aggregate([("n", "sum")])
        return g.rename_columns(["format", "nbytes", "n"])

    grid = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=DEFAULT_MEDIA_BATCH),
        ["format", "nbytes"], ["n"]).materialize())
    if grid is None or grid.num_rows == 0:
        return pd.DataFrame({"format": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "p50_bytes": pd.Series([], dtype="float64"),
                             "p90_bytes": pd.Series([], dtype="float64"),
                             "p99_bytes": pd.Series([], dtype="float64")})
    gdf = grid.to_pandas().sort_values(["format", "nbytes"])
    rows = []
    for fmt, g in gdf.groupby("format", sort=True):
        v = g["nbytes"].to_numpy(dtype="float64")
        c = g["n"].to_numpy()
        rows.append({
            "format": fmt, "n": int(c.sum()),
            "p50_bytes": quantile_cont_from_grid(v, c, 0.50),
            "p90_bytes": quantile_cont_from_grid(v, c, 0.90),
            "p99_bytes": quantile_cont_from_grid(v, c, 0.99)})
    return pd.DataFrame(rows)


def multimodal_queries() -> dict[str, Callable]:
    return {
        "media_decode_stats": media_decode_stats,
        "media_size_quantiles": media_size_quantiles,
        "media_dedup_exact": media_dedup_exact,
        "media_integrity_audit": media_integrity_audit,
        "media_resize_plan": media_resize_plan,
        "media_frame_sample": media_frame_sample,
        "media_audio_features": media_audio_features,
        "media_embed_neighbors": media_embed_neighbors,
        "media_roi_plan": media_roi_plan,
        "media_handwriting": media_handwriting,
        "media_bestof_variants": media_bestof_variants,
    }


# --- DuckDB oracles ---------------------------------------------------
# The driver's correctness pass runs at sf0.01 over the generated
# fixture (no pre-registered view exists for the media store), so these
# oracles read the fixture parquet by absolute path.  ``ensure_fixture``
# is invoked here so the files exist regardless of whether the driver
# runs the SQL or the Ray query first (generation is cached/idempotent).
ORACLE_SF_DIR = "sf0.01"

# CHQ1 magic bytes ("CHQ1\n") as hex — DuckDB 1.0 has no blob
# substring, but hex(data) LIKE is an exact prefix test.
_CHQ1_HEX_PREFIX = "434851310A%"


def _media_glob() -> str:
    fixture = ensure_fixture(ORACLE_SF_DIR)
    return f"{fixture}/media/*/data.parquet"


def multimodal_oracle_sql() -> dict[str, str]:
    glob = _media_glob()
    decode_stats = f"""
WITH m AS (
  SELECT CASE WHEN hex(data) LIKE '{_CHQ1_HEX_PREFIX}'
              THEN 'chq1' ELSE 'unknown' END AS format,
         width, height, octet_length(data) AS nbytes
  FROM read_parquet('{glob}'))
SELECT format,
       count(*) AS n,
       round(avg(CASE WHEN format = 'chq1' THEN width  ELSE 0 END), 4)
           AS mean_width,
       round(avg(CASE WHEN format = 'chq1' THEN height ELSE 0 END), 4)
           AS mean_height,
       CAST(sum(nbytes) AS BIGINT) AS total_bytes
FROM m
GROUP BY format
"""
    resize_plan = f"""
SELECT media_ref,
       round(1200.0 / greatest(width, height), 6)       AS scale_factor,
       CAST(floor(width  * (1200.0 / greatest(width, height))) AS INTEGER)
           AS processed_w,
       CAST(floor(height * (1200.0 / greatest(width, height))) AS INTEGER)
           AS processed_h
FROM read_parquet('{glob}')
"""
    frame_sample = f"""
SELECT media_ref,
       CAST(least(16, (greatest(1, octet_length(data) // 8192) + 29) // 30)
            AS INTEGER) AS n_sampled
FROM read_parquet('{glob}')
"""
    audio_features = f"""
SELECT media_ref,
       CAST((least(octet_length(data), 262144) + 4095) // 4096 AS INTEGER)
           AS n_windows
FROM read_parquet('{glob}')
"""
    roi_plan = f"""
WITH c(roi, cascade_order, fy0, fy1, fx0, fx1) AS (VALUES
    ('issuer_zone',  0, 0.40, 0.90, 0.35, 1.00),
    ('bottom_right', 1, 0.55, 1.00, 0.50, 1.00),
    ('bottom_half',  2, 0.50, 1.00, 0.00, 1.00),
    ('full_image',   3, 0.00, 1.00, 0.00, 1.00))
SELECT m.media_ref, c.roi, CAST(c.cascade_order AS INTEGER) AS cascade_order,
       -- fractions must multiply as DOUBLE (not DECIMAL) to truncate
       -- exactly like the engine's float64 int(h * frac)
       CAST(floor(m.height * c.fy0::DOUBLE) AS INTEGER) AS y0,
       CAST(floor(m.height * c.fy1::DOUBLE) AS INTEGER) AS y1,
       CAST(floor(m.width  * c.fx0::DOUBLE) AS INTEGER) AS x0,
       CAST(floor(m.width  * c.fx1::DOUBLE) AS INTEGER) AS x1
FROM read_parquet('{glob}') m CROSS JOIN c
"""
    dedup_exact = f"""
SELECT md5(hex(data)) AS fp, count(*) AS n_copies,
       min(media_ref) AS keeper_ref
FROM read_parquet('{glob}')
GROUP BY fp
"""
    cheques_glob = f"{ensure_fixture(ORACLE_SF_DIR)}/cheques/*.parquet"
    integrity_audit = f"""
WITH r AS (
  SELECT DISTINCT s.media_ref AS ref
  FROM (SELECT unnest(spans) AS s FROM read_parquet('{cheques_glob}'))
  WHERE s.kind = 'image'),
p AS (SELECT DISTINCT media_ref AS ref FROM read_parquet('{glob}'))
SELECT (SELECT count(*) FROM r) AS n_span_refs,
       (SELECT count(*) FROM p) AS n_payloads,
       (SELECT count(*) FROM r
        WHERE ref NOT IN (SELECT ref FROM p)) AS n_orphan_refs,
       (SELECT count(*) FROM p
        WHERE ref NOT IN (SELECT ref FROM r))
           AS n_unreferenced_payloads
"""
    size_quantiles = f"""
WITH m AS (
  SELECT CASE WHEN hex(data) LIKE '{_CHQ1_HEX_PREFIX}'
              THEN 'chq1' ELSE 'unknown' END AS format,
         octet_length(data) AS nbytes
  FROM read_parquet('{glob}'))
SELECT format, count(*) AS n,
       quantile_cont(nbytes, 0.50) AS p50_bytes,
       quantile_cont(nbytes, 0.90) AS p90_bytes,
       quantile_cont(nbytes, 0.99) AS p99_bytes
FROM m
GROUP BY format
ORDER BY format
"""
    return {
        "media_integrity_audit": integrity_audit,
        "media_decode_stats": decode_stats,
        "media_dedup_exact": dedup_exact,
        "media_resize_plan": resize_plan,
        "media_frame_sample": frame_sample,
        "media_audio_features": audio_features,
        "media_roi_plan": roi_plan,
        "media_size_quantiles": size_quantiles,
    }
