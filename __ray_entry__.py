"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()``/``ray.shutdown()`` here or in the library code.

``queries()`` returns one callable per implemented pipeline/operator
(SURVEY.md §2); each takes an ``sf_dir``.  The cheque pipelines run on
the deterministic Lance-shaped synthetic corpus generated per tier
(FIXTURES.md — the provided sf dirs carry no cheque table, so the
corpus is a pure function of (seed, tier); generation is cached under
/tmp).  The text/vector/relational pipelines run directly on the
provided parquet tables and carry DuckDB oracles in ``oracle_sql()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship cheque-extraction pipeline on the sf0.001 tier."""
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline

    fixture = ensure_fixture("/root/testdata/sf0.001")
    return build_cheque_pipeline(fixture)


def _cheque_queries() -> dict[str, Callable[[str], Any]]:
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline

    def cheque_extract(sf_dir: str):
        ds = build_cheque_pipeline(ensure_fixture(sf_dir))
        return ds.drop_columns(["spans_out"])  # flat columns for the driver

    def cheque_spans(sf_dir: str):
        ds = build_cheque_pipeline(ensure_fixture(sf_dir))
        return ds.select_columns(["doc_id", "spans_out"])

    def cheque_status_histogram(sf_dir: str):
        from cheque_ocr_project_ray.pipelines.metrics import status_histogram
        return status_histogram(build_cheque_pipeline(ensure_fixture(sf_dir)))

    def cheque_final_join(sf_dir: str):
        from cheque_ocr_project_ray.pipelines.sink import join_results_to_meta
        fixture = ensure_fixture(sf_dir)
        return join_results_to_meta(build_cheque_pipeline(fixture), fixture)

    def cheque_checkpoint_rollup(sf_dir: str):
        import shutil
        import tempfile
        import pandas as pd
        from cheque_ocr_project_ray.pipelines.checkpoint import (
            rollup_metrics, write_checkpointed)
        fixture = ensure_fixture(sf_dir)
        out = tempfile.mkdtemp(prefix="chq_ckpt_")
        try:
            write_checkpointed(build_cheque_pipeline(fixture), out,
                               num_partitions=16)
            roll = rollup_metrics(out)
        finally:
            shutil.rmtree(out, ignore_errors=True)
        roll.pop("max_partition_wall_s", None)  # timing is run-dependent
        import json as _json
        roll["status_counts"] = _json.dumps(roll.get("status_counts", {}),
                                            sort_keys=True)
        return pd.DataFrame([roll])

    def cheque_run_summary(sf_dir: str):
        import pandas as pd
        from cheque_ocr_project_ray.pipelines.metrics import run_summary
        from cheque_ocr_project_ray.util import round_half_up
        summary = run_summary(build_cheque_pipeline(ensure_fixture(sf_dir)))
        for k in ("mean_confidence", "min_confidence", "max_confidence"):
            # DuckDB round() semantics, not python banker's rounding
            summary[k] = float(round_half_up(summary[k], 4))
        return pd.DataFrame([summary])

    def cheque_status_histogram_v3(sf_dir: str):
        """Status histogram under the V3 seven-state REVIEW ladder
        (IssuerBatchProcessorV3.py:446-473; threshold 0.85 is V3's
        default, :519)."""
        from cheque_ocr_project_ray.config import DEFAULT_CONFIG
        from cheque_ocr_project_ray.pipelines.metrics import status_histogram
        cfg = DEFAULT_CONFIG.with_overrides(status_ladder="v3",
                                            threshold=0.85)
        return status_histogram(
            build_cheque_pipeline(ensure_fixture(sf_dir), cfg=cfg))

    def cheque_review_queue(sf_dir: str, k: int = 50):
        """The V3 human-review worklist: lowest-confidence REVIEW-state
        docs first (IssuerBatchProcessorV3.py:446-473 drives a manual
        queue exactly like this).  Per-batch local bottom-k before the
        tiny global sort — no full sort of the corpus."""
        import pyarrow as pa
        import pyarrow.compute as pc
        from cheque_ocr_project_ray.config import DEFAULT_CONFIG
        from cheque_ocr_project_ray.util import round_half_up

        cfg = DEFAULT_CONFIG.with_overrides(status_ladder="v3",
                                            threshold=0.85)
        ds = build_cheque_pipeline(ensure_fixture(sf_dir), cfg=cfg)

        def local_bottomk(batch: pa.Table) -> pa.Table:
            keep = pc.is_in(batch.column("status"),
                            value_set=pa.array(["REVIEW",
                                                "REVIEW-SHORT"]))
            b = batch.filter(keep)
            conf = pa.array(round_half_up(
                b.column("issuer_conf").to_numpy(zero_copy_only=False),
                4), pa.float64())
            t = pa.table({"doc_id": b.column("doc_id"),
                          "issuer": b.column("issuer"),
                          "issuer_conf": conf,
                          "status": b.column("status")})
            idx = pc.select_k_unstable(
                t, k, [("issuer_conf", "ascending"),
                       ("doc_id", "ascending")])
            return t.take(idx)

        return ds.map_batches(local_bottomk, batch_format="pyarrow") \
            .sort(["issuer_conf", "doc_id"]).limit(k)

    def cheque_status_profile(sf_dir: str):
        """Per-status operational profile: doc count, mean extraction
        confidence, and total media bytes — the triage dashboard row
        (how much scan volume sits in each outcome bucket)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        from cheque_ocr_project_ray.util import (final_merge_sums,
                                                 round_half_up)

        ds = build_cheque_pipeline(ensure_fixture(sf_dir))

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({
                "status": batch.column("status"),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "conf_sum": batch.column("confidence"),
                "media_bytes": batch.column("media_bytes")})
            g = t.group_by("status").aggregate(
                [("n", "sum"), ("conf_sum", "sum"),
                 ("media_bytes", "sum")])
            return g.rename_columns(["status", "n", "conf_sum",
                                     "media_bytes"])

        agg = final_merge_sums(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["status"], ["n", "conf_sum", "media_bytes"])

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "status": b["status"],
                "n": b["n"],
                "mean_confidence": round_half_up(
                    b["conf_sum"] / b["n"], 4),
                "total_media_bytes": b["media_bytes"]})

        return agg.map_batches(finish, batch_format="pandas")

    def cheque_type_profile(sf_dir: str):
        """Per-cheque-type extraction scorecard: volume, government
        share, mean confidence and amount/date field-hit counts — the
        classifier-output dashboard next to the status ladder
        (cheque_classifier.py's 15-type enum drives routing; this is
        the per-route quality readout).  Same one-pass combiner +
        bounded merge shape as ``cheque_status_profile``: the driver
        folds only the |types| × n_blocks grid."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        from cheque_ocr_project_ray.util import (final_merge_sums,
                                                 round_half_up)

        ds = build_cheque_pipeline(ensure_fixture(sf_dir))

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({
                "cheque_type": batch.column("cheque_type"),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_government": pc.cast(
                    batch.column("is_government"), pa.int64()),
                "conf_sum": batch.column("confidence"),
                "n_with_amount": pc.cast(
                    pc.not_equal(batch.column("amount"), ""),
                    pa.int64()),
                "n_with_date": pc.cast(
                    pc.not_equal(batch.column("date"), ""),
                    pa.int64())})
            g = t.group_by("cheque_type").aggregate(
                [("n", "sum"), ("n_government", "sum"),
                 ("conf_sum", "sum"), ("n_with_amount", "sum"),
                 ("n_with_date", "sum")])
            return g.rename_columns(["cheque_type", "n",
                                     "n_government", "conf_sum",
                                     "n_with_amount", "n_with_date"])

        agg = final_merge_sums(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["cheque_type"], ["n", "n_government", "conf_sum",
                              "n_with_amount", "n_with_date"])

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "cheque_type": b["cheque_type"],
                "n": b["n"],
                "n_government": b["n_government"],
                "mean_confidence": round_half_up(
                    b["conf_sum"] / b["n"], 4),
                "n_with_amount": b["n_with_amount"],
                "n_with_date": b["n_with_date"]})

        return agg.map_batches(finish, batch_format="pandas")

    def cheque_extract_ai(sf_dir: str):
        """The EP3 deterministic AI-ensemble flow (A2/A3,
        ai_processor.py:229-381): NER-stand-in candidates + spelling +
        context legs, hardcoded .5/.2/.3 per-field ensemble, overall
        .4/.4/.2.  Failed-OCR docs are dropped (AIWriter semantics)."""
        from cheque_ocr_project_ray.pipelines.cheque import build_ai_pipeline
        return build_ai_pipeline(ensure_fixture(sf_dir))

    def cheque_spelling_fix(sf_dir: str):
        """Post-extraction issuer spelling cleanup (M22,
        dbf_processor.py:117-128 applied to every extracted issuer)."""
        import pyarrow as pa
        from cheque_ocr_project_ray.functions.spelling import correct_spelling

        ds = build_cheque_pipeline(ensure_fixture(sf_dir))

        def fix(batch: pa.Table) -> pa.Table:
            issuers = batch.column("issuer").to_pylist()
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "issuer": batch.column("issuer"),
                "issuer_fixed": pa.array(
                    [correct_spelling(x) for x in issuers], pa.string()),
                "issuer_conf": batch.column("issuer_conf"),
            })

        return ds.map_batches(fix, batch_format="pyarrow")

    def cheque_spans_json(sf_dir: str):
        """The north-rule per-row invariant as a driver-checkable
        surface: the full output span sequence (kind, text, media_ref,
        order) per doc, canonically serialized.  The oracle side is
        the sequentially-materialized row-at-a-time oracle
        (fixtures/expected.py), so a green row = span-sequence
        equality verified by the driver, not just pytest."""
        import pyarrow as pa
        from cheque_ocr_project_ray.fixtures.expected import spans_to_json

        ds = build_cheque_pipeline(ensure_fixture(sf_dir))

        def serialize(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "spans_json": pa.array(
                    [spans_to_json(s)
                     for s in batch.column("spans_out").to_pylist()],
                    pa.string()),
            })

        return ds.map_batches(serialize, batch_format="pyarrow")

    def cheque_bank_csv(sf_dir: str):
        """The 7-column bank CSV export (K2, custom_csv.py:48-81) with
        doc_id added for the driver's row identity."""
        from cheque_ocr_project_ray.pipelines.sink import to_bank_csv
        fixture = ensure_fixture(sf_dir)
        return to_bank_csv(build_cheque_pipeline(fixture), fixture,
                           include_doc_id=True)

    def cheque_issuer_dbf(sf_dir: str):
        """The second output-DBF projection (parallel_processor.py:
        186-213): ISSUER/FNAME/CONFID/PROCDT with reference widths."""
        from cheque_ocr_project_ray.pipelines.sink import to_issuer_dbf
        fixture = ensure_fixture(sf_dir)
        return to_issuer_dbf(build_cheque_pipeline(fixture), fixture)

    def cheque_latency_stats(sf_dir: str):
        """G3 latency roll-up over the deterministic per-doc cost
        surface (mean/median/min/max/total, fast_ai_processor.py:
        286-293 semantics; exact quantile_cont median)."""
        from cheque_ocr_project_ray.config import DEFAULT_CONFIG
        from cheque_ocr_project_ray.pipelines.metrics import latency_stats
        return latency_stats(
            build_cheque_pipeline(ensure_fixture(sf_dir)),
            work_passes=DEFAULT_CONFIG.ocr_work_passes)

    def cheque_filename_fields(sf_dir: str):
        from cheque_ocr_project_ray.functions.filename_fields import (
            filename_fields_batch)
        from cheque_ocr_project_ray.sources.io import read_meta
        meta = read_meta(ensure_fixture(sf_dir),
                         columns=["doc_id", "image_file"])
        return meta.map_batches(filename_fields_batch, batch_format="pyarrow")

    def cheque_span_explode(sf_dir: str):
        """Interleaved table → one row per span (the relational view
        of the Lance-shaped input; vectorized list_flatten)."""
        from cheque_ocr_project_ray.sources.io import read_cheques
        from cheque_ocr_project_ray.spans import explode_spans
        return explode_spans(read_cheques(ensure_fixture(sf_dir)))

    def cheque_span_stats(sf_dir: str):
        """Per-doc span-composition stats over the interleaved table."""
        from cheque_ocr_project_ray.sources.io import read_cheques
        from cheque_ocr_project_ray.spans import span_stats
        return span_stats(read_cheques(ensure_fixture(sf_dir)))

    def cheque_span_roundtrip(sf_dir: str):
        """explode → reassemble → canonical JSON: proves the span-row
        relational view is lossless (kind, text, media_ref, order all
        survive the round trip) against a straight-from-parquet
        serialization oracle."""
        from cheque_ocr_project_ray.sources.io import read_cheques
        from cheque_ocr_project_ray.spans import (
            assemble_spans, explode_spans, spans_json_batch)
        flat = explode_spans(read_cheques(ensure_fixture(sf_dir)))
        return assemble_spans(flat).map_batches(spans_json_batch,
                                                batch_format="pyarrow")

    def cheque_ladder_diff(sf_dir: str):
        """Agreement matrix between the v1 ladder
        (issuer_processor_v.py AUTO-UPDATED/REJECTED/ERROR) and the V3
        seven-state REVIEW ladder (IssuerBatchProcessorV3.py:446-473,
        threshold 0.85) — the migration-impact report a user runs
        before switching ladders.

        The two pipeline runs project to (doc_id, status) and
        MATERIALIZE sequentially before the join: concurrent cheque
        pipelines would sum their actor-pool minimum reservations (the
        union-branch deadlock documented on pipelines/cheque.py), and
        the projected stream is two narrow columns (at true corpus
        scale, spill the projection to parquet and join the re-read).
        The join is the partitioned hash join; counts reduce through
        combiner partials."""
        import numpy as np
        import pyarrow as pa

        from cheque_ocr_project_ray.config import DEFAULT_CONFIG
        from cheque_ocr_project_ray.relational.joins import hash_join
        from cheque_ocr_project_ray.util import final_merge_sums

        fixture = ensure_fixture(sf_dir)

        def project(ds, name):
            def ren(b: pa.Table) -> pa.Table:
                return pa.table({"doc_id": b.column("doc_id"),
                                 name: b.column("status")})
            return ds.select_columns(["doc_id", "status"]) \
                .map_batches(ren, batch_format="pyarrow").materialize()

        v1 = project(build_cheque_pipeline(fixture), "status_v1")
        cfg = DEFAULT_CONFIG.with_overrides(status_ladder="v3",
                                            threshold=0.85)
        v3 = project(build_cheque_pipeline(fixture, cfg=cfg),
                     "status_v3")
        joined = hash_join(v1, v3, on="doc_id")

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table({"status_v1": batch.column("status_v1"),
                          "status_v3": batch.column("status_v3"),
                          "n": pa.array(np.ones(batch.num_rows,
                                                np.int64))})
            g = t.group_by(["status_v1", "status_v3"]).aggregate(
                [("n", "sum")])
            return g.rename_columns(["status_v1", "status_v3", "n"])

        return final_merge_sums(
            joined.map_batches(partial, batch_format="pyarrow"),
            ["status_v1", "status_v3"], ["n"]) \
            .sort(["status_v1", "status_v3"])

    return {
        "cheque_extract": cheque_extract,
        "cheque_ladder_diff": cheque_ladder_diff,
        "cheque_spans": cheque_spans,
        "cheque_spans_json": cheque_spans_json,
        "cheque_status_histogram": cheque_status_histogram,
        "cheque_status_histogram_v3": cheque_status_histogram_v3,
        "cheque_review_queue": cheque_review_queue,
        "cheque_status_profile": cheque_status_profile,
        "cheque_type_profile": cheque_type_profile,
        "cheque_extract_ai": cheque_extract_ai,
        "cheque_spelling_fix": cheque_spelling_fix,
        "cheque_final_join": cheque_final_join,
        "cheque_bank_csv": cheque_bank_csv,
        "cheque_issuer_dbf": cheque_issuer_dbf,
        "cheque_latency_stats": cheque_latency_stats,
        "cheque_checkpoint_rollup": cheque_checkpoint_rollup,
        "cheque_filename_fields": cheque_filename_fields,
        "cheque_span_explode": cheque_span_explode,
        "cheque_span_stats": cheque_span_stats,
        "cheque_span_roundtrip": cheque_span_roundtrip,
        "cheque_run_summary": cheque_run_summary,
    }


# the cost-model constant baked into cheque_extract / latency SQL —
# must equal DEFAULT_CONFIG.ocr_work_passes (imported lazily below)
def _work_passes() -> int:
    from cheque_ocr_project_ray.config import DEFAULT_CONFIG
    return DEFAULT_CONFIG.ocr_work_passes


_FILENAME_FIELDS_SQL = r"""
SELECT doc_id, image_file,
       CASE WHEN regexp_extract(image_file, '\d+\.\d{2}') = ''
            THEN '0.00' ELSE regexp_extract(image_file, '\d+\.\d{2}') END
           AS amount,
       CASE WHEN regexp_extract(image_file, '\d+') = ''
            THEN '0' ELSE regexp_extract(image_file, '\d+') END
           AS account,
       regexp_extract(image_file, '\d{8}') AS date
FROM read_parquet('<META>')
"""


def _cheque_oracle_sql() -> dict[str, str]:
    """Oracles for the cheque family.

    Two kinds, stated plainly so the verification layers aren't
    conflated:

    * ``cheque_filename_fields`` is pure SQL over the RAW fixture
      (regexp_extract — fully independent re-derivation).
    * Every other entry is SQL over ``expected/expected.parquet``: the
      row-at-a-time oracle (``oracle.py``) executed SEQUENTIALLY, with
      no Ray, by ``fixtures/expected.py``.  The extraction cascade is
      not SQL-expressible, so the driver's check becomes: distributed
      Ray composition == sequential oracle, row-for-row — the same
      invariant the pytest span suite asserts, but now independently
      executed and hashed by the driver.  Aggregate/join queries
      (histogram, run summary, final join, rollup) re-derive their
      aggregation/join logic in REAL SQL from that per-row base, so
      the Ray-side groupbys/joins are still cross-checked against
      DuckDB's.

    The driver's correctness pass runs at sf=0.01; the fixture has no
    pre-registered view, so the SQL reads generated parquet by
    absolute path (``ensure_expected`` makes it exist regardless of
    Ray-vs-SQL execution order; generation is cached/idempotent).
    """
    from cheque_ocr_project_ray.fixtures.expected import ensure_expected
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture

    from cheque_ocr_project_ray.spans import (
        span_explode_sql, span_roundtrip_sql, span_stats_sql)

    _WORK_PASSES = _work_passes()
    fixture = ensure_fixture("sf0.01")
    meta = f"{fixture}/meta/meta.parquet"
    cheques = f"{fixture}/cheques/*.parquet"
    exp = f"{ensure_expected('sf0.01')}/expected.parquet"
    return {
        "cheque_filename_fields": _FILENAME_FIELDS_SQL.replace("<META>", meta),
        "cheque_span_explode": span_explode_sql(cheques),
        "cheque_span_stats": span_stats_sql(cheques),
        "cheque_span_roundtrip": span_roundtrip_sql(cheques),
        "cheque_extract": f"""
SELECT doc_id, cheque_type, is_government, govt_category, payee_raw,
       payee, issuer, issuer_conf, confidence, status, micr, amount,
       "date", media_bytes,
       CAST(media_bytes * {_WORK_PASSES} AS DOUBLE) / 1000.0 AS cost_ms
FROM read_parquet('{exp}')
""",
        "cheque_spans_json": f"""
SELECT doc_id, spans_json FROM read_parquet('{exp}')
""",
        "cheque_status_histogram": f"""
SELECT status, count(*) AS "count()"
FROM read_parquet('{exp}') GROUP BY status
""",
        "cheque_status_histogram_v3": f"""
SELECT status_v3 AS status, count(*) AS "count()"
FROM read_parquet('{exp}') GROUP BY status_v3
""",
        "cheque_ladder_diff": f"""
SELECT status AS status_v1, status_v3, count(*) AS n
FROM read_parquet('{exp}')
GROUP BY status, status_v3
ORDER BY status, status_v3
""",
        "cheque_spelling_fix": f"""
SELECT doc_id, issuer, issuer_fixed, issuer_conf
FROM read_parquet('{exp}')
""",
        # status='ERROR' ⟺ media decode failed (the v1 ladder has no
        # other ERROR source), so the filter is exactly the AI flow's
        # "only write successful ones" (ai_processor.py:471-477)
        "cheque_extract_ai": f"""
SELECT doc_id, payee_ai, payee_conf_ai, payee_method,
       issuer_ai, issuer_conf_ai, issuer_method, overall_conf_ai,
       confidence AS ocr_confidence
FROM read_parquet('{exp}')
WHERE status <> 'ERROR'
""",
        "cheque_status_profile": f"""
SELECT status, count(*) AS n,
       round(sum(confidence) / count(*), 4) AS mean_confidence,
       CAST(sum(media_bytes) AS BIGINT) AS total_media_bytes
FROM read_parquet('{exp}')
GROUP BY status
""",
        "cheque_type_profile": f"""
SELECT cheque_type, count(*) AS n,
       CAST(sum(CAST(is_government AS BIGINT)) AS BIGINT)
           AS n_government,
       round(sum(confidence) / count(*), 4) AS mean_confidence,
       CAST(sum(CASE WHEN amount <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_amount,
       CAST(sum(CASE WHEN date <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_with_date
FROM read_parquet('{exp}')
GROUP BY cheque_type
""",
        "cheque_review_queue": f"""
SELECT doc_id, issuer_v3 AS issuer,
       round(issuer_conf_v3, 4) AS issuer_conf,
       status_v3 AS status
FROM read_parquet('{exp}')
WHERE status_v3 IN ('REVIEW', 'REVIEW-SHORT')
ORDER BY round(issuer_conf_v3, 4), doc_id
LIMIT 50
""",
        "cheque_run_summary": f"""
SELECT count(*) AS processed,
       CAST(sum(CAST(is_government AS BIGINT)) AS BIGINT) AS government,
       round(avg(confidence), 4) AS mean_confidence,
       round(min(confidence), 4) AS min_confidence,
       round(max(confidence), 4) AS max_confidence,
       CAST(sum(media_bytes) AS BIGINT) AS total_media_bytes
FROM read_parquet('{exp}')
""",
        # The projection re-implements sink.join_results_to_meta's
        # DBF-width semantics in SQL (widths issuer_processor_v.py:
        # 186-190, truncation :562, constants :569-571).
        "cheque_final_join": f"""
SELECT e.doc_id,
       -- engine reconstructs '<doc_id>.tiff' when the meta row is
       -- absent (sink.py LEFT-join fallback) — mirror it
       substr(coalesce(m.image_file, e.doc_id || '.tiff'), 1, 50)
           AS image_file,
       substr(e.issuer, 1, 100) AS drawer_nm_out,
       round(e.issuer_conf, 4) AS confidence,
       substr(e.status, 1, 20) AS status,
       CASE WHEN e.status = 'AUTO-UPDATED' THEN substr(e.issuer, 1, 50)
            ELSE substr(coalesce(m.drawer_nm, ''), 1, 50)
       END AS drawer_nm_new,
       CASE WHEN e.status = 'AUTO-UPDATED' THEN 'AS601' ELSE '' END
           AS opr_no,
       CASE WHEN e.status = 'AUTO-UPDATED' THEN FALSE
            ELSE coalesce(m.file_mark, FALSE) END AS file_mark,
       coalesce(m.account, '') AS account,
       coalesce(m.sort_code, '') AS sort_code,
       m.amount AS amount,
       e.cheque_type AS cheque_type
FROM read_parquet('{exp}') e
LEFT JOIN read_parquet('{meta}') m USING (doc_id)
""",
        # filename-derived columns re-derived independently by regex
        # (custom_csv.py:24-46); reference/sort_code are the reference's
        # literal "0" constants (custom_csv.py:61-62)
        "cheque_bank_csv": f"""
SELECT e.doc_id,
       e.payee AS payee,
       regexp_extract(coalesce(m.image_file, e.doc_id || '.tiff'),
                      '\\d{{8}}') AS "date",
       CASE WHEN regexp_extract(coalesce(m.image_file,
                                         e.doc_id || '.tiff'),
                                '\\d+') = ''
            THEN '0'
            ELSE regexp_extract(coalesce(m.image_file,
                                         e.doc_id || '.tiff'), '\\d+')
       END AS account,
       '0' AS reference,
       '0' AS sort_code,
       CASE WHEN regexp_extract(coalesce(m.image_file,
                                         e.doc_id || '.tiff'),
                                '\\d+\\.\\d{{2}}') = ''
            THEN '0.00'
            ELSE regexp_extract(coalesce(m.image_file,
                                         e.doc_id || '.tiff'),
                                '\\d+\\.\\d{{2}}')
       END AS amount,
       coalesce(m.image_file, e.doc_id || '.tiff') AS filename
FROM read_parquet('{exp}') e
LEFT JOIN read_parquet('{meta}') m USING (doc_id)
WHERE e.status <> 'ERROR'
""",
        # widths/fallbacks per parallel_processor.py:186-213; PROCDT is
        # '' (deterministic stand-in for datetime.now())
        "cheque_issuer_dbf": f"""
SELECT e.doc_id,
       substr(CASE WHEN e.issuer = 'XXX' THEN 'UNKNOWN'
                   ELSE e.issuer END, 1, 100) AS issuer_out,
       substr(coalesce(m.image_file, e.doc_id || '.tiff'), 1, 50)
           AS fname,
       round(e.confidence, 2) AS confid,
       '' AS procdt
FROM read_parquet('{exp}') e
LEFT JOIN read_parquet('{meta}') m USING (doc_id)
WHERE e.status <> 'ERROR'
""",
        # exact-int byte sums; median over the same per-row double the
        # engine computes (CAST(bytes*wp AS DOUBLE)/1000.0)
        "cheque_latency_stats": f"""
WITH ok AS (
  SELECT media_bytes,
         CAST(media_bytes * {_WORK_PASSES} AS DOUBLE) / 1000.0 AS cost_ms
  FROM read_parquet('{exp}') WHERE status <> 'ERROR'
)
SELECT count(*) AS n_docs,
       round(CAST(sum(media_bytes) * {_WORK_PASSES} AS DOUBLE)
             / 1000.0 / count(*), 4) AS mean_ms,
       round(median(cost_ms), 4) AS median_ms,
       round(min(cost_ms), 4) AS min_ms,
       round(max(cost_ms), 4) AS max_ms,
       round(CAST(sum(media_bytes) * {_WORK_PASSES} AS DOUBLE)
             / 1000.0 / 1000.0, 4) AS total_s
FROM ok
""",
        # partitions=16 / duplicates_dropped=0 are part of the checked
        # contract: the query writes 16 partitions and the corpus has
        # unique doc_ids, so all 16 must commit and the checkpointed
        # write must not drop or duplicate rows.  status_counts string
        # mirrors json.dumps(..., sort_keys=True).
        "cheque_checkpoint_rollup": f"""
WITH sc AS (
  SELECT status, count(*) AS n
  FROM read_parquet('{exp}') GROUP BY status
)
SELECT CAST(16 AS BIGINT) AS partitions,
       (SELECT count(*) FROM read_parquet('{exp}')) AS "rows",
       CAST(0 AS BIGINT) AS duplicates_dropped,
       (SELECT CAST(sum(media_bytes) AS BIGINT)
        FROM read_parquet('{exp}')) AS media_bytes,
       '{{' || string_agg('"' || status || '": ' || n, ', '
                          ORDER BY status) || '}}' AS status_counts
FROM sc
""",
    }


def queries() -> dict[str, Callable[[str], Any]]:
    # no try/except here: a broken import inside a query family must
    # fail the run loudly, not silently shrink the coverage surface
    from cheque_ocr_project_ray.multimodal.queries import multimodal_queries
    from cheque_ocr_project_ray.relational.queries import relational_queries
    from cheque_ocr_project_ray.text.queries import text_queries
    from cheque_ocr_project_ray.vector.queries import vector_queries

    out: dict[str, Callable[[str], Any]] = {}
    out.update(_cheque_queries())
    out.update(relational_queries())
    out.update(text_queries())
    out.update(vector_queries())
    out.update(multimodal_queries())
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the SQL-expressible queries.

    Queries over the generated corpus get oracles too, reading the
    fixture parquet by absolute path (filename fields, media plans).
    Only genuinely non-SQL semantics (the extraction regex cascade,
    seeded hash families, payload-byte statistics) stay rows-only.
    """
    from cheque_ocr_project_ray.multimodal.queries import multimodal_oracle_sql
    from cheque_ocr_project_ray.relational.queries import relational_oracle_sql
    from cheque_ocr_project_ray.text.queries import text_oracle_sql
    from cheque_ocr_project_ray.vector.queries import vector_oracle_sql

    out: dict[str, str] = {}
    out.update(_cheque_oracle_sql())
    out.update(relational_oracle_sql())
    out.update(text_oracle_sql())
    out.update(vector_oracle_sql())
    out.update(multimodal_oracle_sql())
    return out
