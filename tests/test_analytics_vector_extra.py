"""Histogram / lag-delta / range-search vs in-process references."""

import numpy as np
import pandas as pd


def _events(tmp_path, n=800, users=20, seed=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime("2025-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "user_id": rng.integers(0, users, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": (rng.integers(1, 49000, n) / 100.0),
        "props": "{}"})
    df.to_parquet(tmp_path / "events.parquet")
    return df


def test_histogram_matches_pandas(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import (
        BIN_WIDTH, events_value_histogram)
    df = _events(tmp_path)
    out = events_value_histogram(str(tmp_path)).to_pandas() \
        .sort_values(["event_type", "bin"]).reset_index(drop=True)
    ref = df.assign(bin=np.floor(df["value"] / BIN_WIDTH).astype(int)) \
        .groupby(["event_type", "bin"]) \
        .agg(n_events=("value", "size"), sum_value=("value", "sum")) \
        .reset_index().sort_values(["event_type", "bin"]) \
        .reset_index(drop=True)
    assert (out["n_events"].to_numpy() == ref["n_events"].to_numpy()).all()
    assert np.allclose(out["sum_value"], ref["sum_value"], atol=1e-6)


def test_lag_delta_matches_pandas(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_lag_delta
    df = _events(tmp_path)
    out = events_lag_delta(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        if len(cents) < 2:
            continue
        d = np.diff(cents)
        rows.append((uid, len(d), np.abs(d).max() / 100.0))
    ref = pd.DataFrame(rows, columns=["user_id", "n_deltas",
                                      "max_abs_delta"])
    assert (out["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()
    assert (out["n_deltas"].to_numpy() == ref["n_deltas"].to_numpy()).all()
    assert np.array_equal(out["max_abs_delta"].to_numpy(),
                          ref["max_abs_delta"].to_numpy())


def test_range_search_matches_bruteforce(tmp_path):
    from cheque_ocr_project_ray.vector.ann import range_search
    import ray.data
    rng = np.random.default_rng(9)
    n, d = 300, 16
    m = rng.standard_normal((n, d)).astype(np.float32)
    emb = pd.DataFrame({"vec_id": np.arange(n),
                        "embedding": list(m),
                        "label": np.zeros(n, np.int32)})
    emb.to_parquet(tmp_path / "embeddings.parquet")
    ds = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    qids = np.array([0, 1], np.int64)
    out = range_search(ds, qids, m[:2].astype(np.float64), 0.2) \
        .to_pandas().sort_values(["query_id", "vec_id"]) \
        .reset_index(drop=True)

    md = m.astype(np.float64)
    mn = md / np.linalg.norm(md, axis=1)[:, None]
    cos = mn @ mn[:2].T
    from cheque_ocr_project_ray.util import round_half_up
    cos = round_half_up(cos, 5)
    pairs = [(int(q), int(v), cos[v, qi])
             for qi, q in enumerate(qids) for v in range(n)
             if v != q and cos[v, qi] >= 0.2]
    ref = pd.DataFrame(pairs, columns=["query_id", "vec_id", "cos"]) \
        .sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert len(out) == len(ref) > 0
    assert (out["vec_id"].to_numpy() == ref["vec_id"].to_numpy()).all()
    assert np.array_equal(out["cos"].to_numpy(), ref["cos"].to_numpy())


def test_keyword_search_and_semantics(tmp_path):
    from cheque_ocr_project_ray.text.queries import doc_keyword_search
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["hash join merge",          # all three -> 3 hits
                 "hash hash join merge",     # all three -> 4 hits
                 "hash join",                # missing 'merge' -> drop
                 ""],                        # empty -> drop
        "lang": "en", "source": "s", "n_chars": 0})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = doc_keyword_search(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["total_hits"]) == [3, 4]


def test_range_join_straddles_buckets(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_range_join
    # probe user 0's first event at 00:30 -> window [00:30, 02:30):
    # spans three hour buckets; events at 00:29 (out), 00:30 (in),
    # 01:59 (in), 02:29 (in), 02:30 (out)
    ts = pd.to_datetime([
        "2024-01-01 00:30:00",   # probe user's first event (in window)
        "2024-01-01 00:29:00",   # before t0
        "2024-01-01 01:59:00",   # in
        "2024-01-01 02:29:00",   # in
        "2024-01-01 02:30:00"])  # == t1 -> out
    df = pd.DataFrame({
        "event_id": np.arange(5),
        "ts": ts,
        "user_id": [0, 999, 999, 999, 999],
        "event_type": "a",
        "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        "props": "{}"})
    df.to_parquet(tmp_path / "events.parquet")
    out = events_range_join(str(tmp_path)).to_pandas()
    assert list(out["window_id"]) == [0]
    assert list(out["n_events"]) == [3]
    assert np.allclose(out["sum_value"], [13.0])


def test_quantile_sketch_error_bound(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_value_quantile_sketch
    from cheque_ocr_project_ray.sketch import QSK_WIDTH
    df = _events(tmp_path, n=3000, users=30, seed=11)
    out = events_value_quantile_sketch(str(tmp_path)) \
        .sort_values("event_type").reset_index(drop=True)
    for _, row in out.iterrows():
        vals = df.loc[df["event_type"] == row["event_type"], "value"]
        # guarantee: estimate shares a bin with the floor-rank order
        # statistic (the interpolated quantile can sit a sparse-data
        # gap away, which no histogram sketch bounds)
        assert abs(row["p50_est"]
                   - np.quantile(vals, 0.5, method="lower")) <= QSK_WIDTH
        assert abs(row["p90_est"]
                   - np.quantile(vals, 0.9, method="lower")) <= QSK_WIDTH
        assert row["n"] == len(vals)


def test_qsketch_merge_order_independent():
    from cheque_ocr_project_ray.sketch import (qsketch_merge,
                                               qsketch_partial,
                                               qsketch_quantile)
    rng = np.random.default_rng(2)
    v = rng.uniform(0, 500, 5000)
    parts = [qsketch_partial(v[i::5]).tobytes() for i in range(5)]
    a = qsketch_merge(parts)
    b = qsketch_merge(parts[::-1])
    assert np.array_equal(a, b)
    assert qsketch_quantile(a, 0.5) == qsketch_quantile(b, 0.5)


def test_source_dup_rate_counts_dups(tmp_path):
    from cheque_ocr_project_ray.text.queries import doc_source_dup_rate
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["same", "same", "uniq1", "same", "uniq2", "uniq3"],
        "lang": "en",
        "source": ["a", "a", "a", "b", "b", "b"],
        "n_chars": 4})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = doc_source_dup_rate(str(tmp_path)).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    assert list(out["n_docs"]) == [3, 3]
    assert list(out["n_dups"]) == [2, 1]   # 'same' x3 spans sources
    assert np.allclose(out["dup_rate"], [0.6667, 0.3333])


def test_orders_cube_levels(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import \
        orders_cube
    orders = pd.DataFrame({
        "o_orderkey": range(4),
        "o_custkey": 0,
        "o_orderstatus": ["F", "O", "F", "O"],
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"],
        "o_totalprice": [10.0, 20.0, 30.0, 40.0],
        "o_orderdate": pd.to_datetime(["1996-01-01"] * 4)})
    orders.to_parquet(tmp_path / "orders.parquet")
    out = orders_cube(str(tmp_path)).to_pandas()
    assert len(out) == 4 + 2 + 2 + 1          # fine + by_p + by_s + total
    tot = out[(out["o_orderpriority"] == "ALL")
              & (out["o_orderstatus"] == "ALL")]
    assert tot["n_orders"].iloc[0] == 4
    assert np.isclose(tot["total_price"].iloc[0], 100.0)


def test_ann_recall_eval_bounds():
    from cheque_ocr_project_ray.vector.queries import ann_recall_eval
    out = ann_recall_eval("/root/testdata/sf0.001")
    assert set(out["method"]) == {"lsh", "ivf", "pq"}
    assert ((out["recall_at_10"] >= 0) & (out["recall_at_10"] <= 1)).all()
    # both approximate paths must find at least part of the true top-10
    assert (out["recall_at_10"] > 0).any()


def test_embedding_dim_stats_planted(tmp_path, ray_session):
    """Known per-dimension moments: dim0 mean 3 / var 8/3, dim1
    mean 12 / var 8 — std via the same moment identity both engines
    use."""
    import math
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.vector.queries import embedding_dim_stats
    vecs = [[1.0, 10.0], [3.0, 10.0], [5.0, 16.0]]
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32())}),
        tmp_path / "embeddings.parquet")
    out = embedding_dim_stats(str(tmp_path))
    assert out["dim"].tolist() == [0, 1]
    assert out["n_vals"].tolist() == [3, 3]
    assert out["avg_val"].tolist() == [3.0, 12.0]
    assert out["min_val"].tolist() == [1.0, 10.0]
    assert out["max_val"].tolist() == [5.0, 16.0]
    assert abs(out["std_val"][0] - math.sqrt(8.0 / 3.0)) < 1e-6
    assert abs(out["std_val"][1] - math.sqrt(8.0)) < 1e-6


def test_embedding_label_separation_planted(tmp_path, ray_session):
    """Label 0 = {(1,0), (0,1)}: intra mean dot = (S·S - Q)/(n(n-1))
    = (2-2)/2 = 0 over 1 pair; label 1 = {(2,2)}: no intra row (n<2);
    inter = S0·S1/(n0*n1) = 4/2 = 2 over 2 pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cheque_ocr_project_ray.vector.queries import \
        embedding_label_separation
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32())}),
        tmp_path / "embeddings.parquet")
    out = embedding_label_separation(str(tmp_path))
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        (0, 0, 1, 0.0), (0, 1, 2, 2.0)]


def test_dim_correlation_planted(tmp_path, ray_session):
    """Dims engineered as [x, 2x, -x]: corr(0,1) = 1, corr(0,2) = -1,
    corr(1,2) = -1."""
    import pandas as pd
    from cheque_ocr_project_ray.vector.queries import \
        embedding_dim_correlation
    pd.DataFrame({
        "vec_id": [1, 2, 3],
        "embedding": [[1.0, 2.0, -1.0], [2.0, 4.0, -2.0],
                      [4.0, 8.0, -4.0]]}) \
        .to_parquet(tmp_path / "embeddings.parquet")
    out = embedding_dim_correlation(str(tmp_path))
    assert list(zip(out["i"], out["j"])) == [(0, 1), (0, 2), (1, 2)]
    assert out["corr"].tolist() == [1.0, -1.0, -1.0]
