"""Vector similarity-search operator tests against numpy ground truth."""

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from cheque_ocr_project_ray.vector import ann

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def matrix(emb_table):
    return np.asarray(emb_table["embedding"].to_pylist(), dtype=np.float64)


def ground_truth_topk(matrix, ids, q, k):
    qn = q / np.linalg.norm(q)
    cos = (matrix @ qn) / np.linalg.norm(matrix, axis=1)
    order = sorted(zip(-np.round(cos, 5), ids))[:k]
    return [(i, -c) for c, i in order]


def test_brute_force_matches_numpy(emb_table, matrix):
    ids = emb_table["vec_id"].to_pylist()
    q = matrix[3]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = ann.brute_force_topk(ds, q, k=10).to_pandas()
    expected = ground_truth_topk(matrix, ids, q, 10)
    assert list(zip(got["vec_id"], got["cos"])) == [
        (i, pytest.approx(c)) for i, c in expected]


def test_lsh_topk_subset_of_bruteforce(emb_table, matrix):
    ids = emb_table["vec_id"].to_pylist()
    q = matrix[3]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = ann.lsh_topk(ds, q, k=10).to_pandas()
    assert len(got) <= 10
    # every approximate hit carries its TRUE cosine (verified vs numpy)
    qn = q / np.linalg.norm(q)
    cos = (matrix @ qn) / np.linalg.norm(matrix, axis=1)
    by_id = dict(zip(ids, np.round(cos, 5)))
    for vid, c in zip(got["vec_id"], got["cos"]):
        assert c == pytest.approx(by_id[vid], abs=1e-5)
    # the query vector itself shares its own bucket → always recalled
    assert 3 in set(got["vec_id"])


def test_ivf_topk(emb_table, matrix):
    ids = emb_table["vec_id"].to_pylist()
    q = matrix[3]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    got = ann.ivf_topk(ds, q, k=10, n_centroids=8, n_probe=3).to_pandas()
    assert 0 < len(got) <= 10
    # hits carry true cosines; the query's own cluster is always probed
    qn = q / np.linalg.norm(q)
    cos = (matrix @ qn) / np.linalg.norm(matrix, axis=1)
    by_id = dict(zip(ids, np.round(cos, 5)))
    for vid, c in zip(got["vec_id"], got["cos"]):
        assert c == pytest.approx(by_id[vid], abs=1e-5)
    assert 3 in set(got["vec_id"])
    # deterministic across runs
    again = ann.ivf_topk(ds, q, k=10, n_centroids=8, n_probe=3).to_pandas()
    assert got.equals(again)


def test_neardup_pairs_on_planted_dups():
    rng = np.random.default_rng(5)
    base = rng.standard_normal(16)
    rows = [{"vec_id": 0, "embedding": base.tolist()},
            {"vec_id": 1, "embedding": (base * 2.0).tolist()},      # cos = 1
            {"vec_id": 2, "embedding": (base + 0.01 * rng.standard_normal(16)).tolist()},
            {"vec_id": 3, "embedding": rng.standard_normal(16).tolist()}]
    ds = ray.data.from_items(rows)
    pairs = ann.cosine_neardup_pairs(ds, threshold=0.95).to_pandas()
    found = set(zip(pairs["vec_a"], pairs["vec_b"]))
    assert (0, 1) in found and (0, 2) in found
    assert not any(3 in p for p in found)


def test_exact_neardup_pairs_vs_numpy(emb_table, matrix):
    """Exact near-dup must equal the full numpy pairwise computation."""
    ids = np.asarray(emb_table["vec_id"].to_pylist(), dtype=np.int64)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    thr = 0.4
    got = ann.exact_neardup_pairs(ds, ids, matrix,
                                  threshold=thr).to_pandas()

    mn = matrix / np.linalg.norm(matrix, axis=1)[:, None]
    cos = mn @ mn.T
    ii, jj = np.where(np.triu(cos, 1) >= thr)
    expected = sorted(zip(np.minimum(ids[ii], ids[jj]),
                          np.maximum(ids[ii], ids[jj])))
    assert list(zip(got["vec_a"], got["vec_b"])) == expected
    by_pair = {(min(ids[a], ids[b]), max(ids[a], ids[b])):
               np.round(cos[a, b], 5) for a, b in zip(ii, jj)}
    for a, b, c in zip(got["vec_a"], got["vec_b"], got["cos"]):
        assert c == pytest.approx(by_pair[(a, b)], abs=1e-5)


def test_neardup_empty_on_random(matrix):
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = ann.cosine_neardup_pairs(ds, threshold=0.999)
    assert out.count() == 0
    pairs = out.to_pandas()
    # Ray drops schema from all-empty block streams; columns are only
    # guaranteed when at least one pair exists
    assert list(pairs.columns) in ([], ["vec_a", "vec_b", "cos"])


def test_neardup_blocked_equals_broadcast(emb_table, matrix):
    """Chunked C(C+1)/2 path must be bit-equal to the whole-corpus
    broadcast path — with chunk_rows forcing >1 chunk (500 rows / 120
    = 5 chunks), so the multi-chunk union is actually exercised."""
    ids = np.asarray(emb_table["vec_id"].to_pylist(), dtype=np.int64)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    thr = 0.4
    base = ann.exact_neardup_pairs(ds, ids, matrix,
                                   threshold=thr).to_pandas()
    blocked = ann.exact_neardup_pairs_blocked(
        f"{SF}/embeddings.parquet", threshold=thr,
        chunk_rows=120).to_pandas()
    assert len(base) > 0          # non-vacuous at this threshold
    assert base.reset_index(drop=True).equals(
        blocked.reset_index(drop=True))


def test_pq_topk_finds_planted_duplicate():
    """A vector identical to the query attains the minimum achievable
    ADC distance, so it is in the returned top-k (ties permitted —
    PQ codes are coarse by design)."""
    rng = np.random.default_rng(11)
    q = rng.standard_normal(64)
    rows = [{"vec_id": i, "embedding": rng.standard_normal(64).tolist()}
            for i in range(40)]
    rows.append({"vec_id": 99, "embedding": q.tolist()})
    ds = ray.data.from_items(rows)
    out = ann.pq_topk(ds, q, k=10, bounds=((0, 32), (32, 64))).to_pandas()
    assert len(out) == 10
    assert out["adist"].is_monotonic_increasing
    dup = out[out["vec_id"] == 99]
    assert len(dup) == 1
    assert dup["adist"].iloc[0] == out["adist"].min()


def test_knn_classify_planted_majority(tmp_path):
    """A cluster of 7 near-identical vectors sharing one label must
    win the 10-NN vote over 3 scattered other-label vectors."""
    import pyarrow.parquet as pq_
    import pyarrow as pa_
    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    rows = [{"vec_id": 0, "embedding": base.tolist(), "label": 1}]
    for i in range(1, 7):
        rows.append({"vec_id": i,
                     "embedding": (base + 0.01 * rng.standard_normal(64)
                                   ).tolist(), "label": 1})
    for i in range(7, 30):
        rows.append({"vec_id": i,
                     "embedding": rng.standard_normal(64).tolist(),
                     "label": 2})
    pq_.write_table(pa_.Table.from_pylist(rows),
                    str(tmp_path / "embeddings.parquet"))
    from cheque_ocr_project_ray.vector.queries import ann_knn_classify
    out = ann_knn_classify(str(tmp_path))
    assert out["label"].iloc[0] == 1 and out["votes"].iloc[0] == 7
    assert out["votes"].sum() == 10
    assert out["top_cos"].iloc[0] == 1.0  # the query itself is vec 0


def test_neardup_degenerate_bucket_star_cap():
    """A degenerate LSH bucket (all-identical embeddings — the exact
    dedup worst case) past ``bucket_cap`` must fall back to the STAR
    comparison: linear pairs from the min-id hub, every emitted pair
    genuinely above the threshold, cluster stays connected."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [{"vec_id": i, "embedding": (base * (1.0 + 0.001 * (i % 3))).tolist()}
            for i in range(50)]
    ds = ray.data.from_items(rows)
    pairs = ann.cosine_neardup_pairs(
        ds, threshold=0.95, bucket_cap=10).to_pandas()
    # star shape: every pair is (hub=min id, other); 49 spokes
    assert len(pairs) == 49
    assert set(pairs["vec_a"]) == {0}
    assert set(pairs["vec_b"]) == set(range(1, 50))
    # consistent with the exact path: each emitted cosine is real
    assert (pairs["cos"] >= 0.95).all()
    assert (pairs["cos"] == 1.0).all()   # scaled copies: cos exactly 1


def test_neardup_blocked_no_driver_read(monkeypatch):
    """The blocked path must never read chunk bytes on the DRIVER:
    chunk ingest happens inside Ray tasks (separate worker processes),
    so poisoning ``pq.read_table`` in the driver process must not
    affect the result — while >1 chunk is exercised."""
    import pyarrow.parquet as pyarrow_pq

    ids_mat = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(ids_mat["vec_id"].to_pylist(), dtype=np.int64)
    matrix = np.asarray(ids_mat["embedding"].to_pylist(), dtype=np.float64)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    base = ann.exact_neardup_pairs(ds, ids, matrix,
                                   threshold=0.4).to_pandas()

    def _boom(*a, **k):
        raise AssertionError("driver-side pq.read_table in blocked path")

    monkeypatch.setattr(pyarrow_pq, "read_table", _boom)
    blocked = ann.exact_neardup_pairs_blocked(
        f"{SF}/embeddings.parquet", threshold=0.4,
        chunk_rows=120).to_pandas()          # 500 rows → 5 chunks
    assert len(base) > 0
    assert base.reset_index(drop=True).equals(
        blocked.reset_index(drop=True))


def test_embedding_dedup_components_planted_chain():
    """A transitive chain (0≈1, 1≈2 but 0 !≈ 2 directly is fine) must
    collapse to one component with rep=min id; the outlier stays out."""
    import pandas as pd
    import pyarrow as pa_
    import tempfile, os
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    step = rng.standard_normal(16) * 0.12
    rows = pd.DataFrame({
        "vec_id": [0, 1, 2, 7],
        "embedding": [base.tolist(), (base + step).tolist(),
                      (base + 2 * step).tolist(),
                      (-base).tolist()],          # cos = -1 to base
        "label": 0})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa_.Table.from_pandas(rows),
                       os.path.join(d, "embeddings.parquet"))
        from cheque_ocr_project_ray.vector.queries import (
            embedding_dedup_components)
        out = embedding_dedup_components(d).to_pandas()
    assert list(out["vec_id"]) == [0, 1, 2]
    assert list(out["rep"]) == [0, 0, 0]
    assert list(out["is_canonical"]) == [1, 0, 0]


def test_embedding_centroid_shift_planted_drift(tmp_path):
    """Label 0 drifts by a known vector between halves; label 1 is
    stationary (identical mean in both halves)."""
    import pandas as pd
    import pyarrow as pa_
    from cheque_ocr_project_ray.vector.queries import (
        embedding_centroid_shift)

    d = 64
    drift = np.zeros(d); drift[0] = 3.0; drift[1] = 4.0   # |drift| = 5
    rows = []
    # ids 0..9 old half, 10..19 new half (max id 19 -> split 10)
    for i in range(10):
        v = np.zeros(d); v[2] = (-1.0) ** i    # mean over pairs = 0
        rows.append({"vec_id": i, "embedding": v.tolist(), "label": 0})
    for i in range(10, 20):
        v = drift.copy(); v[2] = (-1.0) ** i
        rows.append({"vec_id": i, "embedding": v.tolist(), "label": 0})
    pq.write_table(pa_.Table.from_pylist(rows),
                   str(tmp_path / "embeddings.parquet"))
    out = embedding_centroid_shift(str(tmp_path))
    assert list(out["label"]) == [0]
    assert out["shift"].iloc[0] == 5.0


def test_embedding_outliers_flags_planted_vector(tmp_path):
    """A vector far from its label centroid is flagged; tight cluster
    members are not; max_dist reflects the planted outlier."""
    import numpy as np
    import pandas as pd
    from cheque_ocr_project_ray.vector.queries import (OUTLIER_TAU,
                                                       embedding_outliers)

    rng = np.random.default_rng(9)
    dim = 8
    rows = []
    for label in (0, 1):
        base = np.full(dim, float(label))
        for i in range(20):
            rows.append((label, base + rng.normal(0, 0.01, dim)))
        rows.append((label, base + 5.0))   # planted far outlier
    df = pd.DataFrame({
        "vec_id": np.arange(len(rows)),
        "label": [r[0] for r in rows],
        "embedding": [r[1].astype("float32") for r in rows]})
    df.to_parquet(tmp_path / "embeddings.parquet")

    out = embedding_outliers(str(tmp_path)).to_pandas() \
        .set_index("label")
    for label in (0, 1):
        assert out.loc[label, "n"] == 21
        assert out.loc[label, "n_outliers"] == 1
        assert out.loc[label, "max_dist"] > OUTLIER_TAU


def test_cosine_histogram_mass_and_bins():
    """The histogram conserves pair mass exactly (N x P minus the P
    self-pairs) and every bin sits on the 0.1 grid within [-1, 0.9]."""
    from cheque_ocr_project_ray.vector.queries import (
        N_HIST_PROBES, embedding_cosine_histogram)
    sf = "/root/testdata/sf0.001"
    n = pq.read_metadata(sf + "/embeddings.parquet").num_rows
    df = embedding_cosine_histogram(sf)
    assert int(df["n_pairs"].sum()) == n * N_HIST_PROBES - N_HIST_PROBES
    lo = df["bin_lo"].to_numpy()
    assert ((lo >= -1.0 - 1e-9) & (lo <= 0.9 + 1e-9)).all()
    assert np.allclose(np.round(lo * 10), lo * 10)
    assert (df["n_pairs"] > 0).all()
