"""Connected components (both paths) + k-means tests."""

import numpy as np
import pyarrow as pa
import ray.data

from cheque_ocr_project_ray.text.cluster import components_from_pairs
from cheque_ocr_project_ray.vector.kmeans import kmeans_rounds


def _pairs_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
        "doc_b": pa.array([b for _, b in pairs], pa.int64())}))


CHAIN = [(1, 2), (2, 3), (3, 4),          # 4-hop chain -> rep 1
         (10, 11), (11, 10),              # cycle w/ duplicate edge
         (20, 21)]                        # simple pair
EXPECT = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_union_find_path():
    out = components_from_pairs(_pairs_ds(CHAIN)).to_pandas()
    assert dict(zip(out["doc_id"], out["rep"])) == EXPECT


def test_components_distributed_path_matches():
    out = components_from_pairs(_pairs_ds(CHAIN), bound=0).to_pandas()
    assert dict(zip(out["doc_id"], out["rep"])) == EXPECT


def test_components_long_chain_converges_distributed():
    # a 30-node chain needs multiple propagation rounds
    pairs = [(i, i + 1) for i in range(30)]
    out = components_from_pairs(_pairs_ds(pairs), bound=0).to_pandas()
    assert (out["rep"] == 0).all()
    assert len(out) == 31


def test_components_empty_pairs_typed_empty():
    empty = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64())}))
    out = components_from_pairs(empty)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "rep"}


def _blob_ds(rng, centers, per=40):
    pts = np.concatenate([c + 0.05 * rng.standard_normal((per, 4))
                          for c in centers])
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(pts)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in pts],
                              pa.list_(pa.float32()))})), len(centers)


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(13)
    centers = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]],
                       float)
    ds, k = _blob_ds(rng, centers)
    # one seed per blob (rows 0, 40, 80) — two rounds then separate
    # the blobs exactly; Lloyd's offers no such guarantee for a
    # degenerate all-in-one-blob init, so the unit test seeds well
    rows = ds.take(81)
    init = np.asarray([rows[i]["embedding"] for i in (0, 40, 80)],
                      float)
    out = kmeans_rounds(ds, init, rounds=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    out2 = kmeans_rounds(ds, init, rounds=4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (out["cluster"] == out2["cluster"]).all()  # deterministic
    # with rounds=4 and three tight blobs, each blob lands in one
    # cluster (whatever the ids are)
    blobs = np.repeat([0, 1, 2], 40)
    for b in range(3):
        assert out.loc[blobs == b, "cluster"].nunique() == 1


def test_kmeans_empty_cluster_keeps_centroid():
    # k=3 but only 2 real groups: one centroid may end up empty and
    # must survive (no NaN) with its previous position
    rng = np.random.default_rng(3)
    centers = np.array([[5, 0, 0, 0], [0, 5, 0, 0]], float)
    ds, _ = _blob_ds(rng, centers, per=30)
    init = np.array([[5, 0, 0, 0], [0, 5, 0, 0], [100, 100, 100, 100]],
                    float)
    out = kmeans_rounds(ds, init, rounds=3).to_pandas()
    assert out["cluster"].notna().all()
    assert set(out["cluster"].unique()) <= {0, 1, 2}


def test_pq_encode_reconstruction():
    """PQ codes hit the planted per-subspace clusters, and the MSE is
    the true reconstruction error against the trained codebooks."""
    import numpy as np
    import ray.data
    from cheque_ocr_project_ray.vector.kmeans import (centroid_rounds,
                                                      pq_encode)
    rng = np.random.default_rng(3)
    # two tight blobs per subspace; first 2 rows are the init seeds
    base0 = np.array([0.0] * 4), np.array([10.0] * 4)
    base1 = np.array([5.0] * 4), np.array([-5.0] * 4)
    rows = []
    for i in range(40):
        s0 = base0[i % 2] + 0.01 * rng.standard_normal(4)
        s1 = base1[i % 2] + 0.01 * rng.standard_normal(4)
        rows.append({"vec_id": i,
                     "embedding": np.concatenate([s0, s1]).tolist()})
    ds = ray.data.from_items(rows)
    m = np.array([r["embedding"] for r in rows])
    bounds = [(0, 4), (4, 8)]
    inits = [m[:2, lo:hi] for lo, hi in bounds]
    out = pq_encode(ds, inits, bounds, rounds=2).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    # same-parity rows share a code in each subspace
    assert (out["code0"][::2].nunique() == 1
            and out["code0"][1::2].nunique() == 1)
    assert out["code0"][0] != out["code0"][1]
    assert (out["code1"][::2].nunique() == 1
            and out["code1"][1::2].nunique() == 1)
    # MSE equals the numpy reconstruction error per row
    cents = [centroid_rounds(ds, init, 2, 0, lo, hi)
             for init, (lo, hi) in zip(inits, bounds)]
    for i in (0, 1, 7):
        err = 0.0
        for (lo, hi), cent in zip(bounds, cents):
            code = out[f"code{[(0,4),(4,8)].index((lo,hi))}"][i]
            err += ((m[i, lo:hi] - cent[code]) ** 2).sum()
        assert abs(out["mse"][i] - err / 8) < 1e-9
    # tight blobs → tiny reconstruction error
    assert out["mse"].max() < 0.01


def test_silhouette_separated_blobs(tmp_path):
    """Eight well-separated blobs (one per fixed centroid, k=8) →
    mean silhouette near 1 for every cluster; bounds hold.  (With
    fewer true blobs than k, sibling centroids share a blob and the
    silhouette is correctly LOW — that case is the k-diagnosis the
    metric exists for.)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_
    rng = np.random.default_rng(9)
    rows = []
    for i in range(64):
        center = np.zeros(64)
        center[i % 8] = 100.0      # 8 orthogonal, far-apart blobs
        rows.append({"vec_id": i,
                     "embedding": (center + 0.1 * rng.standard_normal(64)
                                   ).tolist(),
                     "label": i % 8})
    pq_.write_table(pa.Table.from_pylist(rows),
                    str(tmp_path / "embeddings.parquet"))
    from cheque_ocr_project_ray.vector.queries import embedding_silhouette
    df = embedding_silhouette(str(tmp_path)).to_pandas()
    assert df["n"].sum() == 64
    assert len(df) == 8 and (df["n"] == 8).all()
    assert df["mean_silhouette"].between(-1, 1).all()
    assert (df["mean_silhouette"] > 0.9).all()


def test_dedup_canonical_picks_best_quality(tmp_path):
    """Within one near-dup cluster the survivor is the max-quality
    member (tie -> min doc_id); singletons don't appear."""
    import pandas as pd
    from cheque_ocr_project_ray.text.queries import dedup_canonical
    from cheque_ocr_project_ray.text import analysis
    import pyarrow as pa
    import ray.data

    # docs 0/1/2 share almost all bigrams (one cluster); 1 carries the
    # richest vocabulary => highest TTR/stopword quality score; doc 9
    # is unrelated (singleton -> excluded from the output)
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 9],
        "text": [base,
                 base + " with fresh shiny extra words",
                 base,
                 "completely different unrelated content here"],
        "lang": "en", "source": "s0", "n_chars": 1})
    docs.to_parquet(tmp_path / "documents.parquet")

    out = dedup_canonical(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["rep"].iloc[0] == 0
    assert out["n_members"].iloc[0] == 3
    # verify the argmax against directly-computed scores
    scores = analysis.quality_score(
        pa.Table.from_pandas(docs[["doc_id", "text"]])).to_pandas()
    in_cluster = scores[scores["doc_id"].isin([0, 1, 2])]
    best = in_cluster.sort_values(["score", "doc_id"],
                                  ascending=[False, True]).iloc[0]
    assert out["keep_doc_id"].iloc[0] == best["doc_id"]
    assert out["best_score"].iloc[0] == best["score"]
    # identical texts 0 and 2 tie exactly -> if best is one of them the
    # tie must break to the smaller id (exercise explicitly)
    tied = scores[scores["doc_id"].isin([0, 2])]
    assert tied["score"].nunique() == 1
