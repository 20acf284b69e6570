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
