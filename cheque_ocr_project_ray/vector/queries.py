"""Driver-facing vector queries over the ``embeddings`` table.

``ann_cosine_topk`` carries a DuckDB oracle (list_cosine_similarity
agrees with float64 numpy to 5 decimals — validated in tests);
the LSH variants are seeded-hash approximations → rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from cheque_ocr_project_ray.vector import ann


def _emb(sf_dir: str):
    return ray.data.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    return np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)


def ann_cosine_topk(sf_dir: str):
    return ann.brute_force_topk(_emb(sf_dir), _query_vec(sf_dir), k=10)


ANN_TOPK_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 5) AS cos
FROM embeddings e, q
ORDER BY cos DESC, vec_id
LIMIT 10
"""


N_KNN_QUERIES = 8
KNN_K = 5


def ann_knn_join(sf_dir: str):
    """Batched multi-query exact top-k (query MATRIX broadcast, one
    GEMM per block) — k nearest corpus vectors for each of the first
    N_KNN_QUERIES vectors."""
    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", N_KNN_QUERIES)])
    qids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    qm = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ann.knn_join(_emb(sf_dir), qids, qm, k=KNN_K)


KNN_JOIN_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_KNN_QUERIES}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), s AS (
  SELECT q.qid, e.vec_id,
         round(list_cosine_similarity(e.v, q.qv), 5) AS cos
  FROM e, q
), r AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, vec_id) AS rn
  FROM s
)
SELECT qid AS query_id, vec_id, cos FROM r WHERE rn <= {KNN_K}
"""


RANGE_THRESHOLD = 0.15  # non-vacuous on the random test embeddings
                        # (471 hits at sf0.01 for 8 probes)


def ann_range_search(sf_dir: str):
    """Radius search: all corpus vectors with cosine ≥ threshold to
    any of the first N_KNN_QUERIES probe vectors (self excluded)."""
    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", N_KNN_QUERIES)])
    qids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    qm = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ann.range_search(_emb(sf_dir), qids, qm,
                            threshold=RANGE_THRESHOLD)


RANGE_SEARCH_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_KNN_QUERIES}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
)
SELECT q.qid AS query_id, e.vec_id,
       round(list_cosine_similarity(e.v, q.qv), 5) AS cos
FROM e, q
WHERE e.vec_id <> q.qid
  AND round(list_cosine_similarity(e.v, q.qv), 5) >= {RANGE_THRESHOLD}
"""


def embedding_norm_stats(sf_dir: str):
    """Per-label L2-norm statistics — the vector-column profiling
    primitive (catches unnormalized / degenerate embedding batches
    before they poison ANN).  Squares accumulate LEFT-TO-RIGHT over
    dimensions to match DuckDB's sequential ``list_sum`` bit-for-bit;
    per-label partials are label-bounded, merged on the driver."""
    import pyarrow as pa
    from cheque_ocr_project_ray.util import collect_table, round_half_up
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    ds = ray.data.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                               columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        sumsq = np.zeros(len(m), np.float64)
        for j in range(m.shape[1]):       # sequential, like list_sum
            sumsq += m[:, j] * m[:, j]
        norm = np.sqrt(sumsq)
        t = pa.table({"label": batch.column("label"),
                      "norm": pa.array(norm, pa.float64()),
                      "n": pa.array(np.ones(len(m), np.int64))})
        g = t.group_by("label").aggregate(
            [("n", "sum"), ("norm", "sum"), ("norm", "min"),
             ("norm", "max")])
        return g.rename_columns(
            ["label", "n", "sum_norm", "min_norm", "max_norm"])

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow").materialize())
    if parts is None:
        import pandas as _pd
        return _pd.DataFrame({"label": _pd.Series([], dtype="int32"),
                              "n_vecs": _pd.Series([], dtype="int64"),
                              "avg_norm": _pd.Series([], dtype="float64"),
                              "min_norm": _pd.Series([], dtype="float64"),
                              "max_norm": _pd.Series([], dtype="float64")})
    g = parts.group_by("label").aggregate(
        [("n", "sum"), ("sum_norm", "sum"), ("min_norm", "min"),
         ("max_norm", "max")])
    df = g.to_pandas()
    return pd.DataFrame({
        "label": df["label"],
        "n_vecs": df["n_sum"],
        "avg_norm": round_half_up(df["sum_norm_sum"] / df["n_sum"], 4),
        "min_norm": round_half_up(df["min_norm_min"], 4),
        "max_norm": round_half_up(df["max_norm_max"], 4)})


NORM_STATS_SQL = """
WITH n AS (
  SELECT label,
         sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                      x -> x * x))) AS norm
  FROM embeddings)
SELECT label, count(*) AS n_vecs,
       round(sum(norm) / count(*), 4) AS avg_norm,
       round(min(norm), 4) AS min_norm,
       round(max(norm), 4) AS max_norm
FROM n GROUP BY label
"""


def embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION profile of the embedding space (mean, population
    std, min, max per coordinate) — the dead-dimension / scale-drift
    detector run before indexing or quantizing a new embedding batch
    (a dim with ~zero std carries no signal; a dim whose range dwarfs
    the others poisons unnormalized L2 search).  One pass: each block
    contributes a (dim, n, Σx, Σx², min, max) partial — 6 numbers per
    dimension — and the driver folds the dim×n_blocks grid (class b,
    same shape as ``embedding_norm_stats``).  Both engines compute
    std from the same Σx²/n − mean² moment identity (the
    ``embedding_covariance`` convention), so 6dp rounding absorbs
    only float-sum ORDER noise, not algorithm differences."""
    import pyarrow as pa
    from cheque_ocr_project_ray.util import collect_table, round_half_up
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "n": pa.array(np.full(d, len(m), np.int64)),
            "s": pa.array(m.sum(axis=0), pa.float64()),
            "s2": pa.array((m * m).sum(axis=0), pa.float64()),
            "mn": pa.array(m.min(axis=0), pa.float64()),
            "mx": pa.array(m.max(axis=0), pa.float64())})

    parts = collect_table(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow")
        .materialize())
    if parts is None:
        return pd.DataFrame({
            "dim": pd.Series([], dtype="int64"),
            "n_vals": pd.Series([], dtype="int64"),
            "avg_val": pd.Series([], dtype="float64"),
            "std_val": pd.Series([], dtype="float64"),
            "min_val": pd.Series([], dtype="float64"),
            "max_val": pd.Series([], dtype="float64")})
    g = parts.group_by("dim").aggregate(
        [("n", "sum"), ("s", "sum"), ("s2", "sum"),
         ("mn", "min"), ("mx", "max")])
    df = g.to_pandas().sort_values("dim").reset_index(drop=True)
    n = df["n_sum"].to_numpy(np.float64)
    mean = df["s_sum"].to_numpy(np.float64) / n
    var = np.maximum(df["s2_sum"].to_numpy(np.float64) / n
                     - mean * mean, 0.0)
    return pd.DataFrame({
        "dim": df["dim"].astype("int64"),
        "n_vals": df["n_sum"].astype("int64"),
        "avg_val": round_half_up(mean, 6),
        "std_val": round_half_up(np.sqrt(var), 6),
        "min_val": round_half_up(df["mn_min"].to_numpy(np.float64), 6),
        "max_val": round_half_up(df["mx_max"].to_numpy(np.float64), 6)})


EMBEDDING_DIM_STATS_SQL = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
d AS (
  SELECT unnest(list_transform(v, (x, i) -> struct_pack(i := i,
                                                        x := x))) AS u
  FROM e)
SELECT CAST(u.i - 1 AS BIGINT) AS dim, count(*) AS n_vals,
       round(sum(u.x) / count(*), 6) AS avg_val,
       round(sqrt(greatest(sum(u.x * u.x) / count(*)
             - (sum(u.x) / count(*)) * (sum(u.x) / count(*)), 0)), 6)
           AS std_val,
       round(min(u.x), 6) AS min_val,
       round(max(u.x), 6) AS max_val
FROM d GROUP BY dim ORDER BY dim
"""


def embedding_covariance(sf_dir: str):
    """Full dimension×dimension covariance matrix of the embedding
    space (upper triangle, long form) — the PCA / whitening
    prerequisite.  Each block contributes one GEMM (XᵀX) plus a
    column-sum; the 2080 partial rows per block merge through the
    bounded-adaptive path.  Same moment identity and 6dp rounding as
    the grouped covariance family (events_hour_value_stats)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (final_merge_sums,
                                             round_half_up)
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        s1 = m.sum(axis=0)
        s2 = m.T @ m
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "sxy": pa.array(s2[iu, ju], pa.float64()),
            "sx": pa.array(s1[iu], pa.float64()),
            "sy": pa.array(s1[ju], pa.float64()),
            "n": pa.array(np.full(len(iu), len(m), np.int64))})

    agg = final_merge_sums(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], ["sxy", "sx", "sy", "n"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].astype(np.float64)
        cov = b["sxy"] / n - (b["sx"] / n) * (b["sy"] / n)
        return pd.DataFrame({"i": b["i"], "j": b["j"],
                             "cov": round_half_up(cov, 6)})

    return agg.map_batches(finish, batch_format="pandas")


EMBEDDING_COVARIANCE_SQL = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
d AS (
  SELECT unnest(list_transform(v, (x, i) -> struct_pack(i := i,
                                                        x := x))) AS u,
         v
  FROM e),
p AS (
  SELECT d.u.i - 1 AS i, d.u.x AS xi, t.w.i - 1 AS j, t.w.x AS xj
  FROM d, LATERAL unnest(list_transform(d.v,
           (y, k) -> struct_pack(i := k, x := y))) AS t(w)
  WHERE d.u.i <= t.w.i)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       round(sum(xi * xj) / count(*)
             - (sum(xi) / count(*)) * (sum(xj) / count(*)), 6) AS cov
FROM p GROUP BY i, j
"""


PCA_ROUNDS = 4


def embedding_pca_top(sf_dir: str):
    """Top principal component by FIXED-round power iteration (like
    the fixed-round k-means): the covariance matrix reduces from
    per-block GEMM partials, then 4 deterministic matvec+normalize
    rounds from the uniform seed run on the (dim²-sized) driver
    matrix.  The SQL twin unrolls the same rounds over the long-form
    covariance — measured drift between the engines is ~1e-16, far
    inside the 6dp output rounding.  No sign ambiguity: both engines
    run the identical iteration from the identical all-positive
    seed."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        s1 = m.sum(axis=0)
        s2 = m.T @ m
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "sxy": pa.array(s2[iu, ju], pa.float64()),
            "n": pa.array(np.full(len(iu), len(m), np.int64)),
            "sx": pa.array(s1[iu], pa.float64()),
            "sy": pa.array(s1[ju], pa.float64())})

    t = collect_table(final_merge_sums(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], ["sxy", "n", "sx", "sy"]).materialize())
    if t is None or t.num_rows == 0:
        return pd.DataFrame({"dim": pd.Series([], dtype="int64"),
                             "loading": pd.Series([], dtype="float64"),
                             "eigval": pd.Series([], dtype="float64")})
    df = t.to_pandas()
    d = int(df["i"].max()) + 1
    C = np.zeros((d, d))
    n = df["n"].to_numpy(np.float64)
    cov = df["sxy"] / n - (df["sx"] / n) * (df["sy"] / n)
    C[df["i"], df["j"]] = cov
    C[df["j"], df["i"]] = cov
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(PCA_ROUNDS):
        w = C @ v
        norm = np.sqrt((w * w).sum())
        v = w / norm
    return pd.DataFrame({"dim": np.arange(d, dtype=np.int64),
                         "loading": round_half_up(v, 6),
                         "eigval": round_half_up(
                             np.full(d, norm), 6)})


def _pca_sql() -> str:
    rounds = []
    prev = "v0"
    for r in range(1, PCA_ROUNDS + 1):
        rounds.append(f"""
w{r} AS (
  SELECT c.i, sum(c.cov * {prev}.val) AS w
  FROM c JOIN {prev} ON {prev}.i = c.j GROUP BY c.i),
n{r} AS (SELECT sqrt(sum(w * w)) AS nn FROM w{r}),
v{r} AS (SELECT i, w / nn AS val FROM w{r}, n{r})""")
        prev = f"v{r}"
    return f"""
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
d AS (
  SELECT unnest(list_transform(v, (x, i) -> struct_pack(i := i,
                                                        x := x))) AS u,
         v
  FROM e),
p AS (
  SELECT d.u.i - 1 AS i, d.u.x AS xi, t.w.i - 1 AS j, t.w.x AS xj
  FROM d, LATERAL unnest(list_transform(d.v,
           (y, k) -> struct_pack(i := k, x := y))) AS t(w)),
c AS (
  SELECT i, j,
         sum(xi * xj) / count(*)
         - (sum(xi) / count(*)) * (sum(xj) / count(*)) AS cov
  FROM p GROUP BY i, j),
dims AS (SELECT count(DISTINCT i) AS d FROM c),
v0 AS (SELECT DISTINCT i, 1.0 / sqrt(dims.d) AS val FROM c, dims),
{",".join(rounds)}
SELECT CAST(v{PCA_ROUNDS}.i AS BIGINT) AS dim,
       round(v{PCA_ROUNDS}.val, 6) AS loading,
       round((SELECT nn FROM n{PCA_ROUNDS}), 6) AS eigval
FROM v{PCA_ROUNDS}
"""


def embedding_pca_scores(sf_dir: str):
    """Apply the fitted top component: each vector's projection onto
    PC1 — fit on the driver (64-dim vector), broadcast, one GEMV per
    block.  The fit→transform pattern every feature pipeline uses."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from cheque_ocr_project_ray.util import map_pool, round_half_up
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    fit = embedding_pca_top(sf_dir)
    v = fit.sort_values("dim")["loading"].to_numpy(np.float64) \
        if len(fit) else np.array([])
    v_ref = ray.put(v)

    class Project:
        def __init__(self):
            self.v = ray.get(v_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            return pa.table({
                "vec_id": batch.column("vec_id"),
                "pc1": pa.array(round_half_up(m @ self.v, 6),
                                pa.float64())})

    return _emb(sf_dir).map_batches(Project, batch_format="pyarrow",
                                    concurrency=(1, map_pool()))


def _pca_scores_sql() -> str:
    """Project every embedding onto the SQL-fitted (ROUNDED, the same
    values the engine broadcast) component."""
    return f"""
WITH fit AS ({_pca_sql()}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
x AS (
  SELECT vec_id, t.u.i - 1 AS dim, t.u.x AS x
  FROM e, LATERAL unnest(list_transform(e.v,
           (y, k) -> struct_pack(i := k, x := y))) AS t(u))
SELECT x.vec_id, round(sum(x.x * fit.loading), 6) AS pc1
FROM x JOIN fit USING (dim)
GROUP BY x.vec_id
"""


RECALL_PROBES = 4


def ann_recall_eval(sf_dir: str):
    """Index-quality evaluation: recall@10 of the LSH and IVF paths
    against exact brute force, averaged over probe queries — the
    harness that decides whether an approximate index is good enough
    to deploy.  Approximate by design → rows-only (pytest bounds it:
    recall ∈ [0, 1] and the exact path's self-recall is 1)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    probes = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", RECALL_PROBES)])
    qids = probes["vec_id"].to_pylist()
    qvecs = [np.asarray(v, dtype=np.float64)
             for v in probes["embedding"].to_pylist()]

    def topk_ids(ds_result):
        return set(ds_result.to_pandas()["vec_id"].tolist())

    recalls = {"lsh": [], "ivf": [], "pq": []}
    for qid, qv in zip(qids, qvecs):
        exact = topk_ids(ann.brute_force_topk(_emb(sf_dir), qv, k=10))
        for name, fn in (("lsh", ann.lsh_topk), ("ivf", ann.ivf_topk),
                         ("pq", ann.pq_topk)):
            approx = topk_ids(fn(_emb(sf_dir), qv, k=10))
            recalls[name].append(len(approx & exact) / 10.0)

    from cheque_ocr_project_ray.util import round_half_up
    methods = ["lsh", "ivf", "pq"]
    return pd.DataFrame({
        "method": methods,
        "recall_at_10": [float(round_half_up(np.mean(recalls[m]), 4))
                         for m in methods],
        "n_queries": [len(qids)] * len(methods)})


FILTER_LABEL = 3


def ann_filtered_topk(sf_dir: str):
    """Filtered vector search — top-k cosine restricted to one label
    (the metadata-constrained ANN shape every vector DB serves).  The
    filter pushes down to the parquet read, so non-matching rows never
    leave storage; the searcher is the same brute-force GEMM."""
    import pyarrow.dataset as pads
    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pads.field("label") == FILTER_LABEL)
    return ann.brute_force_topk(ds, _query_vec(sf_dir), k=10)


ANN_FILTERED_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 5)
           AS cos
FROM embeddings e, q
WHERE e.label = {FILTER_LABEL}
ORDER BY cos DESC, vec_id
LIMIT 10
"""


def embedding_quantize_error(sf_dir: str):
    """Scalar int8 quantization (symmetric, per-vector max-abs scale)
    with the reconstruction MSE per vector — the vector-compression
    primitive for shipping embeddings at corpus scale.  Every float
    op (divide, ×127, half-away round, reconstruct, square, sequential
    sum) mirrors the SQL twin's expression order so the MSE matches
    bit-for-bit before the output rounding.  Stateless streaming map."""
    import pyarrow as pa
    from cheque_ocr_project_ray.util import round_half_up
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    def quantize(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        scale = np.max(np.abs(m), axis=1)
        safe = np.where(scale == 0, 1.0, scale)[:, None]
        code = round_half_up(m / safe * 127, 0)
        recon = code * safe / 127
        diff = m - recon
        sq = diff * diff
        acc = np.zeros(len(m), np.float64)
        for j in range(d):          # sequential, like list_sum
            acc += sq[:, j]
        mse = np.where(scale == 0, 0.0, acc / d)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "scale": pa.array(round_half_up(scale, 6), pa.float64()),
            "mse": pa.array(round_half_up(mse, 10), pa.float64())})

    return _emb(sf_dir).map_batches(quantize, batch_format="pyarrow")


QUANTIZE_ERROR_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e)
SELECT vec_id, round(scale, 6) AS scale,
       round(CASE WHEN scale = 0 THEN 0.0 ELSE
         list_sum(list_transform(v, x ->
           (x - round(x / scale * 127) * scale / 127)
           * (x - round(x / scale * 127) * scale / 127))) / len(v)
       END, 10) AS mse
FROM s
"""


def ann_lsh_topk(sf_dir: str):
    return ann.lsh_topk(_emb(sf_dir), _query_vec(sf_dir), k=10)


def ann_ivf_topk(sf_dir: str):
    return ann.ivf_topk(_emb(sf_dir), _query_vec(sf_dir), k=10)


def ann_pq_topk(sf_dir: str):
    """PQ-ADC approximate top-k (rows-only like the other approximate
    indexes; ``ann_recall_eval`` measures its recall@10 vs exact)."""
    return ann.pq_topk(_emb(sf_dir), _query_vec(sf_dir), k=10)


def ann_knn_classify(sf_dir: str):
    """Exact kNN classification vote: the query's 10 nearest corpus
    vectors (the already-oracled distributed top-k) vote by label.
    The neighbor set is k rows, so label fetch is a pruned
    ``vec_id IN (...)`` parquet read and the vote is driver-side —
    the distributed work IS the top-k scan.  ``top_cos`` uses max
    (order-free), never a float mean."""
    import pandas as pd
    top = ann.brute_force_topk(_emb(sf_dir), _query_vec(sf_dir),
                               k=10).to_pandas()
    ids = [int(i) for i in top["vec_id"]]
    lab = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                        columns=["vec_id", "label"],
                        filters=[("vec_id", "in", ids)]).to_pandas()
    m = top.merge(lab, on="vec_id")
    g = m.groupby("label").agg(votes=("vec_id", "size"),
                               top_cos=("cos", "max")).reset_index()
    g["votes"] = g["votes"].astype("int64")
    return g.sort_values(["votes", "label"],
                         ascending=[False, True]).reset_index(drop=True)


ANN_KNN_CLASSIFY_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id = 0),
topk AS (
  SELECT e.vec_id, e.label,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 5)
             AS cos
  FROM embeddings e, q
  ORDER BY cos DESC, vec_id
  LIMIT 10)
SELECT label, count(*) AS votes, max(cos) AS top_cos
FROM topk
GROUP BY label
ORDER BY votes DESC, label
"""


NEARDUP_THRESHOLD = 0.4  # non-vacuous on the random test embeddings
                         # (59 pairs at sf0.01) — a 0.95 cut returned 0
                         # rows and verified nothing (round-1 verdict)


def embedding_neardup(sf_dir: str):
    """Exact cosine near-dup pairs (oracled) — whole-corpus broadcast
    baseline.  Past the broadcast boundary (~10M×64 ≈ 2.5 GB) use
    :func:`embedding_neardup_blocked` (bit-equal, chunked broadcast)
    or the LSH-bucketed :func:`ann.cosine_neardup_pairs` scale path."""
    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                     dtype=np.int64)
    matrix = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ann.exact_neardup_pairs(_emb(sf_dir), ids, matrix,
                                   threshold=NEARDUP_THRESHOLD)


NEARDUP_CHUNK_ROWS = 200  # 3 chunks at the driver's sf0.01 tier (500
                          # vectors) — the chunked path is exercised
                          # with REAL multi-chunk unions, not C=1


def embedding_neardup_blocked(sf_dir: str):
    """Chunked C(C+1)/2 exact near-dup (oracled, same SQL twin as
    ``embedding_neardup``): per-chunk broadcast + predicate-pushdown
    scans — the path that still starts when the corpus matrix can't
    fit one worker heap.  See :func:`ann.exact_neardup_pairs_blocked`."""
    return ann.exact_neardup_pairs_blocked(
        str(Path(sf_dir) / "embeddings.parquet"),
        threshold=NEARDUP_THRESHOLD, chunk_rows=NEARDUP_CHUNK_ROWS)


def embedding_dedup_components(sf_dir: str):
    """Semantic dedup closure: connected components over the exact
    cosine near-dup pairs, canonical member = min vec_id — the
    embedding-space counterpart of ``dedup_components`` (same
    bounded-adaptive union-find / distributed min-label propagation;
    the pair stream comes from the GEMM near-dup path, so nothing here
    adds a shuffle beyond the pair machinery itself)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from cheque_ocr_project_ray.text.cluster import components_from_pairs

    comps = components_from_pairs(embedding_neardup(sf_dir),
                                  a_col="vec_a", b_col="vec_b")

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": batch.column("doc_id"),
            "rep": batch.column("rep"),
            "is_canonical": pc.cast(pc.equal(batch.column("doc_id"),
                                             batch.column("rep")),
                                    pa.int64())})

    return comps.map_batches(shape, batch_format="pyarrow") \
        .sort("vec_id")


EMBEDDING_DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), prs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM e a, e b
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.v, b.v) >= {NEARDUP_THRESHOLD}
), edges AS (
  SELECT va AS a, vb AS b FROM prs
  UNION ALL
  SELECT vb, va FROM prs
), reach AS (
  SELECT DISTINCT a AS doc, a AS lab FROM edges
  UNION
  SELECT ed.a, r.lab FROM edges ed JOIN reach r ON ed.b = r.doc
)
SELECT doc AS vec_id, min(lab) AS rep,
       CAST(doc = min(lab) AS BIGINT) AS is_canonical
FROM reach GROUP BY doc
ORDER BY vec_id
"""


EMBED_DIM = 64


def embedding_centroid_shift(sf_dir: str):
    """Per-label embedding drift monitor: L2 distance between the mean
    embedding of the older half of the corpus (vec_id < ⌊(max+1)/2⌋)
    and the newer half — the distribution-shift alarm a training-data
    pipeline runs per ingest batch.

    Scale shape: each block contributes long-form per-(label, half,
    dim) sum/count partials (bounded by labels × 2 × dim, not corpus
    size) merged bounded-adaptively; the driver folds means and the
    per-label distance.  6dp rounding per the float convention."""
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    ids = ray.data.read_parquet(
        str(Path(sf_dir) / "embeddings.parquet"), columns=["vec_id"])
    split = int((ids.max("vec_id") + 1) // 2)

    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "embeddings.parquet"),
        columns=["vec_id", "label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        vec = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lab = batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        half = (vec >= split).astype(np.int64)
        key = lab * 2 + half
        _, dense, counts = np.unique(key, return_inverse=True,
                                     return_counts=True)
        sums = np.zeros((len(counts), d), np.float64)
        np.add.at(sums, dense, m)
        ukey = np.unique(key)
        dims = np.tile(np.arange(d, dtype=np.int64), len(ukey))
        return pa.table({
            "label": pa.array(np.repeat(ukey // 2, d), pa.int64()),
            "half": pa.array(np.repeat(ukey % 2, d), pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts.astype(np.int64), d),
                          pa.int64())})

    t = collect_table(final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "half", "dim"], ["s", "n"]).materialize())
    if t is None or t.num_rows == 0:
        return pd.DataFrame({"label": pd.Series([], dtype="int64"),
                             "shift": pd.Series([], dtype="float64")})
    df = t.to_pandas().sort_values(["label", "half", "dim"])
    df["mean"] = df["s"] / df["n"]
    piv = df.pivot_table(index=["label", "dim"], columns="half",
                         values="mean")
    # labels with only one half present drop (no drift to measure)
    piv = piv.dropna()
    diff = (piv[0] - piv[1]) ** 2
    out = diff.groupby(level="label").sum().pow(0.5).reset_index()
    out.columns = ["label", "shift"]
    out["shift"] = round_half_up(out["shift"].to_numpy(), 6)
    return out.sort_values("label").reset_index(drop=True)


EMBEDDING_CENTROID_SHIFT_SQL = f"""
WITH s AS (
  SELECT CAST((max(vec_id) + 1) // 2 AS BIGINT) AS split
  FROM embeddings
), e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), m AS (
  SELECT label,
         CAST(vec_id >= s.split AS BIGINT) AS half,
         t.i AS dim, avg(v[t.i]) AS mu
  FROM e, s, generate_series(1, {EMBED_DIM}) t(i)
  GROUP BY 1, 2, 3
), p AS (
  SELECT a.label, sum((a.mu - b.mu) * (a.mu - b.mu)) AS d2
  FROM m a JOIN m b ON a.label = b.label AND a.dim = b.dim
  WHERE a.half = 0 AND b.half = 1
  GROUP BY a.label
)
SELECT CAST(label AS BIGINT) AS label, round(sqrt(d2), 6) AS shift
FROM p
ORDER BY label
"""


NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 5) AS cos
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.v, b.v) >= {NEARDUP_THRESHOLD}
"""


KMEANS_K = 8
KMEANS_ROUNDS = 2


def embedding_kmeans(sf_dir: str):
    """Deterministic Lloyd k-means (k=8, 2 assignment rounds, init =
    the k smallest vec_ids) → final (vec_id, cluster).  The iterative
    broadcast-update operator shape; see ``vector/kmeans.py``.  The
    SQL twin unrolls the same fixed rounds, so the driver hash checks
    an actual iterative ML algorithm end-to-end."""
    from cheque_ocr_project_ray.vector.kmeans import kmeans_rounds
    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", KMEANS_K)])
    init = np.asarray(
        t.sort_by("vec_id")["embedding"].to_pylist(), dtype=np.float64)
    return kmeans_rounds(_emb(sf_dir), init, rounds=KMEANS_ROUNDS)


PQ_K = 8                      # codes per subspace codebook
PQ_BOUNDS = [(0, 32), (32, 64)]  # two subspaces over the 64-dim column


def embedding_pq(sf_dir: str):
    """Product quantization (m=2 subspaces × k=8 codes, 2 fixed Lloyd
    rounds per codebook, init = the k smallest vec_ids' sub-vectors):
    per-vector (code0, code1) and exact reconstruction MSE.  Completes
    the ANN compression family (scalar int8 → PQ); the SQL twin
    unrolls both per-subspace k-means fits over ``list_slice``."""
    from cheque_ocr_project_ray.vector.kmeans import pq_encode
    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", PQ_K)])
    full = np.asarray(
        t.sort_by("vec_id")["embedding"].to_pylist(), dtype=np.float64)
    inits = [full[:, lo:hi] for lo, hi in PQ_BOUNDS]
    return pq_encode(_emb(sf_dir), inits, PQ_BOUNDS, rounds=2)


def _pq_subspace_sql(tag: str, lo1: int, hi1: int, vcol: str) -> str:
    """One subspace's fixed-round codebook fit (mirrors KMEANS_SQL's
    unroll over a dimension slice; 1-based inclusive list_slice)."""
    return f"""
c{tag}0 AS (
  SELECT vec_id AS cid,
         list_slice(embedding::DOUBLE[], {lo1}, {hi1}) AS c
  FROM embeddings WHERE vec_id < {PQ_K}),
a{tag} AS (
  SELECT vec_id, {vcol},
         (SELECT cid FROM c{tag}0
          ORDER BY list_distance(s.{vcol}, c{tag}0.c), cid LIMIT 1)
             AS cl
  FROM s),
du{tag} AS (
  SELECT cl,
         unnest(list_transform({vcol},
                (x, i) -> struct_pack(i := i, x := x))) AS u
  FROM a{tag}),
cm{tag} AS (
  SELECT cl AS cid, u.i AS i, avg(u.x) AS x
  FROM du{tag} GROUP BY cl, u.i),
c{tag}1 AS (SELECT cid, list(x ORDER BY i) AS c
            FROM cm{tag} GROUP BY cid),
cc{tag} AS (
  SELECT c{tag}0.cid, coalesce(c{tag}1.c, c{tag}0.c) AS c
  FROM c{tag}0 LEFT JOIN c{tag}1 USING (cid))"""


PQ_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, list_slice(v, 1, 32) AS v0,
             list_slice(v, 33, 64) AS v1
      FROM e),
{_pq_subspace_sql("x", 1, 32, "v0")},
{_pq_subspace_sql("y", 33, 64, "v1")},
f AS (
  SELECT s.vec_id, s.v0, s.v1,
         (SELECT cid FROM ccx
          ORDER BY list_distance(s.v0, ccx.c), cid LIMIT 1) AS code0,
         (SELECT cid FROM ccy
          ORDER BY list_distance(s.v1, ccy.c), cid LIMIT 1) AS code1
  FROM s)
SELECT f.vec_id, f.code0, f.code1,
       round((list_sum(list_transform(f.v0,
                 (x, i) -> (x - g0.c[i]) * (x - g0.c[i])))
              + list_sum(list_transform(f.v1,
                 (x, i) -> (x - g1.c[i]) * (x - g1.c[i]))))
             / 64, 10) AS mse
FROM f
JOIN ccx g0 ON f.code0 = g0.cid
JOIN ccy g1 ON f.code1 = g1.cid
"""


def embedding_silhouette(sf_dir: str):
    """Per-cluster simplified silhouette over the fixed-round k-means
    fit — the clustering-quality evaluation op (s = (b−a)/max(a,b)
    with a = distance to own centroid, b = nearest other centroid).

    Float parity with the SQL twin: distances are computed like
    DuckDB's ``list_distance`` (sequential per-dimension accumulation
    of squared diffs, then sqrt) — NOT the GEMM-reduced form, whose
    op-order drift could flip near-tie assignments.  One streaming
    pass after the centroid fit; per-cluster means round to 4 dp
    (sum-merge order drift ~1e-15, same precedent as
    cheque_status_profile)."""
    import ray as _ray
    from cheque_ocr_project_ray.util import (final_merge_sums, map_pool,
                                             round_half_up)
    from cheque_ocr_project_ray.vector.ann import _table_matrix
    from cheque_ocr_project_ray.vector.kmeans import centroid_rounds

    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", KMEANS_K)])
    init = np.asarray(
        t.sort_by("vec_id")["embedding"].to_pylist(), dtype=np.float64)
    cent = centroid_rounds(_emb(sf_dir), init, rounds=KMEANS_ROUNDS)
    cent_ref = _ray.put(cent)

    class Partial:
        def __init__(self):
            self.cent = _ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            k, d = self.cent.shape
            dist = np.empty((len(m), k), np.float64)
            for c in range(k):  # per-centroid seq-dim accumulation ==
                diff = m - self.cent[c]     # DuckDB list_distance
                sq = diff * diff
                acc = np.zeros(len(m), np.float64)
                for j in range(d):
                    acc += sq[:, j]
                dist[:, c] = np.sqrt(acc)
            assign = np.argmin(dist, axis=1)  # ties → lowest cid
            a = dist[np.arange(len(m)), assign]
            masked = dist.copy()
            masked[np.arange(len(m)), assign] = np.inf
            b = masked.min(axis=1)
            mx = np.maximum(a, b)
            s = np.where(mx == 0, 0.0, (b - a) / np.where(mx == 0, 1, mx))
            t_ = pa.table({"cluster": pa.array(assign.astype(np.int64)),
                           "n": pa.array(np.ones(len(m), np.int64)),
                           "s_sum": pa.array(s, pa.float64())})
            g = t_.group_by("cluster").aggregate(
                [("n", "sum"), ("s_sum", "sum")])
            return g.rename_columns(["cluster", "n", "s_sum"])

    agg = final_merge_sums(
        _emb(sf_dir).map_batches(Partial, batch_format="pyarrow",
                                 concurrency=(1, map_pool())),
        ["cluster"], ["n", "s_sum"])

    def finish(b):
        import pandas as pd
        return pd.DataFrame({
            "cluster": b["cluster"].astype("int64"),
            "n": b["n"].astype("int64"),
            "mean_silhouette": round_half_up(
                b["s_sum"] / b["n"], 4)}).sort_values("cluster")

    return agg.map_batches(finish, batch_format="pandas").sort("cluster")


KMEANS_SQL = f"""
WITH c0 AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS c
  FROM embeddings WHERE vec_id < {KMEANS_K}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), a1 AS (
  SELECT vec_id, v,
         (SELECT cid FROM c0
          ORDER BY list_distance(e.v, c0.c), cid LIMIT 1) AS cluster
  FROM e
), du AS (
  SELECT cluster,
         unnest(list_transform(v, (x, i) -> struct_pack(i := i, x := x)))
             AS u
  FROM a1
), cm AS (
  SELECT cluster AS cid, u.i AS i, avg(u.x) AS x
  FROM du GROUP BY cluster, u.i
), c1 AS (
  SELECT cid, list(x ORDER BY i) AS c FROM cm GROUP BY cid
), cc AS (
  SELECT c0.cid, coalesce(c1.c, c0.c) AS c
  FROM c0 LEFT JOIN c1 USING (cid)
)
SELECT vec_id,
       (SELECT cid FROM cc
        ORDER BY list_distance(e.v, cc.c), cid LIMIT 1) AS cluster
FROM e
"""

# silhouette shares the k-means unroll up to the final centroids (cc),
# then evaluates a/b distances against ALL centroids per vector
_KMEANS_CTE = KMEANS_SQL[KMEANS_SQL.index("WITH"):
                         KMEANS_SQL.index(")\nSELECT") + 1]

SILHOUETTE_SQL = f"""
{_KMEANS_CTE},
dist AS (
  SELECT e.vec_id, cc.cid, list_distance(e.v, cc.c) AS dist
  FROM e CROSS JOIN cc),
assign AS (
  SELECT vec_id, cid AS cluster, dist AS a FROM (
    SELECT dist.*, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dist) WHERE rn = 1),
bb AS (
  SELECT d.vec_id, min(d.dist) AS b
  FROM dist d JOIN assign s
    ON d.vec_id = s.vec_id AND d.cid <> s.cluster
  GROUP BY d.vec_id)
SELECT s.cluster, count(*) AS n,
       round(avg(CASE WHEN greatest(s.a, bb.b) = 0 THEN 0.0
                      ELSE (bb.b - s.a) / greatest(s.a, bb.b) END), 4)
           AS mean_silhouette
FROM assign s JOIN bb USING (vec_id)
GROUP BY s.cluster
ORDER BY s.cluster
"""


def label_stats(sf_dir: str):
    """Grouped stats over the vector table (count + first-component mean)."""

    def partial(batch):
        import pyarrow as pa
        import pyarrow.compute as pc
        first = pc.list_element(batch.column("embedding"), 0).cast(
            pa.float64())
        t = pa.table({"label": batch.column("label"), "first": first})
        g = t.group_by("label").aggregate([
            ("first", "count"), ("first", "sum")])
        return g.rename_columns(["label", "n", "sum_first"])

    from ray.data.aggregate import Sum
    from cheque_ocr_project_ray.util import tune_shuffle
    # partitions capped at key cardinality (10 labels): more partitions
    # than groups guarantees schemaless empty aggregate blocks (the
    # executor's "different schema" warning) and buys no parallelism.
    # The ROOT read must be built inside the scope — a Dataset captures
    # its DataContext at root creation, so a read built outside would
    # silently run the default sort shuffle (checkpoint.py documents
    # the verified capture semantics).
    with tune_shuffle(num_partitions=4) as np_:
        ds = ray.data.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                                   columns=["label", "embedding"])
        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("label", num_partitions=np_).aggregate(
                Sum("n", alias_name="n"),
                Sum("sum_first", alias_name="sum_first"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        from cheque_ocr_project_ray.util import round_half_up
        b["mean_first"] = round_half_up(b["sum_first"] / b["n"], 4)
        return b.drop(columns=["sum_first"])

    return agg.map_batches(finish, batch_format="pandas")


LABEL_STATS_SQL = """
SELECT label, count(*) AS n,
       round(sum(embedding[1]) / count(*), 4) AS mean_first
FROM embeddings
GROUP BY label
"""


def label_centroids(sf_dir: str):
    """Per-label mean embedding in long (label, dim, mean) form — the
    class-centroid primitive behind nearest-centroid classifiers and
    k-means seeding.  Per-batch partials reduce each block to
    |labels| × dims rows (vectorized np.add.at — the combiner), the
    bounded partial stream merges through the adaptive sum path, and
    the mean finishes in one tiny pass.  float32 → float64 BEFORE
    summing, matching the SQL twin's ``embedding::DOUBLE[]``."""
    import pyarrow as pa
    from cheque_ocr_project_ray.util import (final_merge_sums,
                                             round_half_up)

    ds = ray.data.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                               columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = np.asarray(batch.column("embedding").to_pylist(),
                       dtype=np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq))
        dims = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dims), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dims + 1, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, dims).astype(np.int64)),
        })

    agg = final_merge_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], ["s", "n"])

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b["mean"] = round_half_up(b["s"] / b["n"], 6)
        return b.drop(columns=["s", "n"])

    return agg.map_batches(finish, batch_format="pandas")


LABEL_CENTROIDS_SQL = """
WITH e AS (
  SELECT label,
         unnest(list_transform(embedding::DOUBLE[],
                               (x, i) -> struct_pack(dim := i, x := x)))
             AS u
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, u.dim AS dim,
       round(sum(u.x) / count(*), 6) AS mean
FROM e GROUP BY label, u.dim
"""


OUTLIER_TAU = 1.012  # 5dp-rounded distance threshold; non-vacuous at
                     # every tier (p90 of the distance distribution
                     # sits at ~1.009 across sf0.001-0.1)


def embedding_outliers(sf_dir: str):
    """Per-label distance-to-centroid outlier audit — the embedding-
    space anomaly filter a training-data pipeline runs before
    contrastive sampling (mislabeled / corrupted vectors sit far from
    their class centroid).

    Two streaming passes: (1) per-(label, dim) float sum/count
    combiner partials → broadcast centroids (the ``label_centroids``
    grid, unrounded); (2) per-batch distances with DuckDB
    ``list_distance`` op-order parity (sequential per-dim
    accumulation, the ``embedding_silhouette`` precedent), flags on
    the 5dp-ROUNDED distance, per-label (n, n_outliers, max) partials
    merged through one bounded groupby (max via negated Min so a
    single pass serves all three)."""
    import ray as _ray
    from ray.data.aggregate import Min as RayMin
    from ray.data.aggregate import Sum as RaySum

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool,
                                             round_half_up)
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    ds = ray.data.read_parquet(str(Path(sf_dir) / "embeddings.parquet"),
                               columns=["label", "embedding"])

    def cpartial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = _table_matrix(batch)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq))
        dims = m.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dims), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(counts, dims).astype(np.int64))})

    grid = collect_table(final_merge_sums(
        ds.map_batches(cpartial, batch_format="pyarrow"),
        ["label", "dim"], ["s", "n"]).materialize())
    empty = pd.DataFrame({"label": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64"),
                          "n_outliers": pd.Series([], dtype="int64"),
                          "max_dist": pd.Series([], dtype="float64")})
    if grid is None or grid.num_rows == 0:
        return empty
    g = grid.to_pandas().sort_values(["label", "dim"])
    labels_sorted = np.sort(g["label"].unique())
    dim = int(g["dim"].max()) + 1
    cent = (g["s"] / g["n"]).to_numpy().reshape(len(labels_sorted), dim)
    lab_pos = {int(v): i for i, v in enumerate(labels_sorted)}
    cent_ref = _ray.put((lab_pos, cent))

    class Flag:
        def __init__(self):
            self.lab_pos, self.cent = _ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _table_matrix(batch)
            labels = batch.column("label").to_numpy(
                zero_copy_only=False).astype(np.int64)
            rows = np.fromiter((self.lab_pos[int(x)] for x in labels),
                               dtype=np.int64, count=len(labels))
            diff = m - self.cent[rows]
            sq = diff * diff
            acc = np.zeros(len(m), np.float64)
            for j in range(sq.shape[1]):   # seq-dim == list_distance
                acc += sq[:, j]
            dist = round_half_up(np.sqrt(acc), 5)
            t = pa.table({
                "label": pa.array(labels),
                "n": pa.array(np.ones(len(m), np.int64)),
                "n_outliers": pa.array(
                    (dist > OUTLIER_TAU).astype(np.int64)),
                "negd": pa.array(-dist, pa.float64())})
            gg = t.group_by("label").aggregate(
                [("n", "sum"), ("n_outliers", "sum"), ("negd", "min")])
            return gg.rename_columns(["label", "n", "n_outliers",
                                      "negd"])

    merged = ds.map_batches(Flag, batch_format="pyarrow",
                            concurrency=(1, map_pool())) \
        .groupby("label").aggregate(
            RaySum("n", alias_name="n"),
            RaySum("n_outliers", alias_name="n_outliers"),
            RayMin("negd", alias_name="negd"))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "label": b["label"].astype("int64"),
            "n": b["n"].astype("int64"),
            "n_outliers": b["n_outliers"].astype("int64"),
            "max_dist": -b["negd"]})

    return merged.map_batches(finish, batch_format="pandas") \
        .sort("label")


EMBEDDING_OUTLIERS_SQL = f"""
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
  FROM embeddings),
cm AS (
  SELECT label, u.dim AS dim, sum(u.x) / count(*) AS m
  FROM (SELECT label,
               unnest(list_transform(v, (x, i) ->
                      struct_pack(dim := i, x := x))) AS u
        FROM e)
  GROUP BY label, u.dim),
cv AS (
  SELECT label, list(m ORDER BY dim) AS c FROM cm GROUP BY label),
d AS (
  SELECT e.label, round(list_distance(e.v, cv.c), 5) AS dist
  FROM e JOIN cv USING (label))
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN dist > {OUTLIER_TAU} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       max(dist) AS max_dist
FROM d GROUP BY label ORDER BY label
"""


def embedding_ann_ndcg(sf_dir: str, k: int = 10):
    """NDCG@k of the approximate indexes against the exact ranking —
    the GRADED complement to ``ann_recall_eval`` (recall treats every
    exact neighbor equally; NDCG rewards putting the BEST ones first).
    Gains are graded by exact-rank position (gain of exact rank r =
    k − r), discounted log2 by result position; ideal DCG normalizes.
    Approximate by design → rows-only (pytest bounds it: ndcg ∈ [0,1],
    exact-vs-itself = 1, and ndcg ≤ some recall-consistent cap)."""
    from cheque_ocr_project_ray.util import round_half_up

    probes = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                           columns=["vec_id", "embedding"],
                           filters=[("vec_id", "<", RECALL_PROBES)])
    qvecs = [np.asarray(v, dtype=np.float64)
             for v in probes["embedding"].to_pylist()]

    disc = 1.0 / np.log2(np.arange(k) + 2.0)

    def ndcg(exact_ids: list, approx_ids: list) -> float:
        gain = {vid: float(k - r) for r, vid in enumerate(exact_ids)}
        dcg = sum(gain.get(vid, 0.0) * disc[i]
                  for i, vid in enumerate(approx_ids[:k]))
        ideal = float((np.sort([gain[v] for v in exact_ids])[::-1][:k]
                       * disc[:len(exact_ids)]).sum())
        return dcg / ideal if ideal else 0.0

    scores = {"lsh": [], "ivf": [], "pq": []}
    for qv in qvecs:
        exact = ann.brute_force_topk(_emb(sf_dir), qv, k=k) \
            .to_pandas()["vec_id"].tolist()
        for name, fn in (("lsh", ann.lsh_topk), ("ivf", ann.ivf_topk),
                         ("pq", ann.pq_topk)):
            approx = fn(_emb(sf_dir), qv, k=k) \
                .to_pandas()["vec_id"].tolist()
            scores[name].append(ndcg(exact, approx))

    methods = ["lsh", "ivf", "pq"]
    return pd.DataFrame({
        "method": methods,
        "ndcg_at_10": [float(round_half_up(np.mean(scores[m]), 4))
                       for m in methods],
        "n_queries": [len(qvecs)] * len(methods)})


MMR_K = 5
MMR_POOL = 50
MMR_LAMBDA = 0.7
# the diversity multiplier as ONE shared literal: float(1.0 - 0.7) is
# 0.30000000000000004, a 1-ulp mismatch vs the SQL twin's round(0.3)
# that could flip a greedy pick on the 5dp score grid (ADVICE r4)
MMR_MU = round(1.0 - MMR_LAMBDA, 10)


def embedding_mmr_topk(sf_dir: str):
    """Maximal-Marginal-Relevance diverse top-k: greedy re-ranking of
    the exact top-``MMR_POOL`` candidates so each pick maximizes
    ``λ·rel − (1−λ)·max_sim_to_selected`` — the diversity-aware
    retrieval head (dedup-at-serve-time) every RAG stack needs.

    Two-stage shape: stage 1 is the DISTRIBUTED brute-force top-pool
    (per-block GEMM + tiny global re-rank); stage 2 is the greedy loop
    over the pool — O(k·pool) driver work on ≤``MMR_POOL`` rows by
    construction, never corpus-sized.  All cosines are rounded to 5dp
    BEFORE entering the greedy scores so the selection is bit-stable
    across engines (the same trick ``brute_force_topk`` uses); ties
    break by ``vec_id``.
    """
    from cheque_ocr_project_ray.util import round_half_up

    cand = ann.brute_force_topk(_emb(sf_dir), _query_vec(sf_dir),
                                k=MMR_POOL).to_pandas()
    ids = cand["vec_id"].to_numpy().astype(np.int64)
    rel = cand["rel" if "rel" in cand else "cos"].to_numpy()

    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", ids.tolist())])
    by_id = dict(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
    m = np.asarray([by_id[int(i)] for i in ids], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    mn = m / np.where(norms == 0, 1, norms)[:, None]
    sims = round_half_up(mn @ mn.T, 5)  # pairwise, rounded like rel

    n = len(ids)
    selected: list[int] = []
    rows = []
    remaining = np.ones(n, dtype=bool)
    for rank in range(1, min(MMR_K, n) + 1):
        msim = (sims[:, selected].max(axis=1) if selected
                else np.zeros(n))
        score = MMR_LAMBDA * rel - MMR_MU * msim
        score = np.where(remaining, score, -np.inf)
        # argmax with vec_id tie-break (ids ascend within equal score)
        best = int(np.lexsort((ids, -score))[0])
        rows.append((rank, int(ids[best]), float(rel[best]),
                     float(round_half_up(score[best], 5))))
        selected.append(best)
        remaining[best] = False
    return pd.DataFrame(rows, columns=["rnk", "vec_id", "rel", "mmr"]) \
        .astype({"rnk": "int64", "vec_id": "int64"})


def _mmr_sql(k: int = MMR_K, pool: int = MMR_POOL,
             lam: float = MMR_LAMBDA,
             mu: float = MMR_MU) -> str:
    """Unrolled greedy MMR: step i picks argmax of
    λ·rel − (1−λ)·max(sim to steps 1..i−1) over the remaining pool.
    Cosines are rounded to 5dp before scoring on BOTH sides, so the
    float arithmetic (and therefore the greedy path) is identical."""
    parts = [f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 5)
             AS rel
  FROM embeddings e, q
  ORDER BY rel DESC, e.vec_id LIMIT {pool}),
p1 AS (SELECT vec_id, v, rel, {lam} * rel AS mmr
       FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
s1 AS (SELECT vec_id, v FROM p1)"""]
    for i in range(2, k + 1):
        parts.append(f""",
c{i} AS (
  SELECT c.vec_id, c.v, c.rel,
         {lam} * c.rel - {mu} * (
             SELECT max(round(list_cosine_similarity(c.v, s.v), 5))
             FROM s{i - 1} s) AS mmr
  FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM s{i - 1})),
p{i} AS (SELECT vec_id, v, rel, mmr FROM c{i}
         ORDER BY mmr DESC, vec_id LIMIT 1),
s{i} AS (SELECT vec_id, v FROM s{i - 1}
         UNION ALL SELECT vec_id, v FROM p{i})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rnk, vec_id, rel, mmr FROM p{i}"
        for i in range(1, k + 1))
    parts.append(f""",
sel AS ({union})
SELECT CAST(rnk AS BIGINT) AS rnk, vec_id, rel,
       round(mmr, 5) AS mmr
FROM sel ORDER BY rnk""")
    return "".join(parts)


N_HIST_PROBES = 64


def embedding_cosine_histogram(sf_dir: str):
    """Pairwise-cosine geometry histogram: the distribution of
    cosine(v, p) between EVERY corpus vector and a deterministic probe
    set (the ``N_HIST_PROBES`` lowest vec_ids), bucketed into width-0.1
    bins — the corpus-geometry diagnostic that catches collapsed or
    anisotropic embedding spaces (mode collapse, hubness) before ANN
    recall degrades.  100-TB shape: the probe matrix broadcasts once
    (``ray.put``), each block does ONE GEMM + bincount, and the merge
    is a ≤21-bin grid of per-block partials (class-b bounded domain —
    nothing pair-scale ever leaves a worker).  Self-pairs are
    excluded; cosines round to 5dp on both engines before binning
    (the established cross-engine float grid)."""
    import ray as _ray
    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums, map_pool,
                                             round_half_up)

    t = pq.read_table(str(Path(sf_dir) / "embeddings.parquet"),
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", N_HIST_PROBES)])
    qids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                      dtype=np.int64)
    qm = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qm = qm / np.where(qn == 0, 1, qn)[:, None]
    q_ref = _ray.put((qids, qm))

    class _HistPartial:
        def __init__(self):
            self.qids, self.q = _ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = ann._table_matrix(batch)
            norms = np.linalg.norm(m, axis=1)
            mn = m / np.where(norms == 0, 1, norms)[:, None]
            cos = round_half_up(mn @ self.q.T, 5)        # (n, |P|)
            ids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            valid = ids[:, None] != self.qids[None, :]   # drop self-pairs
            bins = np.clip(np.floor(cos * 10.0), -10, 9).astype(np.int64)
            counts = np.bincount((bins[valid] + 10).ravel(), minlength=20)
            keep = counts > 0
            return pa.table({
                "bin": pa.array(np.arange(-10, 10)[keep], pa.int64()),
                "n_pairs": pa.array(counts[keep], pa.int64())})

    parts = _emb(sf_dir).map_batches(_HistPartial, batch_format="pyarrow",
                                     concurrency=(1, map_pool()))
    merged = collect_table(
        final_merge_sums(parts, ["bin"], ["n_pairs"]).materialize())
    if merged is None or merged.num_rows == 0:
        return pd.DataFrame({"bin_lo": pd.Series([], dtype="float64"),
                             "n_pairs": pd.Series([], dtype="int64")})
    df = merged.to_pandas().sort_values("bin").reset_index(drop=True)
    return pd.DataFrame({
        "bin_lo": round_half_up(df["bin"].to_numpy(np.float64) / 10.0, 1),
        "n_pairs": df["n_pairs"].astype(np.int64)})


COSINE_HISTOGRAM_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_HIST_PROBES}
), e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), p AS (
  SELECT CAST(floor(round(list_cosine_similarity(e.v, q.qv), 5) * 10)
              AS INTEGER) AS b
  FROM e, q WHERE e.vec_id <> q.qid
), c AS (
  SELECT CASE WHEN b > 9 THEN 9 WHEN b < -10 THEN -10 ELSE b END AS b2,
         count(*) AS n
  FROM p GROUP BY 1
)
SELECT round(CAST(b2 AS DOUBLE) / 10.0, 1) AS bin_lo,
       CAST(sum(n) AS BIGINT) AS n_pairs
FROM c GROUP BY b2 ORDER BY bin_lo
"""


def embedding_label_separation(sf_dir: str):
    """Label-separation matrix of the embedding space: for every
    label pair (a ≤ b) the MEAN PAIRWISE DOT PRODUCT between their
    vectors — intra-label coherence on the diagonal, inter-label
    confusion off it; the is-this-labeling-learnable diagnostic run
    before training a classifier head or probing cluster quality.

    The all-pairs mean needs no pair enumeration: with per-label
    vector sums S_l, squared-norm sums Q_l = Σ‖v‖² and counts n_l,
    mean intra dot = (S_l·S_l − Q_l) / (n_l(n_l−1)) and mean inter
    dot = (S_a·S_b) / (n_a·n_b) — exact algebra, O(labels·dim) state.
    100-TB shape: each block contributes a (label, dim, Σx) grid plus
    per-label (n, Q) rows (carried on the dim-0 row so ONE summed
    grid serves all three), the driver folds the labels×dim grid
    (class b) and forms the labels² pair matrix locally.  The SQL
    twin spells out the identical algebra, so 6dp rounding absorbs
    only float-sum order noise."""
    import pyarrow as pa
    from cheque_ocr_project_ray.util import collect_table, round_half_up
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    ds = ray.data.read_parquet(
        str(Path(sf_dir) / "embeddings.parquet"),
        columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        labels = batch.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        n_l = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        q_l = np.bincount(inv, weights=(m * m).sum(axis=1),
                          minlength=len(uniq))
        s = np.zeros((len(uniq), d), np.float64)
        np.add.at(s, inv, m)
        lab_g = np.repeat(uniq, d)
        dim_g = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        nq_n = np.zeros((len(uniq), d), np.int64)
        nq_q = np.zeros((len(uniq), d), np.float64)
        nq_n[:, 0], nq_q[:, 0] = n_l, q_l
        return pa.table({
            "label": pa.array(lab_g), "dim": pa.array(dim_g),
            "s": pa.array(s.ravel(), pa.float64()),
            "n": pa.array(nq_n.ravel(), pa.int64()),
            "q": pa.array(nq_q.ravel(), pa.float64())})

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow").materialize())
    empty = pd.DataFrame({
        "label_a": pd.Series([], dtype="int64"),
        "label_b": pd.Series([], dtype="int64"),
        "n_pairs": pd.Series([], dtype="int64"),
        "mean_dot": pd.Series([], dtype="float64")})
    if parts is None:
        return empty
    g = parts.group_by(["label", "dim"]).aggregate(
        [("s", "sum"), ("n", "sum"), ("q", "sum")]).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    labels = np.sort(g["label"].unique())
    d = g["dim"].max() + 1
    S = g["s_sum"].to_numpy(np.float64).reshape(len(labels), d)
    n = g.groupby("label")["n_sum"].sum() \
        .reindex(labels).to_numpy(np.int64)
    q = g.groupby("label")["q_sum"].sum() \
        .reindex(labels).to_numpy(np.float64)
    G = S @ S.T
    rows = []
    for i, la in enumerate(labels):
        for j, lb in enumerate(labels):
            if lb < la:
                continue
            if la == lb:
                if n[i] < 2:
                    continue
                n_pairs = int(n[i]) * (int(n[i]) - 1) // 2
                mean = (G[i, i] - q[i]) / (n[i] * (n[i] - 1.0))
            else:
                n_pairs = int(n[i]) * int(n[j])
                mean = G[i, j] / (float(n[i]) * n[j])
            rows.append((int(la), int(lb), n_pairs, mean))
    out = pd.DataFrame(rows, columns=["label_a", "label_b",
                                      "n_pairs", "mean_dot"])
    if out.empty:
        return empty
    out["mean_dot"] = round_half_up(
        out["mean_dot"].to_numpy(np.float64), 6)
    return out.sort_values(["label_a", "label_b"]) \
        .reset_index(drop=True)


EMBEDDING_LABEL_SEPARATION_SQL = """
WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
nq AS (
  SELECT label, count(*) AS n,
         sum(list_sum(list_transform(v, x -> x * x))) AS q
  FROM e GROUP BY label),
d AS (
  SELECT label,
         unnest(list_transform(v, (x, i) -> struct_pack(i := i,
                                                        x := x))) AS u
  FROM e),
s AS (SELECT label, u.i AS dim, sum(u.x) AS sv
      FROM d GROUP BY label, u.i),
pair AS (
  SELECT a.label AS la, b.label AS lb, sum(a.sv * b.sv) AS dot
  FROM s a JOIN s b ON a.dim = b.dim AND a.label <= b.label
  GROUP BY la, lb)
SELECT CAST(p.la AS BIGINT) AS label_a,
       CAST(p.lb AS BIGINT) AS label_b,
       CAST(CASE WHEN p.la = p.lb THEN na.n * (na.n - 1) // 2
            ELSE na.n * nb.n END AS BIGINT) AS n_pairs,
       round(CASE WHEN p.la = p.lb
             THEN (p.dot - na.q) / (na.n * (na.n - 1.0))
             ELSE p.dot / (1.0 * na.n * nb.n) END, 6) AS mean_dot
FROM pair p
JOIN nq na ON p.la = na.label
JOIN nq nb ON p.lb = nb.label
WHERE p.la < p.lb OR na.n > 1
ORDER BY label_a, label_b
"""


def embedding_dim_correlation(sf_dir: str):
    """Full Pearson-correlation matrix between embedding dimensions
    (strict upper triangle, long form) — the redundancy map that
    ``embedding_covariance`` leaves unscaled: |corr| → 1 pairs flag
    duplicated / linearly-dependent dimensions a PQ or PCA step can
    drop.

    100-TB shape: the SAME per-block GEMM partials as
    ``embedding_covariance`` (one XᵀX + column-sum per block, dim²
    grid rows through the bounded-adaptive merge, class b); the
    driver normalizes the collected grid — variances come from the
    diagonal rows — and emits the i<j triangle.  Both engines spell
    the identical moment expression; 6dp rounding absorbs sum-order
    noise."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cheque_ocr_project_ray.util import (collect_table,
                                             final_merge_sums,
                                             round_half_up)
    from cheque_ocr_project_ray.vector.ann import _table_matrix

    def partial(batch: pa.Table) -> pa.Table:
        m = _table_matrix(batch)
        d = m.shape[1]
        s1 = m.sum(axis=0)
        s2 = m.T @ m
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "sxy": pa.array(s2[iu, ju], pa.float64()),
            "sx": pa.array(s1[iu], pa.float64()),
            "sy": pa.array(s1[ju], pa.float64()),
            "n": pa.array(np.full(len(iu), len(m), np.int64))})

    agg = collect_table(final_merge_sums(
        _emb(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], ["sxy", "sx", "sy", "n"]).materialize())
    if agg is None or agg.num_rows == 0:
        return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                             "j": pd.Series([], dtype="int64"),
                             "corr": pd.Series([], dtype="float64")})
    df = agg.to_pandas()
    n = df["n"].to_numpy(np.float64)
    cov = df["sxy"].to_numpy() / n \
        - (df["sx"].to_numpy() / n) * (df["sy"].to_numpy() / n)
    var = {int(i): v for i, j, v in
           zip(df["i"], df["j"], cov) if i == j}
    mask = df["i"].to_numpy() < df["j"].to_numpy()
    ii = df["i"].to_numpy()[mask]
    jj = df["j"].to_numpy()[mask]
    vi = np.array([var[int(k)] for k in ii])
    vj = np.array([var[int(k)] for k in jj])
    corr = cov[mask] / np.sqrt(vi * vj)
    out = pd.DataFrame({"i": ii.astype("int64"),
                        "j": jj.astype("int64"),
                        "corr": round_half_up(corr, 6)})
    return out.sort_values(["i", "j"]).reset_index(drop=True)


EMBEDDING_DIM_CORRELATION_SQL = """
WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
d AS (
  SELECT unnest(list_transform(v, (x, i) -> struct_pack(i := i,
                                                        x := x))) AS u,
         v
  FROM e),
p AS (
  SELECT d.u.i - 1 AS i, d.u.x AS xi, t.w.i - 1 AS j, t.w.x AS xj
  FROM d, LATERAL unnest(list_transform(d.v,
           (y, k) -> struct_pack(i := k, x := y))) AS t(w)
  WHERE d.u.i < t.w.i),
pair AS (
  SELECT i, j, sum(xi * xj) AS sxy, sum(xi) AS sx, sum(xj) AS sy,
         count(*) AS n
  FROM p GROUP BY i, j),
m AS (
  SELECT d.u.i - 1 AS i, sum(d.u.x) AS s, sum(d.u.x * d.u.x) AS ss,
         count(*) AS n
  FROM d GROUP BY 1)
SELECT CAST(pair.i AS BIGINT) AS i, CAST(pair.j AS BIGINT) AS j,
       round((sxy / pair.n - (sx / pair.n) * (sy / pair.n))
             / sqrt((mi.ss / mi.n - (mi.s / mi.n) * (mi.s / mi.n))
                    * (mj.ss / mj.n - (mj.s / mj.n) * (mj.s / mj.n))),
             6) AS corr
FROM pair
JOIN m mi ON mi.i = pair.i
JOIN m mj ON mj.i = pair.j
ORDER BY i, j
"""


def vector_queries() -> dict[str, Callable]:
    return {
        "embedding_cosine_histogram": embedding_cosine_histogram,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_knn_join": ann_knn_join,
        "ann_range_search": ann_range_search,
        "ann_filtered_topk": ann_filtered_topk,
        "ann_recall_eval": ann_recall_eval,
        "embedding_covariance": embedding_covariance,
        "embedding_dim_correlation": embedding_dim_correlation,
        "embedding_dim_stats": embedding_dim_stats,
        "embedding_label_separation": embedding_label_separation,
        "embedding_pca_top": embedding_pca_top,
        "embedding_pca_scores": embedding_pca_scores,
        "embedding_norm_stats": embedding_norm_stats,
        "embedding_quantize_error": embedding_quantize_error,
        "ann_lsh_topk": ann_lsh_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_pq_topk": ann_pq_topk,
        "ann_knn_classify": ann_knn_classify,
        "embedding_neardup": embedding_neardup,
        "embedding_neardup_blocked": embedding_neardup_blocked,
        "embedding_dedup_components": embedding_dedup_components,
        "embedding_centroid_shift": embedding_centroid_shift,
        "embedding_kmeans": embedding_kmeans,
        "embedding_silhouette": embedding_silhouette,
        "embedding_pq": embedding_pq,
        "label_stats": label_stats,
        "label_centroids": label_centroids,
        "embedding_outliers": embedding_outliers,
        "embedding_mmr_topk": embedding_mmr_topk,
        "embedding_ann_ndcg": embedding_ann_ndcg,
    }


def vector_oracle_sql() -> dict[str, str]:
    return {
        "embedding_cosine_histogram": COSINE_HISTOGRAM_SQL,
        "ann_cosine_topk": ANN_TOPK_SQL,
        "ann_knn_join": KNN_JOIN_SQL,
        "ann_range_search": RANGE_SEARCH_SQL,
        "ann_filtered_topk": ANN_FILTERED_SQL,
        "embedding_covariance": EMBEDDING_COVARIANCE_SQL,
        "embedding_dim_correlation": EMBEDDING_DIM_CORRELATION_SQL,
        "embedding_dim_stats": EMBEDDING_DIM_STATS_SQL,
        "embedding_label_separation": EMBEDDING_LABEL_SEPARATION_SQL,
        "embedding_pca_top": _pca_sql(),
        "embedding_pca_scores": _pca_scores_sql(),
        "embedding_norm_stats": NORM_STATS_SQL,
        "embedding_quantize_error": QUANTIZE_ERROR_SQL,
        "embedding_neardup": NEARDUP_SQL,
        "embedding_neardup_blocked": NEARDUP_SQL,
        "embedding_dedup_components": EMBEDDING_DEDUP_COMPONENTS_SQL,
        "embedding_centroid_shift": EMBEDDING_CENTROID_SHIFT_SQL,
        "embedding_kmeans": KMEANS_SQL,
        "embedding_silhouette": SILHOUETTE_SQL,
        "embedding_pq": PQ_SQL,
        "ann_knn_classify": ANN_KNN_CLASSIFY_SQL,
        "label_stats": LABEL_STATS_SQL,
        "label_centroids": LABEL_CENTROIDS_SQL,
        "embedding_outliers": EMBEDDING_OUTLIERS_SQL,
        "embedding_mmr_topk": _mmr_sql(),
    }
