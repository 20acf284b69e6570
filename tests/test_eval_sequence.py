"""Semantic pins for the round-4 eval/sequence additions
(SQL-twin equality runs in tools/check_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from cheque_ocr_project_ray.relational.analytics_extra import (
    PATH_LEN, PATH_TOP_K, events_funnel_paths, events_user_overlap,
    orders_priority_mix_shift)
from cheque_ocr_project_ray.text.queries import doc_lang_confusion
from cheque_ocr_project_ray.vector.queries import embedding_ann_ndcg

SF = "/root/testdata/sf0.001"


def test_funnel_paths_counts_every_user_once():
    df = events_funnel_paths(SF).to_pandas()
    assert len(df) <= PATH_TOP_K
    n_users = pd.read_parquet(f"{SF}/events.parquet",
                              columns=["user_id"])["user_id"].nunique()
    # top-k is a subset of a partition of all users
    assert df["n_users"].sum() <= n_users
    assert (df["path"].str.count(">") <= PATH_LEN - 1).all()
    n = df["n_users"].to_numpy()
    assert (np.diff(n) <= 0).all()  # descending


def test_user_overlap_brute():
    df = events_user_overlap(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    sets = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    for row in df.itertuples():
        a, b = sets[row.type_a], sets[row.type_b]
        assert row.type_a < row.type_b
        assert row.n_both == len(a & b)
        assert (row.n_a, row.n_b) == (len(a), len(b))
        assert abs(row.jaccard - len(a & b) / len(a | b)) < 1e-6


def test_mix_shift_shares_sum_to_one():
    df = orders_priority_mix_shift(SF).to_pandas()
    sums = df.groupby("yq")["share"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()
    # deltas are NaN exactly on each priority's first quarter
    firsts = df.groupby("o_orderpriority")["yq"].transform("min")
    assert df.loc[df["yq"] == firsts, "share_delta"].isna().all()
    assert df.loc[df["yq"] != firsts, "share_delta"].notna().all()


def test_lang_confusion_totals_and_accuracy():
    df = doc_lang_confusion(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # every doc lands in exactly one confusion cell
    assert df["n"].sum() == n_docs
    # predictions stay inside the heuristic's output alphabet (the
    # corpus has de/zh ground truth the 3-way heuristic cannot emit —
    # surfacing that blind spot is the point of this eval)
    assert set(df["pred_lang"]) <= {"en", "es", "fr", "und"}
    truth = pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["lang"])["lang"].value_counts()
    got = df.groupby("true_lang")["n"].sum()
    assert (got.sort_index() == truth.sort_index()).all()


def test_ndcg_bounds_and_recall_consistency():
    df = embedding_ann_ndcg(SF)
    assert set(df["method"]) == {"lsh", "ivf", "pq"}
    assert ((df["ndcg_at_10"] >= 0) & (df["ndcg_at_10"] <= 1)).all()


def test_triangles_match_bruteforce():
    from cheque_ocr_project_ray.text import dedup
    from cheque_ocr_project_ray.text.queries import (_docs,
                                                     dedup_triangles)

    res = dedup_triangles(SF)
    pairs = dedup.ngram_jaccard_pairs(_docs(SF), shingle_k=2,
                                      threshold=0.5).to_pandas()
    edges = set(zip(pairs["doc_a"], pairs["doc_b"]))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b in edges
              for c in (adj[a] & adj[b]) if b < c)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    row = res.iloc[0]
    assert row["n_triangles"] == tri
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(adj)
    if wedges:
        assert abs(row["clustering"] - 3.0 * tri / wedges) < 1e-6


def test_skyline_is_nondominated_and_complete():
    from cheque_ocr_project_ray.relational.analytics_extra import \
        part_skyline

    df = part_skyline(SF).to_pandas()
    parts = pd.read_parquet(f"{SF}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])
    pr = parts["p_retailprice"].to_numpy()
    sz = parts["p_size"].to_numpy()
    brute = set()
    for i in range(len(parts)):
        dominated = ((pr >= pr[i]) & (sz <= sz[i])
                     & ((pr > pr[i]) | (sz < sz[i]))).any()
        if not dominated:
            brute.add(int(parts["p_partkey"].iloc[i]))
    assert set(df["p_partkey"]) == brute


def test_cusum_matches_bruteforce():
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_cusum_shift

    df = events_cusum_shift(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    hr = (ev["ts"].astype("int64") // (3_600 * 1_000_000)).value_counts() \
        .sort_index()
    n = hr.to_numpy(np.int64)
    h, tot = len(n), int(n.sum())
    cu = h * np.cumsum(n) - np.arange(1, h + 1, dtype=np.int64) * tot
    i = int(np.argmax(np.abs(cu)))
    row = df.iloc[0]
    assert row["n_hours"] == h and row["total_events"] == tot
    assert abs(row["cusum_scaled"]) == np.abs(cu).max()
    assert row["shift_hour"].value // 1000 == hr.index[i] * 3_600 * 1_000_000


def test_seasonal_z_matches_bruteforce_top1():
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_hourly_seasonal_z

    df = events_hourly_seasonal_z(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    hour_us = 3_600 * 1_000_000
    hr = (ev["ts"].astype("int64") // hour_us * hour_us).value_counts() \
        .sort_index()
    g = pd.DataFrame({
        "hr": hr.index.to_numpy(np.int64),
        "n": hr.to_numpy(np.int64)})
    g["dow"] = (g["hr"] // (24 * hour_us) + 4) % 7
    g["hod"] = (g["hr"] // hour_us) % 24
    st = g.groupby(["dow", "hod"])["n"] \
        .agg(["count", "sum", lambda x: (x ** 2).sum()])
    st.columns = ["k", "s", "q"]
    m = g.merge(st.reset_index(), on=["dow", "hod"])
    mu = m["s"] / m["k"]
    var = (m["q"] * m["k"] - m["s"] * m["s"]) / (m["k"] * m["k"])
    z = np.where(var > 0, (m["n"] - mu) / np.sqrt(var.clip(1e-300)), 0)
    best = np.abs(z).max()
    assert abs(abs(df["z"].iloc[0]) - round(best, 4)) < 2e-4
    assert len(df) == 10
    zz = df["z"].abs().to_numpy()
    assert (np.diff(zz) <= 1e-9).all()  # sorted by |z| desc


def test_hhi_bounds_and_monopoly():
    from cheque_ocr_project_ray.relational.analytics_extra import \
        suppliers_hhi_by_parttype

    df = suppliers_hhi_by_parttype(SF).to_pandas()
    assert len(df) > 0
    # HHI ∈ [1/n, 1]
    lo = 1.0 / df["n_suppliers"].to_numpy()
    assert ((df["hhi"] >= lo - 1e-6) & (df["hhi"] <= 1.0 + 1e-9)).all()
    # exact brute check of one type
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice"])
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_type"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    t0 = df["p_type"].iloc[0]
    sub = j[j["p_type"] == t0]
    cents = (sub["l_extendedprice"] * 100).round().astype("int64")
    per = cents.groupby(sub["l_suppkey"]).sum()
    hhi = float((per.astype(object) ** 2).sum()) / float(per.sum()) ** 2
    assert abs(df[df["p_type"] == t0]["hhi"].iloc[0] - hhi) < 2e-6


def test_cluster_sizes_consistent_with_components():
    import ray
    from cheque_ocr_project_ray.text.queries import (dedup_cluster_sizes,
                                                     dedup_components)

    hist = dedup_cluster_sizes(SF).to_pandas()
    comp = dedup_components(SF).to_pandas()
    sizes = comp.groupby("rep").size().value_counts().sort_index()
    got = hist.set_index("cluster_size")["n_clusters"].sort_index()
    assert (got == sizes).all()
    assert (hist["cluster_size"] >= 2).all()  # pairs-only components


def test_dedup_savings_identities():
    from cheque_ocr_project_ray.text.queries import corpus_dedup_savings

    df = corpus_dedup_savings(SF)
    row = df.iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "n_chars"])
    assert row["n_docs"] == len(docs)
    assert row["n_distinct_texts"] == docs["text"].nunique()
    assert row["dup_docs"] == len(docs) - docs["text"].nunique()
    dup_chars = docs.groupby("text")["n_chars"] \
        .agg(lambda x: (len(x) - 1) * x.min()).sum()
    assert row["saved_chars"] == dup_chars


def test_hopping_users_brute():
    from cheque_ocr_project_ray.relational.queries import \
        events_hopping_users

    df = events_hopping_users(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "user_id"])
    k = ev["ts"].astype("int64") // 1_800_000_000
    w = pd.concat([pd.DataFrame({"w": k, "u": ev["user_id"]}),
                   pd.DataFrame({"w": k - 1, "u": ev["user_id"]})])
    truth = w.groupby("w")["u"].nunique()
    got = df.set_index("window_id")["n_users"].sort_index()
    assert (got == truth.sort_index()).all()


def test_attribution_conserves_value():
    from cheque_ocr_project_ray.relational.analytics_extra import (
        ATTRIB_WINDOW_US, events_attribution_linear)

    df = events_attribution_linear(SF).to_pandas()
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    # total credited == total purchase cents of purchases WITH >=1
    # touch in window (remainder rule conserves cents exactly)
    us = ev["ts"].astype("int64")
    total = 0
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        t = g["ts"].astype("int64").to_numpy()
        for i in np.flatnonzero((g["event_type"] == "purchase")
                                .to_numpy()):
            has_touch = ((t < t[i])
                         & (t >= t[i] - ATTRIB_WINDOW_US)).any()
            if has_touch:
                total += int(round(g["value"].iloc[i] * 100))
    assert int(round(df["credited_value"].sum() * 100)) == total
    assert (df["n_credits"] > 0).all()


def test_dau_wau_invariants():
    from cheque_ocr_project_ray.relational.analytics_extra import \
        events_dau_wau

    df = events_dau_wau(SF).to_pandas()
    assert (df["wau"] >= df["dau"]).all()
    assert ((df["stickiness"] > 0) & (df["stickiness"] <= 1.0)).all()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "user_id"])
    day = ev["ts"].astype("int64") // (86_400 * 1_000_000)
    dau = ev.groupby(day)["user_id"].nunique()
    got = df.set_index(df["day"].astype("int64")
                       // (86_400 * 1_000_000))["dau"]
    assert (got.sort_index() == dau.sort_index()).all()


def test_cohort_ltv_conserves_revenue():
    from cheque_ocr_project_ray.relational.analytics_extra import (
        customer_cohort_ltv)
    df = customer_cohort_ltv(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_totalprice"])
    total_cents = int(np.floor(np.abs(orders["o_totalprice"].to_numpy())
                               * 100.0 + 0.5).sum())
    assert int(round(df["revenue"].sum() * 100)) == total_cents
    assert int(df["n_orders"].sum()) == len(orders)
    assert (df["age_months"] >= 0).all()
    # every cohort has its month-0 row (the first order defines it)
    assert (df.groupby("cohort_month")["age_months"].min() == 0).all()


def test_peak_concurrency_bounds():
    from cheque_ocr_project_ray.relational.analytics_extra import (
        events_peak_concurrency)
    df = events_peak_concurrency(SF)
    assert len(df) == 1
    peak = int(df["peak_concurrency"].iloc[0])
    n_users = pd.read_parquet(f"{SF}/events.parquet",
                              columns=["user_id"])["user_id"].nunique()
    # at most one active session per user at any instant
    assert 1 <= peak <= n_users
