"""Empty-input and parameter-hardening regressions (review batch 3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cheque_ocr_project_ray.relational import joins
from cheque_ocr_project_ray.relational.queries import (
    events_stratified_sample, events_type_pivot, events_users_both,
    events_value_dense_rank, events_value_zscore, orders_above_avg,
    orders_rollup)


def _empty_events(tmp_path):
    pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "user_id": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object"),
        "value": pd.Series([], dtype="float64"),
    }).to_parquet(tmp_path / "events.parquet")
    return str(tmp_path)


def _empty_orders(tmp_path):
    pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderstatus": pd.Series([], dtype="object"),
        "o_orderpriority": pd.Series([], dtype="object"),
        "o_totalprice": pd.Series([], dtype="float64"),
    }).to_parquet(tmp_path / "orders.parquet")
    return str(tmp_path)


def test_empty_events_queries(tmp_path):
    d = _empty_events(tmp_path)
    assert events_stratified_sample(d).count() == 0
    assert events_value_zscore(d).count() == 0
    assert events_type_pivot(d).count() == 0
    assert events_value_dense_rank(d).count() == 0
    assert events_users_both(d).count() == 0


def test_empty_orders_queries(tmp_path):
    d = _empty_orders(tmp_path)
    assert orders_above_avg(d).count() == 0
    out = orders_rollup(d).to_pandas()
    # SQL ROLLUP's () grouping set survives empty input
    assert len(out) == 1
    assert out.iloc[0]["o_orderpriority"] == "ALL"
    assert out.iloc[0]["n_orders"] == 0
    assert pd.isna(out.iloc[0]["total_price"])


def test_bloom_m_bits_rounded_up():
    left = ray.data.from_items([{"k": i % 5, "v": i} for i in range(50)])
    keys = ray.data.from_items([{"k": 2}])
    # 1000 is not a multiple of 64 — must round up, not IndexError
    out = joins.bloom_semi_join(left, keys, on_left="k", on_right="k",
                                m_bits=1000, k_hashes=3).to_pandas()
    assert len(out) == 10 and (out["k"] == 2).all()


def test_hash_join_single_hot_key():
    # key cardinality 1 < num_partitions: all real rows land in ONE
    # partition, every other partition is empty on both sides — the
    # schemaless-partition crash shape the sentinel padding fixes
    left = ray.data.from_items([{"k": 7, "v": i} for i in range(5000)])
    right = ray.data.from_items([{"k": 7, "w": 1}, {"k": 8, "w": 2}])
    out = joins.hash_join(left, right, on="k",
                          num_partitions=8).to_pandas()
    assert len(out) == 5000
    assert (out["k"] == 7).all() and (out["w"] == 1).all()


def test_hash_join_narrow_and_unsigned_keys():
    # regression: sentinel padding used to build int64 sentinels for
    # EVERY integer key type, crashing on int32/uint64 key columns
    for dtype in (pa.int32(), pa.uint64(), pa.int16(), pa.uint32()):
        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 3], dtype), "v": [10, 20, 30, 31]}))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array([2, 3], dtype), "w": [200, 300]}))
        out = joins.hash_join(left, right, on="k",
                              num_partitions=4).to_pandas()
        assert sorted(out["v"].tolist()) == [20, 30, 31], str(dtype)


def test_covering_sentinels_unpadded_fallbacks():
    # 8-bit keys have no usable reserved domain; binary keys are an
    # unsupported type — both must fall back to [] (no padding), not
    # raise
    assert joins._covering_sentinels(pa.uint8(), 4) == []
    assert joins._covering_sentinels(pa.int8(), 4) == []
    assert joins._covering_sentinels(pa.binary(), 4) == []
    # and a wide type still yields one sentinel per partition
    assert len(joins._covering_sentinels(pa.int32(), 4)) == 4


def test_hash_join_schemaless_side_preserves_outer_rows():
    # regression: a schemaless empty side used to collapse left/full
    # outer joins to an empty result instead of preserving known rows
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "v": [10, 20]}))
    empty = ray.data.from_items([])  # no schema at all
    assert joins.hash_join(left, empty, on="k",
                           how="left").count() == 2
    assert joins.hash_join(left, empty, on="k",
                           how="outer").count() == 2
    assert joins.hash_join(empty, left, on="k",
                           how="right").count() == 2
    # non-preserving types stay empty (typed)
    assert joins.hash_join(left, empty, on="k", how="inner").count() == 0
    assert joins.hash_join(empty, left, on="k", how="left").count() == 0


def test_repetition_dense_bigram_keys():
    # many rows × distinct tokens: the densified pair key must keep
    # per-row maxima independent (no cross-row bleed)
    texts = [f"t{i} t{i} t{i} u{i}" for i in range(50)]
    batch = pa.table({"doc_id": list(range(50)), "text": texts})
    from cheque_ocr_project_ray.text.analysis import repetition
    out = repetition(batch).to_pydict()
    assert out["top_count"] == [3] * 50          # "t{i}" thrice
    assert out["bigram_top_frac"] == [np.float64(2 / 3).round(4)] * 50


def _empty_lineitem(tmp_path):
    pd.DataFrame({
        "l_orderkey": pd.Series([], dtype="int64"),
        "l_partkey": pd.Series([], dtype="int64"),
        "l_suppkey": pd.Series([], dtype="int64"),
        "l_quantity": pd.Series([], dtype="float64"),
        "l_extendedprice": pd.Series([], dtype="float64"),
        "l_discount": pd.Series([], dtype="float64"),
        "l_returnflag": pd.Series([], dtype="object"),
        "l_shipdate": pd.Series([], dtype="datetime64[us]"),
    }).to_parquet(tmp_path / "lineitem.parquet")


def test_empty_new_event_queries(tmp_path):
    from cheque_ocr_project_ray.relational.analytics_extra import (
        events_lag_delta, events_range_join, events_value_histogram,
        events_value_quantile_sketch)
    pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "user_id": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype="object"),
        "value": pd.Series([], dtype="float64"),
    }).to_parquet(tmp_path / "events.parquet")
    d = str(tmp_path)
    assert events_value_histogram(d).count() == 0
    assert len(events_lag_delta(d)) == 0
    assert events_range_join(d).count() == 0
    assert len(events_value_quantile_sketch(d)) == 0


def test_empty_new_tpch_queries(tmp_path):
    from cheque_ocr_project_ray.relational.tpch_extra import (
        q15_top_supplier, q21_sole_late_supplier)
    _empty_lineitem(tmp_path)
    pd.DataFrame({
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_custkey": pd.Series([], dtype="int64"),
        "o_orderstatus": pd.Series([], dtype="object"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_orderpriority": pd.Series([], dtype="object"),
        "o_totalprice": pd.Series([], dtype="float64"),
    }).to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame({
        "s_suppkey": pd.Series([], dtype="int64"),
        "s_name": pd.Series([], dtype="object"),
        "s_nationkey": pd.Series([], dtype="int32"),
        "s_acctbal": pd.Series([], dtype="float64"),
    }).to_parquet(tmp_path / "supplier.parquet")
    assert q15_top_supplier(str(tmp_path)).count() == 0
    assert q21_sole_late_supplier(str(tmp_path)).count() == 0
