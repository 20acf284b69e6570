"""High-cardinality scale probes (round-4 verdict item #7).

The sf tiers top out at 1 500 distinct users, so the user-keyed
queries' DISTRIBUTED branches (forced here with ``bound=0``) never
execute in the ordinary suite.  These tests build a synthetic
120 000-user / 300 000-event corpus (80× the sf0.1 user cardinality;
a standalone 1M-user run of the same branches is recorded in
BASELINE.md), force every bounded-adaptive fallback, verify the
results against the SAME DuckDB oracle SQL the driver uses, and
assert the driver never collects a table above a block-bounded cap —
the "docstring promises a fallback the code lacks" gap cannot
silently reopen.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_USERS = 120_000
N_EVENTS = 300_000
# partial collects are bounded by blocks × small domains; the raw
# user tables are >= 120_000 rows, so the cap separates cleanly
COLLECT_CAP = 25_000
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def hc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hc")
    rng = np.random.default_rng(42)
    user = rng.integers(0, N_USERS, N_EVENTS)
    user[:N_USERS] = np.arange(N_USERS)  # every user present
    ts = np.datetime64("2024-01-01", "us") + rng.integers(
        0, 120 * 86_400_000_000, N_EVENTS).astype("timedelta64[us]")
    types = np.array(["signup", "click", "view", "purchase", "error"])
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "user_id": pa.array(user, pa.int64()),
        "ts": pa.array(ts),
        "event_type": pa.array(types[rng.integers(0, 5, N_EVENTS)],
                               pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 500, N_EVENTS), 2),
                          pa.float64()),
    }), d / "events.parquet", row_group_size=50_000)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(N_USERS), pa.int64()),
        "c_nationkey": pa.array(rng.integers(0, 25, N_USERS), pa.int64()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, N_USERS), 2),
                              pa.float64()),
    }), d / "customer.parquet", row_group_size=50_000)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(N_USERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_USERS, N_USERS), pa.int64()),
        "o_orderpriority": pa.array(np.where(
            rng.random(N_USERS) < 0.2, "1-URGENT", "3-MEDIUM")),
        "o_totalprice": pa.array(np.round(rng.uniform(10, 9999, N_USERS), 2),
                                 pa.float64()),
        "o_orderdate": pa.array(
            np.datetime64("2023-01-01", "us") + rng.integers(
                0, 700 * 86_400_000_000, N_USERS)
            .astype("timedelta64[us]")),
    }), d / "orders.parquet", row_group_size=50_000)
    n_li = 240_000
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, N_USERS, n_li),
                               pa.int64()),
        "l_shipdate": pa.array(
            np.datetime64("2023-01-01", "us") + rng.integers(
                0, 760 * 86_400_000_000, n_li)
            .astype("timedelta64[us]")),
    }), d / "lineitem.parquet", row_group_size=50_000)
    return str(d)


@pytest.fixture()
def collect_cap(monkeypatch):
    """Record every collect_table's row count, through every module
    alias, so a test can assert nothing user-cardinality was pulled
    onto the driver while the distributed branch ran."""
    import cheque_ocr_project_ray.relational.analytics_extra as ax
    import cheque_ocr_project_ray.relational.queries as rq
    import cheque_ocr_project_ray.util as u
    seen: list[int] = []
    real = u.collect_table

    def recording(ds):
        t = real(ds)
        seen.append(0 if t is None else t.num_rows)
        return t

    for mod in (u, rq, ax):
        # analytics_extra imports collect_table function-locally from
        # util, so patching util covers it; raising=False skips the
        # modules without a module-level alias
        monkeypatch.setattr(mod, "collect_table", recording,
                            raising=False)
    return seen


def _sql(d: str, sql: str, tables=("events",)) -> pd.DataFrame:
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    return con.sql(sql).df()


def _cmp(ray_df: pd.DataFrame, sql_df: pd.DataFrame, keys) -> None:
    a = ray_df[sql_df.columns.tolist()].sort_values(keys) \
        .reset_index(drop=True)
    b = sql_df.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_first_touch_distributed(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.queries import (
        EVENTS_FIRST_TOUCH_SQL, events_first_touch)
    df = events_first_touch(hc_dir, bound=0).to_pandas()
    assert len(df) == N_USERS
    _cmp(df, _sql(hc_dir, EVENTS_FIRST_TOUCH_SQL), ["user_id"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_user_types_distributed(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.queries import (
        EVENTS_USER_TYPES_SQL, events_user_types)
    df = events_user_types(hc_dir, bound=0).to_pandas()
    assert len(df) == N_USERS
    _cmp(df, _sql(hc_dir, EVENTS_USER_TYPES_SQL), ["user_id"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_retention_distributed(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.queries import (
        EVENTS_RETENTION_SQL, events_retention)
    df = events_retention(hc_dir, bound=0).to_pandas()
    _cmp(df, _sql(hc_dir, EVENTS_RETENTION_SQL),
         ["cohort_week", "week_offset"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_funnel_block_partials(ray_session, hc_dir, collect_cap):
    # funnel's fix is unconditional: the driver sees per-BLOCK 3-int
    # partial sums, never the per-user flag table
    from cheque_ocr_project_ray.relational.queries import (
        EVENTS_FUNNEL_SQL, events_funnel)
    df = events_funnel(hc_dir).to_pandas()
    _cmp(df, _sql(hc_dir, EVENTS_FUNNEL_SQL), ["stage"])
    assert max(collect_cap, default=0) <= 64  # one row per block


def test_idle_rich_anti_join(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.queries import (
        CUSTOMERS_IDLE_RICH_SQL, customers_idle_rich)
    df = customers_idle_rich(hc_dir, bound=0).to_pandas()
    _cmp(df, _sql(hc_dir, CUSTOMERS_IDLE_RICH_SQL,
                  ("customer", "orders")), ["c_nationkey"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_orders_above_avg_join(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.queries import (
        ORDERS_ABOVE_AVG_SQL, orders_above_avg)
    df = orders_above_avg(hc_dir, bound=0).to_pandas()
    _cmp(df, _sql(hc_dir, ORDERS_ABOVE_AVG_SQL, ("orders",)),
         ["o_orderkey"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_orders_pareto_prefix_scan(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.analytics_extra import (
        ORDERS_PARETO_SQL, orders_pareto)
    df = orders_pareto(hc_dir, bound=0).to_pandas()
    _cmp(df, _sql(hc_dir, ORDERS_PARETO_SQL, ("orders",)),
         ["c_custkey"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_dup_rate_join_path(ray_session):
    # bound=0 forces the fp hash-join branch on the real corpus tier
    import __ray_entry__ as entry
    from cheque_ocr_project_ray.text.queries import doc_source_dup_rate
    sql = entry.oracle_sql()["doc_source_dup_rate"]
    df = doc_source_dup_rate(SF001, bound=0).to_pandas()
    _cmp(df, _sql(SF001, sql, ("documents",)), ["source"])


def test_media_dedup_distributed(ray_session):
    from cheque_ocr_project_ray.multimodal.queries import media_dedup_exact
    a = media_dedup_exact(SF001).to_pandas().sort_values("fp") \
        .reset_index(drop=True)
    b = media_dedup_exact(SF001, bound=0).to_pandas().sort_values("fp") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])

def test_peak_concurrency_prefix_scan(ray_session, hc_dir, collect_cap):
    # bound=0 forces the distributed sort + two-phase block scan; the
    # driver sees only n_blocks (total, candidate) pairs
    from cheque_ocr_project_ray.relational.analytics_extra import (
        EVENTS_PEAK_CONCURRENCY_SQL, events_peak_concurrency)
    df = events_peak_concurrency(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, EVENTS_PEAK_CONCURRENCY_SQL),
         ["peak_concurrency"])
    assert max(collect_cap, default=0) <= COLLECT_CAP

def test_busy_coverage_prefix_scan(ray_session, hc_dir, collect_cap):
    from cheque_ocr_project_ray.relational.analytics_extra import (
        EVENTS_BUSY_COVERAGE_SQL, events_busy_coverage)
    df = events_busy_coverage(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, EVENTS_BUSY_COVERAGE_SQL), ["busy_us"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_cohort_ltv_join_path(ray_session, hc_dir, collect_cap):
    # bound=0 forces distributed grid + cohort merges AND the
    # hash-join attach; only the months^2 matrix reaches the driver
    from cheque_ocr_project_ray.relational.analytics_extra import (
        CUSTOMER_COHORT_LTV_SQL, customer_cohort_ltv)
    df = customer_cohort_ltv(hc_dir, bound=0).to_pandas()
    _cmp(df, _sql(hc_dir, CUSTOMER_COHORT_LTV_SQL, ("orders",)),
         ["cohort_month", "age_months"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_vocab_coverage_prefix_scan(ray_session, collect_cap):
    # bound=0 forces the distributed sort + two-phase block probe;
    # the driver folds n_blocks (k90, cum100) tuples, never a term
    from cheque_ocr_project_ray.text.queries import (
        CORPUS_VOCAB_COVERAGE_SQL, corpus_vocab_coverage)
    df = corpus_vocab_coverage(SF001, bound=0)
    _cmp(df, _sql(SF001, CORPUS_VOCAB_COVERAGE_SQL, ("documents",)),
         ["n_tokens"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_zipf_slope_block_moments(ray_session, collect_cap):
    from cheque_ocr_project_ray.text.queries import (
        ZIPF_SLOPE_SQL, corpus_zipf_slope)
    df = corpus_zipf_slope(SF001, bound=0)
    _cmp(df, _sql(SF001, ZIPF_SLOPE_SQL, ("documents",)), ["n_terms"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_stopword_block_topk(ray_session, collect_cap):
    from cheque_ocr_project_ray.text.queries import (
        STOPWORD_DISCOVERY_SQL, corpus_stopword_discovery)
    df = corpus_stopword_discovery(SF001, bound=0)
    _cmp(df.reset_index(drop=True),
         _sql(SF001, STOPWORD_DISCOVERY_SQL, ("documents",)), ["term"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_unigram_logprob_join_path(ray_session, collect_cap):
    # bound=0 forces the vocabulary-join fallback: (tok, logp) stays
    # a Dataset, docs explode to (doc_id, tok, tf), hash_join + merge
    from cheque_ocr_project_ray.text.queries import (
        UNIGRAM_LOGPROB_SQL, doc_unigram_logprob)
    df = doc_unigram_logprob(SF001, bound=0).to_pandas()
    _cmp(df, _sql(SF001, UNIGRAM_LOGPROB_SQL, ("documents",)),
         ["doc_id"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_tfidf_topk_join_path(ray_session, collect_cap):
    # bound=0: IDF stays a Dataset — term-keyed hash_join + doc-keyed
    # grouped top-k; no vocab on the driver
    from cheque_ocr_project_ray.text.queries import (TFIDF_SQL,
                                                     doc_tfidf_topk)
    df = doc_tfidf_topk(SF001, bound=0).to_pandas()
    _cmp(df, _sql(SF001, TFIDF_SQL, ("documents",)),
         ["doc_id", "rnk"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_tfidf_pairs_join_path(ray_session, collect_cap):
    # bound=0: capped IDF join is the df-cap filter, norms reduce
    # through the doc-keyed merge, postings stay distributed
    from cheque_ocr_project_ray.text.queries import (TFIDF_PAIRS_SQL,
                                                     doc_tfidf_pairs)
    # Dataset and pyarrow.Table (the typed-empty return) both expose
    # to_pandas
    df = doc_tfidf_pairs(SF001, bound=0).to_pandas()
    _cmp(df, _sql(SF001, TFIDF_PAIRS_SQL, ("documents",)),
         ["doc_a", "doc_b"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_bigram_logprob_join_path(ray_session, collect_cap):
    # bound=0 forces the bigram-LM join fallback: c1 via token-keyed
    # join, scores via bigram-keyed join, per-doc merge — no LM on
    # the driver
    from cheque_ocr_project_ray.text.queries import (BIGRAM_LOGPROB_SQL,
                                                     doc_bigram_logprob)
    df = doc_bigram_logprob(SF001, bound=0).to_pandas()
    _cmp(df, _sql(SF001, BIGRAM_LOGPROB_SQL, ("documents",)),
         ["doc_id"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_source_jsd_block_fold(ray_session, collect_cap):
    # bound=0: KL partials fold per block; driver sums scalars only
    from cheque_ocr_project_ray.text.queries import (SOURCE_JSD_SQL,
                                                     doc_source_jsd)
    df = doc_source_jsd(SF001, bound=0)
    _cmp(df, _sql(SF001, SOURCE_JSD_SQL, ("documents",)), ["jsd"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_hapax_ratio_distributed(ray_session, collect_cap):
    # bound=0 forces BOTH merges distributed: the (source, tok)
    # vocabulary counts and the per-(source, block) rollup; the
    # driver only collects the sources-bounded final grid
    from cheque_ocr_project_ray.text.queries import (HAPAX_RATIO_SQL,
                                                     corpus_hapax_ratio)
    df = corpus_hapax_ratio(SF001, bound=0)
    _cmp(df, _sql(SF001, HAPAX_RATIO_SQL, ("documents",)), ["source"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_source_overlap_join_path(ray_session, collect_cap):
    # bound=0 forces the distinct (source, tok) min-merge through its
    # distributed branch; the pair counts always come from the
    # token-keyed hash self-join, so the driver only ever folds the
    # |sources|^2 grid and the per-source size vector
    from cheque_ocr_project_ray.text.queries import (SOURCE_OVERLAP_SQL,
                                                     corpus_source_overlap)
    df = corpus_source_overlap(SF001, bound=0)
    _cmp(df, _sql(SF001, SOURCE_OVERLAP_SQL, ("documents",)),
         ["source_a", "source_b"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_pmi_bigrams_join_path(ray_session, collect_cap):
    # bound=0 forces BOTH vocabulary merges distributed and the
    # c1/c2 attach through the two token-keyed hash joins; the
    # driver only re-ranks the K*n_blocks per-block top-k candidates
    from cheque_ocr_project_ray.text.queries import (PMI_BIGRAMS_SQL,
                                                     corpus_pmi_bigrams)
    df = corpus_pmi_bigrams(SF001, bound=0)
    _cmp(df, _sql(SF001, PMI_BIGRAMS_SQL, ("documents",)), ["bigram"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_burstiness_block_topk(ray_session, collect_cap):
    # bound=0 forces the per-term moment merge distributed; the VMR
    # is row-local and the driver only re-ranks block top-k rows
    from cheque_ocr_project_ray.text.queries import (BURSTINESS_SQL,
                                                     corpus_burstiness)
    df = corpus_burstiness(SF001, bound=0)
    _cmp(df, _sql(SF001, BURSTINESS_SQL, ("documents",)), ["tok"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_growth_accounting_join_path(ray_session, hc_dir, collect_cap):
    # bound=0 forces the activity-grid merge distributed, the
    # prev-month flag through the composite-key LEFT hash self-join
    # and the first-month attach through the custkey-keyed join; the
    # driver folds only the |months| class grid
    from cheque_ocr_project_ray.relational.analytics_extra import (
        ORDERS_GROWTH_SQL, orders_growth_accounting)
    df = orders_growth_accounting(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, ORDERS_GROWTH_SQL, ("orders",)), ["month"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_interarrival_sorted_carry(ray_session, hc_dir, collect_cap):
    # bound=0 forces the activity grid distributed end-to-end: one
    # sort on (custkey, day), per-block diff with last-row neighbor
    # carry; the driver folds only the weeks-bounded bucket grid
    from cheque_ocr_project_ray.relational.analytics_extra import (
        ORDERS_INTERARRIVAL_SQL, orders_interarrival)
    df = orders_interarrival(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, ORDERS_INTERARRIVAL_SQL, ("orders",)),
         ["week_bucket"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_balance_deciles_two_phase(ray_session, hc_dir, collect_cap):
    # bound=0 forces the distributed sort + per-block decile
    # assignment from exclusive row offsets, revenue attached via the
    # custkey-keyed LEFT hash join; the driver folds 10 x n_blocks
    from cheque_ocr_project_ray.relational.analytics_extra import (
        CUSTOMER_BALANCE_DECILES_SQL, customer_balance_deciles)
    df = customer_balance_deciles(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, CUSTOMER_BALANCE_DECILES_SQL,
                  ("customer", "orders")), ["decile"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_fulfillment_span_distributed(ray_session, hc_dir, collect_cap):
    # bound=0 forces the distributed per-order min/neg-max groupby;
    # the driver folds only the span-bounded histogram grid
    from cheque_ocr_project_ray.relational.analytics_extra import (
        ORDER_FULFILLMENT_SPAN_SQL, order_fulfillment_span)
    df = order_fulfillment_span(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, ORDER_FULFILLMENT_SPAN_SQL, ("lineitem",)),
         ["span_days"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_shipping_latency_distributed(ray_session, hc_dir, collect_cap):
    # bound=0 forces the distributed per-order moment merge feeding
    # the orderkey-keyed hash join; the driver folds the 2-priority
    # grid only
    from cheque_ocr_project_ray.relational.analytics_extra import (
        SHIPPING_LATENCY_SQL, shipping_latency_by_priority)
    df = shipping_latency_by_priority(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, SHIPPING_LATENCY_SQL,
                  ("lineitem", "orders")), ["o_orderpriority"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_activity_histogram_distributed(ray_session, hc_dir,
                                        collect_cap):
    # bound=0 forces the distributed per-user count groupby; the
    # driver folds only the activity-level grid
    from cheque_ocr_project_ray.relational.analytics_extra import (
        EVENTS_ACTIVITY_HISTOGRAM_SQL, events_activity_histogram)
    df = events_activity_histogram(hc_dir, bound=0)
    _cmp(df, _sql(hc_dir, EVENTS_ACTIVITY_HISTOGRAM_SQL), ["n_events"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_trade_balance_distributed(ray_session, collect_cap):
    # bound=0 forces BOTH per-key merges (custkey, suppkey) through
    # the distributed groupby feeding the dimension hash joins; only
    # the two nation grids reach the driver
    from cheque_ocr_project_ray.relational.analytics_extra import (
        NATION_TRADE_BALANCE_SQL, nation_trade_balance)
    df = nation_trade_balance(SF001, bound=0)
    _cmp(df, _sql(SF001, NATION_TRADE_BALANCE_SQL,
                  ("orders", "customer", "lineitem", "supplier",
                   "nation")), ["n_name"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_word_length_histogram_distributed(ray_session, collect_cap):
    # bound=0 keeps the vocabulary count table distributed; the
    # length rollup is a second combiner pass over that stream
    from cheque_ocr_project_ray.text.queries import (
        CORPUS_WORD_LENGTH_SQL, corpus_word_length_histogram)
    df = corpus_word_length_histogram(SF001, bound=0)
    _cmp(df, _sql(SF001, CORPUS_WORD_LENGTH_SQL, ("documents",)),
         ["wlen"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_segment_profile_distributed(ray_session, collect_cap):
    # bound=0 forces the per-custkey order merge through the
    # distributed groupby feeding the custkey hash join; the customer
    # dim folds to a segments x n_blocks grid
    from cheque_ocr_project_ray.relational.analytics_extra import (
        CUSTOMER_SEGMENT_PROFILE_SQL, customer_segment_profile)
    df = customer_segment_profile(SF001, bound=0)
    _cmp(df, _sql(SF001, CUSTOMER_SEGMENT_PROFILE_SQL,
                  ("customer", "orders")), ["segment"])
    assert max(collect_cap, default=0) <= COLLECT_CAP


def test_bigram_entropy_distributed(ray_session, collect_cap):
    # bound=0 keeps both the unigram and bigram count tables
    # distributed; c1 attaches via the token-keyed hash join and the
    # driver folds n_blocks float partials
    from cheque_ocr_project_ray.text.queries import (
        CORPUS_BIGRAM_ENTROPY_SQL, corpus_bigram_entropy)
    df = corpus_bigram_entropy(SF001, bound=0)
    _cmp(df, _sql(SF001, CORPUS_BIGRAM_ENTROPY_SQL, ("documents",)),
         ["n_bigrams"])
    assert max(collect_cap, default=0) <= COLLECT_CAP
