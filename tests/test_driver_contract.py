"""Driver-contract consistency: every oracle key has a query, every
query is callable with one sf_dir argument, and names are stable."""

import inspect

import __ray_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql entries without queries: {missing}"


def test_queries_take_one_sf_dir():
    for name, fn in entry.queries().items():
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty
                  and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
        assert len(params) <= 1, f"{name} requires more than sf_dir"


def test_expected_families_present():
    qs = set(entry.queries())
    for probe in ("cheque_extract", "cheque_spans_json",
                  "cheque_span_explode", "q1_pricing_summary",
                  "dedup_minhash", "dedup_winnow", "doc_split",
                  "ann_cosine_topk", "ann_knn_join",
                  "media_decode_stats", "corpus_curation",
                  "corpus_pipeline", "events_sessions"):
        assert probe in qs
    assert len(qs) >= 258
    assert len(entry.oracle_sql()) >= 246


def _family(name: str) -> str:
    if name.startswith("cheque"):
        return "cheque"
    if name.startswith(("doc", "corpus", "dedup", "source", "text")):
        return "text"
    if name.startswith(("ann", "embedding", "label", "knn", "vector")):
        return "vector"
    if name.startswith("media"):
        return "multimodal"
    return "relational"


def test_per_family_floors():
    """A regression in a family the driver's sample didn't draw (the
    r2 sample was cheque+relational only) must fail HERE, not wait for
    the driver to happen to draw it.  Floors = round-4 counts."""
    import collections
    q = collections.Counter(_family(n) for n in entry.queries())
    o = collections.Counter(_family(n) for n in entry.oracle_sql())
    for fam, (qf, of) in {"cheque": (20, 19), "relational": (115, 113),
                          "text": (57, 56), "vector": (27, 22),
                          "multimodal": (11, 8)}.items():
        assert q[fam] >= qf, f"{fam} queries shrank: {q[fam]} < {qf}"
        assert o[fam] >= of, f"{fam} oracles shrank: {o[fam]} < {of}"


def test_hash_shuffled_queries_forward_kwargs():
    """The tuning parameters the decorated queries advertise
    (gap_minutes, k) must actually be callable — the decorator
    forwards **kwargs (regression: it used to strip them)."""
    from cheque_ocr_project_ray.relational.queries import (
        events_sessions, events_top_per_type)
    sf = "/root/testdata/sf0.001"
    wide = events_sessions(sf, gap_minutes=10**9).to_pandas()
    assert (wide["n_sessions"] == 1).all()   # one giant gap window
    top1 = events_top_per_type(sf, k=1).to_pandas()
    assert top1.groupby("event_type").size().max() == 1
