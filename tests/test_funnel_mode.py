"""Ordered funnel + grouped mode tests."""

import numpy as np
import pandas as pd

from cheque_ocr_project_ray.relational.queries import (events_funnel,
                                                       part_brand_mode)


def test_funnel_order_constraint(tmp_path):
    # u1: full ordered funnel; u2: click BEFORE signup (no click
    # stage); u3: purchase before click (signup+click only);
    # u4: never signs up
    rows = [
        (1, "signup", 10), (1, "click", 20), (1, "purchase", 30),
        (2, "click", 5), (2, "signup", 10), (2, "purchase", 40),
        (3, "signup", 10), (3, "purchase", 15), (3, "click", 20),
        (4, "click", 10), (4, "purchase", 20),
    ]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows)),
        "user_id": [r[0] for r in rows],
        "event_type": [r[1] for r in rows],
        "ts": pd.to_datetime([r[2] for r in rows], unit="s"),
        "value": 1.0,
    })
    df.to_parquet(tmp_path / "events.parquet")
    out = events_funnel(str(tmp_path)).to_pandas()
    got = dict(zip(out["stage"], out["n_users"]))
    # u2's click at t=5 precedes signup -> not counted for click;
    # u2's purchase at 40 needs a prior counted click -> no.
    # u3 clicks at 20 after signup -> click yes; purchase at 15 is
    # before that click -> no.
    assert got == {"signup": 3, "click": 2, "purchase": 1}


def test_mode_tie_breaks_lexicographically(tmp_path):
    df = pd.DataFrame({
        "p_partkey": np.arange(6),
        "p_name": "x",
        "p_brand": ["B1", "B1", "B1", "B2", "B2", "B2"],
        "p_type": ["tb", "ta", "tb", "tz", "ta", "tz"],
        "p_size": 1,
        "p_retailprice": 1.0,
    })
    df.to_parquet(tmp_path / "part.parquet")
    out = part_brand_mode(str(tmp_path)).to_pandas()
    got = {r.p_brand: (r.mode_type, r.n) for r in out.itertuples()}
    assert got == {"B1": ("tb", 2), "B2": ("tz", 2)}


def test_retention_cohorts(tmp_path):
    # two cohorts: users 1,2 first seen week 0; user 3 first seen
    # week 1. Activity: u1 weeks {0,1,2}, u2 {0}, u3 {1,2}
    week = 7 * 86400
    rows = [(1, 0), (1, week + 5), (1, 2 * week + 5), (1, 10),
            (2, 20), (3, week + 1), (3, 2 * week + 1)]
    df = pd.DataFrame({
        "event_id": np.arange(len(rows)),
        "user_id": [r[0] for r in rows],
        "event_type": "click",
        "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
        "value": 1.0,
    })
    df.to_parquet(tmp_path / "events.parquet")
    from cheque_ocr_project_ray.relational.queries import events_retention
    out = events_retention(str(tmp_path)).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1,
                   (1, 0): 1, (1, 1): 1}
