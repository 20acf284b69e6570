"""Distributed BPE merge training — the tokenizer-training operator.

Classic byte-pair encoding trains on the WORD-FREQUENCY table, not the
raw corpus: the distributed part is reducing 100 TB of text to that
bounded table (combiner word counts, one shuffle); the merge loop then
iterates over it.  Here the loop itself also stays distributed — each
round is

    map_batches(pair partials over the symbolized word table)
      → bounded-adaptive merge (driver Arrow group_by / distributed
        groupby fallback)
      → ONE (pair, count) winner picked from the merged partials
      → broadcast of that single merge rule
      → map_batches applying the merge to every word's symbol list

so nothing but the k-row merge table and one rule per round ever
reaches the driver, and the word table streams through the object
store between rounds.  Determinism: winner = (count DESC, left ASC,
right ASC); word pre-tokenization is lowercase ``[a-z]+`` runs (no
end-of-word marker — corpus-statistics variant, documented).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from cheque_ocr_project_ray.util import (collect_table, final_merge_sums,
                                         map_pool)

_WORD_RE = re.compile(r"[a-z]+")


def word_counts(docs_ds, np_: int = 0, bound: int = 2_000_000):
    """documents → Dataset[word, n] (the bounded BPE training table;
    ``bound`` forwards to the bounded-adaptive merge so vocabulary-
    rank callers can keep the count table distributed)."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch.column("text")).to_pylist()
        words: list[str] = []
        for t in texts:
            words.extend(_WORD_RE.findall(t or ""))
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"word": pa.array(words, pa.string()),
                      "n": pa.array(np.ones(len(words), np.int64))})
        g = t.group_by("word").aggregate([("n", "sum")])
        return g.rename_columns(["word", "n"])

    return final_merge_sums(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["word"], ["n"], np_=np_, bound=bound)


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts weighted by word frequency."""
    syms = batch.column("syms").to_pylist()
    ns = batch.column("n").to_pylist()
    agg: dict[tuple[str, str], int] = {}
    for s, n in zip(syms, ns):
        for a, b in zip(s, s[1:]):
            agg[(a, b)] = agg.get((a, b), 0) + n
    if not agg:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    items = list(agg.items())
    return pa.table({
        "left": pa.array([k[0] for k, _ in items], pa.string()),
        "right": pa.array([k[1] for k, _ in items], pa.string()),
        "cnt": pa.array([v for _, v in items], pa.int64())})


def bpe_merges(docs_ds, n_merges: int = 5, np_: int = 0):
    """The first ``n_merges`` BPE merge rules learned from the corpus.

    Returns a pandas DataFrame (rank, left, right, merged, cnt) — k
    rows, rows-only by design (the fixed-point merge loop is not
    SQL-expressible at reasonable cost; the pytest checks it against a
    hand-computed classic example).
    """
    import pandas as pd

    words = word_counts(docs_ds, np_)

    def symbolize(batch: pa.Table) -> pa.Table:
        ws = batch.column("word").to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in ws],
                             pa.list_(pa.string())),
            "n": batch.column("n")})

    table = words.map_batches(symbolize, batch_format="pyarrow") \
        .materialize()

    out = []
    for rank in range(n_merges):
        merged_pairs = collect_table(final_merge_sums(
            table.map_batches(_pair_partials, batch_format="pyarrow"),
            ["left", "right"], ["cnt"], np_=np_).materialize())
        if merged_pairs is None or merged_pairs.num_rows == 0:
            break
        # winner: count DESC, then (left, right) ASC — one tiny sort
        # over the merged pair table (bounded by the symbol vocab²,
        # itself capped by the word-table reduction)
        df = merged_pairs.to_pandas().sort_values(
            ["cnt", "left", "right"],
            ascending=[False, True, True]).iloc[0]
        left, right, cnt = str(df["left"]), str(df["right"]), int(df["cnt"])
        merged = left + right
        out.append({"rank": rank, "left": left, "right": right,
                    "merged": merged, "cnt": cnt})
        rule_ref = ray.put((left, right, merged))

        def apply_rule(batch: pa.Table, _ref=rule_ref) -> pa.Table:
            lft, rgt, mrg = ray.get(_ref)
            syms = batch.column("syms").to_pylist()
            new = []
            for s in syms:
                i, acc = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == lft and s[i + 1] == rgt:
                        acc.append(mrg)
                        i += 2
                    else:
                        acc.append(s[i])
                        i += 1
                new.append(acc)
            return pa.table({"syms": pa.array(new, pa.list_(pa.string())),
                             "n": batch.column("n")})

        table = table.map_batches(apply_rule, batch_format="pyarrow") \
            .materialize()

    return pd.DataFrame(out, columns=["rank", "left", "right",
                                      "merged", "cnt"])
