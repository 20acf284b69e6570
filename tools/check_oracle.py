"""Local replica of the driver's correctness gate.

Runs each ``queries()`` entry that has an ``oracle_sql()`` twin
side-by-side with DuckDB at the given sf dir, compares row count,
column names, and order-insensitive values column-by-column.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
       python tools/check_oracle.py --twice [sf_dir] [name ...]

``--twice`` is the determinism audit: every ``queries()`` entry
(including the rows-only ones with no SQL twin) runs twice in the same
session and the normalized results must be EXACTLY equal — dtypes,
values, bit-for-bit floats.  Actor-pool scheduling, block order, and
shuffle partitioning must not leak into results.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result):
    import ray.data
    import pyarrow as pa
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, row-sorted frame for order-insensitive compare.

    Rows sort by NON-float columns first, then by floats ROUNDED to
    8dp: sorting on raw floats would let sub-tolerance jitter (ray
    0.5000000001 vs sql 0.5) reorder rows relative to their keys and
    report spurious key-column mismatches."""
    df = df.reindex(sorted(df.columns), axis=1)
    float_cols = [c for c in df.columns
                  if df[c].dtype.kind == "f"]
    keys = [c for c in df.columns if c not in float_cols] + float_cols
    sort_frame = df.copy()
    for c in float_cols:
        sort_frame[c] = sort_frame[c].round(8)
    order = sort_frame.sort_values(keys, kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    ok = True
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        print(f"  [{name}] COLUMN MISMATCH ray={sorted(ray_df.columns)} "
              f"sql={sorted(sql_df.columns)}")
        return False
    if len(ray_df) != len(sql_df):
        print(f"  [{name}] ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}")
        ok = False
    a, b = normalize(ray_df), normalize(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        # the driver's value-hash is dtype-sensitive (r01: int64 vs
        # HUGEINT→float64 failed the hash with identical values), so a
        # float-vs-int kind mismatch is a hard failure here too
        if (av.dtype.kind in "fiu") != (bv.dtype.kind in "fiu") or \
                (av.dtype.kind == "f") != (bv.dtype.kind == "f"):
            print(f"  [{name}] DTYPE KIND MISMATCH col={col} "
                  f"ray={av.dtype} sql={bv.dtype}")
            ok = False
        if len(av) != len(bv):
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # row display uses the SAME tolerances as the pass check
            close = np.isclose(av.astype(float), bv.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True)
            good = bool(close.all())
            mism = np.where(~close)[0][:5]
        else:
            eq = av.astype(str) == bv.astype(str)
            good = bool(eq.all())
            mism = np.where(~eq)[0][:5]
        if not good:
            print(f"  [{name}] VALUE MISMATCH col={col}")
            for i in mism:
                print(f"    row {i}: ray={av[i]!r} sql={bv[i]!r}")
            ok = False
    return ok


def determinism_audit(sf_dir: str, only: set) -> None:
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        # nested columns (span structs, embedding lists) are unhashable
        # for sort_values — canonicalize object columns to repr strings
        # BEFORE the shared normalize; repr is deterministic and the
        # comparison stays exact (a repr diff IS a value diff)
        df = df.copy()
        for c in df.columns:
            if df[c].dtype.kind == "O":
                df[c] = df[c].map(repr)
        return normalize(df)

    passed = failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        a = canon(to_pandas(fn(sf_dir)))
        b = canon(to_pandas(fn(sf_dir)))
        if a.equals(b):
            print(f"  [{name}] DETERMINISTIC rows={len(a)}")
            passed += 1
        else:
            print(f"  [{name}] NONDETERMINISTIC")
            diff_cols = [c for c in a.columns
                         if not a[c].equals(b[c])] \
                if list(a.columns) == list(b.columns) else list(a.columns)
            print(f"    differing columns: {diff_cols[:6]} "
                  f"rows a={len(a)} b={len(b)}")
            failed += 1
    print(f"passed={passed} failed={failed}")
    ray.shutdown()
    sys.exit(1 if failed else 0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    twice = "--twice" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if twice:
        determinism_audit(sf_dir, only)
        return

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    unknown = only - set(oracles)
    if unknown:
        print(f"unknown query names (no oracle entry): {sorted(unknown)}")
        sys.exit(2)

    # oracles for generated-corpus queries embed the sf0.01 fixture
    # path (the driver's correctness tier); at any other sf_dir the
    # SQL would read the wrong corpus — skip instead of false-failing
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    fixture_here = str(ensure_fixture(sf_dir))

    passed = failed = skipped = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        if "cheque_ray_fixtures" in sql and fixture_here not in sql:
            print(f"  [{name}] SKIP (fixture-path oracle is pinned to "
                  f"the driver's sf0.01 tier)")
            skipped += 1
            continue
        ray_df = to_pandas(qs[name](sf_dir))
        sql_df = con.sql(sql).df()
        if compare(name, ray_df, sql_df):
            print(f"  [{name}] OK rows={len(ray_df)}")
            passed += 1
        else:
            failed += 1
    print(f"passed={passed} failed={failed} skipped={skipped}")
    ray.shutdown()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
