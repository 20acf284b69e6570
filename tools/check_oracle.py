"""Local replica of the driver's correctness gate.

Runs each ``queries()`` entry that has an ``oracle_sql()`` twin
side-by-side with DuckDB at the given sf dir, compares row count,
column names, and order-insensitive values column-by-column.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
