"""Broadcast drawer dictionary (SURVEY.md §2.3 A4, §2.4 J2).

The reference builds a sorted set of validated DRAWER_NM values by a
full DBF scan (``issuer_processor_v.py:351-357``).  Here the scan is a
column-pruned parquet read of the metadata table; the result is small
(distinct valid names), built once on the driver and shipped to every
extraction actor via ``ray.put`` — a broadcast, never a shuffle join.

Scale note: at 10^12 docs the metadata table is huge but the DISTINCT
drawer-name set stays broadcast-sized; if it ever didn't, the
distinct-collection step below is itself expressible as
``read_parquet(columns=['drawer_nm']).unique()`` before validation.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from cheque_ocr_project_ray.functions.textnorm import clean_text
from cheque_ocr_project_ray.functions.validators import is_valid_drawer


def build_drawer_dict(fixture_dir: str | Path) -> list[str]:
    """Sorted validated drawer-name dictionary from the meta table."""
    table = pq.read_table(str(Path(fixture_dir) / "meta"), columns=["drawer_nm"])
    names = set()
    # distinct first — validation cost is per distinct name, not per row
    for raw in table["drawer_nm"].unique().to_pylist():
        cleaned = clean_text(str(raw).strip())
        if is_valid_drawer(cleaned):
            names.add(cleaned)
    return sorted(names)
