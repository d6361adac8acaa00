"""Per-file statistics from parquet footers.

Iceberg stores per-column ``lower_bounds/upper_bounds`` and
``record_count`` in manifests (/root/reference/limitations.md:82-105);
we read the same numbers straight from each file's parquet footer via
pyarrow — no data scan, O(files) footer reads, exactly what enables
the reference's 20-of-238-file stats-only skip
(/root/reference/README.md:282-290).
"""

from __future__ import annotations

from datetime import date, datetime
from typing import Any

import pyarrow.parquet as pq


def _jsonable(v: Any) -> Any:
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)


def file_stats(path: str) -> tuple[int, dict[str, list[Any]]]:
    """(record_count, {column: [min, max]}) from one parquet footer.

    Columns without usable statistics are omitted → the pruner treats
    them as "always scan" (the limitations.md:39-73 behavior for
    stats-less files).
    """
    meta = pq.ParquetFile(path).metadata
    n_rows = meta.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested (list/map elements) — not prunable
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                mins[name] = maxs[name] = None
                continue
            lo, hi = _jsonable(st.min), _jsonable(st.max)
            if lo is None or hi is None:
                mins[name] = maxs[name] = None
                continue
            if name not in mins or (mins[name] is not None and lo < mins[name]):
                mins[name] = lo
            if name not in maxs or (maxs[name] is not None and hi > maxs[name]):
                maxs[name] = hi
    bounds = {
        c: [mins[c], maxs[c]]
        for c in mins
        if mins[c] is not None and maxs[c] is not None
    }
    return n_rows, bounds
