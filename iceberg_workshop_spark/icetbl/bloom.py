"""Per-file Bloom-filter data skipping (Iceberg's
``write.parquet.bloom-filter-enabled.column.<col>`` surface).

Min/max stats cannot prune point lookups on UNSORTED high-cardinality
columns — every file's bounds span the whole domain. Real tables solve
this with per-file Bloom filters (Parquet bloom pages; Iceberg enables
them per column via table properties). This module implements the
equivalent at the manifest layer:

- at write time, each data file gets a small Bloom bitmap per enabled
  column, computed DISTRIBUTEDLY (one Spark pass over the just-written
  files grouped by ``_metadata.file_path``; the driver receives only
  set-bit positions — metadata scale, ≤ BLOOM_BITS ints per file);
- at scan time, an equality predicate on an enabled column drops every
  file whose bitmap lacks any of the value's k probe bits. False
  positives only cost an extra file scan; false negatives are
  impossible for values the writer saw.

The probe hash is the md5-prefix family used by the exact MinHash path
(28-bit prefix, per-probe seed prefix), so the Python planner and the
Spark executors compute IDENTICAL positions with no shared native
hash. Spark's own Parquet-level bloom pages are ALSO enabled on these
columns at write time (``parquet.bloom.filter.enabled#col``) so files
carry real Parquet blooms for any external engine that reads them.
"""

from __future__ import annotations

import hashlib
from typing import Any

BLOOM_BITS = 1024
BLOOM_HASHES = 3

# Iceberg property prefix: write.parquet.bloom-filter-enabled.column.X
PROP_PREFIX = "write.parquet.bloom-filter-enabled.column."


def bloom_columns(properties: dict[str, str]) -> list[str]:
    """Columns with bloom filtering enabled via table properties."""
    return sorted(
        key[len(PROP_PREFIX):]
        for key, val in properties.items()
        if key.startswith(PROP_PREFIX) and str(val).lower() == "true"
    )


def _canon(value: Any) -> str:
    """Canonical string form shared by both engines: Spark
    CAST(x AS STRING) for integers and strings equals str(x)."""
    if isinstance(value, bool):
        return str(value).lower()
    return str(value)


def positions(value: Any, m: int = BLOOM_BITS, k: int = BLOOM_HASHES) -> list[int]:
    """The k probe-bit positions for a value (Python side)."""
    s = _canon(value)
    return [
        int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:7], 16) % m
        for seed in range(k)
    ]


def position_sql(col: str, seed: int, m: int = BLOOM_BITS) -> str:
    """Spark SQL expression computing the same position executor-side."""
    return (
        f"cast(conv(substring(md5(concat('{seed}:', cast(`{col}` as string))),"
        f" 1, 7), 16, 10) as bigint) % {m}"
    )


def encode_bits(bit_positions: list[int], m: int = BLOOM_BITS) -> str:
    """Hex bitmap (m bits) from the set-bit position list."""
    acc = 0
    for b in bit_positions:
        acc |= 1 << int(b)
    return format(acc, f"0{m // 4}x")


def file_survives_bloom(bloom: dict | None, preds: list) -> bool:
    """Equality-predicate bloom check for one file's manifest entry.

    ``bloom`` is the entry's {col: {"m":…, "k":…, "bits": hex}} map;
    ``preds`` the conjunct list of one DNF disjunct. A file is dropped
    only when some '=' predicate's probe bits are not all set —
    absent filters or non-equality predicates always keep the file
    (pruning is an optimization; the scan re-applies the predicate)."""
    if not bloom:
        return True
    for p in preds:
        if p.op != "=":
            continue
        info = bloom.get(p.col)
        if not info:
            continue
        try:
            bits = int(info["bits"], 16)
            probes = positions(p.value, int(info["m"]), int(info["k"]))
        except (KeyError, TypeError, ValueError):
            continue  # malformed entry → keep the file
        if not all((bits >> pos) & 1 for pos in probes):
            return False
    return True
