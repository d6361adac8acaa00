"""``write.sort-order`` grammar and Iceberg sort-order interop.

The table property that drives range-clustered writes (``ALTER TABLE …
WRITE ORDERED BY``, table.py ``_write_files``) holds a comma-separated
list of sort fields. Round 14 extends it from bare column names to the
FULL Iceberg sort-field surface so the declaration survives the
byte-format boundary in both directions (VERDICT r13 missing #3 — a
migrating user's clustering contract must not silently drop):

    entry     := term [ASC | DESC] [NULLS FIRST | NULLS LAST]
    term      := column
               | truncate(W, column) | bucket(N, column)
               | year(column) | month(column) | day(column) | hour(column)

Defaults follow the Iceberg spec: direction ASC; null order
NULLS FIRST for ASC, NULLS LAST for DESC. A bare ``c1, c2`` therefore
parses exactly as the pre-round-14 property did — ascending,
nulls-first identity fields — so existing tables keep their meaning.

Reference parity: interoperability.md:85-112 (shared metadata — the
sort-order declaration is part of what two engines exchange);
spec "Sort Orders" for the field shape (transform, source-id,
direction, null-order).
"""

from __future__ import annotations

import re
from typing import Any

# term grammar: bare column, or transform(args..., column)
_ENTRY_RE = re.compile(
    r"""^\s*
    (?:
        (?P<fn>truncate|bucket)\s*\(\s*(?P<width>\d+)\s*,\s*(?P<tcol>\w+)\s*\)
      | (?P<timefn>year|month|day|hour)\s*\(\s*(?P<timecol>\w+)\s*\)
      | (?P<col>\w+)
    )
    (?:\s+(?P<dir>ASC|DESC))?
    (?:\s+NULLS\s+(?P<nulls>FIRST|LAST))?
    \s*$""",
    re.IGNORECASE | re.VERBOSE,
)

_KNOWN_TRANSFORMS = re.compile(
    r"^(identity|year|month|day|hour|truncate\[\d+\]|bucket\[\d+\])$"
)


def parse_sort_order(text: str) -> list[dict]:
    """Parse the property into sort-field dicts
    ``{source, transform, direction, null_order}``; raises ValueError
    on an unparsable entry (a silent drop would un-cluster writes)."""
    # top-level comma split: transform terms carry their own commas
    # (truncate(4, col)), so track paren depth
    entries: list[str] = []
    depth, cur = 0, []
    for ch in text or "":
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            entries.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    entries.append("".join(cur))
    out: list[dict] = []
    for raw in entries:
        if not raw.strip():
            continue
        m = _ENTRY_RE.match(raw)
        if not m:
            raise ValueError(f"unparsable write.sort-order entry: {raw!r}")
        if m["fn"]:
            transform = f"{m['fn'].lower()}[{int(m['width'])}]"
            source = m["tcol"]
        elif m["timefn"]:
            transform = m["timefn"].lower()
            source = m["timecol"]
        else:
            transform = "identity"
            source = m["col"]
        direction = (m["dir"] or "asc").lower()
        null_order = (
            f"nulls-{m['nulls'].lower()}"
            if m["nulls"]
            else ("nulls-first" if direction == "asc" else "nulls-last")
        )
        out.append(
            {
                "source": source,
                "transform": transform,
                "direction": direction,
                "null_order": null_order,
            }
        )
    return out


def serialize_sort_order(fields: list[dict]) -> str:
    """Inverse of :func:`parse_sort_order` — canonical property text
    (explicit direction and null order, so round trips are stable)."""
    parts = []
    for f in fields:
        t = f["transform"]
        if t == "identity":
            term = f["source"]
        elif t.startswith("truncate["):
            term = f"truncate({int(t[9:-1])}, {f['source']})"
        elif t.startswith("bucket["):
            term = f"bucket({int(t[7:-1])}, {f['source']})"
        else:
            term = f"{t}({f['source']})"
        parts.append(
            f"{term} {f['direction'].upper()} NULLS "
            f"{f['null_order'].split('-')[1].upper()}"
        )
    return ", ".join(parts)


def to_iceberg_fields(
    fields: list[dict], by_name: dict[str, dict]
) -> list[dict]:
    """Internal sort fields → Iceberg sort-order JSON fields. Returns
    [] if any source column is unknown (stale property — don't export
    a lie)."""
    out = []
    for f in fields:
        src = by_name.get(f["source"])
        if src is None:
            return []
        out.append(
            {
                "transform": f["transform"],
                "source-id": src["id"],
                "direction": f["direction"],
                "null-order": f["null_order"],
            }
        )
    return out


def from_iceberg_fields(
    json_fields: list[dict], name_by_id: dict[int, str]
) -> list[dict] | None:
    """Iceberg sort-order JSON fields → internal sort fields, or None
    when any field is not representable (unknown transform or
    unresolvable source id) — callers must then NOT declare an order
    rather than declare a wrong one."""
    out = []
    for jf in json_fields:
        name = name_by_id.get(int(jf.get("source-id", -1)))
        transform = str(jf.get("transform", ""))
        direction = str(jf.get("direction", "asc")).lower()
        null_order = str(jf.get("null-order", "nulls-first")).lower()
        if (
            name is None
            or not _KNOWN_TRANSFORMS.match(transform)
            or direction not in ("asc", "desc")
            or null_order not in ("nulls-first", "nulls-last")
        ):
            return None
        out.append(
            {
                "source": name,
                "transform": transform,
                "direction": direction,
                "null_order": null_order,
            }
        )
    return out


def sort_exprs(tbl: Any, fields: list[dict]) -> list:
    """Spark ordering expressions for the write path's
    ``repartitionByRange``/``sortWithinPartitions``: the transform
    expression (shared with hidden partitioning — write and plan must
    agree) with the declared direction and null order applied."""
    exprs = []
    for f in fields:
        base = tbl._transform_expr(
            {"source": f["source"], "transform": f["transform"],
             "name": f["source"]}
        )
        if f["direction"] == "asc":
            expr = (
                base.asc_nulls_first()
                if f["null_order"] == "nulls-first"
                else base.asc_nulls_last()
            )
        else:
            expr = (
                base.desc_nulls_first()
                if f["null_order"] == "nulls-first"
                else base.desc_nulls_last()
            )
        exprs.append(expr)
    return exprs
