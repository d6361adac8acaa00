"""Real Apache Iceberg byte-format export / import.

Closes the interop gap the reference demonstrates across engines
(``/root/reference/pyspark-iceberg/interoperability.md:76-112``: any
engine opens a table from ``v<N>.metadata.json`` + Avro manifests).
Our internal ``icetbl`` dialect reproduces Iceberg's SEMANTICS with
JSON manifests; this module emits and consumes the SPEC BYTES:

- ``export_iceberg(tbl, dest)`` — write a spec-compliant Iceberg v2
  table: ``metadata/v1.metadata.json`` (TableMetadata v2 fields),
  ``snap-<id>-…​.avro`` manifest list and ``…​-m0.avro`` manifest as
  Avro object container files with Iceberg's field-ids, plus
  ``version-hint.text`` (HadoopTables convention — the layout the
  reference's filesystem tables use). Avro bytes come from the
  canonical Apache Avro Java library (see ``avroio``), so a real
  engine's Avro layer reads them natively.
- ``read_iceberg(spark, location)`` — open a REAL Iceberg table:
  resolve the current metadata file via version-hint (or newest
  ``*.metadata.json``), walk snapshot → manifest list → manifests →
  data files (pure-Python Avro reader), and return the DataFrame.
  Data manifests only; tables carrying v2 delete files are refused
  loudly rather than read wrong.

Scope (documented, not hidden): export ships the CURRENT snapshot of
the table as one append snapshot with an unpartitioned spec — the
history/partition-evolution timeline stays in the icetbl dialect.
Column bounds are exported for int/long/float/double/string/timestamp
columns using Iceberg's single-value binary serialization, so file
skipping works on the other side.

Metadata-scale only: one Avro record per data file; no row data moves.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from iceberg_workshop_spark.icetbl import meta as M
from iceberg_workshop_spark.icetbl.avroio import read_avro, write_avro

# ------------------------------------------------------ schema mapping

_SIMPLE = {
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "binary",
    T.DateType: "date",
    T.TimestampType: "timestamptz",  # session pinned to UTC
    T.TimestampNTZType: "timestamp",
}


class _IdGen:
    def __init__(self) -> None:
        self.last = 0

    def next(self) -> int:
        self.last += 1
        return self.last


def _iceberg_type(dt: T.DataType, ids: _IdGen) -> Any:
    for cls, name in _SIMPLE.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": ids.next(),
            "element": _iceberg_type(dt.elementType, ids),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": ids.next(),
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, ids),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": ids.next(),
            "value-id": ids.next(),
            "key": _iceberg_type(dt.keyType, ids),
            "value": _iceberg_type(dt.valueType, ids),
            "value-required": not dt.valueContainsNull,
        }
    raise ValueError(f"cannot map Spark type {dt} to an Iceberg type")


def iceberg_schema(spark_schema: T.StructType) -> dict:
    """Iceberg schema JSON (with assigned field-ids) for a Spark
    schema. Top-level fields get the first ids — Iceberg's own initial
    assignment order — then nested element/key/value ids follow."""
    ids = _IdGen()
    top = [(f, ids.next()) for f in spark_schema.fields]
    return {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _iceberg_type(f.dataType, ids),
            }
            for f, fid in top
        ],
        "_last_column_id": ids.last,  # stripped before serialization
    }


# -------------------------------------------- bound value serialization


def _bound_bytes(ice_type: Any, value: Any) -> bytes | None:
    """Iceberg single-value binary serialization (spec Appendix D) for
    the bound types we export; None = skip this column's bound."""
    if value is None or not isinstance(ice_type, str):
        return None
    try:
        if ice_type == "int":
            return struct.pack("<i", int(value))
        if ice_type == "long":
            return struct.pack("<q", int(value))
        if ice_type == "float":
            return struct.pack("<f", float(value))
        if ice_type == "double":
            return struct.pack("<d", float(value))
        if ice_type == "string":
            return str(value).encode("utf-8")
        if ice_type in ("timestamp", "timestamptz"):
            # icetbl stores bounds as ISO strings or epoch micros
            if isinstance(value, (int, float)):
                return struct.pack("<q", int(value))
            import datetime as _dt

            s = str(value).replace("T", " ")
            dt = _dt.datetime.fromisoformat(s)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=_dt.timezone.utc)
            # integer arithmetic: dt.timestamp()*1e6 floats ~1.3% of
            # microsecond values off by 1µs (review-reproduced), which
            # would let an engine prune a file whose true max matches
            # an equality predicate
            epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            micros = (dt - epoch) // _dt.timedelta(microseconds=1)
            return struct.pack("<q", micros)
    except (ValueError, OverflowError, struct.error):
        return None
    return None


# ------------------------------------------------------- avro schemas

_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"],
         "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 511},
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": _FIELD_SUMMARY,
                           "element-id": 508}],
         "default": None, "field-id": 507},
    ],
}


def _bounds_map_schema(name: str, kid: int, vid: int) -> dict:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": "bytes", "field-id": vid},
            ],
        },
    }


MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record",
            "name": "r2",
            "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": [],
                }},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                {"name": "lower_bounds",
                 "type": ["null", _bounds_map_schema("k126_v127", 126, 127)],
                 "default": None, "field-id": 125},
                {"name": "upper_bounds",
                 "type": ["null", _bounds_map_schema("k129_v130", 129, 130)],
                 "default": None, "field-id": 128},
                {"name": "split_offsets",
                 "type": ["null", {"type": "array", "items": "long",
                                   "element-id": 133}],
                 "default": None, "field-id": 132},
                {"name": "sort_order_id", "type": ["null", "int"],
                 "default": None, "field-id": 140},
            ],
        }},
    ],
}


# ------------------------------------------------------------- export


def export_iceberg(tbl: Any, dest: str) -> str:
    """Export the table's CURRENT snapshot as a spec-compliant Apache
    Iceberg v2 table rooted at ``dest``. Data files are referenced in
    place by absolute path (Iceberg paths may live anywhere); only
    metadata is written. Returns the metadata file path."""
    spark: SparkSession = tbl.spark
    # Outstanding merge-on-read delete sidecars are applied at READ
    # time in the icetbl dialect; exporting only the data file list
    # would resurrect every deleted row on the other side. Refuse
    # loudly (the import side refuses delete manifests the same way) —
    # compaction materializes the deletes and makes the table
    # exportable.
    cur_sid = tbl.meta.current_snapshot_id
    if cur_sid is not None and tbl.meta.delete_entries(
        tbl.meta.snapshot(cur_sid)
    ):
        raise ValueError(
            "table has outstanding merge-on-read delete files; exporting "
            "the data file list alone would resurrect deleted rows — run "
            "compaction (rewrite_data_files) first"
        )
    mdir = os.path.join(dest, "metadata")
    os.makedirs(mdir, exist_ok=True)

    schema = iceberg_schema(tbl.read().schema)
    last_column_id = schema.pop("_last_column_id")
    by_name = {f["name"]: f for f in schema["fields"]}

    snap_id = int(uuid.uuid4().int % (1 << 62))
    seq = 1
    files = tbl.meta.current_files()
    now = M.now_ms()

    def bounds_for(entry: dict, idx: int) -> list[dict] | None:
        """idx 0 = lower, 1 = upper. icetbl stores bounds as
        ``{col: [min, max]}`` (or legacy ``{col: {"min","max"}}``)."""
        out = []
        for col, b in (entry.get("bounds") or {}).items():
            f = by_name.get(col)
            if f is None:
                continue
            if isinstance(b, dict):
                val = b.get("min" if idx == 0 else "max")
            elif isinstance(b, (list, tuple)) and len(b) == 2:
                val = b[idx]
            else:
                continue
            raw = _bound_bytes(f["type"], val)
            if raw is not None:
                out.append({"key": f["id"], "value": raw})
        return sorted(out, key=lambda kv: kv["key"]) or None

    entries = [
        {
            "status": 1,  # ADDED (this export is one append snapshot)
            "snapshot_id": snap_id,
            "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0,
                "file_path": os.path.abspath(f["path"]),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": int(f.get("record_count") or 0),
                "file_size_in_bytes": int(
                    f.get("file_size")
                    or os.path.getsize(os.path.abspath(f["path"]))
                ),
                "lower_bounds": bounds_for(f, 0),
                "upper_bounds": bounds_for(f, 1),
                "split_offsets": None,
                "sort_order_id": None,
            },
        }
        for f in files
    ]
    manifest_path = os.path.join(mdir, f"{uuid.uuid4()}-m0.avro")
    write_avro(
        spark, manifest_path, MANIFEST_ENTRY_SCHEMA, entries,
        meta={
            "schema": json.dumps(schema),
            "schema-id": "0",
            "partition-spec": json.dumps([]),
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )

    total_rows = sum(e["data_file"]["record_count"] for e in entries)
    mlist_path = os.path.join(
        mdir, f"snap-{snap_id}-1-{uuid.uuid4()}.avro"
    )
    write_avro(
        spark, mlist_path, MANIFEST_LIST_SCHEMA,
        [{
            "manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": total_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
            "partitions": [],
        }],
        meta={
            "format-version": "2",
            "snapshot-id": str(snap_id),
            "sequence-number": str(seq),
            "parent-snapshot-id": "null",
        },
    )

    doc = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": os.path.abspath(dest),
        "last-sequence-number": seq,
        "last-updated-ms": now,
        "last-column-id": last_column_id,
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "write.format.default": "parquet",
            # our parquet files are written by vanilla Spark without
            # PARQUET field-id metadata; real Iceberg engines resolve
            # columns by FIELD ID and need this name-mapping fallback
            # (spec: "Column Projection") to project ID-less files —
            # without it they would read every column as NULL
            "schema.name-mapping.default": json.dumps(
                [
                    {"field-id": f["id"], "names": [f["name"]]}
                    for f in schema["fields"]
                ]
            ),
        },
        "current-snapshot-id": snap_id,
        "snapshots": [{
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": now,
            "manifest-list": mlist_path,
            "summary": {
                "operation": "append",
                "added-data-files": str(len(entries)),
                "added-records": str(total_rows),
                "total-data-files": str(len(entries)),
                "total-records": str(total_rows),
            },
            "schema-id": 0,
        }],
        "snapshot-log": [{"timestamp-ms": now, "snapshot-id": snap_id}],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": snap_id, "type": "branch"}},
    }
    md_path = os.path.join(mdir, "v1.metadata.json")
    with open(md_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return md_path


# ------------------------------------------------------------- import


def _strip_scheme(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p


_FROM_ICE = {
    "int": "int", "long": "bigint", "float": "float", "double": "double",
    "boolean": "boolean", "string": "string", "binary": "binary",
    "date": "date", "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz", "uuid": "string", "time": "bigint",
}


def _spark_type_of(ice: Any) -> str:
    """Spark DDL type for an Iceberg type (inverse of _iceberg_type)."""
    if isinstance(ice, str):
        if ice in _FROM_ICE:
            return _FROM_ICE[ice]
        if ice.startswith("decimal"):
            return ice.replace(" ", "")
        raise ValueError(f"cannot map Iceberg type {ice!r} to Spark")
    t = ice["type"]
    if t == "list":
        return f"array<{_spark_type_of(ice['element'])}>"
    if t == "struct":
        inner = ",".join(
            f"{f['name']}:{_spark_type_of(f['type'])}" for f in ice["fields"]
        )
        return f"struct<{inner}>"
    if t == "map":
        return (
            f"map<{_spark_type_of(ice['key'])},"
            f"{_spark_type_of(ice['value'])}>"
        )
    raise ValueError(f"cannot map Iceberg type {ice!r} to Spark")


def _current_schema(doc: dict) -> list[dict]:
    sid = doc.get("current-schema-id", 0)
    for sch in doc.get("schemas", []):
        if sch.get("schema-id") == sid:
            return sch["fields"]
    # v1-style single inline schema
    if "schema" in doc and isinstance(doc["schema"], dict):
        return doc["schema"].get("fields", [])
    raise ValueError("Iceberg metadata has no resolvable current schema")


def _ddl_of(doc: dict) -> str:
    return ", ".join(
        f"{f['name']} {_spark_type_of(f['type'])}" for f in _current_schema(doc)
    )


def resolve_iceberg_metadata(location: str) -> dict:
    """Locate and parse the current ``*.metadata.json`` of a real
    Iceberg table: version-hint.text (HadoopTables) first, else the
    lexically-newest metadata file (catalog-written tables)."""
    mdir = os.path.join(location, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    path = None
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        for cand in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(mdir, cand)
            if os.path.exists(p):
                path = p
                break
    if path is None:
        def _order(name: str):
            # HadoopTables names are v<N>.metadata.json — sort those
            # NUMERICALLY (lexical order reads v9 > v10 and would
            # silently open stale metadata); catalog-written names
            # (00000-<uuid>.metadata.json) sort lexically.
            stem = name[: -len(".metadata.json")]
            if stem.startswith("v") and stem[1:].isdigit():
                return (1, int(stem[1:]), name)
            return (0, 0, name)

        cands = sorted(
            (n for n in os.listdir(mdir) if n.endswith(".metadata.json")),
            key=_order,
        )
        if not cands:
            raise FileNotFoundError(f"no *.metadata.json under {mdir}")
        path = os.path.join(mdir, cands[-1])
    with open(path) as fh:
        return json.load(fh)


def iceberg_data_files(doc: dict, snapshot_id: int | None = None) -> list[dict]:
    """Walk snapshot → manifest list → manifests of a real Iceberg
    table and return live data-file dicts (path, record_count, ...).
    Refuses tables with v2 delete files instead of reading them wrong."""
    sid = snapshot_id if snapshot_id is not None else doc.get(
        "current-snapshot-id"
    )
    snaps = {s["snapshot-id"]: s for s in doc.get("snapshots", [])}
    if sid is None or sid not in snaps:
        return []
    snap = snaps[sid]
    _, manifests, _ = read_avro(_strip_scheme(snap["manifest-list"]))
    out: list[dict] = []
    for mf in manifests:
        if mf.get("content", 0) != 0:
            raise ValueError(
                "this Iceberg table carries v2 DELETE manifests; the "
                "import reader supports data manifests only — compact "
                "the table (rewrite_data_files) before importing"
            )
        _, entries, _ = read_avro(_strip_scheme(mf["manifest_path"]))
        for e in entries:
            if e["status"] == 2:  # DELETED
                continue
            df = e["data_file"]
            if df.get("content", 0) != 0:
                raise ValueError(
                    "delete files present in a data manifest; unsupported"
                )
            if df["file_format"].upper() != "PARQUET":
                raise ValueError(
                    f"unsupported data file format {df['file_format']!r}"
                )
            out.append(df)
    return out


def read_iceberg(
    spark: SparkSession, location: str, snapshot_id: int | None = None
) -> DataFrame:
    """Open a REAL Iceberg table (the format the reference's engines
    share) and return its rows as a DataFrame."""
    doc = resolve_iceberg_metadata(location)
    files = iceberg_data_files(doc, snapshot_id)
    if not files:
        # empty table: the TABLE's schema, not a placeholder — unions
        # and .select() downstream must keep working
        return spark.createDataFrame([], schema=_ddl_of(doc))
    return spark.read.parquet(
        *[_strip_scheme(f["file_path"]) for f in files]
    )


def _bound_value(ice_type: Any, raw: bytes) -> Any:
    """Inverse of ``_bound_bytes`` for the types we import."""
    if not isinstance(ice_type, str):
        return None
    try:
        if ice_type == "int":
            return struct.unpack("<i", raw)[0]
        if ice_type == "long":
            return struct.unpack("<q", raw)[0]
        if ice_type == "float":
            return struct.unpack("<f", raw)[0]
        if ice_type == "double":
            return struct.unpack("<d", raw)[0]
        if ice_type == "string":
            return raw.decode("utf-8")
    except (struct.error, UnicodeDecodeError):
        return None
    return None


def import_iceberg(spark: SparkSession, location: str, dest: str) -> Any:
    """Adopt a REAL Iceberg table into the icetbl dialect so its files
    can be MANAGED here (appends, MoR deletes, compaction, expiry) —
    the other half of the interop story: ``read_iceberg`` opens the
    bytes, this registers them. Data files are adopted in place (no
    rewrite — the same no-copy migration the reference demonstrates
    for Hive tables, ``limitations.md:39-73``); manifest stats
    (record counts, int/long/float/double/string bounds) are carried
    over so pruning keeps working, unlike the reference's stats-less
    Hive migration."""
    from iceberg_workshop_spark.icetbl.table import IceTable

    doc = resolve_iceberg_metadata(location)
    files = iceberg_data_files(doc)
    if not files:
        raise ValueError(f"no live data files in Iceberg table {location}")
    fields = _current_schema(doc)
    by_id = {f["id"]: f for f in fields}
    # Adopt under the metadata's CURRENT schema, not the first file's
    # footer (a schema-evolved table's oldest file is missing added
    # columns). Our adopted reads resolve columns BY NAME, which is
    # only sound while every live file's physical names match the
    # current schema — a renamed column (same field-id, new name)
    # breaks that mapping, so detect the mismatch on the oldest file
    # and refuse loudly rather than read wrong/missing columns.
    paths = [_strip_scheme(f["file_path"]) for f in files]
    declared = {f["name"] for f in fields}
    physical = set(spark.read.parquet(paths[0]).schema.names)
    if not physical <= declared:
        raise ValueError(
            "Iceberg table's data files carry column names absent from "
            f"its current schema ({sorted(physical - declared)}) — a "
            "renamed column needs field-id resolution, which the adopt "
            "path does not provide; rewrite the files first"
        )
    tbl = IceTable.create(spark, dest, _ddl_of(doc), [])

    def bounds_of(df_entry: dict) -> dict:
        out: dict[str, list] = {}
        lowers = {
            kv["key"]: kv["value"]
            for kv in (df_entry.get("lower_bounds") or [])
        }
        uppers = {
            kv["key"]: kv["value"]
            for kv in (df_entry.get("upper_bounds") or [])
        }
        for fid, f in by_id.items():
            if fid in lowers and fid in uppers:
                lo = _bound_value(f["type"], lowers[fid])
                hi = _bound_value(f["type"], uppers[fid])
                if lo is not None and hi is not None:
                    out[f["name"]] = [lo, hi]
        return out

    entries = [
        {
            "path": _strip_scheme(f["file_path"]),
            "record_count": int(f.get("record_count") or 0),
            "file_size": int(
                f.get("file_size_in_bytes")
                or os.path.getsize(_strip_scheme(f["file_path"]))
            ),
            "partition": {},
            "spec_id": 0,
            "bounds": bounds_of(f),
        }
        for f in files
    ]
    tbl._commit_snapshot_delta(entries, [], "adopt", rebase="blind")
    return tbl
