"""Avro object-container I/O for real-Iceberg metadata emission.

Apache Iceberg's manifest files and manifest lists are Avro object
container files (Iceberg spec, "Manifests"/"Snapshots" sections). The
sandbox has no fastavro/pyiceberg, but Spark's classpath ships the
CANONICAL Apache Avro Java library (avro-1.12.x) — so:

- **Writing** goes through the JVM via Py4J (``write_avro``): records
  are rendered to Avro's *JSON encoding* in Python, then decoded and
  re-encoded to binary by ``org.apache.avro`` itself (JsonDecoder →
  GenericDatumReader → DataFileWriter). Every byte of the container —
  header, schema fingerprinting, block framing, sync markers — is
  produced by the reference implementation, not by us, so emitted
  manifests are spec-compliant Avro by construction.
- **Reading** is a pure-Python container decoder (``read_avro``):
  ~150 lines covering the type subset Iceberg metadata uses (records,
  nullable unions, arrays, maps, primitives, fixed, enums; null +
  deflate codecs). It is deliberately an INDEPENDENT implementation:
  tests round-trip JVM-written files through it, which cross-checks
  our reader against the canonical writer rather than against itself.

Scale note: these paths handle METADATA (one record per data file /
per manifest), never row data — a 100k-file table is ~100k tiny
records, and the JSON-bridge write is one Py4J call per FILE, not per
record.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

# ----------------------------------------------------------- reading


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)

    # -- primitives ---------------------------------------------------
    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def decode(self, schema: Any, names: dict[str, Any]) -> Any:
        if isinstance(schema, str):
            if schema in names:
                return self.decode(names[schema], names)
            t = schema
        elif isinstance(schema, list):  # union: branch index then value
            return self.decode(schema[self.long()], names)
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.bytes_()
        if t == "string":
            return self.bytes_().decode("utf-8")
        if t == "fixed":
            return self.read(schema["size"])
        if t == "enum":
            return schema["symbols"][self.long()]
        if t == "record":
            return {
                f["name"]: self.decode(f["type"], names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.long()  # byte size of block — unused
                for _ in range(n):
                    out.append(self.decode(schema["items"], names))
        if t == "map":
            m: dict[str, Any] = {}
            while True:
                n = self.long()
                if n == 0:
                    return m
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    m[self.bytes_().decode("utf-8")] = self.decode(
                        schema["values"], names
                    )
        raise ValueError(f"unsupported avro type: {t!r}")


def _collect_names(schema: Any, names: dict[str, Any]) -> None:
    """Register named types (records/fixed/enums) so later references
    by name resolve — Iceberg's manifest schema references r102 etc."""
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "fixed", "enum") and "name" in schema:
        ns = schema.get("namespace")
        full = f"{ns}.{schema['name']}" if ns else schema["name"]
        names[full] = schema
        names[schema["name"]] = schema
    if t == "record":
        for f in schema.get("fields", ()):
            _collect_names(f["type"], names)
    elif t == "array":
        _collect_names(schema.get("items"), names)
    elif t == "map":
        _collect_names(schema.get("values"), names)


def read_avro(path: str) -> tuple[dict, list[Any], dict[str, bytes]]:
    """Read an Avro object container file → (writer schema, records,
    file metadata). Pure Python; supports null + deflate codecs."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != b"Obj\x01":
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            key = r.bytes_().decode("utf-8")
            meta[key] = r.bytes_()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    names: dict[str, Any] = {}
    _collect_names(schema, names)
    records: list[Any] = []
    while not r.at_end():
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(block)
        for _ in range(count):
            records.append(br.decode(schema, names))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records, meta


# ----------------------------------------------------------- writing


def _union_branch_name(schema: Any) -> str:
    """The JSON-encoding tag for a union branch (Avro spec: full name
    for named types, type name otherwise)."""
    if isinstance(schema, str):
        return schema
    t = schema["type"]
    if t in ("record", "fixed", "enum"):
        ns = schema.get("namespace")
        return f"{ns}.{schema['name']}" if ns else schema["name"]
    return t


def to_json_encoding(schema: Any, value: Any, names: dict[str, Any]) -> Any:
    """Render ``value`` in Avro's JSON encoding for ``schema`` — the
    bridge format the JVM's JsonDecoder consumes. Unions become
    ``null`` / ``{"<branch>": v}``; bytes/fixed become ISO-8859-1
    strings (one char per byte, per the Avro spec)."""
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):  # union
        if value is None:
            if "null" not in [_union_branch_name(s) for s in schema]:
                raise ValueError("None for a union without null branch")
            return None
        non_null = [
            s for s in schema if _union_branch_name(s) != "null"
        ]
        if len(non_null) > 1:
            # the JSON encoding must tag the BRANCH the value belongs
            # to; picking one by Python value type is guesswork we
            # never need (every union this writer emits is
            # ["null", X]) — refuse loudly instead of mis-tagging
            raise ValueError(
                "union with multiple non-null branches "
                f"{[_union_branch_name(s) for s in non_null]} is not "
                "supported by the JSON encoder"
            )
        for s in non_null:
            return {
                _union_branch_name(s): to_json_encoding(s, value, names)
            }
        raise ValueError("union with only null branch got a value")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if value is not None:
            raise ValueError(f"non-null {value!r} for null schema")
        return None
    if t in ("boolean", "int", "long", "float", "double", "string"):
        return value
    if t in ("bytes", "fixed"):
        if isinstance(value, str):
            value = value.encode("utf-8")
        return value.decode("iso-8859-1")
    if t == "enum":
        return value
    if t == "record":
        return {
            f["name"]: to_json_encoding(
                f["type"], value.get(f["name"]), names
            )
            for f in schema["fields"]
        }
    if t == "array":
        return [to_json_encoding(schema["items"], v, names) for v in value]
    if t == "map":
        return {
            k: to_json_encoding(schema["values"], v, names)
            for k, v in value.items()
        }
    raise ValueError(f"unsupported avro type: {t!r}")


def write_avro(
    spark: Any,
    path: str,
    schema: dict,
    records: list[dict],
    meta: dict[str, str] | None = None,
) -> None:
    """Write an Avro object container file with the CANONICAL Apache
    Avro Java library (on Spark's classpath), one Py4J call per file:
    records travel as one Avro-JSON stream, the JVM re-encodes to
    binary and owns every container byte."""
    names: dict[str, Any] = {}
    _collect_names(schema, names)
    schema_json = json.dumps(schema)
    payload = "\n".join(
        json.dumps(to_json_encoding(schema, rec, names)) for rec in records
    )

    jvm = spark.sparkContext._jvm
    j_schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(j_schema)
    )
    for k, v in (meta or {}).items():
        writer.setMeta(k, v)
    writer.create(j_schema, jvm.java.io.File(path))
    try:
        if records:
            reader = jvm.org.apache.avro.generic.GenericDatumReader(j_schema)
            decoder = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
                j_schema, payload
            )
            for _ in range(len(records)):
                writer.append(reader.read(None, decoder))
    finally:
        writer.close()
