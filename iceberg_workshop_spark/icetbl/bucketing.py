"""Iceberg's ``bucket[N]`` transform — murmur3_x86_32 over the spec's
single-value binary encoding.

The bucket transform is the one partition transform whose VALUE is an
engine contract: two engines only agree on which file holds key ``k``
if they hash the same bytes with the same function. Apache Iceberg
pins both publicly (spec, "Appendix B: 32-bit Hash Requirements"):

- hash = murmur3_x86_32 (seed 0) of the value's encoding
- int / long / date        -> 8-byte little-endian of the LONG value
  (ints and dates promote to long so ``bucket(34::int) ==
  bucket(34::long)`` — required by the spec)
- time / timestamp[tz]     -> microseconds-from-epoch long, 8-byte LE
- string                   -> UTF-8 bytes
- binary / fixed           -> raw bytes
- decimal                  -> minimum-width big-endian two's-complement
  of the UNSCALED value
- bucket id = ``(hash & Integer.MAX_VALUE) % N``

Spark's built-in ``hash()`` is also murmur3-x86-32 but with seed 42
over Spark's internal row encoding — a DIFFERENT function, which is
why bucket ids computed with ``F.hash`` could never be exported to a
real Iceberg engine (iceformat previously refused them).

Two implementations that must agree (tests pin both to the spec's
published vectors):

- :func:`bucket_value` — driver-side Python, used by the planner to
  bucket a predicate literal and by import/export verification.
- :func:`bucket_col` — the write-path Spark column. For the 8-byte
  long encodings the whole hash unrolls into JVM integer arithmetic
  (two fixed 4-byte mix rounds + finalizer), so bucketed writes of
  int/long/date/timestamp keys stay inside whole-stage codegen — no
  Python in the hot path. Variable-length encodings (string/binary/
  decimal) fall back to an Arrow-batched pandas UDF (write-path only;
  the planner side is always driver-side Python on one literal).

Reference parity: the reference's Iceberg tables use this transform
via Impala/Spark DDL (``PARTITIONED BY SPEC (BUCKET(h, col))`` —
/root/reference/README.md partitioning sections); here it backs both
the internal dialect's hidden partitioning and the byte-format
export in ``iceformat``.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone
from decimal import Decimal
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_U32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _U32


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Canonical murmur3_x86_32; returns a SIGNED int32 (Java parity,
    the domain Iceberg's ``(h & Integer.MAX_VALUE)`` operates in)."""
    h = seed & _U32
    n = len(data)
    full = n - (n % 4)
    for i in range(0, full, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * _C1) & _U32
        k = _rotl32(k, 15)
        k = (k * _C2) & _U32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _U32
    tail = data[full:]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * _C1) & _U32
        k = _rotl32(k, 15)
        k = (k * _C2) & _U32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _U32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _U32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _decimal_bytes(v: Decimal) -> bytes:
    """Minimum-width big-endian two's-complement of the unscaled value
    (the spec's decimal encoding; scale comes from the TYPE, so it is
    not part of the bytes)."""
    unscaled = int(v.scaleb(-v.as_tuple().exponent)) if v.as_tuple().exponent < 0 else int(v)
    # Signed MINIMAL length (Java BigInteger.toByteArray parity): a
    # negative power-of-two boundary like -128 is 1 byte (b'\x80'), not
    # 2 (b'\xff\x80') — bit_length() of -2^(8k-1) already counts the
    # sign bit, so measure (unscaled + 1) for negatives instead.
    measured = unscaled + 1 if unscaled < 0 else unscaled
    length = max(1, (measured.bit_length() + 8) // 8)
    return unscaled.to_bytes(length, "big", signed=True)


_EPOCH = date(1970, 1, 1)
_EPOCH_TS = datetime(1970, 1, 1, tzinfo=timezone.utc)


def encode_value(value: Any) -> bytes:
    """Iceberg single-value hash encoding of a Python literal."""
    if isinstance(value, bool):
        raise ValueError("bucket[N] on boolean is not defined by the spec")
    if isinstance(value, int):
        return struct.pack("<q", value)
    if isinstance(value, str):
        return value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        return bytes(value)
    if isinstance(value, Decimal):
        return _decimal_bytes(value)
    if isinstance(value, datetime):
        # micros from epoch, exact integer arithmetic (total_seconds()
        # is float and loses sub-microsecond exactness at large epochs)
        ts = value if value.tzinfo else value.replace(tzinfo=timezone.utc)
        delta = ts - _EPOCH_TS
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return struct.pack("<q", micros)
    if isinstance(value, date):
        return struct.pack("<q", (value - _EPOCH).days)
    if isinstance(value, float):
        raise ValueError(
            "bucket[N] on float/double is not supported (the spec "
            "deprecates bucketing floating point keys)"
        )
    raise ValueError(f"cannot bucket-encode literal of type {type(value).__name__}")


class UncoercibleLiteral(ValueError):
    """An equality literal that cannot be represented in the bucket
    source column's type — callers must SKIP bucket pruning for that
    field (sound: every file survives; the row-level filter still
    applies)."""


def coerce_bucket_literal(value: Any, type_ddl: str) -> Any:
    """Coerce a predicate literal to the bucket SOURCE column's type
    before hashing (ADVICE r13): :func:`bucket_value` encodes by the
    literal's PYTHON type, so an ISO string probed against a
    date/timestamp column, or an int/float against a decimal column,
    would hash different bytes than the write path and silently prune
    the matching files. ``type_ddl`` is the Spark DDL type string
    (``DataType.simpleString()``). Raises :class:`UncoercibleLiteral`
    for literals the column type cannot represent exactly."""
    if value is None:
        return None
    t = type_ddl.strip().lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        if isinstance(value, bool):
            raise UncoercibleLiteral(f"bool literal on {t} column")
        if isinstance(value, int):
            return value
        if isinstance(value, float) and value.is_integer():
            return int(value)
        if isinstance(value, str):
            try:
                return int(value)
            except ValueError:
                raise UncoercibleLiteral(f"{value!r} on {t} column") from None
        raise UncoercibleLiteral(f"{type(value).__name__} on {t} column")
    if t == "date":
        if isinstance(value, datetime):
            # a timestamp literal equals a date value only at midnight
            if (value.hour, value.minute, value.second, value.microsecond) == (0, 0, 0, 0):
                return value.date()
            raise UncoercibleLiteral("non-midnight timestamp on date column")
        if isinstance(value, date):
            return value
        if isinstance(value, str):
            try:
                return date.fromisoformat(value)
            except ValueError:
                raise UncoercibleLiteral(f"{value!r} on date column") from None
        raise UncoercibleLiteral(f"{type(value).__name__} on date column")
    if t in ("timestamp", "timestamp_ltz", "timestamp_ntz"):
        if isinstance(value, datetime):
            return value
        if isinstance(value, date):
            return datetime(value.year, value.month, value.day)
        if isinstance(value, str):
            try:
                return datetime.fromisoformat(value)
            except ValueError:
                raise UncoercibleLiteral(f"{value!r} on {t} column") from None
        raise UncoercibleLiteral(f"{type(value).__name__} on {t} column")
    if t.startswith("decimal"):
        import re as _re
        from decimal import InvalidOperation

        m = _re.match(r"decimal\s*\(\s*\d+\s*,\s*(\d+)\s*\)", t)
        scale = int(m.group(1)) if m else 0
        if isinstance(value, bool) or isinstance(value, (bytes, bytearray)):
            raise UncoercibleLiteral(f"{type(value).__name__} on {t} column")
        try:
            d = value if isinstance(value, Decimal) else Decimal(str(value))
            q = d.quantize(Decimal(1).scaleb(-scale))
        except (InvalidOperation, ValueError):
            raise UncoercibleLiteral(f"{value!r} on {t} column") from None
        if q != d:
            # the literal has more precision than the column can hold —
            # it can never equal a column value, but skipping the prune
            # (rather than pruning everything) keeps the planner sound
            raise UncoercibleLiteral(f"{value!r} exceeds scale {scale}")
        return q
    if t == "string":
        if isinstance(value, str):
            return value
        raise UncoercibleLiteral(f"{type(value).__name__} on string column")
    if t == "binary":
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        raise UncoercibleLiteral(f"{type(value).__name__} on binary column")
    raise UncoercibleLiteral(f"bucket literal coercion on {type_ddl}")


def bucket_value(value: Any, n: int) -> int | None:
    """``bucket[N]`` of one literal — the planner/import/export twin of
    the write-path column. ``None`` buckets to ``None`` (null partition)."""
    if value is None:
        return None
    return (murmur3_x86_32(encode_value(value)) & 0x7FFFFFFF) % n


_LONG_ENCODED = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.DateType, T.TimestampType, T.TimestampNTZType,
)


def _let(x: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``x`` ONCE and make
    it available to ``body`` as a named lambda variable.

    Murmur3's mix rounds reference each intermediate value several
    times (rotates and multiply-splits use their input twice); naive
    Column composition would COPY the input subtree at each reference,
    growing the Catalyst tree exponentially (~2^15 nodes for the full
    hash — it OOMs the driver before a single row is evaluated).
    ``transform`` over a one-element array introduces a real lambda
    variable, so each stage's tree is referenced, not copied, and the
    whole hash stays a linear ~40-node expression."""
    return F.transform(F.array(x), body)[0]


def _mulu32(a: Column, b: int) -> Column:
    """``(a * b) mod 2^32`` for uint32 ``a`` and constant uint32 ``b``
    without overflowing Spark's signed long: split ``a`` into 16-bit
    halves so every partial product stays below 2^48."""
    return _let(
        a,
        lambda v: (
            v.bitwiseAND(F.lit(0xFFFF)) * F.lit(b)
            + F.shiftleft(
                (F.shiftright(v, 16) * F.lit(b)).bitwiseAND(F.lit(0xFFFF)), 16
            )
        ).bitwiseAND(F.lit(_U32)),
    )


def _rotl32_col(x: Column, r: int) -> Column:
    return _let(
        x,
        lambda v: F.shiftleft(v, r)
        .bitwiseAND(F.lit(_U32))
        .bitwiseOR(F.shiftright(v, 32 - r)),
    )


def _xshift(x: Column, r: int) -> Column:
    return _let(x, lambda v: v.bitwiseXOR(F.shiftright(v, r)))


def _mix_round(h: Column, k: Column) -> Column:
    k = _mulu32(k, _C1)
    k = _rotl32_col(k, 15)
    k = _mulu32(k, _C2)
    h = h.bitwiseXOR(k)
    h = _rotl32_col(h, 13)
    return (_mulu32(h, 5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_U32))


def _murmur3_long_col(v: Column) -> Column:
    """murmur3_x86_32 of the 8-byte little-endian encoding of a LONG,
    unrolled into JVM integer arithmetic: exactly two 4-byte blocks —
    low word then high word — and the fixed len=8 finalizer. Returns
    the UNSIGNED 32-bit hash as a long in [0, 2^32)."""
    v = v.cast("long")  # referenced twice below; the source tree is tiny
    k1 = v.bitwiseAND(F.lit(_U32))
    k2 = F.shiftright(v, 32).bitwiseAND(F.lit(_U32))
    h = _mix_round(F.lit(0).cast("long"), k1)
    h = _mix_round(h, k2)
    h = h.bitwiseXOR(F.lit(8))
    h = _xshift(h, 16)
    h = _mulu32(h, 0x85EBCA6B)
    h = _xshift(h, 13)
    h = _mulu32(h, 0xC2B2AE35)
    return _xshift(h, 16)


def _long_encoding_col(col: Column, dt: T.DataType) -> Column:
    """The LONG whose 8-byte LE encoding the spec hashes for this type."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col.cast("long")
    if isinstance(dt, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("long")
    # timestamp / timestamp_ntz: microseconds from epoch. For NTZ the
    # spec hashes the wall-clock micros; unix_micros needs a tz-aware
    # input, so NTZ casts through TIMESTAMP under the session's UTC pin.
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.to_utc_timestamp(col.cast("timestamp"), "UTC"))
    return F.unix_micros(col)


def _native_murmur3_long(col: Column) -> Column | None:
    """Spark's own ``Murmur3Hash`` catalyst expression with SEED 0
    over a LONG child is bit-identical to murmur3_x86_32 of the
    value's 8-byte little-endian encoding (hashLong: low-word mix
    round, high-word mix round, len-8 finalizer) — i.e. EXACTLY
    Iceberg's bucket hash for every long-encoded type. ``F.hash`` pins
    seed 42, but the expression's constructor takes the seed, so
    building it through the JVM yields one native codegen'd expression
    at the cost of Spark's own ``hash()`` — reclaiming the r13
    bucket-write regression (the staged-projection chain was ~2x
    native). Pinned to the spec's Appendix-B vectors in
    tests/test_bucketing.py next to the two Python/chain twins.

    Returns None when the internal constructor is unavailable (API
    drift across Spark versions) — callers fall back to the staged
    arithmetic chain, which is public-API-only."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        jvm = spark._jvm
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        expr = eu.expression(col._jc)
        seq = (
            jvm.scala.collection.JavaConverters
            .asScalaBufferConverter([expr]).asScala().toSeq()
        )
        m3 = jvm.org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
            seq, 0
        )
        return Column(eu.column(m3))
    except Exception:  # pragma: no cover - environment-specific
        return None


def with_bucket_column(
    df, out_name: str, src: str, n: int, dt: T.DataType
):
    """Write-path ``bucket[N]``: append ``out_name`` to ``df`` holding
    the Iceberg bucket id of column ``src``.

    For long-encoded types the hash is laid out as a CHAIN OF NAMED
    PROJECTIONS (each murmur3 stage a temp column referencing the
    previous one) rather than one nested Column: transform() lambdas —
    the let-binding trick :func:`bucket_col` needs to keep a single
    Column's tree linear — are evaluated INTERPRETED, outside
    whole-stage codegen, measured ~11x slower. Named intermediates are
    referenced more than once with non-cheap expressions, so
    CollapseProject keeps them as separate projections and codegen
    fuses the whole chain into one generated stage with local
    variables — within ~2x of Spark's native hash(). CollapseProject
    inlining them back WOULD re-explode the tree exponentially; a
    plan-size assertion in tests/test_bucketing.py guards that
    optimizer contract."""
    if not isinstance(dt, _LONG_ENCODED):
        return df.withColumn(out_name, _bucket_udf(n, dt)(F.col(src)))
    # primary path: Spark's native Murmur3Hash with seed 0 — a single
    # codegen'd expression (round 14; ~native-hash() cost, reclaiming
    # the r13 staged-chain regression)
    h = _native_murmur3_long(_long_encoding_col(F.col(src), dt))
    if h is not None:
        return df.withColumn(
            out_name,
            F.when(F.col(src).isNull(), F.lit(None).cast("int")).otherwise(
                F.pmod(
                    h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n)
                ).cast("int")
            ),
        )
    # deterministic temp-column prefix (Python's hash() is seeded per
    # process — plan text should not vary run to run)
    import zlib

    p = f"__iwsb_{zlib.crc32(out_name.encode()) % 10**6}_"
    # Every temp name this call creates is recorded and ONLY those are
    # dropped at the end — a pre-existing user column that happens to
    # share the prefix must survive, and a genuine name collision
    # (user column == a generated name) is an error, not a clobber.
    created: list[str] = []
    existing = set(df.columns)

    def _tmp(name: str) -> str:
        if name not in created:
            if name in existing:
                raise ValueError(
                    f"bucket temp column name {name!r} collides with an "
                    "existing column; rename the source column"
                )
            created.append(name)
        return name

    u32 = F.lit(_U32)

    def mulu32(d, out, a, b):
        return d.withColumn(_tmp(out), (
            F.col(a).bitwiseAND(F.lit(0xFFFF)) * F.lit(b)
            + F.shiftleft(
                (F.shiftright(F.col(a), 16) * F.lit(b)).bitwiseAND(
                    F.lit(0xFFFF)
                ),
                16,
            )
        ).bitwiseAND(u32))

    def rotl(d, out, x, r):
        return d.withColumn(
            _tmp(out),
            F.shiftleft(F.col(x), r).bitwiseAND(u32).bitwiseOR(
                F.shiftright(F.col(x), 32 - r)
            ),
        )

    def xshift(d, out, x, r):
        return d.withColumn(
            _tmp(out), F.col(x).bitwiseXOR(F.shiftright(F.col(x), r))
        )

    h, vl = p + "h", p + "vl"
    d = df.withColumn(_tmp(vl), _long_encoding_col(F.col(src), dt))
    d = d.withColumn(_tmp(p + "k1"), F.col(vl).bitwiseAND(u32))
    d = d.withColumn(_tmp(p + "k2"), F.shiftright(F.col(vl), 32).bitwiseAND(u32))
    d = d.withColumn(_tmp(h), F.lit(0).cast("long"))
    for k in (p + "k1", p + "k2"):
        d = mulu32(d, k + "a", k, _C1)
        d = rotl(d, k + "b", k + "a", 15)
        d = mulu32(d, k + "c", k + "b", _C2)
        d = d.withColumn(_tmp(h), F.col(h).bitwiseXOR(F.col(k + "c")))
        d = rotl(d, h, h, 13)
        d = mulu32(d, _tmp(p + "h5"), h, 5)
        d = d.withColumn(
            _tmp(h), (F.col(p + "h5") + F.lit(0xE6546B64)).bitwiseAND(u32)
        )
    d = d.withColumn(_tmp(h), F.col(h).bitwiseXOR(F.lit(8)))
    d = xshift(d, h, h, 16)
    d = mulu32(d, h, h, 0x85EBCA6B)
    d = xshift(d, h, h, 13)
    d = mulu32(d, h, h, 0xC2B2AE35)
    d = xshift(d, h, h, 16)
    d = d.withColumn(
        out_name,
        F.when(F.col(src).isNull(), F.lit(None).cast("int")).otherwise(
            F.pmod(
                F.col(h).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n)
            ).cast("int")
        ),
    )
    return d.drop(*created)


def bucket_col(col: Column, n: int, dt: T.DataType) -> Column:
    """Write-path ``bucket[N]`` column for source type ``dt`` —
    spec-identical to :func:`bucket_value` on every row (tested on the
    spec's published vectors and randomized cross-checks)."""
    if isinstance(dt, _LONG_ENCODED):
        enc = _long_encoding_col(col, dt)
        # native seeded Murmur3Hash (round 14) when available; the
        # unrolled let-binding chain is the public-API fallback. The
        # (h & Integer.MAX_VALUE) mask reads the same low 31 bits
        # whether h is the native SIGNED int32 or the chain's
        # unsigned-in-a-long form.
        h = _native_murmur3_long(enc)
        if h is None:
            h = _murmur3_long_col(enc)
        return F.when(
            col.isNull(), F.lit(None).cast("int")
        ).otherwise(
            F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n)).cast("int")
        )
    if isinstance(dt, (T.StringType, T.BinaryType, T.DecimalType)):
        return _bucket_udf(n, dt)(col)
    raise ValueError(f"bucket[N] on {dt.simpleString()} is not supported")


def _bucket_udf(n: int, dt: T.DataType):
    """Arrow-batched fallback for variable-length encodings. Write-path
    only; per-value work is one murmur3 over a short byte string."""
    if isinstance(dt, T.StringType):
        enc = lambda v: v.encode("utf-8")  # noqa: E731
    elif isinstance(dt, T.BinaryType):
        enc = bytes
    else:
        enc = _decimal_bytes

    @F.pandas_udf("int")
    def _bucket(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else (murmur3_x86_32(enc(v)) & 0x7FFFFFFF) % n
        )

    return _bucket
