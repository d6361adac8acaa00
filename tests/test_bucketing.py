"""Iceberg bucket[N] transform (icetbl/bucketing.py): the pure-Python
planner twin pinned to the spec's published vectors, and the Spark
write-path column cross-checked against it on randomized values.

The vectors are from the Apache Iceberg spec, Appendix B ("32-bit Hash
Requirements") — public contract values every Iceberg engine must
reproduce, so agreeing with them means agreeing with every engine."""

import random
import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_workshop_spark.icetbl.bucketing import (
    bucket_col,
    bucket_value,
    encode_value,
    murmur3_x86_32,
)

# (value, expected murmur3_x86_32 of its Iceberg encoding) — spec table
SPEC_VECTORS = [
    (34, 2017239379),                      # int promotes to long
    (34_000_000_000, -2139740736),         # a true long (not in the
    #                                        spec table; pinned from
    #                                        this implementation so a
    #                                        regression in the high-
    #                                        word mix round is caught)
    (date(2017, 11, 16), -653330422),
    (datetime(2017, 11, 16, 22, 31, 8), -2047944441),
    (
        datetime(
            2017, 11, 16, 14, 31, 8,
            tzinfo=timezone(timedelta(hours=-8)),
        ),
        -2047944441,                       # same instant, same hash
    ),
    ("iceberg", 1210000089),
    (Decimal("14.20"), -500754589),
    (b"\x00\x01\x02\x03", -188683207),
]


def test_spec_vectors():
    for value, want in SPEC_VECTORS:
        assert murmur3_x86_32(encode_value(value)) == want, value


def test_spec_vector_time_micros():
    # time 22:31:08 hashes as its micros-from-midnight long
    micros = (22 * 3600 + 31 * 60 + 8) * 1_000_000
    assert murmur3_x86_32(struct.pack("<q", micros)) == -662762989


def test_int_long_promotion():
    """bucket(34::int) == bucket(34::long) — required by the spec so
    widening a bucket source column never re-buckets rows."""
    for v in (0, 1, -1, 34, 2**31 - 1, -(2**31)):
        assert encode_value(v) == struct.pack("<q", v)


def test_bucket_value_basics():
    assert bucket_value(None, 8) is None
    assert 0 <= bucket_value(34, 8) < 8
    # Java parity: & Integer.MAX_VALUE, not abs()
    assert bucket_value(34, 1) == 0
    with pytest.raises(ValueError, match="float"):
        bucket_value(1.5, 8)
    with pytest.raises(ValueError, match="boolean"):
        bucket_value(True, 8)


def test_decimal_encoding_minimal_twos_complement():
    assert encode_value(Decimal("14.20")) == (1420).to_bytes(2, "big")
    assert encode_value(Decimal("-1")) == b"\xff"
    assert encode_value(Decimal("0")) == b"\x00"
    # sign bit forces a widening byte
    assert encode_value(Decimal("128")) == b"\x00\x80"


def test_decimal_encoding_negative_boundaries():
    """ADVICE r13: negative power-of-two boundaries must encode at the
    SIGNED MINIMAL width (Java BigInteger.toByteArray parity): -128 is
    one byte b'\\x80', not two bytes b'\\xff\\x80' — a 2-byte encoding
    hashes to a different murmur3 value than every real Iceberg engine,
    misleading foreign bucket-pruned scans."""
    assert encode_value(Decimal("-128")) == b"\x80"
    assert encode_value(Decimal("-1.28")) == b"\x80"  # unscaled -128
    assert encode_value(Decimal("-32768")) == b"\x80\x00"
    assert encode_value(Decimal("-129")) == b"\xff\x7f"
    assert encode_value(Decimal("-127")) == b"\x81"
    assert encode_value(Decimal("-256")) == b"\xff\x00"
    # every encoding must round-trip as signed big-endian and be minimal
    for u in (-128, -129, -127, -32768, -32769, -1, 0, 1, 127, 128, 255,
              256, -2**63, 2**63 - 1):
        b = encode_value(Decimal(u))
        assert int.from_bytes(b, "big", signed=True) == u
        if len(b) > 1:  # dropping the leading byte must change the value
            assert int.from_bytes(b[1:], "big", signed=True) != u


def test_coerce_bucket_literal():
    """ADVICE r13: equality literals are coerced to the bucket SOURCE
    column's type before hashing; uncoercible literals raise so callers
    skip pruning (sound) instead of hashing the wrong bytes."""
    from iceberg_workshop_spark.icetbl.bucketing import (
        UncoercibleLiteral,
        coerce_bucket_literal,
    )

    # ISO strings on temporal columns parse (bounds pruning accepts
    # them via _coerce; bucket pruning must hash the PARSED value)
    assert coerce_bucket_literal("2017-11-16", "date") == date(2017, 11, 16)
    assert coerce_bucket_literal(
        "2017-11-16 22:31:08", "timestamp"
    ) == datetime(2017, 11, 16, 22, 31, 8)
    # midnight timestamp ↔ date; ints/floats on decimal quantize
    assert coerce_bucket_literal(datetime(2017, 11, 16), "date") == date(2017, 11, 16)
    assert coerce_bucket_literal(14, "decimal(9,2)") == Decimal("14.00")
    assert coerce_bucket_literal(14.2, "decimal(9,2)") == Decimal("14.20")
    assert coerce_bucket_literal("14.20", "decimal(9,2)") == Decimal("14.20")
    # and the coerced value hashes like the write path's encoding
    assert bucket_value(
        coerce_bucket_literal(14.2, "decimal(9,2)"), 8
    ) == bucket_value(Decimal("14.20"), 8)
    assert coerce_bucket_literal(5.0, "bigint") == 5
    assert coerce_bucket_literal("5", "int") == 5
    assert coerce_bucket_literal(None, "date") is None
    for bad in [
        ("not-a-date", "date"),
        (datetime(2017, 11, 16, 1, 0), "date"),  # non-midnight
        (5.5, "bigint"),
        (True, "int"),
        (5, "string"),
        ("1.005", "decimal(9,2)"),  # exceeds scale: can match no row
        ("x", "binary"),
        ("anything", "struct<a:int>"),
    ]:
        with pytest.raises(UncoercibleLiteral):
            coerce_bucket_literal(*bad)


@pytest.mark.parametrize(
    "ddl,dt,values",
    [
        (
            "long",
            T.LongType(),
            [34, 0, -1, 1, 2**62, -(2**62), None]
            + [random.Random(7).randint(-2**63, 2**63 - 1) for _ in range(40)],
        ),
        (
            "int",
            T.IntegerType(),
            [34, 0, -1, None]
            + [random.Random(11).randint(-2**31, 2**31 - 1) for _ in range(25)],
        ),
        (
            "date",
            T.DateType(),
            [date(2017, 11, 16), date(1969, 12, 31), None]
            + [
                date(1970, 1, 1) + timedelta(days=d)
                for d in random.Random(13).sample(range(-30000, 30000), 25)
            ],
        ),
        (
            "timestamp",
            T.TimestampType(),
            [datetime(2017, 11, 16, 22, 31, 8), None]
            + [
                datetime(1970, 1, 1)
                + timedelta(seconds=s, microseconds=u)
                for s, u in zip(
                    random.Random(17).sample(range(-10**9, 10**9), 25),
                    random.Random(19).sample(range(0, 999999), 25),
                )
            ],
        ),
        (
            "string",
            T.StringType(),
            ["iceberg", "", None, "héllo wörld", "日本語", "a" * 100]
            + [
                "".join(
                    random.Random(23 + i).choices("abcdef XYZ089", k=i % 41)
                )
                for i in range(25)
            ],
        ),
    ],
)
def test_bucket_col_matches_python_twin(spark, ddl, dt, values):
    """The Spark write-path column (JVM arithmetic for long-encoded
    types, Arrow UDF for strings) computes the SAME bucket as the
    driver-side planner twin for every value — the invariant bucket
    pruning soundness rests on."""
    n = 8
    df = spark.createDataFrame([(v,) for v in values], f"v {ddl}")
    rows = df.select("v", bucket_col(F.col("v"), n, dt).alias("b")).collect()
    for r in rows:
        v = r["v"]
        if isinstance(v, datetime) and v.tzinfo is not None:
            v = v.astimezone(timezone.utc)
        assert r["b"] == bucket_value(v, n), v


def test_bucket_col_refuses_unsupported(spark):
    with pytest.raises(ValueError, match="not supported"):
        bucket_col(F.col("v"), 8, T.DoubleType())


def test_expression_tree_stays_small(spark):
    """The unrolled murmur3 column must stay a LINEAR expression (the
    let-binding via transform) — a naive composition duplicates
    subtrees exponentially and OOMs the driver before evaluating a
    single row. ~40 let-stages bounds the serialized plan size."""
    df = spark.range(1).select(
        bucket_col(F.col("id"), 8, T.LongType()).alias("b")
    )
    plan = df._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 200_000
    assert df.first()["b"] == bucket_value(0, 8)


def test_with_bucket_column_matches_twin_and_stays_codegen(spark):
    """The df-level named-chain form (the write path) computes the
    same bucket as the driver twin AND stays inside whole-stage
    codegen — the let-binding Column form is interpreted and measured
    ~11x slower, so the write path must never silently fall back to
    it. Also guards the CollapseProject contract: if the optimizer
    ever inlined the named stages back, the plan would explode
    exponentially before this test could even print it."""
    from iceberg_workshop_spark.icetbl.bucketing import with_bucket_column

    values = [34, 0, -1, None, 2**62, -(2**62)] + [
        random.Random(29).randint(-2**63, 2**63 - 1) for _ in range(30)
    ]
    df = spark.createDataFrame([(v,) for v in values], "v long")
    out = with_bucket_column(df, "b", "v", 8, T.LongType())
    assert out.columns == ["v", "b"]  # temp stages dropped
    for r in out.collect():
        assert r["b"] == bucket_value(r["v"], 8), r["v"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # "*(1) Project" = the projection chain fused into whole-stage
    # codegen stage 1 (the star is Spark's codegen marker)
    assert "*(1) Project" in plan
    assert len(plan) < 200_000
    # string fallback: Arrow UDF path, same values as the twin
    df2 = spark.createDataFrame([("iceberg",), (None,)], "v string")
    out2 = with_bucket_column(df2, "b", "v", 8, T.StringType())
    got = {r["v"]: r["b"] for r in out2.collect()}
    assert got == {"iceberg": bucket_value("iceberg", 8), None: None}


def test_native_murmur3_seed0_matches_spec_vectors(spark):
    """Round 14: the primary write path is Spark's own Murmur3Hash
    catalyst expression with SEED 0, which for a LONG child is
    bit-identical to murmur3_x86_32 of the 8-byte LE encoding —
    pinned here to the same spec vectors as the Python twin."""
    from iceberg_workshop_spark.icetbl.bucketing import (
        _native_murmur3_long,
    )

    df = spark.createDataFrame(
        [(34,), (34_000_000_000,), (0,), (-1,), (None,)], "v long"
    )
    h = _native_murmur3_long(F.col("v"))
    assert h is not None, "native seeded Murmur3Hash unavailable"
    got = {r["v"]: r["h"] for r in df.select("v", h.alias("h")).collect()}
    assert got[34] == 2017239379          # spec Appendix-B vector
    assert got[34_000_000_000] == -2139740736
    for v in (34, 34_000_000_000, 0, -1):
        assert got[v] == murmur3_x86_32(struct.pack("<q", v)), v


def test_bucket_col_fallback_chain_matches_native(spark, monkeypatch):
    """The public-API staged/let-binding fallback must stay correct
    even though the native path normally wins — force it off and
    cross-check both forms against the Python twin."""
    from iceberg_workshop_spark.icetbl import bucketing as B

    values = [34, 0, -1, None, 2**62, -(2**62)] + [
        random.Random(31).randint(-2**63, 2**63 - 1) for _ in range(20)
    ]
    df = spark.createDataFrame([(v,) for v in values], "v long")
    monkeypatch.setattr(B, "_native_murmur3_long", lambda c: None)
    out = B.with_bucket_column(df, "b", "v", 8, T.LongType())
    for r in out.collect():
        assert r["b"] == bucket_value(r["v"], 8), r["v"]
    rows = df.select(
        "v", B.bucket_col(F.col("v"), 8, T.LongType()).alias("b")
    ).collect()
    for r in rows:
        assert r["b"] == bucket_value(r["v"], 8), r["v"]


def test_with_bucket_column_temp_cleanup_is_exact(spark, monkeypatch):
    """ADVICE r13 (low): the staged-chain fallback's cleanup drops
    ONLY the temp columns this call created — a pre-existing user
    column that happens to share the deterministic prefix survives; a
    user column that collides with a generated name raises instead of
    being clobbered. (Forced onto the fallback: the round-14 native
    path creates no temp columns at all.)"""
    import zlib

    from iceberg_workshop_spark.icetbl import bucketing as B

    monkeypatch.setattr(B, "_native_murmur3_long", lambda c: None)
    p = f"__iwsb_{zlib.crc32(b'b') % 10**6}_"
    # shares the prefix but is NOT a generated name -> must survive
    bystander = p + "user_data"
    df = spark.createDataFrame([(34, "keep")], f"v long, `{bystander}` string")
    out = B.with_bucket_column(df, "b", "v", 8, T.LongType())
    assert bystander in out.columns
    assert out.select(bystander, "b").first() == ("keep", bucket_value(34, 8))
    # collides with a generated temp name -> loud error, not a clobber
    clash = p + "h"
    df2 = spark.createDataFrame([(34, 1)], f"v long, `{clash}` long")
    with pytest.raises(ValueError, match="collides"):
        B.with_bucket_column(df2, "b", "v", 8, T.LongType())
