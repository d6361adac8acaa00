"""Property tests for the byte-format boundary's partition-value
translation (icetbl/iceformat.py).

Pruning soundness across export→import rests on a convention parity:
the dir-string partition values the WRITE path records (mirrored by
``pruning.transform_value``, which the planner compares against) must
survive export's typed encoding and import's decoding UNCHANGED —
``decode(encode(dir)) == dir`` for every transform and value. A drift
in either direction silently mis-prunes adopted foreign tables, so
the round trip is pinned here property-style, Spark-free (the
encoders/decoders are pure functions over metadata)."""

from __future__ import annotations

from datetime import date, datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_workshop_spark.icetbl import meta as M
from iceberg_workshop_spark.icetbl.bucketing import bucket_value
from iceberg_workshop_spark.icetbl.iceformat import (
    _export_partitioning,
    _import_one_spec,
)
from iceberg_workshop_spark.icetbl.pruning import transform_value

_ICE_TYPE = {
    "int": "int", "long": "long", "bigint": "long",
    "string": "string", "date": "date", "timestamp": "timestamptz",
}


def _roundtrip(transform: str, src_type: str, dir_value: str | None) -> str:
    """dir string → export's typed encoding → import's decoding."""
    spec = [{"source": "c", "transform": transform, "name": "p"}]
    meta = M.TableMeta.empty("/tmp/_prop", f"c {src_type}", spec)
    meta.properties["write.bucket.hash"] = "iceberg-murmur3"
    by_name = {"c": {"id": 1, "name": "c", "type": _ICE_TYPE.get(src_type, src_type)}}
    sj, _af, enc = _export_partitioning(meta, by_name, 0, {})
    part = enc(
        {"partition": {"p": dir_value if dir_value is not None else "__HIVE_DEFAULT_PARTITION__"}}
    )
    doc = {
        "current-schema-id": 0,
        "schemas": [{
            "schema-id": 0,
            "fields": [{"id": 1, "name": "c", "type": _ICE_TYPE.get(src_type, src_type)}],
        }],
    }
    carried = _import_one_spec(doc, sj)
    assert carried is not None
    _spec_fields, dec = carried
    decoded = dec({"partition": part})
    # export sanitizes the spec NAME; single-field specs keep "p"
    return decoded["p"]


@settings(max_examples=200, deadline=None)
@given(
    transform=st.sampled_from(["year", "month", "day", "hour"]),
    ts=st.datetimes(
        min_value=datetime(1960, 1, 1), max_value=datetime(2100, 1, 1)
    ),
)
def test_temporal_dir_roundtrip(transform, ts):
    d = transform_value(transform, ts)
    assert _roundtrip(transform, "timestamp", d) == d


@settings(max_examples=100, deadline=None)
@given(
    v=st.dates(min_value=date(1900, 1, 1), max_value=date(2200, 1, 1)),
)
def test_identity_date_dir_roundtrip(v):
    d = v.isoformat()
    assert _roundtrip("identity", "date", d) == d


@settings(max_examples=100, deadline=None)
@given(v=st.integers(min_value=-(2**62), max_value=2**62))
def test_identity_long_dir_roundtrip(v):
    assert _roundtrip("identity", "bigint", str(v)) == str(v)


@settings(max_examples=100, deadline=None)
@given(
    v=st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x2FF
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_identity_string_dir_roundtrip(v):
    assert _roundtrip("identity", "string", v) == v


@settings(max_examples=100, deadline=None)
@given(
    v=st.integers(min_value=-(2**62), max_value=2**62),
    w=st.integers(min_value=1, max_value=1000),
)
def test_truncate_long_dir_roundtrip(v, w):
    d = str(transform_value(f"truncate[{w}]", v))
    assert _roundtrip(f"truncate[{w}]", "bigint", d) == d


@settings(max_examples=100, deadline=None)
@given(
    v=st.integers(min_value=-(2**62), max_value=2**62),
    n=st.integers(min_value=1, max_value=4096),
)
def test_bucket_dir_roundtrip(v, n):
    d = str(bucket_value(v, n))
    assert _roundtrip(f"bucket[{n}]", "bigint", d) == d


@settings(max_examples=30, deadline=None)
@given(
    transform=st.sampled_from(
        ["identity", "year", "month", "day", "bucket[8]", "truncate[10]"]
    ),
)
def test_null_partition_roundtrip(transform):
    src = "date" if transform in ("year", "month", "day") else "bigint"
    if transform == "identity":
        src = "bigint"
    assert (
        _roundtrip(transform, src, None) == "__HIVE_DEFAULT_PARTITION__"
    )


# ----------------------------------------------------- sort orders


_SORT_FIELD = st.fixed_dictionaries(
    {
        "source": st.sampled_from(["a", "bb", "c_3", "ts"]),
        "transform": st.one_of(
            st.sampled_from(["identity", "year", "month", "day", "hour"]),
            st.integers(1, 64).map(lambda w: f"truncate[{w}]"),
            st.integers(1, 1024).map(lambda n: f"bucket[{n}]"),
        ),
        "direction": st.sampled_from(["asc", "desc"]),
        "null_order": st.sampled_from(["nulls-first", "nulls-last"]),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_SORT_FIELD, min_size=1, max_size=5))
def test_sort_order_serialize_parse_roundtrip(fields):
    """Round 14: the write.sort-order grammar (sortorder.py) must
    round-trip EVERY representable field list exactly — a lossy
    serialize would silently change the clustering contract at the
    next export/import hop."""
    from iceberg_workshop_spark.icetbl.sortorder import (
        from_iceberg_fields,
        parse_sort_order,
        serialize_sort_order,
        to_iceberg_fields,
    )

    text = serialize_sort_order(fields)
    assert parse_sort_order(text) == fields
    # and through the Iceberg JSON shape both ways
    by_name = {
        n: {"id": i}
        for i, n in enumerate(["a", "bb", "c_3", "ts"], start=1)
    }
    name_by_id = {v["id"]: k for k, v in by_name.items()}
    jf = to_iceberg_fields(fields, by_name)
    assert from_iceberg_fields(jf, name_by_id) == fields
