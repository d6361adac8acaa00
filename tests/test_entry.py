"""Driver-contract smoke: entry() runs at sf0.001 and yields rows."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns and "n_name" in df.columns


def test_queries_all_have_callables(spark):
    import __spark_entry__ as e

    qs = e.queries()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_subset_of_queries():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)


def test_ensure_utc_session_warns_and_pins(spark):
    import warnings

    import pytest

    from iceberg_workshop_spark.sources.tables import ensure_utc_session

    key = "spark.sql.session.timeZone"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "America/New_York")
        with pytest.warns(UserWarning, match="timeZone"):
            ensure_utc_session(spark)
        assert spark.conf.get(key) == "UTC"
        # Already-UTC sessions are untouched and silent.
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ensure_utc_session(spark)
    finally:
        spark.conf.set(key, orig)
