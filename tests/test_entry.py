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
