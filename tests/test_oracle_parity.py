"""Every registered query vs its DuckDB oracle at sf0.01 — the local
mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.helpers import assert_driver_sortable, assert_frames_match


def _all_query_names():
    from iceberg_workshop_spark.registry import queries

    return sorted(queries())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, oracle, name):
    from iceberg_workshop_spark.registry import oracle_sql, queries

    df = queries()[name](spark, SF_DIR)
    # Driver-canonicalizer contract: no raw ARRAY/MAP result columns —
    # the driver's pandas lexsort cannot hash them (round-8
    # q_fn_array2 failure). Serialize via array_join/to_json instead.
    from pyspark.sql.types import ArrayType, MapType

    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not complex_cols, (
        f"{name}: ArrayType/MapType result columns {complex_cols} violate "
        f"the driver's hashability contract; serialize them to strings"
    )
    spark_pdf = df.toPandas()
    sql = oracle_sql().get(name)
    if sql is None:
        # rows-only check (driver's weak path) — pin non-empty output
        # and the exact schema so a silently-empty or drifted result
        # fails here even without a value oracle. Only the two
        # engine-specific-hash (xxhash64) fast paths remain rows-only;
        # their behavioral equivalence to the exact md5 variants is
        # pinned in test_llm.py.
        cert = [
            "recall_vs_exact", "precision_vs_exact", "recall_ok",
            "precision_ok",
        ]
        expected_cols = {
            "q_llm_dedup_minhash": [
                "doc_a", "doc_b", "n_common", "n_union", "jaccard",
            ] + cert,
            "q_llm_dedup_simhash": ["doc_a", "doc_b", "hamming"] + cert,
        }
        assert len(spark_pdf) > 0, f"{name}: rows-only query returned empty"
        assert list(spark_pdf.columns) == expected_cols[name], (
            f"{name}: schema drifted: {list(spark_pdf.columns)}"
        )
        assert_driver_sortable(spark_pdf, name)
        return
    oracle_pdf = oracle.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
