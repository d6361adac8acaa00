"""Round-7 corpus/physical additions: plan-shape gates and pure
properties that the oracle-parity sweep can't see.

- DPP: the fact scan must carry a dynamicpruning subquery (the
  in-query require() asserts it too; this pins it in CI with a
  readable failure).
- Keyword tagging / importance ratios: lexicon-sized sides must
  broadcast, never shuffle the corpus against a 5-row table.
- phash banding: pigeonhole recall (Hamming ≤ 6 over 6 bands of 10
  bits ⟹ at least one band identical) — checked as pure arithmetic
  over random fingerprints, no Spark involved.
- URL canonicalization: idempotence (canon(canon(u)) == canon(u))
  over the full variant grid — a canonical form that moves under
  re-canonicalization would break keeper selection.
"""

from __future__ import annotations

import random

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dpp_join_prunes_fact_partitions(spark):
    from iceberg_workshop_spark.registry import queries

    df = queries()["q_join_dpp"](spark, SF_DIR)
    assert "dynamicpruning" in _plan(df)


def test_keyword_tag_broadcasts_lexicon(spark):
    from iceberg_workshop_spark.registry import queries

    df = queries()["q_llm_keyword_tag"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_phash_banding_pigeonhole_recall():
    from iceberg_workshop_spark.llm.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_MAX_HAMMING,
    )

    assert PHASH_BANDS * PHASH_BAND_BITS == PHASH_BITS
    assert PHASH_MAX_HAMMING < PHASH_BANDS  # pigeonhole precondition
    rng = random.Random(20260815)
    mask = (1 << PHASH_BAND_BITS) - 1
    for _ in range(500):
        fp = rng.getrandbits(PHASH_BITS)
        flips = rng.sample(range(PHASH_BITS), PHASH_MAX_HAMMING)
        other = fp
        for k in flips:
            other ^= 1 << k
        bands_equal = [
            (fp >> (PHASH_BAND_BITS * b)) & mask
            == (other >> (PHASH_BAND_BITS * b)) & mask
            for b in range(PHASH_BANDS)
        ]
        assert any(bands_equal), f"no band survived flips {flips}"


def test_phash_nonascii_oracle_parity(spark, tmp_path):
    """q_llm_multimodal_phash on a corpus with multibyte characters:
    the numpy fingerprint samples UTF-8 BYTES while the DuckDB oracle
    samples codepoints, so parity only holds through the ASCII
    projection both sides now apply. This fixture (accents, CJK, emoji
    in the first 66 chars, near-dup pairs differing only in non-ASCII
    content) fails the pre-projection implementation."""
    import duckdb
    import pandas as pd

    texts = [
        "café déjà-vu résumé " * 8,
        "cafe deja-vu resume " * 8,  # ASCII twin of row 0
        "日本語のテキスト mixed with english words here " * 4,
        "mixed with english words here " * 5,  # ASCII residue twin
        "emoji 🎉 party 🎉 time and plain filler text to pad " * 4,
        "emoji  party  time and plain filler text to pad " * 4,
        "ünïcödé héävy röw with ascii tail that dominates sampling " * 3,
        "unicode heavy row with ascii tail that dominates sampling " * 3,
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["xx"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    from iceberg_workshop_spark.registry import oracle_sql, queries

    from tests.helpers import assert_frames_match

    spark_pdf = (
        queries()["q_llm_multimodal_phash"](spark, str(tmp_path)).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    oracle_pdf = con.execute(
        oracle_sql()["q_llm_multimodal_phash"]
    ).df()
    assert_frames_match(spark_pdf, oracle_pdf, "phash_nonascii")


def test_url_canonicalization_idempotent(spark):
    """canon(canon(u)) == canon(u) for every synthesized variant, and
    the canonical key never contains tracking params / fragments /
    default ports."""
    from pyspark.sql import functions as F

    from iceberg_workshop_spark.llm.corpus import _url_raw_spark

    raw = (
        spark.range(0, 48)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", _url_raw_spark().alias("url"))
    )

    def canon(col):
        host = F.regexp_replace(
            F.lower(F.regexp_extract(col, r"https://([^/]+)", 1)), r":443$", ""
        )
        rest = F.regexp_extract(
            F.regexp_replace(col, r"#.*$", ""), r"https://[^/]+(/[^#]*)", 1
        )
        rest = F.regexp_replace(rest, r"utm_[a-z]+=[^&]*&?", "")
        rest = F.regexp_replace(rest, r"[?&]+$", "")
        rest = F.regexp_replace(rest, r"[?]&", "?")
        rest = F.regexp_replace(rest, r"/$", "")
        return F.concat(F.lit("https://"), host, rest)

    once = raw.select("doc_id", canon(F.col("url")).alias("c1"))
    twice = once.select("doc_id", "c1", canon(F.col("c1")).alias("c2"))
    rows = twice.collect()
    for r in rows:
        assert r.c1 == r.c2, f"not idempotent: {r.c1!r} -> {r.c2!r}"
        assert "utm_" not in r.c1 and "#" not in r.c1 and ":443" not in r.c1
        assert not r.c1.endswith(("/", "?", "&"))
