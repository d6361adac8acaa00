"""Invariants for the curation operators (llm/curation.py) beyond
oracle parity: redaction completeness, contamination set soundness,
packing budget bounds, and mixture monotonicity."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    from iceberg_workshop_spark.registry import queries

    return queries()


def test_pii_redaction_complete(spark, queries):
    """Every doc_id % 7 == 0 doc received synthetic PII, and the
    redacted corpus contains no residual matches."""
    import re

    from iceberg_workshop_spark.llm.curation import EMAIL_RE, PHONE_RE
    from iceberg_workshop_spark.sources.tables import load

    rows = queries["q_llm_pii_redact"](spark, SF_DIR).collect()
    n_docs = sum(r.n_docs for r in rows)
    n_with = sum(r.n_docs_with_pii for r in rows)
    expected = (
        load(spark, SF_DIR, "documents")
        .filter("doc_id % 7 = 0")
        .count()
    )
    assert n_with == expected > 0
    assert n_docs > n_with
    # chars_redacted positive exactly where PII existed: '<EMAIL>' is
    # shorter than any synthetic address.
    assert all((r.chars_redacted > 0) == (r.n_docs_with_pii > 0) for r in rows)
    # The synthetic strings themselves match the scrub patterns.
    assert re.fullmatch(EMAIL_RE, "user42@example.com")
    assert re.fullmatch(PHONE_RE, "555-042-0042")


def test_contamination_excludes_benchmark(spark, queries):
    """Benchmark docs never appear in the training tally, and the
    contaminated count is bounded by the training count."""
    rows = queries["q_llm_contamination"](spark, SF_DIR).collect()
    from iceberg_workshop_spark.sources.tables import load

    docs = load(spark, SF_DIR, "documents")
    n_train_expected = docs.filter("doc_id % 101 <> 0").count()
    assert sum(r.n_train for r in rows) == n_train_expected
    assert all(0 <= r.n_contaminated <= r.n_train for r in rows)


def test_seq_pack_budget(spark, queries):
    """Pack ids are dense per source and every pack's token span is
    consistent with the 256-token window arithmetic: a doc starts in
    pack p iff the running total before it lies in [256p, 256(p+1))."""
    rows = queries["q_llm_seq_pack"](spark, SF_DIR).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, packs in by_source.items():
        ids = sorted(p.pack_id for p in packs)
        assert ids == list(range(len(ids))), source
        # Doc ranges are contiguous, non-overlapping, ordered.
        packs = sorted(packs, key=lambda p: p.pack_id)
        for a, b in zip(packs, packs[1:]):
            assert a.last_doc < b.first_doc


def test_domain_mix_targets(spark, queries):
    """Sampled counts hit their targets exactly; the sqrt temperature
    flattens the mixture: sampled share of a small domain ≥ its raw
    share (relative upweighting of rare domains)."""
    rows = queries["q_llm_domain_mix"](spark, SF_DIR).collect()
    assert all(r.n_sampled == r.n_target for r in rows)
    tot_docs = sum(r.n_docs for r in rows)
    tot_samp = sum(r.n_sampled for r in rows)
    smallest = min(rows, key=lambda r: r.n_docs)
    assert smallest.n_sampled / tot_samp >= smallest.n_docs / tot_docs * 0.999


def test_multimodal_frame_sampling(spark, queries):
    """Every 4th 16-byte frame is kept: counts follow ceil arithmetic
    and sampled bytes never exceed the payload."""
    import math

    from iceberg_workshop_spark.sources.tables import load

    rows = {r.doc_id: r for r in queries["q_llm_multimodal_frames"](spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").selectExpr(
        "doc_id", "octet_length(encode(text, 'utf-8')) AS n_bytes"
    ).collect()
    assert len(rows) == len(docs)
    for d in docs:
        r = rows[d.doc_id]
        assert r.n_frames == math.ceil(d.n_bytes / 16)
        assert r.n_sampled == math.ceil(r.n_frames / 4)
        assert 0 < r.sampled_bytes <= d.n_bytes


def test_global_shuffle_epoch_changes_permutation(spark):
    """A different epoch string must re-permute: per-shard first/last
    hashes change, while shard mass totals remain a partition of the
    corpus (count preserved)."""
    from pyspark.sql import functions as F

    from iceberg_workshop_spark.llm.curation import N_SHARDS
    from iceberg_workshop_spark.sources.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").select("doc_id")

    def shards(epoch):
        d = docs.withColumn(
            "h", F.md5(F.concat(F.lit(f"{epoch}:"), F.col("doc_id").cast("string")))
        ).withColumn(
            "shard", F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint") % N_SHARDS
        )
        return {
            r["shard"]: (r["n"], r["first"])
            for r in d.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"), F.min("h").alias("first"))
            .collect()
        }

    a, b = shards("epoch0"), shards("epoch1")
    assert sum(n for n, _ in a.values()) == sum(n for n, _ in b.values()) == docs.count()
    assert any(a[k][1] != b.get(k, (0, None))[1] for k in a)  # permutation moved
