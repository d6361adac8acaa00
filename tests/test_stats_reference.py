"""Independent-reference checks for the round-9 statistics operators.

The DuckDB oracles of q_llm_drift_ks / q_win_cusum /
q_agg_mannwhitney intentionally REPLAY the same integer construction
as the Spark plans (that is what makes them hash-exact), so a bug in
the shared math would sail through parity. These tests recompute each
statistic from the raw fixture with an INDEPENDENT formulation — naive
sorted-loop Python over pandas rows — and assert agreement."""

from __future__ import annotations

import duckdb
import pandas as pd

from tests.conftest import SF_DIR


def _docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, n_chars FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).df()


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT event_id, ts, user_id, event_type, "
        f"CAST(floor(value * 100) AS BIGINT) AS cents FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).df()


def test_drift_ks_matches_naive_python(spark):
    from iceberg_workshop_spark.registry import queries

    got = {
        r["source"]: (r["d_num"], r["d_ppm"])
        for r in queries()["q_llm_drift_ks"](spark, SF_DIR).collect()
    }
    docs = _docs()
    n_all = len(docs)
    for source, grp in docs.groupby("source"):
        a = sorted(grp["n_chars"])
        b = sorted(docs.loc[docs["source"] != source, "n_chars"])
        n1, n2 = len(a), len(b)
        xs = sorted(set(a) | set(b))
        d_num = 0
        for x in xs:
            c1 = sum(1 for v in a if v <= x)
            c2 = sum(1 for v in b if v <= x)
            d_num = max(d_num, abs(c1 * n2 - c2 * n1))
        assert got[source] == (d_num, 1000000 * d_num // (n1 * n2)), source
    assert len(got) == docs["source"].nunique()


def test_cusum_matches_naive_python(spark):
    from iceberg_workshop_spark.registry import queries

    got = {
        r["user_id"]: (r["n_events"], r["total_cents"], r["g_stat"], r["k_star"])
        for r in queries()["q_win_cusum"](spark, SF_DIR).collect()
    }
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    for user, grp in ev.groupby("user_id"):
        vals = list(grp["cents"])
        n, total = len(vals), sum(vals)
        best_g, best_k, cum = -1, None, 0
        for k in range(1, n):  # k < n
            cum += vals[k - 1]
            g = abs(n * cum - k * total)
            if g > best_g:
                best_g, best_k = g, k
        if n >= 2:
            assert got[user] == (n, total, best_g, best_k), user
        else:
            assert user not in got  # single-event series has no split


def test_mannwhitney_matches_naive_python(spark):
    from iceberg_workshop_spark.registry import queries

    got = {
        r["event_type"]: (r["n1"], r["n2"], r["u2"], r["cl_ppm"])
        for r in queries()["q_agg_mannwhitney"](spark, SF_DIR).collect()
    }
    ev = _events()
    all_vals = sorted(ev["cents"])
    n_all = len(all_vals)
    # independent tie-averaged ranks: position-scan, not cum-count math
    rank2 = {}  # value -> 2 * average rank
    i = 0
    while i < n_all:
        j = i
        while j < n_all and all_vals[j] == all_vals[i]:
            j += 1
        # ranks i+1 .. j (1-based); 2*avg = (i+1) + j
        rank2[all_vals[i]] = (i + 1) + j
        i = j
    for etype, grp in ev.groupby("event_type"):
        n1 = len(grp)
        n2 = n_all - n1
        rsum2 = sum(rank2[v] for v in grp["cents"])
        u2 = rsum2 - n1 * (n1 + 1)
        assert got[etype] == (n1, n2, u2, 1000000 * u2 // (2 * n1 * n2)), etype


def test_drift_ks_guard_fails_loudly(spark):
    """A value axis wider than max_grid must fail the job with the
    bucketing hint (QueryInvariantError-style loud stop), never
    materialize the groups x values grid (the 100 TB OOM mode)."""
    import pytest

    from iceberg_workshop_spark.registry import queries

    df = queries()["q_llm_drift_ks"](spark, SF_DIR, max_grid=3)
    with pytest.raises(Exception, match="max_grid=3"):
        df.collect()


def test_drift_ks_grain_bucketing_matches_oracle(spark, oracle):
    """grain=50 buckets the length axis under a tight guard and still
    hash-matches the DuckDB oracle rendered at the same grain."""
    from iceberg_workshop_spark.llm.corpus import KS_DRIFT_PPM, _KS_SQL
    from iceberg_workshop_spark.registry import queries
    from tests.helpers import assert_frames_match

    got = (
        queries()["q_llm_drift_ks"](spark, SF_DIR, grain=50, max_grid=500)
        .toPandas()
    )
    want = oracle.execute(
        _KS_SQL.format(t="", div="//", thr=KS_DRIFT_PPM, grain=50)
    ).df()
    assert_frames_match(got, want, "q_llm_drift_ks[grain=50]")


def test_mannwhitney_guard_fails_loudly(spark):
    import pytest

    from iceberg_workshop_spark.registry import queries

    df = queries()["q_agg_mannwhitney"](spark, SF_DIR, max_grid=5)
    with pytest.raises(Exception, match="max_grid=5"):
        df.collect()


def test_mannwhitney_grain_bucketing_matches_oracle(spark, oracle):
    """grain=100 coarsens cents to whole units under a tight guard and
    still hash-matches the oracle at the same grain (the tie-averaged
    doubled ranks stay integer-exact across the rebucketing)."""
    from iceberg_workshop_spark.operators.stats_ext import _MANNWHITNEY
    from iceberg_workshop_spark.registry import queries
    from tests.helpers import assert_frames_match

    got = (
        queries()["q_agg_mannwhitney"](spark, SF_DIR, grain=100, max_grid=400)
        .toPandas()
    )
    want = oracle.execute(_MANNWHITNEY.format(t="", div="//", grain=100)).df()
    assert_frames_match(got, want, "q_agg_mannwhitney[grain=100]")


def test_containment_prefix_lossless_on_random_corpus(spark, tmp_path):
    """Randomized losslessness check for the prefix-filtered
    containment join: a seeded synthetic corpus with PLANTED
    containment pairs (docs embedded in up-to-4x larger supersets,
    plus shared-boilerplate decoys and ratio->4 boundary cases). The
    production path must return exactly the naive Python ground truth
    restricted to the declared predicate (containment >= 0.8, size
    ratio <= 4) — on a corpus the fixture's structure never saw."""
    import random

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(300)]
    docs = []
    doc_id = 0

    def add(tokens):
        nonlocal doc_id
        docs.append((doc_id, " ".join(tokens)))
        doc_id += 1

    base_docs = []
    for _ in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(10, 60))]
        base_docs.append(toks)
        add(toks)
    # planted: supersets at ratios ~1.2 / ~3 / ~4.2 (last exceeds R)
    for i, toks in enumerate(base_docs[:12]):
        ratio = [1.2, 3.0, 4.2][i % 3]
        extra = [rng.choice(vocab) for _ in range(int(len(toks) * (ratio - 1)))]
        add(toks + extra)
    # boilerplate decoys: same frequent prefix, different bodies
    boiler = [rng.choice(vocab) for _ in range(8)]
    for _ in range(10):
        add(boiler + [rng.choice(vocab) for _ in range(40)])

    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from iceberg_workshop_spark.registry import queries

    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in queries()["q_llm_dedup_containment_prefix"](
            spark, str(tmp_path)
        ).collect()
    }

    # naive truth: 3-gram shingle sets per doc, all pairs
    def shingles(text):
        toks = text.split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sh = {d: shingles(t) for d, t in docs}
    truth = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = len(sh[a]), len(sh[b])
            if not na or not nb:
                continue
            if max(na, nb) > 4 * min(na, nb):
                continue
            common = len(sh[a] & sh[b])
            if 5 * common >= 4 * min(na, nb):
                truth[(a, b)] = (common, na, nb)
    assert got == truth, (
        f"missing={set(truth) - set(got)} spurious={set(got) - set(truth)}"
    )
    # the corpus must actually exercise the operator
    assert len(truth) >= 8


def test_ppm_decimal_discipline_survives_bigint_wrap(spark):
    """Round-10 ppm discipline: every corpus-scale ppm/share product
    (1e6 * count [* count]) runs in DECIMAL(38,0) on the Spark side
    and HUGEINT in the oracle. This pins the arithmetic at magnitudes
    where the OLD BIGINT forms provably wrap (products > 2^63),
    asserting Spark == DuckDB == Python-int truth for each fixed
    expression shape:

    - importance ratio  (corpus.py q_llm_importance_select):
      1e6 * c_tgt * n_all DIV (c_all * n_tgt) — triple product;
    - corpus share      (novelty/fertility):
      1e6 * num DIV den at num ~ 10^13 tokens;
    - skew diagnostics  (physical.py q_profile_skew):
      1e6 * max_rows DIV n_rows and 100 * max_rows * n_keys DIV
      n_rows — two table-scale factors.
    """
    cases = [
        # (spark_sql_expr, duckdb_sql_expr, python_truth)
        (
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * 4000000000000"
            " * 9000000000000"
            " DIV (CAST(5000000000000 AS DECIMAL(38,0))"
            " * 6000000000000) AS BIGINT)",
            "CAST(CAST(1000000 AS HUGEINT) * 4000000000000"
            " * 9000000000000"
            " // (CAST(5000000000000 AS HUGEINT)"
            " * 6000000000000) AS BIGINT)",
            1_000_000 * 4_000_000_000_000 * 9_000_000_000_000
            // (5_000_000_000_000 * 6_000_000_000_000),
        ),
        (
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * 17000000000000"
            " DIV CAST(21000000000000 AS DECIMAL(38,0)) AS BIGINT)",
            "CAST(CAST(1000000 AS HUGEINT) * 17000000000000"
            " // CAST(21000000000000 AS HUGEINT) AS BIGINT)",
            1_000_000 * 17_000_000_000_000 // 21_000_000_000_000,
        ),
        (
            "CAST(CAST(100 AS DECIMAL(38,0)) * 9000000000000"
            " * 10000000000"
            " DIV CAST(13000000000000 AS DECIMAL(38,0)) AS BIGINT)",
            "CAST(CAST(100 AS HUGEINT) * 9000000000000"
            " * 10000000000"
            " // CAST(13000000000000 AS HUGEINT) AS BIGINT)",
            100 * 9_000_000_000_000 * 10_000_000_000
            // 13_000_000_000_000,
        ),
    ]
    con = duckdb.connect()
    wrapping_products = [
        1_000_000 * 4_000_000_000_000 * 9_000_000_000_000,
        1_000_000 * 17_000_000_000_000,
        100 * 9_000_000_000_000 * 10_000_000_000,
    ]
    for p in wrapping_products:  # the old BIGINT forms really wrapped
        assert p >= 2**63
    for s_expr, d_expr, truth in cases:
        # ...while the quotient fits BIGINT (the discipline's contract)
        assert 0 < truth < 2**63
        got_spark = spark.sql(f"SELECT {s_expr} AS v").collect()[0]["v"]
        got_duck = con.execute(f"SELECT {d_expr} AS v").fetchone()[0]
        assert got_spark == got_duck == truth, (s_expr, got_spark, got_duck)


def test_rank_accumulator_decimal_discipline_survives_bigint_wrap(spark):
    """Round-11 closes the two documented BIGINT accumulator bounds
    the r10 sweep left open: Mann–Whitney's rank-sum rsum2 (~2n²,
    wraps past n ≈ 2e9 events) and KS's cross-multiplied CDF-gap
    d_num (~n_src·n_rest, wraps past ~6e9 docs). Both now accumulate
    in DECIMAL(38,0) / HUGEINT; this pins the exact expression shapes
    at magnitudes where the old BIGINT forms provably wrap."""
    # rsum2 term: c * rank2 with c=3e9 docs at a tied rank2=4e9
    c, rank2 = 3_000_000_000, 7_000_000_000
    n1 = c
    rsum2 = c * rank2
    u2 = rsum2 - n1 * (n1 + 1)
    cl_ppm = 1_000_000 * u2 // (2 * n1 * (5_000_000_000 - n1))
    assert rsum2 >= 2**63 and u2 >= 2**63  # old forms wrapped
    assert 0 < cl_ppm < 2**63
    # KS d_num: cum_src * n_rest - cum_rest * n_src at ~3e9 per side
    cum_src, n_rest, cum_rest, n_src = (
        2_900_000_000,
        4_100_000_000,
        1_000_000_000,
        3_000_000_000,
    )
    d_num = abs(cum_src * n_rest - cum_rest * n_src)
    d_ppm = 1_000_000 * d_num // (n_src * n_rest)
    assert cum_src * n_rest >= 2**63
    cases = [
        (
            f"CAST(CAST(1000000 AS DECIMAL(38,0)) * (SUM(CAST({c} AS"
            f" DECIMAL(38,0)) * {rank2}) - CAST({n1} AS DECIMAL(38,0))"
            f" * ({n1} + 1)) div (CAST(2 AS DECIMAL(38,0)) * {n1}"
            f" * (5000000000 - {n1})) AS BIGINT)",
            f"CAST(CAST(1000000 AS HUGEINT) * (SUM(CAST({c} AS HUGEINT)"
            f" * {rank2}) - CAST({n1} AS HUGEINT) * ({n1} + 1))"
            f" // (CAST(2 AS HUGEINT) * {n1} * (5000000000 - {n1}))"
            " AS BIGINT)",
            cl_ppm,
        ),
        (
            f"CAST(CAST(1000000 AS DECIMAL(38,0)) * ABS(CAST({cum_src}"
            f" AS DECIMAL(38,0)) * {n_rest} - CAST({cum_rest} AS"
            f" DECIMAL(38,0)) * {n_src}) div (CAST({n_src} AS"
            f" DECIMAL(38,0)) * {n_rest}) AS BIGINT)",
            f"CAST(CAST(1000000 AS HUGEINT) * ABS(CAST({cum_src} AS"
            f" HUGEINT) * {n_rest} - CAST({cum_rest} AS HUGEINT)"
            f" * {n_src}) // (CAST({n_src} AS HUGEINT) * {n_rest})"
            " AS BIGINT)",
            d_ppm,
        ),
    ]
    con = duckdb.connect()
    for s_expr, d_expr, truth in cases:
        got_spark = spark.sql(f"SELECT {s_expr} AS v").collect()[0]["v"]
        got_duck = con.execute(f"SELECT {d_expr} AS v").fetchone()[0]
        assert got_spark == got_duck == truth, (s_expr, got_spark, got_duck)
    # the loud-narrow guard: a u2 past 2^63 fails with the query's
    # message instead of wrapping into a negative BIGINT
    import pytest
    from pyspark.sql import functions as F

    big = spark.range(1).select(
        F.expr("CAST(9300000000000000000000 AS DECIMAL(38,0))").alias(
            "d_num"
        )
    )
    guarded = big.where(
        F.assert_true(
            F.expr("d_num <= 9223372036854775807"),
            F.lit("q_llm_drift_ks: d_num exceeds BIGINT"),
        ).isNull()
    )
    with pytest.raises(Exception, match="exceeds BIGINT"):
        guarded.collect()
