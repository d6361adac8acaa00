"""Randomized equivalence check: a pruned `tbl.scan(dnf)` must return
EXACTLY the rows of an unpruned read filtered by the same predicate —
pruning may only change which files are opened, never the answer.

This generalizes the round-10 bug class (the pruned path used to skip
`_apply_deletes` and resurrect MoR-deleted rows) across the whole
pruning surface: partition pruning under PARTITION SPEC EVOLUTION
(files keep their own spec: none / identity / truncate[w] /
non-prunable bucket[n]), stats-based file skipping, DNF predicates
with every supported op, and outstanding merge-on-read deletes and
updates at scan time. The reference predicate is evaluated in pure
Python over the unpruned read, so the check is independent of the
engine's own DNF-to-filter translation."""

from __future__ import annotations

import random

N_SEQUENCES = 4
OPS_PER_SEQ = 7
CHECKS_PER_OP = 3
KEY_SPACE = list(range(10))


def _py_pred(p, row):
    x = row[p.col]
    if p.op == "=":
        return x == p.value
    if p.op == "<":
        return x < p.value
    if p.op == "<=":
        return x <= p.value
    if p.op == ">":
        return x > p.value
    if p.op == ">=":
        return x >= p.value
    if p.op == "between":
        lo, hi = p.value
        return lo <= x <= hi
    raise AssertionError(p.op)


def _py_dnf(dnf, row):
    return any(all(_py_pred(p, row) for p in conj) for conj in dnf)


def _rand_pred(rng, Pred, vmax):
    col = rng.choice(["k", "v"])
    op = rng.choice(["=", "<", "<=", ">", ">=", "between"])
    top = max(KEY_SPACE) if col == "k" else max(vmax, 1)
    if op == "between":
        a, b = sorted((rng.randint(0, top), rng.randint(0, top)))
        return Pred(col, op, (a, b))
    return Pred(col, op, rng.randint(0, top))


def _run_sequence(spark, loc, rng):
    from iceberg_workshop_spark.icetbl import IceTable
    from iceberg_workshop_spark.icetbl.pruning import Pred
    from iceberg_workshop_spark.icetbl.table import spec_field

    specs = [
        [],
        [spec_field("k")],
        [spec_field("k", "truncate[3]")],
        [spec_field("k", "bucket[2]")],
    ]
    next_v = [0]

    def batch(n):
        out = []
        for _ in range(n):
            out.append((rng.choice(KEY_SPACE), next_v[0]))
            next_v[0] += 1
        return out

    def df_of(pairs):
        return spark.createDataFrame(pairs, "k bigint, v bigint")

    t = IceTable.create_as(spark, loc, df_of(batch(5)))

    for step in range(OPS_PER_SEQ):
        op = rng.choices(
            ["append", "evolve", "del_mor", "upd_mor"], [4, 2, 2, 1]
        )[0]
        if op == "append":
            t.append(df_of(batch(rng.randint(2, 5))))
        elif op == "evolve":
            t.set_partition_spec(rng.choice(specs))
        elif op == "del_mor":
            cut = rng.randint(0, max(next_v[0] - 1, 0))
            t.delete_where_mor(f"v < {cut}", keys=["k"])
        elif op == "upd_mor":
            m = rng.randint(2, 4)
            t.update_where_mor(f"v % {m} = 0", {"v": "v + 1000"})
        truth = [
            {"k": r["k"], "v": r["v"]} for r in t.read().collect()
        ]
        for _ in range(CHECKS_PER_OP):
            dnf = [
                [
                    _rand_pred(rng, Pred, next_v[0] + 1000)
                    for _ in range(rng.randint(1, 2))
                ]
                for _ in range(rng.randint(1, 2))
            ]
            got = sorted(
                (r["k"], r["v"]) for r in t.scan(dnf).collect()
            )
            want = sorted(
                (r["k"], r["v"]) for r in truth if _py_dnf(dnf, r)
            )
            assert got == want, f"step {step} op {op} dnf {dnf}"
            rep = t.last_scan_report
            assert rep["files_scanned"] <= rep["files_total"]


def test_pruned_scan_equals_filtered_read(spark, tmp_path):
    for i in range(N_SEQUENCES):
        rng = random.Random(9000 + i)
        _run_sequence(spark, str(tmp_path / f"prune_model_{i}"), rng)


def test_pruned_scan_distributed_path_equivalent(spark, tmp_path, monkeypatch):
    """The distributed planner (pruning.prune_files_distributed, taken
    past PRUNE_DISTRIBUTED_THRESHOLD live files) must make the exact
    same survival decisions as the driver loop — forced on for every
    scan by dropping the threshold to 0 and replaying a model
    sequence."""
    from iceberg_workshop_spark.icetbl import pruning

    monkeypatch.setattr(pruning, "PRUNE_DISTRIBUTED_THRESHOLD", 0)
    # table.scan imports the symbol at call time from the module, so
    # the monkeypatch takes effect for every scan in the sequence
    rng = random.Random(424242)
    _run_sequence(spark, str(tmp_path / "prune_model_dist"), rng)


def test_prune_files_distributed_matches_driver_loop(spark):
    """Direct pairwise check on synthetic entries: driver loop
    (prune_files + bucket expectations) vs the one-pass distributed
    planner, over random DNFs, mixed specs, bounds, and bucket
    partition values."""
    from iceberg_workshop_spark.icetbl.bucketing import bucket_value
    from iceberg_workshop_spark.icetbl.pruning import (
        Pred,
        bucket_survives,
        intervals,
        prune_files,
        prune_files_distributed,
        survives_dnf,
    )

    rng = random.Random(77)
    spec_by_id = {
        0: [],
        1: [{"source": "k", "transform": "identity", "name": "k"}],
        2: [{"source": "k", "transform": "bucket[4]", "name": "kb"}],
    }
    files = []
    for i in range(300):
        sid = rng.choice([0, 1, 2])
        k = rng.randint(0, 9)
        part = {}
        if sid == 1:
            part = {"k": str(k)}
        elif sid == 2:
            part = {"kb": str(bucket_value(k, 4))}
        lo = rng.randint(0, 50)
        files.append(
            {
                "path": f"f{i}",
                "spec_id": sid,
                "partition": part,
                "bounds": {"v": [lo, lo + rng.randint(0, 20)]},
            }
        )
    for trial in range(20):
        def _mk_pred():
            col = rng.choice(["k", "v"])
            op = rng.choice(["=", "<", ">=", "between"])
            if op == "between":
                return Pred(col, op, tuple(sorted(
                    (rng.randint(0, 60), rng.randint(0, 60))
                )))
            return Pred(col, op, rng.randint(0, 60))

        dnf = [
            [_mk_pred() for _ in range(rng.randint(1, 2))]
            for _ in range(rng.randint(1, 3))
        ]
        exps = []
        for d in dnf:
            eq = {p.col: p.value for p in d if p.op == "="}
            exp = {}
            if "k" in eq:
                exp[(2, "kb")] = str(bucket_value(eq["k"], 4))
            exps.append(exp)
        # driver loop, per disjunct, then union (the scan() shape)
        want = set()
        for d, exp in zip(dnf, exps):
            k, _ = prune_files(files, spec_by_id, d)
            k = [f for f in k if bucket_survives(f, exp)]
            want.update(f["path"] for f in k)
        got = {
            f["path"]
            for f in prune_files_distributed(spark, files, spec_by_id, dnf, exps)
        }
        assert got == want, f"trial {trial}: {got ^ want}"
        # the shared pure function agrees file-by-file too
        ivals_list = [intervals(d) for d in dnf]
        for f in files:
            assert survives_dnf(f, spec_by_id, dnf, ivals_list, exps) == (
                f["path"] in want
            )
