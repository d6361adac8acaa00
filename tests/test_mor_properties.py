"""Property test for merge-on-read equality-delete semantics: any
interleaving of appends, MoR key deletes, CoW predicate deletes and
delete materialization must keep `IceTable.read()` equal to a plain
Python reference model (dict of live rows). Catches sequence-number
bookkeeping mistakes (resurrection, over-deletion) that single-path
tests miss."""

from __future__ import annotations

import random

import pytest

from iceberg_workshop_spark.icetbl import IceTable


def _model_rows(model: dict[int, int]) -> set[tuple[int, int]]:
    return set(model.items())


def _table_rows(t: IceTable) -> set[tuple[int, int]]:
    return {(r["k"], r["v"]) for r in t.read().collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_op_sequences_match_reference(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = IceTable.create(spark, str(tmp_path / f"mor{seed}"), "k bigint, v bigint")
    model: dict[int, int] = {}
    next_v = 0

    for step in range(8):
        op = rng.choice(["append", "mor_delete", "cow_delete", "materialize"])
        if op == "append" or not model:
            # append is INSERT, not upsert — only non-live keys, so the
            # model stays a map. Re-inserting a DELETED key is exactly
            # the case the sequence rule must get right.
            free = [k for k in range(20) if k not in model]
            if not free:
                continue
            keys = rng.sample(free, min(len(free), rng.randint(1, 5)))
            rows = []
            for k in keys:
                next_v += 1
                model[k] = next_v
                rows.append((k, next_v))
            t.append(
                spark.createDataFrame(rows, schema="k bigint, v bigint")
            )
        elif op == "mor_delete":
            victims = rng.sample(sorted(model), min(len(model), rng.randint(1, 4)))
            cond = "k IN (" + ", ".join(str(k) for k in victims) + ")"
            t.delete_where_mor(cond, keys=["k"])
            for k in victims:
                del model[k]
        elif op == "cow_delete":
            cut = rng.randint(0, 19)
            t.delete_where(f"k >= {cut}")
            for k in [k for k in model if k >= cut]:
                del model[k]
        else:
            t.rewrite_equality_deletes()
        assert _table_rows(t) == _model_rows(model), (
            f"seed={seed} step={step} op={op}"
        )
