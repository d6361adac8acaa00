"""Randomized model check for icetbl's column-identity era machinery.

The rename/creation-seq/widen rules in `IceTable._read_files` are the
subtlest read-path logic in the catalog layer (round-10 found a real
COLUMN_ALREADY_EXISTS bug there). This test drives random — but
seeded, so deterministic — sequences of schema operations (append,
rename, add, drop) against a pure-Python model of Iceberg field-id
semantics and asserts the table read equals the model exactly:

- rename preserves values (old files read through the rename log);
- a column added later is NULL for all earlier files, even when its
  name REUSES a renamed-away or dropped name (no resurrection);
- drop removes the column everywhere; re-add is a logically new column.
"""

from __future__ import annotations

import random

NAME_POOL = ["a", "b", "c"]
N_SEQUENCES = 6
OPS_PER_SEQ = 8


def _run_sequence(spark, loc, rng):
    from iceberg_workshop_spark.icetbl import IceTable

    # start: id + one dynamic column
    first = rng.choice(NAME_POOL)
    cols = [first]  # dynamic columns, current logical names
    next_val = [100]

    def fresh_vals():
        v = {c: next_val[0] + i for i, c in enumerate(cols)}
        next_val[0] += 10
        return v

    row_id = [0]
    model = []  # list of dicts: {"id": n, <col>: value-or-None}

    def append(t):
        vals = fresh_vals()
        row = {"id": row_id[0], **vals}
        row_id[0] += 1
        schema = "id int, " + ", ".join(f"{c} int" for c in cols)
        t.append(
            spark.createDataFrame(
                [tuple([row["id"]] + [vals[c] for c in cols])], schema
            )
        )
        model.append(row)

    t = IceTable.create_as(
        spark,
        loc,
        spark.createDataFrame([(0, 1)], f"id int, {first} int"),
    )
    model.append({"id": 0, first: 1})
    row_id[0] = 1

    for _ in range(OPS_PER_SEQ):
        choices = ["append", "append"]  # appends twice as likely
        if [n for n in NAME_POOL if n not in cols]:
            choices += ["rename", "add"]
        if len(cols) > 1:
            choices.append("drop")
        op = rng.choice(choices)
        if op == "append":
            append(t)
        elif op == "rename":
            old = rng.choice(cols)
            new = rng.choice([n for n in NAME_POOL if n not in cols])
            t.rename_column(old, new)
            cols[cols.index(old)] = new
            for r in model:
                if old in r:
                    r[new] = r.pop(old)
        elif op == "add":
            new = rng.choice([n for n in NAME_POOL if n not in cols])
            t.add_column(new, "int")
            cols.append(new)
            # existing rows: NULL (not recorded = None on compare)
        elif op == "drop":
            victim = rng.choice(cols)
            t.drop_column(victim)
            cols.remove(victim)
            for r in model:
                r.pop(victim, None)

    got = sorted(
        tuple(
            (c, getattr(r, c)) for c in ["id"] + sorted(cols)
        )
        for r in t.read().collect()
    )
    want = sorted(
        tuple((c, m.get(c)) for c in ["id"] + sorted(cols)) for m in model
    )
    assert got == want, f"cols={cols}\n got={got}\nwant={want}"


def test_random_schema_evolution_matches_field_id_model(spark, tmp_path):
    for seq in range(N_SEQUENCES):
        rng = random.Random(20260815 + seq)
        _run_sequence(spark, str(tmp_path / f"tbl{seq}"), rng)
