"""Randomized model check for icetbl's named-ref (branch/tag) layer.

Drives seeded random interleavings of main appends, branch appends,
main merge-on-read deletes, branch/tag creation, fast-forward publish
and ref drops against a pure-Python model, asserting after every op
that `read()` (main) and `read(ref=...)` (every live ref) equal the
model exactly. Pins the subtle rules:

- a branch is a movable head: `append(df, branch=b)` advances only
  the branch; main never sees branch rows until `fast_forward`;
- a MAIN delete after branching must not leak into the branch (a
  branch append carries its own parent's delete entries, not main's),
  while a branch created AFTER the delete inherits it;
- tags are frozen: main/branch churn never moves a tag's view;
- fast_forward(b) republishes main at the branch head; subsequent
  main and branch writes diverge independently again;
- sequence numbers are table-global, so a post-fast-forward main
  delete correctly hides older branch-appended rows.
"""

from __future__ import annotations

import copy
import random

N_SEQUENCES = 4
OPS_PER_SEQ = 10
KEY_SPACE = list(range(6))


def _visible(state):
    out = []
    for r in state["rows"]:
        if any(
            r["k"] in ks and r["seq"] < dseq for ks, dseq in state["dels"]
        ):
            continue
        out.append((r["k"], r["v"]))
    return sorted(out)


def _read_set(tbl, ref=None):
    return sorted(
        (row["k"], row["v"]) for row in tbl.read(ref=ref).collect()
    )


def _run_sequence(spark, loc, rng):
    from iceberg_workshop_spark.icetbl import IceTable

    next_v = [0]

    def batch(n):
        out = []
        for _ in range(n):
            out.append((rng.choice(KEY_SPACE), next_v[0]))
            next_v[0] += 1
        return out

    def df_of(pairs):
        return spark.createDataFrame(pairs, "k bigint, v bigint")

    first = batch(4)
    t = IceTable.create_as(spark, loc, df_of(first))
    seq = 1
    main = {"rows": [{"k": k, "v": v, "seq": seq} for k, v in first],
            "dels": []}
    refs: dict[str, dict] = {}   # name -> {"kind", "state"}
    ref_no = [0]

    ops = ["append_main", "append_branch", "del_main", "mk_branch",
           "mk_tag", "ff", "drop"]
    weights = [4, 4, 3, 2, 1, 2, 1]
    history = []
    for step in range(OPS_PER_SEQ):
        branches = [n for n, r in refs.items() if r["kind"] == "branch"]
        op = rng.choices(ops, weights)[0]
        if op in ("append_branch", "ff") and not branches:
            op = "mk_branch"
        if op == "drop" and not refs:
            op = "append_main"
        history.append(op)
        if op == "append_main":
            b = batch(rng.randint(1, 4))
            t.append(df_of(b))
            seq += 1
            main["rows"].extend(
                {"k": k, "v": v, "seq": seq} for k, v in b
            )
        elif op == "append_branch":
            name = rng.choice(branches)
            b = batch(rng.randint(1, 4))
            t.append(df_of(b), branch=name)
            seq += 1
            refs[name]["state"]["rows"].extend(
                {"k": k, "v": v, "seq": seq} for k, v in b
            )
        elif op == "del_main":
            cut = rng.randint(0, max(next_v[0] - 1, 0))
            matched = {k for k, v in _visible(main) if v < cut}
            t.delete_where_mor(f"v < {cut}", keys=["k"])
            seq += 1
            main["dels"].append((frozenset(matched), seq))
        elif op in ("mk_branch", "mk_tag"):
            name = f"r{ref_no[0]}"
            ref_no[0] += 1
            kind = "branch" if op == "mk_branch" else "tag"
            (t.create_branch if kind == "branch" else t.create_tag)(name)
            refs[name] = {"kind": kind, "state": copy.deepcopy(main)}
        elif op == "ff":
            name = rng.choice(branches)
            t.fast_forward(name)
            main = copy.deepcopy(refs[name]["state"])
        elif op == "drop":
            name = rng.choice(list(refs))
            t.drop_ref(name)
            del refs[name]
        assert _read_set(t) == _visible(main), (
            f"main diverged at step {step}: {history}"
        )
        for name, r in refs.items():
            assert _read_set(t, ref=name) == _visible(r["state"]), (
                f"ref {name} ({r['kind']}) diverged at step {step}: "
                f"{history}"
            )


def test_ref_model_randomized(spark, tmp_path):
    for i in range(N_SEQUENCES):
        rng = random.Random(4242 + i)
        _run_sequence(spark, str(tmp_path / f"ref_model_{i}"), rng)
