"""Randomized model check for time travel, rollback, and snapshot
expiration.

Seeded random interleavings of append / MoR delete / rollback /
create_tag / expire_snapshots, with a pure-Python ledger of every
snapshot's visible rows. After each op: the current read matches the
ledger, time travel to every (sampled) surviving snapshot still
returns its exact historical rows — INCLUDING after an expiration
pass physically deleted files (kept snapshots' files must survive the
referenced-only-by-expired deletion rule) — and expired snapshots
raise. Pins:

- rollback re-points current without creating a snapshot; the next
  commit's parent is the rolled-back snapshot (history forks);
- expire keeps {current} ∪ tag heads ∪ the retain_last ancestry of
  current and drops everything else (cutoff = now);
- a tag protects its snapshot and that snapshot's files from
  expiration indefinitely;
- MoR delete entries belong to their snapshot: time travel to a
  pre-delete snapshot still sees the deleted rows.
"""

from __future__ import annotations

import copy
import random

import pytest

N_SEQUENCES = 4
OPS_PER_SEQ = 12
KEY_SPACE = list(range(8))


def _visible(state):
    out = []
    for r in state["rows"]:
        if any(
            r["k"] in ks and r["seq"] < dseq for ks, dseq in state["dels"]
        ):
            continue
        out.append((r["k"], r["v"]))
    return sorted(out)


def _read_set(tbl, sid=None):
    return sorted(
        (row["k"], row["v"])
        for row in tbl.read(snapshot_id=sid).collect()
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
    state = {
        "rows": [{"k": k, "v": v, "seq": seq} for k, v in first],
        "dels": [],
    }
    cur_sid = t.meta.current_snapshot_id
    # ledger: sid -> {"state": frozen copy, "parent": sid | None}
    snaps = {cur_sid: {"state": copy.deepcopy(state), "parent": None}}
    tags: set[int] = set()  # tagged snapshot ids
    history = []

    def record_commit():
        nonlocal cur_sid
        parent = cur_sid
        cur_sid = t.meta.current_snapshot_id
        snaps[cur_sid] = {
            "state": copy.deepcopy(state),
            "parent": parent,
        }

    ops = ["append", "del_mor", "rollback", "tag", "expire"]
    weights = [4, 2, 2, 2, 3]
    tag_no = [0]
    for step in range(OPS_PER_SEQ):
        op = rng.choices(ops, weights)[0]
        history.append(op)
        if op == "append":
            b = batch(rng.randint(1, 4))
            t.append(df_of(b))
            seq += 1
            state["rows"].extend(
                {"k": k, "v": v, "seq": seq} for k, v in b
            )
            record_commit()
        elif op == "del_mor":
            cut = rng.randint(0, max(next_v[0] - 1, 0))
            matched = {
                r["k"]
                for r in state["rows"]
                if (r["k"], r["v"]) in set(_visible(state))
                and r["v"] < cut
            }
            t.delete_where_mor(f"v < {cut}", keys=["k"])
            seq += 1
            state["dels"].append((frozenset(matched), seq))
            record_commit()
        elif op == "rollback":
            target = rng.choice(sorted(snaps))
            t.rollback(target)
            cur_sid = target
            state = copy.deepcopy(snaps[target]["state"])
        elif op == "tag":
            name = f"tag{tag_no[0]}"
            tag_no[0] += 1
            t.create_tag(name)  # tags the current snapshot
            tags.add(cur_sid)
        elif op == "expire":
            retain = rng.randint(1, 3)
            t.expire_snapshots(retain_last=retain)
            protected = {cur_sid} | tags
            walk, n = cur_sid, 0
            while walk is not None and walk in snaps and n < retain:
                protected.add(walk)
                n += 1
                walk = snaps[walk]["parent"]
            expired = [s for s in snaps if s not in protected]
            for s in expired:
                del snaps[s]
            tags &= set(snaps)  # (tags are always protected: no-op)
            # EVERY model-expired snapshot must be gone from the
            # table too — an extra kept snapshot means the protected
            # set (tags / retain_last ancestry) diverged
            for s in expired:
                with pytest.raises(Exception):
                    t.read(snapshot_id=s).collect()
        # current read always matches the model
        assert _read_set(t) == _visible(state), (
            f"current diverged at step {step}: {history}"
        )
        # time travel to surviving snapshots (sampled) still exact —
        # including after expiration physically deleted files
        sample = set(rng.sample(sorted(snaps), min(3, len(snaps)))) | (
            tags & set(snaps)  # tagged snaps: always re-check
        )
        for s in sorted(sample):
            assert _read_set(t, sid=s) == _visible(snaps[s]["state"]), (
                f"time travel to {s} diverged at step {step}: {history}"
            )


def test_tt_expire_model_randomized(spark, tmp_path):
    for i in range(N_SEQUENCES):
        rng = random.Random(5150 + i)
        _run_sequence(spark, str(tmp_path / f"tt_model_{i}"), rng)


def test_as_of_to_expired_instant_raises_not_older_data(spark, tmp_path):
    """AS-OF pointing at an instant whose then-current snapshot is gone
    from the snapshots list but still present in the history log (a doc
    shape an external writer or partial expire can produce — our own
    expire trims both in lockstep) must raise SnapshotExpired, not
    silently resolve to an OLDER live snapshot: that would return data
    that was not current at the requested instant. Iceberg likewise
    fails time travel to expired state."""
    import time

    import pytest

    from iceberg_workshop_spark.icetbl import IceTable
    from iceberg_workshop_spark.icetbl import meta as M

    loc = str(tmp_path / "t_asof_expired")
    t = IceTable.create_as(
        spark, loc, spark.createDataFrame([(1, "a")], "id int, s string")
    )
    time.sleep(0.01)  # appends can land within one ms otherwise
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    time.sleep(0.01)
    t.append(spark.createDataFrame([(3, "c")], "id int, s string"))
    snaps = list(t.meta.snapshots)
    assert snaps[1]["timestamp_ms"] < snaps[2]["timestamp_ms"]
    mid_ts = snaps[1]["timestamp_ms"]  # instant when snapshot 2 was current
    # synthesize the divergent doc: snapshot 2 expired, log entry kept
    t.meta.doc["snapshots"] = [
        s for s in t.meta.doc["snapshots"]
        if s["snapshot_id"] != snaps[1]["snapshot_id"]
    ]
    with pytest.raises(M.SnapshotExpired, match="was current at that instant"):
        t.read(as_of_timestamp_ms=mid_ts).collect()
    # instants where the then-current snapshot is live still resolve
    assert t.read(as_of_timestamp_ms=snaps[0]["timestamp_ms"]).count() == 1
    assert t.read(as_of_timestamp_ms=snaps[2]["timestamp_ms"]).count() == 3


def test_as_of_after_full_expire_reads_empty_not_older(spark, tmp_path):
    """After a real expire (which trims the history log in lockstep) a
    mid-history instant no longer resolves to ANY snapshot: the read is
    empty — never an older snapshot's data."""
    import time

    from iceberg_workshop_spark.icetbl import IceTable

    loc = str(tmp_path / "t_asof_trimmed")
    t = IceTable.create_as(
        spark, loc, spark.createDataFrame([(1, "a")], "id int, s string")
    )
    time.sleep(0.01)
    t.append(spark.createDataFrame([(2, "b")], "id int, s string"))
    time.sleep(0.01)
    t.append(spark.createDataFrame([(3, "c")], "id int, s string"))
    snaps = list(t.meta.snapshots)
    t.expire_snapshots(retain_last=1)
    fresh = IceTable.load(spark, loc)
    assert len(fresh.meta.snapshots) == 1
    assert fresh.read(as_of_timestamp_ms=snaps[1]["timestamp_ms"]).count() == 0
    assert fresh.read(as_of_timestamp_ms=snaps[2]["timestamp_ms"]).count() == 3
