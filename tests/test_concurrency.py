"""Optimistic-concurrency commit protocol (Iceberg semantics).

The reference's interop story is concurrent engines committing to one
table (/root/reference/pyspark-iceberg/interoperability.md:64-90).
These tests pin the CAS protocol in icetbl.meta.commit: exactly one
writer wins each metadata version, losers refresh-and-rebase (blind
appends) or surface CommitConflict (copy-on-write plans against a
moved base) — never a silently lost snapshot.
"""

from __future__ import annotations

import os
import threading

import pytest

from iceberg_workshop_spark.icetbl import CommitConflict, IceTable
from iceberg_workshop_spark.icetbl import meta as M


@pytest.fixture
def loc(tmp_path):
    return str(tmp_path / "tbl")


def _mk(spark, loc, rows):
    df = spark.createDataFrame(rows, "id int, name string")
    return IceTable.create_as(spark, loc, df)


def test_two_handles_append_concurrently_both_snapshots_land(spark, loc):
    # Two independent handles (think: two engines) on one table, both
    # holding the same base version; both appends must land.
    t1 = _mk(spark, loc, [(1, "a")])
    t2 = IceTable.load(spark, loc)
    assert t2.meta.version == t1.meta.version

    t1.append(spark.createDataFrame([(2, "b")], "id int, name string"))
    # t2 still holds the old base — its commit conflicts and rebases.
    t2.append(spark.createDataFrame([(3, "c")], "id int, name string"))

    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {1, 2, 3}
    # create_as itself appends once; both concurrent appends are here too
    ops = [s["operation"] for s in final.meta.snapshots]
    assert ops.count("append") == 3  # both writers' snapshots in history
    assert len({s["snapshot_id"] for s in final.meta.snapshots}) == len(
        final.meta.snapshots
    )


def test_threaded_appends_all_land(spark, loc):
    # Hammer the CAS from threads, each with its own stale handle.
    _mk(spark, loc, [(0, "base")])
    n = 6
    handles = [IceTable.load(spark, loc) for _ in range(n)]
    errs: list[Exception] = []

    def writer(i: int) -> None:
        try:
            handles[i].append(
                spark.createDataFrame([(100 + i, f"w{i}")], "id int, name string")
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, *range(100, 100 + n)}
    # one metadata version per commit: create + create_as-append + n appends
    assert final.meta.version == 2 + n


def test_conflict_detection_and_rebase_unit(spark, loc):
    # CAS layer: claiming a version that exists raises CommitConflict
    # instead of overwriting it.
    t = _mk(spark, loc, [(1, "a")])
    meta = M.read_current(loc)
    next_path = M.metadata_path(loc, meta.version + 1)
    os.makedirs(os.path.dirname(next_path), exist_ok=True)
    with open(next_path, "w") as f:
        f.write("{}")  # another writer claimed v(N+1)
    with pytest.raises(CommitConflict):
        M.commit(meta)
    os.remove(next_path)
    # After the obstruction is gone the same meta commits fine.
    committed = M.commit(meta)
    assert committed.version == meta.version + 1
    del t


def test_metadata_only_ops_rebase_on_conflict(spark, loc):
    # Two handles issue metadata-only commits from the same base: both
    # property sets must survive the rebase.
    t1 = _mk(spark, loc, [(1, "a")])
    t2 = IceTable.load(spark, loc)
    t1.set_properties({"owner": "alice"})
    t2.set_properties({"comment": "hello"})
    final = IceTable.load(spark, loc)
    assert final.meta.properties["owner"] == "alice"
    assert final.meta.properties["comment"] == "hello"


def test_cow_op_against_moved_base_raises_not_corrupts(spark, loc):
    # A copy-on-write DELETE planned against a stale base must surface
    # CommitConflict (Iceberg validation behavior), and the winning
    # writer's snapshot must remain intact.
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    t1.append(spark.createDataFrame([(3, "c")], "id int, name string"))
    with pytest.raises(CommitConflict):
        t2.delete_where("id = 1")
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {1, 2, 3}
    # The loser can re-plan on fresh metadata and succeed.
    t2 = IceTable.load(spark, loc)
    t2.delete_where("id = 1")
    assert {r.id for r in IceTable.load(spark, loc).read().collect()} == {2, 3}


def test_hint_is_only_an_accelerator(spark, loc):
    # A stale (or missing) version-hint must not hide a committed
    # version: read_current probes forward from the hint.
    t = _mk(spark, loc, [(1, "a")])
    t.append(spark.createDataFrame([(2, "b")], "id int, name string"))
    hint = os.path.join(loc, M.HINT_FILE)
    with open(hint, "w") as f:
        f.write("1")  # stale hint
    assert M.read_current(loc).version == t.meta.version
    os.remove(hint)  # crashed before any hint write
    assert M.read_current(loc).version == t.meta.version


def test_cross_process_commit_race_loses_nothing(tmp_path):
    """The CAS protocol across real OS processes (separate
    interpreters — the closest local analog to the reference's
    multiple engines): 4 writers × 5 metadata commits each, every
    mutation applied to freshly-read metadata with refresh-on-conflict
    retry. All 20 updates must survive, one version per commit."""
    import subprocess
    import sys as _sys

    loc = str(tmp_path / "tbl")
    os.makedirs(os.path.join(loc, M.DATA_DIR), exist_ok=True)
    M.commit(M.TableMeta.empty(loc, "id int", []))  # v1

    worker = """
import sys
sys.path.insert(0, '/root/repo')
from iceberg_workshop_spark.icetbl import meta as M
loc, wid = sys.argv[1], sys.argv[2]
done = 0
while done < 5:
    meta = M.read_current(loc)
    meta.doc.setdefault("notes", []).append("w{{}}-{{}}".format(wid, done))
    try:
        M.commit(meta)
        done += 1
    except M.CommitConflict:
        continue
""".format(repo="/root/repo")
    procs = [
        subprocess.Popen([_sys.executable, "-c", worker, loc, str(w)])
        for w in range(4)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    final = M.read_current(loc)
    assert final.version == 1 + 20  # one claimed version per commit
    notes = final.doc["notes"]
    assert sorted(notes) == sorted(f"w{w}-{i}" for w in range(4) for i in range(5))


def test_read_current_survives_gc_plus_lost_hint(spark, loc):
    # Metadata GC leaves a non-contiguous version set; losing the hint
    # must still resolve to the latest version (dir-scan fallback).
    t = _mk(spark, loc, [(1, "a")])
    t.set_properties({
        "write.metadata.previous-versions-max": "1",
        "write.metadata.delete-after-commit.enabled": "true",
    })
    for i in range(3):
        t.append(spark.createDataFrame([(10 + i, "x")], "id int, name string"))
    assert not os.path.exists(M.metadata_path(loc, 1))  # v1 GC'd
    os.remove(os.path.join(loc, M.HINT_FILE))
    assert M.read_current(loc).version == t.meta.version


def test_expire_never_touches_uncommitted_files(spark, loc):
    # A crashed/in-flight writer's file lives in NO snapshot; expire's
    # physical cleanup derives deletions from snapshot metadata, so
    # the file must survive. remove_orphan_files with an explicit
    # cutoff (no age left) then reclaims it.
    t = _mk(spark, loc, [(1, "a")])
    t.append(spark.createDataFrame([(2, "b")], "id int, name string"))
    t.delete_where("id = 1")  # creates expired-only files
    stray = os.path.join(loc, M.DATA_DIR, "snap-inflight", "part-000.parquet")
    os.makedirs(os.path.dirname(stray))
    with open(stray, "wb") as f:
        f.write(b"not yet committed")
    stats = t.expire_snapshots()
    assert stats["orphan_files_removed"] > 0  # dropped snapshots cleaned
    assert os.path.exists(stray)  # in-flight file untouched
    rep = t.remove_orphan_files(older_than_ms=M.now_ms() + 1000)
    assert rep["orphans_removed"] >= 1
    assert not os.path.exists(stray)


def test_concurrent_branch_writers_both_land(spark, loc):
    """Two handles appending to DIFFERENT branches race on the same
    metadata version; CAS rebase must land both branch heads without
    either leaking into main or the other branch."""
    t = IceTable.create(spark, loc, "k int")
    t.insert_values([(0,)])
    t.create_branch("b1")
    t.create_branch("b2")
    h1 = IceTable.load(spark, loc)
    h2 = IceTable.load(spark, loc)
    errs = []

    def writer(handle, branch, val):
        try:
            handle.append(
                handle.spark.createDataFrame([(val,)], "k int"), branch=branch
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    th1 = threading.Thread(target=writer, args=(h1, "b1", 11))
    th2 = threading.Thread(target=writer, args=(h2, "b2", 22))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs
    final = IceTable.load(spark, loc)
    assert sorted(r.k for r in final.read().collect()) == [0]
    assert sorted(r.k for r in final.read(ref="b1").collect()) == [0, 11]
    assert sorted(r.k for r in final.read(ref="b2").collect()) == [0, 22]


def test_append_races_compaction_no_rows_lost(spark, loc):
    """Maintenance racing ingestion: a compaction (replace commit)
    planned against a base the concurrent append has moved must either
    land via CAS or surface CommitConflict — and in EVERY outcome the
    table holds exactly the union of committed rows (compaction never
    swallows a row an append landed, appends never resurrect
    compacted-away duplicates)."""
    from iceberg_workshop_spark.icetbl import maintenance

    t1 = _mk(spark, loc, [(i, "x") for i in range(10)])
    t2 = IceTable.load(spark, loc)

    # t2 plans the compaction against the current base; t1 appends
    # first, so t2's replace commit is the stale one.
    t1.append(spark.createDataFrame([(100, "new")], "id int, name string"))
    try:
        maintenance.rewrite_data_files(t2, target_num_files=1)
        compacted = True
    except CommitConflict:
        compacted = False

    final = IceTable.load(spark, loc)
    ids = sorted(r.id for r in final.read().collect())
    assert ids == sorted(list(range(10)) + [100]), (compacted, ids)
    # history is linear and versions are unique regardless of outcome
    assert len({s["snapshot_id"] for s in final.meta.snapshots}) == len(
        final.meta.snapshots
    )


def test_concurrent_mor_delete_and_append(spark, loc):
    """A merge-on-read key delete racing an append of DIFFERENT keys:
    both commits must land (neither is invalidated by the other), the
    deleted key stays dead, and the appended rows are all visible."""
    t1 = _mk(spark, loc, [(i, "x") for i in range(6)])
    t2 = IceTable.load(spark, loc)

    t1.delete_where_mor("id = 3", keys=["id"])
    # t2 holds the pre-delete base; its blind append must rebase onto
    # the delete commit without dropping the delete files.
    t2.append(spark.createDataFrame([(50, "y"), (51, "y")], "id int, name string"))

    final = IceTable.load(spark, loc)
    ids = sorted(r.id for r in final.read().collect())
    assert ids == [0, 1, 2, 4, 5, 50, 51]


# ---------------------------------------- isolation levels (Iceberg's
# write.<op>.isolation-level validation granularity, VERDICT r3 #7)


def test_snapshot_isolation_survives_concurrent_append(spark, loc):
    """Under isolation='snapshot', a racing append does NOT invalidate
    a CoW delete: the delete's rewrite lands and the appended rows
    (even ones matching the delete predicate — they were not visible
    to its snapshot) survive."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    t1.append(spark.createDataFrame([(1, "late")], "id int, name string"))
    # t2 plans against the pre-append base; snapshot isolation rebases
    t2.delete_where("id = 1", isolation="snapshot")
    final = {(r.id, r.name) for r in IceTable.load(spark, loc).read().collect()}
    assert final == {(2, "b"), (1, "late")}


def test_serializable_conflicts_on_matching_concurrent_append(spark, loc):
    """Under isolation='serializable', a racing append INTO the delete's
    key range must force a re-plan (the serial order 'append then
    delete' would have removed the new row), while a non-matching
    append still succeeds."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    t1.append(spark.createDataFrame([(1, "late")], "id int, name string"))
    with pytest.raises(CommitConflict):
        t2.delete_where("id = 1", isolation="serializable")
    # loser re-plans on fresh metadata: now the late row dies too
    t2 = IceTable.load(spark, loc)
    t2.delete_where("id = 1", isolation="serializable")
    assert {r.id for r in IceTable.load(spark, loc).read().collect()} == {2}


def test_serializable_allows_non_matching_concurrent_append(spark, loc):
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    t1.append(spark.createDataFrame([(9, "z")], "id int, name string"))
    t2.delete_where("id = 1", isolation="serializable")
    assert {r.id for r in IceTable.load(spark, loc).read().collect()} == {2, 9}


def test_serializable_merge_conflicts_on_source_key_append(spark, loc):
    """MERGE under serializable: a concurrent append whose key appears
    in the MERGE source must conflict; one that does not, lands."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    src = spark.createDataFrame([(1, "upd"), (3, "new")], "id int, name string")
    # non-matching concurrent append → merge lands
    t1.append(spark.createDataFrame([(7, "q")], "id int, name string"))
    t2.merge_into(src, on=["id"], isolation="serializable")
    state = {(r.id, r.name) for r in IceTable.load(spark, loc).read().collect()}
    assert state == {(1, "upd"), (2, "b"), (3, "new"), (7, "q")}
    # matching concurrent append (key 3 is in a fresh source) → conflict
    t3 = IceTable.load(spark, loc)
    t4 = IceTable.load(spark, loc)
    t3.append(spark.createDataFrame([(30, "race")], "id int, name string"))
    src2 = spark.createDataFrame([(30, "upd2")], "id int, name string")
    with pytest.raises(CommitConflict):
        t4.merge_into(src2, on=["id"], isolation="serializable")


def test_isolation_conflicts_on_concurrent_mor_delete(spark, loc):
    """Both relaxed levels still conflict when a concurrent MoR delete
    file lands: the CoW rewrite's fresh sequence number would void it."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b"), (3, "c")])
    t2 = IceTable.load(spark, loc)
    t1.delete_where_mor("id = 3", keys=["id"])
    with pytest.raises(CommitConflict):
        t2.delete_where("id = 1", isolation="snapshot")
    assert {r.id for r in IceTable.load(spark, loc).read().collect()} == {1, 2}


def test_strict_default_unchanged(spark, loc):
    """Default isolation stays 'strict': any concurrent commit raises."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    t1.append(spark.createDataFrame([(9, "z")], "id int, name string"))
    with pytest.raises(CommitConflict):
        t2.delete_where("id = 1")


def test_isolation_property_flows_through_sql_frontend(spark, loc):
    """write.delete.isolation-level=snapshot set via table properties
    makes a front-end DELETE survive a racing append."""
    from iceberg_workshop_spark.plans.sqlfront import IceSqlSession

    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t1.set_properties({"write.delete.isolation-level": "snapshot"})
    t2 = IceTable.load(spark, loc)
    s = IceSqlSession(spark)
    s.register_table("db.t", t2)
    t1.append(spark.createDataFrame([(9, "z")], "id int, name string"))
    s.sql("DELETE FROM db.t WHERE id = 1")
    assert {r.id for r in IceTable.load(spark, loc).read().collect()} == {2, 9}


def _mk_ranged(spark, loc):
    """Table with two disjoint-range files: ids 0-4 and 5-9."""
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "id int, name string"
    ).repartitionByRange(2, "id")
    t = IceTable.create_as(spark, loc, df)
    assert len(t.meta.current_files()) == 2
    return t


def test_disjoint_cow_writers_both_land(spark, loc):
    """VERDICT r4 #7 (multi-writer arbitration): two writers running
    copy-on-write DELETEs against the SAME base but touching DISJOINT
    files must both land under snapshot isolation — the loser's commit
    rebases onto the winner's snapshot, re-validates its own read-set,
    and retries."""
    t1 = _mk_ranged(spark, loc)
    t2 = IceTable.load(spark, loc)
    t1.delete_where("id = 1", isolation="snapshot")   # rewrites low file
    t2.delete_where("id = 8", isolation="snapshot")   # planned on old base
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, 2, 3, 4, 5, 6, 7, 9}
    ops = [s["operation"] for s in final.meta.snapshots]
    assert ops.count("delete") == 2


def test_overlapping_cow_writers_loser_aborts(spark, loc):
    """Two CoW writers rewriting the SAME file: the loser must abort
    with the documented conflict error (its read-set was invalidated),
    and a re-plan on fresh metadata then succeeds."""
    t1 = _mk_ranged(spark, loc)
    t2 = IceTable.load(spark, loc)
    t1.delete_where("id = 1", isolation="snapshot")
    with pytest.raises(CommitConflict):
        t2.delete_where("id = 2", isolation="snapshot")  # same low file
    t2 = IceTable.load(spark, loc)
    t2.delete_where("id = 2", isolation="snapshot")
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, 3, 4, 5, 6, 7, 8, 9}


def test_cow_rebase_does_not_resurrect_concurrently_deleted_rows(spark, loc):
    """The rebased snapshot must be built from the WINNER's file set:
    if the loser re-committed its own planned 'untouched' list, rows a
    concurrent writer deleted from files this op never touched would
    resurrect."""
    t1 = _mk_ranged(spark, loc)
    t2 = IceTable.load(spark, loc)
    t2_plan_base = t2.meta.version
    t1.delete_where("id = 7", isolation="snapshot")   # rewrites high file
    assert t2.meta.version == t2_plan_base
    t2.delete_where("id = 1", isolation="snapshot")   # rewrites low file
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, 2, 3, 4, 5, 6, 8, 9}


def test_concurrent_pos_delete_on_untouched_file_carries_through(spark, loc):
    """A concurrent POSITIONAL delete targeting a file the CoW op did
    not rewrite is no conflict: the delete entry rides the rebased
    snapshot and still applies (the untouched file keeps its path and
    sequence)."""
    t1 = _mk_ranged(spark, loc)
    t2 = IceTable.load(spark, loc)
    t1.delete_where_pos("id = 8")                      # MoR, high file
    t2.delete_where("id = 1", isolation="snapshot")    # CoW, low file
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, 2, 3, 4, 5, 6, 7, 9}


def test_concurrent_pos_delete_on_rewritten_file_conflicts(spark, loc):
    """A concurrent positional delete targeting a file the CoW op DID
    rewrite must conflict — the rewrite drops the file the positions
    point into, silently voiding the delete otherwise."""
    t1 = _mk_ranged(spark, loc)
    t2 = IceTable.load(spark, loc)
    t1.delete_where_pos("id = 2")                      # MoR, low file
    with pytest.raises(CommitConflict):
        t2.delete_where("id = 1", isolation="snapshot")  # CoW, same file


def test_interleaved_threaded_writers_snapshot_isolation(spark, loc):
    """Two genuinely concurrent writer threads (an appender and a CoW
    deleter under snapshot isolation) interleaving at arbitrary
    points: every commit must either land or raise CommitConflict —
    and here the file sets are disjoint, so ALL must land."""
    t = _mk_ranged(spark, loc)
    errs: list[Exception] = []

    def appender():
        h = IceTable.load(spark, loc)
        for i in range(3):
            try:
                h.append(
                    spark.createDataFrame(
                        [(100 + i, f"x{i}")], "id int, name string"
                    )
                )
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

    def deleter():
        try:
            h = IceTable.load(spark, loc)
            h.delete_where("id = 1", isolation="snapshot")
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    th = [threading.Thread(target=appender), threading.Thread(target=deleter)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    final = IceTable.load(spark, loc)
    ids = {r.id for r in final.read().collect()}
    assert ids == {0, 2, 3, 4, 5, 6, 7, 8, 9, 100, 101, 102}


@pytest.mark.parametrize("seed", range(6))
def test_snapshot_isolation_serial_equivalence_property(spark, tmp_path, seed):
    """Randomized two-writer interleavings: writer A commits first;
    writer B (planned against the shared base, snapshot isolation)
    must either land with exactly the snapshot-isolation outcome —
    B's delete removes only rows VISIBLE AT ITS PLAN TIME, A's
    concurrent effects carry through — or abort with CommitConflict
    leaving A's state intact. Anything else (lost update, resurrected
    row, phantom delete of A's appends) fails."""
    import random

    rng = random.Random(20260814 + seed)
    loc = str(tmp_path / f"prop{seed}")
    base_rows = [(i, f"b{i}") for i in range(12)]
    df = spark.createDataFrame(
        base_rows, "id int, name string"
    ).repartitionByRange(3, "id")
    IceTable.create_as(spark, loc, df)
    s0 = {i for i, _ in base_rows}

    def rand_op():
        if rng.random() < 0.5:
            lo = rng.randrange(0, 200)
            return ("append", [(lo + 1000 * seed + k, "x") for k in range(rng.randrange(1, 3))])
        lo = rng.randrange(0, 12)
        return ("delete", (lo, min(11, lo + rng.randrange(0, 5))))

    op_a, op_b = rand_op(), rand_op()
    t_a = IceTable.load(spark, loc)
    t_b = IceTable.load(spark, loc)  # plans against the shared base

    def apply_op(t, op):
        kind, arg = op
        if kind == "append":
            t.append(spark.createDataFrame(arg, "id int, name string"))
        else:
            t.delete_where(
                f"id BETWEEN {arg[0]} AND {arg[1]}", isolation="snapshot"
            )

    apply_op(t_a, op_a)  # writer A lands first
    # expected state after A
    s1 = set(s0)
    if op_a[0] == "append":
        s1 |= {i for i, _ in op_a[1]}
    else:
        s1 -= {i for i in s0 if op_a[1][0] <= i <= op_a[1][1]}
    try:
        apply_op(t_b, op_b)
        if op_b[0] == "append":
            expected = s1 | {i for i, _ in op_b[1]}
        else:
            # delete removes only rows visible at B's plan time (s0)
            expected = s1 - {i for i in s0 if op_b[1][0] <= i <= op_b[1][1]}
    except CommitConflict:
        expected = s1
    final = {r.id for r in IceTable.load(spark, loc).read().collect()}
    assert final == expected, (op_a, op_b, final, expected)


# ------------------------------------- merge-on-read rebase under
# append-only winners (VERDICT r5 #3): an equality/positional delete
# sidecar stays valid when the CAS winner only added files, so the
# MoR commit rebases onto the winner instead of raising.


def test_mor_delete_rebases_onto_concurrent_append(spark, loc):
    """MoR equality delete LOSES the CAS to a blind append: the delete
    must rebase (serial order: delete, then append) — both commits
    land, the deleted key is dead, every appended row is visible."""
    t1 = _mk(spark, loc, [(i, "x") for i in range(6)])
    t2 = IceTable.load(spark, loc)

    t1.append(spark.createDataFrame([(50, "y")], "id int, name string"))
    # t2 plans the delete against the pre-append base and commits second
    t2.delete_where_mor("id = 3", keys=["id"])

    final = IceTable.load(spark, loc)
    ids = sorted(r.id for r in final.read().collect())
    assert ids == [0, 1, 2, 4, 5, 50]


def test_mor_delete_rebase_preserves_winner_matching_rows(spark, loc):
    """The winner appended a row MATCHING the delete predicate: the
    rebased serial order is delete-then-append, so the winner's row
    survives (its seq equals the delete's dseq — not strictly older)."""
    t1 = _mk(spark, loc, [(1, "a"), (3, "b")])
    t2 = IceTable.load(spark, loc)

    t1.append(spark.createDataFrame([(3, "winner")], "id int, name string"))
    t2.delete_where_mor("id = 3", keys=["id"])

    rows = {(r.id, r.name) for r in IceTable.load(spark, loc).read().collect()}
    assert rows == {(1, "a"), (3, "winner")}


def test_mor_update_rebases_onto_concurrent_append(spark, loc):
    """MoR UPDATE (positional mask + appended images) racing a blind
    append: both land — updated images and winner rows all visible."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)
    t2.set_properties({"write.update.mode": "merge-on-read"})

    t1.append(spark.createDataFrame([(9, "z")], "id int, name string"))
    # set_properties already refreshed t2 onto the append; reload a
    # genuinely stale handle to exercise the rebase
    stale = IceTable.load(spark, loc)
    stale.meta = M.read_current(loc)
    t1.append(spark.createDataFrame([(10, "w")], "id int, name string"))
    stats = stale.update_where_mor("id = 1", {"name": "'UPD'"})
    assert stats["positions_deleted"] == 1

    rows = {(r.id, r.name) for r in IceTable.load(spark, loc).read().collect()}
    assert rows == {(1, "UPD"), (2, "b"), (9, "z"), (10, "w")}


def test_mor_delete_still_conflicts_on_concurrent_rewrite(spark, loc):
    """The winner REWROTE files (compaction): positional targets may be
    orphaned — the MoR commit must re-raise, not rebase."""
    t1 = _mk(spark, loc, [(i, "x") for i in range(8)])
    t2 = IceTable.load(spark, loc)

    t1.rewrite_data_files(target_file_size_bytes=1 << 30)
    with pytest.raises(CommitConflict):
        t2.delete_where_pos("id = 3")


def test_mor_delete_still_conflicts_on_concurrent_mor_delete(spark, loc):
    """The winner changed the delete-file set: re-raise (delete lists
    are carried wholesale, a silent union could double-mask or drop)."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b"), (3, "c")])
    t2 = IceTable.load(spark, loc)

    t1.delete_where_mor("id = 1", keys=["id"])
    with pytest.raises(CommitConflict):
        t2.delete_where_mor("id = 2", keys=["id"])


def test_mor_rebase_changelog_stays_exact(spark, loc):
    """After a rebased MoR delete, the changelog between the append
    snapshot and the delete snapshot reports exactly the masked rows."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b"), (3, "c")])
    t2 = IceTable.load(spark, loc)

    t1.append(spark.createDataFrame([(9, "z")], "id int, name string"))
    t2.delete_where_mor("id = 2", keys=["id"])

    final = IceTable.load(spark, loc)
    snaps = [s["snapshot_id"] for s in final.meta.snapshots]
    chg = final.changelog(from_snapshot_id=snaps[-2], to_snapshot_id=snaps[-1])
    rows = [(r["id"], r["_change_type"]) for r in chg.collect()]
    assert rows == [(2, "delete")]
    assert sorted(r.id for r in final.read().collect()) == [1, 3, 9]


def test_torn_commit_metadata_linked_hint_not_repointed(spark, loc):
    """Crash BETWEEN the v(N+1).json link and the hint repoint: the
    new version file exists, the hint still says N, and the half-done
    writer's hint tmp sidecar is stranded at the table root. Readers
    must see N+1 (hint is an accelerator, never truth), the next
    commit must land as N+2, and the stranded tmp must not trip
    anything."""
    t = _mk(spark, loc, [(1, "a")])
    v = t.meta.version
    # simulate the torn commit: next version file appears "out of
    # nowhere" (the crashed writer linked it), hint stays at v, and
    # the writer's hint tmp survives the crash
    meta = M.read_current(loc)
    meta.doc.setdefault("notes", []).append("torn-writer")
    M.commit(meta)  # v+1 fully committed...
    with open(os.path.join(loc, M.HINT_FILE), "w") as f:
        f.write(str(v))  # ...but the crash rolled the hint back
    with open(os.path.join(loc, f"{M.HINT_FILE}.deadbeef.tmp"), "w") as f:
        f.write(str(v + 1))  # stranded hint sidecar

    cur = M.read_current(loc)
    assert cur.version == v + 1  # probe walked past the stale hint
    assert "torn-writer" in cur.doc.get("notes", [])

    # the table keeps working: a fresh handle reads and commits v+2
    t2 = IceTable.load(spark, loc)
    t2.append(spark.createDataFrame([(2, "b")], "id int, name string"))
    assert M.read_current(loc).version == v + 2
    assert {r.id for r in t2.read().collect()} == {1, 2}


def test_orphan_metadata_tmp_crashed_before_link(spark, loc):
    """Crash BEFORE os.link: a half-written v(N+1).json.<uuid>.tmp sits
    in metadata/ (truncated JSON — the write died mid-dump). Readers
    must ignore it, the version number must still be claimable by the
    next writer, and remove_orphan_files must sweep it only once it is
    older than the age guard."""
    t = _mk(spark, loc, [(1, "a")])
    v = t.meta.version
    torn = M.metadata_path(loc, v + 1) + ".ab12cd34.tmp"
    with open(torn, "w") as f:
        f.write('{"snapshots": [{"trunc')  # half-written JSON

    assert M.read_current(loc).version == v  # invisible to readers
    t.append(spark.createDataFrame([(2, "b")], "id int, name string"))
    assert M.read_current(loc).version == v + 1  # version still free

    # age guard: a YOUNG tmp (a possibly-live writer) is skipped...
    rep = t.remove_orphan_files()
    assert os.path.exists(torn), rep
    # ...an aged one is swept (cutoff in the future ages everything)
    rep = t.remove_orphan_files(older_than_ms=M.now_ms() + 60_000)
    assert not os.path.exists(torn)
    assert rep["orphans_removed"] >= 1
    # the table itself is untouched
    assert {r.id for r in IceTable.load(spark, loc).read().collect()} == {1, 2}


def test_orphan_hint_tmp_swept_with_age_guard(spark, loc):
    """A stranded version-hint tmp at the table root follows the same
    rule: skipped while young, swept once aged, and never confused
    with the real hint."""
    t = _mk(spark, loc, [(1, "a")])
    stranded = os.path.join(loc, f"{M.HINT_FILE}.feedf00d.tmp")
    with open(stranded, "w") as f:
        f.write("999")  # pointing at a version that never landed

    assert M.read_current(loc).version == t.meta.version
    t.remove_orphan_files()
    assert os.path.exists(stranded)  # young: may be a live writer
    t.remove_orphan_files(older_than_ms=M.now_ms() + 60_000)
    assert not os.path.exists(stranded)
    # the REAL hint survived the sweep
    assert os.path.exists(os.path.join(loc, M.HINT_FILE))
    assert M.read_current(loc).version == t.meta.version


def test_mor_delete_conflicts_on_concurrent_rename(spark, loc):
    """A concurrent RENAME COLUMN voids a merge-on-read delete plan:
    the sidecar would record the OLD key name with a dseq NEWER than
    the rename's logged sequence, so the rename translation could
    never reattach it and every later read would fail resolving the
    stale key. The rebase must surface CommitConflict (re-plan), not
    commit the wedged sidecar (round-11 review finding)."""
    t1 = _mk(spark, loc, [(1, "a"), (2, "b")])
    t2 = IceTable.load(spark, loc)

    t1.rename_column("id", "rid")
    with pytest.raises(CommitConflict, match="schema change"):
        t2.delete_where_mor("id = 1", keys=["id"])

    # the table stays readable and intact; a re-planned delete under
    # the new name works
    fresh = IceTable.load(spark, loc)
    assert fresh.read().count() == 2
    fresh.delete_where_mor("rid = 1", keys=["rid"])
    assert {r.rid for r in fresh.read().collect()} == {2}


def test_blind_append_conflicts_on_concurrent_schema_change(spark, loc):
    """Even a blind append is schema-sensitive: its files carry
    plan-time physical column names, but a post-conflict retry would
    stamp them into the post-change era, which reads would misresolve.
    The rebase raises instead."""
    t1 = _mk(spark, loc, [(1, "a")])
    t2 = IceTable.load(spark, loc)

    t1.rename_column("name", "label")
    with pytest.raises(CommitConflict, match="schema change"):
        t2.append(spark.createDataFrame([(9, "z")], "id int, name string"))

    fresh = IceTable.load(spark, loc)
    assert {(r.id, r.label) for r in fresh.read().collect()} == {(1, "a")}
    fresh.append(spark.createDataFrame([(9, "z")], "id int, label string"))
    assert fresh.read().count() == 2


# --------------------------------------------------------------------
# REST-catalog commit arbitration (VERDICT r11 task #3): the reference
# delegates multi-writer arbitration to its REST catalog container
# (docker-compose.yml:24-44); these tests pin our POST-commit CAS —
# writers prepare metadata files themselves, the catalog serializes
# the version swap, and IceTable's retry loops rebase through it.


@pytest.fixture
def catalog(spark, loc):
    from iceberg_workshop_spark.icetbl.restcat import (
        RestCatalogClient,
        RestCatalogServer,
    )

    _mk(spark, loc, [(0, "base")])
    srv = RestCatalogServer()
    srv.register("t", loc)
    base = srv.start()
    yield srv, RestCatalogClient(base)
    srv.stop()


def test_catalog_two_appenders_both_land_without_manual_retry(
    spark, loc, catalog
):
    srv, client = catalog
    w1 = client.attach_writer(spark, "t")
    w2 = client.attach_writer(spark, "t")
    assert w1.meta.version == w2.meta.version

    w1.append(spark.createDataFrame([(1, "a")], "id int, name string"))
    # w2 still holds the stale base: its POST gets 409, the handle
    # refreshes FROM THE CATALOG, blind-rebases, and re-commits —
    # no manual retry by the caller.
    w2.append(spark.createDataFrame([(2, "b")], "id int, name string"))

    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, 1, 2}
    ops = [s["operation"] for s in final.meta.snapshots]
    assert ops.count("append") == 3  # create_as + both writers
    # both commits actually went through the catalog (2 POSTs + the
    # 409'd first attempt of w2)
    assert srv.n_requests >= 3


def test_catalog_threaded_appenders_all_land(spark, loc, catalog):
    srv, client = catalog
    n = 5
    handles = [client.attach_writer(spark, "t") for _ in range(n)]
    errs: list[Exception] = []

    def writer(i: int) -> None:
        try:
            handles[i].append(
                spark.createDataFrame(
                    [(100 + i, f"w{i}")], "id int, name string"
                )
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, *range(100, 100 + n)}
    assert final.meta.version == 2 + n  # one version per landed commit


def test_catalog_append_conflicts_on_concurrent_schema_change(
    spark, loc, catalog
):
    srv, client = catalog
    w1 = client.attach_writer(spark, "t")
    w2 = client.attach_writer(spark, "t")
    w1.rename_column("name", "label")
    with pytest.raises(CommitConflict, match="schema change"):
        w2.append(spark.createDataFrame([(9, "z")], "id int, name string"))
    fresh = IceTable.load(spark, loc)
    assert {(r.id, r.label) for r in fresh.read().collect()} == {(0, "base")}


def test_catalog_commit_protocol_rejections(spark, loc, catalog):
    """Protocol-level contract: a commit without the optimistic
    requirement is refused (400 — an unconditional swap is a
    lost-update machine), a stale requirement gets 409 with the
    current version, and an unknown table 404s."""
    import json
    import urllib.error
    import urllib.request

    srv, client = catalog

    def post(path, payload):
        req = urllib.request.Request(
            f"{client.base_url}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    cur = M.read_current(loc)
    with pytest.raises(urllib.error.HTTPError) as exc:
        post("/v1/namespaces/default/tables/t", {"metadata": cur.doc})
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        post(
            "/v1/namespaces/default/tables/t",
            {
                "requirements": [
                    {"type": "assert-table-version", "version": cur.version - 1}
                ],
                "metadata": cur.doc,
            },
        )
    assert exc.value.code == 409
    assert json.loads(exc.value.read())["current_version"] == cur.version
    with pytest.raises(urllib.error.HTTPError) as exc:
        post("/v1/namespaces/default/tables/nope", {"metadata": {}})
    assert exc.value.code == 404


def test_catalog_writer_races_direct_fs_writer(spark, loc, catalog):
    """A catalog-attached writer and a plain filesystem writer hit the
    same table: the catalog's inner meta.commit loses the version claim
    cleanly (409 -> refresh -> rebase) and both rows survive."""
    srv, client = catalog
    wc = client.attach_writer(spark, "t")
    wf = IceTable.load(spark, loc)
    wf.append(spark.createDataFrame([(7, "fs")], "id int, name string"))
    wc.append(spark.createDataFrame([(8, "cat")], "id int, name string"))
    final = IceTable.load(spark, loc)
    assert {r.id for r in final.read().collect()} == {0, 7, 8}


def test_cross_process_writers_cas_atomicity(spark, loc, tmp_path):
    """VERDICT r12 task #4: the version-hint CAS protocol arbitrates
    across OS PROCESSES, not just threads (threads share the GIL and
    in-process locks, so they under-test filesystem atomicity). Four
    subprocesses hammer metadata-only commits with their own
    retry loops; every commit must land in a distinct, contiguous
    version file and no property update may be lost."""
    import subprocess
    import sys
    import time

    _mk(spark, loc, [(1, "a")])
    base_version = M.read_current(loc).version

    worker_src = r"""
import sys, time, os
sys.path.insert(0, '/root/repo')
from iceberg_workshop_spark.icetbl import meta as M

loc, wid, n_commits, start_at = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), float(sys.argv[4])
# common start instant so the processes genuinely interleave
time.sleep(max(0.0, start_at - time.time()))
for k in range(n_commits):
    for attempt in range(50):
        meta = M.read_current(loc)
        meta.properties[f"w{wid}_{k}"] = str(meta.version)
        try:
            M.commit(meta)
            break
        except M.CommitConflict:
            continue
    else:
        sys.exit(3)
print("done", wid)
"""
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    n_workers, n_commits = 4, 5
    start_at = time.time() + 1.0
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), loc, str(i), str(n_commits), str(start_at)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(n_workers)
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-500:]

    final = M.read_current(loc)
    # every commit landed: one contiguous version per commit, no holes
    assert final.version == base_version + n_workers * n_commits
    import os as _os

    versions = sorted(
        int(n[1:-5])
        for n in _os.listdir(_os.path.join(loc, "metadata"))
        if n.startswith("v") and n.endswith(".json")
    )
    assert versions == list(range(1, final.version + 1))
    # no lost update: all 20 property stamps present
    for i in range(n_workers):
        for k in range(n_commits):
            assert f"w{i}_{k}" in final.properties, (i, k)


def test_cross_process_conflicting_schema_change_raises(spark, loc, tmp_path):
    """A stale handle's copy-on-write-style commit against a base that
    a SEPARATE PROCESS has moved must surface CommitConflict — same
    contract as the in-process tests, proven across the process
    boundary."""
    import subprocess
    import sys

    _mk(spark, loc, [(1, "a")])
    stale = M.read_current(loc)

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from iceberg_workshop_spark.icetbl import meta as M;"
        f"meta = M.read_current({loc!r});"
        "meta.schema_ddl = meta.schema_ddl + ', extra int';"
        "M.commit(meta)"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=60)

    stale.properties["mine"] = "1"
    with pytest.raises(M.CommitConflict):
        M.commit(stale)


def test_cross_process_foreign_commit_race_loses_nothing(tmp_path):
    """Round 14: the FOREIGN commit protocol (_next_metadata_file +
    _commit_metadata's exclusive-create CAS) across real OS processes,
    for BOTH metadata naming schemes — HadoopTables vN (the filename
    is the conflict domain) and catalog-style counter-uuid (the
    .commit-<counter>.lock claims the counter). 4 writers x 5 commits
    each, refresh-and-retry on the 'concurrent commit' refusal; all
    20 updates must land with one version per commit."""
    import json as _json
    import subprocess
    import sys as _sys
    import uuid as _uuid

    worker = """
import sys
sys.path.insert(0, '/root/repo')
from iceberg_workshop_spark.icetbl.iceformat import (
    _commit_metadata, _next_metadata_file)
loc, wid = sys.argv[1], sys.argv[2]
done = 0
while done < 5:
    doc, path, hint = _next_metadata_file(loc)
    doc.setdefault("note-log", []).append("w%s-%s" % (wid, done))
    try:
        _commit_metadata(loc, path, hint, doc)
        done += 1
    except ValueError:
        continue
"""

    def race(loc):
        procs = [
            subprocess.Popen([_sys.executable, "-c", worker, loc, str(w)])
            for w in range(4)
        ]
        for p in procs:
            assert p.wait(timeout=120) == 0

    from iceberg_workshop_spark.icetbl.iceformat import (
        current_metadata_path,
        resolve_iceberg_metadata,
    )

    # HadoopTables vN naming
    loc_v = str(tmp_path / "ice_v")
    mdir = os.path.join(loc_v, "metadata")
    os.makedirs(mdir)
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as fh:
        _json.dump({"note-log": []}, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")
    race(loc_v)
    assert current_metadata_path(loc_v).endswith("v21.metadata.json")
    notes = resolve_iceberg_metadata(loc_v)["note-log"]
    assert sorted(notes) == sorted(
        f"w{w}-{i}" for w in range(4) for i in range(5)
    )

    # catalog-style counter-uuid naming (no hint)
    loc_c = str(tmp_path / "ice_c")
    mdir = os.path.join(loc_c, "metadata")
    os.makedirs(mdir)
    with open(
        os.path.join(mdir, f"00001-{_uuid.uuid4()}.metadata.json"), "w"
    ) as fh:
        _json.dump({"note-log": []}, fh)
    race(loc_c)
    assert os.path.basename(current_metadata_path(loc_c)).startswith(
        "00021-"
    )
    notes = resolve_iceberg_metadata(loc_c)["note-log"]
    assert sorted(notes) == sorted(
        f"w{w}-{i}" for w in range(4) for i in range(5)
    )
