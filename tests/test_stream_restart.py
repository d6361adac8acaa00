"""Exactly-once across checkpoint restarts: a file stream lands in an
IceTable via foreachBatch snapshot commits; run 1 sees only part of
the input, run 2 resumes from the SAME checkpoint over the full input
and must append only the unseen files; re-running the drained
checkpoint a third time must be a no-op. Final table state equals the
batch ground truth exactly — no loss, no duplication."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_workshop_spark.icetbl import IceTable
from iceberg_workshop_spark.sources.tables import load
from tests.conftest import SF_DIR


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value"
    )
    # Four input files, written under distinct names so globs can
    # stage their arrival across runs.
    for i in range(4):
        ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.parquet(
            os.path.join(src, f"chunk{i}")
        )

    tbl = IceTable.create(
        spark, str(tmp_path / "sink"), "event_id bigint, user_id bigint, value double"
    )
    ckpt = str(tmp_path / "ckpt")

    def run(glob: str) -> None:
        def land(batch_df, batch_id):
            tbl.append(batch_df.select("event_id", "user_id", "value"))

        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "*.parquet")
            .parquet(os.path.join(src, glob))
            .writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # Run 1: only chunks 0-1 exist as far as the glob is concerned.
    run("chunk[01]")
    n_after_first = tbl.read().count()
    snaps_after_first = len(tbl.meta.snapshots)
    assert 0 < n_after_first < ev.count()

    # Run 2: same checkpoint, full input — only chunks 2-3 are new.
    run("chunk*")
    assert tbl.read().count() == ev.count()

    # Run 3: nothing new — the drained checkpoint must commit nothing.
    snaps_before = len(tbl.meta.snapshots)
    run("chunk*")
    assert len(tbl.meta.snapshots) == snaps_before
    assert tbl.read().count() == ev.count()

    # Value-level equality with batch truth (exactly-once, not just
    # count parity).
    got = {(r["event_id"], r["user_id"]) for r in tbl.read().collect()}
    want = {(r["event_id"], r["user_id"]) for r in ev.collect()}
    assert got == want
    assert snaps_after_first < snaps_before
