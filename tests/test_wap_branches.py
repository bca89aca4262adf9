"""Write-audit-publish branches on the snapshot sink.

The Iceberg WAP pattern: stage commits on a branch, audit the branch
snapshot, fast-forward main on success, drop the branch on failure —
main readers never observe unaudited data. Version numbers are globally
linear, so the sink enforces STRICT WAP: while a branch holds
unpublished commits, main cannot advance (collision guard).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.sink import ConcurrentCommitError, ParquetSnapshotSink


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {
                "seq": seq, "op": "I", "conv_id": conv, "turn_idx": turn,
                "role": "user", "text": text, "tool": None, "ts": None,
                "source_file": f"s{seq}", "offset": seq,
            }
            for seq, conv, turn, text in rows
        ],
        CHANGE_SCHEMA,
    )


@pytest.fixture()
def seeded(spark, tmp_path):
    root = str(tmp_path / "table")
    main = ParquetSnapshotSink(spark, root, n_buckets=4)
    main.merge(_events(spark, [(1, "c1", 0, "base-a"), (2, "c2", 0, "base-b")]), batch_id=0)
    return root, main


def _texts(sink, version=None):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in sink.read_table(version).collect()
    }


def test_wap_publish_happy_path(spark, seeded):
    root, main = seeded
    base_state = _texts(main)
    base = main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, branch="audit")
    staged.merge(_events(spark, [(3, "c3", 0, "staged"), (4, "c1", 0, "updated")]), batch_id=1)

    # audit: branch sees staged rows, main does not
    assert _texts(staged)[("c3", 0)] == "staged"
    assert _texts(staged)[("c1", 0)] == "updated"
    assert _texts(main) == base_state

    v = main.publish("audit")
    assert v > base
    assert main.branches() == {}
    after = _texts(ParquetSnapshotSink(spark, root))
    assert after[("c3", 0)] == "staged" and after[("c1", 0)] == "updated"


def test_wap_drop_branch_discards_and_unblocks_main(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, branch="audit")
    staged.merge(_events(spark, [(3, "c9", 0, "bad-data")]), batch_id=1)

    deleted = main.drop_branch("audit")
    assert any("_manifests/" in d for d in deleted)
    assert ("c9", 0) not in _texts(main)
    # main's version sequence is unblocked: the next merge reuses the
    # version the dropped branch had claimed
    main.merge(_events(spark, [(5, "c4", 0, "resumed")]), batch_id=1)
    assert _texts(main)[("c4", 0)] == "resumed"


def test_strict_wap_locks_main_while_branch_staged(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, branch="audit")
    staged.merge(_events(spark, [(3, "c3", 0, "staged")]), batch_id=1)
    with pytest.raises(ConcurrentCommitError):
        main.merge(_events(spark, [(4, "c4", 0, "race")]), batch_id=2)
    # after publish, main ingest resumes normally
    main.publish("audit")
    main.merge(_events(spark, [(4, "c4", 0, "after")]), batch_id=2)
    assert _texts(main)[("c4", 0)] == "after"


def test_branch_inherits_epoch_guard_from_base(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, branch="audit")
    # batch 0 was committed on main before the fork → skipped on branch
    rec = staged.merge(_events(spark, [(9, "c1", 0, "dup-epoch")]), batch_id=0)
    assert rec.skipped_as_committed
    assert _texts(staged)[("c1", 0)] == "base-a"


def test_publish_requires_main_at_branch_base(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, branch="audit")
    staged.merge(_events(spark, [(3, "c3", 0, "staged")]), batch_id=1)
    # simulate a manual CURRENT edit (operator error): publish must refuse
    import json, os

    ptr = os.path.join(root, "CURRENT")
    with open(ptr) as f:
        cur = json.load(f)
    with open(ptr, "w") as f:
        json.dump({"version": cur["version"] + 1000}, f)
    with pytest.raises(ConcurrentCommitError):
        main.publish("audit")


def test_retention_protects_branch_head_and_current(spark, seeded):
    root, main = seeded
    main.merge(_events(spark, [(3, "c3", 0, "second")]), batch_id=1)
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, branch="audit")
    staged.merge(_events(spark, [(4, "c4", 0, "staged-1")]), batch_id=2)
    staged.merge(_events(spark, [(5, "c5", 0, "staged-2")]), batch_id=3)

    main.expire_snapshots(keep_last=1)
    # main's CURRENT snapshot still readable even though branch manifests
    # are newer, and the branch head still readable for the audit
    assert _texts(main)[("c3", 0)] == "second"
    assert _texts(staged)[("c5", 0)] == "staged-2"
    # and publish still works afterwards
    main.publish("audit")
    assert _texts(ParquetSnapshotSink(spark, root))[("c4", 0)] == "staged-1"


def test_create_branch_twice_rejected(spark, seeded):
    _, main = seeded
    main.create_branch("audit")
    with pytest.raises(ValueError):
        main.create_branch("audit")
    main.drop_branch("audit")
    main.create_branch("audit")  # recreatable after drop


def test_branch_handle_without_branch_ref_raises(spark, seeded):
    root, _ = seeded
    ghost = ParquetSnapshotSink(spark, root, branch="nope")
    with pytest.raises(FileNotFoundError):
        ghost.read_table()
