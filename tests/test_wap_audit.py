"""The A of write-audit-publish: machine-checked invariants gate the
branch publish. Each audit check gets a positive (clean table passes)
and a negative (corruption/violation is caught, publish refused, main
untouched) test; the corruption cases doctor the branch's files the
way a buggy writer would, since the engine itself refuses to produce
such states through its API.
"""

from __future__ import annotations

import json
import os

import pytest

from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.audit import AuditFailed, audit_snapshot, publish_audited
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {
                "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
                "role": role, "text": text, "tool": None, "ts": None,
                "source_file": f"s{seq}", "offset": seq,
            }
            for seq, op, conv, turn, role, text in rows
        ],
        CHANGE_SCHEMA,
    )


@pytest.fixture()
def seeded(spark, tmp_path):
    root = str(tmp_path / "table")
    main = ParquetSnapshotSink(spark, root, n_buckets=4)
    main.merge(
        _events(
            spark,
            [
                (1, "I", "c1", 0, "user", "base-a"),
                (2, "I", "c2", 0, "assistant", "base-b"),
                (3, "I", "c3", 0, "user", "base-c"),
            ],
        ),
        batch_id=0,
    )
    return root, main


def test_audit_clean_branch_counts_and_publishes(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, n_buckets=4, branch="audit")
    staged.merge(
        _events(
            spark,
            [
                (10, "I", "c4", 0, "user", "new-row"),
                (11, "U", "c1", 0, "user", "edited"),
                (12, "D", "c3", 0, "user", None),
            ],
        ),
        batch_id=1,
    )
    report, version = publish_audited(spark, root, "audit", n_buckets=4)
    assert report.ok
    assert (report.inserts, report.updates, report.deletes) == (1, 1, 1)
    assert report.delete_frac == pytest.approx(1 / 3)
    assert report.rows == 3 and report.dup_key_rows == 0 and report.null_key_rows == 0
    after = ParquetSnapshotSink(spark, root, n_buckets=4)
    assert after.load_manifest()["version"] == version
    texts = {r["conv_id"]: r["text"] for r in after.read_table().collect()}
    assert texts == {"c1": "edited", "c2": "base-b", "c4": "new-row"}


def test_audit_blocks_mass_delete(spark, seeded):
    root, main = seeded
    base_state = sorted(r["conv_id"] for r in main.read_table().collect())
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, n_buckets=4, branch="audit")
    staged.merge(
        _events(spark, [(10, "D", "c1", 0, "user", None), (11, "D", "c2", 0, "user", None)]),
        batch_id=1,
    )
    with pytest.raises(AuditFailed) as e:
        publish_audited(spark, root, "audit", n_buckets=4, max_delete_frac=0.5)
    assert e.value.report.delete_frac == pytest.approx(2 / 3)
    # main untouched, branch left for inspection, drop unblocks ingest
    assert sorted(r["conv_id"] for r in main.read_table().collect()) == base_state
    assert "audit" in main.branches()
    main.drop_branch("audit")
    main.merge(_events(spark, [(20, "I", "c9", 0, "user", "resumed")]), batch_id=1)
    assert any(r["conv_id"] == "c9" for r in main.read_table().collect())


def test_audit_expectations_fail_on_violation_and_null(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, n_buckets=4, branch="audit")
    staged.merge(
        _events(spark, [(10, "I", "c4", 0, "alien", None)]),  # bad role AND null text
        batch_id=1,
    )
    report = audit_snapshot(
        spark,
        root,
        branch="audit",
        n_buckets=4,
        expectations={
            "role_known": "role in ('user','assistant','tool','system')",
            "text_present": "text is not null",  # null predicate → violation
            "turn_nonneg": "turn_idx >= 0",  # holds everywhere
        },
    )
    assert not report.ok
    assert report.expectation_violations == {
        "role_known": 1,
        "text_present": 1,
        "turn_nonneg": 0,
    }
    with pytest.raises(AuditFailed):
        publish_audited(
            spark, root, "audit", n_buckets=4, expectations={"text_present": "text is not null"}
        )


def test_audit_detects_duplicate_keys_from_corrupt_file(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, n_buckets=4, branch="audit")
    staged.merge(_events(spark, [(10, "I", "c4", 0, "user", "fine")]), batch_id=1)
    # a buggy writer appends a second physical copy of an existing key
    # into the branch head's data dir, bypassing the merge
    man = staged.load_manifest()
    bdir = None
    for b, d in sorted(man["buckets"].items()):
        full = os.path.join(root, d, f"__bucket={int(b)}")
        if os.path.isdir(full):
            bdir = full
            break
    assert bdir is not None
    src = spark.read.parquet(bdir)
    one = spark.createDataFrame(src.limit(1).collect(), src.schema)
    one.write.mode("append").parquet(bdir)
    report = audit_snapshot(spark, root, branch="audit", n_buckets=4)
    assert report.dup_key_rows == 2
    assert not report.ok and "duplicated key" in report.failures[0]


def test_audit_detects_illegal_schema_change(spark, seeded):
    root, main = seeded
    main.create_branch("audit")
    staged = ParquetSnapshotSink(spark, root, n_buckets=4, branch="audit")
    staged.merge(_events(spark, [(10, "I", "c4", 0, "user", "x")]), batch_id=1)
    # simulate a writer that dropped the 'tool' column from the schema
    head = staged.load_manifest()
    head["schema"]["fields"] = [f for f in head["schema"]["fields"] if f["name"] != "tool"]
    mpath = os.path.join(root, "_manifests", f"manifest-{head['version']:06d}.json")
    with open(mpath, "w") as f:
        json.dump(head, f)
    report = audit_snapshot(spark, root, branch="audit", n_buckets=4)
    assert not report.schema_ok
    assert any("not a pure evolution" in msg for msg in report.failures)


def test_audit_main_without_base_runs_self_checks_only(spark, seeded):
    root, _ = seeded
    report = audit_snapshot(spark, root, n_buckets=4)
    assert report.ok and report.ref == "CURRENT"
    assert report.base_version is None and report.inserts is None


def test_cli_branch_audit_publish_roundtrip(spark, seeded, monkeypatch, capsys):
    root, _ = seeded
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    assert cli.main(["branch", "--target", root, "--name", "stage", "--buckets", "4"]) == 0
    staged = ParquetSnapshotSink(spark, root, n_buckets=4, branch="stage")
    staged.merge(_events(spark, [(10, "I", "c4", 0, "user", "via-cli")]), batch_id=1)

    assert cli.main(["audit", "--target", root, "--branch", "stage", "--buckets", "4"]) == 0
    rc = cli.main(
        ["publish", "--target", root, "--name", "stage", "--buckets", "4",
         "--expect", "role_known=role in ('user','assistant','tool','system')"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    published = json.loads(out[-1])
    assert published["ok"] and published["expectation_violations"] == {"role_known": 0}
    table = ParquetSnapshotSink(spark, root, n_buckets=4).read_table()
    assert any(r["conv_id"] == "c4" for r in table.collect())
    assert cli.main(["branches", "--target", root, "--buckets", "4"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {}
