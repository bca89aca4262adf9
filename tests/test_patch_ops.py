"""Column-level partial updates (op 'P') — Debezium-style patch events.

A patch sets only the payload columns it carries non-null; full rows
(I/U/D) define every column. Per column the latest DEFINING row under
the LWW order wins; existence comes from full rows only (a patch never
creates, deletes, or resurrects a row). Patches on unknown or deleted
keys are dropped and counted in lineage (`rows_patch_dropped`).

Contract note (documented in lww_patch_combine): patch resolution is
materialized at merge time — the patched row becomes a full image at
the patch's (ts, seq). A full row arriving in a LATER batch with an
OLDER ts than an applied patch loses entirely, exactly as it would
against any full row at the patch's position.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _ts(h, m=0):
    return datetime(2024, 1, 1 + h // 24, h % 24, m, tzinfo=timezone.utc)


def _ev(conv, turn, seq, ts, op="U", role="user", text="orig", tool=None):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": role, "text": text, "tool": tool, "ts": ts,
        "source_file": "s", "offset": seq,
    }


def _merge(spark, sink, rows, batch_id):
    valid, _ = quarantine_split(spark.createDataFrame(rows, CHANGE_SCHEMA))
    return sink.merge(valid, batch_id=batch_id)


def _state(sink):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in sink.read_table().collect()
    }


BASE = [
    _ev("c1", 0, 1, _ts(1)),
    _ev("c1", 1, 2, _ts(1), text="t1", tool="bash"),
    _ev("c2", 0, 3, _ts(1)),
    _ev("c3", 0, 4, _ts(1)),
    _ev("c3", 0, 5, _ts(2), op="D"),
]

PATCHES = [
    _ev("c1", 0, 10, _ts(3), op="P", role=None, text="patched", tool=None),
    _ev("c1", 1, 11, _ts(3), op="P", role="assistant", text=None, tool=None),
    _ev("c9", 0, 12, _ts(3), op="P", text="orphan"),   # unknown key
    _ev("c3", 0, 13, _ts(3), op="P", text="zombie"),   # deleted key
    _ev("c2", 0, 14, _ts(0), op="P", text="stale"),    # older than stored
]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_semantics(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, BASE, 0)
    rec = _merge(spark, sink, PATCHES, 1)

    rows = _state(sink)
    # set one column, keep the rest
    assert rows[("c1", 0)] == ("user", "patched", None)
    # a null column in the patch does NOT null the stored value
    assert rows[("c1", 1)] == ("assistant", "t1", "bash")
    # a patch older than the stored row loses per-column
    assert rows[("c2", 0)] == ("user", "orig", None)
    # no resurrection, no creation
    assert ("c3", 0) not in rows and ("c9", 0) not in rows
    assert rec.rows_patch == 5
    assert rec.rows_patch_dropped == 2  # orphan + on-deleted


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_patch_redelivery_is_idempotent(spark, tmp_path, mode):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=4, table_mode=mode)
    _merge(spark, sink, BASE, 0)
    _merge(spark, sink, PATCHES, 1)
    before = _state(sink)
    _merge(spark, sink, PATCHES, 2)  # at-least-once redelivery, new epoch
    assert _state(sink) == before


def test_full_row_in_same_batch_interleaves_per_column(spark, tmp_path):
    """U@ts2 and P@ts3 in ONE batch: the patch column comes from the
    patch, every other column from the (older) full row."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("c1", 0, 1, _ts(1), role="user", text="v1", tool="a")], 0)
    batch = [
        _ev("c1", 0, 2, _ts(2), role="system", text="v2", tool="b"),
        _ev("c1", 0, 3, _ts(3), op="P", role=None, text="v3", tool=None),
    ]
    _merge(spark, sink, batch, 1)
    assert _state(sink)[("c1", 0)] == ("system", "v3", "b")


def test_full_row_after_patch_wins_if_newer(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("c1", 0, 1, _ts(1))], 0)
    _merge(spark, sink, [_ev("c1", 0, 2, _ts(2), op="P", text="patched")], 1)
    _merge(spark, sink, [_ev("c1", 0, 3, _ts(5), role="x", text="full", tool="y")], 2)
    assert _state(sink)[("c1", 0)] == ("x", "full", "y")


def test_two_patches_different_columns_both_apply(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("c1", 0, 1, _ts(1))], 0)
    _merge(spark, sink, [
        _ev("c1", 0, 2, _ts(2), op="P", role=None, text="tx", tool=None),
        _ev("c1", 0, 3, _ts(3), op="P", role="tool", text=None, tool="grep"),
    ], 1)
    assert _state(sink)[("c1", 0)] == ("tool", "tx", "grep")


def test_conflicting_patches_latest_wins_per_column(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [_ev("c1", 0, 1, _ts(1))], 0)
    _merge(spark, sink, [
        _ev("c1", 0, 2, _ts(3), op="P", role=None, text="late", tool=None),
        _ev("c1", 0, 3, _ts(2), op="P", role=None, text="early", tool="t2"),
    ], 1)
    # text from ts3 patch, tool from ts2 patch (only definer)
    assert _state(sink)[("c1", 0)] == ("user", "late", "t2")


def test_patch_insert_then_patch_same_batch(spark, tmp_path):
    """A brand-new key's I and a later P land in the same micro-batch."""
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    _merge(spark, sink, [
        _ev("n1", 0, 1, _ts(1), op="I", text="first"),
        _ev("n1", 0, 2, _ts(2), op="P", role="assistant", text=None),
    ], 0)
    assert _state(sink)[("n1", 0)] == ("assistant", "first", None)


def test_patch_only_batch_on_empty_table_is_all_dropped(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2)
    rec = _merge(spark, sink, [_ev("c1", 0, 1, _ts(1), op="P", text="x")], 0)
    assert rec.rows_patch == 1 and rec.rows_patch_dropped == 1
    assert sink.read_table().count() == 0
    # the table stays fully usable afterwards
    _merge(spark, sink, [_ev("c1", 0, 2, _ts(2))], 1)
    assert sink.read_table().count() == 1


def test_mor_compaction_preserves_patched_state(spark, tmp_path):
    sink = ParquetSnapshotSink(spark, str(tmp_path / "t"), n_buckets=2, table_mode="mor")
    _merge(spark, sink, BASE, 0)
    _merge(spark, sink, PATCHES, 1)
    before = _state(sink)
    sink.compact()
    assert not any(dd for dd in sink.load_manifest().get("deltas", {}).values())
    assert _state(sink) == before


def test_quarantine_constraints_tolerate_unset_patch_columns(spark, tmp_path):
    rows = [
        _ev("c1", 0, 1, _ts(1), op="P", role=None, text="ok", tool=None),
        _ev("c1", 1, 2, _ts(1), op="P", role="nonsense", text=None, tool=None),
        _ev("c1", 2, 3, _ts(1), op="U", role=None, text="full-null-role", tool=None),
    ]
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    valid, rejected = quarantine_split(
        df, constraints={"role_known": "role in ('user','assistant','system','tool')"}
    )
    ok = {(r["conv_id"], r["turn_idx"]) for r in valid.collect()}
    bad = {(r["conv_id"], r["turn_idx"]): r["__reject"] for r in rejected.collect()}
    assert ("c1", 0) in ok              # patch doesn't set role → NULL tolerated
    assert bad[("c1", 1)] == "role_known"  # patch sets a bad role → definite FALSE
    assert bad[("c1", 2)] == "role_known"  # full row with NULL role still rejected


def test_random_history_matches_sequential_oracle(spark, tmp_path):
    """Events applied per key in (ts, seq) order by a trivial Python
    fold must equal the engine's state, across arbitrary batch splits
    that respect the log order."""
    rng = random.Random(42)
    events, seq = [], 0
    for step in range(120):
        conv = f"c{rng.randrange(6)}"
        turn = rng.randrange(3)
        seq += 1
        op = rng.choices(["I", "U", "D", "P"], weights=[2, 4, 1, 5])[0]
        if op == "P":
            events.append(_ev(conv, turn, seq, _ts(step), op="P",
                              role=rng.choice([None, "assistant", "tool"]),
                              text=rng.choice([None, f"t{seq}"]),
                              tool=rng.choice([None, f"x{seq}"])))
        elif op == "D":
            events.append(_ev(conv, turn, seq, _ts(step), op="D",
                              role=None, text=None, tool=None))
        else:
            events.append(_ev(conv, turn, seq, _ts(step), op=op,
                              role="user", text=f"t{seq}", tool=rng.choice([None, "b"])))

    # sequential oracle
    state: dict = {}
    for e in events:  # already in (ts, seq) order
        k = (e["conv_id"], e["turn_idx"])
        if e["op"] in ("I", "U"):
            state[k] = (e["role"], e["text"], e["tool"])
        elif e["op"] == "D":
            state.pop(k, None)
        elif k in state:  # P on a live row
            old = state[k]
            new = tuple(
                e[c] if e[c] is not None else old[i]
                for i, c in enumerate(("role", "text", "tool"))
            )
            state[k] = new

    for mode in ("cow", "mor"):
        sink = ParquetSnapshotSink(spark, str(tmp_path / mode), n_buckets=4, table_mode=mode)
        cuts = sorted(rng.sample(range(1, len(events)), 3))
        parts = [events[a:b] for a, b in zip([0, *cuts], [*cuts, len(events)])]
        for i, part in enumerate(parts):
            _merge(spark, sink, part, i)
        assert _state(sink) == state, mode


def test_streaming_replay_with_patches_matches_single_batch(spark, tmp_path):
    """E2E: a generated change log containing op='P' events flows
    through readStream → quarantine → merge across micro-batches and
    lands identically to ONE merge of the whole log. disorder_window=0
    keeps delivery in log order — the documented contract is that a
    patch materializes at apply time, so only in-order logs are
    batch-split invariant (duplicates remain: redelivered events must
    still be absorbed)."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.streaming.engine import run_replay

    stats = generate_changelog(GeneratorConfig(
        out_dir=str(tmp_path / "changes"), seed=11, n_conversations=60,
        patch_ratio=0.4, disorder_window=0, duplicate_rate=0.05, n_segments=5,
    ))
    assert stats["patches"] > 0

    cfg = EngineConfig(
        changes_dir=str(tmp_path / "changes"), target_dir=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=4, max_files_per_trigger=1,
    )
    recs = run_replay(spark, cfg)
    assert len(recs) >= 5
    assert sum(r.rows_patch for r in recs) >= stats["patches"]

    streamed = ParquetSnapshotSink(spark, cfg.target_dir, 4)

    oneshot = ParquetSnapshotSink(spark, str(tmp_path / "one"), n_buckets=4)
    log = (
        spark.read.schema(CHANGE_SCHEMA)
        .parquet(str(tmp_path / "changes") + "/*.parquet")
        .orderBy("seq")
    )
    valid, _ = quarantine_split(log)
    oneshot.merge(valid, batch_id=0)

    a = sorted(map(tuple, streamed.read_table().collect()))
    b = sorted(map(tuple, oneshot.read_table().collect()))
    assert a == b and len(a) > 0

    # the patch-aware one-shot oracle (what `cli verify` runs) agrees too
    from oec_etl_spark.operators.lww import materialize

    cols = sorted(streamed.read_table().columns)
    oracle = materialize(valid).select(*cols)
    got = streamed.read_table().select(*cols)
    assert got.exceptAll(oracle).count() == 0 and oracle.exceptAll(got).count() == 0
