"""Conversation assembly: the per-turn text-equality invariant lifted
to whole transcripts — ordered turn arrays must round-trip exactly to
the snapshot rows and match a DuckDB ORDER BY oracle."""

from __future__ import annotations

import duckdb
import pytest

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.transcripts import assemble_conversations, transcript_text
from oec_etl_spark.streaming.engine import run_replay
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


@pytest.fixture(scope="module")
def cdc_table(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("transcripts")
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp / "changes"), seed=71,
                        n_conversations=40, n_segments=4, update_ratio=1.5)
    )
    cfg = EngineConfig(changes_dir=str(tmp / "changes"), target_dir=str(tmp / "t"),
                       checkpoint_dir=str(tmp / "c"), n_buckets=8)
    run_replay(spark, cfg)
    return ParquetSnapshotSink(spark, cfg.target_dir, 8).read_table().cache()


def test_assembly_matches_duckdb_order_by_oracle(spark, cdc_table):
    got = {
        r["conv_id"]: [(t["turn_idx"], t["role"], t["text"]) for t in r["turns"]]
        for r in assemble_conversations(cdc_table).collect()
    }
    con = duckdb.connect()
    con.register("snapshot", cdc_table.toPandas())
    want_rows = con.sql(
        """
        SELECT conv_id,
               list(ROW(turn_idx, role, text) ORDER BY turn_idx) AS turns
        FROM snapshot GROUP BY conv_id
        """
    ).fetchall()
    want = {cid: [tuple(t) for t in turns] for cid, turns in want_rows}
    assert got == want


def test_assembly_roundtrips_every_turn(spark, cdc_table):
    """Exploding the assembled arrays reproduces the snapshot exactly —
    no turn lost, duplicated, or reordered (per-turn text equality)."""
    from pyspark.sql import functions as F

    assembled = assemble_conversations(cdc_table)
    back = assembled.select(
        "conv_id", F.explode("turns").alias("t")
    ).select("conv_id", "t.turn_idx", "t.role", "t.text", "t.tool", "t.ts")
    orig = cdc_table.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert back.exceptAll(orig).count() == 0 and orig.exceptAll(back).count() == 0
    # and ordering inside each array is strictly increasing turn_idx
    bad = assembled.select(
        F.exists(
            F.zip_with(
                F.col("turns"),
                F.slice("turns", 2, F.size("turns") - 1),
                lambda a, b: a["turn_idx"] >= b["turn_idx"],
            ),
            lambda x: x,
        ).alias("disordered")
    ).filter("disordered").count()
    assert bad == 0


def test_transcript_text_renders_in_turn_order(spark, cdc_table):
    one = (
        transcript_text(assemble_conversations(cdc_table))
        .orderBy("conv_id").limit(1).collect()[0]
    )
    lines = one["transcript"].split("\n")
    assert len(lines) == one["n_turns"]
    turns = one["turns"]
    assert lines[0].startswith(turns[0]["role"] + ": ")
    assert lines[-1].startswith(turns[-1]["role"] + ": ")
