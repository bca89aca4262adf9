"""Per-file conv_id bloom filters (EngineConfig.key_bloom_bits).

Why range zone maps aren't enough (the gap under test): conv_ids are
hash-distributed, so with sub-bucket write fan-out every file's
[key_min, key_max] spans essentially the whole keyspace — range
pruning keeps all files exactly where fan-out multiplied them. The
bloom prunes by membership instead. Invariants pinned here:

- soundness: a bloom NEVER drops a file containing the key (every
  conversation's lookup equals the full-scan oracle);
- effectiveness: under fan-out, lookups open strictly fewer files
  than the bucket holds (range-only pruning keeps all of them);
- conservatism: tables written without blooms (or read by a sink
  configured without the knob) behave exactly as before;
- MOR deltas carry blooms too (every write funnels _write_store).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.generate import GeneratorConfig, generate_changelog
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink


def _gen(tmp, **kw):
    return generate_changelog(
        GeneratorConfig(out_dir=str(tmp / "changes"), **kw)
    )


def _cfg(tmp, **kw):
    return EngineConfig(
        changes_dir=str(tmp / "changes"),
        target_dir=str(tmp / "target"),
        checkpoint_dir=str(tmp / "ckpt"),
        **kw,
    )


def _oracle(spark, tmp):
    valid, _ = quarantine_split(
        spark.read.schema(CHANGE_SCHEMA).parquet(str(tmp / "changes") + "/*.parquet")
    )
    return materialize(valid)


def _sink(spark, tmp, **kw):
    return ParquetSnapshotSink(spark, str(tmp / "target"), **kw)


def test_bloom_prunes_fanout_files_and_never_drops_a_key(spark, tmp_path):
    _gen(tmp_path, n_conversations=60, max_turns=6, n_segments=2, seed=11)
    replay_batch(
        spark,
        _cfg(tmp_path, n_buckets=2, files_per_bucket=4, key_bloom_bits=4096),
    )
    sink = _sink(spark, tmp_path, n_buckets=2, files_per_bucket=4, key_bloom_bits=4096)
    oracle = _oracle(spark, tmp_path).cache()
    keys = [r[0] for r in oracle.select("conv_id").distinct().collect()]
    kept_total = files_total = 0
    for k in keys:
        got = {(r["turn_idx"], r["text"]) for r in sink.lookup(k).collect()}
        want = {
            (r["turn_idx"], r["text"])
            for r in oracle.filter(F.col("conv_id") == k).collect()
        }
        assert got == want, f"lookup({k}) diverged from oracle"
        kept, total = sink.last_lookup_files
        kept_total += kept
        files_total += total
    # fan-out wrote ~4 files per bucket with overlapping key ranges;
    # a conversation lives in exactly one sub-file, so the bloom must
    # prune well below "keep everything"
    assert files_total > 0 and kept_total < files_total, (kept_total, files_total)
    assert kept_total <= 0.6 * files_total, (kept_total, files_total)
    oracle.unpersist()


def test_bloom_absent_is_conservative_and_reader_knob_free(spark, tmp_path):
    _gen(tmp_path, n_conversations=30, max_turns=4, n_segments=1, seed=7)
    # writer WITHOUT blooms: sidecars carry no bitmaps, lookups keep all
    replay_batch(spark, _cfg(tmp_path, n_buckets=2, files_per_bucket=3))
    plain = _sink(spark, tmp_path, n_buckets=2, files_per_bucket=3)
    # no bitmap was harvested anywhere (range stats may still prune)
    import glob
    import json as _json

    for sp in glob.glob(str(tmp_path / "target") + "/**/_filestats.json", recursive=True):
        with open(sp) as f:
            assert not any("bloom" in ent for ent in _json.load(f).values())
    oracle = _oracle(spark, tmp_path)
    k = oracle.select("conv_id").first()[0]
    n_plain = plain.lookup(k).count()
    # reader WITH the knob set sees the same rows (probe hashes are
    # computed but no sidecar bitmap exists — conservative fallback)
    knobbed = _sink(
        spark, tmp_path, n_buckets=2, files_per_bucket=3, key_bloom_bits=1024
    )
    assert knobbed.lookup(k).count() == n_plain


def test_bloom_on_mor_deltas(spark, tmp_path):
    _gen(tmp_path, n_conversations=40, max_turns=5, n_segments=3, seed=23)
    replay_batch(
        spark,
        _cfg(
            tmp_path,
            n_buckets=2,
            table_mode="mor",
            files_per_bucket=2,
            key_bloom_bits=2048,
        ),
    )
    sink = _sink(
        spark,
        tmp_path,
        n_buckets=2,
        table_mode="mor",
        files_per_bucket=2,
        key_bloom_bits=2048,
    )
    oracle = _oracle(spark, tmp_path).cache()
    keys = [r[0] for r in oracle.select("conv_id").distinct().limit(12).collect()]
    for k in keys:
        got = {(r["turn_idx"], r["text"]) for r in sink.lookup(k).collect()}
        want = {
            (r["turn_idx"], r["text"])
            for r in oracle.filter(F.col("conv_id") == k).collect()
        }
        assert got == want
    oracle.unpersist()


def test_bloom_survives_compaction(spark, tmp_path):
    _gen(tmp_path, n_conversations=40, max_turns=5, n_segments=3, seed=5)
    replay_batch(
        spark,
        _cfg(
            tmp_path,
            n_buckets=2,
            table_mode="mor",
            files_per_bucket=3,
            key_bloom_bits=2048,
        ),
    )
    sink = _sink(
        spark,
        tmp_path,
        n_buckets=2,
        table_mode="mor",
        files_per_bucket=3,
        key_bloom_bits=2048,
    )
    sink.compact()
    oracle = _oracle(spark, tmp_path).cache()
    keys = [r[0] for r in oracle.select("conv_id").distinct().collect()]
    kept_total = files_total = 0
    for k in keys:
        got = {(r["turn_idx"], r["text"]) for r in sink.lookup(k).collect()}
        want = {
            (r["turn_idx"], r["text"])
            for r in oracle.filter(F.col("conv_id") == k).collect()
        }
        assert got == want
        kept, total = sink.last_lookup_files
        kept_total += kept
        files_total += total
    # compaction rewrote the fanned-out base: blooms re-harvested there
    assert kept_total < files_total, (kept_total, files_total)
    oracle.unpersist()


def test_lookup_many_equals_per_key_lookups_and_prunes(spark, tmp_path):
    _gen(tmp_path, n_conversations=60, max_turns=6, n_segments=2, seed=19)
    replay_batch(
        spark,
        _cfg(tmp_path, n_buckets=2, files_per_bucket=4, key_bloom_bits=4096),
    )
    sink = _sink(spark, tmp_path, n_buckets=2, files_per_bucket=4, key_bloom_bits=4096)
    oracle = _oracle(spark, tmp_path).cache()
    keys = sorted(r[0] for r in oracle.select("conv_id").distinct().collect())[:8]
    got = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in sink.lookup_many(keys).collect()
    }
    kept, total = sink.last_lookup_files
    want = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in oracle.filter(F.col("conv_id").isin(keys)).collect()
    }
    assert got == want
    assert 0 < kept < total  # blooms pruned within the touched buckets
    # empty and missing keys behave
    assert sink.lookup_many([]).count() == 0
    assert sink.lookup_many(["conv-nope"]).count() == 0


def test_lookup_many_on_mor_deltas(spark, tmp_path):
    _gen(tmp_path, n_conversations=40, max_turns=5, n_segments=3, seed=29)
    replay_batch(
        spark,
        _cfg(tmp_path, n_buckets=2, table_mode="mor", key_bloom_bits=2048),
    )
    sink = _sink(spark, tmp_path, n_buckets=2, table_mode="mor", key_bloom_bits=2048)
    oracle = _oracle(spark, tmp_path).cache()
    keys = sorted(r[0] for r in oracle.select("conv_id").distinct().collect())[:6]
    got = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in sink.lookup_many(keys).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in oracle.filter(F.col("conv_id").isin(keys)).collect()
    }
    assert got == want
    oracle.unpersist()


def test_lookup_cli(spark, tmp_path, monkeypatch, capsys):
    _gen(tmp_path, n_conversations=20, max_turns=4, n_segments=1, seed=3)
    replay_batch(spark, _cfg(tmp_path, n_buckets=2, key_bloom_bits=1024))
    from oec_etl_spark import cli, session

    monkeypatch.setattr(session, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    oracle = _oracle(spark, tmp_path)
    k1, k2 = sorted(r[0] for r in oracle.select("conv_id").distinct().collect())[:2]
    assert cli.main(["lookup", "--target", str(tmp_path / "target"),
                     "--buckets", "2", "--key", k1, "--key", k2]) == 0
    import json as _json

    out = [
        _json.loads(x) for x in capsys.readouterr().out.strip().splitlines()
    ]
    assert {r["conv_id"] for r in out} == {k1, k2}
    want = oracle.filter(F.col("conv_id").isin([k1, k2])).count()
    assert len(out) == want
