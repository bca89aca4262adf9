"""Long-lived MOR tail endurance run (the 10^10-tail evidence).

The scaling story for a CDC tail is not one big replay — it is ten
thousand micro-batches against a table that keeps growing. What decays
on a long tail, if anything does, is per-batch wall (read-amp from
accumulating deltas, manifest-chain growth, bloom/zone-map sidecar
cost) and what explodes is disk (superseded versions, un-reclaimed
TTL'd rows, the watched dir itself). This script runs that life cycle
end to end on one machine and records the trend, batch by batch:

- the upstream keeps producing: the change log is generated in
  deterministic WAVES (GeneratorConfig wave offsets — disjoint conv
  keyspace, strictly increasing seq, advancing event time), dropped
  into the watched dir between replay calls exactly like a live
  binlog;
- the consumer tails it with the PRODUCTION retention stack on:
  merge-on-read with in-loop minor compaction, event-time TTL,
  in-loop snapshot expiry, per-file key blooms, and in-loop archiving
  of committed segments (moved out of the watched dir; the script then
  purges the archive, standing in for cold-storage offload, so the
  run's disk footprint is the steady state, not the integral);
- a MAJOR compaction runs every `major_every` waves (the nightly
  rewrite a real deployment schedules) — the only step that reclaims
  TTL'd rows and superseded deltas from the base.

Per micro-batch it records rows/wall/ev-per-sec from the engine's own
lineage; per wave it records table bytes, file count, manifest length,
per-bucket read-amp (1 + deltas), archive volume, and a periodic full
table read. Output: BENCH/endurance_log.jsonl (one JSON line per batch
and per wave) + a summary line on stdout. BENCH/endurance.md is the
human write-up of one recorded run.

Usage:
  python scripts/endurance_tail.py [waves] [conv_per_wave] [segs_per_wave]
                                   [workdir] [log_name]
Defaults (16 waves x 5M conversations x 8 segments) replay ~1.0e9
events over 128 micro-batches in roughly an hour on 32 cores.

Env ENDURANCE_MASTER overrides the Spark master (default local[32]);
the sentinel value FROM_SUBMIT builds the session with a bare
getOrCreate() so `spark-submit --master local-cluster[...]` wins —
that is how scripts/endurance_cluster.py reruns this exact lifecycle
across separate executor JVMs (the multi-executor endurance evidence).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _nfiles(path: str, ext: str = ".parquet") -> int:
    return sum(
        len([f for f in files if f.endswith(ext)])
        for _root, _dirs, files in os.walk(path)
    )


def main() -> int:
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    conv_per_wave = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    segs_per_wave = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    work = sys.argv[4] if len(sys.argv) > 4 else "/tmp/oec_endurance"
    log_name = sys.argv[5] if len(sys.argv) > 5 else "endurance_log.jsonl"
    master = os.environ.get("ENDURANCE_MASTER", "local[32]")
    major_every = 4
    read_every = 4

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.session import get_spark
    from oec_etl_spark.streaming.engine import run_replay
    from oec_etl_spark.streaming.sink import ParquetSnapshotSink

    shutil.rmtree(work, ignore_errors=True)
    changes = os.path.join(work, "changes")
    target = os.path.join(work, "target")
    ckpt = os.path.join(work, "ckpt")
    archive = os.path.join(work, "archive")
    os.makedirs(archive, exist_ok=True)

    # Upper bound on one wave's event-time span (see generate.py: ts is
    # pair-index micro-seconds + jitter, deletes reach +7200 s): used as
    # the ts stride between waves and to size the TTL window.
    wave_span_us = conv_per_wave * 12 * 1_000_000 + 8_000_000_000
    ttl_seconds = 1.5 * wave_span_us / 1e6

    cfg = EngineConfig(
        changes_dir=changes,
        target_dir=target,
        checkpoint_dir=ckpt,
        n_buckets=32,
        max_files_per_trigger=1,  # one segment = one micro-batch
        table_mode="mor",
        minor_compact_after=6,
        ttl_seconds=ttl_seconds,
        ttl_advance_s=wave_span_us / 8 / 1e6,
        expire_keep_last=12,
        key_bloom_bits=16384,
        archive_dir=archive,
    )

    if master == "FROM_SUBMIT":
        # spark-submit's --master / --conf must win (local-cluster run)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.getOrCreate()
    else:
        spark = get_spark(master=master, shuffle_partitions=32)
    log_path = os.path.join(REPO, "BENCH", log_name)
    logf = open(log_path, "w")

    def emit(rec: dict) -> None:
        logf.write(json.dumps(rec) + "\n")
        logf.flush()

    emit({"kind": "run_config", "waves": waves, "conv_per_wave": conv_per_wave,
          "segs_per_wave": segs_per_wave, "ttl_seconds": ttl_seconds,
          "master": spark.sparkContext.master,
          "engine": {k: v for k, v in cfg.__dict__.items()
                     if isinstance(v, (int, float, str, bool, type(None)))}})

    seq_next = 0
    total_events = 0
    t_run0 = time.time()
    batch_walls: list[float] = []
    for w in range(waves):
        t0 = time.time()
        stats = generate_changelog(GeneratorConfig(
            out_dir=changes, seed=1000 + w,
            n_conversations=conv_per_wave, max_turns=12,
            update_ratio=0.8, delete_ratio=0.05, duplicate_rate=0.05,
            n_hot=5, hot_frac=0.3, n_segments=segs_per_wave,
            epoch1_fraction=0.4 if w == 0 else 0.0,
            segment_offset=w * segs_per_wave,
            seq_offset=seq_next,
            ts_offset_us=w * wave_span_us,
            conv_offset=w * conv_per_wave,
        ))
        seq_next += stats["distinct_seq"]
        gen_sec = time.time() - t0

        t0 = time.time()
        recs = run_replay(spark, cfg)
        replay_sec = time.time() - t0
        for r in recs:
            batch_walls.append(r.wall_sec)
            emit({"kind": "batch", "wave": w, "batch_id": r.batch_id,
                  "rows": r.rows_in_batch, "wall_sec": round(r.wall_sec, 3),
                  "ev_per_sec": round(r.rows_in_batch / max(r.wall_sec, 1e-9)),
                  "salted": r.salted})
        total_events += stats["events_written"]

        sink = ParquetSnapshotSink(spark, target, cfg.n_buckets,
                                   table_mode="mor")
        man = sink.load_manifest() or {}
        ramp = [1 + len(dd) for dd in man.get("deltas", {}).values()] or [1]
        wave_rec = {
            "kind": "wave", "wave": w,
            "events": stats["events_written"], "gen_sec": round(gen_sec, 1),
            "replay_sec": round(replay_sec, 1),
            "ev_per_sec": round(stats["events_written"] / replay_sec),
            "target_bytes": _du(target), "target_files": _nfiles(target),
            "manifest_versions": len(sink.history()),
            "readamp_max": max(ramp), "readamp_mean": round(sum(ramp) / len(ramp), 2),
            "watched_dir_files": len(glob.glob(os.path.join(changes, "*.parquet"))),
            "archive_bytes": _du(archive),
            "total_events": total_events,
        }

        # cold-storage offload stand-in: committed segments were MOVED
        # to the archive by the in-loop hook; purge them so the run's
        # disk footprint is the steady state.
        for f in glob.glob(os.path.join(archive, "*")):
            os.remove(f)

        if (w + 1) % major_every == 0:
            t0 = time.time()
            done = sink.compact()
            wave_rec["major_compact_sec"] = round(time.time() - t0, 1)
            wave_rec["major_compact_buckets"] = len(done)
        if (w + 1) % read_every == 0:
            t0 = time.time()
            live = sink.read_table().count()
            wave_rec["read_full_sec"] = round(time.time() - t0, 1)
            wave_rec["live_rows"] = live
        emit(wave_rec)
        print(json.dumps(wave_rec), flush=True)

    n = len(batch_walls)
    q = max(n // 4, 1)
    summary = {
        "kind": "summary", "batches": n, "total_events": total_events,
        "wall_sec": round(time.time() - t_run0, 1),
        "events_per_sec_overall": round(total_events / sum(batch_walls)),
        "batch_wall_first_quartile_mean": round(sum(batch_walls[:q]) / q, 2),
        "batch_wall_last_quartile_mean": round(sum(batch_walls[-q:]) / q, 2),
    }
    summary["decay_ratio_last_vs_first"] = round(
        summary["batch_wall_last_quartile_mean"]
        / summary["batch_wall_first_quartile_mean"], 3)
    emit(summary)
    print(json.dumps(summary), flush=True)
    spark.stop()
    logf.close()
    # Render BENCH/endurance.md from the log right here, so the committed
    # evidence can never lag the run (round-3 lesson: the run finished its
    # first wave only and the report was never generated).
    import subprocess

    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "endurance_report.py")],
        check=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
