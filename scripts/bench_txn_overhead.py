"""Transaction-gate overhead on a one-shot replay (interleaved A/B).

Usage: python scripts/bench_txn_overhead.py [cores] [reps]

Same generated change log (tx_rate=0.5 — half the events grouped into
multi-event transactions), replayed in ONE JVM with the gate OFF and
ON in strict alternation `reps` times each; the non-transactional
reader selects only the plain change columns, so OFF is a true
control on identical input bytes. Reports per-config best (this host
is a noisy VM, ±2x run to run) and the ON/OFF ratio over bests.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_conv = int(os.environ.get("BENCH_TX_CONV", "300000"))
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")

    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.session import get_spark
    from oec_etl_spark.streaming.engine import replay_batch

    work = "/tmp/oec_bench_txn"
    meta = os.path.join(work, "changes", "_meta.json")
    stats = json.load(open(meta)) if os.path.exists(meta) else None
    if stats is None or stats["config"]["n_conversations"] != n_conv:
        shutil.rmtree(os.path.join(work, "changes"), ignore_errors=True)
        stats = generate_changelog(GeneratorConfig(
            out_dir=os.path.join(work, "changes"), seed=42,
            n_conversations=n_conv, n_segments=32, tx_rate=0.5,
        ))
    events = stats["events_written"]

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=max(8, cores))
    times: dict[str, list[float]] = {"off": [], "on": []}
    for _ in range(reps):
        for mode in ("off", "on"):
            for d in ("t", "c"):
                shutil.rmtree(os.path.join(work, d), ignore_errors=True)
            t0 = time.time()
            replay_batch(spark, EngineConfig(
                changes_dir=os.path.join(work, "changes"),
                target_dir=os.path.join(work, "t"),
                checkpoint_dir=os.path.join(work, "c"),
                n_buckets=32,
                transactional=(mode == "on"),
            ))
            times[mode].append(round(time.time() - t0, 2))
    best_off, best_on = min(times["off"]), min(times["on"])
    print(json.dumps({
        "events": events, "cores": cores,
        "off_secs": times["off"], "on_secs": times["on"],
        "best_off": best_off, "best_on": best_on,
        "overhead_ratio": round(best_on / best_off, 3),
        "on_events_per_sec": int(events / best_on),
    }))


if __name__ == "__main__":
    main()
