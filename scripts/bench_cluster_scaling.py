"""Executor-based N→4N scaling evidence: spark-submit on local-cluster.

BASELINE.json's north rule asks for the job "run via spark-submit
--py-files on a multi-executor cluster at two cluster sizes (N and 4N
executors) with throughput scaling efficiency >=0.8". The sandbox has
no real cluster; `scripts/bench_scaling.py` evidences the criterion
with local[N] *threads*. This script is the stronger, more literal
form: the SAME replay submitted via `spark-submit --py-files` onto a
``local-cluster`` master — separate executor JVMs with their own heaps,
the package reaching them only through the shipped zip — at 2 and 8
executors (1 core each), i.e. an actual N→4N *executor-count* change
with everything else held fixed:

- identical input (one pre-generated change log, shared by both runs),
- per-executor resources constant (1 core / 3 GiB — on a real cluster
  each added executor brings its own memory; a fixed total heap would
  starve the big config),
- each submission pinned with taskset to exactly (executors + 1) CPUs
  (executor cores + one driver core), so idle host cores can't help
  the small config's GC/IO and blur the comparison,
- warm-JVM best-of-reps inside one submission (rep 0 = JIT/cache
  warm-up, excluded), because this host's bandwidth swings run to run.

Writes BENCH/cluster_scaling_latest.md (BENCH/BASELINE.md stays
hand-curated) and prints one JSON object.

Usage: python scripts/bench_cluster_scaling.py [reps-per-config]
Env: BENCH_CDC_CONV (default 1200000 conversations ~ 15M events),
     BENCH_CLUSTER_PAIR (default "2,8").
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_DRIVER = """
import json, shutil, sys, time
from pyspark.sql import SparkSession

# no .master() — spark-submit's --master local-cluster[...] must win
spark = SparkSession.builder.getOrCreate()

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.streaming.engine import replay_batch

changes, target, ckpt, reps = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
times = []
for i in range(reps):
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    replay_batch(spark, EngineConfig(
        changes_dir=changes, target_dir=target, checkpoint_dir=ckpt, n_buckets=32))
    times.append(round(time.time() - t0, 2))
    print("REP %d %.2fs" % (i, times[-1]), file=sys.stderr)
infos = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
print("RESULT " + json.dumps({"jvms": len(infos), "reps_sec": times}))
spark.stop()
"""


def submit(n_exec: int, zip_path: str, driver: str, changes: str,
           work: str, reps: int) -> dict:
    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = os.environ | {
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
        "SPARK_LOCAL_DIRS": os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"),
    }
    target = os.path.join(work, f"t{n_exec}")
    ckpt = os.path.join(work, f"c{n_exec}")
    cmd = [
        # executor cores + 1 driver core; inherited by the worker and
        # executor JVMs local-cluster forks
        "taskset", "-c", f"0-{n_exec}",
        spark_submit,
        "--master", f"local-cluster[{n_exec},1,3072]",
        "--driver-memory", "4g",
        "--conf", "spark.sql.session.timeZone=UTC",
        # fixed task granularity at BOTH cluster sizes — executors are
        # slots; tasks must stay small enough for a 3 GiB executor no
        # matter how few executors run them
        "--conf", "spark.sql.shuffle.partitions=32",
        "--py-files", zip_path,
        driver, changes, target, ckpt, str(reps),
    ]
    t0 = time.time()
    out = subprocess.run(cmd, env=env, cwd=work, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        for ext, text in (("out", out.stdout), ("err", out.stderr)):
            with open(os.path.join(work, f"fail{n_exec}.{ext}"), "w") as f:
                f.write(text)
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(
            f"spark-submit failed at {n_exec} executors (logs: {work}/fail{n_exec}.*)"
        )
    res = json.loads(next(l for l in out.stdout.splitlines() if l.startswith("RESULT ")).split(" ", 1)[1])
    timed = res["reps_sec"][1:] if len(res["reps_sec"]) > 1 else res["reps_sec"]
    res |= {"n_executors": n_exec, "best_sec": min(timed), "submit_wall_sec": round(time.time() - t0, 1)}
    return res


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_conv = int(os.environ.get("BENCH_CDC_CONV", "1200000"))
    lo, hi = (int(x) for x in os.environ.get("BENCH_CLUSTER_PAIR", "2,8").split(","))

    from oec_etl_spark.generate import GeneratorConfig, generate_changelog

    work = os.path.join(tempfile.gettempdir(), "oec_bench_cluster")
    os.makedirs(work, exist_ok=True)
    changes = os.path.join(work, "changes")
    meta = os.path.join(changes, "_meta.json")
    stats = json.load(open(meta)) if os.path.exists(meta) else None
    if stats is None or stats["config"]["n_conversations"] != n_conv:
        shutil.rmtree(changes, ignore_errors=True)
        # same knobs as scripts/bench_scaling.py for comparability
        stats = generate_changelog(GeneratorConfig(
            out_dir=changes, seed=42, n_conversations=n_conv,
            max_turns=12, update_ratio=0.8, delete_ratio=0.05, duplicate_rate=0.05,
            n_segments=32, n_hot=5, hot_frac=0.3,
        ))
    events = stats["events_written"]

    zip_path = os.path.join(work, "oec_etl_spark.zip")
    subprocess.run([sys.executable, os.path.join(REPO, "scripts", "package.py"), zip_path],
                   check=True, capture_output=True)
    driver = os.path.join(work, "driver.py")
    with open(driver, "w") as f:
        f.write(_DRIVER)

    runs = {n: submit(n, zip_path, driver, changes, work, reps) for n in (lo, hi)}
    rate = {n: round(events / r["best_sec"], 1) for n, r in runs.items()}
    eff = round((rate[hi] / rate[lo]) / (hi / lo), 3)
    result = {
        "mode": "spark-submit --py-files, local-cluster (separate executor JVMs)",
        "events": events,
        "executors": {n: {"jvms_seen": runs[n]["jvms"], "reps_sec": runs[n]["reps_sec"],
                          "best_sec": runs[n]["best_sec"], "events_per_sec": rate[n]}
                      for n in (lo, hi)},
        "scaling_efficiency": {f"{lo}to{hi}": eff},
    }
    print(json.dumps(result, indent=2))

    md = f"""# Executor-based scaling evidence (spark-submit + local-cluster)

The same CDC replay ({events:,} delivered change events, LWW MERGE into
a 32-bucket snapshot target) submitted via `spark-submit --py-files
oec_etl_spark.zip` onto a `local-cluster` master — separate executor
JVMs, package shipped only through the zip — at {lo} and {hi} executors
(1 core / 3 GiB each, per-executor resources constant, each submission
pinned to executors+1 CPUs). Warm-JVM best of {reps} (rep 0 = warm-up,
excluded; reps listed).

| executors | JVMs seen | reps (sec) | best sec | events/sec |
|---|---|---|---|---|
| {lo} | {runs[lo]['jvms']} | {runs[lo]['reps_sec']} | {runs[lo]['best_sec']} | {rate[lo]:,} |
| {hi} | {runs[hi]['jvms']} | {runs[hi]['reps_sec']} | {runs[hi]['best_sec']} | {rate[hi]:,} |

**Scaling efficiency {lo}→{hi} executors: {eff}** (criterion: ≥0.8 from N to 4N).

Reproduce: `python scripts/bench_cluster_scaling.py {reps}`.
"""
    with open(os.path.join(REPO, "BENCH", "cluster_scaling_latest.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
