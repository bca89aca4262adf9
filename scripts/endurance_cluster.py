"""Multi-executor endurance tail: the lifecycle loop across JVM
boundaries.

`scripts/endurance_tail.py` records the long single-JVM tail (16 waves,
~10^9 events); this wrapper reruns the SAME script — same code path,
same retention stack — via `spark-submit --py-files` onto a
``local-cluster`` master (separate executor JVMs, the package reaching
them only through the shipped zip), shorter (default 4 waves), so the
endurance evidence also covers real process boundaries: exchange data
over executor sockets, executor-local shuffle dirs, bloom/zone-map
sidecars read on remote executors, checkpoint/commit coordination from
a driver that shares no heap with its executors.

The submission is pinned with taskset to (executor cores + 1) CPUs so
idle host cores can't blur what a small cluster would see, mirroring
scripts/bench_cluster_scaling.py. Writes
BENCH/endurance_cluster_log.jsonl; scripts/endurance_report.py then
appends the multi-executor section to BENCH/endurance.md.

Usage: python scripts/endurance_cluster.py [waves] [conv_per_wave] [segs_per_wave]
Env:   ENDURANCE_CLUSTER (default "2,2,4096" = executors,cores,MB)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    waves = sys.argv[1] if len(sys.argv) > 1 else "4"
    conv = sys.argv[2] if len(sys.argv) > 2 else "500000"
    segs = sys.argv[3] if len(sys.argv) > 3 else "4"
    n_exec, cores, mb = (
        os.environ.get("ENDURANCE_CLUSTER", "2,2,4096").split(",")
    )
    total_cores = int(n_exec) * int(cores)

    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    work = os.path.join(tempfile.gettempdir(), "oec_endurance_cluster")
    zip_path = os.path.join(work, "oec_etl_spark.zip")
    os.makedirs(work, exist_ok=True)
    subprocess.run([sys.executable, os.path.join(REPO, "scripts", "package.py"), zip_path],
                   check=True, capture_output=True)

    env = os.environ | {
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
        "SPARK_LOCAL_DIRS": os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"),
        "ENDURANCE_MASTER": "FROM_SUBMIT",
    }
    cmd = [
        # executor cores + 1 driver core, like bench_cluster_scaling
        "taskset", "-c", f"0-{total_cores}",
        spark_submit,
        "--master", f"local-cluster[{n_exec},{cores},{mb}]",
        "--driver-memory", "8g",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.shuffle.partitions=32",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "endurance_tail.py"),
        waves, conv, segs, os.path.join(work, "run"),
        "endurance_cluster_log.jsonl",
    ]
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=work)
    print(f"endurance_cluster: exit {proc.returncode} in {time.time() - t0:.0f}s "
          f"(log: BENCH/endurance_cluster_log.jsonl)")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
