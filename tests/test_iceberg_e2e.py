"""Conditional REAL-Iceberg integration (VERDICT r2 item 3): when an
iceberg-spark-runtime jar is discoverable the suite replays a 4-segment
I/U/D change log through IcebergMergeSink (real CREATE TABLE / MERGE
INTO / DDL in a hadoop catalog) and asserts table == materialize
oracle; without a jar it SKIPS VISIBLY instead of silently exercising
nothing. The sandbox ships no jar (no network — SURVEY.md §7.3 R1), so
here this records as a skip; drop a jar or set ICEBERG_SPARK_JAR and it
lights up, subprocess-isolated because Iceberg extensions must be set
before the JVM starts."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from iceberg_e2e import find_iceberg_jar  # noqa: E402

_JAR = find_iceberg_jar()
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    _JAR is None,
    reason="iceberg-spark-runtime jar not present (sandbox has no network); "
    "set ICEBERG_SPARK_JAR or drop the jar into pyspark/jars to enable",
)
def test_iceberg_merge_replay_equals_oracle(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "iceberg_e2e.py"), str(tmp_path)],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr[-3000:]}"
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["diff_rows"] == 0 and report["table_rows"] > 0


def test_jar_discovery_honors_env(tmp_path, monkeypatch):
    """find_iceberg_jar: explicit env var wins when it exists, is
    ignored when stale, and absence of any jar returns None (the skip
    path) rather than raising."""
    fake = tmp_path / "iceberg-spark-runtime-4.1_2.13-1.9.0.jar"
    fake.write_bytes(b"PK")
    monkeypatch.setenv("ICEBERG_SPARK_JAR", str(fake))
    assert find_iceberg_jar() == str(fake)
    monkeypatch.setenv("ICEBERG_SPARK_JAR", str(tmp_path / "missing.jar"))
    assert find_iceberg_jar() == _JAR  # falls through to the scan result
