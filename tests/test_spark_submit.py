"""North-rule deployment shape, end to end: ``spark-submit --py-files
oec_etl_spark.zip`` on a MULTI-EXECUTOR master (local-cluster — separate
executor JVMs, each importing the package from the shipped artifact),
replaying a change log and byte-matching the batch oracle.

This is the closest a single host gets to the rule's "run via
spark-submit --py-files on a multi-executor cluster": code distribution,
serialization and executor-side imports all take the real path.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pyspark

from oec_etl_spark.generate import GeneratorConfig, generate_changelog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
from pyspark.sql import SparkSession

# no .master() here — spark-submit's --master must win
spark = SparkSession.builder.config("spark.sql.shuffle.partitions", "8").getOrCreate()

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.engine import quarantine_split, replay_batch
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

changes, target, ckpt = sys.argv[1], sys.argv[2], sys.argv[3]
cfg = EngineConfig(changes_dir=changes, target_dir=target, checkpoint_dir=ckpt, n_buckets=8)
replay_batch(spark, cfg)
table = ParquetSnapshotSink(spark, target, 8).read_table()
raw = spark.read.schema(CHANGE_SCHEMA).parquet(changes + "/*.parquet")
oracle = materialize(quarantine_split(raw)[0])
diff = table.exceptAll(oracle).count() + oracle.exceptAll(table).count()
execs = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
print("MASTER", spark.sparkContext.master)
print("EXECUTORS", len(execs))
print("DIFF_ROWS", diff)
spark.stop()
"""


def test_spark_submit_pyfiles_replay_multi_executor(tmp_path):
    # 1. deterministic --py-files artifact
    zip_path = str(tmp_path / "oec_etl_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"), zip_path],
        check=True, capture_output=True,
    )
    # 2. change log (generator is pure pyarrow — no Spark needed here)
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=55, n_conversations=60, n_segments=4)
    )
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = os.environ | {"PYSPARK_PYTHON": sys.executable, "PYSPARK_DRIVER_PYTHON": sys.executable}
    # 3. two executor JVMs, 1 core / 1200 MB each — the package reaches
    # them only through --py-files (cwd is tmp_path, so the repo checkout
    # is NOT importable by accident)
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,1,1200]",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            str(driver),
            str(tmp_path / "changes"), str(tmp_path / "target"), str(tmp_path / "ckpt"),
        ],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    lines = dict(
        line.split(" ", 1) for line in out.stdout.splitlines()
        if line.startswith(("MASTER", "EXECUTORS", "DIFF_ROWS"))
    )
    assert lines["MASTER"].startswith("local-cluster")
    assert int(lines["EXECUTORS"]) >= 2  # driver + at least one remote executor JVM
    assert lines["DIFF_ROWS"] == "0"


_WAP_DRIVER = """
import sys
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

spark = SparkSession.builder.config("spark.sql.shuffle.partitions", "8").getOrCreate()

from oec_etl_spark.config import EngineConfig
from oec_etl_spark.operators.lww import materialize
from oec_etl_spark.schemas import CHANGE_SCHEMA
from oec_etl_spark.streaming.audit import publish_audited
from oec_etl_spark.streaming.engine import quarantine_split, replay_batch
from oec_etl_spark.streaming.mview import MaterializedView
from oec_etl_spark.streaming.sink import ParquetSnapshotSink

a, b, c, target, ckpt, mvdir = sys.argv[1:7]

# backfill main from slice a, stage slice b on a WAP branch, audit+publish
replay_batch(spark, EngineConfig(changes_dir=a, target_dir=target, checkpoint_dir=ckpt, n_buckets=8))
main = ParquetSnapshotSink(spark, target, 8)
v0 = main.load_manifest()["version"]
main.create_branch("stage")
staged = ParquetSnapshotSink(spark, target, 8, branch="stage")
staged.merge(quarantine_split(spark.read.schema(CHANGE_SCHEMA).parquet(b + "/*.parquet"))[0], batch_id=1)
report, v1 = publish_audited(spark, target, "stage", n_buckets=8)
print("AUDIT_OK", report.ok and v1 > v0)

# materialized view: full build, then incremental after slice c merges
mv = MaterializedView(spark, mvdir, ["role"], sum_exprs={"chars": "length(coalesce(text,''))"})
r1 = mv.refresh(main)
main2 = ParquetSnapshotSink(spark, target, 8)
main2.merge(quarantine_split(spark.read.schema(CHANGE_SCHEMA).parquet(c + "/*.parquet"))[0], batch_id=2)
r2 = mv.refresh(main2)
print("MV_MODES", r1["mode"], r2["mode"])

table = ParquetSnapshotSink(spark, target, 8).read_table()
raw = spark.read.schema(CHANGE_SCHEMA).parquet(a + "/*.parquet", b + "/*.parquet", c + "/*.parquet")
oracle = materialize(quarantine_split(raw)[0])
print("DIFF_ROWS", table.exceptAll(oracle).count() + oracle.exceptAll(table).count())

base = table.withColumn("chars", F.expr("length(coalesce(text,''))"))
want = base.groupBy("role").agg(F.count(F.lit(1)).alias("n"), F.sum("chars").alias("chars"))
got = mv.read().select("role", "n", "chars")
want = want.select("role", "n", "chars")
print("MV_DIFF", got.exceptAll(want).count() + want.exceptAll(got).count())
spark.stop()
"""


def test_spark_submit_wap_and_mview_multi_executor(tmp_path):
    """The round-2 surfaces under the north rule's deployment shape:
    WAP stage→audit→publish and incremental view maintenance, all on a
    local-cluster master with the package arriving via --py-files."""
    import shutil

    zip_path = str(tmp_path / "oec_etl_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"), zip_path],
        check=True, capture_output=True,
    )
    generate_changelog(
        GeneratorConfig(out_dir=str(tmp_path / "changes"), seed=56, n_conversations=60, n_segments=6)
    )
    segs = sorted(
        f for f in os.listdir(tmp_path / "changes") if f.endswith(".parquet")
    )
    assert len(segs) == 6
    for i, name in enumerate(("a", "b", "c")):
        os.makedirs(tmp_path / name)
        for f in segs[2 * i: 2 * i + 2]:
            shutil.move(str(tmp_path / "changes" / f), str(tmp_path / name / f))
    driver = tmp_path / "driver.py"
    driver.write_text(_WAP_DRIVER)
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = os.environ | {"PYSPARK_PYTHON": sys.executable, "PYSPARK_DRIVER_PYTHON": sys.executable}
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,1,1200]",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            str(driver),
            str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c"),
            str(tmp_path / "target"), str(tmp_path / "ckpt"), str(tmp_path / "mv"),
        ],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, f"spark-submit failed:\n{out.stdout[-3000:]}\n{out.stderr[-3000:]}"
    lines = dict(
        line.split(" ", 1) for line in out.stdout.splitlines()
        if line.startswith(("AUDIT_OK", "MV_MODES", "DIFF_ROWS", "MV_DIFF"))
    )
    assert lines["AUDIT_OK"] == "True"
    assert lines["MV_MODES"] == "full incremental"
    assert lines["DIFF_ROWS"] == "0"
    assert lines["MV_DIFF"] == "0"
