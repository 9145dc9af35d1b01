"""Checkpointed-job layer: resume correctness, lineage invalidation,
per-partition metrics (mirrors the reference's slowRunWithHDFSCache
_SUCCESS-gated reuse, SparkPlanner.scala:291-327)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql import functions as F


CALLS = {"n": 0}


def _make_job(spark, root):
    from openmldb_spark.jobs import CheckpointedJob

    job = CheckpointedJob(spark, root, "j1")

    def s_base(s):
        CALLS["n"] += 1
        return s.range(100).withColumn("v", F.col("id") * 2)

    def s_agg(s, base):
        CALLS["n"] += 1
        return base.groupBy((F.col("id") % 10).alias("k")) \
                   .agg(F.sum("v").alias("sv"))

    job.stage("base", s_base)
    job.stage("agg", s_agg, deps=["base"])
    return job


def test_resume_skips_done_stages(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    CALLS["n"] = 0
    out1 = _make_job(spark, root).run()["agg"].toPandas() \
        .sort_values("k").reset_index(drop=True)
    assert CALLS["n"] == 2

    # fresh job object, same checkpoint dir: nothing recomputes
    out2 = _make_job(spark, root).run()["agg"].toPandas() \
        .sort_values("k").reset_index(drop=True)
    assert CALLS["n"] == 2
    assert out1.equals(out2)

    # deleting a downstream stage recomputes only it
    shutil.rmtree(os.path.join(root, "j1", "agg"))
    out3 = _make_job(spark, root).run()["agg"].toPandas() \
        .sort_values("k").reset_index(drop=True)
    assert CALLS["n"] == 3
    assert out1.equals(out3)

    # resume=False recomputes everything
    _make_job(spark, root).run(resume=False)
    assert CALLS["n"] == 5


def test_manifest_lineage_and_metrics(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    job = _make_job(spark, root)
    job.run()
    m = job.manifest("agg")
    assert m["stage"] == "agg"
    assert list(m["deps"]) == ["base"]
    assert m["n_rows"] == 10
    assert m["n_files"] >= 1
    assert sum(p["rows"] for p in m["partitions"]) == 10
    assert m["wall_s"] >= 0
    assert job.lineage() == {"base": [], "agg": ["base"]}
    # _SUCCESS gate present
    assert os.path.exists(os.path.join(root, "j1", "agg", "data",
                                       "_SUCCESS"))


def test_upstream_edit_invalidates_downstream(spark, tmp_path):
    """A changed dep fingerprint must invalidate downstream stages."""
    from openmldb_spark.jobs import CheckpointedJob

    root = str(tmp_path / "ckpt")

    def build(extra_stage_name):
        job = CheckpointedJob(spark, root, "j2")
        job.stage(extra_stage_name, lambda s: s.range(10))
        job.stage("down", lambda s, b: b.select(F.sum("id").alias("s")),
                  deps=[extra_stage_name])
        return job

    build("a").run()
    m1 = json.load(open(os.path.join(root, "j2", "down", "manifest.json")))
    # same DAG with a renamed upstream → new fingerprint → recompute
    build("b").run()
    m2 = json.load(open(os.path.join(root, "j2", "down", "manifest.json")))
    assert m1["fingerprint"] != m2["fingerprint"]


def test_submit_job_end_to_end(spark, tmp_path):
    """The spark-submit entrypoint body runs on real testdata, resumably,
    with zero temporal leakage."""
    from openmldb_spark.jobs.submit_job import build

    out = build(spark, "/root/testdata/sf0.001/events.parquet",
                str(tmp_path / "ck"), str(tmp_path / "out"))
    pdf = out.toPandas()
    assert len(pdf) == 1000
    leak = out.filter(F.col("ts_r") > F.col("ts")).count()
    assert leak == 0
    # resumed run reads checkpoints and matches
    out2 = build(spark, "/root/testdata/sf0.001/events.parquet",
                 str(tmp_path / "ck"), str(tmp_path / "out2"))
    a = pdf.sort_values("event_id").reset_index(drop=True)
    b = out2.toPandas().sort_values("event_id").reset_index(drop=True)
    assert a.equals(b)


def test_code_edit_invalidates_stage_and_downstream(spark, tmp_path):
    """Editing a stage FUNCTION under resume=True recomputes that stage
    and its downstream (round-1 advisory: topology-only fingerprints
    served stale results after code edits)."""
    from openmldb_spark.jobs import CheckpointedJob

    root = str(tmp_path / "ckpt")

    def build(mult):
        job = CheckpointedJob(spark, root, "j3")
        job.stage("src", lambda s: s.range(5))
        job.stage("feat",
                  lambda s, b: b.select((F.col("id") * mult).alias("v")),
                  deps=["src"])
        job.stage("agg", lambda s, f: f.select(F.sum("v").alias("t")),
                  deps=["feat"])
        return job

    out1 = build(1).run(resume=True)
    assert out1["agg"].collect()[0]["t"] == 10
    # identical rebuild: everything skips (fingerprints stable)
    m_feat1 = json.load(
        open(os.path.join(root, "j3", "feat", "manifest.json")))
    build(1).run(resume=True)
    m_feat1b = json.load(
        open(os.path.join(root, "j3", "feat", "manifest.json")))
    assert m_feat1["finished_at"] == m_feat1b["finished_at"]
    # change the captured multiplier: feat AND agg recompute
    out2 = build(3).run(resume=True)
    assert out2["agg"].collect()[0]["t"] == 30


def test_external_input_refresh_invalidates(spark, tmp_path):
    """Refreshing a declared external input path invalidates the stage."""
    from openmldb_spark.jobs import CheckpointedJob

    root = str(tmp_path / "ckpt")
    src_path = str(tmp_path / "src.parquet")
    spark.range(4).write.mode("overwrite").parquet(src_path)

    def build():
        job = CheckpointedJob(spark, root, "j4")
        job.stage("load", lambda s: s.read.parquet(src_path),
                  inputs=[src_path])
        job.stage("agg", lambda s, d: d.select(F.sum("id").alias("t")),
                  deps=["load"])
        return job

    out1 = build().run(resume=True)
    assert out1["agg"].collect()[0]["t"] == 6
    import time as _t
    _t.sleep(0.05)
    spark.range(10).write.mode("overwrite").parquet(src_path)
    out2 = build().run(resume=True)
    assert out2["agg"].collect()[0]["t"] == 45


def test_spark_submit_py_files_real_subprocess(tmp_path):
    """The north-rule deployment shape, literally: package the library,
    run ``spark-submit --py-files pkg.zip jobs/submit_job.py`` as a real
    subprocess (separate JVM, code imported from the zip), and check the
    feature output lands with _SUCCESS."""
    import shutil
    import subprocess
    import sys
    import zipfile
    from pathlib import Path

    import pyspark

    submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if not submit.exists():                      # pragma: no cover
        pytest.skip("no spark-submit in this pyspark install")
    repo = Path(__file__).resolve().parents[1]
    pkg = tmp_path / "pkg.zip"
    with zipfile.ZipFile(pkg, "w") as z:
        for p in (repo / "openmldb_spark").rglob("*.py"):
            z.write(p, p.relative_to(repo))
    out = tmp_path / "features"
    env = dict(__import__("os").environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [str(submit), "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", str(pkg),
         str(repo / "openmldb_spark" / "jobs" / "submit_job.py"),
         "--input", "/root/testdata/sf0.001/events.parquet",
         "--checkpoint", str(tmp_path / "ckpt"),
         "--output", str(out)],
        capture_output=True, text=True, timeout=360, env=env,
        cwd=str(tmp_path))                       # NOT the repo: the zip
    assert r.returncode == 0, r.stderr[-3000:]   # must provide the pkg
    assert (out / "_SUCCESS").exists()
    files = list(out.glob("*.parquet"))
    assert files, "no parquet output written"
