"""The spark-submit entrypoint (runner.main) end-to-end as a subprocess —
the deployment surface of north_rule's `spark-submit --py-files` clause."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from xema_spark.datagen import gen_assets, gen_documents


def test_runner_cli(spark, tmp_path):
    inp = str(tmp_path / "docs")
    assets = str(tmp_path / "assets")
    out = str(tmp_path / "out")
    gen_documents(spark, 500).write.parquet(inp)
    gen_assets(spark, 500).write.parquet(assets)

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                      "xema_spark", "runner.py"),
         "--input", inp, "--assets", assets, "--output", out, "--buckets", "8"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert metrics["n_rows"] == 500
    assert metrics["n_violations"] > 0
    assert metrics["dangling_refs"] > 0
    assert os.path.isdir(os.path.join(out, "verdicts"))
    assert os.path.isdir(os.path.join(out, "lineage"))


def test_spark_submit_py_files(spark, tmp_path):
    """The literal north_rule deployment shape: `spark-submit --py-files
    xema_spark.zip runner.py ...` with the entry script copied OUTSIDE the
    repo and cwd pointed away from it, so every `xema_spark.*` import must
    resolve from the shipped zip — proving the job is self-contained the
    way a real cluster submit requires."""
    import glob
    import shutil
    import zipfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "out")
    gen_documents(spark, 300).write.parquet(inp)

    zip_path = str(tmp_path / "xema_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in glob.glob(os.path.join(repo, "xema_spark", "*.py")):
            z.write(f, arcname=os.path.join("xema_spark", os.path.basename(f)))
    entry = str(tmp_path / "entry.py")
    shutil.copy(os.path.join(repo, "xema_spark", "runner.py"), entry)

    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path, entry,
         "--input", inp, "--output", out, "--buckets", "8"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert metrics["n_rows"] == 300
    assert os.path.isdir(os.path.join(out, "verdicts"))
    assert os.path.isdir(os.path.join(out, "lineage"))
