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
