"""Deployment-shape test: the north_rule ships the pipeline as
``spark-submit --py-files``. Run the real binary against the packaged zip
from a foreign cwd so a packaging regression (missing module, relative
import, cwd-dependent path) fails in CI, not on the cluster."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_pipeline(tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package.py")],
        check=True, capture_output=True,
    )
    out_dir = tmp_path / "kg_out"
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", os.path.join(ROOT, "dist", "kg.zip"),
            os.path.join(ROOT, "run_pipeline.py"),
            "--n-docs", "300", "--out", str(out_dir), "--master", "local[4]",
        ],
        cwd=str(tmp_path),  # NOT the repo root: the zip must be sufficient
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    stages = {s["stage"]: s for s in metrics["stages"]}
    assert stages["s0_normalize"]["rows"] == 300
    assert stages["s4_triples"]["rows"] > 0
    assert (out_dir / "s7_edges.manifest.jsonl").exists()
    assert (out_dir / "s8_nodes.manifest.jsonl").exists()
    assert stages["s8_nodes"]["rows"] > 0
