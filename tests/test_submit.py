"""The literal north-rule invocation: `spark-submit --py-files
kgforge.zip` runs the full checkpointed pipeline with the repo absent
from the working directory — the packaging (tools/package.py) must
carry every module."""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    from kgforge.synth import write_fixture
    from tools.package import build

    zip_path = build(tmp_path / "kgforge.zip")
    fix = tmp_path / "fix"
    write_fixture(str(fix), n_pages=120, seed=7)
    out = tmp_path / "out"
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", str(zip_path),
            str(REPO / "kgforge" / "cli.py"), "run",
            "--pages", str(fix / "pages.parquet"),
            "--dict", str(fix / "concept_dict.parquet"),
            "--out", str(out), "--cpus", "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — only the zip provides kgforge
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    info = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert info["n_triples"] > 0
    assert {s["stage"] for s in info["stages"]} == {
        "extracted", "mentions", "candidates", "canon_mapping", "triples"
    }
    assert (out / "triples").is_dir()
