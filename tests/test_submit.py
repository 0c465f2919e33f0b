"""spark-submit --py-files packaging smoke test (north-rule launch mode)."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

import pyspark


def test_spark_submit_pyfiles(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = tmp_path / "lamapi_spark.zip"
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(repo, "lamapi_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [submit, "--master", "local[4]", "--driver-memory", "6g",
         "--py-files", str(pkg_zip),
         os.path.join(repo, "tools", "submit_pipeline.py"),
         "--output", str(out_dir), "--fuzzy"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads([l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert result["triples_written"] > 0
    assert (out_dir / "triples").exists()


def test_spark_submit_incremental(tmp_path):
    """--incremental launch mode: first run processes the fixture's
    conversations, an identical re-run is a no-op (idempotence through
    the production entry point)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_zip = tmp_path / "lamapi_spark.zip"
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, _dirs, files in os.walk(os.path.join(repo, "lamapi_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out_dir = tmp_path / "out_inc"

    def run():
        proc = subprocess.run(
            [submit, "--master", "local[4]", "--driver-memory", "6g",
             "--py-files", str(pkg_zip),
             os.path.join(repo, "tools", "submit_pipeline.py"),
             "--output", str(out_dir), "--fuzzy", "--incremental",
             "--checkpoint", str(tmp_path / "ckpt")],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        return json.loads(
            [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])

    r1 = run()
    assert r1["new_convs"] > 0 and r1["new_triples"] > 0
    r2 = run()
    assert r2["new_convs"] == 0
    assert r2["skipped_convs"] == r1["new_convs"]
    assert r2["triples_total"] == r1["triples_total"]
