"""Real spark-submit --py-files deployment test (north rule: the
pipeline runs via spark-submit with the engine shipped as a zip).

Zips the package, launches tools/submit_pipeline.py through an actual
spark-submit subprocess (package importable ONLY via --py-files — cwd is
a temp dir), checks outputs + lineage, then reruns with the same output
dir and asserts the snapshot stages resume instead of recomputing."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "osmquadtree_depreceated_spark"


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    return cand if os.path.exists(cand) else shutil.which("spark-submit")


def _zip_pkg(dest: str) -> str:
    zpath = os.path.join(dest, f"{PKG}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _run(submit, zpath, out_dir, cwd):
    script = os.path.join(REPO, "tools", "submit_pipeline.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.ui.showConsoleProgress=false",
         "--py-files", zpath, script,
         "/root/testdata/sf0.001", out_dir],
        capture_output=True, text=True, timeout=420, cwd=cwd, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(_spark_submit() is None,
                    reason="spark-submit not available")
def test_spark_submit_py_files_and_resume(tmp_path):
    zpath = _zip_pkg(str(tmp_path))
    out_dir = str(tmp_path / "job_out")
    got = _run(_spark_submit(), zpath, out_dir, str(tmp_path))
    assert got["resumed_stages"] == []
    assert got["counts"]["way_cells"] > 0
    assert got["counts"]["node_cells"] > 0
    assert got["lineage_files"] >= 3  # one per committed stage
    assert os.path.isdir(got["serving_path"])

    # second run against the SAME out_dir: stages resume from snapshots
    again = _run(_spark_submit(), zpath, out_dir, str(tmp_path))
    assert set(again["resumed_stages"]) >= {
        "way_bbox", "way_cells", "node_cells"}
    assert again["counts"] == got["counts"]
