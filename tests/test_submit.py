"""north_rule packaging: the engine ships as a spark-submit --py-files zip.

The job script runs from a cwd OUTSIDE the repo with the package resolvable
ONLY from the shipped zip — driver and executors both import it from
--py-files, which is exactly the multi-executor cluster deployment path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files_end_to_end(tmp_path):
    sys.path.insert(0, REPO)
    from open_finance_lakehouse_spark.session import package_zip

    zip_path = package_zip(str(tmp_path))
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.driver.memory=3g",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.driver.host=127.0.0.1",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"),
         "--workdir", str(tmp_path / "wh"), "--rows", "120"],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["clips"] == 120 and out["rows_after"] == 120
    assert out["snr_violations"] == 0 and out["parity_violations"] == 0
