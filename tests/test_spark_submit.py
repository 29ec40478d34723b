"""End-to-end `spark-submit --py-files` evidence (north-rule deployment
surface): the driver script runs from OUTSIDE the repo with a clean cwd, so
the ONLY way the driver and the Python workers can import
searchenginer_spark is the shipped zip — exactly the cluster deployment."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER = """
import json
from searchenginer_spark import cli

cli.main(["gen-corpus", "--n", "300", "--out", {out!r}])
cli.main(["build-index", "--corpus", {out!r}, "--root", {root!r},
          "--docs-per-part", "64"])
cli.main(["query", "--root", {root!r}, "--q", "int return", "--k", "5"])
print("SPARK_SUBMIT_E2E_OK")
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_end_to_end(tmp_path):
    from searchenginer_spark.deploy import package_zip

    zip_path = package_zip()
    driver = tmp_path / "driver.py"
    driver.write_text(
        DRIVER.format(out=str(tmp_path / "corpus"), root=str(tmp_path / "idx"))
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "2"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(driver),
        ],
        cwd=str(tmp_path),  # clean cwd: repo not importable except via zip
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "SPARK_SUBMIT_E2E_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
    # the index really landed on disk (dynamic partition overwrite does not
    # emit a root _SUCCESS for the part-partitioned postings — check data)
    postings = tmp_path / "idx" / "postings"
    assert list(postings.glob("part=*/*.parquet")), sorted(postings.glob("*"))
