"""north_rule submission path: the engine must run via ``spark-submit
--py-files`` (no repo checkout on the cluster). This smoke test builds the
dist zip with tools/package_pyfiles.py and runs the full warcsum pipeline
in a CHILD spark-submit process whose only access to the package is the
--py-files artifact — a missing subpackage, a module-import-time
SparkSession dependency, or a non-zip-safe data access would all fail it.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """\
import tempfile

from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()

import warcsum_spark

# prove the import came from the --py-files artifact, not a checkout
assert "warcsum_spark.zip" in (warcsum_spark.__file__ or ""), warcsum_spark.__file__

from warcsum_spark.fixtures import write_warc_archives
from warcsum_spark.operators.stats import run_stats
from warcsum_spark.plans.pipeline import warcsum_pipeline

d = tempfile.mkdtemp()
write_warc_archives(d)
s = run_stats(warcsum_pipeline(spark, d))
print("SUBMIT_RESULT", s["total"], s["unique"], s["duplicates"])
spark.stop()
"""


def _spark_submit() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_runs_pipeline(tmp_path):
    zip_path = str(tmp_path / "warcsum_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "package_pyfiles.py"), zip_path],
        capture_output=True,
        text=True,
        check=True,
    )
    assert os.path.exists(zip_path), out.stdout + out.stderr

    job = tmp_path / "job.py"
    job.write_text(_JOB)

    env = os.environ.copy()
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--conf",
            "spark.ui.enabled=false",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            str(job),
        ],
        cwd=str(tmp_path),  # NOT the repo root — no fallback import path
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    # seed-42 fixture goldens (same numbers the /verify drive pins)
    assert "SUBMIT_RESULT 210 157 53" in proc.stdout, proc.stdout[-2000:]
