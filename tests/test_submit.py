"""spark-submit --py-files launch-mode smoke (the north rule's production
launch shape): package_zip() is shipped as --py-files to a spark-submit
process whose driver script imports sparkrdf ONLY from the zip (cwd =
temp dir, no repo on sys.path), runs pages → extract → RPT, and prints
counts. Proves executors and driver resolve the package from --py-files."""

import os
import shutil
import subprocess
import sys

import pytest

DRIVER_SCRIPT = """
import json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import sparkrdf  # resolved from --py-files zip
from sparkrdf.pages import synthesize_pages
from sparkrdf.extract.pipeline import extract_triples
from sparkrdf.rpt import rpt_transform
pages = synthesize_pages(spark, 200)
rpt = rpt_transform(extract_triples(spark, pages), "Sub")
print("SUBMIT_RESULT " + json.dumps(
    {"edges": rpt["edges"].count(), "vertices": rpt["vertices"].count()}))
spark.stop()
"""


def _run_job(submit, zpath, tmp_path, run_id):
    """Launch sparkrdf/job.py itself via spark-submit (production shape)."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            submit, "--master", "local[2]", "--py-files", zpath,
            os.path.join(repo, "sparkrdf", "job.py"),
            "--synthesize", "200", "--ckpt", str(tmp_path / "ckpt"),
            "--out", str(tmp_path / "graph"), "--run-id", run_id,
        ],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("JOB_RESULT")]
    assert line, out.stdout[-2000:]
    return json.loads(line[0].split(" ", 1)[1])


def test_spark_submit_job_entrypoint_resumes_across_processes(tmp_path):
    """Two separate spark-submit processes, same --ckpt: the first computes
    every stage, the second resumes every stage with identical counts — the
    north rule's crash-resume story at the real process boundary."""
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparkrdf.session import package_zip

    zpath = package_zip(str(tmp_path / "sparkrdf.zip"))
    r1 = _run_job(submit, zpath, tmp_path, "boot")
    assert r1["triples"] > 0 and r1["edges"] > 0
    assert all(s == "computed" for s in r1["stages"].values()), r1

    r2 = _run_job(submit, zpath, tmp_path, "again")
    assert all(s == "resumed" for s in r2["stages"].values()), r2
    assert (r2["triples"], r2["vertices"], r2["edges"]) == (
        r1["triples"], r1["vertices"], r1["edges"]
    )


def test_spark_submit_py_files(tmp_path):
    submit = shutil.which("spark-submit")
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparkrdf.session import package_zip

    zpath = package_zip(str(tmp_path / "sparkrdf.zip"))
    script = tmp_path / "driver.py"
    script.write_text(DRIVER_SCRIPT)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [submit, "--master", "local[2]", "--py-files", zpath, str(script)],
        capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    line = [ln for ln in out.stdout.splitlines() if ln.startswith("SUBMIT_RESULT")]
    assert line, out.stdout[-2000:]
    res = json.loads(line[0].split(" ", 1)[1])
    assert res["edges"] > 0 and res["vertices"] > 0
