"""North-rule launch path: the pipeline runs via `spark-submit --py-files`
with the dedup package resolved FROM THE SHIPPED ZIP (the job script is
copied to a temp dir whose parent contains no `dedup/`, so the only way the
import succeeds is the --py-files archive — on driver and executors both)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH or in the pyspark dist")
    sys.path.insert(0, REPO)
    from dedup import synth
    from dedup.deploy import package_zip

    rows = synth.generate(200, seed=17)
    inp = str(tmp_path / "images.parquet")
    pq.write_table(synth.to_arrow(rows), inp)
    job = tmp_path / "jobs" / "dedupe.py"
    job.parent.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "dedupe.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source of dedup/*
    out = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", package_zip(),
            str(job),
            "--input", inp,
            "--warehouse", str(tmp_path / "wh"),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = next(ln for ln in out.stdout.splitlines() if ln.startswith("{"))
    res = json.loads(line)
    assert res["assignments"] == 200
    assert 0 < res["clusters"] < 200  # dup families actually merged
    # resumability through the same entry: second run skips completed stages
    out2 = subprocess.run(
        [
            submit, "--master", "local[4]", "--py-files", package_zip(), str(job),
            "--input", inp, "--warehouse", str(tmp_path / "wh"),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert out2.returncode == 0, out2.stderr[-3000:]
    res2 = json.loads(next(ln for ln in out2.stdout.splitlines() if ln.startswith("{")))
    assert res2["assignments"] == 200
    assert res2["wall_sec"] < res["wall_sec"]  # resume skipped the stages


@pytest.mark.slow
def test_spark_submit_stream_job(tmp_path):
    """The streaming entry launches the same way: drain-and-exit via
    spark-submit --py-files, with the dedup package resolved only from the
    shipped zip (foreachBatch closures run on executors too). A second
    invocation after more files land resumes from the checkpoint and
    assigns ONLY the new arrivals into existing clusters."""
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH or in the pyspark dist")
    sys.path.insert(0, REPO)
    from dedup import synth
    from dedup.deploy import package_zip

    rows = synth.generate(120, seed=19)
    landing = tmp_path / "landing"
    landing.mkdir()
    pq.write_table(synth.to_arrow(rows[:60]), str(landing / "a.parquet"))
    job = tmp_path / "jobs" / "stream.py"
    job.parent.mkdir()
    shutil.copy(os.path.join(REPO, "jobs", "stream.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    argv = [
        submit, "--master", "local[4]", "--py-files", package_zip(), str(job),
        "--landing", str(landing), "--warehouse", str(tmp_path / "wh"),
    ]
    out = subprocess.run(argv, capture_output=True, text=True, timeout=600,
                         env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(next(ln for ln in out.stdout.splitlines() if ln.startswith("{")))
    assert res["assignments"] == 60

    # late exact copy + the rest land; the copy must join the original's cluster
    late = dict(rows[0]); late["image_id"] = "zlate000001"
    pq.write_table(synth.to_arrow(rows[60:] + [late]), str(landing / "b.parquet"))
    out2 = subprocess.run(argv, capture_output=True, text=True, timeout=600,
                          env=env, cwd=str(tmp_path))
    assert out2.returncode == 0, out2.stderr[-3000:]
    res2 = json.loads(next(ln for ln in out2.stdout.splitlines() if ln.startswith("{")))
    assert res2["assignments"] == 121

    sys.path.insert(0, REPO)
    from dedup.session import get_spark

    spark = get_spark("check-stream-job", cores=4)
    asg = spark.read.parquet(str(tmp_path / "wh" / "stream_assignments"))
    got = {r["image_id"]: r["cluster_id"] for r in asg.collect()}
    assert got["zlate000001"] == got[rows[0]["image_id"]]
