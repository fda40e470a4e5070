"""Kill → resume → identical output, no duplicates (north-star resume)."""

from __future__ import annotations

import os
import shutil

import pytest

from dhtmlparser3_spark.pipeline import lineage as ln
from dhtmlparser3_spark.sources.pages import build_pages

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_kill_and_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    pages = build_pages(spark, SF)

    # run 1: killed after 3 of 8 buckets
    with pytest.raises(RuntimeError, match="simulated kill"):
        ln.run_extract_job(
            spark, pages, out, lin, n_buckets=8, fail_after_buckets=3
        )
    done1 = ln.completed_buckets(spark, lin).count()
    assert done1 == 3

    # run 2: resumes, skips the 3 done buckets, completes the rest
    r2 = ln.run_extract_job(spark, pages, out, lin, n_buckets=8)
    assert r2["skipped"] == 3
    assert r2["processed"] == 5

    # full output: every url exactly once
    res = spark.read.parquet(out)
    assert res.count() == 500
    assert res.select("url").distinct().count() == 500
    assert res.where("error is not null").count() == 0

    # digests verify
    assert ln.verify_run(spark, out, lin).count() == 0

    # run 3 on a completed table is a no-op
    r3 = ln.run_extract_job(spark, pages, out, lin, n_buckets=8)
    assert r3["processed"] == 0 and r3["skipped"] == 8


@pytest.mark.spark
def test_resume_rewrites_orphan_bucket(spark, tmp_path):
    """A bucket dir written without its lineage row (crash between commit
    steps) is overwritten on resume — no duplicates."""
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    pages = build_pages(spark, SF)

    with pytest.raises(RuntimeError):
        ln.run_extract_job(
            spark, pages, out, lin, n_buckets=4, fail_after_buckets=2
        )
    # simulate the crash window: bucket committed but lineage row lost →
    # delete lineage entirely, keep outputs (worst case: ALL orphans)
    shutil.rmtree(lin)
    r = ln.run_extract_job(spark, pages, out, lin, n_buckets=4)
    assert r["processed"] == 4
    res = spark.read.parquet(out)
    assert res.count() == 500
    assert res.select("url").distinct().count() == 500
    assert ln.verify_run(spark, out, lin).count() == 0


@pytest.mark.spark
@pytest.mark.parametrize("mode", ["cut", "orphan"])
def test_real_sigkill_resume(spark, tmp_path, mode):
    """A REAL SIGKILL — driver + JVM die with no cleanup, no shutdown
    hooks, no writer close — then resume completes idempotently.

    The in-process tests above simulate the kill with an exception; this
    one spawns the job in a subprocess (tests/kill_runner.py) that
    SIGKILLs itself either between buckets (``cut``) or inside the
    output-committed/lineage-lost crash window (``orphan``)."""
    import signal
    import subprocess
    import sys

    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    runner = os.path.join(os.path.dirname(__file__), "kill_runner.py")
    proc = subprocess.Popen(
        [sys.executable, runner, out, lin, mode],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
    )
    try:
        stdout, stderr = proc.communicate(timeout=300)
    finally:
        # reap anything left in the runner's session (a py4j JVM that
        # survived the driver's death would poison later pinned benches)
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
    # the process died by SIGKILL, not by a Python exception
    assert proc.returncode == -signal.SIGKILL, (
        proc.returncode, stdout[-2000:], stderr[-2000:])
    assert "UNREACHABLE" not in stdout

    done = ln.completed_buckets(spark, lin).count()
    assert done == 3
    if mode == "orphan":
        # the 4th bucket's output dir committed but its lineage row died
        # with the process: exactly one orphan bucket dir on disk
        bucket_dirs = {
            d for d in os.listdir(out) if d.startswith("bucket=")
        }
        assert len(bucket_dirs) == 4

    # resume in THIS session: skips the 3 committed buckets, rewrites any
    # orphan, completes the rest
    pages = build_pages(spark, SF)
    r = ln.run_extract_job(spark, pages, out, lin, n_buckets=8)
    assert r["skipped"] == 3
    assert r["processed"] == 5
    res = spark.read.parquet(out)
    assert res.count() == 500
    assert res.select("url").distinct().count() == 500
    assert ln.verify_run(spark, out, lin).count() == 0


@pytest.mark.spark
def test_micro_runs(spark, tmp_path):
    """max_buckets_per_run models scheduled micro-runs over a huge table."""
    out = str(tmp_path / "out")
    lin = str(tmp_path / "lineage")
    pages = build_pages(spark, SF)
    total = 0
    for _ in range(4):
        r = ln.run_extract_job(
            spark, pages, out, lin, n_buckets=6, max_buckets_per_run=2
        )
        total += r["processed"]
    assert total == 6
    assert spark.read.parquet(out).count() == 500
