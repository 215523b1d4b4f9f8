"""Crash-resume integration: SIGKILL a real tile_pages subprocess mid-write,
rerun with the same run id, and require a clean committed output.

This is the process-level version of the staging-recovery unit tests: the
kill happens while `.staging-<run_id>` is being written, so the rerun must
discard the orphaned staging directory, rebuild, and commit exactly once.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest


JOB = ["python", "-m", "geobuf_spark.jobs.tile_pages"]


def _run_job(out, run_id, n_pages, extra_env=None, wait=True):
    env = dict(os.environ)
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    if extra_env:
        env.update(extra_env)
    proc = subprocess.Popen(
        JOB + ["--out", out, "--run-id", run_id, "--n-pages", str(n_pages),
               "--sf-dir", "/root/testdata/sf0.001", "--zoom", "8", "--cores", "8"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    if not wait:
        return proc
    out_b, _ = proc.communicate(timeout=600)
    return proc.returncode, out_b.decode(errors="replace")


@pytest.mark.slow
def test_kill_mid_write_then_resume(tmp_path):
    out = str(tmp_path / "job_out")
    staging = os.path.join(out, ".staging-rk")

    proc = _run_job(out, "rk", n_pages=150_000, wait=False)
    try:
        # wait for the commit stage to start materializing staging files
        deadline = time.time() + 300
        killed_mid_write = False
        while time.time() < deadline:
            if proc.poll() is not None:
                break
            if os.path.isdir(staging):
                # let a few files land, then kill hard
                time.sleep(1.0)
                proc.send_signal(signal.SIGKILL)
                killed_mid_write = True
                break
            time.sleep(0.2)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert killed_mid_write, "job finished before staging appeared — raise n_pages"
    # crash left staging garbage and no commit
    manifest = os.path.join(out, "_manifest.json")
    committed = []
    if os.path.exists(manifest):
        committed = [e for e in (json.loads(line) for line in open(manifest))
                     if e.get("status") == "committed"]
    assert not committed, "kill landed after the commit point; test needs a larger job"

    # rerun with the SAME run id → must recover and commit exactly once
    rc, log = _run_job(out, "rk", n_pages=150_000)
    assert rc == 0, log[-2000:]
    committed = [e for e in (json.loads(line) for line in open(manifest))
                 if e.get("status") == "committed"]
    assert len(committed) == 1 and committed[0]["run_id"] == "rk"
    # no staging garbage survives
    assert not any(d.startswith(".staging-") for d in os.listdir(out))

    # output integrity without spinning up Spark: lineage totals == data rows
    import duckdb

    con = duckdb.connect()
    n_data = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/data/**/*.parquet', hive_partitioning=1)"
    ).fetchone()[0]
    n_lineage = con.execute(
        f"SELECT sum(n_rows) FROM read_parquet('{out}/_lineage/**/*.parquet')"
    ).fetchone()[0]
    assert n_data > 0 and n_data == n_lineage
