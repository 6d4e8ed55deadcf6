"""True crash-resume: SIGKILL a live CLI run mid-stage, resume, compare.

The existing resume tests simulate a killed job by truncating checkpoints
(cooperative). This one kills a real `python -m deduplication_ray.cli run`
process group (driver + its raylet + workers) with SIGKILL the moment the
first signature shard group commits, then resumes via the CLI `resume` verb
(strict config check) in a fresh process and asserts:

  * committed shard groups are NOT recomputed (mtimes unchanged), and
  * the resumed clusters are row-identical to an uninterrupted run.

This is the north-rule contract ("a killed job resumes mid-shuffle")
exercised against actual process death, not a simulated one.
"""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.dataset as pads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CRASH_ROWS = 1200
CRASH_FILES = 16  # group_size=8 -> 2 signature shard groups


def _load(d: str) -> pd.DataFrame:
    return pads.dataset(
        [os.path.join(d, f) for f in sorted(os.listdir(d))
         if f.endswith(".parquet")]
    ).to_table().to_pandas()


def _cli(args: list[str], **kw) -> subprocess.Popen:
    env = dict(os.environ, RAY_GRAFT_CPUS="2")
    return subprocess.Popen(
        [sys.executable, "-m", "deduplication_ray.cli", *args],
        cwd=REPO, env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, **kw)


def test_sigkill_mid_run_resumes_to_identical_clusters(ray_session, tmp_path):
    from deduplication_ray.config import DedupConfig
    from deduplication_ray.pipelines import image_dedup
    from deduplication_ray.sources import fixtures

    fix = "/tmp/dedup_ray_crash_fixture"
    from deduplication_ray.sources import storage
    man = storage.read_manifest(fix)
    if not (man and man.get("n_rows") == CRASH_ROWS
            and man.get("num_files") == CRASH_FILES):
        shutil.rmtree(fix, ignore_errors=True)
        fixtures.generate(fix, CRASH_ROWS, seed=7, num_files=CRASH_FILES)

    run_dir = str(tmp_path / "crash_run")
    cli_cfg = ["--num-partitions", "4", "--num-cpus", "2"]
    proc = _cli(["run", "--input", f"{fix}/data", "--out", run_dir, *cli_cfg])
    try:
        # wait for the FIRST shard-group commit (atomic dir rename), then
        # kill the whole process group outright — driver, raylet, workers
        sig_dir = os.path.join(run_dir, "signatures")
        deadline = time.time() + 180
        committed: list[str] = []
        while time.time() < deadline and proc.poll() is None:
            if os.path.isdir(sig_dir):
                committed = [g for g in os.listdir(sig_dir)
                             if g.startswith("group_") and
                             not g.endswith(".tmp")]
                if committed:
                    break
            time.sleep(0.02)
        assert proc.poll() is None, "run finished before the kill landed"
        assert committed, "no shard group committed within 180 s"
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait(timeout=60)

    # the job died mid-run: final stage must not exist yet
    assert not os.path.isdir(os.path.join(run_dir, "clusters"))
    mtimes = {g: os.stat(os.path.join(run_dir, "signatures", g)).st_mtime_ns
              for g in committed}

    # resume in a fresh process via the strict `resume` verb
    res = _cli(["resume", "--input", f"{fix}/data", "--out", run_dir,
                *cli_cfg])
    assert res.wait(timeout=600) == 0

    # committed groups were reused, never rewritten
    for g, t in mtimes.items():
        assert os.stat(
            os.path.join(run_dir, "signatures", g)).st_mtime_ns == t

    # uninterrupted run (pytest's own Ray session) for comparison
    clean_dir = str(tmp_path / "clean_run")
    image_dedup.run_pipeline(f"{fix}/data", clean_dir,
                             DedupConfig(num_partitions=4))

    resumed = _load(f"{run_dir}/clusters").sort_values("image_id")
    clean = _load(f"{clean_dir}/clusters").sort_values("image_id")
    pd.testing.assert_frame_equal(resumed.reset_index(drop=True),
                                  clean.reset_index(drop=True))
