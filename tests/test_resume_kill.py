"""Kill-resume load test (VERDICT r4 task #7): the path a 100 TB job
actually exercises — the driver dies mid-run and the job is resubmitted
with the same ``--out``.

Two scenarios against the real CLI (fresh processes, own Ray sessions):

- **hard kill**: SIGKILL the flagship CLI while its pipeline runs, then
  rerun. Whatever state the death left (no lineage records, partial
  part-files, or committed partitions), the resumed run must produce
  output row-identical to an uninterrupted run — no dropped partitions,
  no duplicated rows.
- **partial-commit state** (deterministic): a completed run with some
  lineage records removed — one victim keeping its (now untrusted)
  partition dir with an extra stale part file injected, the other's dir
  deleted outright. The resume must clear untrusted dirs before
  rewriting (write_parquet APPENDS part files — the silent-duplication
  trap state/lineage.py documents) and skip the intact partitions.
"""

import glob
import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "run_flagship.py")
DOCS = 4000


def _run_cli(out, extra=()):
    return subprocess.run(
        [sys.executable, CLI, "--num-docs", str(DOCS), "--num-cpus", "4",
         "--out", out, *extra],
        cwd=REPO, capture_output=True, text=True, timeout=300)


def _read_out(out) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(out, "**", "*.parquet"),
                             recursive=True))
    assert files, f"no parquet under {out}"
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    return df.sort_values("doc_id").reset_index(drop=True) \
             .reindex(sorted(df.columns), axis=1)


@pytest.fixture(scope="module")
def clean_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship_clean") / "out")
    r = _run_cli(out)
    assert r.returncode == 0, r.stderr[-2000:]
    return _read_out(out)


def test_hard_kill_then_resume_matches_clean(clean_run, tmp_path):
    out = str(tmp_path / "out")
    p = subprocess.Popen(
        [sys.executable, CLI, "--num-docs", str(DOCS), "--num-cpus", "4",
         "--out", out],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # let Ray come up and the pipeline start writing, then kill hard —
    # the window is sized so the job is mid-run (an uninterrupted run of
    # this config takes ~12-15 s; we kill at ~9 s or as soon as output
    # starts appearing, whichever is first)
    deadline = time.time() + 9
    while time.time() < deadline and p.poll() is None:
        if glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True):
            break
        time.sleep(0.2)
    if p.poll() is None:
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=30)
        killed_midrun = True
    else:
        killed_midrun = False  # tiny box finished early — resume still
        # exercised below; equality is the contract either way
    r = _run_cli(out)
    assert r.returncode == 0, r.stderr[-2000:]
    resumed = _read_out(out)
    pd.testing.assert_frame_equal(resumed, clean_run)
    assert killed_midrun or json.loads(
        r.stdout.strip().splitlines()[-1])["partitions_skipped_on_resume"]


def test_partial_commit_state_resumes_exactly(clean_run, tmp_path):
    out = str(tmp_path / "out")
    r = _run_cli(out)
    assert r.returncode == 0, r.stderr[-2000:]
    lineage = os.path.join(out, "lineage")
    recs = sorted(glob.glob(os.path.join(lineage, "*.json")))
    assert len(recs) == 5
    victims = []
    for rec in recs[:2]:
        with open(rec) as f:
            victims.append(json.load(f))
        os.remove(rec)
    # victim 1: dir stays, with a stale duplicate part file injected —
    # the mid-write death state; resume must CLEAR it, not append
    v1_dir = victims[0]["output"]
    part = glob.glob(os.path.join(v1_dir, "*.parquet"))[0]
    shutil.copy(part, part + "_stale.parquet")
    # victim 2: dir gone entirely
    shutil.rmtree(victims[1]["output"])

    r2 = _run_cli(out)
    assert r2.returncode == 0, r2.stderr[-2000:]
    info = json.loads(r2.stdout.strip().splitlines()[-1])
    assert len(info["partitions_skipped_on_resume"]) == 3
    resumed = _read_out(out)
    pd.testing.assert_frame_equal(resumed, clean_run)
