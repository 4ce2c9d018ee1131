"""process_scratch_dir: the shared per-process scratch lifecycle used by
the io suite and the warehouse zone (atexit removal + dead-pid orphan
sweep — atexit never runs on SIGKILL/OOM, and pid-keyed paths mean a
rerun would otherwise accumulate orphans until /tmp fills)."""

import os
import subprocess

from adi_226_datawarehouse_project_spark import scratch


def test_scratch_path_is_pid_keyed(tmp_path):
    base = str(tmp_path / "base")
    p = scratch.process_scratch_dir(base, "corpus_ab12")
    assert p == f"{base}/corpus_ab12_pid{os.getpid()}"


def test_orphan_sweep_removes_dead_keeps_live(tmp_path):
    base = str(tmp_path / "base")
    # A definitely-dead pid: a reaped child process.
    proc = subprocess.Popen(["true"])
    proc.wait()
    dead = f"{base}/old_pid{proc.pid}"
    live = f"{base}/live_pid1"  # pid 1 always alive
    mine = f"{base}/mine_pid{os.getpid()}"
    for d in (dead, live, mine):
        os.makedirs(d, exist_ok=True)
    scratch._CREATED.discard(f"{base}/fresh_pid{os.getpid()}")
    scratch.process_scratch_dir(base, "fresh")
    assert not os.path.exists(dead), "dead-pid orphan not swept"
    assert os.path.exists(live), "live foreign dir must be kept"
    assert os.path.exists(mine), "own dirs must be kept"


def test_sweep_tolerates_missing_base(tmp_path):
    p = scratch.process_scratch_dir(str(tmp_path / "nope" / "deeper"), "k")
    assert p.endswith(f"k_pid{os.getpid()}")
