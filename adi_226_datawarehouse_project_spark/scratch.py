"""Process-scoped scratch directories under a shared /tmp base.

One lifecycle, two call sites — the io-roundtrip suite's scratch zone
(``plans/operators_suite._io_dir``) and the warehouse parquet zone
(``model/star._zone_dir``). Both need:

- a per-PROCESS path (``<base>/<key>_pid<pid>``): concurrent pytest
  workers / sessions must never interleave writes in one dir;
- removal at interpreter exit (zones reach GBs at 256×);
- an orphan sweep: atexit never runs on SIGKILL/OOM-kill, and because
  the path is pid-keyed a rerun creates a FRESH dir instead of
  overwriting the orphan — unchecked, retries of an OOM-killed 256×
  run accumulate full-size dirs until /tmp fills. First use per path
  sweeps siblings whose owning pid is no longer alive.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil

_CREATED: set[str] = set()
_PID_RE = re.compile(r"_pid(\d+)$")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _sweep_orphans(base: str) -> None:
    try:
        names = os.listdir(base)
    except OSError:
        return
    for name in names:
        m = _PID_RE.search(name)
        if m and int(m.group(1)) != os.getpid() and not _pid_alive(int(m.group(1))):
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)


def process_scratch_dir(base: str, key: str) -> str:
    """``<base>/<key>_pid<pid>``, removed at interpreter exit; stale
    sibling dirs from dead processes are swept on first use per path."""
    path = os.path.join(base, f"{key}_pid{os.getpid()}")
    if path not in _CREATED:
        _CREATED.add(path)
        _sweep_orphans(base)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
