"""Pre-commit smoke gate — ~2s, no Spark session.

Catches the round-6 class of failure (a registry edit that breaks
`__spark_entry__.queries()` / `oracle_sql()` and with it every driver
gate) before the commit, not after the round.

Usage: python scripts/smoke.py    # exit 0 = safe to commit
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "queries() returned empty"
    assert set(oracles) == set(qs), (
        f"oracle/query key mismatch: only-in-queries="
        f"{sorted(set(qs) - set(oracles))} only-in-oracles="
        f"{sorted(set(oracles) - set(qs))}"
    )
    assert len(qs) <= 50, (
        f"{len(qs)} declared queries > the driver's 50-query CORRECTNESS "
        "cap — queries past the cap silently rotate out of the gate"
    )
    print(f"registry OK: {len(qs)} queries, all oracled")

    # bench coupling: every BENCH_QUERIES name must resolve through
    # bench.build_queries() (entry registry + the public
    # bench_retained_queries shim) — catches a registry refactor that
    # would break bench at runtime instead of pre-commit.
    import bench as benchmod

    bqs = benchmod.build_queries()
    missing = [n for n in benchmod.BENCH_QUERIES if not callable(bqs.get(n))]
    assert not missing, f"bench queries unresolved: {missing}"
    print(f"bench OK: {len(benchmod.BENCH_QUERIES)} benched queries resolve")

    # ADVICE hygiene (VERDICT r8 #5): an entry NOT annotated as fixed
    # (not struck through) must cite a path:line that still resolves —
    # two rounds running, ADVICE described already-fixed findings. A
    # warning, not a gate: the fix-commit rule is process, this just
    # makes the rot visible at commit time.
    import re

    advice = REPO / "ADVICE.md"
    if advice.exists():
        for ln in advice.read_text().splitlines():
            if not ln.startswith("- **"):  # struck entries start "- ~~**"
                continue
            for path, lineno in re.findall(r"([\w./-]+\.(?:py|md|sql)):(\d+)", ln):
                f = REPO / path
                if not f.exists():
                    print(f"WARNING: ADVICE cites missing file {path}")
                elif int(lineno) > len(f.read_text().splitlines()):
                    print(
                        f"WARNING: ADVICE cites {path}:{lineno} past EOF "
                        "— entry likely stale; fix or strike it"
                    )

    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = (rc.stdout or "").strip().splitlines()[-1:] or ["(no output)"]
    print(f"pytest collect: {tail[0]}")
    if rc.returncode != 0:
        print(rc.stdout[-3000:], file=sys.stderr)
        print(rc.stderr[-2000:], file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
