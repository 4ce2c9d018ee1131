"""Interleaved per-query A/B of bench.py across two git refs.

The driver's BENCH_r{N}.json artifact drifted 25.9 → 30.6 → 35.8s over
rounds 10–12 while same-box A/Bs showed flat code — but those A/Bs
recorded only warehouse_build + total medians, so a PER-QUERY driver
swing (e.g. text_token_features 2.9 → 5.4s) could not be attributed
code-vs-box arm-for-arm (VERDICT r12 #3). This script runs bench.py
alternately from two git worktrees (arm A, arm B, A, B, ...) and
records EVERY per-query median (plus raw trials and loadavg) per pass,
one JSON line per pass, so any future per-query delta is decidable
from the artifact alone.

Usage:
    python scripts/ab_bench.py REF_A REF_B [--passes 2] \
        [--sf-dir /root/testdata/sf0.1] \
        [--out measurements/ab_bench_rX_vs_rY.jsonl] [--note "..."]

REF_A / REF_B are git refs (commit, branch) — or the literal WORKTREE
to run the current working tree in place (uncommitted changes
included). Each ref gets a throwaway worktree under /tmp; bench.py
runs there as a subprocess with the same interpreter, env pinned to
the requested sf_dir. Interleaving (A,B,A,B) is the point: co-tenant
load drifts on minutes timescales, so adjacent opposite-arm passes
share the box state and the PAIRED deltas cancel it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _git(*args: str, cwd: Path = REPO) -> str:
    return subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def _make_worktree(ref: str, base: Path) -> tuple[Path, str]:
    if ref == "WORKTREE":
        return REPO, _git("rev-parse", "--short", "HEAD") + "+dirty"
    sha = _git("rev-parse", "--short", ref)
    wt = base / f"ab_{sha}"
    if not wt.exists():
        _git("worktree", "add", "--detach", str(wt), ref)
    return wt, sha


def _run_bench(wt: Path, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=wt,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py rc={proc.returncode} in {wt}:\n{proc.stderr[-2000:]}"
        )
    last_json = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            last_json = line
    if last_json is None:
        raise RuntimeError(f"no JSON line from bench.py in {wt}")
    parsed = json.loads(last_json)
    parsed["_subprocess_wall"] = wall
    return parsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    out = Path(args.out) if args.out else REPO / "measurements" / "ab_bench.jsonl"
    base = Path(tempfile.gettempdir()) / "spark_graft_ab_worktrees"
    base.mkdir(exist_ok=True)
    wt_a, sha_a = _make_worktree(args.ref_a, base)
    wt_b, sha_b = _make_worktree(args.ref_b, base)
    print(f"# arm A: {args.ref_a} ({sha_a}) @ {wt_a}", file=sys.stderr)
    print(f"# arm B: {args.ref_b} ({sha_b}) @ {wt_b}", file=sys.stderr)

    protocol = (
        f"interleaved arms (A,B)x{args.passes}, bench.py median-of-3, "
        f"sf_dir={args.sf_dir}; paired adjacent passes cancel co-tenant "
        "drift — compare per-query medians arm-for-arm, not absolutes"
    )
    rows = []
    with open(out, "a") as f:
        for p in range(1, args.passes + 1):
            for arm, ref, wt, sha in (
                ("A", args.ref_a, wt_a, sha_a),
                ("B", args.ref_b, wt_b, sha_b),
            ):
                parsed = _run_bench(wt, args.sf_dir)
                row = {
                    "run": f"{arm.lower()}_pass{p}",
                    "arm": arm,
                    "ref": ref,
                    "commit": sha,
                    "protocol": protocol,
                    "note": args.note,
                    "total_sec": parsed.get("value"),
                    # default {} not None: a ref whose bench.py predates
                    # per-query output must not TypeError the paired
                    # summary AFTER all the expensive passes ran
                    # (ADVICE r13) — it just contributes no common keys.
                    "queries": parsed.get("queries") or {},
                    "trials": parsed.get("trials"),
                    "loadavg": parsed.get("loadavg"),
                    "subprocess_wall": parsed.get("_subprocess_wall"),
                }
                f.write(json.dumps(row) + "\n")
                f.flush()
                rows.append(row)
                print(
                    f"# pass {p} arm {arm} ({sha}): total={row['total_sec']}s "
                    f"wall={row['subprocess_wall']}s",
                    file=sys.stderr,
                )

    # Paired per-query summary. Only queries present in EVERY pass of
    # BOTH arms are compared — refs from different rounds can add or
    # remove bench queries, and a missing key must not crash (or
    # silently skew) the summary after the expensive passes ran.
    import statistics

    common = set(rows[0]["queries"])
    for r in rows[1:]:
        common &= set(r["queries"])
    dropped = sorted(
        set().union(*(set(r["queries"]) for r in rows)) - common
    )
    a_rows = [r for r in rows if r["arm"] == "A"]
    b_rows = [r for r in rows if r["arm"] == "B"]
    summary = {}
    for q in sorted(common):
        a_meds = [r["queries"][q] for r in a_rows]
        b_meds = [r["queries"][q] for r in b_rows]
        # the PAIRED delta per pass (B_i - A_i, adjacent arms share box
        # state), then the median over passes — this is what cancels
        # co-tenant drift; difference-of-medians can pair measurements
        # from non-adjacent passes and retain the drift.
        paired = [b - a for a, b in zip(a_meds, b_meds)]
        summary[q] = {
            "a_median": round(statistics.median(a_meds), 3),
            "b_median": round(statistics.median(b_meds), 3),
            "paired_delta_median": round(statistics.median(paired), 3),
            "paired_deltas": [round(d, 3) for d in paired],
        }
    out_summary = {"summary_b_minus_a": summary}
    if dropped:
        out_summary["not_in_both_arms"] = dropped
    print(json.dumps(out_summary))


if __name__ == "__main__":
    main()
