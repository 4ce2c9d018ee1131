"""Run every declared query against its DuckDB oracle and report
pass/fail — the local replica of the driver's CORRECTNESS gate.

Usage: python scripts/check_all.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

from adi_226_datawarehouse_project_spark.session import get_spark  # noqa: E402
from oracle_harness import compare_query  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_spark(shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, fn, oracles.get(name), sf_dir, name)
            dt = time.time() - t0
            print(f"PASS {name:40s} rows={res['rows']:<7d} {res['oracle']:<10s} {dt:.1f}s")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            dt = time.time() - t0
            msg = str(e).split("\n")[0][:300]
            print(f"FAIL {name:40s} {dt:.1f}s :: {msg}")
            failures.append(f"{name}: {traceback.format_exc()[-2000:]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed @ {sf_dir}")
    if failures and "-v" in sys.argv:
        print("\n".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
