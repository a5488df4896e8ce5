"""Replica of the driver's CORRECTNESS run.

Runs every registered query in driver order at sf0.01 on a VANILLA
SparkSession (the engine must tune the driver's session itself), and
compares each oracle-bearing query against DuckDB with the exact
value compare from tests/oracle_harness.py. Rows-only queries get the
driver's weaker count check.

Usage: python tools/driver_replica.py [limit] [reverse|tail]
  limit    — check only N names
  reverse  — sweep in REVERSED driver order (flake audit: catches
             queries that only pass because an earlier query warmed
             some session state). With a limit, the slice is taken
             AFTER reversing (VERDICT r8 nit 3), so `48 reverse`
             checks the NEWEST 48, not the first 48 reversed.
  tail     — check the LAST N names in forward order (the newest
             additions sit at the tail of driver order once green)
"""

from __future__ import annotations

import json
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from project2_bigdata_spark.plans import REGISTRY, driver_order  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("reverse", "tail")]
    limit = int(args[0]) if args else None
    sf = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    names = driver_order()
    if "reverse" in sys.argv[1:]:
        names = names[::-1][:limit]  # slice AFTER reversing: newest N
    elif "tail" in sys.argv[1:]:
        names = names[-limit:] if limit else names
    else:
        names = names[:limit]
    fails: dict[str, str] = {}
    for i, name in enumerate(names):
        q = REGISTRY[name]
        t0 = time.time()
        try:
            if q.oracle:
                compare(spark, q, sf)
                status = "pass"
            else:
                n = q.fn(spark, sf).count()
                status = f"rows-only:{n}"
        except Exception as e:  # noqa: BLE001
            status = "FAIL " + repr(e)[:300]
            fails[name] = status
        print(f"{i:3d} {name:42s} {status[:160]} {time.time() - t0:5.1f}s", flush=True)
    print("FAILS:", json.dumps(fails, indent=1), flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
