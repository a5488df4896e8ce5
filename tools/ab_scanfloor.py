"""Interleaved same-session A/B of the scan-parallelism floor (r13,
VERDICT r12 item 2).

The r12 round lowered ``spark.sql.files.openCostInBytes`` 4 MB -> 64 KB
globally (plus an explicit ``minPartitionNum = defaultParallelism``,
which is Spark's own default via leafNodeDefaultParallelism, so the
open-cost pad is the lever that actually changes split counts). The
driver could not separate that change from host drag because its r12
runs sat in a slow calibration window. This harness settles it the way
the guide (section 1) asks: ONE session, the two variants interleaved
rep by rep, so host drift hits both variants equally.

Usage: python tools/ab_scanfloor.py [reps]
Prints one JSON line: per-query min/median under each variant plus the
observed scan partition counts for the two variants.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from project2_bigdata_spark.plans import REGISTRY  # noqa: E402
from project2_bigdata_spark.session import get_session  # noqa: E402

QUERIES = [
    "sales_daily", "kpi_global", "volatility_cv", "monthly_rollup",
    "ticket_totals", "pair_counts",
]

OPEN_COST = {
    "floor_on": str(64 * 1024),          # bench / fast-local posture
    "floor_off": str(4 * 1024 * 1024),   # Spark default (object-store-safe)
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-scanfloor")
    spark.sparkContext.setLogLevel("ERROR")
    # warm page cache + JVM so rep 1 is comparable
    for t in ("lineitem", "orders", "part"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # partition counts per variant (the plan-dump evidence)
    parts = {}
    for variant, oc in OPEN_COST.items():
        spark.conf.set("spark.sql.files.openCostInBytes", oc)
        parts[variant] = {
            t: spark.read.parquet(f"{sf_dir}/{t}.parquet").rdd.getNumPartitions()
            for t in ("lineitem", "orders")
        }

    runs: dict[str, dict[str, list[float]]] = {
        q: {v: [] for v in OPEN_COST} for q in QUERIES}
    for rep in range(reps):
        for variant, oc in OPEN_COST.items():
            spark.conf.set("spark.sql.files.openCostInBytes", oc)
            for q in QUERIES:
                fn = REGISTRY[q].fn
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                runs[q][variant].append(round(time.perf_counter() - t0, 3))

    out = {"reps": reps, "scan_partitions": parts, "queries": {}}
    for q in QUERIES:
        out["queries"][q] = {
            v: {"min": min(r), "median": round(statistics.median(r), 3),
                "runs": r}
            for v, r in runs[q].items()
        }
        mins = {v: min(r) for v, r in runs[q].items()}
        out["queries"][q]["floor_speedup_min"] = round(
            mins["floor_off"] / mins["floor_on"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
