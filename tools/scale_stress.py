"""Scale-stress harness: amplify the testdata K× and re-run headline queries.

The driver's parquet tops out at sf0.1 (~17 MB) — enough for correctness,
far too small to surface super-linear stages or memory cliffs. This tool
builds an FK-preserving K× amplification of sf0.1 (key-offset copies, so
every join keeps exactly its original fan-out) and times registered
queries against it, optionally under a deliberately small heap to prove
the shuffles spill instead of OOM-ing.

PERF-ONLY data: values are replicas, not a valid correctness corpus
(oracle checks still run against the driver's own parquet). Documents /
embeddings are amplified as EXACT duplicates on purpose — a scaled crawl
has proportionally more dups, and dup-heavy blocks are the worst case the
dedup caps (MAX_JACCARD_BLOCK / MAX_BUCKET) exist for.

Usage:
  python tools/scale_stress.py amplify K [dst_dir]
  python tools/scale_stress.py run K "q1,q2,..." [--timeout SEC]
  (run uses dst_dir from the same K; SPARK_GRAFT_DRIVER_MEM / CPUS apply)
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"

#: key columns to offset per copy, per table. Offsets use the table's
#: own key range (max+1), so copy i's keys are disjoint from copy j's
#: and every FK edge lands on exactly one parent row — per-key join
#: fan-out is IDENTICAL to sf0.1, cardinality is K x.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: tiny fixed dims — constant across scale factors, copied as-is.
COPY = ["region", "nation"]

#: shared key spaces: a FK must shift by its PARENT's offset.
_KEYSPACE = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    # events.user_id shares the customer key space (sf0.1: user_id
    # 0..1499 ⊂ c_custkey 0..14999; every event joins a customer) —
    # shift by the CUSTOMER base so events↔orders/customer fan-out is
    # preserved for copies i>0 (ADVICE r3 item 1).
    "user_id": ("customer", "c_custkey"),
}


def dst_dir(k: int) -> str:
    return f"/tmp/sparkgraft_sfx{k}"


def amplify(spark, k: int) -> str:
    from pyspark.sql import functions as F

    out = dst_dir(k)
    os.makedirs(out, exist_ok=True)
    # one offset base per key space, from the PK's own range
    base: dict[tuple[str, str], int] = {}
    for t, keys in KEYED.items():
        pk = keys[0]
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        base[(t, pk)] = df.agg(F.max(pk)).first()[0] + 1
    for t in COPY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{t}.parquet")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df = df.withColumn("__i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        for c in keys:
            parent = _KEYSPACE.get(c, (t, keys[0]))
            df = df.withColumn(
                c, F.col(c) + F.col("__i") * F.lit(base[parent]))
        (df.drop("__i")
         .repartition(max(k // 4, spark.sparkContext.defaultParallelism))
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
    return out


def run(spark, k: int, names: list[str], timeout_s: int) -> dict:
    from project2_bigdata_spark.plans import REGISTRY

    sf = dst_dir(k)
    sc = spark.sparkContext
    results: dict[str, object] = {}
    for name in names:
        q = REGISTRY[name]
        sc.setJobGroup(name, name, interruptOnCancel=True)
        timer = threading.Timer(timeout_s, lambda n=name: sc.cancelJobGroup(n))
        timer.start()
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf).write.mode("overwrite").format("noop").save()
            results[name] = round(time.perf_counter() - t0, 2)
        except Exception as e:  # noqa: BLE001
            elapsed = round(time.perf_counter() - t0, 2)
            kind = "TIMEOUT" if elapsed >= timeout_s * 0.95 else "FAIL"
            results[name] = f"{kind} after {elapsed}s: {repr(e)[:120]}"
        finally:
            timer.cancel()
            sc.setJobGroup("", "")
        print(f"  {name}: {results[name]}", file=sys.stderr, flush=True)
    return results


def main() -> int:
    from project2_bigdata_spark.session import get_session

    mode, k = sys.argv[1], int(sys.argv[2])
    spark = get_session(f"scale-stress-x{k}")
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "amplify":
        t0 = time.perf_counter()
        out = amplify(spark, k)
        du = sum(os.path.getsize(os.path.join(r, f))
                 for r, _, fs in os.walk(out) for f in fs)
        print(json.dumps({"dst": out, "k": k, "bytes": du,
                          "sec": round(time.perf_counter() - t0, 1)}))
    else:
        names = sys.argv[3].split(",")
        # timeout: positional, or --timeout SEC (both documented forms)
        rest = sys.argv[4:]
        if rest and rest[0] == "--timeout":
            rest = rest[1:]
        timeout_s = int(rest[0]) if rest else 600
        res = run(spark, k, names, timeout_s)
        print(json.dumps({
            "k": k,
            "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "cpus": spark.sparkContext.defaultParallelism,
            "queries": res,
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
