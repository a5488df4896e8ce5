"""Round-9 additions (VERDICT r8 next-round list): optimistic
concurrency on the versioned MERGE sink, the dtw cogroup key-slice,
the mongoexport DataSource write side, pyds filter pushdown, the
Arrow-optimized Python UDTF surface, and CI-visible sketch bands.
"""

from __future__ import annotations

import os
import threading

import pytest

from project2_bigdata_spark.plans import REGISTRY


def _plan(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Optimistic concurrency on merge_upsert (VERDICT r8 item 1)


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, v string")


def test_merge_upsert_racing_writers_no_lost_update(spark, tmp_path):
    """The r8 judge's lost-update scenario, injected deterministically:
    writer A reads base v=1, then writer B commits v=2 BEFORE A's
    commit. Pre-fix, A re-derived the version number at write time and
    landed its stale merge as v=3 without B's rows. Post-fix, A's
    commit at exactly base+1=2 collides, the merge re-runs against
    B's v=2, and BOTH deltas are present in the final snapshot."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / "t")
    assert merge_upsert(
        spark, p, _kv(spark, [(1, 10, "base1"), (2, 10, "base2")]),
        keys=["k"], order_cols=["ts"]) == 1

    b_delta = _kv(spark, [(2, 20, "writerB")])
    a_delta = _kv(spark, [(3, 20, "writerA")])
    attempts = []

    def race(attempt, target):
        attempts.append((attempt, target))
        if attempt == 0:  # B sneaks in between A's base read and commit
            assert merge_upsert(spark, p, b_delta,
                                keys=["k"], order_cols=["ts"]) == 2

    final = merge_upsert(spark, p, a_delta, keys=["k"], order_cols=["ts"],
                         pre_commit_hook=race)
    assert final == 3
    # attempt 0 targeted v=2 (lost), attempt 1 targeted v=3 (won)
    assert attempts == [(0, 2), (1, 3)]
    got = {r.k: r.v for r in read_version(spark, p).collect()}
    assert got == {1: "base1", 2: "writerB", 3: "writerA"}


def test_merge_upsert_retry_exhaustion_raises(spark, tmp_path):
    """A writer that loses every race fails loudly with
    ConcurrentWriteError, never silently clobbers."""
    from project2_bigdata_spark.sources.ingest import (
        ConcurrentWriteError, merge_upsert,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(1, 10, "base")]),
                 keys=["k"], order_cols=["ts"])

    def always_lose(attempt, target):
        merge_upsert(spark, p, _kv(spark, [(100 + attempt, 20, "rival")]),
                     keys=["k"], order_cols=["ts"])

    with pytest.raises(ConcurrentWriteError):
        merge_upsert(spark, p, _kv(spark, [(2, 20, "loser")]),
                     keys=["k"], order_cols=["ts"],
                     max_retries=2, pre_commit_hook=always_lose)


@pytest.mark.slow
def test_merge_upsert_threaded_race_equals_recompute(spark, tmp_path):
    """A genuine thread race: 3 writers × 2 merges each, all started
    together. latest_wins resolution is commutative given unique
    (ts, k) orderings, so WHATEVER interleaving the scheduler picks,
    the final snapshot must equal the full recompute over all deltas —
    and every merge must land as its own distinct version."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(k, 0, "base") for k in range(6)]),
                 keys=["k"], order_cols=["ts", "v"], resolve="latest_wins")

    all_rows = []
    batches = []
    for w in range(3):
        for b in range(2):
            rows = [(k, 100 * (w + 1) + b, f"w{w}b{b}")
                    for k in range(w, 6, 3)]  # overlapping key slices
            all_rows.extend(rows)
            batches.append(rows)

    barrier = threading.Barrier(3)
    errors = []

    def writer(widx):
        try:
            barrier.wait(timeout=120)
            for b in range(2):
                merge_upsert(spark, p, _kv(spark, batches[2 * widx + b]),
                             keys=["k"], order_cols=["ts", "v"],
                             resolve="latest_wins", max_retries=20)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    # every merge committed as its own version: base + 6 merges = v7
    got = {r.k: (r.ts, r.v) for r in read_version(spark, p, 7).collect()}
    expect = {k: (0, "base") for k in range(6)}
    for k, ts, v in all_rows:
        if (ts, v) > expect[k]:
            expect[k] = (ts, v)
    assert got == expect


def test_commit_version_loses_to_existing_and_vacuum_reclaims_debris(
        spark, tmp_path):
    from project2_bigdata_spark.sources.ingest import (
        commit_version, read_version, vacuum_versions, write_versioned,
    )

    p = str(tmp_path / "t")
    df = _kv(spark, [(1, 1, "a")])
    assert write_versioned(df, p) == 1
    assert commit_version(_kv(spark, [(9, 9, "z")]), p, 1) is False
    # the loser left no readable state and its staging dir is debris
    assert read_version(spark, p).collect() == [(1, 1, "a")]
    debris = [n for n in os.listdir(p) if n.startswith(".staged-")]
    assert debris == []  # cleaned immediately on the lost race
    # manual debris (crash between write and rename) is vacuumed
    os.makedirs(os.path.join(p, ".staged-v2-deadbeef"))
    os.makedirs(os.path.join(p, ".torn-v2-deadbeef"))
    vacuum_versions(p, keep=5)
    left = [n for n in os.listdir(p) if n.startswith((".staged-", ".torn-"))]
    assert left == []


def test_merge_upsert_quarantines_torn_legacy_dir(spark, tmp_path):
    """A crash-torn legacy write_versioned dir squatting on v=base+1
    (part files, no _SUCCESS) must not wedge the optimistic commit:
    the merge quarantines it aside and commits at exactly base+1."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(1, 1, "a")]),
                 keys=["k"], order_cols=["ts"])
    torn = os.path.join(p, "v=2")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"torn")
    assert merge_upsert(spark, p, _kv(spark, [(2, 2, "b")]),
                        keys=["k"], order_cols=["ts"]) == 2
    got = sorted(read_version(spark, p, 2).collect())
    assert [(r.k, r.v) for r in got] == [(1, "a"), (2, "b")]
    assert any(n.startswith(".torn-v2-") for n in os.listdir(p))


# ---------------------------------------------------------------------------
# pyds hardening (ADVICE r8): torn-tail offsets + EOF guard


_DOC = ('{"_id": {"$oid": "%d"}, "saleDateRaw": "\\"2000-01-0%dT00:00:00Z\\"", '
        '"price": {"$numberDecimal": "1.50"}, "purchaseMethod": "Online"}')


def test_pyds_latest_offset_clamps_to_newline(tmp_path):
    """A writer mid-append leaves a partial final line; latestOffset
    must land just past the LAST newline, never mid-line."""
    from project2_bigdata_spark.sources.pyds import JsonlSaleStreamReader

    p = tmp_path / "torn.jsonl"
    complete = "".join(_DOC % (i, 1) + "\n" for i in range(1, 4))
    partial = (_DOC % (4, 1))[:30]  # half a doc, no newline
    p.write_text(complete + partial)
    r = JsonlSaleStreamReader({"path": str(p), "num_partitions": "4"})
    assert r.latestOffset() == {"byte": len(complete.encode())}
    # no newline at all => nothing committable yet
    p2 = tmp_path / "nonl.jsonl"
    p2.write_text(partial)
    r2 = JsonlSaleStreamReader({"path": str(p2), "num_partitions": "4"})
    assert r2.latestOffset() == {"byte": 0}
    # empty file
    p3 = tmp_path / "empty.jsonl"
    p3.write_text("")
    r3 = JsonlSaleStreamReader({"path": str(p3), "num_partitions": "4"})
    assert r3.latestOffset() == {"byte": 0}


@pytest.mark.slow
def test_pyds_stream_live_writer_mid_append(spark, tmp_path):
    """The advertised live growing-source case (ADVICE r8): run 1
    samples the file while a writer is mid-append (partial last line,
    no trailing newline). The committed offset must stop at the last
    complete line; run 2 — after the writer finishes that line and
    adds more — must deliver the completed line and the new lines
    exactly once, no crash, no duplicates."""
    from project2_bigdata_spark.sources.pyds import stream_jsonl_sales

    p = tmp_path / "live.jsonl"
    doc4 = _DOC % (4, 1) + "\n"
    p.write_text("".join(_DOC % (i, 1) + "\n" for i in range(1, 4))
                 + doc4[:40])  # writer caught mid-line
    ck = str(tmp_path / "ck")
    batches = []

    def run_once():
        q = (stream_jsonl_sales(spark, str(p))
             .writeStream.foreachBatch(
                 lambda df, bid: batches.append(sorted(
                     r.sale_id for r in df.collect())))
             .trigger(availableNow=True)
             .option("checkpointLocation", ck).start())
        q.awaitTermination()

    run_once()
    with open(p, "a") as fh:  # writer completes doc4, appends 5..6
        fh.write(doc4[40:])
        fh.write("".join(_DOC % (i, 1) + "\n" for i in range(5, 7)))
    run_once()
    non_empty = [b for b in batches if b]
    assert non_empty[0] == ["1", "2", "3"]
    assert non_empty[1] == ["4", "5", "6"]


def test_pyds_batch_read_stops_at_truncated_eof(tmp_path):
    """ADVICE r8: a partition whose planned end exceeds the actual EOF
    (file truncated between planning and read) must terminate, not
    spin on readline() returning b''."""
    from project2_bigdata_spark.sources.pyds import (
        JsonlSaleReader, _ByteRange,
    )

    p = tmp_path / "trunc.jsonl"
    p.write_text("".join(_DOC % (i, 1) + "\n" for i in range(1, 4)))
    r = JsonlSaleReader({"path": str(p), "num_partitions": "1"})
    part = _ByteRange(str(p), 0, p.stat().st_size + 10_000)  # end past EOF
    got = [v for batch in r.read(part)
           for v in batch.column(0).to_pylist()]  # Arrow batches (r9)
    assert got == ["1", "2", "3"]


# ---------------------------------------------------------------------------
# DataSource write side + filter pushdown (VERDICT r8 items 4 + 7)


def _sales_df(spark, n=40):
    rows = [(str(i), f"2000-01-{(i % 27) + 1:02d} 00:00:00",
             float(i) + 0.25, ["Online", "InStore", "Phone"][i % 3])
            for i in range(1, n + 1)]
    return spark.createDataFrame(
        rows, "sale_id string, sale_ts string, total_price double, "
              "purchase_method string")


@pytest.mark.slow
def test_pyds_writer_roundtrip_multi_partition(spark, tmp_path):
    """Distributed write: one part file per NON-EMPTY partition, driver
    commit publishes with _SUCCESS, and the directory-aware reader
    reconstructs the relation under any partition count."""
    import glob

    from project2_bigdata_spark.sources.pyds import (
        read_jsonl_sales, write_jsonl_sales,
    )

    out = str(tmp_path / "export")
    os.makedirs(out)
    df = _sales_df(spark).repartition(16)  # some partitions empty at n=40
    write_jsonl_sales(df, out)
    parts = glob.glob(f"{out}/part-*.jsonl")
    assert 0 < len(parts) <= 16
    assert os.path.exists(f"{out}/_SUCCESS")
    assert not glob.glob(f"{out}/.staging-*")  # staging cleaned up
    for n in (1, 3, 8):
        back = sorted(map(tuple, read_jsonl_sales(spark, out, n).collect()))
        assert back == sorted(map(tuple, df.collect()))
    # overwrite replaces, never appends
    write_jsonl_sales(_sales_df(spark, 5), out)
    assert read_jsonl_sales(spark, out, 4).count() == 5


def test_pyds_writer_rejects_wrong_schema(spark, tmp_path):
    from project2_bigdata_spark.sources.pyds import FORMAT_NAME, register_jsonl_source

    register_jsonl_source(spark)
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    with pytest.raises(Exception, match="sale schema"):
        (df.write.format(FORMAT_NAME).mode("overwrite")
         .option("path", str(tmp_path / "bad")).save())


def test_pyds_pushdown_consumes_filter_node(spark, tmp_path):
    """Supported predicates vanish from the executed plan (consumed by
    pushFilters) and the source returns exactly the matching rows;
    unsupported predicates are yielded back and survive as a Filter."""
    from pyspark.sql import functions as F

    from project2_bigdata_spark.sources.pyds import (
        read_jsonl_sales, write_jsonl_sales,
    )

    out = str(tmp_path / "export")
    os.makedirs(out)
    df = _sales_df(spark)
    write_jsonl_sales(df, out)

    pushed = read_jsonl_sales(spark, out, 4).filter(
        (F.col("purchase_method") == "Online")
        & (F.col("total_price") > 10.0))
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan p2bd_jsonl" in plan
    import re
    assert not re.search(r"\bFilter\b", plan), plan  # consumed by source
    expect = sorted(
        (r.sale_id for r in df.collect()
         if r.purchase_method == "Online" and r.total_price > 10.0))
    assert sorted(r.sale_id for r in pushed.collect()) == expect

    # a Not(EqualTo) is unsupported -> stays a Spark-side Filter
    mixed = read_jsonl_sales(spark, out, 4).filter(
        (F.col("purchase_method") == "Online")
        & (F.col("sale_id") != "3"))
    plan2 = mixed._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\bFilter\b", plan2), plan2
    expect2 = sorted(
        (r.sale_id for r in df.collect()
         if r.purchase_method == "Online" and r.sale_id != "3"))
    assert sorted(r.sale_id for r in mixed.collect()) == expect2


@pytest.mark.slow
def test_pyds_stream_writer_batch_commit_is_overwrite_idempotent(
        spark, tmp_path):
    """Replaying a micro-batch (at-least-once) must overwrite its
    batch=<id> dir, not append a second copy."""
    from project2_bigdata_spark.sources.pyds import (
        FORMAT_NAME, read_jsonl_sales, register_jsonl_source,
        stream_jsonl_sales, write_jsonl_sales,
    )

    import glob

    src = str(tmp_path / "src")
    os.makedirs(src)
    write_jsonl_sales(_sales_df(spark, 12).coalesce(1), src)
    # the STREAM reader's contract is one append-only file
    src_file = glob.glob(f"{src}/part-*.jsonl")[0]
    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    register_jsonl_source(spark)

    def run(ck):
        q = (stream_jsonl_sales(spark, src_file)
             .writeStream.format(FORMAT_NAME)
             .option("path", sink)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    n1 = read_jsonl_sales(spark, sink, 4).count()
    # fresh checkpoint replays the same data as batch 0 again
    run(str(tmp_path / "ck2"))
    n2 = read_jsonl_sales(spark, sink, 4).count()
    assert n1 == n2 == 12  # overwritten, not doubled


@pytest.mark.slow
def test_pyds_boundary_coincidence_uniform_lines(spark, tmp_path):
    """Regression (r9): when every line has the SAME length, size//n
    range boundaries land exactly on line starts — the pre-fix readers
    dropped each such line (read by neither side: the left range broke
    at pos >= end, the right range skipped its first line). Both
    readers must return every line for every partition count."""
    from project2_bigdata_spark.sources.pyds import (
        JsonlSaleStreamReader, read_jsonl_sales,
    )

    p = tmp_path / "uniform.jsonl"
    # fixed-width ids -> byte-identical line lengths
    doc = ('{"_id": {"$oid": "%03d"}, '
           '"saleDateRaw": "\\"2000-01-01T00:00:00Z\\"", '
           '"price": {"$numberDecimal": "1.50"}, '
           '"purchaseMethod": "Online"}')
    n_lines = 24
    p.write_text("".join(doc % i + "\n" for i in range(1, n_lines + 1)))
    size = p.stat().st_size
    assert size % n_lines == 0  # truly uniform

    expect = [f"{i:03d}" for i in range(1, n_lines + 1)]
    for n in (2, 3, 4, 6, 8, 12, 24):
        got = sorted(r.sale_id for r in
                     read_jsonl_sales(spark, str(p), n).collect())
        assert got == expect, f"batch n={n}: {len(got)}/{n_lines}"
        r = JsonlSaleStreamReader({"path": str(p), "num_partitions": str(n)})
        parts = r.partitions({"byte": 0}, {"byte": size})
        srows = sorted(v for part in parts for batch in r.read(part)
                       for v in batch.column(0).to_pylist())
        assert srows == expect, f"stream n={n}: {len(srows)}/{n_lines}"

    # two-window split on a line boundary: no loss, no double-read
    r = JsonlSaleStreamReader({"path": str(p), "num_partitions": "4"})
    mid = (size // n_lines) * 10  # window boundary = start of line 11
    w1 = [v for part in r.partitions({"byte": 0}, {"byte": mid})
          for b in r.read(part) for v in b.column(0).to_pylist()]
    w2 = [v for part in r.partitions({"byte": mid}, {"byte": size})
          for b in r.read(part) for v in b.column(0).to_pylist()]
    assert sorted(w1) == expect[:10]
    assert sorted(w2) == expect[10:]


# ---------------------------------------------------------------------------
# Arrow-optimized Python UDTF (VERDICT r8 item 5)


def test_chunk_udtf_plan_is_arrow_udtf(spark, sf_dir):
    """The lateral table function runs as ONE ArrowEvalPythonUDTF node
    over a column-pruned scan — no shuffle, no per-row pickling."""
    plan = _plan(spark, sf_dir, "chunk_documents_udtf")
    assert "ArrowEvalPythonUDTF" in plan, plan
    assert "Exchange" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_chunk_udtf_equals_hof_twin(spark, sf_dir):
    """Both chunking paths produce the identical relation."""
    hof = sorted(map(tuple,
                     REGISTRY["chunk_documents"].fn(spark, sf_dir).collect()))
    ud = sorted(map(tuple,
                    REGISTRY["chunk_documents_udtf"].fn(spark, sf_dir).collect()))
    assert hof == ud


# ---------------------------------------------------------------------------
# merge_upsert: bootstrap race + schema evolution (r9 follow-ups)


def test_merge_upsert_bootstrap_race(spark, tmp_path):
    """Two writers racing to CREATE the table: both read base=None and
    target v=1; the loser must retry and merge INTO the winner's
    bootstrap, not clobber it."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / "t")

    def b_bootstraps_first(attempt, target):
        if attempt == 0:
            assert merge_upsert(spark, p, _kv(spark, [(1, 10, "B")]),
                                keys=["k"], order_cols=["ts"]) == 1

    assert merge_upsert(spark, p, _kv(spark, [(2, 10, "A")]),
                        keys=["k"], order_cols=["ts"],
                        pre_commit_hook=b_bootstraps_first) == 2
    got = {r.k: r.v for r in read_version(spark, p).collect()}
    assert got == {1: "B", 2: "A"}


@pytest.mark.parametrize("resolve", ["delta_wins", "latest_wins"])
def test_merge_upsert_schema_evolution(spark, tmp_path, resolve):
    """Delta's mergeSchema contract: drift raises by default; with
    schema_evolution=True new delta columns append (base rows null)
    and delta rows null-fill base-only columns."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / f"t_{resolve}")
    merge_upsert(spark, p, _kv(spark, [(1, 10, "keep"), (2, 10, "old")]),
                 keys=["k"], order_cols=["ts"], resolve=resolve)
    wide = spark.createDataFrame(
        [(2, 20, "new", "extra2"), (3, 20, "ins", "extra3")],
        "k int, ts int, v string, extra string")
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_upsert(spark, p, wide, keys=["k"], order_cols=["ts"],
                     resolve=resolve)
    v = merge_upsert(spark, p, wide, keys=["k"], order_cols=["ts"],
                     resolve=resolve, schema_evolution=True)
    got = {r.k: (r.ts, r.v, r.extra)
           for r in read_version(spark, p, v).collect()}
    assert got == {1: (10, "keep", None), 2: (20, "new", "extra2"),
                   3: (20, "ins", "extra3")}
    # next delta LACKS the evolved column: surviving wide rows keep
    # their value, the narrow winner's row reads null for it
    narrow = _kv(spark, [(3, 30, "ins2")])
    v2 = merge_upsert(spark, p, narrow, keys=["k"], order_cols=["ts"],
                      resolve=resolve, schema_evolution=True)
    got2 = {r.k: (r.ts, r.v, r.extra)
            for r in read_version(spark, p, v2).collect()}
    assert got2 == {1: (10, "keep", None), 2: (20, "new", "extra2"),
                    3: (30, "ins2", None)}


def test_pyds_writer_empty_relation(spark, tmp_path):
    """Writing an EMPTY relation to a fresh path publishes an empty
    committed table (_SUCCESS, no part files) and reads back as zero
    rows."""
    import glob

    from project2_bigdata_spark.sources.pyds import (
        read_jsonl_sales, write_jsonl_sales,
    )

    out = str(tmp_path / "empty_export")  # note: dir does NOT pre-exist
    write_jsonl_sales(_sales_df(spark, 5).limit(0), out)
    assert os.path.exists(f"{out}/_SUCCESS")
    assert glob.glob(f"{out}/part-*.jsonl") == []
    assert read_jsonl_sales(spark, out, 4).count() == 0


# ---------------------------------------------------------------------------
# Change Data Feed over the versioned sink (r9)


def test_diff_snapshots_classifies_all_three_change_types(spark, tmp_path):
    """insert / update_postimage / delete between two snapshots —
    delete rows carry the pre-image (no post-image exists)."""
    from project2_bigdata_spark.sources.ingest import (
        diff_snapshots, write_versioned,
    )

    p = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, 10, "keep"), (2, 10, "old"),
                                (3, 10, "gone")]), p)
    write_versioned(_kv(spark, [(1, 10, "keep"), (2, 20, "new"),
                                (4, 20, "born")]), p)
    got = {r.k: (r._change_type, r.ts, r.v)
           for r in diff_snapshots(spark, p, ["k"], 1, 2).collect()}
    assert got == {
        2: ("update_postimage", 20, "new"),
        3: ("delete", 10, "gone"),   # pre-image
        4: ("insert", 20, "born"),
    }  # key 1 unchanged -> absent


def test_read_change_feed_per_commit_versions(spark, tmp_path):
    """The feed is PER-COMMIT (Delta CDF contract), not the collapsed
    net effect: a key updated in v2 and again in v3 appears twice,
    each row tagged with its _commit_version."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_change_feed,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(1, 10, "a")]),
                 keys=["k"], order_cols=["ts"])
    merge_upsert(spark, p, _kv(spark, [(1, 20, "b"), (2, 20, "x")]),
                 keys=["k"], order_cols=["ts"])
    merge_upsert(spark, p, _kv(spark, [(1, 30, "c")]),
                 keys=["k"], order_cols=["ts"])
    feed = read_change_feed(spark, p, ["k"], from_version=1)
    got = sorted((r._commit_version, r.k, r._change_type, r.v)
                 for r in feed.collect())
    assert got == [
        (2, 1, "update_postimage", "b"), (2, 2, "insert", "x"),
        (3, 1, "update_postimage", "c"),
    ]
    # a vacuumed-out from_version raises instead of silently shrinking
    from project2_bigdata_spark.sources.ingest import vacuum_versions
    vacuum_versions(p, keep=2)
    with pytest.raises(FileNotFoundError, match="retention"):
        read_change_feed(spark, p, ["k"], from_version=1)
    # the surviving window still replays
    tail = read_change_feed(spark, p, ["k"], from_version=2)
    assert sorted((r._commit_version, r.k) for r in tail.collect()) == [(3, 1)]


def test_diff_snapshots_schema_evolution_side_aware(spark, tmp_path):
    """Diffing across an evolved schema: the new column reads null on
    the old side (counts as a difference only when the new side is
    non-null there)."""
    from project2_bigdata_spark.sources.ingest import (
        diff_snapshots, write_versioned,
    )

    p = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, 10, "a"), (2, 10, "b")]), p)
    wide = spark.createDataFrame(
        [(1, 10, "a", None), (2, 10, "b", "tagged")],
        "k int, ts int, v string, extra string")
    write_versioned(wide, p)
    got = {r.k: (r._change_type, r.extra)
           for r in diff_snapshots(spark, p, ["k"], 1, 2).collect()}
    # key 1: every shared column equal, extra null on both sides -> unchanged
    assert got == {2: ("update_postimage", "tagged")}


def test_vacuum_time_based_retention(spark, tmp_path):
    """Delta's RETAIN-N-HOURS analog: versions outside the count window
    survive while younger than min_age_s; aged-out ones drop."""
    import time

    from project2_bigdata_spark.sources.ingest import (
        read_version, vacuum_versions, write_versioned,
    )

    p = str(tmp_path / "t")
    for i in range(3):
        write_versioned(_kv(spark, [(i, i, f"v{i + 1}")]), p)
    # v1 is "old", v2 is fresh, v3 is latest
    os.utime(os.path.join(p, "v=1"), (time.time() - 7200,) * 2)
    assert vacuum_versions(p, keep=1, min_age_s=3600) == [1]
    assert read_version(spark, p, 2).count() == 1  # fresh: retained
    assert read_version(spark, p, 3).count() == 1
    # once v2 ages out, a second vacuum reclaims it
    os.utime(os.path.join(p, "v=2"), (time.time() - 7200,) * 2)
    assert vacuum_versions(p, keep=1, min_age_s=3600) == [2]
    assert read_version(spark, p).count() == 1  # latest always survives


# ---------------------------------------------------------------------------
# code-review r9 fixes


def test_pyds_pushdown_non_ascii_value_not_dropped(spark, tmp_path):
    """The bytes prefilter must not fire on values whose JSON encoding
    is producer-dependent: 'Café' is raw UTF-8 from Spark's to_json but
    \\u-escaped from Python's json.dumps — both lines must survive a
    pushed equality (pre-fix, one encoding was silently dropped)."""
    from pyspark.sql import functions as F

    from project2_bigdata_spark.sources.pyds import read_jsonl_sales

    p = tmp_path / "uni.jsonl"
    raw = ('{"_id": {"$oid": "1"}, "saleDateRaw": '
           '"\\"2000-01-01T00:00:00Z\\"", '
           '"price": {"$numberDecimal": "1.50"}, '
           '"purchaseMethod": "Café"}\n')          # raw UTF-8
    esc = ('{"_id": {"$oid": "2"}, "saleDateRaw": '
           '"\\"2000-01-01T00:00:00Z\\"", '
           '"price": {"$numberDecimal": "1.50"}, '
           '"purchaseMethod": "Caf\\u00e9"}\n')          # \\u-escaped
    other = ('{"_id": {"$oid": "3"}, "saleDateRaw": '
             '"\\"2000-01-01T00:00:00Z\\"", '
             '"price": {"$numberDecimal": "1.50"}, '
             '"purchaseMethod": "Online"}\n')
    p.write_bytes(raw.encode("utf-8") + esc.encode("ascii")
                  + other.encode("ascii"))
    got = (read_jsonl_sales(spark, str(p), 2)
           .filter(F.col("purchase_method") == "Café").collect())
    assert sorted(r.sale_id for r in got) == ["1", "2"]
    # ASCII values still take the fast path and stay exact
    got2 = (read_jsonl_sales(spark, str(p), 2)
            .filter(F.col("purchase_method") == "Online").collect())
    assert [r.sale_id for r in got2] == ["3"]


def test_pyds_pushdown_null_field_sql_semantics(spark, tmp_path):
    """A NULL field under a pushed comparison must be EXCLUDED (SQL
    three-valued logic), not crash the scan with TypeError."""
    from pyspark.sql import functions as F

    from project2_bigdata_spark.sources.pyds import read_jsonl_sales

    p = tmp_path / "nulls.jsonl"
    lines = [
        '{"_id": {"$oid": "1"}, "saleDateRaw": "\\"2000-01-01T00:00:00Z\\"",'
        ' "price": {"$numberDecimal": "1.50"}, "purchaseMethod": null}',
        '{"_id": {"$oid": "2"}, "saleDateRaw": "\\"2000-01-01T00:00:00Z\\"",'
        ' "price": {"$numberDecimal": "2.50"}, "purchaseMethod": "Online"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl_sales(spark, str(p), 2)
    assert [r.sale_id for r in
            df.filter(F.col("purchase_method") > "A").collect()] == ["2"]
    assert [r.sale_id for r in
            df.filter(F.col("purchase_method").isin("Online")).collect()] \
        == ["2"]
    assert [r.sale_id for r in
            df.filter(F.col("purchase_method").isNotNull()).collect()] \
        == ["2"]


def test_vacuum_grace_protects_live_staging(spark, tmp_path):
    """With min_age_s, a FRESH staging dir (an in-flight merge) must
    survive vacuum; aged-out debris still reclaims."""
    import time

    from project2_bigdata_spark.sources.ingest import (
        vacuum_versions, write_versioned,
    )

    p = str(tmp_path / "t")
    write_versioned(_kv(spark, [(1, 1, "a")]), p)
    fresh = os.path.join(p, ".staged-v2-fresh")
    stale = os.path.join(p, ".staged-v2-stale")
    os.makedirs(fresh)
    os.makedirs(stale)
    os.utime(stale, (time.time() - 7200,) * 2)
    vacuum_versions(p, keep=1, min_age_s=3600)
    assert os.path.isdir(fresh)      # in-flight merge protected
    assert not os.path.exists(stale)  # crashed debris reclaimed
    vacuum_versions(p, keep=1)       # no grace => idle contract
    assert not os.path.exists(fresh)


def test_pyds_batch_overwrite_clears_stream_layout(spark, tmp_path):
    """Overwrite must clear EVERY data file the recursive reader sees —
    including a prior stream writer's batch=N/ subdirectories (pre-fix
    those rows were resurrected alongside the new data)."""
    import glob

    from project2_bigdata_spark.sources.pyds import (
        read_jsonl_sales, write_jsonl_sales,
    )

    sink = str(tmp_path / "sink")
    bdir = os.path.join(sink, "batch=0")
    os.makedirs(bdir)
    with open(os.path.join(bdir, "part-old.jsonl"), "w") as fh:
        fh.write('{"_id": {"$oid": "999"}, "saleDateRaw": '
                 '"\\"1990-01-01T00:00:00Z\\"", '
                 '"price": {"$numberDecimal": "9.99"}, '
                 '"purchaseMethod": "Stale"}\n')
    write_jsonl_sales(_sales_df(spark, 4), sink)
    back = read_jsonl_sales(spark, sink, 2)
    assert back.count() == 4
    assert not glob.glob(f"{sink}/batch=*")


def test_pyds_pushdown_in_prefix_plan_fully_consumed(spark, sf_dir):
    """In + StringStartsWith are both accepted by pushFilters — no
    Filter node survives for the registered query."""
    import re

    plan = _plan(spark, sf_dir, "pyds_pushdown_in_prefix_scan")
    assert "BatchScan p2bd_jsonl" in plan, plan
    assert not re.search(r"\bFilter\b", plan), plan
