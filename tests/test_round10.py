"""Round-10 additions (VERDICT r9 next-round list + ADVICE r9):
MERGE DELETE (op-column CDC mode), timestamp time-travel, the
streaming Change-Data-Feed consumer, connector null round-trips,
stream-reader predicate pushdown, and the registry-rotation guard.
"""

from __future__ import annotations

import os

import pytest


def test_driver_order_rotates_every_query():
    """VERDICT r9 item 8: with a 50-query driver window per round and a
    staleness-ordered tail, EVERY registered query re-enters a window
    at least once every ceil(N/50) rounds — no query's correctness row
    can go stale indefinitely as the registry grows."""
    import math

    from project2_bigdata_spark.plans import REGISTRY, driver_order

    window, n = 50, len(REGISTRY)
    period = math.ceil(n / window)
    rows: dict = {}
    last_checked: dict = {}
    # warm start: drive until every name has been checked once
    for r in range(1, period + 1):
        for name in driver_order(rows)[:window]:
            rows[name] = ({"hash_match": True}, r)
            last_checked[name] = r
    assert set(last_checked) == set(REGISTRY)  # full coverage in period
    # steady state: staleness is bounded by the rotation period
    for r in range(period + 1, 4 * period + 1):
        for name in driver_order(rows)[:window]:
            rows[name] = ({"hash_match": True}, r)
            last_checked[name] = r
        stalest = min(last_checked.values())
        assert r - stalest < period, (
            f"round {r}: a query last checked in round {stalest} "
            f"exceeded the {period}-round rotation bound")


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, v string")


def _kvop(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, v string, op string")


# ---------------------------------------------------------------------------
# VERDICT r9 item 1: MERGE DELETE (op-column CDC mode)


def test_merge_delete_delta_wins_semantics(spark, tmp_path):
    """Bootstrap deletes no-op; a delete removes the key; within-batch
    the newest event wins (a delete can win that race); the op column
    never lands in the table; null op is an upsert."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_change_feed, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(
        spark, p,
        _kvop(spark, [(1, 10, "a", "U"), (2, 10, "b", "U"),
                      (3, 10, "c", "U"), (4, 5, "x", "D")]),
        keys=["k"], order_cols=["ts"], op_col="op")
    v1 = read_version(spark, p, 1)
    assert v1.columns == ["k", "ts", "v"]  # op column never lands
    assert sorted((r.k, r.v) for r in v1.collect()) == [
        (1, "a"), (2, "b"), (3, "c")]  # bootstrap delete no-ops

    merge_upsert(
        spark, p,
        _kvop(spark, [
            (1, 20, "a2", None),      # null op -> upsert
            (2, 20, None, "D"),       # plain delete
            (3, 20, "c2", "U"), (3, 30, None, "D"),  # delete wins race
            (5, 20, "e", "I"),        # insert
        ]),
        keys=["k"], order_cols=["ts"], op_col="op")
    assert sorted((r.k, r.v) for r in read_version(spark, p, 2).collect()) \
        == [(1, "a2"), (5, "e")]
    # the SINK's own path produces the feed's delete leg (pre-images)
    feed = read_change_feed(spark, p, ["k"], from_version=1)
    assert sorted((r.k, r._change_type, r.v) for r in feed.collect()) == [
        (1, "update_postimage", "a2"), (2, "delete", "b"),
        (3, "delete", "c"), (5, "insert", "e")]


def test_merge_delete_latest_wins_order_sensitivity(spark, tmp_path):
    """latest_wins: an out-of-order delete OLDER than the base row
    loses (the base survives); a delete NEWER than the base removes
    the key — exactly the upsert rules applied to delete events."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kvop(spark, [(1, 20, "a", "U"),
                                         (2, 20, "b", "U")]),
                 keys=["k"], order_cols=["ts"], op_col="op",
                 resolve="latest_wins")
    merge_upsert(spark, p, _kvop(spark, [(1, 15, None, "D"),
                                         (2, 30, None, "D")]),
                 keys=["k"], order_cols=["ts"], op_col="op",
                 resolve="latest_wins")
    assert sorted((r.k, r.v) for r in read_version(spark, p, 2).collect()) \
        == [(1, "a")]  # stale delete lost; fresh delete won


def test_merge_delete_racing_writers(spark, tmp_path):
    """The optimistic-commit loop replays DELETES too: writer A's
    delete of k=2 loses the version race to writer B's update of k=3,
    re-runs against B's snapshot, and the final state carries BOTH —
    B's update survives, k=2 is gone."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p,
                 _kv(spark, [(1, 10, "one"), (2, 10, "two"),
                             (3, 10, "three")]),
                 keys=["k"], order_cols=["ts"])

    def race(attempt, target):
        if attempt == 0:
            merge_upsert(spark, p, _kv(spark, [(3, 20, "writerB")]),
                         keys=["k"], order_cols=["ts"])

    final = merge_upsert(spark, p, _kvop(spark, [(2, 20, None, "D")]),
                         keys=["k"], order_cols=["ts"], op_col="op",
                         pre_commit_hook=race)
    assert final == 3
    assert {r.k: r.v for r in read_version(spark, p).collect()} == {
        1: "one", 3: "writerB"}


def test_merge_delete_op_col_missing_raises(spark, tmp_path):
    from project2_bigdata_spark.sources.ingest import merge_upsert

    with pytest.raises(ValueError, match="op_col"):
        merge_upsert(spark, str(tmp_path / "t"),
                     _kv(spark, [(1, 10, "a")]),
                     keys=["k"], order_cols=["ts"], op_col="nope")


def _sales_df(spark, rows):
    return spark.createDataFrame(
        rows, "sale_id string, sale_ts string, total_price double, "
              "purchase_method string")


# ---------------------------------------------------------------------------
# ADVICE r9 item 1: connector nulls round-trip instead of crashing


@pytest.mark.slow
def test_pyds_null_fields_roundtrip(spark, tmp_path):
    """Every sale column is nullable: the writer serializes None as
    JSON null (it used to crash on row[1].replace / the %.2f format),
    and the reader maps JSON null (or an absent key — Spark's to_json
    omits null struct fields) back to SQL NULL. A read→write→read
    pipeline is closed over its own nulls."""
    from project2_bigdata_spark.sources.pyds import (
        read_jsonl_sales, write_jsonl_sales,
    )

    rows = [
        ("1", "2000-01-01 00:00:00", 1.25, "Online"),
        (None, "2000-01-02 00:00:00", 2.50, "InStore"),
        ("3", None, 3.75, "Phone"),
        ("4", "2000-01-04 00:00:00", None, "Online"),
        ("5", "2000-01-05 00:00:00", 5.25, None),
        (None, None, None, None),
    ]
    out = str(tmp_path / "export")
    os.makedirs(out)
    write_jsonl_sales(_sales_df(spark, rows), out)
    back = sorted(map(tuple, read_jsonl_sales(spark, out, 3).collect()),
                  key=str)
    assert back == sorted(rows, key=str)
    # second hop: the reader's output written again (the ADVICE
    # pipeline shape) — still lossless
    out2 = str(tmp_path / "export2")
    os.makedirs(out2)
    write_jsonl_sales(read_jsonl_sales(spark, out, 3), out2)
    back2 = sorted(map(tuple, read_jsonl_sales(spark, out2, 3).collect()),
                   key=str)
    assert back2 == back


@pytest.mark.slow
def test_pyds_pushdown_three_valued_on_null_rows(spark, tmp_path):
    """Pushed predicates drop NULL rows (SQL semantics) instead of
    crashing, including through the bytes-level prefilter path."""
    from pyspark.sql import functions as F

    from project2_bigdata_spark.sources.pyds import (
        read_jsonl_sales, write_jsonl_sales,
    )

    rows = [
        ("1", "2000-01-01 00:00:00", 1.25, "Online"),
        ("2", "2000-01-02 00:00:00", 2.50, None),
        (None, "2000-01-03 00:00:00", None, "Online"),
    ]
    out = str(tmp_path / "export")
    os.makedirs(out)
    write_jsonl_sales(_sales_df(spark, rows), out)
    got = read_jsonl_sales(spark, out, 2).filter(
        F.col("purchase_method") == "Online")
    assert sorted(r.sale_ts for r in got.collect()) == [
        "2000-01-01 00:00:00", "2000-01-03 00:00:00"]
    got2 = read_jsonl_sales(spark, out, 2).filter(
        F.col("total_price") > 1.0)
    assert sorted(r.sale_id for r in got2.collect()) == ["1", "2"]


# ---------------------------------------------------------------------------
# ADVICE r9 item 3: torn overwrite is detectable as uncommitted


def test_pyds_overwrite_drops_success_before_deleting(spark, tmp_path):
    """The overwrite commit removes the previous _SUCCESS BEFORE
    deleting old part files: a crash mid-overwrite leaves the directory
    detectably uncommitted instead of a committed-looking
    partially-emptied table."""
    from project2_bigdata_spark.sources.pyds import (
        JsonlSaleWriter, _FileCommit, write_jsonl_sales,
    )

    out = str(tmp_path / "export")
    os.makedirs(out)
    write_jsonl_sales(_sales_df(
        spark, [("1", "2000-01-01 00:00:00", 1.0, "Online")]), out)
    assert os.path.exists(f"{out}/_SUCCESS")

    # drive a commit whose publish step crashes (staged file missing)
    w = JsonlSaleWriter({"path": out}, overwrite=True)
    with pytest.raises(FileNotFoundError):
        w.commit([_FileCommit("part-00000-missing.jsonl")])
    # the table is now (correctly) uncommitted — no stale _SUCCESS
    assert not os.path.exists(f"{out}/_SUCCESS")


# ---------------------------------------------------------------------------
# VERDICT r9 What's-wrong #1: the mongoexport fixture is built once


def test_shared_mongoexport_builds_once_per_session(spark, sf_dir):
    """The four single-file connector queries share one coalesce(1)
    export per (session, sf_dir) — the bench measures the connector,
    not repeated fixture construction."""
    from project2_bigdata_spark.sources.ingest import shared_mongoexport

    p1 = shared_mongoexport(spark, sf_dir)
    m1 = os.path.getmtime(p1)
    p2 = shared_mongoexport(spark, sf_dir)
    assert p2 == p1 and os.path.getmtime(p2) == m1  # cache hit, no rebuild


# ---------------------------------------------------------------------------
# VERDICT r9 item 4: time travel by timestamp


def test_read_version_as_of(spark, tmp_path):
    """timestampAsOf semantics: latest commit at-or-before ts; exact
    mtime boundary is INCLUSIVE; pre-first-commit and vacuumed-out
    timestamps raise (the retention horizon)."""
    import datetime

    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_version_as_of, vacuum_versions,
    )

    p = str(tmp_path / "t")
    for i, ts in enumerate([1000, 2000, 3000], start=1):
        merge_upsert(spark, p, _kv(spark, [(1, i, f"v{i}")]),
                     keys=["k"], order_cols=["ts"])
        # pin commit times: the r11 _commit_ts stamp is the
        # authoritative clock; utime pins the mtime fallback too
        with open(f"{p}/v={i}/_commit_ts", "w") as f:
            f.write(str(ts))
        os.utime(f"{p}/v={i}", (ts, ts))

    def val(ts):
        return read_version_as_of(spark, p, ts).collect()[0].v

    assert val(1999.9) == "v1"
    assert val(2000) == "v2"          # exact boundary inclusive
    assert val(50_000) == "v3"
    # datetime / ISO-string inputs resolve through the same clock
    dt = datetime.datetime.fromtimestamp(2500)
    assert val(dt) == "v2"
    assert val(dt.isoformat()) == "v2"
    with pytest.raises(FileNotFoundError, match="at or before"):
        read_version_as_of(spark, p, 999)
    vacuum_versions(p, keep=2)  # drops v1
    with pytest.raises(FileNotFoundError, match="at or before"):
        read_version_as_of(spark, p, 1500)  # vacuumed out of retention
    assert val(2000) == "v2"  # retained window still serves


# ---------------------------------------------------------------------------
# VERDICT r9 item 5: incremental CDF consumer — kill/resume exactness


def test_consume_change_feed_restart_no_dup_no_skip(spark, tmp_path):
    """A crash between the sink write and the checkpoint advance
    re-emits exactly that commit as an idempotent overwrite: across
    kill/resume every commit lands exactly once, in order."""
    from project2_bigdata_spark.sources.ingest import (
        consume_change_feed, merge_upsert, read_consumed_feed,
    )

    p = str(tmp_path / "t")
    for i in range(1, 5):  # 4 commits: k=1 updated each time, k=i born
        merge_upsert(spark, p,
                     _kv(spark, [(1, i, f"upd{i}"), (i + 1, i, f"new{i}")]),
                     keys=["k"], order_cols=["ts"])
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")

    boom = {"armed": True}

    def crash_before_ck(v):
        if v == 3 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash")

    with pytest.raises(RuntimeError, match="injected"):
        consume_change_feed(spark, p, ["k"], ck, sink, start_version=1,
                            pre_checkpoint_hook=crash_before_ck)
    # commit 2 checkpointed; commit 3's dir written but unacknowledged
    with open(f"{ck}/last_commit") as f:
        assert f.read() == "2"
    # resume: re-emits 3 (overwrite), continues with 4 — nothing skipped
    assert consume_change_feed(
        spark, p, ["k"], ck, sink, start_version=1) == [3, 4]
    got = sorted((r._commit_version, r.k, r._change_type, r.v)
                 for r in read_consumed_feed(spark, sink).collect())
    assert got == [
        (2, 1, "update_postimage", "upd2"), (2, 3, "insert", "new2"),
        (3, 1, "update_postimage", "upd3"), (3, 4, "insert", "new3"),
        (4, 1, "update_postimage", "upd4"), (4, 5, "insert", "new4"),
    ]
    # idle pull: nothing re-emitted
    assert consume_change_feed(spark, p, ["k"], ck, sink,
                               start_version=1) == []


def test_consume_change_feed_bootstrap_and_growth(spark, tmp_path):
    """Without start_version the earliest retained snapshot bootstraps
    the feed as all-insert rows; commits landing between pulls arrive
    as exactly the new commits' changes."""
    from project2_bigdata_spark.sources.ingest import (
        consume_change_feed, merge_upsert, read_consumed_feed,
        vacuum_versions,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(1, 1, "a"), (2, 1, "b")]),
                 keys=["k"], order_cols=["ts"])
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    assert consume_change_feed(spark, p, ["k"], ck, sink) == [1]
    got = sorted((r._commit_version, r.k, r._change_type)
                 for r in read_consumed_feed(spark, sink).collect())
    assert got == [(1, 1, "insert"), (1, 2, "insert")]
    # growth between pulls
    merge_upsert(spark, p, _kv(spark, [(2, 2, "b2")]),
                 keys=["k"], order_cols=["ts"])
    assert consume_change_feed(spark, p, ["k"], ck, sink) == [2]
    assert read_consumed_feed(spark, sink).count() == 3
    # a vacuumed-out checkpoint raises instead of silently jumping
    merge_upsert(spark, p, _kv(spark, [(3, 3, "c")]),
                 keys=["k"], order_cols=["ts"])
    merge_upsert(spark, p, _kv(spark, [(4, 4, "d")]),
                 keys=["k"], order_cols=["ts"])
    vacuum_versions(p, keep=1)
    with pytest.raises(FileNotFoundError, match="retention"):
        consume_change_feed(spark, p, ["k"], ck, sink)


# ---------------------------------------------------------------------------
# Bucket-level copy-on-write merge


def test_bucketed_merge_equals_full_merge(spark, tmp_path):
    """The copy-on-write path is semantics-preserving: applying the
    same batches (updates, inserts, op-column deletes) through
    merge_upsert_bucketed and merge_upsert yields identical final
    states (modulo the layout's _bucket column)."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, merge_upsert_bucketed, read_version,
    )

    b1 = [(k, 10, f"base{k}", "U") for k in range(40)]
    b2 = ([(k, 20, f"upd{k}", "U") for k in range(0, 10)]
          + [(k, 20, None, "D") for k in range(10, 15)]
          + [(k, 20, f"new{k}", "I") for k in range(40, 50)]
          + [(7, 30, "upd7b", "U")])  # within-batch race on k=7

    pb, pf = str(tmp_path / "bucketed"), str(tmp_path / "full")
    for batch in (b1, b2):
        merge_upsert_bucketed(spark, pb, _kvop(spark, batch),
                              keys=["k"], order_cols=["ts"],
                              n_buckets=8, op_col="op")
        merge_upsert(spark, pf, _kvop(spark, batch),
                     keys=["k"], order_cols=["ts"], op_col="op")
    got = sorted(map(tuple, read_version(spark, pb, 2)
                     .drop("_bucket").collect()))
    want = sorted(map(tuple, read_version(spark, pf, 2).collect()))
    assert got == want and len(got) == 45  # 40 - 5 deleted + 10 new


def test_bucketed_merge_hardlinks_untouched_buckets(spark, tmp_path):
    """The zero-copy claim, proven at the inode level: a merge touching
    ONE key rewrites only that key's bucket — every other bucket's
    files in v=2 are HARDLINKS of v=1's (same st_ino), not copies."""
    import glob

    from project2_bigdata_spark.sources.ingest import (
        merge_upsert_bucketed, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert_bucketed(
        spark, p, _kv(spark, [(k, 10, f"v{k}") for k in range(64)]),
        keys=["k"], order_cols=["ts"], n_buckets=8)
    merge_upsert_bucketed(spark, p, _kv(spark, [(3, 20, "updated")]),
                          keys=["k"], order_cols=["ts"], n_buckets=8)

    def inodes(version):
        return {
            os.path.relpath(f, f"{p}/v={version}"): os.stat(f).st_ino
            for f in glob.glob(f"{p}/v={version}/_bucket=*/*.parquet")
        }

    i1, i2 = inodes(1), inodes(2)
    touched = {os.path.dirname(f) for f in set(i2) - set(i1)}
    shared = {f for f in i2 if f in i1 and i2[f] == i1[f]}
    rewritten = {f for f in i2 if os.path.dirname(f) in touched}
    assert len(touched) == 1            # exactly one bucket rewritten
    assert shared == set(i2) - rewritten  # every other file hardlinked
    assert len(shared) >= 6             # several untouched buckets
    got = {r.k: r.v for r in read_version(spark, p, 2).collect()}
    assert got[3] == "updated" and len(got) == 64


def test_bucketed_merge_base_read_is_partition_pruned(spark, tmp_path):
    """The scale claim in the PLAN: the merge's base read carries the
    touched-bucket predicate as PartitionFilters on the v=N scan —
    untouched buckets' files are never opened, let alone shuffled."""
    from pyspark.sql import functions as F

    from project2_bigdata_spark.sources.ingest import merge_upsert_bucketed

    p = str(tmp_path / "t")
    merge_upsert_bucketed(
        spark, p, _kv(spark, [(k, 10, f"v{k}") for k in range(64)]),
        keys=["k"], order_cols=["ts"], n_buckets=8)
    # the exact read shape _merged_touched builds, for a 1-key delta
    bucket = F.pmod(F.hash(F.lit(3)), F.lit(8)).cast("int")
    touched = [spark.range(1).select(bucket).first()[0]]
    base = (spark.read.parquet(f"{p}/v=1")
            .filter(F.col("_bucket").isin(touched)))
    plan = base._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "_bucket" in m.group(1), plan
    # and the scan actually prunes: one bucket's worth of rows
    assert 0 < base.count() < 64


@pytest.mark.slow
def test_delete_everything_yields_readable_empty_snapshot(spark, tmp_path):
    """A merge whose delta deletes every remaining key commits an
    EMPTY version; the schema marker keeps it readable (and the change
    feed emits the full delete leg) through both merge paths."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, merge_upsert_bucketed, read_change_feed,
        read_version,
    )

    for name, fn in (("plain", merge_upsert),
                     ("bucketed", merge_upsert_bucketed)):
        p = str(tmp_path / name)
        kw = {} if name == "plain" else {"n_buckets": 4}
        fn(spark, p, _kvop(spark, [(1, 10, "a", "U"), (2, 10, "b", "U")]),
           keys=["k"], order_cols=["ts"], op_col="op", **kw)
        fn(spark, p, _kvop(spark, [(1, 20, None, "D"), (2, 20, None, "D")]),
           keys=["k"], order_cols=["ts"], op_col="op", **kw)
        empty = read_version(spark, p, 2)
        assert empty.count() == 0
        assert "k" in empty.columns and "v" in empty.columns
        feed = read_change_feed(spark, p, ["k"], from_version=1)
        assert sorted((r.k, r._change_type) for r in feed.collect()) == [
            (1, "delete"), (2, "delete")], name
        # and the table is still writable after being emptied
        fn(spark, p, _kvop(spark, [(3, 30, "c", "U")]),
           keys=["k"], order_cols=["ts"], op_col="op", **kw)
        assert [(r.k, r.v) for r in read_version(spark, p, 3).collect()] \
            == [(3, "c")], name


def test_optimize_racing_merge_loses_cleanly(spark, tmp_path):
    """OPTIMIZE and MERGE race through the same exactly-base+1 commit:
    when an optimize lands first, the merge retries against the
    compacted snapshot and no rows are lost or duplicated."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, optimize_version, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p,
                 _kv(spark, [(k, 10, f"v{k}") for k in range(8)]),
                 keys=["k"], order_cols=["ts"])

    def race(attempt, target):
        if attempt == 0:
            assert optimize_version(spark, p) == 2  # sneaks in first

    final = merge_upsert(spark, p, _kv(spark, [(1, 20, "upd")]),
                         keys=["k"], order_cols=["ts"],
                         pre_commit_hook=race)
    assert final == 3
    got = {r.k: r.v for r in read_version(spark, p).collect()}
    assert len(got) == 8 and got[1] == "upd" and got[7] == "v7"


def test_vacuum_keeps_hardlinked_successor_readable(spark, tmp_path):
    """Hardlinks make vacuum safe by construction: dropping the base
    version only decrements link counts — the successor's shared
    bucket files keep their data."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert_bucketed, read_version, vacuum_versions,
    )

    p = str(tmp_path / "t")
    merge_upsert_bucketed(
        spark, p, _kv(spark, [(k, 10, f"v{k}") for k in range(32)]),
        keys=["k"], order_cols=["ts"], n_buckets=8)
    merge_upsert_bucketed(spark, p, _kv(spark, [(1, 20, "upd")]),
                          keys=["k"], order_cols=["ts"], n_buckets=8)
    assert vacuum_versions(p, keep=1) == [1]
    got = {r.k: r.v for r in read_version(spark, p, 2).collect()}
    assert len(got) == 32 and got[1] == "upd" and got[20] == "v20"


def test_bucketed_merge_layout_contract(spark, tmp_path):
    """n_buckets / keys are recorded at first commit; a merge with a
    different bucket function refuses instead of pruning wrongly."""
    from project2_bigdata_spark.sources.ingest import merge_upsert_bucketed

    p = str(tmp_path / "t")
    merge_upsert_bucketed(spark, p, _kv(spark, [(1, 10, "a")]),
                          keys=["k"], order_cols=["ts"], n_buckets=8)
    with pytest.raises(ValueError, match="layout"):
        merge_upsert_bucketed(spark, p, _kv(spark, [(2, 20, "b")]),
                              keys=["k"], order_cols=["ts"], n_buckets=16)


def test_bucketed_merge_quarantines_torn_successor(spark, tmp_path):
    """A crash-torn (uncommitted) directory squatting on the successor
    version name is quarantined aside — without this every retry's
    rename fails and the merge wedges."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert_bucketed, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert_bucketed(spark, p, _kv(spark, [(1, 10, "a")]),
                          keys=["k"], order_cols=["ts"], n_buckets=4)
    os.makedirs(f"{p}/v=2/_bucket=0")  # torn debris, no _SUCCESS
    with open(f"{p}/v=2/_bucket=0/part-junk.parquet", "w") as f:
        f.write("torn")
    assert merge_upsert_bucketed(
        spark, p, _kv(spark, [(2, 20, "b")]),
        keys=["k"], order_cols=["ts"], n_buckets=4) == 2
    assert {r.k for r in read_version(spark, p, 2).collect()} == {1, 2}


def test_bucketed_merge_latest_wins_matches_plain(spark, tmp_path):
    """latest_wins through the shared resolve core, over the pruned
    bucket slice: out-of-order batches (stale update, stale delete,
    fresh delete) resolve identically to the full-snapshot merge —
    key-hash bucketing means a key's full picture lives in one
    bucket, so slice-local resolution is complete."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, merge_upsert_bucketed, read_version,
    )

    batches = [
        [(1, 20, "a", "U"), (2, 20, "b", "U"), (3, 20, "c", "U")],
        # out-of-order: stale update for 1, stale delete for 2,
        # fresh delete for 3
        [(1, 10, "STALE", "U"), (2, 15, None, "D"), (3, 30, None, "D")],
    ]
    pb, pf = str(tmp_path / "b"), str(tmp_path / "f")
    for batch in batches:
        merge_upsert_bucketed(spark, pb, _kvop(spark, batch),
                              keys=["k"], order_cols=["ts"], n_buckets=4,
                              op_col="op", resolve="latest_wins")
        merge_upsert(spark, pf, _kvop(spark, batch),
                     keys=["k"], order_cols=["ts"], op_col="op",
                     resolve="latest_wins")
    got = sorted(map(tuple, read_version(spark, pb, 2)
                     .drop("_bucket").collect()))
    want = sorted(map(tuple, read_version(spark, pf, 2).collect()))
    assert got == want == [(1, 20, "a"), (2, 20, "b")]


def test_bucketed_merge_racing_writers(spark, tmp_path):
    """Disjoint-bucket racers still serialize through the exactly-
    base+1 commit: the loser re-merges against the winner's snapshot
    and BOTH deltas land."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert_bucketed, read_version,
    )

    p = str(tmp_path / "t")
    merge_upsert_bucketed(
        spark, p, _kv(spark, [(k, 10, "base") for k in range(8)]),
        keys=["k"], order_cols=["ts"], n_buckets=8)

    def race(attempt, target):
        if attempt == 0:
            merge_upsert_bucketed(spark, p, _kv(spark, [(1, 20, "writerB")]),
                                  keys=["k"], order_cols=["ts"], n_buckets=8)

    final = merge_upsert_bucketed(
        spark, p, _kv(spark, [(2, 20, "writerA")]),
        keys=["k"], order_cols=["ts"], n_buckets=8, pre_commit_hook=race)
    assert final == 3
    got = {r.k: r.v for r in read_version(spark, p).collect()}
    assert got[1] == "writerB" and got[2] == "writerA"


# ---------------------------------------------------------------------------
# CDF replication: feed → replica, per commit


def test_apply_change_feed_replicates_through_delete_and_rebirth(
        spark, tmp_path):
    """Commit-ordered apply: a key deleted in commit 2 and re-inserted
    in commit 3 survives; a key updated in 2 and deleted in 3 is gone.
    (A collapsed apply would get one of these wrong.)"""
    from project2_bigdata_spark.sources.ingest import (
        apply_change_feed, merge_upsert, read_change_feed, read_version,
    )

    src = str(tmp_path / "src")
    merge_upsert(spark, src, _kv(spark, [(1, 10, "a"), (2, 10, "b")]),
                 keys=["k"], order_cols=["ts"])
    merge_upsert(spark, src,
                 _kvop(spark, [(1, 20, None, "D"), (2, 20, "b2", "U")]),
                 keys=["k"], order_cols=["ts"], op_col="op")
    merge_upsert(spark, src,
                 _kvop(spark, [(1, 30, "a3", "I"), (2, 30, None, "D")]),
                 keys=["k"], order_cols=["ts"], op_col="op")

    replica = str(tmp_path / "replica")
    merge_upsert(spark, replica, read_version(spark, src, 1), keys=["k"])
    assert apply_change_feed(
        spark, replica, ["k"],
        read_change_feed(spark, src, ["k"], from_version=1)) == 3
    got = sorted(map(tuple, read_version(spark, replica).collect()))
    want = sorted(map(tuple, read_version(spark, src, 3).collect()))
    assert got == want == [(1, 30, "a3")]


# ---------------------------------------------------------------------------
# Lakehouse maintenance verbs: OPTIMIZE and RESTORE


def test_optimize_version_compacts_without_changing_values(spark, tmp_path):
    """OPTIMIZE bin-packs the latest snapshot into a NEW version:
    fewer files, identical content, old versions untouched, and the
    change feed sees an empty diff (no rows changed)."""
    import glob

    from project2_bigdata_spark.sources.ingest import (
        commit_version, optimize_version, read_change_feed, read_version,
    )

    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, 1, f"v{i}") for i in range(200)],
        "k int, ts int, v string")
    # the micro-batch-MERGE shape: a snapshot fragmented across many
    # small files (explicit repartition — AQE does not coalesce it)
    assert commit_version(df.repartition(16), p, 1)
    assert len(glob.glob(f"{p}/v=1/part-*")) == 16
    new_v = optimize_version(spark, p, target_file_mb=128)
    assert new_v == 2
    assert len(glob.glob(f"{p}/v=2/part-*")) == 1  # tiny table: 1 file
    before = sorted(map(tuple, read_version(spark, p, 1).collect()))
    after = sorted(map(tuple, read_version(spark, p, 2).collect()))
    assert after == before
    # the compaction commit is change-free in the feed
    assert read_change_feed(spark, p, ["k"], from_version=1).count() == 0


def test_restore_version_rolls_forward(spark, tmp_path):
    """RESTORE commits the old snapshot as a NEW latest version:
    history is preserved (the bad version stays pinned-readable) and
    the feed records the restore as ordinary changes."""
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_change_feed, read_version, restore_version,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(1, 10, "good"), (2, 10, "keep")]),
                 keys=["k"], order_cols=["ts"])
    merge_upsert(spark, p, _kv(spark, [(1, 20, "BAD"), (3, 20, "OOPS")]),
                 keys=["k"], order_cols=["ts"])
    assert restore_version(spark, p, 1) == 3
    assert {r.k: r.v for r in read_version(spark, p).collect()} == {
        1: "good", 2: "keep"}
    # bad version still pinned-readable; feed shows the rollback legs
    assert read_version(spark, p, 2).count() == 3
    feed = read_change_feed(spark, p, ["k"], from_version=2)
    got = sorted((r.k, r._change_type) for r in feed.collect())
    assert got == [(1, "update_postimage"), (3, "delete")]


def test_optimize_and_restore_preserve_bucket_layout(spark, tmp_path):
    """The data-loss regression: OPTIMIZE/RESTORE on a bucketed table
    must keep the _bucket=K partition dirs — copy-on-write carries
    untouched buckets ONLY by hardlinking those dirs, so a layout-
    destroying compaction would make the next merge silently drop
    every untouched key."""
    import glob

    from project2_bigdata_spark.sources.ingest import (
        merge_upsert_bucketed, optimize_version, read_version,
        restore_version,
    )

    p = str(tmp_path / "t")
    merge_upsert_bucketed(
        spark, p, _kv(spark, [(k, 10, f"v{k}") for k in range(64)]),
        keys=["k"], order_cols=["ts"], n_buckets=8)
    assert optimize_version(spark, p) == 2
    assert len(glob.glob(f"{p}/v=2/_bucket=*")) == 8  # layout kept
    # the critical composition: a merge AFTER optimize keeps all rows
    merge_upsert_bucketed(spark, p, _kv(spark, [(3, 20, "updated")]),
                          keys=["k"], order_cols=["ts"], n_buckets=8)
    got = {r.k: r.v for r in read_version(spark, p, 3).collect()}
    assert len(got) == 64 and got[3] == "updated" and got[60] == "v60"
    # restore back past the merge: layout kept, merge still composes
    assert restore_version(spark, p, 2) == 4
    assert len(glob.glob(f"{p}/v=4/_bucket=*")) == 8
    merge_upsert_bucketed(spark, p, _kv(spark, [(5, 30, "after")]),
                          keys=["k"], order_cols=["ts"], n_buckets=8)
    got = {r.k: r.v for r in read_version(spark, p, 5).collect()}
    assert len(got) == 64 and got[3] == "v3" and got[5] == "after"


# ---------------------------------------------------------------------------
# Tombstone deletes: order-independence the hard delete cannot give


def test_tombstone_deletes_survive_out_of_order_replay(spark, tmp_path):
    """A delete event REPLAYED BEFORE an older upsert (multi-file
    sources replay in file order, not event time): carried as a
    tombstone ROW through latest_wins, the delete keeps its ordering
    information — the stale upsert loses the merge and the user stays
    deleted. A hard (physical) delete would have resurrected the key,
    which is why the streaming path uses tombstones."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from project2_bigdata_spark.sources.ingest import read_version
    from project2_bigdata_spark.streaming.upsert import (
        stream_upsert_to_dimension,
    )

    src = tmp_path / "cdc"
    src.mkdir()

    def write_file(name, rows, mtime):
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int32()),
            "last_ts": pa.array([r[1] for r in rows], pa.int32()),
            "last_event_id": pa.array([r[2] for r in rows], pa.int32()),
            "_deleted": pa.array([r[3] for r in rows], pa.bool_()),
        })
        p = src / name
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    now = time.time()
    # file replayed FIRST carries the NEWEST event: user 42's erasure
    # (ts=100) and user 7's latest upsert (ts=80)
    write_file("a.parquet", [(42, 100, 9, True), (7, 80, 8, False)],
               now - 100)
    # file replayed SECOND carries OLDER events for both users
    write_file("b.parquet", [(42, 50, 3, False), (7, 60, 5, False)],
               now - 50)

    sdf = (spark.readStream
           .schema("user_id int, last_ts int, last_event_id int, "
                   "_deleted boolean")
           .option("maxFilesPerTrigger", "1").parquet(str(src)))
    dim = str(tmp_path / "dim")
    stream_upsert_to_dimension(
        sdf, dim, keys=["user_id"],
        order_cols=["last_ts", "last_event_id"],
        checkpoint=str(tmp_path / "ck"))

    state = read_version(spark, dim)
    live = {r.user_id: r.last_ts
            for r in state.filter(~F.col("_deleted")).collect()}
    assert live == {7: 80}  # 42 stays deleted; 7 keeps its newest row
    # the tombstone row itself is retained (GC is vacuum's job)
    assert state.filter(F.col("_deleted")).count() == 1


# ---------------------------------------------------------------------------
# VERDICT r9 item 7: options-level predicate for the streaming reader


@pytest.mark.slow
def test_stream_eq_filters_selective_replay(spark, tmp_path):
    """eq_filters runs the batch reader's compiled predicate (and byte
    prefilter for string equalities) inside the STREAM reader: only
    matching rows cross into the JVM, across restarts of a growing
    source."""
    from project2_bigdata_spark.sources.pyds import (
        _sale_to_line, stream_jsonl_sales, write_jsonl_sales,
    )

    rows = [(str(i), f"2000-01-{(i % 27) + 1:02d} 00:00:00",
             float(i) + 0.25, ["Online", "InStore", "Phone"][i % 3])
            for i in range(1, 31)]
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    write_jsonl_sales(_sales_df(spark, rows).coalesce(1), src_dir)
    import glob
    src = glob.glob(f"{src_dir}/part-*.jsonl")[0]

    spool, ck = str(tmp_path / "spool"), str(tmp_path / "ck")
    os.makedirs(spool)

    def drain():
        q = (stream_jsonl_sales(spark, src,
                                eq={"purchase_method": "Online",
                                    "total_price": 6.25})
             .writeStream
             .foreachBatch(lambda df, bid: df.write.mode("overwrite")
                           .parquet(f"{spool}/batch={bid}"))
             .trigger(availableNow=True)
             .option("checkpointLocation", ck).start())
        q.awaitTermination()

    drain()
    got = sorted(r.sale_id for r in spark.read.parquet(spool).collect())
    assert got == ["6"]  # i=6: Online AND price 6.25
    # growing source: appended rows arrive filtered on the next run
    with open(src, "ab") as fh:
        fh.write(_sale_to_line(("99", "2000-02-01 00:00:00",
                                6.25, "Online")))
        fh.write(_sale_to_line(("100", "2000-02-01 00:00:00",
                                6.25, "Phone")))
    drain()
    got = sorted(r.sale_id for r in spark.read.parquet(spool).collect())
    assert got == ["6", "99"]


def test_stream_eq_filters_unknown_column_raises(spark, tmp_path):
    from project2_bigdata_spark.sources.pyds import _eq_filters_from_options

    with pytest.raises(ValueError, match="unknown columns"):
        _eq_filters_from_options({"eq_filters": '{"nope": 1}'})


# ---------------------------------------------------------------------------
# ADVICE r9 item 2: explicit to_version beyond the latest commit raises


def test_read_change_feed_to_version_beyond_latest_raises(spark, tmp_path):
    from project2_bigdata_spark.sources.ingest import (
        merge_upsert, read_change_feed,
    )

    p = str(tmp_path / "t")
    merge_upsert(spark, p, _kv(spark, [(1, 10, "a")]),
                 keys=["k"], order_cols=["ts"])
    merge_upsert(spark, p, _kv(spark, [(1, 20, "b")]),
                 keys=["k"], order_cols=["ts"])
    # valid explicit endpoint still works
    assert read_change_feed(
        spark, p, ["k"], from_version=1, to_version=2).count() == 1
    with pytest.raises(FileNotFoundError, match="version 5"):
        read_change_feed(spark, p, ["k"], from_version=1, to_version=5)
