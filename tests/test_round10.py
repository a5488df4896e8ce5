"""Round-10 additions (VERDICT r9 next-round list + ADVICE r9):
MERGE DELETE (op-column CDC mode), timestamp time-travel, the
streaming Change-Data-Feed consumer, connector null round-trips,
stream-reader predicate pushdown, and the registry-rotation guard.
"""

from __future__ import annotations

import os

import pytest


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
