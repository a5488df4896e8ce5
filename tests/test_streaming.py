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
