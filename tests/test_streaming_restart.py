"""Kill/resume idempotence for the streaming sketch sinks (VERDICT r7
item 1).

foreachBatch is AT-LEAST-ONCE: a micro-batch whose sink write succeeded
but whose checkpoint commit did not is replayed after a restart. The
runner's append sink therefore writes each batch under
``spool/batch=<id>/`` with per-directory overwrite, so a replayed batch
rewrites its own files instead of double-appending. These tests inject
a crash exactly into the at-least-once window — AFTER the spill, BEFORE
Spark commits the batch — restart from the same checkpoint, and assert
the final sketch tables are value-identical to an uninterrupted run.
Without the per-batch overwrite, the replayed KLL batch row would
double-weight its values (sum(n) inflated, quantiles skewed); theta
would survive only by accident of union idempotence.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql import functions as F

from project2_bigdata_spark.catalog import table
from project2_bigdata_spark.streaming.windows import (
    kll_quantiles_from_sink,
    kll_sketch_sink,
    theta_daily_from_sink,
    theta_sketch_sink,
)

N_FILES = 4  # → N_FILES micro-batches at maxFilesPerTrigger=1


@pytest.fixture(scope="module")
def multi_sf(spark, sf_dir, tmp_path_factory) -> str:
    """An sf-dir whose events table is a DIRECTORY of N_FILES part
    files: the single-file driver testdata yields only one micro-batch,
    which cannot exercise resume-after-partial-progress."""
    root = tmp_path_factory.mktemp("restart_sf")
    (
        table(spark, sf_dir, "events")
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(str(root / "events.parquet"))
    )
    return str(root)


def _crash_after_batch(batch_id: int):
    """Fault injector: crash in the write-committed/offset-uncommitted
    window of micro-batch ``batch_id``."""

    def hook(bid: int) -> None:
        if bid == batch_id:
            raise RuntimeError(
                f"injected crash after spilling batch {bid}, before commit")

    return hook


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def _run_killed_then_resumed(spark, multi_sf, sink_fn, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    spool = str(tmp_path / "spool")
    with pytest.raises((StreamingQueryException, Exception)) as exc:
        sink_fn(spark, multi_sf, checkpoint=ckpt, spool=spool,
                post_spill_hook=_crash_after_batch(1))
    assert "injected crash" in str(exc.value)
    # the crash landed after batch 1's spill: its files are on disk but
    # its offset is uncommitted — the restart MUST replay it
    assert os.path.isdir(os.path.join(spool, "batch=1"))
    return sink_fn(spark, multi_sf, checkpoint=ckpt, spool=spool)


def test_kll_sink_idempotent_on_restart(spark, multi_sf, tmp_path):
    uninterrupted = kll_sketch_sink(spark, multi_sf)
    ref = _rows(kll_quantiles_from_sink(uninterrupted), "n_events")
    ref_total = uninterrupted.agg(F.sum("n")).collect()[0][0]

    resumed = _run_killed_then_resumed(
        spark, multi_sf, kll_sketch_sink, tmp_path)
    # one sketch row per micro-batch — the replayed batch 1 did NOT
    # double-append (this is the assertion that fails on the old
    # append-mode sink)
    assert resumed.count() == N_FILES
    assert resumed.agg(F.sum("n")).collect()[0][0] == ref_total
    assert _rows(kll_quantiles_from_sink(resumed), "n_events") == ref
    # exactly one batch directory per micro-batch id
    batch_dirs = sorted(glob.glob(os.path.join(str(tmp_path), "spool", "batch=*")))
    assert len(batch_dirs) == N_FILES


@pytest.mark.slow
def test_stream_scd1_bucketed_cow_idempotent_on_restart(
        spark, multi_sf, tmp_path):
    """The r10 copy-on-write streaming sink keeps the r8 restart
    contract: a replayed micro-batch re-merges through the bucketed
    path (latest_wins → content-idempotent), so the latest dimension
    state — tombstone layout column dropped — is value-identical to an
    uninterrupted run."""
    from pyspark.sql import functions as F

    from project2_bigdata_spark.streaming.upsert import run_stream_scd1

    ref = _rows(run_stream_scd1(spark, multi_sf, bucketed_n=8)
                .drop("_bucket"), "user_id")

    ckpt, dim = str(tmp_path / "ckpt"), str(tmp_path / "dim")
    with pytest.raises((StreamingQueryException, Exception)) as exc:
        run_stream_scd1(spark, multi_sf, path=dim, checkpoint=ckpt,
                        bucketed_n=8,
                        post_merge_hook=_crash_after_batch(1))
    assert "injected crash" in str(exc.value)
    resumed = run_stream_scd1(spark, multi_sf, path=dim, checkpoint=ckpt,
                              bucketed_n=8)
    assert _rows(resumed.drop("_bucket"), "user_id") == ref
    # the layout survived the crash/replay: bucket dirs in the latest
    # version, and the bucket column reads back
    assert "_bucket" in resumed.columns
    assert glob.glob(os.path.join(dim, "v=*", "_bucket=*"))


def test_stream_scd1_content_idempotent_on_restart(spark, multi_sf, tmp_path):
    """The CDC → SCD1 MERGE sink's restart contract: a replayed batch
    re-merges rows the failed attempt already applied — same winners,
    same anti-join survivors — so the LATEST dimension state is
    value-identical to an uninterrupted run (content idempotence; the
    only trace of the replay is a redundant version directory)."""
    from project2_bigdata_spark.streaming.upsert import run_stream_scd1

    ref = _rows(run_stream_scd1(spark, multi_sf), "user_id")

    ckpt, dim = str(tmp_path / "ckpt"), str(tmp_path / "dim")
    with pytest.raises((StreamingQueryException, Exception)) as exc:
        run_stream_scd1(spark, multi_sf, path=dim, checkpoint=ckpt,
                        post_merge_hook=_crash_after_batch(1))
    assert "injected crash" in str(exc.value)
    # batch 1's merge landed (a version exists for it) but its offset
    # did not commit — the restart MUST replay it
    assert len(glob.glob(os.path.join(dim, "v=*"))) >= 2
    resumed = run_stream_scd1(spark, multi_sf, path=dim, checkpoint=ckpt)
    assert _rows(resumed, "user_id") == ref


def test_theta_sink_idempotent_on_restart(spark, multi_sf, tmp_path):
    ref = _rows(theta_daily_from_sink(theta_sketch_sink(spark, multi_sf)),
                "day")
    resumed_sink = _run_killed_then_resumed(
        spark, multi_sf, theta_sketch_sink, tmp_path)
    got = _rows(theta_daily_from_sink(resumed_sink), "day")
    assert got == ref
    # n_events comes from a plain SUM over the sketch table (no union
    # idempotence to hide behind): equality proves no double-append
    assert sum(r[1] for r in got) == sum(r[1] for r in ref)


def test_stream_scd1_change_feed_replays_to_final_state(
        spark, multi_sf, tmp_path):
    """r9 CDF composed with the r8 streaming MERGE: whatever micro-batch
    boundaries the file source picked, the per-commit change feed
    applied over the first snapshot must replay EXACTLY to the final
    dimension state (v1 ⊕ feed == v_latest) — the downstream-consumer
    contract of a change feed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from project2_bigdata_spark.sources.ingest import (
        _versions, read_change_feed, read_version,
    )
    from project2_bigdata_spark.streaming.upsert import run_stream_scd1

    path, ck = str(tmp_path / "dim"), str(tmp_path / "ck")
    final = run_stream_scd1(spark, multi_sf, path=path, checkpoint=ck)
    committed = _versions(path, committed_only=True)
    assert len(committed) >= 2  # multi-file source => several merges

    v1 = committed[0]
    feed = read_change_feed(spark, path, ["user_id"], from_version=v1)
    assert feed.filter(F.col("_change_type") == "delete").count() == 0

    base = (read_version(spark, path, v1)
            .withColumn("_commit_version", F.lit(v1).cast("bigint")))
    candidates = base.unionByName(feed.drop("_change_type"))
    w = Window.partitionBy("user_id").orderBy(F.desc("_commit_version"))
    replayed = (candidates.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn", "_commit_version"))
    assert sorted(map(tuple, replayed.collect())) == \
        sorted(map(tuple, final.collect()))
