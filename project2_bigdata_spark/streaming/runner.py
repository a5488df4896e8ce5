"""Bounded-replay runner for streaming queries.

Lives in its own registry-free module: streaming operator modules import
it, and it must stay importable while ``plans`` is mid-initialization
(executor-side unpickling imports operator modules in arbitrary order).
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_SINK_IDS = itertools.count()

#: RocksDB-backed state store: streaming state (window aggs, join
#: buffers, session maps) lives off-heap with local-disk spill instead
#: of the default HDFSBackedStateStoreProvider's on-heap hash maps —
#: the 100 TB posture, and measured necessary at the K=100 replay
#: (10 M events: the session-window state OOM'd an 8 GiB heap on the
#: default provider). rocksdbjni ships in pyspark's jars.
_ROCKSDB = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)


def run_to_batch(sdf: DataFrame, mode: str = "complete") -> DataFrame:
    """Replay a bounded stream to completion (AvailableNow) and return
    the final result as a batch DataFrame.

    The sink is a PARQUET SPOOL written executor-side via foreachBatch,
    not Spark's memory sink: the memory sink collects every emitted row
    into driver JVM memory — in complete mode it re-collects the WHOLE
    result table every micro-batch — which OOM'd the driver at the
    K=100 scale-stress replay (10 M events, 32 micro-batches). The
    spool keeps the driver flat at any replay size: complete mode
    overwrites the spool per batch (last batch = final table), append
    mode appends new files per batch; either way the returned frame is
    exactly what the memory sink would have held.
    """
    spark = sdf.sparkSession
    try:
        spark.conf.set(*_ROCKSDB)
    except Exception:
        pass  # conf locked by the host — run with its provider
    name = f"stream_sink_{next(_SINK_IDS)}"
    spool = tempfile.mkdtemp(prefix=f"{name}_")
    write_mode = "overwrite" if mode == "complete" else "append"

    def _spill(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(spool)

    q = (
        sdf.writeStream.foreachBatch(_spill)
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    has_files = any(
        f.endswith(".parquet") for _, _, fs in os.walk(spool) for f in fs
    )
    if not has_files:  # zero batches emitted (e.g. all rows late)
        shutil.rmtree(spool, ignore_errors=True)
        return spark.createDataFrame([], schema=sdf.schema)
    return spark.read.parquet(spool)
