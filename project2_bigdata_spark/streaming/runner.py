"""Bounded-replay runner for streaming queries.

Lives in its own registry-free module: streaming operator modules import
it, and it must stay importable while ``plans`` is mid-initialization
(executor-side unpickling imports operator modules in arbitrary order).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_SINK_IDS = itertools.count()


def run_to_batch(sdf: DataFrame, mode: str = "complete") -> DataFrame:
    """Replay a bounded stream to completion (AvailableNow) into a
    memory sink; return the sink as a batch DataFrame."""
    spark = sdf.sparkSession
    name = f"stream_sink_{next(_SINK_IDS)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
