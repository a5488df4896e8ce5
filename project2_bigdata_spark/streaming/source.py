"""Streaming sources: replay the driver's events parquet as a file stream.

The file source needs an explicit schema (no inference on streams), so we
take it from a one-off batch scan of the same file. ``ts`` arrives as
epoch-nanos LongType (the session reads TIMESTAMP(NANOS) parquet via
``nanosAsLong`` — see catalog.table) and is converted to a real
timestamp here, exactly as the batch path does, so event-time windowing
and watermarks work on a proper TimestampType column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded DataFrame over ``{sf_dir}/events.parquet``.

    ``maxFilesPerTrigger=1`` keeps micro-batches file-sized; at scale the
    same reader pointed at a growing directory is the production ingest
    (S1's batch-of-50 insert loop collapses into Spark's own
    micro-batching + checkpoint recovery — no hand-rolled retry).
    """
    tune(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source wants a *directory*; pathGlobFilter selects the
    # events file within it (a production feed is a directory anyway)
    sdf = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(sdf.schema["ts"].dataType, T.LongType):
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(sdf.schema["ts"].dataType, T.TimestampNTZType):
        # current testdata: TIMESTAMP(MICROS, isAdjustedToUTC=false) → NTZ;
        # normalize to LTZ exactly like catalog.table (UTC session ⇒
        # wall-clock-preserving) so watermarks/windows see TimestampType.
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf
