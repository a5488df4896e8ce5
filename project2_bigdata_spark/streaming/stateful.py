"""Custom stateful streaming operator via ``applyInPandasWithState``
(the task's designated escape hatch for semantics Spark's built-in
streaming aggregates can't express).

Demonstrated operator: per-user running event counter + running value
sum that survives across micro-batches in the state store. The built-in
``groupBy().count()`` could produce the same *final* numbers — the point
here is the state-management plumbing (GroupState get/update, timeout
config, per-batch emission), which is what a genuinely custom operator
(e.g. decaying counters, per-key model state, CEP) needs.

Scale: state is partitioned by user_id in the executor state stores —
the same shuffle key as the groupBy; each micro-batch touches only the
keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..plans.registry import register
from .runner import run_to_batch
from .source import events_stream

_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])
_STATE_SCHEMA = "n BIGINT, v DOUBLE"


def _count_events(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) for one user across micro-batches;
    emit the running totals once per batch the user appears in."""
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
    )


def running_user_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded plan: events → stateful per-user running counters."""
    return (
        events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_events,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@register(
    "stream_stateful_counters",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
    doc="Custom stateful operator (applyInPandasWithState): per-user "
        "running counters across micro-batches; after the bounded replay "
        "the LAST emission per user equals the batch per-user count — "
        "which is exactly what the oracle checks (float value sums are "
        "reported by the operator but excluded from the oracle contract)",
)
def q_stream_stateful_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    sink = run_to_batch(running_user_counters(spark, sf_dir), mode="append")
    # one emission per (user × batch touched) — keep each user's last
    return sink.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
