"""Scalable global ranking — row_number/ntile without a one-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` makes Spark move EVERY row
to a single partition (WindowExec warns exactly this), which is the one
window shape that cannot survive a 100 TB input. When the ranked relation
is dimension-bounded (products, BPE vocabulary) that is fine and the plans
keep the plain window; when it is fact- or customer-scale and the full
ranked output is needed (no ``rank <= k`` predicate for Spark 4's
InferWindowGroupLimit to push down), use these two-phase operators:

1. ``repartitionByRange`` on the sort key — each task holds one contiguous
   key range, so global order == (partition id, within-partition order).
2. per-range ``row_number`` over ``Window.partitionBy(partition id)`` —
   parallel across ranges instead of serialized on one task.
3. per-range counts → prefix-sum offsets (a window over the tiny
   #partitions-row frame) broadcast-joined back; global rank =
   offset + local rank.

Results are bit-identical to the single-partition window whenever the
sort key is a total order (callers must include a unique tie-break
column, the same discipline every ranked query in this repo already
follows): range boundaries then cannot split equal keys, and the ntile
bucket arithmetic below reproduces SQL NTILE exactly. Parity is enforced
by tests/test_rank_ops.py against ``F.row_number``/``F.ntile`` and, for
``rfm_scores``, by the DuckDB oracle sweep.

Cost: one range shuffle (plus the sampling job that picks boundaries),
one hash shuffle on partition id, and one lineage-truncating
materialization (session.truncate_lineage — the ranked frame is consumed
by both the offset and data sides, and chained calls would otherwise
embed the upstream plan 4^k times) per distinct sort order, all fully
parallel — versus one all-rows-to-one-task shuffle for the naive window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import truncate_lineage

#: Column name used internally for the range-partition id.
_PID = "__rank_pid"
_LRN = "__rank_local_rn"


def _ranked_with_counts(
    df: DataFrame,
    order: list[Column],
    out: str,
    num_partitions: int | None,
    truncate: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared core: (ranked output, per-range counts frame).

    The counts frame is exposed so :func:`global_ntile` can derive the
    global row count from it instead of re-executing the ranked output
    (which would run the offsets broadcast join a second time per call).
    """
    if num_partitions is None:
        ranged = df.repartitionByRange(*order)
    else:
        ranged = df.repartitionByRange(num_partitions, *order)
    # _PID must be projected BEFORE the window's hash exchange: Spark
    # evaluates it in the stage that reads the range shuffle, so it
    # captures the range id, and the window then groups by it.
    tagged = ranged.withColumn(_PID, F.spark_partition_id())
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*order))
    tagged = tagged.withColumn(_LRN, local.cast("bigint"))
    # `tagged` is referenced twice below (offset side + data side). A
    # plain DataFrame would EMBED the whole upstream plan twice — and
    # chained calls (three ntiles in rfm_scores) then multiply: 4^k
    # copies of the base scan were observed in the executed plan before
    # this truncation. Materialize once (reliable checkpoint on a real
    # cluster, localCheckpoint in local mode — session.truncate_lineage)
    # so both consumers and every later chained call read the
    # range-ranked rows, not the lineage.
    if truncate:
        tagged = truncate_lineage(tagged)

    counts = tagged.groupBy(_PID).agg(F.count("*").alias("__n"))
    # Prefix sum over ≤ #shuffle-partitions rows — bounded by cluster
    # config, never by data volume, so this tiny window is safe.
    off_w = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__off"),
    )
    ranked = (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(out, (F.col("__off") + F.col(_LRN)).cast("bigint"))
        .drop(_PID, _LRN, "__off")
    )
    return ranked, counts


def global_row_number(
    df: DataFrame,
    order: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
    truncate: bool = True,
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order`` to ``df``.

    ``order`` must be a total order (include a unique tie-break column) —
    with ties across a range boundary the split between ranges would be
    sampling-dependent. Output column ``out`` is ``bigint``.
    ``truncate=False`` skips the lineage-truncating materialization (see
    module docstring) — only for plan inspection in tests; chained
    production use must keep it.
    """
    ranked, _ = _ranked_with_counts(df, order, out, num_partitions, truncate)
    return ranked


def global_ntile(
    df: DataFrame,
    order: list[Column],
    n: int,
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append SQL ``NTILE(n) OVER (ORDER BY order)`` to ``df``, scalably.

    Reproduces NTILE's bucket arithmetic from the global row number: with
    ``N`` total rows, ``q, r = divmod(N, n)``, the first ``r`` buckets get
    ``q + 1`` rows and the rest ``q`` (when ``N < n``, row i is bucket i).
    Same total-order requirement as :func:`global_row_number`.
    """
    rn = "__rank_gn"
    ranked, counts = _ranked_with_counts(
        df, order, rn, num_partitions, truncate=True)
    # Global N = Σ per-range counts: a scan of the tiny counts aggregate
    # over the materialized ranked frame — counting `ranked` itself
    # would re-execute the offsets broadcast join just to learn N.
    total = counts.agg(F.sum("__n").cast("bigint").alias("__N"))
    ranked = ranked.crossJoin(F.broadcast(total))

    # All-integer arithmetic (`div`, not `/`): double division would be
    # exact only below 2^53 rows and this must hold at any N.
    # q == 0 only when N < n, and then every row is in a fat bucket
    # (head_rows == N), so the thin branch's greatest() guard never fires
    # on real input — it just keeps the expression total.
    n = int(n)
    bucket = F.expr(
        f"CASE WHEN {rn} <= ((__N div {n}) + 1) * (__N % {n}) "
        f"THEN ({rn} - 1) div ((__N div {n}) + 1) + 1 "
        f"ELSE (__N % {n}) "
        f"  + ({rn} - ((__N div {n}) + 1) * (__N % {n}) - 1) "
        f"      div greatest(__N div {n}, 1) + 1 END"
    )
    return (
        ranked.withColumn(out, bucket.cast("int"))
        .drop(rn, "__N")
    )
