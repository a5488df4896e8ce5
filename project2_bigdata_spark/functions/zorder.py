"""Z-order (Morton) keys for multi-column data clustering.

Sorting by a single column clusters row groups on that column only; a
reader filtering on a second column still scans everything. Interleaving
the bits of two (quantized) columns yields a space-filling curve key:
sorting by it bounds EVERY row group to a small rectangle in (a, b)
space, so parquet min/max stats prune scans for filters on either
column — the Delta/Iceberg Z-ORDER pattern, as a pure Spark expression
(no UDF; the bit interleave is one JVM fold).

At 100 TB this is a write-time layout decision: one extra expression in
the sort key of :func:`sources.ingest.write_sorted_parquet`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: str, b: str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer expressions (quantize first — see :func:`quantized`).
    Bit i of ``a`` lands at position 2i+1, of ``b`` at 2i."""
    terms = " + ".join(
        f"((({a} >> {i}) & 1L) << {2 * i + 1}) + ((({b} >> {i}) & 1L) << {2 * i})"
        for i in range(bits)
    )
    return F.expr(f"CAST({terms} AS BIGINT)")


def quantized(col: str, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) given (broadcast) min/max
    bounds — the range quantization step before interleaving. Callers
    get lo/hi from a 1-row scalar aggregate (lazy, broadcastable), never
    a driver-side collect."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    frac = (F.col(col).cast("double") - lo.cast("double")) / span.cast("double")
    maxv = (1 << bits) - 1
    return F.least(
        F.lit(maxv), F.floor(frac * maxv).cast("bigint")
    ).cast("bigint")


def zorder_key_n(cols: list[str], bits: int) -> Column:
    """Morton-interleave N non-negative integer expressions: bit ``i``
    of column ``j`` lands at position ``i*n + (n-1-j)`` — the pairwise
    :func:`zorder_key` generalized round-robin. ``n*bits`` must stay
    under 63 (the caller clamps)."""
    n = len(cols)
    terms = " + ".join(
        f"((({c} >> {i}) & 1L) << {i * n + (n - 1 - j)})"
        for i in range(bits)
        for j, c in enumerate(cols)
    )
    return F.expr(f"CAST({terms} AS BIGINT)")


def with_zorder_any(df: DataFrame, cols: list[str],
                    bits: int = 16) -> DataFrame:
    """Attach a ``_zkey`` column over ANY number of numeric columns:
    quantize each by its global min/max (one tiny scalar-agg broadcast
    join) and interleave round-robin. Per-column bits shrink as columns
    grow (``min(bits, 63 // n)``) — the space-filling-curve trade-off:
    more clustered dimensions, coarser cells per dimension."""
    if not cols:
        raise ValueError("with_zorder_any needs at least one column")
    bits = min(bits, 63 // len(cols))
    bounds = df.agg(*[
        f for c in cols
        for f in (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))
    ])
    out = df.crossJoin(F.broadcast(bounds))
    qnames = []
    for c in cols:
        q = quantized(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
        out = out.withColumn(f"_q_{c}", q)
        qnames.append(f"_q_{c}")
    out = out.withColumn("_zkey", zorder_key_n(qnames, bits))
    drop = [f"_lo_{c}" for c in cols] + [f"_hi_{c}" for c in cols] + qnames
    return out.drop(*drop)


def with_zorder(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """Attach a ``_zkey`` column: quantize both columns by their global
    min/max (one tiny scalar-agg broadcast join) and interleave.
    (The two-column original; :func:`with_zorder_any` generalizes to N
    — kept because its bit layout is pinned by the row-group-stats
    test and the pairwise interleave reads clearest.)"""
    bounds = df.agg(
        F.min(col_a).alias("_alo"), F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"), F.max(col_b).alias("_bhi"),
    )
    out = df.crossJoin(F.broadcast(bounds))
    qa = quantized(col_a, F.col("_alo"), F.col("_ahi"), bits)
    qb = quantized(col_b, F.col("_blo"), F.col("_bhi"), bits)
    return (
        out.withColumn("_qa", qa)
        .withColumn("_qb", qb)
        .withColumn("_zkey", zorder_key("_qa", "_qb", bits))
        .drop("_alo", "_ahi", "_blo", "_bhi", "_qa", "_qb")
    )
