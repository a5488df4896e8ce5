"""Exact-money aggregation helpers.

The reference sums Decimal128 prices after an early float cast
(SURVEY.md §2.11 quirk 5), which makes its checksum order-dependent.
We instead sum in DECIMAL (exact, order-insensitive — safe under any
partitioning / AQE re-plan) and cast the *result* to double, so the
value is bit-identical between Spark and the DuckDB oracle no matter
how rows are partitioned. At 100 TB this also means the checksum is
stable across reruns, which float summation is not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type used for exact cent-level accumulation. decimal(18,2)
#: sums promote to decimal(28,2) in Spark — headroom to ~1e26 cents.
DEC = "decimal(18,2)"


def _dec_to_double(c: Column) -> Column:
    """Decimal → double via a string round-trip.

    Direct decimal→double conversion is NOT correctly rounded identically
    across engines (observed 1-ULP drift between Spark's BigDecimal path
    and DuckDB's int128/10^s path). decimal→string is exact digits and
    string→double is correctly rounded in both JVMs and DuckDB, so this
    path is bit-deterministic everywhere.
    """
    return c.cast("string").cast("double")


def _cents(c: Column) -> Column:
    """Exact 2dp value as integer cents (round-half-up, same as the
    decimal(18,2) cast for every value this engine sums — see dsum)."""
    return F.round(c * 100).cast("bigint")


def _cents_sum_to_double(s: Column) -> Column:
    """BIGINT cent sum → the same double the decimal path produced.

    The cent sum is widened to decimal BEFORE the /100 so the exact
    rational S/100 goes through the same string→double correct rounding
    as the decimal path — ``double(S)/100.0`` would round twice and can
    drift 1 ULP once S exceeds 2^53 (≈ 9e13 money units).
    """
    return _dec_to_double(s.cast("decimal(38,2)") / F.lit(100))


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact order-insensitive money sum, value-identical to
    ``sum(cast(col as decimal(18,2)))::double`` (the committed oracle
    form, see :func:`oracle_dsum`).

    Implementation sums integer CENTS in a plain BIGINT instead of a
    decimal accumulator: decimal aggregation pays a per-row scale-check
    + overflow-check + 128-bit add, measured ~1.5× the whole agg stage
    on the headline queries (OPTIMIZATION_r12.md §dsum), while the long
    sum rides whole-stage codegen at integer speed. Equivalence holds
    because every dsum input is an exactly-2dp money value (parquet
    money columns, CASE branches over them, or prior dsum outputs —
    audited; enforced by the oracle hash parity of all ~200 dsum-bearing
    queries): for such values ``round(x*100)`` and the decimal(18,2)
    cast recover the same integer cents, and summation order cannot
    matter in either representation. Headroom: |Σ| < 2^63 cents ≈ 9.2e16
    money units — ~10× above a 100 TB lineitem revenue total; wider
    accumulations (4dp/10dp moment sums) stay on the decimal path
    (:func:`dsum_as`, :func:`dsum10`).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = _cents_sum_to_double(F.sum(_cents(c)))
    return out.alias(alias) if alias else out


def dsum_expr(sql_expr: str, alias: str | None = None) -> Column:
    """Same as :func:`dsum` for an arbitrary SQL expression string."""
    out = _cents_sum_to_double(F.sum(_cents(F.expr(sql_expr))))
    return out.alias(alias) if alias else out


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """num/den with a zero-guard (ref dashboard.py:138-141) — pure
    expression, no UDF."""
    return F.when(den != 0, num / den).otherwise(F.lit(default))


def oracle_dsum(sql_expr: str, alias: str) -> str:
    """DuckDB-side twin of :func:`dsum` for oracle SQL strings."""
    return (f"CAST(CAST(SUM(CAST({sql_expr} AS DECIMAL(18,2))) AS VARCHAR) "
            f"AS DOUBLE) AS {alias}")


#: Wider-scale decimal for second-moment accumulations (x*x, x*y): exact
#: to 1e-10, headroom to ~1e18. Used to compute stddev/corr from exact
#: sums so the result is bit-identical across engines and partitionings.
DEC10 = "decimal(28,10)"


def dsum_as(sql_expr: str, dectype: str, alias: str | None = None) -> Column:
    """sum(cast(expr as <dectype>))::double via the string round-trip.

    IMPORTANT invariant: the cast double→decimal must be *exact or
    unambiguous* — only use scales that the underlying values hit exactly
    (money = 2dp, products of money = 4dp, integers = any scale).
    Casting arbitrary doubles to a high-scale decimal can round a
    half-boundary differently across engines.
    """
    out = _dec_to_double(F.sum(F.expr(sql_expr).cast(dectype)))
    return out.alias(alias) if alias else out


def oracle_dsum_as(sql_expr: str, dectype: str, alias: str) -> str:
    return (f"CAST(CAST(SUM(CAST({sql_expr} AS {dectype.upper()})) AS VARCHAR) "
            f"AS DOUBLE) AS {alias}")


def dsum10(sql_expr: str, alias: str | None = None) -> Column:
    """sum(cast(expr as decimal(28,10)))::double — exact moment sums."""
    out = _dec_to_double(F.sum(F.expr(sql_expr).cast(DEC10)))
    return out.alias(alias) if alias else out


def oracle_dsum10(sql_expr: str, alias: str) -> str:
    return (f"CAST(CAST(SUM(CAST({sql_expr} AS DECIMAL(28,10))) AS VARCHAR) "
            f"AS DOUBLE) AS {alias}")
