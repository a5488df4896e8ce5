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


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """sum(cast(col as decimal(18,2)))::double — exact & order-insensitive."""
    c = F.col(col) if isinstance(col, str) else col
    out = _dec_to_double(F.sum(c.cast(DEC)))
    return out.alias(alias) if alias else out


def dsum_expr(sql_expr: str, alias: str | None = None) -> Column:
    """Same as :func:`dsum` for an arbitrary SQL expression string."""
    out = _dec_to_double(F.sum(F.expr(sql_expr).cast(DEC)))
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
