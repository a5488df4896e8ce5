"""Skew-mitigation utilities (SCALE.md 'Joins').

AQE's skew-join split handles most skew automatically; ``salted_join``
is the manual fallback for the case AQE can't fix: a shuffled equi-join
where a handful of hot keys overwhelm single reducers *and* the build
side is too large to broadcast. The hot-side rows get a deterministic
salt derived from stable row columns; the other side is replicated once
per salt value. Correctness is unchanged (tested against the plain
join); the hot key's rows now spread across ``n_salts`` reducers.

Cost model: replication multiplies the right side by ``n_salts`` —
worth it only when |right| × n_salts ≪ |left|'s hot-key volume. For
aggregations (not joins) the equivalent fix is two-level aggregation,
already used by kpi_global/customer_rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_cols: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` ⋈ ``right`` on key, salted ``n_salts`` ways.

    ``salt_cols`` must be stable row attributes of ``left`` (not
    monotonically_increasing_id, which changes with partitioning) so the
    salt — and therefore the result — is deterministic across re-runs
    and AQE re-plans.

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated once per salt value, so a right/full outer join would emit
    every unmatched right row ``n_salts`` times instead of once.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the salted right side is replicated n_salts times, which would "
            "duplicate unmatched right rows under right/full outer semantics"
        )
    salt: Column = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    lsalted = left.withColumn("_salt", salt)
    rsalted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = lsalted.join(
        rsalted,
        (lsalted[left_key] == rsalted[right_key])
        & (lsalted["_salt"] == rsalted["_salt"]),
        how,
    )
    return joined.drop("_salt")
