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


#: Broadcast eligibility in ROWS — the deterministic local proxy for the
#: "dim side ≤ ~10 GB" posture (SCALE.md §Joins). On a real cluster the
#: same decision reads table statistics in bytes; rows keep the cost
#: model testable without a metastore.
BROADCAST_ROWS = 1_000_000

#: A key is HOT when its row share exceeds skew_factor × the average
#: partition share (1/parallelism) — the same shape as AQE's
#: skewedPartitionFactor test, applied BEFORE the shuffle exists.
SKEW_FACTOR = 4


#: Join types where Spark can BUILD-BROADCAST the right side. A
#: full_outer (or right/right_outer) join cannot stream null-extended
#: right rows from a broadcast build, so Spark silently ignores the
#: broadcast hint and plans a shuffle join — returning "broadcast"
#: there would misreport the executed plan AND short-circuit the skew
#: analysis that actually matters (r8 self-review item 5).
_BROADCAST_RIGHT_OK = {
    "inner", "cross", "left", "leftouter", "left_outer",
    "left_semi", "leftsemi", "left_anti", "leftanti",
}


def choose_join_strategy(
    n_left: int,
    n_right: int,
    top_share: float,
    parallelism: int,
    broadcast_rows: int = BROADCAST_ROWS,
    skew_factor: int = SKEW_FACTOR,
    n_salts: int = 16,
    how: str = "inner",
) -> str:
    """The documented cost model (SCALE.md §Joins) as a pure function —
    decides ``broadcast`` / ``salt`` / ``plain`` from the stats
    :func:`adaptive_join` gathers. Rules, in order:

    1. **broadcast** when the right side fits the broadcast budget:
       never shuffle the fact for a dim-sized build side.
    2. **salt** when BOTH (a) the left's heaviest key would form a
       reducer partition ``skew_factor`` × the average — the skew AQE's
       post-shuffle split handles poorly because the hot partition
       still materializes first — AND (b) replication is the cheaper
       evil: |right| × n_salts < |left| (salted_join's own cost bound).
    3. **plain** otherwise: one shuffle each side, AQE skew-split armed.
    """
    if (n_right <= broadcast_rows
            and how.lower().replace("_", "") in
            {h.replace("_", "") for h in _BROADCAST_RIGHT_OK}):
        return "broadcast"
    if (top_share > skew_factor / max(parallelism, 1)
            and n_right * n_salts < n_left
            and how.lower().replace("_", "") in
            {"inner", "left", "leftouter"}):
        # salted_join replicates the right side per salt — legal only
        # for inner/left (it raises otherwise); full/right outer falls
        # through to plain + AQE skew-split, the correct remedy there
        return "salt"
    return "plain"


def adaptive_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_cols: list[str],
    how: str = "inner",
    n_salts: int = 16,
    broadcast_rows: int = BROADCAST_ROWS,
    skew_factor: int = SKEW_FACTOR,
) -> tuple[DataFrame, str]:
    """Cost-based join planner hook (VERDICT r7 item 7): consults the
    key-skew profile and dispatches to broadcast / salted / plain —
    the manual wiring between ``key_skew_profile`` (the diagnostic) and
    ``salted_join`` (the remedy), now one call.

    Returns ``(joined_frame, strategy)`` so callers can log the choice.
    The stats cost two aggregate jobs (right count; left count + top
    key share in one two-level pass) — planning-time work that runs
    once per pipeline, exactly where a warehouse would read table
    statistics; the profile aggregate is map-side combined so it never
    shuffles fact rows, only the distinct-key relation. Every branch
    returns the same relation (pinned by tests): strategy changes the
    shuffle distribution, never the result.
    """
    n_right = right.count()
    prof = (
        left.groupBy(left_key).agg(F.count("*").alias("_n"))
        .agg(F.sum("_n").alias("_total"), F.max("_n").alias("_top"))
        .first()
    )
    n_left = prof["_total"] or 0
    top_share = (prof["_top"] / n_left) if n_left else 0.0
    strategy = choose_join_strategy(
        n_left, n_right, top_share,
        parallelism=left.sparkSession.sparkContext.defaultParallelism,
        broadcast_rows=broadcast_rows, skew_factor=skew_factor,
        n_salts=n_salts, how=how,
    )
    if strategy == "broadcast":
        out = left.join(
            F.broadcast(right), left[left_key] == right[right_key], how)
    elif strategy == "salt":
        out = salted_join(
            left, right.hint("shuffle_hash"), left_key, right_key,
            salt_cols=salt_cols, n_salts=n_salts, how=how)
    else:
        out = left.join(right, left[left_key] == right[right_key], how)
    return out, strategy
