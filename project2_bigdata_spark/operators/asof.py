"""As-of join and range join — operators Spark lacks natively
(SURVEY.md §2.5 notes none exist in the reference either; these are
engine-surface extensions, implemented scalably).

As-of join strategy: the classic union + last_value window —
tag both sides, union them, sort within key by (time, side, tiebreak),
and carry the latest right-side attributes forward with
last(ignorenulls). ONE shuffle on the join key, no range-explosion,
no per-group pandas. This is the plan that survives 100 TB; the
pd.merge_asof-in-applyInPandas alternative needs a whole group in
memory and pays Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions.datetime_utils import sale_date


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the most recent order (≤ event time) of the same
    customer. Ties on order date resolve to the highest orderkey —
    deterministic on both engines.

    Output: event_id, user_id, ts (string), last_order_key,
    last_order_date (string); events with no prior order keep nulls
    (left-asof semantics).

    Skew bound: the window partitions by key, so one key's ENTIRE
    history must fit a single task (no AQE skew split for windows).
    Fine for per-customer volumes; for a pathological hot key use
    :func:`asof_join_events_orders_bucketed`, which bounds every window
    partition by traffic-per-time-bucket instead.
    """
    events = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("o_key"),
        F.lit(None).cast("string").alias("o_date"),
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("is_left"),
        F.col("o_orderkey").alias("o_key"),
        sale_date("o_orderdate").alias("o_date"),
    )
    u = orders.unionByName(events)
    # right rows sort before left rows at the same instant (<= semantics);
    # o_key breaks order-date ties.
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_left", "o_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_order_key", F.last("o_key", ignorenulls=True).over(w))
        .withColumn("last_order_date", F.last("o_date", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "last_order_key", "last_order_date",
        )
    )


def asof_join_events_orders_bucketed(
    spark: SparkSession, sf_dir: str, bucket_hours: int = 24 * 7
) -> DataFrame:
    """Skew-hardened as-of join — same relation as
    :func:`asof_join_events_orders`, bounded window partitions.

    The plain variant windows over ``partitionBy(key)``: one hot key with
    massive history lands in a single window partition (windows get no
    AQE skew split). Here the union is windowed over
    ``partitionBy(key, time_bucket)`` — partition size is bounded by the
    key's traffic per bucket — and right-side state is carried across
    bucket boundaries with a second window over the per-(key, bucket)
    summaries, whose partition size is #buckets per key (time-range /
    bucket, independent of row count). Three shuffles, all on
    (key[, bucket]); no stage's partition grows with a key's total
    history.
    """
    events = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("bigint").alias("o_key"),
        F.lit(None).cast("string").alias("o_date"),
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(0).alias("is_left"),
        F.col("o_orderkey").alias("o_key"),
        sale_date("o_orderdate").alias("o_date"),
    )
    u = orders.unionByName(events).withColumn(
        "bucket", F.floor(F.col("t").cast("long") / F.lit(bucket_hours * 3600))
    )
    # (1) running last-right within each (key, bucket) — bounded partition
    wb = (
        Window.partitionBy("key", "bucket")
        .orderBy("t", "is_left", "o_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u2 = (
        u.withColumn("in_key", F.last("o_key", ignorenulls=True).over(wb))
        .withColumn("in_date", F.last("o_date", ignorenulls=True).over(wb))
    )
    # (2) per-(key, bucket) final right state; struct max orders by
    # (t, o_key) so ties resolve exactly like the within-bucket window
    rsum = (
        u.filter(F.col("is_left") == 0)
        .groupBy("key", "bucket")
        .agg(F.max(F.struct("t", "o_key", "o_date")).alias("s"))
    )
    # (3) carry = latest right state from any STRICTLY earlier bucket;
    # window partition = #buckets per key, not row count
    wc = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        u.select("key", "bucket").distinct()
        .join(rsum, ["key", "bucket"], "left")
        .withColumn("carry", F.max("s").over(wc))
        .select(
            "key", "bucket",
            F.col("carry.o_key").alias("c_key"),
            F.col("carry.o_date").alias("c_date"),
        )
    )
    return (
        u2.join(carry, ["key", "bucket"], "left")
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.coalesce("in_key", "c_key").alias("last_order_key"),
            F.coalesce("in_date", "c_date").alias("last_order_date"),
        )
    )


ORACLE_ASOF = """
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       o.o_orderkey AS last_order_key,
       o.o_date AS last_order_date
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
  FROM orders
  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC
  LIMIT 1
) o ON TRUE
"""


#: Static value-tier dimension for the range join (broadcast side).
TIERS = [
    ("low", 0.0, 50.0),
    ("mid", 50.0, 150.0),
    ("high", 150.0, 1e18),
]


def range_join_event_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: each event matched to its value tier [lo, hi).

    The tier table is tiny → broadcast nested-loop with a range
    predicate, which Spark turns into a BroadcastNestedLoopJoin: linear
    in events, no shuffle. (For two large range sides, bucketize the
    range key and equi-join on bucket — see pyspark guide.)
    """
    tiers = spark.createDataFrame(TIERS, "tier string, lo double, hi double")
    e = table(spark, sf_dir, "events")
    return (
        e.join(
            F.broadcast(tiers),
            (e.value >= tiers.lo) & (e.value < tiers.hi),
            "left",
        )
        .select("event_id", "event_type", "value", "tier")
    )


ORACLE_RANGE_TIERS = """
WITH tiers(tier, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e18)
)
SELECT event_id, event_type, value, tier
FROM events LEFT JOIN tiers ON value >= lo AND value < hi
"""


def sessionize_events(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Sessionization: per-user sessions split on inactivity gaps.

    lag(ts) + a cumulative sum over the gap indicator — two window
    passes over one shuffle on user_id (the guide's batch pattern;
    session_window() covers the streaming case in streaming/).
    Output per session: user_id, session_id, n_events, start/end strings.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    e = (
        table(spark, sf_dir, "events")
        .withColumn("is_new", (gap.isNull() | (gap > gap_minutes * 60)).cast("int"))
        .withColumn(
            "session_id",
            F.sum("is_new").over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return e.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


def oracle_sessionize(gap_minutes: int = 30) -> str:
    return f"""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_minutes * 60}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM s GROUP BY 1, 2
    """
