"""Event-time windowed streaming queries, oracle-checked.

Each query builds an UNBOUNDED plan (readStream → event-time agg) and
materializes it with ``Trigger.AvailableNow`` into a memory sink; the
returned batch DataFrame is what the driver's DuckDB oracle compares.
Complete output mode keeps every window in state so end-of-replay
results equal the batch answer (append mode would withhold windows the
final watermark never passed — correct for an endless stream, wrong for
a bounded replay).

Scale notes: windowed streaming aggs shuffle on (window, keys) exactly
like a batch groupBy; state lives in the executor state store keyed the
same way. Complete mode is for the bounded-replay oracle only — a real
100 TB/day pipeline uses ``withWatermark`` + append mode (shown in
``watermarked_hourly``) so state is evicted; memory sink becomes
kafka/parquet + checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import dsum, oracle_dsum
from ..plans.registry import register
from .runner import run_to_batch  # noqa: F401  (re-exported for tests)
from .source import events_stream


@register(
    "stream_tumbling_hourly",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n, {oracle_dsum('value', 'total_value')}
    FROM events GROUP BY 1, 2
    """,
    doc="Streaming G2: tumbling 1h event-time window × type; replayed "
        "with AvailableNow, result equals the batch hourly rollup",
)
def q_stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", "total_value"))
    )
    return run_to_batch(agg).select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n", "total_value",
    )


@register(
    "stream_sliding_6h",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts)
               - (CAST(extract(hour FROM ts) AS INT) % 6) * INTERVAL 1 HOUR AS base
      FROM events
    )
    SELECT strftime(base - (18 - 6 * k) * INTERVAL 1 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n
    FROM b, (SELECT unnest(range(0, 4)) AS k)
    GROUP BY 1
    """,
    doc="Streaming sliding window: 1-day length, 6h slide — each event "
        "lands in exactly 4 overlapping windows (oracle expands them "
        "arithmetically: the epoch-aligned 6h marks in (ts-1day, ts])",
)
def q_stream_sliding_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 day", "6 hours"))
        .agg(F.count("*").alias("n"))
    )
    return run_to_batch(agg).select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
    )


@register(
    "stream_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM g
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="Streaming sessionization: session_window(ts, 30 min) per user. "
        "Session = [first_ts, last_ts + gap); an event exactly gap after "
        "its predecessor starts a NEW session (oracle splits on diff >= "
        "gap — note batch `sessionize` uses > gap, a deliberate semantic "
        "difference documented here)",
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return run_to_batch(agg).select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@register(
    "stream_session_dynamic_gap",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) + CASE WHEN event_type = 'purchase'
                                 THEN 3600000000 ELSE 1800000000 END
               AS end_us
      FROM events
    ), g AS (
      SELECT user_id, ts, event_id, end_us,
             CASE WHEN max(end_us) OVER wprev IS NULL
                    OR epoch_us(ts) >= max(end_us) OVER wprev
                  THEN 1 ELSE 0 END AS is_new
      FROM iv
      WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), s AS (
      SELECT user_id, ts, end_us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS sid
      FROM g
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(make_timestamp(max(end_us)), '%Y-%m-%d %H:%M:%S')
             AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="Streaming sessionization with a DYNAMIC per-event gap: a "
        "purchase keeps the session alive 60 minutes, anything else 30 "
        "— the engagement-weighted timeout real funnels use, and a "
        "capability fixed-gap sessionize cannot express. Spark: "
        "session_window(ts, CASE …) — each event contributes the "
        "interval [ts, ts+its_gap) and overlapping intervals merge in "
        "the session state store (RocksDB-backed, same replay harness "
        "as the fixed-gap query). Oracle: the interval-union "
        "formulation — an event opens a NEW session iff its start is "
        ">= the running max end of every earlier interval (exact "
        "integer micros; ties ordered by event_id, which cannot change "
        "the merged components since equal starts always overlap). "
        "Session end = max interval end, which for a dynamic gap is "
        "NOT last_ts + gap(last event) — an earlier long-gap event can "
        "own the horizon.",
)
def q_stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")) \
        .otherwise(F.lit("30 minutes"))
    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return run_to_batch(agg).select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss")
        .alias("session_start"),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss")
        .alias("session_end"),
        "n_events",
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY 1
    """,
    doc="Streaming dedup: dropDuplicates on (event_type, event_id) across "
        "micro-batches (state-store backed), then per-type counts — the "
        "composite key makes the Spark side and the per-type "
        "COUNT(DISTINCT event_id) oracle agree even if an event_id ever "
        "repeated under two types. Production variant bounds state with "
        "withWatermark + dropDuplicatesWithinWatermark",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = events_stream(spark, sf_dir).dropDuplicates(["event_type", "event_id"])
    sink = run_to_batch(deduped, mode="append")
    return sink.groupBy("event_type").agg(F.count("*").alias("n_unique"))


@register(
    "stream_dedup_watermarked",
    oracle="""
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events GROUP BY 1
    """,
    doc="Bounded-state streaming dedup: withWatermark(ts, 1 hour) + "
        "dropDuplicatesWithinWatermark — duplicate keys are only "
        "suppressed while inside the watermark horizon, so the state "
        "store EVICTS expired keys instead of growing with every id "
        "ever seen (the production requirement for an endless stream; "
        "plain dropDuplicates state is unbounded). The corpus has no "
        "cross-hour duplicate ids, so the bounded replay still matches "
        "the global COUNT(DISTINCT) oracle exactly",
)
def q_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_type", "event_id"])
    )
    sink = run_to_batch(deduped, mode="append")
    return sink.groupBy("event_type").agg(F.count("*").alias("n_unique"))


@register(
    "stream_interval_join",
    oracle="""
    SELECT v.event_id AS view_event_id, p.event_id AS purchase_event_id,
           v.user_id,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS micros_to_purchase
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc="Stream-stream interval join: the view stream joins the purchase "
        "stream on user within [view_ts, view_ts + 1h]. Both sides carry "
        "watermarks and the join has a time-range bound, so state is "
        "EVICTABLE — each side buffers only rows younger than watermark + "
        "interval, the requirement for an unbounded stream-stream join "
        "to run forever. Inner join in append mode emits matches as they "
        "arrive, so the bounded replay equals the batch self-join oracle",
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return run_to_batch(joined, mode="append").select(
        "view_event_id", "purchase_event_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("micros_to_purchase"),
    )


def watermarked_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shaped variant: watermark + append mode.

    10-minute watermark bounds state; windows close and are emitted once
    the watermark passes their end, mirroring the reference's late/dirty
    saleDate repair-then-drop (SURVEY.md P4 → §2.9). On a bounded replay
    the trailing windows are deliberately withheld — that asymmetry is
    why the oracle-checked queries above use complete mode instead. Not
    registered; exercised by tests/test_streaming.py.
    """
    return (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "stream_static_join",
    oracle="""
    WITH spend AS (
      SELECT o_custkey AS user_id,
             CASE WHEN SUM(CAST(o_totalprice AS DECIMAL(18,2))) >= 500000 THEN 'big'
                  WHEN SUM(CAST(o_totalprice AS DECIMAL(18,2))) >= 100000 THEN 'mid'
                  ELSE 'small' END AS spend_tier
      FROM orders GROUP BY 1
    )
    SELECT COALESCE(spend_tier, 'unknown') AS spend_tier,
           COUNT(*) AS n_events
    FROM events LEFT JOIN spend USING (user_id)
    GROUP BY 1
    """,
    doc="Stream-static join: the unbounded events stream left-joins a "
        "static customer spend-tier dimension (computed batch-side from "
        "orders), then aggregates per tier. Stream-static joins are "
        "STATELESS — the static side is re-planned per micro-batch, no "
        "state store — which is why dimension enrichment is the "
        "recommended first join shape in streaming pipelines",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import table as _table

    from ..functions.money import DEC

    # spend summed in decimal: a float sum is order-dependent, and a
    # customer within a few ULPs of a tier boundary could flip tiers
    # between engines or across AQE re-plans (project exactness rule).
    spend = (
        _table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("spent"))
        .select(
            "user_id",
            F.when(F.col("spent") >= 500000, "big")
            .when(F.col("spent") >= 100000, "mid")
            .otherwise("small").alias("spend_tier"),
        )
    )
    joined = (
        events_stream(spark, sf_dir)
        .join(spend, "user_id", "left")
        .select(F.coalesce("spend_tier", F.lit("unknown")).alias("spend_tier"))
        .groupBy("spend_tier")
        .agg(F.count("*").alias("n_events"))
    )
    return run_to_batch(joined)


@register(
    "stream_topk_per_window",
    oracle="""
    WITH hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY window_start
               ORDER BY n DESC, event_type ASC) AS INT) AS rk
      FROM hourly
    ) WHERE rk <= 3
    """,
    doc="Streaming windowed top-k: tumbling-hour counts per event type "
        "from the stream, then the per-window top-3 rank -- the "
        "trending-items pattern. Window functions are ILLEGAL on a "
        "streaming DataFrame (rank needs the whole window closed), so "
        "the rank runs as a batch post-pass over the replayed sink -- "
        "exactly how production serves it (complete/append sink table, "
        "rank at read time or in foreachBatch). The streaming stage "
        "shuffles on (window, type) with state keyed the same way; the "
        "rank pass is window-count-sized. Deterministic (n desc, type) "
        "tie order on both engines.",
)
def q_stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    agg = (
        events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    sink = run_to_batch(agg).select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type", "n",
    )
    rw = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        sink.withColumn("rk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rk") <= 3)
    )


@register(
    "stream_interval_join_outer",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), wm AS (
      SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM p)) AS w
    )
    SELECT v.event_id AS view_event_id, p.event_id AS purchase_event_id,
           v.user_id,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS micros_to_purchase
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    UNION ALL
    SELECT v.event_id, NULL, v.user_id, NULL
    FROM v CROSS JOIN wm
    WHERE v.ts + INTERVAL 1 HOUR < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = v.user_id
          AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
      )
    """,
    doc="LEFT OUTER stream-stream interval join: matched (view, "
        "purchase) rows emit as they arrive like the inner variant; a "
        "view's NULL row emits only once the global watermark passes "
        "its join window's upper bound, proving no purchase can still "
        "arrive -- the semantics that make outer joins possible on "
        "unbounded streams at all (state rows are evicted WITH their "
        "verdict, never silently). The bounded-replay oracle models "
        "the final watermark exactly: zero-delay watermarks make it "
        "min(max view ts, max purchase ts), so null rows appear "
        "precisely for unmatched views whose window closed before it "
        "-- tail views (last ~1h of the replay) stay verdict-less, "
        "exactly as a production restart would find them. Same "
        "evictable-state bounds as stream_interval_join.",
)
def q_stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "0 seconds")
        .select(
            F.col("event_id").alias("view_event_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "0 seconds")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    return run_to_batch(joined, mode="append").select(
        "view_event_id", "purchase_event_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("micros_to_purchase"),
    )


#: KLL accuracy parameter for the streaming quantile rollup: must
#: exceed the driver-scale corpus (10k events at sf0.01) so the sketch
#: stays in its EXACT regime there (retained = every value ⇒ quantile
#: probes are order statistics ≡ percentile_disc — the same regime
#: trick the batch kll_doc_length_quantiles query proved in r6); at
#: K=100 (1M events) it degrades to bounded rank error by design.
#: 16384 doubles ≈ 128 KB per partial — still constant-memory.
_STREAM_KLL_K = 16384


_STREAM_KLL_REG = dict(
    oracle="""
    SELECT CAST(COUNT(value) AS BIGINT) AS n_events,
           percentile_disc(0.1) WITHIN GROUP (ORDER BY value) AS q1,
           percentile_disc(0.2) WITHIN GROUP (ORDER BY value) AS q2,
           percentile_disc(0.3) WITHIN GROUP (ORDER BY value) AS q3,
           percentile_disc(0.4) WITHIN GROUP (ORDER BY value) AS q4,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS q5,
           percentile_disc(0.6) WITHIN GROUP (ORDER BY value) AS q6,
           percentile_disc(0.7) WITHIN GROUP (ORDER BY value) AS q7,
           percentile_disc(0.8) WITHIN GROUP (ORDER BY value) AS q8,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS q9
    FROM events
    """,
    doc="Streaming quantiles via a sketch-in-foreachBatch rollup "
        "(VERDICT r6 item 8 — the r6 sketch layer married to the "
        "streaming layer): each micro-batch collapses to ONE bounded "
        "KLL sketch row inside foreachBatch (no streaming-aggregation "
        "state at all — the per-batch agg is a plain batch plan), the "
        "appended sketch-table rows merge via kll_merge_agg_double, and "
        "the deciles probe the merged sketch. This is the production "
        "shape for continuous quantile dashboards at 100 TB/day: "
        "per-batch work is one map-side-combined aggregate, the standing "
        "state is |batches| kilobyte rows (re-aggregable, grain-"
        "collapsible like the theta sketch table), and history is never "
        "re-scanned. Exact-regime oracle at driver scale (k=16384 > "
        "10k events ⇒ probes are order statistics ≡ percentile_disc, "
        "bit-identical stored doubles); estimation regime at K=100 is "
        "the documented 100 TB behavior. The quantile probes are "
        "FOLDABLE literals (the r6 KLL lesson).",
)


def kll_sketch_sink(spark: SparkSession, sf_dir: str, **runner_kw) -> DataFrame:
    """The standing KLL sketch table maintained from the stream (one
    bounded row per micro-batch). ``runner_kw`` passes through to
    ``run_to_batch`` — the kill/resume checkpoint test drives this with
    ``checkpoint=``/``spool=``/``post_spill_hook=`` to prove the sink is
    idempotent under foreachBatch's at-least-once restart contract."""
    sdf = events_stream(spark, sf_dir).select("value")

    def to_sketch(batch: DataFrame) -> DataFrame:
        return batch.agg(
            F.kll_sketch_agg_double("value", F.lit(_STREAM_KLL_K)).alias("sk"),
            F.count("value").alias("n"),
        )

    return run_to_batch(sdf, mode="append", batch_transform=to_sketch,
                        **runner_kw)


def kll_quantiles_from_sink(sink: DataFrame) -> DataFrame:
    """Merge the sketch table and probe the deciles (shared by the
    registered query and the restart test so both compare the exact
    final-table semantics)."""
    merged = sink.filter(F.col("n") > 0).agg(
        F.kll_merge_agg_double("sk").alias("sk"),
        F.sum("n").alias("n_events"),
    )
    return merged.select(
        F.col("n_events").cast("bigint").alias("n_events"),
        *[
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(i / 10))
            .alias(f"q{i}")
            for i in range(1, 10)
        ],
    )


@register("stream_kll_value_quantiles", **_STREAM_KLL_REG)
def q_stream_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kll_quantiles_from_sink(kll_sketch_sink(spark, sf_dir))


@register(
    "stream_theta_daily_users",
    # Exact-mode premise (guarded like the other theta oracles): every
    # per-day user set at driver scale is <=~150 distinct — far below
    # the 4096-entry theta capacity — so each re-aggregated estimate is
    # the exact distinct count and DuckDB matches bit-for-bit.
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY 1
    """,
    doc="INCREMENTAL theta sketch-table maintenance from a stream — the "
        "streaming twin of theta_sketch_rollup_daily's batch pattern "
        "and the second sketch-in-foreachBatch instance: each "
        "micro-batch collapses to per-day (theta sketch, count) rows "
        "inside foreachBatch (no streaming-aggregation state), the "
        "appended rows form the standing sketch table, and the final "
        "grain re-aggregates with theta_union_agg — which is exactly "
        "how a production distinct-users dashboard ingests: new batches "
        "append kilobyte sketch rows, history is never re-read, and ANY "
        "coarser grain (week, month, all-time) merges the same table. "
        "Exact-mode oracle at driver scale; ~1.6% rsd estimation at "
        "100 TB is the documented behavior.",
)
def q_stream_theta_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return theta_daily_from_sink(theta_sketch_sink(spark, sf_dir))


def theta_sketch_sink(spark: SparkSession, sf_dir: str, **runner_kw) -> DataFrame:
    """The standing per-day theta sketch table (see the restart test —
    ``runner_kw`` → ``run_to_batch`` exactly as ``kll_sketch_sink``)."""
    sdf = events_stream(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id")

    def to_sketches(batch: DataFrame) -> DataFrame:
        return batch.groupBy("day").agg(
            F.theta_sketch_agg("user_id").alias("sk"),
            F.count("*").alias("n"),
        )

    return run_to_batch(sdf, mode="append", batch_transform=to_sketches,
                        **runner_kw)


def theta_daily_from_sink(sink: DataFrame) -> DataFrame:
    return sink.groupBy("day").agg(
        F.sum("n").alias("n_events"),
        F.round(F.theta_sketch_estimate(F.theta_union_agg("sk")))
        .cast("bigint").alias("distinct_users"),
    )
