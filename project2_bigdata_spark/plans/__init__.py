"""Named query registry — the source of truth for ``__spark_entry__``.

Importing this package registers every query module. ``REGISTRY`` maps
name → Query(fn, oracle) and drives queries()/oracle_sql().
"""

from .registry import REGISTRY, Query, register  # noqa: F401

# Import order = SURVEY.md §7 phase order; each module self-registers.
from . import relational    # noqa: E402,F401  Phase 0/1: scans, filters, aggs, joins, sorts
from . import nested        # noqa: E402,F401  Phase 2: array ops, pair mining
from . import windowed      # noqa: E402,F401  Phase 2: lag stack, top-k, argmax
from . import pipelines     # noqa: E402,F401  Phase 3: EP1/EP2/EP3 dashboard composites
from . import temporal      # noqa: E402,F401  Phase 3½: as-of / range join, sessionization
from . import joins         # noqa: E402,F401  join/set-op/grouping-set completeness
from . import functions_surface  # noqa: E402,F401  string/percentile/math scalar surface
from . import datapipe      # noqa: E402,F401  Phase 6: dedup / similarity / text analysis
from . import curation      # noqa: E402,F401  round 2: PII / span dedup / sampling / quantize / CDC
from . import ops           # noqa: E402,F401  round 2: dq gates / anomalies / incremental rollups
from . import analytics     # noqa: E402,F401  round 2: gap-fill / rolling median / pareto / RFM / fuzzy / BM25
from ..operators import kmeans as _op_kmeans  # noqa: E402,F401  round 2: Lloyd k-means with unrolled oracle
from ..streaming import windows as _streaming_windows  # noqa: E402,F401  Phase 5
from ..streaming import stateful as _streaming_stateful  # noqa: E402,F401  Phase 5
from ..streaming import transform_state as _streaming_transform_state  # noqa: E402,F401  Phase 5 (Spark 4 typed state)
from ..ml import forecast as _ml_forecast  # noqa: E402,F401  Phase 4
from ..sources import ingest as _sources_ingest  # noqa: E402,F401  S1/S4 sources & sinks


# Driver-facing iteration order. The driver verifies the first 50 entries
# of queries() per round; CORRECTNESS_r01 covered _ROUND1_VERIFIED and
# CORRECTNESS_r02 covered _ROUND2_CHECKED. Round 3 fronts (a) rows that
# ERRED or that gained a real oracle this round (they already have a
# CORRECTNESS row, so a naive "never-checked first" order would demote
# them and make the red/rows-only verdict permanent), then (b) the
# LLM-data-pipeline core, then the remaining never-checked queries with
# oracle-bearing ones first. Already-green queries trail and stay covered
# by the local oracle-parity suite (tests/test_oracle_parity.py).
_ROUND1_VERIFIED = [
    "sales_daily", "sales_daily_filtered", "count_sales", "kpi_global",
    "value_counts_priority", "value_counts_segment", "distinct_counts",
    "product_price_stats", "volatility_cv", "corr_revenue_quantity",
    "mode_store", "acctbal_histogram", "product_probability_join",
    "daily_avg_price_guarded", "top20_orders", "monthly_rollup",
    "weekly_rollup", "weekday_features", "union_mixed_aggregates",
    "distinct_products", "status_priority_rollup", "events_hourly",
    "events_time_avg", "ticket_totals", "customer_rollup", "sql_view_layer",
    "revenue_share", "explode_items", "items_array_stats", "hours_per_day",
    "pair_counts", "top_pairs_per_product", "ticket_reassembly",
    "ticket_revenue_arrayfold", "posexplode_items", "association_rules",
    "lag_features", "argmax_daily_product", "best_month_per_product",
    "moving_avg_7d", "cumulative_revenue", "train_test_time_split",
    "product_revenue_ranks", "window_navigation", "product_rank_distributions",
    "ep1_sales_overview", "ep2_clients_by_store", "ep3_forecast_series",
    "revenue_checksum", "ep2_customer_drill",
]


# The 48 round-1-unverified queries, frozen in priority order (oracle-
# bearing first, rows-only last) so they are guaranteed inside the
# driver's check window this round. Queries added later in round 2 slot
# AFTER this list: they carry local verification already and can rotate
# into the window next round.
_ROUND2_FRONT = [
    "asof_join", "asof_join_bucketed", "range_join_tiers", "sessionize",
    "funnel_view_click_purchase", "weekly_retention",
    "semi_join_active_customers", "anti_join_inactive_customers",
    "full_outer_daily_activity", "products_intersect_years",
    "products_except_years", "cube_status_priority",
    "pivot_priority_by_status", "distinct_aggregates",
    "unpivot_status_revenue", "string_functions", "quantity_percentiles",
    "math_functions", "json_props_extract", "grouping_sets_explicit",
    "text_quality", "token_counts", "doc_fingerprints", "lang_stats",
    "dedup_exact", "dedup_blocked_jaccard", "similarity_topk",
    "ann_lsh_topk", "embedding_norms", "dedup_embedding_cosine",
    "vocab_stats", "tfidf_top_terms", "stream_tumbling_hourly",
    "stream_sliding_6h", "stream_session_window", "stream_dedup",
    "stream_static_join", "stream_stateful_counters",
    "wape_seasonal_naive", "ingest_extended_json_repair",
    "approx_distinct_customers", "minhash_near_dup", "simhash_buckets",
    "multimodal_decode", "multimodal_frames", "ml_train_per_product",
    "ml_sparkml_global", "ml_forecast_14d",
]


# Every query with a CORRECTNESS row after rounds 1+2: _ROUND1_VERIFIED
# plus the 50 rows of CORRECTNESS_r02 (the 48 _ROUND2_FRONT entries and
# the first two round-2 additions that slipped into that window).
_ROUND2_CHECKED = frozenset(_ROUND1_VERIFIED) | frozenset(_ROUND2_FRONT) | {
    "triple_counts_topk", "funnel_step_times",
}

# Standing priority hint for never-checked queries: the LLM-data-
# pipeline core fronts ahead of late analytics extras (VERDICT r2
# item 1) — names already checked are skipped automatically.
_LLM_CORE_PRIORITY = [
    "dedup_clusters", "dedup_keep_best", "knn_join_topk", "ivf_ann_topk",
    "corpus_pipeline_e2e", "pii_redact", "decontaminate",
    "decontaminate_ngram", "gopher_quality_flags", "bpe_pair_stats",
    "bpe_train_merges", "bpe_encode", "bpe_tokenize_docs", "mixture_plan",
    "stream_interval_join", "chunk_documents", "sequence_packing",
    "winnowing_fingerprints", "span_dedup_crossdoc", "lang_id_ngram",
    "stratified_sample", "temperature_sample", "weighted_sample_aes",
    "hash_split_assign", "embedding_quantize", "dedup_embedding_clusters",
]


def _correctness_rows() -> dict[str, dict]:
    """Union of every driver CORRECTNESS_r*.json row (later rounds win).

    Read at call time so the ordering self-adjusts each round without a
    code change: a new CORRECTNESS file moves its green rows to the tail
    and keeps erred rows in front.
    """
    import glob
    import json
    import os

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rows: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name, row in data.items():
                if isinstance(row, dict):
                    rows[name] = row
    return rows


def driver_order() -> list[str]:
    """Registry names in the order the driver should check them.

    Derived from the CORRECTNESS_r*.json files on disk, so each round's
    driver run re-prioritizes the next one automatically:

    1. re-check rows — a real error, a hash mismatch, or a ``no_oracle``
       verdict for a query that NOW has an oracle in the registry (the
       driver result would upgrade);
    2. never-checked queries — LLM-pipeline core first, then
       oracle-bearing, then rows-only;
    3. the already-checked tail (green and by-design rows-only), which
       stays covered by the local oracle-parity suite.

    Every registered name appears exactly once.
    """
    rows = _correctness_rows()

    def needs_recheck(name: str) -> bool:
        row = rows.get(name)
        if row is None:
            return False
        if row.get("hash_match") is False:
            return True  # wrong answer on record — always re-enter
        err = row.get("err")
        if err is None:
            return False
        if err == "no_oracle":
            # rows-only by design stays in the tail; a query that since
            # GAINED an oracle re-enters to upgrade its row
            return REGISTRY[name].oracle is not None
        return True  # driver-level error (canonicalizer, OOM, ...)

    order: list[str] = []
    placed: set[str] = set()

    def take(names) -> None:
        for n in names:
            if n in REGISTRY and n not in placed:
                order.append(n)
                placed.add(n)

    take([n for n in REGISTRY if needs_recheck(n)])
    never = [n for n in REGISTRY if n not in placed and n not in rows]
    take([n for n in _LLM_CORE_PRIORITY if n in never])
    take([n for n in never if REGISTRY[n].oracle is not None])
    take(never)  # rows-only remainder
    take(REGISTRY)  # already-checked tail, registration order
    return order
